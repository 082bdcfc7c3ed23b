"""Geometry kernels (SURVEY.md §2.8): rect math, panel containment,
enclosing boxes, shrink-and-retry panel assignment — all numpy-vectorized.

Coordinate convention follows the reference: an OCR box is an 8-int quad
``[x0,y0, x1,y1, x2,y2, x3,y3]`` (bl, br, tr, tl in image coords,
`src/barks_ocr/pipeline/batch_ocr.py:211-222`); a panel is ``[x, y, w, h]``
top-left + size (`src/barks_ocr/pipeline/gemini_grouper.py:303-312`).
"""

from __future__ import annotations

import numpy as np

# Shrink-retry offsets for boxes straddling a panel border
# (`src/barks_ocr/tools/ocr_check.py:471-490`).
SHRINK_RETRIES = (0, 20, 40, 60)


def axis_bbox(quads: np.ndarray) -> np.ndarray:
    """Axis-aligned bbox (x_min, y_min, x_max, y_max) per 8-int quad.

    For near-axis-aligned quads this equals the reference's
    minimum-rotated-rectangle envelope path (`src/barks_ocr/utils/
    ocr_box.py:25-78`: rectangular within ±5° → axis rect; else envelope).
    """
    q = np.asarray(quads, dtype=np.int64).reshape(-1, 4, 2)
    xs, ys = q[:, :, 0], q[:, :, 1]
    return np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1)


def enclosing_box(bboxes: np.ndarray) -> np.ndarray:
    """Min/max hull over member bboxes (A1,
    `src/barks_ocr/pipeline/gemini_grouper.py:281-288`)."""
    b = np.asarray(bboxes, dtype=np.int64).reshape(-1, 4)
    return np.array([b[:, 0].min(), b[:, 1].min(), b[:, 2].max(), b[:, 3].max()])


def rect_inside_rect(inner: np.ndarray, outer: np.ndarray) -> np.ndarray:
    """All four corners of ``inner`` inside ``outer`` (inclusive).

    `src/barks_ocr/utils/geometry.py:114-127` (is_rect_inside_rect via
    is_point_inside_rect). Shapes: inner (n,4) xyxy, outer (m,4) xyxy;
    returns (n, m) bool.
    """
    i = np.asarray(inner, dtype=np.int64)[:, None, :]
    o = np.asarray(outer, dtype=np.int64)[None, :, :]
    return (
        (i[..., 0] >= o[..., 0])
        & (i[..., 1] >= o[..., 1])
        & (i[..., 2] <= o[..., 2])
        & (i[..., 3] <= o[..., 3])
    )


def assign_panels(bboxes: np.ndarray, panels_xywh: np.ndarray) -> np.ndarray:
    """1-based first-containing-panel per bbox, -1 when none — with the
    20/40/60-px shrink retry (J2+J3).

    `src/barks_ocr/pipeline/gemini_grouper.py:290-312` (first match wins,
    panels in reading order) + `src/barks_ocr/tools/ocr_check.py:471-506`
    (shrink box symmetrically by 20/40/60 and retry; give up → -1).
    """
    b = np.asarray(bboxes, dtype=np.int64).reshape(-1, 4)
    if b.shape[0] == 0:
        return np.zeros(0, dtype=np.int64)
    p = np.asarray(panels_xywh, dtype=np.int64).reshape(-1, 4)
    p_xyxy = np.stack([p[:, 0], p[:, 1], p[:, 0] + p[:, 2], p[:, 1] + p[:, 3]], axis=1)

    out = np.full(b.shape[0], -1, dtype=np.int64)
    for reduce_by in SHRINK_RETRIES:
        undecided = out == -1
        if not undecided.any():
            break
        shrunk = b[undecided] + np.array([reduce_by, reduce_by, -reduce_by, -reduce_by])
        # A degenerate shrunk box (x1<=x0 or y1<=y0) cannot be reduced —
        # the reference aborts the retry loop for it (:486-488).
        valid = (shrunk[:, 2] > shrunk[:, 0]) & (shrunk[:, 3] > shrunk[:, 1])
        inside = rect_inside_rect(shrunk, p_xyxy)  # (n_undecided, n_panels)
        first = np.where(inside.any(1), inside.argmax(1) + 1, -1)
        first = np.where(valid, first, -1)
        idx = np.flatnonzero(undecided)
        # Only accept assignments found at this retry level; keep -1 rows
        # in play for the next (larger) shrink.
        out[idx[first > 0]] = first[first > 0]
    return out


def cluster_boxes(bboxes: np.ndarray, gap: int = 12) -> np.ndarray:
    """Group boxes into speech-bubble clusters by padded-bbox overlap.

    The reference delegates grouping to an LLM under the contract "one
    group per bubble, never across panels"
    (`src/barks_ocr/utils/gemini_ai_comic_prompts.py:90-106`); this is the
    deterministic local replacement: union-find over pairwise overlap of
    bboxes padded by ``gap`` px. Returns a group label per box.
    """
    b = np.asarray(bboxes, dtype=np.int64).reshape(-1, 4)
    n = b.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    padded = b + np.array([-gap, -gap, gap, gap])
    a, c = padded[:, None, :], padded[None, :, :]
    overlap = (
        (a[..., 0] <= c[..., 2])
        & (c[..., 0] <= a[..., 2])
        & (a[..., 1] <= c[..., 3])
        & (c[..., 1] <= a[..., 3])
    )
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in np.flatnonzero(overlap[i, i + 1 :]) + i + 1:
            ri, rj = find(i), find(int(j))
            if ri != rj:
                parent[rj] = ri
    roots = np.array([find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def reading_order(panel_num: np.ndarray, y0: np.ndarray, x0: np.ndarray) -> np.ndarray:
    """Reading-order rank (0-based) per group: panel-major, then top-to-
    bottom, left-to-right; unassigned (-1) panels sort last (W1).

    Panel precedence per the row-major formula in
    `scraps/damishshah_comic_book_reader.py:34-37`; tie-break fixed as
    ``(panel_num, y0, x0)`` per FIXTURES.md §3.
    """
    pn = np.asarray(panel_num, dtype=np.int64)
    key_panel = np.where(pn == -1, np.iinfo(np.int32).max, pn)
    order = np.lexsort((np.asarray(x0), np.asarray(y0), key_panel))
    ranks = np.empty(len(order), dtype=np.int64)
    ranks[order] = np.arange(len(order))
    return ranks


def min_rotated_rect(quad: np.ndarray) -> tuple[np.ndarray, float]:
    """I4: minimum-area rotated rectangle of a 4-point quad + its azimuth.

    Shapely-free reimplementation of `src/barks_ocr/utils/ocr_box.py:
    25-78`: the min-area rectangle has a side flush with a hull edge, so
    evaluating the rotated bbox for every candidate point-pair direction
    (a superset of hull edges for ≤4 points) and keeping the smallest is
    exact. Azimuth per the reference's formula (`utils/ocr_box.py:60-78`):
    the angle of the rectangle's LONGER side, folded into (0, 180].

    Returns (corners (4,2) float, azimuth_degrees).
    """
    pts = np.asarray(quad, dtype=np.float64).reshape(4, 2)
    best_area, best_corners = np.inf, None
    for i in range(4):
        for j in range(i + 1, 4):
            d = pts[j] - pts[i]
            n = np.hypot(*d)
            if n == 0:
                continue
            c, s = d[0] / n, d[1] / n
            rot = np.array([[c, s], [-s, c]])
            r = pts @ rot.T
            lo, hi = r.min(0), r.max(0)
            area = (hi[0] - lo[0]) * (hi[1] - lo[1])
            if area < best_area - 1e-9:
                best_area = area
                box = np.array(
                    [[lo[0], lo[1]], [hi[0], lo[1]], [hi[0], hi[1]], [lo[0], hi[1]]]
                )
                best_corners = box @ rot
    bbox = best_corners
    axis1 = np.hypot(*(bbox[3] - bbox[0]))
    axis2 = np.hypot(*(bbox[1] - bbox[0]))
    a, b = (bbox[0], bbox[1]) if axis1 <= axis2 else (bbox[0], bbox[3])
    angle = np.arctan2(b[1] - a[1], b[0] - a[0])
    az = np.degrees(angle) if angle > 0 else np.degrees(angle) + 180
    return bbox, float(az)


def ocr_box_shape(quad: np.ndarray) -> tuple[np.ndarray, bool]:
    """I4 branch logic (`src/barks_ocr/utils/ocr_box.py:25-43`):
    azimuth within ±5° of {0, 90, 180} → the box is approximately
    rectangular and the axis-aligned envelope [bl, tr] is used; otherwise
    keep the 4 rotated-rect corners. Returns (points, is_approx_rect)."""
    bbox, az = min_rotated_rect(quad)
    approx = abs(az) < 5.0 or abs(az - 180) < 5.0 or abs(az - 90) < 5.0
    if approx:
        env = axis_bbox(np.asarray(quad).reshape(1, 8))[0]
        return np.array([[env[0], env[1]], [env[2], env[3]]], dtype=np.float64), True
    return bbox, False


def rect_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """I5: min distance between axis-aligned rects (0 when overlapping).

    The reference computes this through edge geometry — facing-edge
    triangle heights and corner distances (`src/barks_ocr/utils/
    geometry.py:187-218, 264-325`); for the axis-aligned rectangles it is
    invoked on, that construction reduces exactly to the closed form
    ``hypot(x_gap, y_gap)`` with gaps clamped at 0, which vectorizes.

    Shapes: a (n,4) xyxy, b (n,4) xyxy → (n,) float distances.
    """
    a = np.asarray(a, dtype=np.float64).reshape(-1, 4)
    b = np.asarray(b, dtype=np.float64).reshape(-1, 4)
    dx = np.maximum(0.0, np.maximum(a[:, 0] - b[:, 2], b[:, 0] - a[:, 2]))
    dy = np.maximum(0.0, np.maximum(a[:, 1] - b[:, 3], b[:, 1] - a[:, 3]))
    return np.hypot(dx, dy)


def _connected_components(mask: np.ndarray) -> np.ndarray:
    """8-connected component labels (0 = off) via BFS — cv2-free."""
    labels = np.zeros(mask.shape, dtype=np.int64)
    h, w = mask.shape
    cur = 0
    for sy, sx in zip(*np.nonzero(mask & (labels == 0))):
        if labels[sy, sx]:
            continue
        cur += 1
        stack = [(int(sy), int(sx))]
        labels[sy, sx] = cur
        while stack:
            y, x = stack.pop()
            y0m, y1m = max(0, y - 1), min(h, y + 2)
            x0m, x1m = max(0, x - 1), min(w, x + 2)
            for ny in range(y0m, y1m):
                for nx in range(x0m, x1m):
                    if mask[ny, nx] and not labels[ny, nx]:
                        labels[ny, nx] = cur
                        stack.append((ny, nx))
    return labels


def segment_regions(
    img: np.ndarray, threshold: int = 235, min_area: int = 1
) -> np.ndarray:
    """I7: pixel-level panel/bubble segmentation, cv2-free.

    Reimplements the reference's contour pipeline
    (`scraps/damishshah_comic_book_reader.py:41-96` via
    `scraps/speech_bubbles.py`): grey threshold at 235 → connected
    bright regions → drop any region that fully CONTAINS another
    candidate (the filterContainingContours innermost-wins rule, which
    also removes the page background) → sort by the row-major precedence
    key ``(y // 200) * 200 * img_w + x`` (:34-37).

    Returns (n, 4) int64 xywh boxes in reading order.
    """
    g = np.asarray(img)
    if g.ndim == 3:  # grey = channel mean (stand-in for cvtColor)
        g = g.mean(axis=2)
    mask = g > threshold
    labels = _connected_components(mask)
    boxes = []
    for lab in range(1, labels.max() + 1):
        ys, xs = np.nonzero(labels == lab)
        if ys.size < min_area:
            continue
        x0, y0 = int(xs.min()), int(ys.min())
        boxes.append((x0, y0, int(xs.max()) - x0 + 1, int(ys.max()) - y0 + 1))
    if not boxes:
        return np.zeros((0, 4), dtype=np.int64)
    b = np.array(boxes, dtype=np.int64)
    # containment filter: drop boxes strictly containing another box
    xyxy = np.stack([b[:, 0], b[:, 1], b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]], axis=1)
    contains = rect_inside_rect(xyxy, xyxy) & ~np.eye(len(b), dtype=bool)
    keep = ~contains.any(axis=0)  # keep boxes that contain no other box
    b = b[keep]
    key = (b[:, 1] // 200) * 200 * g.shape[1] + b[:, 0]
    return b[np.argsort(key, kind="stable")]


def padded_clipped_bbox(
    quads: np.ndarray, pad: int, image_w: int, image_h: int
) -> np.ndarray:
    """I6: axis bbox of each polygon, padded by ``pad``, clipped to the
    image — the bubble-crop window feeding the re-OCR spot check
    (`src/barks_ocr/tools/florence_check.py:291-303`). int() there
    truncates toward zero, which for the non-negative pixel coords used
    is the same floor this int64 cast applies."""
    b = axis_bbox(quads)
    out = np.empty_like(b)
    out[:, 0] = np.maximum(0, b[:, 0] - pad)
    out[:, 1] = np.maximum(0, b[:, 1] - pad)
    out[:, 2] = np.minimum(image_w, b[:, 2] + pad)
    out[:, 3] = np.minimum(image_h, b[:, 3] + pad)
    return out
