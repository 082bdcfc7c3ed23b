"""I4 rotated-rect, I5 rect distance, I8 rotation sweep, F7 dodgy
groups, S6 final-groups promotion, and the fuzzy-prune parity check."""

from __future__ import annotations

import math

import numpy as np
import pytest

from barks_ocr_spark.kernels import fakeocr
from barks_ocr_spark.kernels import geometry as geo


def _rot_quad(w: float, h: float, deg: float) -> list[float]:
    t = math.radians(deg)
    c, s = math.cos(t), math.sin(t)
    pts = [(0, 0), (w, 0), (w, h), (0, h)]
    return [v for x, y in pts for v in (x * c - y * s, x * s + y * c)]


def test_min_rotated_rect_axis_aligned():
    quad = [0, 0, 10, 0, 10, 4, 0, 4]
    bbox, az = geo.min_rotated_rect(np.array(quad))
    # area preserved, azimuth on an axis
    side1 = math.hypot(*(bbox[1] - bbox[0]))
    side2 = math.hypot(*(bbox[3] - bbox[0]))
    assert side1 * side2 == pytest.approx(40.0)
    assert min(abs(az), abs(az - 90), abs(az - 180)) < 1e-9
    pts, approx = geo.ocr_box_shape(np.array(quad))
    assert approx
    assert pts.tolist() == [[0, 0], [10, 4]]  # envelope [bl, tr]


def test_min_rotated_rect_rotated_branch():
    quad = _rot_quad(10, 4, 30)
    bbox, az = geo.min_rotated_rect(np.array(quad))
    assert az == pytest.approx(30.0, abs=1e-6)
    pts, approx = geo.ocr_box_shape(np.array(quad))
    assert not approx
    assert pts.shape == (4, 2)  # keeps the rotated corners
    # the rect's area is the quad's own area (it IS a rectangle)
    side1 = math.hypot(*(pts[1] - pts[0]))
    side2 = math.hypot(*(pts[3] - pts[0]))
    assert side1 * side2 == pytest.approx(40.0)


def test_ocr_box_shape_near_axis_tolerance():
    # 4° off axis → still "approximately rectangular" (±5° rule)
    pts, approx = geo.ocr_box_shape(np.array(_rot_quad(10, 4, 4)))
    assert approx
    pts, approx = geo.ocr_box_shape(np.array(_rot_quad(10, 4, 6)))
    assert not approx


def test_rect_distance():
    a = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]])
    b = np.array(
        [
            [5, 5, 15, 15],  # overlap → 0
            [15, 0, 25, 10],  # pure x gap 5
            [13, 14, 20, 20],  # diagonal gap (3, 4) → 5
        ]
    )
    assert geo.rect_distance(a, b).tolist() == [0.0, 5.0, 5.0]


def test_rotation_sweep_picks_true_rotation():
    target = "kaboom"
    for true_rot in fakeocr.SFX_ROTATIONS:
        cands = [
            (rot, fakeocr.rotate_text_stub(target, rot, true_rot=true_rot))
            for rot in fakeocr.SFX_ROTATIONS
        ]
        rot, score = fakeocr.pick_best_rotation(cands, target)
        assert rot == true_rot
        assert score == 1.0


def test_rotation_score_dash_canonicalization():
    # em dash vs '-' must not cost similarity (florence_check.py:74-77)
    assert fakeocr.rotation_score("ka—boom", "ka-boom") == 1.0


def test_dodgy_group_predicate(spark):
    from barks_ocr_spark.operators import issues

    rows = [
        (1, -1, "", "note"),           # empty in no-panel → dodgy
        (2, -1, "W", ""),              # garbage W → dodgy
        (3, -1, "hello", "a Page Number here"),  # page-number note → dodgy
        (4, -1, "x", ""),              # 1-char → dodgy
        (5, -1, "hello there", ""),    # fine despite panel -1
        (6, 2, "", ""),                # assigned panel → kept regardless
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, panel_num int, ai_text string, notes string"
    )
    kept = sorted(
        r["doc_id"] for r in issues.remove_dodgy_groups(df).collect()
    )
    assert kept == [5, 6]


def test_promote_final_groups(spark):
    from barks_ocr_spark.operators import comic

    prelim = spark.createDataFrame(
        [
            ("p1", "easy", True, ["a"]),
            ("p1", "paddle", False, ["b"]),
            ("p2", "easy", False, ["c"]),
            ("p2", "paddle", True, ["d", "e"]),
            ("p3", "easy", False, ["f"]),   # not ready → excluded
            ("p3", "paddle", False, ["g"]),
        ],
        "doc_id string, engine string, use_as_final boolean, groups array<string>",
    )
    out = {r["doc_id"]: r for r in comic.promote_final_groups(prelim).collect()}
    assert set(out) == {"p1", "p2"}
    assert out["p1"]["engine"] == "easy" and out["p1"]["groups"] == ["a"]
    assert out["p2"]["groups"] == ["d", "e"]


def test_promote_final_groups_invariant(spark):
    from barks_ocr_spark.operators import comic

    bad = spark.createDataFrame(
        [("p1", "easy", True, ["a"]), ("p1", "paddle", True, ["b"])],
        "doc_id string, engine string, use_as_final boolean, groups array<string>",
    )
    with pytest.raises(AssertionError, match="multiple engines"):
        comic.promote_final_groups(bad)


def test_best_fuzzy_match_prune_parity(spark):
    """The two-layer prune must emit exactly the unpruned plan's rows."""
    from difflib import SequenceMatcher

    from barks_ocr_spark.operators import compare

    a_rows = [
        (1, 1, 0, "the quick brown fox"),
        (1, 1, 1, "zz"),                      # no candidate close enough
        (1, 1, 2, "jumps over the lazy dog"),
        (2, 1, 0, "short"),
    ]
    b_rows = [
        (1, 1, 0, "the quick brown cat"),
        (1, 1, 1, "jumps over a lazy dog"),
        (1, 1, 2, "completely different length string here"),
        (2, 1, 0, "shore"),
    ]
    a = spark.createDataFrame(a_rows, "doc_id long, panel_num int, pos int, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, panel_num int, pos int, text string")
    got = {
        (r["doc_id"], r["pos_a"]): (r["pos_b"], round(r["ratio"], 9))
        for r in compare.best_fuzzy_match(a, b, threshold=0.7).collect()
    }
    # brute-force expectation with plain difflib over every pair
    expected = {}
    for d, p, pos_a, ta in a_rows:
        cands = [
            (SequenceMatcher(None, ta, tb).ratio(), pos_b)
            for d2, p2, pos_b, tb in b_rows
            if (d2, p2) == (d, p)
        ]
        best = max(cands, key=lambda c: (c[0], -c[1]))
        if best[0] >= 0.7:
            expected[(d, pos_a)] = (best[1], round(best[0], 9))
    assert got == expected
