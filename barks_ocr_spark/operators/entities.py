"""Deterministic entity tagging + corrections overlay (SURVEY.md J8/A6).

The reference tags entities with spaCy NER plus curated dictionaries and
context-sensitive regex rules (`src/barks_ocr/pipeline/entity_tagger.py:
62-142`), then overlays human corrections with replace/add/remove
semantics (`src/barks_ocr/pipeline/entity_store.py:43-88`). The rebuild
keeps the deterministic parts: curated multi-word dictionary matching
(longest-first, case-insensitive) and the corrections overlay join —
statistical NER is out (non-reproducible across model versions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Curated entity dictionary for the synthetic corpora: type → names.
# Multi-word names first (longest-first matching like entity_tagger.py:77-80).
CURATED_ENTITIES: dict[str, list[str]] = {
    "CHARACTER": ["uncle scrooge", "scrooge", "donald", "gladstone", "gyro"],
    "PLACE": ["town square", "money bin", "bay", "town"],
    "THING": ["nugget", "coin", "machine", "spark"],
}


def _entity_rows() -> list[tuple[str, str]]:
    rows = []
    for etype, names in CURATED_ENTITIES.items():
        for n in names:
            rows.append((etype, n))
    # longest-first so "uncle scrooge" beats "scrooge"
    rows.sort(key=lambda r: -len(r[1]))
    return rows


def tag_entities(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, entity_type, name, n_mentions): curated dictionary matches.

    Matching contract (entity_tagger.py:64-80): lowercase the text, count
    word-boundary occurrences of each curated name; longer names suppress
    their sub-spans (overlap suppression, :94-111).

    Physical shape — ONE scan of the docs table regardless of dictionary
    size: every name's raw word-boundary count is a column expression over
    the same lowered text (D regexes per row, computed once), exploded to
    (doc, type, name, n) rows. Overlap suppression is longest-match
    *bookkeeping*, not corpus rewriting: containment coefficients between
    dictionary names are computed driver-side over the tiny dictionary,
    and each final count is expanded at plan-build time into a linear
    combination of raw counts — final(short) = raw(short) − Σ k·final(long)
    for every longer name containing `short` k times. (The previous
    implementation unioned D scans of docs, branch k dragging a chain of
    k−1 regexp_replace calls — O(D²) regex work and a scale-killer with a
    real gazetteer.) For dictionaries of many thousands of names, swap the
    per-name regex bank for an Aho-Corasick pandas kernel with the same
    output contract.
    """
    import re as _re

    rows = _entity_rows()  # longest-first
    lower = F.lower(F.col(text_col))
    raw = {
        name: F.size(F.regexp_extract_all(lower, F.lit(rf"\b{name}\b"), 0))
        for _, name in rows
    }
    final_expr: dict[str, Column] = {}
    for _etype, name in rows:  # longest-first ⇒ longer names resolved first
        e = raw[name]
        for _, longer in rows:
            if longer == name or len(longer) <= len(name):
                continue
            k = len(_re.findall(rf"\b{_re.escape(name)}\b", longer))
            if k and longer in final_expr:
                e = e - F.lit(k) * final_expr[longer]
        final_expr[name] = F.greatest(F.lit(0), e)
    structs = [
        F.struct(
            F.lit(etype).alias("entity_type"),
            F.lit(name).alias("name"),
            final_expr[name].cast("int").alias("n_mentions"),
        )
        for etype, name in rows
    ]
    return (
        docs.select("doc_id", F.explode(F.array(*structs)).alias("m"))
        .select("doc_id", "m.entity_type", "m.name", "m.n_mentions")
        .filter(F.col("n_mentions") > 0)
    )


# Context-sensitive rules (the deterministic analogue of
# `src/barks_ocr/pipeline/entity_tagger.py:125-142`): a cue word
# introduces a candidate entity from its textual context.
CONTEXT_RULES: list[tuple[str, str]] = [
    # "uncle X" → CHARACTER X (e.g. "uncle scrooge")
    ("CHARACTER", r"\buncle\s+([a-z]+)"),
    # "the X bin" → PLACE "X bin"
    ("PLACE", r"\bthe\s+([a-z]+\s+bin)\b"),
]


def tag_entities_by_context(
    docs: DataFrame,
    text_col: str = "text",
    rules: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(doc_id, entity_type, name, n_mentions) from context-rule matches."""
    lower = F.lower(F.col(text_col))
    parts = []
    for etype, pat in rules if rules is not None else CONTEXT_RULES:
        names = F.regexp_extract_all(lower, F.lit(pat), 1)
        parts.append(
            docs.select(
                "doc_id",
                F.lit(etype).alias("entity_type"),
                F.explode(names).alias("name"),
            )
            .groupBy("doc_id", "entity_type", "name")
            .agg(F.count("*").alias("n_mentions"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def entity_rollup(tagged: DataFrame) -> DataFrame:
    """A6 candidate rollup, dominant-type semantics.

    The reference keeps ONE candidate record per name with a per-type
    vote Counter and groups output by the *dominant* type
    (`src/barks_ocr/pipeline/whoosh_index.py:283-310, 353-360`), not by
    (name, type) — a name tagged under two types must not double-count.
    Votes = #tagged rows per (name, type); ties break to the
    alphabetically-first type (the reference's Counter.most_common tie
    order is insertion-dependent, so we fix a deterministic rule).
    Examples = first ≤3 sorted doc_ids (whoosh_index.py:340-348's
    max_examples cap, with sorted-ids as the deterministic stand-in for
    first-seen order).

    Output: (name, dominant_type, total_mentions, n_docs, examples).
    Scale shape: two hash aggregates on `name` + a broadcast-sized join
    (distinct names ≪ corpus) — no O(n²), no skew beyond name frequency.
    """
    per_type = tagged.groupBy("name", "entity_type").agg(
        F.count("*").alias("type_votes")
    )
    w = Window.partitionBy("name").orderBy(
        F.desc("type_votes"), F.asc("entity_type")
    )
    dom = (
        per_type.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("name", F.col("entity_type").alias("dominant_type"))
    )
    rolled = tagged.groupBy("name").agg(
        F.sum("n_mentions").alias("total_mentions"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.slice(F.sort_array(F.collect_list("doc_id")), 1, 3).alias("examples"),
    )
    return (
        rolled.join(dom, "name")
        .select("name", "dominant_type", "total_mentions", "n_docs", "examples")
        .orderBy(F.desc("total_mentions"), "name")
    )


def apply_corrections(auto: DataFrame, corrections: DataFrame) -> DataFrame:
    """Corrections overlay (J8, entity_store.py:43-88).

    ``corrections``: (doc_id, entity_type, name, action) with action ∈
    {replace, add, remove}:
      - remove: kill the auto row
      - add: new row (n_mentions = 1 when unseen)
      - replace: per (doc_id, entity_type), corrections fully replace
        the auto set for that type.
    Realized with outer joins + anti joins — all broadcastable when the
    corrections table is small (it is: human-made).
    """
    c = F.broadcast(corrections)
    removes = c.filter(F.col("action") == "remove").drop("action")
    adds = c.filter(F.col("action") == "add").drop("action")
    replaces = c.filter(F.col("action") == "replace").drop("action")

    replaced_types = replaces.select("doc_id", "entity_type").distinct()
    kept = (
        auto.join(removes, ["doc_id", "entity_type", "name"], "left_anti")
        .join(replaced_types, ["doc_id", "entity_type"], "left_anti")
    )
    new_rows = (
        adds.unionByName(replaces)
        .select("doc_id", "entity_type", "name", F.lit(1).alias("n_mentions"))
    )
    return kept.unionByName(new_rows).dropDuplicates(
        ["doc_id", "entity_type", "name"]
    )
