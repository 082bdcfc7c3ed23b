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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    their sub-spans (overlap suppression, :94-111) — here realized by
    deleting each matched name from the text before shorter names run.
    """
    lower = F.lower(F.col(text_col))
    out = docs.select("doc_id", lower.alias("_t"))
    selects = []
    # Sequential suppression: after counting a name, blank it out so
    # contained shorter names don't double-count.
    for etype, name in _entity_rows():
        pat = rf"\b{name}\b"
        cnt = F.size(F.regexp_extract_all(F.col("_t"), F.lit(pat), 0))
        selects.append((etype, name, pat, cnt))
    result = None
    cur = out
    for etype, name, pat, cnt in selects:
        hit = cur.select(
            "doc_id",
            F.lit(etype).alias("entity_type"),
            F.lit(name).alias("name"),
            cnt.alias("n_mentions"),
        ).filter(F.col("n_mentions") > 0)
        result = hit if result is None else result.unionAll(hit)
        cur = cur.withColumn("_t", F.regexp_replace(F.col("_t"), pat, " "))
    return result


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
    """A6 candidate rollup: per name — dominant type, total mentions,
    #docs, ≤3 example doc_ids (`pipeline/whoosh_index.py:283-377`)."""
    return (
        tagged.groupBy("name", "entity_type")
        .agg(
            F.sum("n_mentions").alias("total_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 3).alias("examples"),
        )
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
