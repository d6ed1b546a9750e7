"""docs ⇄ typed transforms — all JVM-side (Catalyst), zero Python.

The raw docs table carries version/member payloads as JSON text inside
spans. Decoding uses only built-in higher-order functions + ``from_json``,
so it runs inside whole-stage codegen, is pushdown/prune-friendly, and
never touches Python:

- ``typed_docs(docs)``   → one row per doc with typed ``versions`` /
  ``members`` arrays (narrow, shuffle-free; the unit the pandas kernels
  consume). The original ``spans`` column is carried through untouched —
  the span-sequence invariant (FIXTURES.md §1) is preserved by
  construction.
- ``versions_table(docs)`` → flat per-version rows with
  ``valid_from``/``valid_to`` (valid_to = lead(valid_from) over the id
  window — the reference computes the same bound imperatively in
  osh/OSHEntities.java:41-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import schemas


def _parse_ts(col):
    # ISO-8601 'YYYY-MM-DDTHH:MM:SSZ' → unix seconds (session TZ is UTC)
    return F.unix_timestamp(F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ssX"))


def typed_docs(docs: DataFrame, sort: bool = True) -> DataFrame:
    """docs(doc_id, spans) → (doc_id, entity_type, id, versions, members, spans).

    versions are sorted oldest-first by (ts, version) for kernel use; raw
    span storage order is newest-first (FIXTURES.md §1) and is preserved in
    the pass-through ``spans`` column.

    ``sort=False`` skips the version sort (callers that sort later over a
    materialized column — prepared_docs — or don't need order at all:
    versions_table re-sorts via its window, bbox summaries are
    order-insensitive).

    NATIVE-TYPED input (model.history derivations): frames that already
    carry entity_type/id/versions/members struct columns — built by the
    same expressions whose to_json produced the spans — pass through
    unchanged, skipping the from_json decode entirely (and letting
    Catalyst prune the to_json spans when nothing downstream reads them).
    Precondition: attached versions are oldest-first.
    """
    if {"versions", "members", "entity_type", "id"} <= set(docs.columns):
        return docs
    v = F.expr(
        f"""
        transform(
          filter(spans, s -> s.kind = 'version'),
          s -> from_json(s.text, '{schemas.VERSION_JSON.simpleString()}')
        )
        """
    )
    m = F.expr(
        f"""
        transform(
          filter(spans, s -> s.kind = 'member'),
          s -> from_json(s.text, '{schemas.MEMBER_JSON.simpleString()}')
        )
        """
    )
    meta = F.expr(
        f"""
        from_json(
          filter(spans, s -> s.kind = 'meta')[0].text,
          '{schemas.META_JSON.simpleString()}'
        )
        """
    )
    out = (
        docs.withColumn("_meta", meta)
        .withColumn("entity_type", F.col("_meta.entity_type"))
        .withColumn("id", F.col("_meta.id"))
        .withColumn("versions", v)
        .withColumn("members", m)
        .drop("_meta")
    )
    if sort:
        # oldest-first version order; reference stores newest-first but
        # iterates oldest-first after reversing (OSHEntities.java:41-60)
        out = out.withColumn(
            "versions",
            F.expr("array_sort(versions, (a, b) -> case when a.ts < b.ts then -1 when a.ts > b.ts then 1 when a.version < b.version then -1 when a.version > b.version then 1 else 0 end)"),
        )
    return out


def versions_table(docs: DataFrame) -> DataFrame:
    """Flat per-version table with validity windows (FIXTURES.md §2).
    Accepts raw docs (doc_id, spans) or the flat store (sorted `versions`
    already a native column — no JSON decode)."""
    td = docs if "versions" in docs.columns else typed_docs(docs)
    ex = td.select(
        "doc_id", "entity_type", "id", F.explode("versions").alias("v")
    ).select(
        "entity_type",
        "id",
        F.col("v.version").alias("version"),
        F.col("v.visible").alias("visible"),
        _parse_ts("v.ts").alias("valid_from"),
        F.col("v.changeset").alias("changeset"),
        F.col("v.uid").alias("uid"),
        F.col("v.tags").alias("tags"),
        F.col("v.lon").alias("lon"),
        F.col("v.lat").alias("lat"),
        F.col("v.refs").alias("refs"),
        "doc_id",
    )
    w = Window.partitionBy("entity_type", "id").orderBy("valid_from", "version")
    return ex.withColumn("valid_to", F.lead("valid_from").over(w)).select(
        *[f.name for f in schemas.VERSIONS.fields]
    )
