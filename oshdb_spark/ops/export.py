"""Deterministic shard export for training-data pipelines.

The last mile of a 100 TB curation run: write the surviving documents as
N balanced shards whose composition is a pure function of content ids —
independent of cluster size, partition layout, task retries, and input
order — with a per-shard manifest that proves what landed.

Design:
- shard id = 48-bit md5 hash of (id || salt) mod n_shards. md5 is
  bit-identical in Spark / DuckDB / Python (the repo-wide determinism
  primitive), uniform over ids, and reshard-stable: changing the
  PARALLELISM never changes any doc's shard, only changing n_shards does.
- the manifest checksum is bit_xor of each doc's 48-bit content hash:
  XOR is commutative/associative and closed on int64, so the checksum is
  ORDER-INDEPENDENT — the same shard written by 1 task or 1000 tasks, in
  any row order, yields the same value. (A sum would overflow int64 and
  overflow semantics differ across engines; XOR has no such hazard.)
- resume: write_shards() recomputes the input manifest and compares it
  to the one stored beside the data; on full match the write is skipped
  (idempotent re-run — the shard-level analogue of plans/checkpoint.py's
  stage resume).

Scale posture: assignment and hashing are pure Catalyst (codegen,
map-side); the only shuffle is the repartition on the shard column
(uniform keys by construction); the manifest is a partial+final hash
aggregate producing n_shards rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash48(expr: str, salt: str = "") -> str:
    """SQL: 48-bit integer from the first 12 md5 hex chars of `expr`
    (exact in BIGINT; conv() parses hex, identical to the DuckDB
    digit-by-digit oracle mirror)."""
    keyed = f"concat(cast({expr} as string), '{salt}')" if salt else expr
    return f"cast(conv(substr(md5({keyed}), 1, 12), 16, 10) as bigint)"


def with_shard(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    out: str = "shard",
) -> DataFrame:
    """Deterministic uniform shard assignment: pmod(hash48(id||salt), n).
    A doc's shard depends only on its id, the salt, and n_shards — never
    on partitioning, so exports are reproducible across cluster sizes."""
    return df.withColumn(
        out, F.expr(f"pmod({_hash48(id_col, salt)}, {n_shards})")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "shard",
) -> DataFrame:
    """Per-shard export manifest: (shard, docs, tokens, bytes, checksum,
    min_id, max_id). `checksum` is the order-independent bit_xor of each
    doc's 48-bit content hash — two manifests are equal iff every shard
    holds exactly the same multiset of contents (up to 48-bit collision),
    which is how a resumed or re-run export proves integrity without
    re-reading data."""
    if shard_col not in df.columns:
        df = with_shard(df, n_shards, id_col=id_col, out=shard_col)
    return (
        df.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("tokens"),
            F.sum(F.octet_length(text_col)).alias("bytes"),
            F.expr(f"bit_xor({_hash48(text_col)})").alias("checksum"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    force: bool = False,
) -> DataFrame:
    """Write `df` as n_shards hash-sharded parquet directories
    (`<path>/data/shard=K/`) plus a manifest (`<path>/manifest/`).

    Idempotent resume: when a stored manifest exists and matches the
    input's freshly computed manifest row-for-row, the write is SKIPPED
    and the stored manifest is returned — a re-launched export job costs
    one aggregate scan, not a rewrite. Any mismatch (content drift,
    different n_shards, partial previous write) triggers a full rewrite.

    The repartition keys on the shard column so each shard is written by
    one task group (no tiny-file explosion across tasks); shard ids are
    md5-uniform, so the write is balanced by construction.
    """
    spark = df.sparkSession
    data_path = os.path.join(path, "data")
    man_path = os.path.join(path, "manifest")

    sharded = with_shard(df, n_shards, id_col=id_col)
    fresh = shard_manifest(
        sharded, n_shards, id_col=id_col, text_col=text_col
    )

    if not force:
        try:
            stored = spark.read.parquet(man_path)
            cols = ["shard", "docs", "tokens", "bytes", "checksum",
                    "min_id", "max_id"]
            a = {tuple(r) for r in stored.select(cols).collect()}
            b = {tuple(r) for r in fresh.select(cols).collect()}
            if a == b:
                return stored
        except Exception:
            pass  # no/garbled previous manifest → write

    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(data_path)
    )
    # manifest from READ-BACK data: certifies what actually landed on
    # disk, not what the input plan promised
    landed = spark.read.parquet(data_path)
    manifest = shard_manifest(
        landed, n_shards, id_col=id_col, text_col=text_col
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(man_path)
    return spark.read.parquet(man_path)


def streaming_shard_export(
    stream: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: str | None = None,
):
    """Exactly-once streaming shard export: foreachBatch + idempotent
    per-batch manifests.

    Each micro-batch B writes `<path>/batch=B/` through write_shards —
    a REPLAYED batch (post-failure reprocessing, the at-least-once
    delivery Structured Streaming guarantees foreachBatch) finds its
    stored manifest matching and skips the rewrite, upgrading the sink
    to exactly-once (the canonical idempotent-sink recipe; batch id is
    deterministic for a given checkpoint).

    Because the manifest checksum is bit_xor (commutative, associative,
    mergeable), the per-shard MERGE of all batch manifests equals the
    batch-mode manifest of the whole input — merged_shard_manifest()
    rolls it up and the driver oracle checks it against the one-shot
    batch computation. Returns the started StreamingQuery."""

    def _write(bdf: DataFrame, batch_id: int) -> None:
        if not len(bdf.take(1)):
            return
        write_shards(
            bdf,
            os.path.join(path, f"batch={batch_id}"),
            n_shards,
            id_col=id_col,
            text_col=text_col,
        )

    w = stream.writeStream.foreachBatch(_write).trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()


def merged_shard_manifest(spark, path: str) -> DataFrame:
    """Roll the per-batch manifests of a streaming_shard_export run up to
    one row per shard: counts/sums add, checksums XOR, id ranges min/max.
    Equals write_shards' manifest over the same total data — the
    exactly-once evidence a resumed streaming export verifies."""
    man = spark.read.option("basePath", path).parquet(
        os.path.join(path, "batch=*", "manifest")
    )
    return man.groupBy("shard").agg(
        F.sum("docs").alias("docs"),
        F.sum("tokens").alias("tokens"),
        F.sum("bytes").alias("bytes"),
        F.expr("bit_xor(checksum)").alias("checksum"),
        F.min("min_id").alias("min_id"),
        F.max("max_id").alias("max_id"),
    )
