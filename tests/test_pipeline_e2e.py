"""End-to-end resumable curation pipeline over the training-data ops:
quality filter → delta-vs-corpus dedup → deterministic sample → shard
export, every stage a durable checkpoint (plans/checkpoint.Pipeline).

What this pins beyond the per-op tests: the STAGES COMPOSE under the
checkpoint contract — a re-run after completion invokes zero stage
functions, reads only manifests + parquet, and lands byte-identical
shard manifests; and the multi-stage lineage records the dependency
chain a 100 TB operator would inspect after a crash."""

from __future__ import annotations

from pyspark.sql import functions as F

from oshdb_spark.plans.checkpoint import Pipeline

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
    )


def _run(spark, base, calls):
    from oshdb_spark.ops.dedup import incremental_dedup
    from oshdb_spark.ops.export import shard_manifest
    from oshdb_spark.ops.sampling import deterministic_sample
    from oshdb_spark.ops.textstats import with_quality

    docs = _docs(spark)
    corpus = docs.filter("doc_id % 3 != 0")
    delta = docs.filter("doc_id % 3 = 0")
    p = Pipeline(spark, base, "curate")

    def counted(name, fn):
        def wrapper():
            calls[name] = calls.get(name, 0) + 1
            return fn()

        return wrapper

    quality = p.stage(
        "quality",
        counted(
            "quality",
            lambda: with_quality(delta)
            .filter("distinct_ratio >= 0.3 AND alpha_ratio >= 0.5")
            .select("doc_id", "text"),
        ),
    )
    survivors = p.stage(
        "dedup",
        counted(
            "dedup",
            lambda: quality.join(
                incremental_dedup(quality, corpus)
                .filter("verdict = 'unique'")
                .select("doc_id"),
                "doc_id",
            ),
        ),
        inputs=["quality"],
    )
    sampled = p.stage(
        "sample",
        counted(
            "sample",
            lambda: deterministic_sample(survivors, rate=0.9),
        ),
        inputs=["dedup"],
    )
    manifest = p.stage(
        "export_manifest",
        counted("export_manifest", lambda: shard_manifest(sampled, 4)),
        inputs=["sample"],
    )
    return p, sampled, manifest


def test_curation_pipeline_composes_and_resumes(spark, tmp_path):
    from oshdb_spark.ops.export import shard_manifest

    base = str(tmp_path / "curate")
    calls: dict[str, int] = {}
    p, sampled, manifest = _run(spark, base, calls)
    m1 = sorted(tuple(r) for r in manifest.collect())
    rows = sampled.count()
    assert rows > 0 and len(m1) == 4
    assert calls == {
        "quality": 1, "dedup": 1, "sample": 1, "export_manifest": 1
    }

    # full re-run in a fresh Pipeline object: every stage resumes from
    # its checkpoint — no stage function invoked, identical manifest
    calls2: dict[str, int] = {}
    p2, sampled2, manifest2 = _run(spark, base, calls2)
    m2 = sorted(tuple(r) for r in manifest2.collect())
    assert calls2 == {}
    assert m2 == m1
    assert sampled2.count() == rows

    # the checkpointed manifest equals a direct one-shot computation on
    # the resumed data (content round-tripped through every stage)
    direct = sorted(
        tuple(r) for r in shard_manifest(sampled2, 4).collect()
    )
    assert direct == m1

    # lineage records the stage chain with inputs
    lin = {m["stage"]: m for m in p2.lineage()}
    assert lin["dedup"]["inputs"] == ["quality"]
    assert lin["export_manifest"]["inputs"] == ["sample"]
    assert all(m["status"] == "complete" for m in lin.values())
