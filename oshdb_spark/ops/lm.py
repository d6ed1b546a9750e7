"""Statistical language-model quality operators — pure Catalyst.

Two published corpus-curation signals the pipeline layer was still
missing, both re-expressed as declarative DataFrame plans:

- ``lm_crossentropy`` — the CCNet quality signal (Wenzek et al., LREC
  2020): score every document by its cross-entropy under a language
  model trained on a trusted reference slice, then keep/bucket by the
  score (CCNet's head/middle/tail split). CCNet uses a KenLM 5-gram;
  this engine trains an add-α word-bigram model — the same signal class
  with a fully deterministic, engine-portable definition (DuckDB can
  replay the probabilities bit-for-bit; no external model artifact).
- ``dsir_logweights`` — Data Selection with Importance Resampling (Xie
  et al., NeurIPS 2023): hashed-n-gram importance weights
  log p_target(doc) − log p_raw(doc) under bag-of-hashed-bigram unigram
  models of a target slice vs the raw corpus. Documents with positive
  weight look more like the target than like the raw corpus.

Plan shapes (the 100 TB posture):

- Training passes are one explode + one groupBy each; the model tables
  are vocabulary-sized (bigram LM) or exactly ``n_buckets`` rows (DSIR),
  never corpus-sized.
- Scoring joins the exploded corpus against the model tables. The DSIR
  table (``n_buckets`` rows) always broadcasts. The LM tables broadcast
  when ``broadcast_model=True`` (a curated reference slice has bounded
  vocabulary); pass ``False`` for a huge reference and the join falls
  back to a shuffle hash join keyed by (w1, w2) — hot stopword bigrams
  are single-build-side-row keys, the classic AQE-handled shape.
- Per-document aggregation is one partial+final hash aggregate.

Float contract: per-document scores are order-dependent float sums;
callers must ``round(..., 6)`` on BOTH engines before comparing or
thresholding (CLAUDE.md invariant), which the driver queries do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigram_structs(text_col: str) -> str:
    """SQL expr: array<struct<w1,w2>> of adjacent whitespace-token pairs
    (empty when the document has fewer than two tokens)."""
    ws = f"split({text_col}, ' ')"
    return (
        f"CASE WHEN size({ws}) < 2 THEN "
        f"array() "
        f"ELSE transform(sequence(1, size({ws}) - 1), "
        f"i -> named_struct('w1', {ws}[i-1], 'w2', {ws}[i])) END"
    )


def lm_crossentropy(
    df: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document cross-entropy under an add-α word-bigram LM trained
    on ``ref`` (the CCNet quality signal, Wenzek et al. 2020 §4.3, with
    a deterministic bigram model instead of KenLM).

    Model: p(w2|w1) = (c(w1 w2) + α) / (c(w1 ·) + α·(V+1)) where
    c(w1 ·) counts w1's occurrences WITH a successor in ``ref`` (so the
    unigram table is the bigram table's marginal — one training pass)
    and V is the reference vocabulary size (+1 reserves OOV mass).

    Returns (id_col, n_bigrams, ce) with ce = mean over the document's
    bigrams of −ln p; documents with fewer than two tokens are absent
    (they have no bigrams to score)."""
    bg = _bigram_structs(text_col)
    ref_bg = ref.select(F.explode(F.expr(bg)).alias("b")).select(
        "b.w1", "b.w2"
    )
    c2 = ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    # scalar vocabulary size: one tiny job, driver-sized result
    vocab = (
        ref.select(F.explode(F.split(text_col, " ")).alias("w"))
        .agg(F.countDistinct("w"))
        .collect()[0][0]
    )
    if broadcast_model:
        c2, c1 = F.broadcast(c2), F.broadcast(c1)
    t = df.select(id_col, F.explode(F.expr(bg)).alias("b")).select(
        id_col, "b.w1", "b.w2"
    )
    denom_pad = float(alpha) * (int(vocab) + 1)
    p = (
        t.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .withColumn(
            "_nl",
            -F.log(
                (F.coalesce(F.col("_c2"), F.lit(0)) + F.lit(float(alpha)))
                / (F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(denom_pad))
            ),
        )
    )
    return p.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.avg("_nl").alias("ce")
    )


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR hashed-n-gram importance log-weights (Xie et al. 2023 §3):
    features are word bigrams hashed into ``n_buckets`` buckets; the
    target and raw unigram-over-buckets models are add-1 smoothed; a
    document's weight is Σ_feature log p_target(b) − log p_raw(b).

    The bucket of a bigram g is the first 16 bits of md5(g || salt)
    modulo n_buckets — engine-portable (DuckDB replays it from the same
    hex digits). Documents shorter than two tokens hash their whole text
    as one feature (the with_shingles convention), so every document
    gets a weight.

    Returns (id_col, n_feats, logw). The raw model is trained on ``df``
    itself, the target model on ``target``; both model tables have
    exactly n_buckets rows and broadcast unconditionally."""
    if n_buckets < 2 or n_buckets > 65536:
        raise ValueError("n_buckets must be in [2, 65536]")
    ws = f"split({text_col}, ' ')"
    grams = (
        f"CASE WHEN size({ws}) < 2 THEN array({text_col}) "
        f"ELSE transform(sequence(1, size({ws}) - 1), "
        f"i -> concat({ws}[i-1], ' ', {ws}[i])) END"
    )
    bucket = (
        f"pmod(cast(conv(substring(md5(concat(g, '{salt}')), 1, 4), 16, 10)"
        f" as int), {n_buckets})"
    )

    def buckets(frame: DataFrame, with_id: bool) -> DataFrame:
        cols = [id_col] if with_id else []
        return frame.select(
            *cols, F.explode(F.expr(grams)).alias("g")
        ).withColumn("b", F.expr(bucket)).drop("g")

    def model(frame: DataFrame, out: str) -> DataFrame:
        cnt = buckets(frame, with_id=False).groupBy("b").agg(
            F.count(F.lit(1)).alias("_n")
        )
        rows = cnt.agg(F.sum("_n")).collect()[0][0] or 0
        grid = frame.sparkSession.range(n_buckets).select(
            F.col("id").cast("int").alias("b")
        )
        probs = grid.join(cnt, "b", "left").select(
            "b",
            F.log(
                (F.coalesce(F.col("_n"), F.lit(0)) + F.lit(1.0))
                / F.lit(float(rows + n_buckets))
            ).alias(out),
        )
        return F.broadcast(probs)

    pt = model(target, "_lp_t")
    pr = model(df, "_lp_r")
    feats = buckets(df, with_id=True)
    scored = feats.join(pt, "b").join(pr, "b")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.sum(F.col("_lp_t") - F.col("_lp_r")).alias("logw"),
    )


def bpe_top_merges(
    docs: DataFrame,
    n_rounds: int = 3,
    text_col: str = "text",
):
    """Byte-pair-encoding merge learning — the tokenizer-training
    primitive: per round, count adjacent symbol pairs across the
    corpus vocabulary (weighted by word frequency), adopt the most
    frequent pair as a new symbol, re-segment, repeat.

    Determinism contract: words are lowercase [a-z]{2,} tokens with
    corpus occurrence counts; symbolization is a '·'-separated string
    ('·h·i·'); the winning pair orders by (count DESC, left ASC,
    right ASC); the merge applies `replace('·a·b·' → '·ab·')` FOUR
    times (the replace chain reaches the greedy-BPE fixpoint for
    every word tested — adjacent-run words up to ~16 symbols — and IS
    the operator's defined semantics; the oracle replays the identical
    chain). Each round's winner is a ONE-ROW driver collect (the
    kmeans collected-centroid pattern — metadata, never row data); the
    heavy pair count is one explode + partial+final aggregate over the
    VOCABULARY (bounded), not the corpus. Returns
    (round, sym_a, sym_b, pair_count)."""
    from pyspark.sql import Row

    vocab = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), " "),
                    lambda t: t.rlike("^[a-z]{2,}$"),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "rep",
            F.concat(
                F.regexp_replace(F.col("w"), "(.)", "·$1"), F.lit("·")
            ),
        )
    )
    spark = docs.sparkSession
    out = []
    cur = vocab.select("freq", "rep")
    for rnd in range(1, n_rounds + 1):
        pairs = (
            cur.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice({0}, 1, size({0}) - 1),"
                        " (s, i) -> struct(s as a, {0}[i + 1] as b))"
                        .format(
                            "filter(split(rep, '·'), s -> s != '')"
                        )
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            pairs.orderBy(
                F.desc("cnt"), F.asc("a"), F.asc("b")
            ).limit(1).collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        out.append((rnd, a, b, cnt))
        pat, rep = f"·{a}·{b}·", f"·{a}{b}·"
        merged = F.col("rep")
        for _ in range(4):
            merged = F.replace(
                merged, F.lit(pat), F.lit(rep)
            )
        cur = cur.select("freq", merged.alias("rep")).localCheckpoint()
    return spark.createDataFrame(
        [Row(round=r, sym_a=a, sym_b=b, pair_count=c)
         for r, a, b, c in out],
        "round int, sym_a string, sym_b string, pair_count long",
    )
