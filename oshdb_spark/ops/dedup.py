"""Deduplication operators for large-scale training-data pipelines.

All hot paths are pure Catalyst (built-in functions only — no Python), so
they run inside whole-stage codegen and scale to the 10^12-doc tier:

- exact_dedup            hash-groupBy on a content fingerprint
- shingles               k-word shingle sets (the shared primitive)
- minhash_lsh_pairs      MinHash signatures → LSH band buckets → candidate
                         pairs → exact-Jaccard verification
- simhash                64-bit SimHash (token-hash bit voting)
- embedding_neardup_pairs  cosine near-duplicate pairs over embeddings

Hashing is md5-hex-string based end to end: md5 is available and
bit-identical in Spark, DuckDB, and Python, which makes every stage
oracle-checkable; hex strings of equal length compare lexicographically
exactly like the underlying integers, so `min(md5(...))` IS a MinHash.

Scale notes (100 TB posture):
- the only shuffles are the LSH bucket groupBy/self-join (keyed by
  (band, signature) — uniformly distributed by construction, no skew) and
  the final pair dedup;
- signatures are fixed-width arrays computed map-side; band explosion is
  bounded (n_bands rows per doc);
- the pairwise verify join only touches LSH candidates, never the full
  cross product.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content: keeper id (min id), duplicate count.

    Columns: fingerprint, keep_id, dup_count.
    """
    return (
        df.withColumn("fingerprint", F.md5(F.col(text_col)))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", k: int = 3, out: str = "shingles"
) -> DataFrame:
    """Distinct k-word shingles of a whitespace-tokenized text column.

    Docs with fewer than k words get their whole text as the one shingle
    (so every doc has a non-empty shingle set).
    """
    words = f"split({text_col}, ' ')"
    expr = f"""
      CASE WHEN size({words}) < {k} THEN array({text_col})
      ELSE array_distinct(transform(
        sequence(1, size({words}) - {k} + 1),
        i -> concat_ws(' ', slice({words}, i, {k}))))
      END
    """
    return df.withColumn(out, F.expr(expr))


def with_minhash(
    df: DataFrame,
    shingle_col: str = "shingles",
    n_hashes: int = 16,
    out: str = "minhash",
) -> DataFrame:
    """MinHash signature: for hash j, min over shingles of
    md5(shingle || ':' || j) — an independent permutation per j, identical
    across Spark/DuckDB/Python."""
    sig = ", ".join(
        f"array_min(transform({shingle_col}, s -> md5(concat(s, ':', '{j}'))))"
        for j in range(n_hashes)
    )
    return df.withColumn(out, F.expr(f"array({sig})"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_bands: int = 4,
    rows_per_band: int = 4,
    jaccard_threshold: float | None = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding, optionally
    verified with exact shingle Jaccard.

    Returns (id_a, id_b[, jaccard]) with id_a < id_b, one row per pair.
    The band signature is md5 of the band's minhash slice; the bucket join
    shuffles on (band, signature) — uniform keys, no skew handling needed.
    """
    n_hashes = n_bands * rows_per_band
    base = with_minhash(
        with_shingles(df.select(id_col, text_col), text_col, k), n_hashes=n_hashes
    )
    # IDS ONLY through the bucket self-join: shipping full shingle arrays
    # on both sides of the (band, sig) shuffle multiplies the payload by
    # 2·n_bands at scale; instead pair ids, dedup, then re-join shingles
    # for the (much smaller) candidate set
    bands = base.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {n_bands - 1}), b -> named_struct(
                  'band', b,
                  'sig', md5(concat_ws('|',
                            slice(minhash, b * {rows_per_band} + 1,
                                  {rows_per_band})))))
                """
            )
        ).alias("bs"),
    ).select("_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = base.select(F.col(id_col).alias("_sid"), "shingles")
    pairs = (
        pairs.join(sh.withColumnRenamed("shingles", "sh_a"),
                   F.col("id_a") == F.col("_sid")).drop("_sid")
        .join(sh.withColumnRenamed("shingles", "sh_b"),
              F.col("id_b") == F.col("_sid")).drop("_sid")
    )
    jac = F.expr(
        "size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))"
    )
    pairs = pairs.withColumn("jaccard", jac).drop("sh_a", "sh_b")
    if jaccard_threshold is not None:
        pairs = pairs.filter(F.col("jaccard") >= jaccard_threshold)
    return pairs


def with_simhash(
    df: DataFrame, text_col: str = "text", out: str = "simhash", bits: int = 32
) -> DataFrame:
    """SimHash over whitespace tokens: per bit, tokens vote +1/-1 by their
    md5-derived bit; the sign vector packs into a BIGINT. Pure Catalyst
    (aggregate + zip_with array folding)."""
    words = f"split({text_col}, ' ')"
    # token hash: 64 bits from two 32-bit conv() halves. Hex chars 1-8
    # land in the LOW word so every bit position j < 32 is identical to
    # the original 32-bit hash (keeps bits<=32 outputs and their oracles
    # byte-stable); chars 9-16 fill the high word so bits 32-63 carry
    # real entropy. bit_get() reads bit j sign-safely (an arithmetic
    # `>> j % 2` misreads bit 63 once the bigint goes negative).
    tok_hash = (
        f"(cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) | "
        f"shiftleft(cast(conv(substring(md5(t), 9, 8), 16, 10) as bigint), 32))"
    )
    tok_bits = (
        f"transform(sequence(0, {bits - 1}), j -> "
        f"CASE WHEN bit_get({tok_hash}, cast(j as int)) = 1 "
        f"THEN 1 ELSE -1 END)"
    )
    votes = (
        f"aggregate({words}, "
        f"transform(sequence(0, {bits - 1}), j -> 0L), "
        f"(acc, t) -> zip_with(acc, {tok_bits}, (a, b) -> a + cast(b as bigint)))"
    )
    pack = (
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), "
        f"(v, j) -> CASE WHEN v > 0 THEN shiftleft(1L, cast(j as int)) ELSE 0L END), "
        f"0L, (a, b) -> a + b)"
    )
    return df.withColumn(out, F.expr(pack))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on half-hash
    bands (a pair within distance d shares at least one of d+1 bands).

    Band keys use a bitwise mask, not ``%``: at ``bits=64`` the packed
    hash can be negative (bit 63), and Spark's sign-carrying remainder
    would then give equal band bits unequal keys, silently dropping
    pairs. The mask is exact for every width."""
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    mask = (1 << width) - 1
    h = with_simhash(df.select(id_col, text_col), text_col, bits=bits)
    blocks = h.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), b -> named_struct("
                f"'blk', b, 'key', (simhash >> (b * {width})) & {mask}))"
            )
        ).alias("bk"),
    ).select("_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    l, r = blocks.alias("l"), blocks.alias("r")
    ham = F.expr("bit_count(l.simhash ^ r.simhash)")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"), "hamming"
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def lsh_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
    n_planes: int = 8,
    multiprobe: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs via LSH bucketing — the 10^12-row scale
    path: NO cartesian product anywhere.

    Plan: hyperplane-bucket every vector, explode each into its bucket
    plus Hamming-`multiprobe` neighbor buckets, self-join on bucket (ids
    only — no vector payload through the shuffle), dedup candidate pairs,
    then ONE keyed re-join per side fetches the vectors for the exact
    cosine verify.

    Recall: identical vectors always share their home bucket (recall 1.0
    at threshold→1); near-dups separated by >2·multiprobe sign flips are
    missed — tune n_planes/multiprobe (standard LSH trade-off).
    """
    from .similarity import with_lsh_bucket

    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    b = with_lsh_bucket(df.select(id_col, vec_col), dim, n_planes)
    alts = ["bucket"]
    if multiprobe >= 1:
        alts += [f"bucket ^ {1 << i}" for i in range(n_planes)]
    probe_expr = "array(" + ", ".join(alts) + ")"
    probes = b.select(
        F.col(id_col).alias("_id"),
        F.explode(F.expr(probe_expr)).alias("pbucket"),
    )
    l, r = probes.alias("l"), probes.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.pbucket") == F.col("r.pbucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return _cosine_verify(cand, df, vec_col, id_col, threshold)


def _cosine_verify(
    cand: DataFrame, df: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """Exact-cosine verification of (id_a, id_b) candidate pairs: one
    keyed re-join per side fetches the vectors (candidates only — the
    vector payload never rides the candidate-generation shuffle)."""
    v = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.expr(
            f"sqrt(aggregate({vec_col}, cast(0 as double),"
            f" (a, x) -> a + cast(x as double) * cast(x as double)))"
        ).alias("_n"),
    )
    cand = (
        cand.join(
            v.select(
                F.col("_vid"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
            ),
            F.col("id_a") == F.col("_vid"),
        ).drop("_vid")
        .join(
            v.select(
                F.col("_vid"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
            ),
            F.col("id_b") == F.col("_vid"),
        ).drop("_vid")
    )
    dot = F.expr(
        "aggregate(zip_with(_va, _vb, (x, y) -> x * y),"
        " cast(0 as double), (a, x) -> a + x)"
    )
    extra = [
        c for c in cand.columns
        if c not in ("id_a", "id_b", "_va", "_na", "_vb", "_nb")
    ]
    return (
        cand.withColumn("cosine", dot / (F.col("_na") * F.col("_nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine", *extra)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.99,
) -> DataFrame:
    """Cosine near-duplicate pairs (id_a < id_b) over an embedding column.

    Brute-force O(n²) — the VERIFICATION baseline only; the scale path is
    lsh_neardup_pairs (bucketed, no cartesian product)."""
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        F.expr(
            f"sqrt(aggregate({vec_col}, cast(0 as double),"
            f" (a, x) -> a + cast(x as double) * cast(x as double)))"
        ).alias("_n"),
    )
    l, r = v.alias("l"), v.alias("r")
    dot = F.expr(
        "aggregate(zip_with(l._v, r._v, (x, y) -> x * y),"
        " cast(0 as double), (a, x) -> a + x)"
    )
    return (
        l.join(r, F.col("l._id") < F.col("r._id"))
        .withColumn("cosine", dot / (F.col("l._n") * F.col("r._n")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"), "cosine")
    )


def semantic_dedup_pairs(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): near-duplicate
    pairs scoped to k-means clusters. Candidate generation IS the cluster
    assignment — pairwise cosine runs only within a cluster, so total work
    is O(Σ cluster_size²) instead of O(n²), and a pair of semantically
    similar documents in different clusters is out of scope by design
    (that's the algorithm's recall trade-off, not an implementation gap).

    Plan shape: map-side centroid argmin (broadcast literal, no shuffle),
    ids-only self-join keyed by cluster id, then the exact-cosine verify
    re-join. At 10^12 rows k should grow ~√n (SemDeDup uses k≈100k for
    LAION-scale) so cluster populations — and the quadratic term — stay
    bounded; skewed clusters are the k-means failure mode, not a join-key
    artifact, and AQE's skew-join split handles the residue.

    Returns (id_a, id_b, cosine, cluster) with id_a < id_b.
    """
    from .clustering import kmeans_assign

    a = kmeans_assign(df.select(id_col, vec_col), cents, vec_col=vec_col,
                      out="cluster")
    ids = a.select(F.col(id_col).alias("_id"), "cluster")
    cand = (
        ids.alias("l")
        .join(
            ids.alias("r"),
            (F.col("l.cluster") == F.col("r.cluster"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l.cluster").alias("cluster"),
        )
    )
    return _cosine_verify(cand, df, vec_col, id_col, threshold)


def semantic_dedup_keep(
    df: DataFrame,
    cents: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """The keep-set of SemDeDup: drop every row that appears as the
    HIGHER id of a within-cluster near-duplicate pair (deterministic
    lowest-id representative — SemDeDup's keep-random / keep-far-from-
    centroid variants differ only in this tie-break). Anti-join keyed by
    id: no extra shuffle beyond the pair generation."""
    pairs = semantic_dedup_pairs(df, cents, vec_col, id_col, threshold)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dropped, id_col, "left_anti")


def _winnowed_fingerprints_expr(
    text_col: str, window: int, winnow: int
) -> str:
    """SQL expression: the per-document DISTINCT winnowed fingerprint set
    of `window`-token runs. Every window position is hashed, then each
    run of `winnow` consecutive hashes contributes its minimum — the
    winnowing scheme (Schleimer/Wilkerson/Aiken, MOSS), which guarantees
    ALIGNMENT-INDEPENDENTLY that any token run of length
    >= window + winnow - 1 shared by two documents yields at least one
    common fingerprint (a position-stride sample has no such guarantee:
    the same run at different offsets samples different windows). Docs
    shorter than `window` tokens contribute nothing."""
    words = f"split({text_col}, ' ')"
    m = f"(size({words}) - {window} + 1)"
    hashes = (
        f"transform(sequence(1, {m}),"
        f" p -> md5(concat_ws(' ', slice({words}, p, {window}))))"
    )
    return f"""
      CASE WHEN {m} < 1 THEN array()
      WHEN {m} <= {winnow} THEN array(array_min({hashes}))
      ELSE array_distinct(transform(
        sequence(1, {m} - {winnow} + 1),
        i -> array_min(slice({hashes}, i, {winnow}))))
      END
    """


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    winnow: int = 4,
) -> DataFrame:
    """Exact-substring duplicate spans: every winnowed `window`-token
    fingerprint that occurs in >= 2 distinct documents.

    The scalable Spark form of suffix-array substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    instead of a corpus-wide suffix array (a global sort of every token
    position), each doc emits its winnowed fingerprint set map-side —
    O(tokens × window) local hashing, ~2/(winnow+1) of windows selected —
    and one md5-keyed aggregation (uniform keys, skew-free) finds every
    shared run of >= window + winnow - 1 tokens, at any alignment.

    Columns: span_hash, n_docs, keep_id (min id containing it).
    """
    fp = _winnowed_fingerprints_expr(text_col, window, winnow)
    spans = df.select(F.col(id_col), F.explode(F.expr(fp)).alias("span_hash"))
    return (
        spans.groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),  # fingerprints are
            # per-doc distinct, so plain count IS the distinct doc count
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def with_dup_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    winnow: int = 4,
) -> DataFrame:
    """Per-document substring-duplication stats: winnowed fingerprint
    count, how many of those fingerprints appear in some OTHER document,
    and the duplicated fraction — the per-doc contamination signal
    pipelines threshold on before dropping or trimming documents.

    Columns: id_col, n_fp, dup_fp, dup_frac. The join back is keyed by
    span_hash (uniform md5) and candidate-sized: only duplicated hashes
    flow into it."""
    fp = _winnowed_fingerprints_expr(text_col, window, winnow)
    spans = df.select(F.col(id_col), F.explode(F.expr(fp)).alias("span_hash"))
    dup = duplicate_spans(df, text_col, id_col, window, winnow).select(
        "span_hash", F.lit(1).alias("_dup")
    )
    per_doc = (
        spans.join(dup, "span_hash", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("dup_fp"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_fp", F.lit(0)).alias("n_fp"),
            F.coalesce("dup_fp", F.lit(0)).alias("dup_fp"),
            F.round(
                F.when(
                    F.coalesce("n_fp", F.lit(0)) > 0,
                    F.coalesce("dup_fp", F.lit(0)) / F.col("n_fp"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


class CorpusIndex(NamedTuple):
    """The three storable dedup artifacts of a corpus — at production
    scale these live as tables (updated when the corpus grows) and every
    arriving delta joins against them instead of recomputing the corpus
    side: fingerprints (fingerprint, doc_id = lowest id with that
    content), band signatures (doc_id, band, sig), and per-doc shingle
    sets (doc_id, shingles) for the verify stage."""

    fingerprints: DataFrame
    bands: DataFrame
    shingles: DataFrame


def build_corpus_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_bands: int = 4,
    rows_per_band: int = 4,
) -> CorpusIndex:
    """Compute the CorpusIndex artifacts (all plain DataFrames — write
    them to parquet to persist; incremental_dedup(index=read_back) is
    bit-identical to recomputing from the corpus, pytest-pinned)."""
    c = corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    fps = (
        c.select(F.md5("_t").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    bands = _band_signatures(c, "doc_id", k, n_bands, rows_per_band)
    sh = with_shingles(c, "_t", k).select("doc_id", "shingles")
    return CorpusIndex(fingerprints=fps, bands=bands, shingles=sh)


def _band_signatures(df, idc, k, n_bands, rows_per_band):
    base = with_minhash(with_shingles(df, "_t", k),
                        n_hashes=n_bands * rows_per_band)
    return base.select(
        F.col(idc),
        F.explode(
            F.expr(
                f"""
                transform(sequence(0, {n_bands - 1}), b -> named_struct(
                  'band', b,
                  'sig', md5(concat_ws('|',
                            slice(minhash, b * {rows_per_band} + 1,
                                  {rows_per_band})))))
                """
            )
        ).alias("bs"),
    ).select(idc, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def incremental_dedup(
    delta: DataFrame,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_bands: int = 4,
    rows_per_band: int = 4,
    jaccard_threshold: float = 0.5,
    index: CorpusIndex | None = None,
) -> DataFrame:
    """Classify a DELTA shard against an existing corpus — the production
    shape of dedup: new crawl slices arrive continuously and must be
    checked against what the corpus already holds, never corpus × corpus.

    Pass either `corpus` (raw docs — the index is computed inline) or
    `index` (a stored CorpusIndex read back from parquet — the 10^12-doc
    path where the corpus artifacts are maintained incrementally and the
    raw corpus is never rescanned per delta).

    One row per delta doc: (id_col, verdict, match_id, jaccard) with
    verdict ∈ {'exact', 'near', 'unique'}:
    - exact:  identical content exists in the corpus (md5 fingerprint);
              match_id = lowest such corpus id, jaccard = 1.0;
    - near:   no exact match, but some corpus doc shares a MinHash-LSH
              band AND verifies at shingle Jaccard >= threshold;
              match_id = lowest verified corpus id, jaccard = that
              match's Jaccard (rounded to 6);
    - unique: neither; match_id/jaccard null.

    Scale posture (10^12-doc corpus, 10^8-doc delta):
    - exact pass: the fingerprint dictionary join shuffles ids only;
    - near pass: delta band signatures are computed map-side; the
      candidate join keys on (band, sig) — uniform by construction —
      with IDS-ONLY payloads, exactly like minhash_lsh_pairs; shingles
      are re-joined only for the candidate pairs;
    - verdict merge: two left joins keyed by the delta id.

    Determinism contract (what the DuckDB oracle replays): md5-based
    shingle MinHash identical to minhash_lsh_pairs; ties on jaccard
    resolve to the LOWEST corpus id (struct-min over (neg jaccard, id)
    would prefer highest jaccard — instead the contract is simply
    min(id) among verified matches, so the reported jaccard is the
    lowest-id match's, not the best match's)."""
    if (corpus is None) == (index is None):
        raise ValueError("pass exactly one of `corpus` or `index`")
    if index is None:
        index = build_corpus_index(
            corpus, text_col, id_col, k, n_bands, rows_per_band
        )
    d = delta.select(F.col(id_col).alias("_did"), F.col(text_col).alias("_t"))

    # ---- exact pass: corpus fingerprint dictionary (ids only) ----
    cfp = index.fingerprints.select(
        F.col("fingerprint").alias("_fp"), F.col("doc_id").alias("_exact_id")
    )
    dfp = d.select("_did", F.md5("_t").alias("_fp"))
    exact = dfp.join(cfp, "_fp", "left").select("_did", "_exact_id")

    # ---- near pass: delta bands × corpus bands, ids only ----
    db = _band_signatures(d, "_did", k, n_bands, rows_per_band)
    cb = index.bands.select(
        F.col("doc_id").alias("_cid"), "band", "sig"
    )
    cand = (
        db.join(cb, ["band", "sig"])
        .select("_did", "_cid")
        .dropDuplicates(["_did", "_cid"])
    )
    dsh = with_shingles(d, "_t", k).select("_did", F.col("shingles").alias("_sha"))
    csh = index.shingles.select(
        F.col("doc_id").alias("_cid"), F.col("shingles").alias("_shb")
    )
    verified = (
        cand.join(dsh, "_did")
        .join(csh, "_cid")
        .withColumn(
            "_jac",
            F.expr("size(array_intersect(_sha, _shb))"
                   " / size(array_union(_sha, _shb))"),
        )
        .filter(F.col("_jac") >= jaccard_threshold)
        .groupBy("_did")
        .agg(
            F.min("_cid").alias("_near_id"),
            # the lowest-id match's jaccard: min over (id, jac) structs
            # orders by id first, so .jac is the min id's value
            F.min(F.struct(F.col("_cid"), F.col("_jac")))["_jac"].alias(
                "_near_jac"
            ),
        )
    )

    out = (
        d.select("_did")
        .join(exact, "_did", "left")
        .join(verified, "_did", "left")
        .select(
            F.col("_did").alias(id_col),
            F.when(F.col("_exact_id").isNotNull(), F.lit("exact"))
            .when(F.col("_near_id").isNotNull(), F.lit("near"))
            .otherwise(F.lit("unique"))
            .alias("verdict"),
            F.coalesce("_exact_id", "_near_id").alias("match_id"),
            F.when(F.col("_exact_id").isNotNull(), F.lit(1.0))
            .otherwise(F.round(F.col("_near_jac"), 6))
            .alias("jaccard"),
        )
    )
    return out


def typo_pairs(
    docs: DataFrame,
    min_len: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Edit-distance-1 token pairs via the SymSpell deletion-
    neighborhood trick — the scalable spell-variant/typo-dedup
    primitive: two tokens are within Levenshtein distance 1 iff they
    share a single-deletion variant (deletion ↔ insertion ↔ same-
    position substitution), so the O(n²) all-pairs comparison becomes
    a hash JOIN on variant keys (each token explodes into len+1
    variants — fan-out bounded by token length), followed by an exact
    `levenshtein` verify that kills the distance-2 false positives
    the shared-variant filter admits.

    Tokens: lowercase [a-z]{min_len,} vocabulary with document
    frequencies. Candidates dedupe BEFORE the verify (distinct pair
    ids), so the edit-distance evaluation runs once per candidate
    pair. Returns (tok_a, tok_b, n_a, n_b) with tok_a < tok_b and
    levenshtein(tok_a, tok_b) == 1 — exact, both engines implement
    classic Levenshtein."""
    vocab = (
        docs.select(
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), " "),
                        lambda t: t.rlike(
                            "^[a-z]{" + str(int(min_len)) + ",}$"
                        ),
                    )
                )
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        # consumed by the variant fan-out (twice) and both frequency
        # joins — materialize the vocabulary once
        .localCheckpoint()
    )
    # variants: the token itself + every single-deletion string
    var = vocab.select(
        "tok",
        F.explode(
            F.concat(
                F.array(F.col("tok")),
                F.transform(
                    F.sequence(F.lit(1), F.length("tok")),
                    lambda i: F.concat(
                        F.col("tok").substr(F.lit(1), i - 1),
                        F.col("tok").substr(i + 1, F.length("tok")),
                    ),
                ),
            )
        ).alias("v"),
    )
    a = var.select(F.col("tok").alias("tok_a"), "v")
    b = var.select(F.col("tok").alias("tok_b"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
    )
    hits = cand.filter(
        F.levenshtein("tok_a", "tok_b") == 1
    )
    na = vocab.select(
        F.col("tok").alias("tok_a"), F.col("n_docs").alias("n_a")
    )
    nb = vocab.select(
        F.col("tok").alias("tok_b"), F.col("n_docs").alias("n_b")
    )
    return hits.join(na, "tok_a").join(nb, "tok_b").select(
        "tok_a", "tok_b", "n_a", "n_b"
    )
