"""Corpus-curation operators: contamination detection, policy-pattern
scanning, and temperature-based source mixing.

The three standard gates a pretraining corpus passes through after dedup:

- benchmark CONTAMINATION: flag training documents that share any
  word n-gram with an evaluation/benchmark set (the GPT-3 appendix-C /
  Gopher decontamination rule). Implemented as an ids-only hash join:
  each side reduces to distinct (id, md5(ngram)) pairs, the benchmark
  side (tiny by construction) broadcasts, and document payloads never
  enter the shuffle — the same discipline as dedup.lsh_neardup_pairs.
- POLICY-PATTERN scan (the PII-scrubbing mechanism): per-document match
  counts for a list of named regex patterns, pure Catalyst
  ``regexp_count`` (whole-stage codegen, no UDF). Patterns must stay in
  the RE2 ⋂ Java-regex portable subset so the DuckDB oracle can run the
  identical expression.
- temperature-based SOURCE MIXING (the multinomial-sampling rule of
  multilingual/multi-corpus training, e.g. the unigram-LM / mC4 α
  exponent): per-source keep rates r_s ∝ n_s^α / n_s, realized with the
  same deterministic md5-threshold membership as ops.sampling — the mix
  is reproducible, reshard-stable, and oracle-replayable. Rates are
  rounded to 6 decimals BEFORE thresholding so Spark and any replaying
  engine derive bit-identical thresholds (the float invariant of
  CLAUDE.md applied to membership, not just output columns).

Scale posture: the only shuffles are the ngram-hash join (ids only) and
the final aggregations; source counts are a k-row collect (k = number of
sources); everything else is map-side codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingles
from .sampling import rate_threshold


def contamination(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-train-document contamination against a benchmark set: the
    number of distinct word n-grams the document shares with ANY
    benchmark document, plus its total distinct n-gram count. A document
    with hits > 0 is 'contaminated' under the standard any-overlap rule;
    callers threshold on hits/ngrams for fractional policies.

    Returns train's (id_col) plus: ngrams (distinct count), hits
    (distinct shared count). Documents shorter than n words use their
    whole text as one n-gram (with_shingles semantics), so every doc is
    testable."""
    t = (
        with_shingles(train, text_col=text_col, k=n, out="_sh")
        .select(id_col, F.explode("_sh").alias("_g"))
        .withColumn("_h", F.md5("_g"))
        .select(id_col, "_h")
        .distinct()
    )
    b = (
        with_shingles(benchmark, text_col=text_col, k=n, out="_sh")
        .select(F.explode("_sh").alias("_g"))
        .select(F.md5("_g").alias("_h"))
        .distinct()
    )
    hits = (
        t.join(F.broadcast(b), "_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    totals = t.groupBy(id_col).agg(F.count(F.lit(1)).alias("ngrams"))
    return (
        totals.join(hits, id_col, "left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)))
    )


def pattern_scan(
    df: DataFrame,
    patterns: dict[str, str],
    text_col: str = "text",
) -> DataFrame:
    """Append one ``<name>_n`` match-count column per named regex
    pattern — the mechanism behind PII scrubbing / policy filtering.
    Pure Catalyst regexp_count; keep patterns in the RE2-compatible
    subset (no backrefs, no lookaround) so external engines can replay
    the exact counts."""
    out = df
    for name, pat in sorted(patterns.items()):
        out = out.withColumn(
            f"{name}_n", F.expr(f"regexp_count({text_col}, '{pat}')")
        )
    return out


def redact(
    df: DataFrame,
    patterns: dict[str, tuple[str, str]],
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """PII scrubbing: pattern_scan's sibling that actually rewrites the
    text. For each named pattern (regex, replacement): append a
    ``<name>_n`` match count measured on the ORIGINAL text (independent
    scans — counts don't depend on replacement order), then emit the
    redacted text with all replacements applied sequentially in sorted
    name order (the one deterministic contract when patterns interact;
    callers choose replacements that don't re-match later patterns).
    Pure Catalyst (regexp_count + regexp_replace, whole-stage codegen);
    patterns must stay in the RE2 ⋂ Java portable subset so external
    engines replay identical counts and bytes."""
    out = df
    red = F.col(text_col)
    for name, (pat, repl) in sorted(patterns.items()):
        out = out.withColumn(
            f"{name}_n", F.regexp_count(F.col(text_col), F.lit(pat))
        )
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col or f"{text_col}_redacted", red)


def source_mix_rates(
    counts: dict[str, int], alpha: float, target: int
) -> dict[str, float]:
    """Temperature-α mixing rates: w_s = n_s^α / Σ n_t^α, keep rate
    r_s = min(1, target·w_s / n_s), rounded to 6 decimals (the
    engine-portable quantization — thresholds derive from the ROUNDED
    rate on every engine)."""
    tot = sum(c**alpha for c in counts.values())
    return {
        s: round(min(1.0, target * (c**alpha) / tot / c), 6)
        for s, c in counts.items()
        if c > 0
    }


def source_mix_sample(
    df: DataFrame,
    alpha: float,
    target: int,
    by: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic temperature-mixed sample: per-source md5-threshold
    membership at the α-mixing rate. Two passes: a k-row count collect
    (k = distinct sources — driver-sized at any corpus scale), then one
    codegen filter with a CASE threshold per source. Membership depends
    only on (id, salt, rounded rate) — reproducible and
    layout-independent."""
    counts = {
        r[by]: r["n"]
        for r in df.groupBy(by).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rates = source_mix_rates(counts, alpha, target)
    thr = F.lit(rate_threshold(0.0))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(by) == s, F.lit(rate_threshold(r))).otherwise(thr)
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    return df.filter(F.md5(key) < thr)


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL canonicalization — the C4/RefinedWeb curation step that makes
    URL-level dedup and per-domain quality statistics possible: messy
    crawl URLs reduce to a canonical form so the same page fetched as
    `http://WWW.Site.com/a/1/?utm_source=feed` and
    `https://site.com/a/1` counts ONCE.

    Rules (the standard normalization set):
      lowercase → strip scheme → strip fragment → drop tracking query
      params (utm_*, fbclid=, gclid=; other params kept in order) →
      strip trailing slashes → strip one leading `www.` → registered
      domain = last two host labels (naive two-label rule; multi-label
      public suffixes like co.uk are out of scope and documented).

    Everything is Catalyst string/array built-ins (split, higher-order
    filter, array_join, trim) — whole-stage codegen, no UDF, and every
    step has a 1:1 DuckDB equivalent so oracles replay it term-for-term.
    Adds `canon_url` and `domain`."""
    u = F.lower(F.col(url_col))
    u = F.when(
        u.contains("://"), F.substring_index(u, "://", -1)
    ).otherwise(u)
    u = F.substring_index(u, "#", 1)
    base = F.substring_index(u, "?", 1)
    q = F.when(u.contains("?"), F.substring_index(u, "?", -1)).otherwise(
        F.lit("")
    )
    keep = F.filter(
        F.split(q, "&"),
        lambda p: (~(
            p.startswith("utm_")
            | p.startswith("fbclid=")
            | p.startswith("gclid=")
        )) & (p != ""),
    )
    qs = F.array_join(keep, "&")
    # '/+$' matches at most once (anchored), so Spark's replace-all and
    # DuckDB's replace-first regexp_replace agree
    base = F.regexp_replace(base, "/+$", "")
    base = F.when(
        base.startswith("www."), base.substr(F.lit(5), F.length(base))
    ).otherwise(base)
    canon = F.when(qs != "", F.concat(base, F.lit("?"), qs)).otherwise(base)
    host = F.substring_index(base, "/", 1)
    labels = F.split(host, "[.]")
    domain = F.when(
        F.size(labels) >= 2,
        F.concat(
            F.element_at(labels, -2), F.lit("."), F.element_at(labels, -1)
        ),
    ).otherwise(host)
    return df.withColumn("canon_url", canon).withColumn("domain", domain)


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per registered domain after canonicalization: document count,
    distinct canonical URLs, and how many documents sit on a DUPLICATED
    canonical URL (the URL-level dedup signal crawl curation acts on).
    Two hash aggregates (canon_url then domain), all codegen."""
    per_url = (
        with_canonical_url(df, url_col)
        .groupBy("domain", "canon_url")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return per_url.groupBy("domain").agg(
        F.sum("_cnt").alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(
            F.when(F.col("_cnt") > 1, F.col("_cnt")).otherwise(F.lit(0))
        ).alias("n_dup_docs"),
    )
