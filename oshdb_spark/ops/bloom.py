"""Pure-Catalyst Bloom-filter prefilter.

The 100 TB join-avoidance technique: instead of shuffling a delta
against a corpus dictionary to test membership, compress the corpus key
set into an m-bit bitmap ONCE (one aggregate, n_words longs), broadcast
it as a literal, and test each delta row map-side inside whole-stage
codegen. False positives are possible (rate (1-e^{-kn/m})^k), false
negatives are not — so the bitmap is a PREFILTER: only candidates pay
the exact join.

Determinism contract (oracle-replayable): double hashing with two
48-bit md5 integers, h_i = (h1 + i·h2) mod n_bits (Kirsch-Mitzenmacher)
— bit positions are a pure function of the key, so DuckDB replays
membership as position-set logic (a delta key is a candidate iff ALL
its k positions appear among the corpus's set positions) without any
bit twiddling.

Scale shape: build = map-side position fan-out (k rows per key) + ONE
n_words-row aggregate; test = a constant-size codegen expression over a
broadcast literal array (n_bits/64 longs). No shuffle touches the delta.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h48(expr: str, salt: str) -> str:
    return (
        f"cast(conv(substr(md5(concat({expr}, '{salt}')), 1, 12), 16, 10)"
        f" as bigint)"
    )


def _positions_expr(key_sql: str, n_bits: int, n_hashes: int) -> str:
    """SQL array of the key's k bit positions (int64-exact: h1, h2 <
    2^48 and i·h2 < 8·2^48 << 2^63 for any sane k)."""
    h1 = _h48(key_sql, ":b1")
    h2 = _h48(key_sql, ":b2")
    return (
        f"transform(sequence(0, {n_hashes - 1}),"
        f" i -> pmod({h1} + i * {h2}, {n_bits}))"
    )


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> list[int]:
    """Build the bitmap driver-side: n_bits/64 int64 words (unset words
    present as 0). One codegen fan-out + one tiny aggregate; the result
    is what a deployment stores/broadcasts between runs."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    key_sql = f"cast({key_col} as string)"
    pos = df.select(
        F.explode(
            F.expr(_positions_expr(key_sql, n_bits, n_hashes))
        ).alias("_p")
    )
    words = (
        pos.select(
            (F.col("_p") / 64).cast("long").alias("_w"),
            F.pmod(F.col("_p"), F.lit(64)).alias("_b"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), _b))").alias("_m"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[int(r["_w"])] = int(r["_m"])
    return out


def bloom_member(
    key_col: str,
    bitmap: list[int],
    n_hashes: int = 3,
) -> Column:
    """Codegen membership test against a broadcast literal bitmap: true
    iff every one of the key's k bits is set (possible false positive,
    never a false negative)."""
    n_bits = len(bitmap) * 64
    key_sql = f"cast({key_col} as string)"
    words = "array(" + ", ".join(f"{w}L" for w in bitmap) + ")"
    return F.expr(
        f"""
        forall({_positions_expr(key_sql, n_bits, n_hashes)},
               p -> (shiftright({words}[cast(p / 64 as int)],
                                cast(pmod(p, 64) as int)) & 1) = 1)
        """
    )


def bloom_prefilter(
    delta: DataFrame,
    corpus: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
    out: str = "bloom_candidate",
) -> DataFrame:
    """Tag each delta row with whether its key MIGHT be in the corpus
    (map-side, no shuffle of the delta). Rows with `out` = false are
    definitively absent and skip the exact join entirely."""
    bm = bloom_bitmap(corpus, key_col, n_bits, n_hashes)
    return delta.withColumn(out, bloom_member(key_col, bm, n_hashes))
