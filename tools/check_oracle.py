"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
in DuckDB over the same parquet dir, then compares row count, sorted column
names, and (row-sorted) values exactly. Floats are compared bitwise first,
then with a reported max-abs-diff so near-misses are visible.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        return problems
    a, b = canon(sdf), canon(odf)
    # The driver hashes value REPRESENTATIONS, not numeric values: a
    # DuckDB HUGEINT sum lands in pandas as float64 ("123.0") while the
    # Spark side is int64 ("123"), hash-mismatching despite equal values.
    # Guard every oracle against that class by requiring the same pandas
    # dtype KIND after canonicalization (int widths render identically,
    # so int32 vs int64 is fine; int vs float is not — driver r03
    # evidence: kmeans_centroids int32/int64 hash-matched, the four
    # HUGEINT→float64 oracles did not).
    def _kind(dt):
        k = np.dtype(dt).kind
        return "i" if k in "iu" else k

    for c in a.columns:
        if _kind(a[c].dtype) != _kind(b[c].dtype):
            problems.append(
                f"col {c}: DTYPE spark={a[c].dtype} oracle={b[c].dtype} "
                "(driver hash would diverge — CAST the oracle)"
            )
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
            if not eq.all():
                d = np.nanmax(np.abs(av - bv))
                problems.append(f"col {c}: {int((~eq).sum())} diffs, maxabs={d:.3e}")
        else:
            if not (av == bv).all():
                i = int(np.argmax(av != bv))
                problems.append(f"col {c}: {int((av != bv).sum())} diffs, first at row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from oshdb_spark.session import build_session

    spark = build_session("check-oracle")
    con = duck_conn(sf_dir)
    qs = E.queries()
    oracles = E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"okay {name}: rows={len(sdf)} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
