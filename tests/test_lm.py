"""ops/lm.py — CCNet-style bigram cross-entropy and DSIR importance
weights: hand-computed parity on tiny corpora plus the short-document
contracts."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_crossentropy_hand_computed(spark):
    from oshdb_spark.ops.lm import lm_crossentropy

    ref = _df(spark, [(100, "a b a b"), (101, "a c")])
    # ref bigrams: (a,b)x2, (b,a)x1, (a,c)x1 -> c1: a=3, b=1; V=3 (a,b,c)
    docs = _df(spark, [(1, "a b x")])
    out = lm_crossentropy(docs, ref, alpha=1.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bigrams"] == 2
    # p(b|a) = (2+1)/(3+4) ; p(x|b) = (0+1)/(1+4)
    exp = (-math.log(3 / 7) - math.log(1 / 5)) / 2
    assert r["ce"] == pytest.approx(exp, rel=1e-12)


def test_lm_crossentropy_short_docs_absent(spark):
    from oshdb_spark.ops.lm import lm_crossentropy

    ref = _df(spark, [(100, "a b")])
    docs = _df(spark, [(1, "single"), (2, "a b")])
    ids = {
        r["doc_id"] for r in lm_crossentropy(docs, ref).collect()
    }
    assert ids == {2}


def test_lm_crossentropy_shuffle_join_parity(spark):
    from oshdb_spark.ops.lm import lm_crossentropy

    ref = _df(spark, [(100, "w1 w2 w3 w1 w2"), (101, "w2 w4")])
    docs = _df(spark, [(i, f"w{i % 5} w{(i + 1) % 5} w{i % 3}") for i in range(20)])
    a = {
        r["doc_id"]: r["ce"]
        for r in lm_crossentropy(docs, ref, broadcast_model=True).collect()
    }
    b = {
        r["doc_id"]: r["ce"]
        for r in lm_crossentropy(docs, ref, broadcast_model=False).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)


def _bucket(gram: str, salt: str = "dsir", n: int = 256) -> int:
    return int(hashlib.md5((gram + salt).encode()).hexdigest()[:4], 16) % n


def test_dsir_logweights_hand_computed(spark):
    from oshdb_spark.ops.lm import dsir_logweights

    target = _df(spark, [(100, "a b a b")])
    raw = _df(spark, [(1, "a b c"), (2, "z")])
    out = {r["doc_id"]: r for r in dsir_logweights(raw, target).collect()}
    # target grams: 'a b','b a','a b' (3 feats); raw grams:
    # doc1 'a b','b c'; doc2 whole text 'z' (short-doc fallback)
    tcnt: dict[int, int] = {}
    for g in ("a b", "b a", "a b"):
        tcnt[_bucket(g)] = tcnt.get(_bucket(g), 0) + 1
    rcnt: dict[int, int] = {}
    for g in ("a b", "b c", "z"):
        rcnt[_bucket(g)] = rcnt.get(_bucket(g), 0) + 1

    def lw(grams):
        return sum(
            math.log((tcnt.get(_bucket(g), 0) + 1.0) / (3 + 256.0))
            - math.log((rcnt.get(_bucket(g), 0) + 1.0) / (3 + 256.0))
            for g in grams
        )

    assert out[1]["n_feats"] == 2
    assert out[1]["logw"] == pytest.approx(lw(["a b", "b c"]), rel=1e-12)
    assert out[2]["n_feats"] == 1
    assert out[2]["logw"] == pytest.approx(lw(["z"]), rel=1e-12)


def test_dsir_positive_for_target_like_docs(spark):
    from oshdb_spark.ops.lm import dsir_logweights

    target = _df(spark, [(100 + i, "good text signal here") for i in range(4)])
    raw = _df(
        spark,
        [(1, "good text signal here"), (2, "junk spam noise blob")],
    )
    out = {r["doc_id"]: r["logw"] for r in dsir_logweights(raw, target).collect()}
    assert out[1] > 0 > out[2]


def test_bpe_top_merges_matches_greedy_reference(spark):
    """bpe_top_merges vs a python classic-greedy BPE reference on a
    hand corpus (runs resolve within the replace chain), and the
    deterministic (count DESC, pair ASC) tie order."""
    import collections

    from oshdb_spark.ops.lm import bpe_top_merges

    docs = [
        ("the theme thesis then",),
        ("the other theory be be be",),
        ("banana bandana ananas",),
        ("x y z",),          # all below min length 2? x/y/z len 1 → dropped
    ]
    df = spark.createDataFrame(docs, "text string")
    got = [
        (r.round, r.sym_a, r.sym_b, r.pair_count)
        for r in bpe_top_merges(df, 5).orderBy("round").collect()
    ]

    words = collections.Counter()
    for (t,) in docs:
        for w in t.lower().split():
            if len(w) >= 2 and w.isalpha():
                words[w] += 1
    reps = {w: list(w) for w in words}

    def pair_counts():
        c = collections.Counter()
        for w, syms in reps.items():
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += words[w]
        return c

    want = []
    for rnd in range(1, 6):
        pc = pair_counts()
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rnd, a, b, cnt))
        for w, syms in reps.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            reps[w] = out
    assert got == want, (got, want)
    # 'he' and 'th' tie at 7 here; ('h','e') wins the lexicographic
    # tie-break the contract specifies
    assert got[0][1:3] == ("h", "e")
