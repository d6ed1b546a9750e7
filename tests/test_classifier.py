"""ops/classifier.py — hashed-feature logistic regression: exact parity
with a pure-python replay of the quantized GD, plus separation and
layout-independence contracts."""

import hashlib
import math

import pytest

from pyspark.sql import functions as F


def _bucket(gram: str, salt: str = "clf", n: int = 256) -> int:
    return int(hashlib.md5((gram + salt).encode()).hexdigest()[:4], 16) % n


def _feats(text: str) -> dict[int, float]:
    ws = text.split(" ")
    grams = [text] if len(ws) < 2 else [
        f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
    ]
    out: dict[int, float] = {}
    for g in grams:
        b = _bucket(g)
        out[b] = out.get(b, 0.0) + 1.0
    return {b: c / len(grams) for b, c in out.items()}


def _train_py(rows, iters=2, lr=1.0, n_buckets=256):
    w = [0.0] * n_buckets
    bias = 0.0
    n = len(rows)
    for _ in range(iters):
        gw = [0.0] * n_buckets
        gb = 0.0
        for text, y in rows:
            fx = _feats(text)
            z = sum(x * w[b] for b, x in fx.items()) + bias
            r = y - 1.0 / (1.0 + math.exp(-z))
            for b, x in fx.items():
                gw[b] += x * r
            gb += r
        w = [round(w[b] + lr * gw[b] / n, 6) for b in range(n_buckets)]
        bias = round(bias + lr * gb / n, 6)
    return w, bias


ROWS = [
    ("good clean prose here", 1),
    ("prose here good clean", 1),
    ("clean good here text", 1),
    ("spam junk noise blob", 0),
    ("noise blob spam junk", 0),
    ("blob junk noise spam", 0),
    ("good clean junk blob", 0),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(ROWS)],
        "doc_id long, text string, y int",
    )


def test_train_matches_python_replay(spark):
    from oshdb_spark.ops.classifier import hashed_logreg_train

    w, b = hashed_logreg_train(_df(spark), "y")
    ew, eb = _train_py(ROWS)
    assert b == pytest.approx(eb, abs=0)
    assert w == pytest.approx(ew, abs=0)


def test_score_matches_python_and_separates(spark):
    from oshdb_spark.ops.classifier import (
        hashed_logreg_score,
        hashed_logreg_train,
    )

    d = _df(spark)
    w, b = hashed_logreg_train(d, "y", iters=4)
    got = {
        r["doc_id"]: r["score"]
        for r in hashed_logreg_score(d, w, b).collect()
    }
    for i, (text, _y) in enumerate(ROWS):
        fx = _feats(text)
        z = sum(x * w[bk] for bk, x in fx.items()) + b
        assert got[i] == pytest.approx(round(1 / (1 + math.exp(-z)), 6), abs=0)
    pos = [got[i] for i, (_t, y) in enumerate(ROWS) if y == 1]
    neg = [got[i] for i, (_t, y) in enumerate(ROWS) if y == 0]
    assert min(pos) > max(neg)


def test_layout_independence(spark):
    from oshdb_spark.ops.classifier import hashed_logreg_train

    d = _df(spark)
    a = hashed_logreg_train(d.repartition(1), "y")
    b = hashed_logreg_train(d.repartition(7, "doc_id"), "y")
    assert a == b
