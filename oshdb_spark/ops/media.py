"""Multimodal (binary) column plumbing.

Media payloads are opaque `binary` columns with typed metadata, processed
via Arrow-batched mapInPandas — the schema, batch shape, partitioning and
UDF signatures are real and tested; the actual decoders (image/audio libs
are not in this container) are STUBBED behind `decoder=` with a
deterministic fake, and raise NotImplementedError when a real decode is
requested.

At 100 TB the binary column dominates I/O: the mapInPandas stage is narrow
(no shuffle), metadata-only queries never touch the bytes thanks to
Parquet column pruning, and frame sampling emits bounded output per row.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque binary payload column from text (the driver
    testdata has no real media; the plumbing is what's under test)."""
    return df.withColumn("media", F.encode(F.col(text_col), "UTF-8"))


def stub_decoder(buf: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: dimensions derived from byte length.
    Replace with a real (PIL/ffmpeg) decoder outside this sandbox."""
    n = len(buf)
    return (n % 640 + 1, (n * 7) % 480 + 1, 3, "fake")


def media_metadata(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], tuple[int, int, int, str]] | None = None,
) -> DataFrame:
    """Decode/inspect each media blob → typed metadata rows (MEDIA_META).

    decoder=None uses the deterministic stub; pass decoder='real' to make
    the missing-dependency contract explicit."""
    if decoder == "real":
        raise NotImplementedError(
            "real image/audio decoding requires PIL/ffmpeg — not available "
            "in this container; use the default stub decoder"
        )
    dec = decoder or stub_decoder

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [dec(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": [len(b) for b in pdf[media_col]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "format": [m[3] for m in metas],
                }
            )

    return df.select(id_col, media_col).mapInPandas(fn, schema=MEDIA_META)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    frame_size: int = 16,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling: emit up to max_frames fixed-size byte windows per
    blob (the video-keyframe plumbing shape: 1→N explode with bounded
    fan-out, Arrow-batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, buf in zip(pdf[id_col], pdf[media_col]):
                for i in range(min(max_frames, max(len(buf) // every_n_bytes, 0))):
                    off = i * every_n_bytes
                    ids.append(did)
                    idxs.append(i)
                    frames.append(bytes(buf[off : off + frame_size]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames},
                columns=[f.name for f in FRAME_SCHEMA.fields],
            )

    return df.select(id_col, media_col).mapInPandas(fn, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def stub_resizer(buf: bytes, target: int) -> bytes:
    """Deterministic fake resize: repeat-truncate to exactly ``target``
    bytes. Replace with a real (PIL) resizer outside this sandbox."""
    if not buf:
        return b"\x00" * target
    reps = -(-target // len(buf))
    return (buf * reps)[:target]


def resize_media(
    df: DataFrame,
    target_bytes: int = 64,
    media_col: str = "media",
    id_col: str = "doc_id",
    resizer: Callable[[bytes, int], bytes] | str | None = None,
) -> DataFrame:
    """Resize every blob to a fixed-size payload (the thumbnail/tensor
    normalization step). 1→1 narrow mapInPandas; output size is constant
    per row, so downstream batch shapes are predictable at 100 TB."""
    if resizer == "real":
        raise NotImplementedError(
            "real image resizing requires PIL — not available in this "
            "container; use the default stub resizer"
        )
    rz = resizer or stub_resizer

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "resized": [rz(b, target_bytes) for b in pdf[media_col]],
                },
                columns=[f.name for f in RESIZE_SCHEMA.fields],
            )

    return df.select(id_col, media_col).mapInPandas(fn, schema=RESIZE_SCHEMA)


def stub_feature_extractor(buf: bytes, dim: int) -> list[float]:
    """Deterministic fake embedding: feature j = ((n_bytes * (j + 13))
    % 997) / 997 — SQL-mirrorable so the oracle can replay it. Replace
    with a real vision/audio encoder outside this sandbox."""
    n = len(buf)
    return [((n * (j + 13)) % 997) / 997.0 for j in range(dim)]


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def with_phash(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """Block-mean perceptual hash over the raw media bytes.

    The blob is split into ``bits`` near-equal byte blocks (boundary j =
    ``(j * n) // bits``); bit j is set iff block j's mean byte value
    strictly exceeds the whole-blob mean. This is the classic block-mean
    image pHash applied to the opaque payload: byte-local edits flip only
    the touched blocks' bits, so near-identical blobs land within a small
    Hamming radius. Runs as a narrow Arrow-batched mapInPandas over a
    2-column projection (the binary column never shuffles); all block
    sums come from one cumulative-sum pass per blob.

    Every quantity is an exact integer until the two final float64
    divisions, so an oracle can replay the hash bit-for-bit in SQL.
    """
    js = np.arange(bits, dtype=np.int64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for k, buf in enumerate(pdf[media_col]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = len(b)
                if n == 0:
                    continue
                cs = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(b, dtype=np.int64, out=cs[1:])
                mu = cs[n] / n
                lo = js * n // bits
                hi = (js + 1) * n // bits
                cnt = np.maximum(hi - lo, 1)
                means = (cs[hi] - cs[lo]) / cnt
                out[k] = int(((means > mu).astype(np.int64) << js).sum())
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(), "phash": out}
            )

    return df.select(id_col, media_col).mapInPandas(fn, schema=PHASH_SCHEMA)


def phash_neardup_pairs(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 16,
) -> DataFrame:
    """Multimodal near-duplicate pairs: block-mean pHash + exact Hamming
    blocking — a pair within distance d shares at least one of the d+1
    disjoint hash blocks (pigeonhole), so the (blk, key) equi-join finds
    every qualifying pair with NO cartesian product; keys are
    content-derived and near-uniform, so the one shuffle has no skew.
    Same scale shape as ``dedup.simhash_neardup_pairs`` but the signature
    comes from the media bytes, not text tokens.

    Bucket cardinality is 2^(bits // (d+1)) per block: at the 16-bit
    default that is only 16 keys/block — fine for oracle-replayable test
    corpora, but at corpus scale use ``bits=64`` (65,536 keys/block at
    d=3). Band keys are extracted with a bitwise mask, which stays
    correct when bit 63 makes the packed hash negative (a sign-carrying
    ``%`` would assign unequal keys to equal band bits and silently drop
    pairs)."""
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    mask = (1 << width) - 1
    h = with_phash(df, media_col=media_col, id_col=id_col, bits=bits)
    blocks = h.select(
        F.col("doc_id").alias("_id"),
        F.col("phash"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), b -> named_struct("
                f"'blk', b, 'key', (phash >> (b * {width})) & {mask}))"
            )
        ).alias("bk"),
    ).select("_id", "phash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .withColumn("hamming", F.expr("bit_count(l.phash ^ r.phash)"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"), "hamming"
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def extract_features(
    df: DataFrame,
    dim: int = 16,
    media_col: str = "media",
    id_col: str = "doc_id",
    extractor: Callable[[bytes, int], list[float]] | str | None = None,
) -> DataFrame:
    """Media → fixed-dim feature vector (the encoder step feeding the
    ANN/dedup family: its output column plugs directly into knn_join /
    lsh_neardup_pairs). Narrow mapInPandas, constant output width."""
    if extractor == "real":
        raise NotImplementedError(
            "real feature extraction requires a vision/audio model — not "
            "available in this container; use the default stub extractor"
        )
    ex = extractor or stub_feature_extractor

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "features": [ex(b, dim) for b in pdf[media_col]],
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return df.select(id_col, media_col).mapInPandas(fn, schema=FEATURE_SCHEMA)
