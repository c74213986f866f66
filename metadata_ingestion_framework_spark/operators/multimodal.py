"""Multimodal column plumbing (BASELINE.json north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; the decode / feature-extract / resize / frame-sample stages run as
Arrow-batched ``mapInPandas`` operators. The image/audio codec libraries are
NOT in this container, so the decode kernels are deterministic fakes (or
raise NotImplementedError when strictness is requested) — the Spark-side
contract (schema, batching, partitioning) is real and tested, and a real
codec drops into ``decode_fn`` without touching the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media rows from a text table (test fixture path).

    Payload = UTF-8 bytes of the text; metadata derived from stable hashes.
    Gives the multimodal operators a real binary column to chew on.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), F.lit(1920)) + 64).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(2)), F.lit(1080)) + 64).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(3)), F.lit(600_000)) + 1000).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a pixel/sample decode: 8 byte-histogram
    buckets normalized to [0,1]. Swap for PIL/librosa in production."""
    if payload is None:
        return [0.0] * 8
    counts = [0] * 8
    for b in payload:
        counts[b >> 5] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    feature_dim: int = 8,
    strict: bool = False,
) -> DataFrame:
    """payload binary -> feature array<double>, via Arrow-batched mapInPandas.

    Batch shape: one pandas DataFrame per Arrow batch; decode runs per row
    inside the batch (vectorize inside ``decode_fn`` for real codecs).
    ``strict=True`` raises NotImplementedError — the contract marker for
    'this container has no codec libs'.
    """
    if strict and decode_fn is None:
        raise NotImplementedError("no codec libraries in this environment; pass decode_fn")
    decode = decode_fn or _fake_decode
    schema = f"media_id long, kind string, features array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": pdf["payload"].map(lambda p: decode(bytes(p)) if p is not None else [0.0] * feature_dim),
            })

    return media.mapInPandas(run, schema=schema)


def resize_images(
    media: DataFrame, width: int, height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage: image rows only, payload -> payload (fake: truncate).

    Partition note: filter first so non-image rows never enter the Python
    stage; at scale, partition the media table by ``kind`` so this is a
    partition-pruned scan.
    """
    resize = resize_fn or (lambda p, w, h: p[: max(w * h // 256, 1)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = out["payload"].map(lambda p: resize(bytes(p), width, height))
            out["width"] = width
            out["height"] = height
            yield out

    imgs = media.filter(F.col("kind") == "image")
    return imgs.mapInPandas(run, schema=media.schema)


def sample_frames(
    media: DataFrame, every_ms: int = 1000,
    frame_fn: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Frame-sample stage: video rows -> one row per sampled timestamp.

    Explodes frame timestamps JVM-side (sequence), then decodes per frame in
    one Python stage. Fake frame extractor slices the payload.
    """
    frames = (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_ts", F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))))
    )
    take = frame_fn or (lambda p, ts: p[(ts // 1000) % max(len(p), 1):][:64])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_ts": pdf["frame_ts"],
                "frame": [take(bytes(p), int(t)) for p, t in zip(pdf["payload"], pdf["frame_ts"])],
            })

    return frames.mapInPandas(run, schema="media_id long, frame_ts int, frame binary")
