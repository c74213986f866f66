"""Multimodal column plumbing (BASELINE.json north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; the decode / feature-extract / resize / frame-sample stages run as
Arrow-batched ``mapInPandas`` operators. No PIL/librosa/ffmpeg in this
container, so there are two payload paths:

- REAL: 24-bit BMP and PCM16 WAV decode/resize/feature kernels in
  ``operators/codecs.py`` (pure struct+numpy) — actual pixels and samples,
  golden-tested; ``synthesize_real_media`` builds such payloads.
- FAKE: deterministic byte-histogram stand-ins for formats that need
  external codec libs (video containers, JPEG...); ``strict=True`` raises
  instead. A production codec drops into ``decode_fn`` without touching
  the plan.
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

    The image/audio/video split hashes the id with md5 (not xxhash64) so a
    cross-engine oracle can reproduce WHICH rows carry each kind:
    DuckDB twin ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
    % 3`` — the repo's shared cross-engine hash primitive (CLAUDE.md).
    """
    kind_bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(3),
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (kind_bucket + 1).cast("int"),
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


def synthesize_real_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Like ``synthesize_media`` but every payload is REAL encoded bytes:
    deterministic 24-bit BMPs, PCM16 WAVs, and multi-frame BMV videos built
    arithmetically from the media id (pure numpy — see
    ``operators/codecs.py``).

    This gives the decode operators actual pixels/samples/frames to verify
    against instead of byte histograms (VERDICT r1 item 6, r2 item 8). The
    generation formulas are the contract the media oracles check:

    - image: w = 4 + id%12, h = 4 + (id//3)%12
    - audio: n_samples = 256 + id%512 at 16 kHz
    - video: n_frames = 2 + id%4 at 40 ms/frame, frame w = 4 + id%8,
      frame h = 4 + (id//5)%8; duration_ms = n_frames * 40
    """
    import numpy as np

    from metadata_ingestion_framework_spark.operators.codecs import (
        encode_bmp,
        encode_bmv,
        encode_wav,
    )

    base = synthesize_media(df, id_col, text_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes, widths, heights, durations = [], [], [], [], []
            for mid, kind, w0, h0, d0 in zip(
                pdf["media_id"], pdf["kind"], pdf["width"], pdf["height"], pdf["duration_ms"]
            ):
                mid = int(mid)
                if kind == "image":
                    w, h = 4 + mid % 12, 4 + (mid // 3) % 12
                    y, x, c = np.ogrid[0:h, 0:w, 0:3]
                    px = ((mid * 7 + y * 13 + x * 17 + c * 29) % 256).astype(np.uint8)
                    payloads.append(encode_bmp(px))
                    mimes.append("image/bmp")
                    widths.append(w)
                    heights.append(h)
                    durations.append(int(d0))
                elif kind == "audio":
                    i = np.arange(256 + mid % 512)
                    samples = (((mid * 31 + i * 37) % 4096) - 2048).astype(np.int16) * 8
                    payloads.append(encode_wav(samples))
                    mimes.append("audio/wav")
                    widths.append(int(w0))
                    heights.append(int(h0))
                    durations.append(int(d0))
                else:  # video: real multi-frame BMV container
                    n_frames, frame_ms = 2 + mid % 4, 40
                    w, h = 4 + mid % 8, 4 + (mid // 5) % 8
                    y, x, c = np.ogrid[0:h, 0:w, 0:3]
                    frames = [
                        encode_bmp(
                            ((mid * 7 + f * 11 + y * 13 + x * 17 + c * 29) % 256).astype(np.uint8)
                        )
                        for f in range(n_frames)
                    ]
                    payloads.append(encode_bmv(frames, frame_ms))
                    mimes.append("video/x-bmv")
                    widths.append(w)
                    heights.append(h)
                    durations.append(n_frames * frame_ms)
            out = pdf.copy()
            out["payload"] = payloads
            out["mime"] = mimes
            out["width"] = pd.Series(widths, dtype="int32")
            out["height"] = pd.Series(heights, dtype="int32")
            out["duration_ms"] = pd.Series(durations, dtype="int32")
            yield out

    return base.mapInPandas(gen, schema=base.schema)


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


def decode_stats(media: DataFrame) -> DataFrame:
    """Exact decode-contract columns (VERDICT r4 item 3): every payload is
    REALLY decoded (BMP pixels / WAV samples / BMV header + first frame) and
    reduced to integer invariants a SQL oracle recomputes from the
    ``synthesize_real_media`` generation formulas:

    - image: unit_sum = sum of all RGB pixel values, n_units = h*w*3
    - audio: unit_sum = sum of int16 samples, n_units = sample count
    - video: unit_sum = first-frame pixel sum, n_units = fw*fh*3,
      duration_ms = n_frames * frame_ms from the container header

    Integer sums are byte-exact cross-engine (no float accumulation order),
    so a hash-level oracle match proves the decode kernels reproduce the
    generated pixels/samples — far stronger than the old rows-only check.
    ``feat_dim`` additionally runs the ``media_features`` dispatcher.
    """
    import numpy as np

    from metadata_ingestion_framework_spark.operators import codecs

    schema = (
        "media_id long, kind string, feat_dim int, unit_sum long, "
        "n_units long, duration_ms int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, kinds, fdims, sums, ns, durs = [], [], [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                p = bytes(payload)
                fdims.append(len(codecs.media_features(p)))
                if kind == "image":
                    px = codecs.decode_bmp(p).astype(np.int64)
                    sums.append(int(px.sum()))
                    ns.append(int(px.size))
                    durs.append(None)
                elif kind == "audio":
                    _, x = codecs.decode_wav(p)
                    sums.append(int(x.astype(np.int64).sum()))
                    ns.append(int(x.size))
                    durs.append(None)
                else:
                    n_frames, frame_ms = codecs.bmv_info(p)
                    px = codecs.decode_bmp(codecs.decode_bmv_frame(p, 0)).astype(np.int64)
                    sums.append(int(px.sum()))
                    ns.append(int(px.size))
                    durs.append(n_frames * frame_ms)
                mids.append(int(mid))
                kinds.append(kind)
            yield pd.DataFrame({
                "media_id": pd.Series(mids, dtype="int64"),
                "kind": kinds,
                "feat_dim": pd.Series(fdims, dtype="int32"),
                "unit_sum": pd.Series(sums, dtype="int64"),
                "n_units": pd.Series(ns, dtype="int64"),
                "duration_ms": pd.Series(durs, dtype="Int32"),
            })

    return media.mapInPandas(run, schema=schema)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode each (resized) BMP payload and emit its REAL dimensions plus
    the exact integer pixel sum — the oracle recomputes the nearest-neighbor
    resample arithmetic (``resize_bmp``: src index = dest*src_dim//dst_dim)
    in SQL, so a match proves the resample kernel pixel-for-pixel."""
    import numpy as np

    from metadata_ingestion_framework_spark.operators.codecs import decode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, ws, hs, sums = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_bmp(bytes(payload)).astype(np.int64)
                mids.append(int(mid))
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                sums.append(int(px.sum()))
            yield pd.DataFrame({
                "media_id": pd.Series(mids, dtype="int64"),
                "out_w": pd.Series(ws, dtype="int32"),
                "out_h": pd.Series(hs, dtype="int32"),
                "px_sum": pd.Series(sums, dtype="int64"),
            })

    return media.mapInPandas(run, schema="media_id long, out_w int, out_h int, px_sum long")


def frame_stats(frames: DataFrame) -> DataFrame:
    """Decode each sampled BMV frame (BMP bytes) to its exact pixel sum —
    oracle-checkable per (media_id, frame_ts) against the per-frame
    generation formula."""
    import numpy as np

    from metadata_ingestion_framework_spark.operators.codecs import decode_bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = [
                int(decode_bmp(bytes(p)).astype(np.int64).sum()) for p in pdf["frame"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "frame_ts": pdf["frame_ts"].astype("int32"),
                "px_sum": pd.Series(sums, dtype="int64"),
            })

    return frames.mapInPandas(run, schema="media_id long, frame_ts int, px_sum long")


def _default_frame_fn(payload: bytes, ts: int) -> bytes:
    """REAL frame extraction for BMV containers: O(1) index seek to the
    frame covering timestamp ``ts`` (BMP bytes out). Opaque payloads fall
    back to a deterministic byte slice (the pre-codec stand-in)."""
    from metadata_ingestion_framework_spark.operators.codecs import (
        BMV_MAGIC,
        bmv_info,
        decode_bmv_frame,
    )

    if payload[:4] == BMV_MAGIC:
        try:
            n_frames, frame_ms = bmv_info(payload)
            if frame_ms > 0:  # frame_ms=0 would make ts // frame_ms divide by zero
                return decode_bmv_frame(payload, min(ts // frame_ms, n_frames - 1))
        except ValueError:
            pass  # magic-mimicking bytes degrade to the slice stand-in below
    return payload[(ts // 1000) % max(len(payload), 1):][:64]


def sample_frames(
    media: DataFrame, every_ms: int = 1000,
    frame_fn: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Frame-sample stage: video rows -> one row per sampled timestamp.

    Explodes frame timestamps JVM-side (sequence), then extracts per frame
    in one Python stage. BMV payloads yield REAL BMP frames via the
    container index (no bytes of skipped frames are touched); opaque
    payloads get the deterministic slice stand-in.
    """
    frames = (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_ts", F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))))
    )
    take = frame_fn or _default_frame_fn

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_ts": pdf["frame_ts"],
                "frame": [take(bytes(p), int(t)) for p, t in zip(pdf["payload"], pdf["frame_ts"])],
            })

    return frames.mapInPandas(run, schema="media_id long, frame_ts int, frame binary")


def image_hashes(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual image hashes (r13, VERDICT r12 item 2): 64-bit dHash
    and aHash per decodable BMP payload — the multimodal face of the
    dedup family (the standard pHash-family difference/average hashes,
    public methodology).

    PURE-INTEGER pipeline so the hashes are SQL-replayable from the
    ``synthesize_real_media`` generation formulas (the ``media_resize``
    decode-contract convention — a value match proves decode + resample
    + hash jointly):

    - luma = ``299*R + 587*G + 114*B`` (Rec.601 x1000 — integers, no
      division, and comparisons are scale-invariant);
    - nearest-neighbor grid sample with the ``resize_bmp`` index math
      (``src = dst * src_dim // dst_dim``): 8x9 for dHash, 8x8 for aHash;
    - dHash bit ``k = r*8 + c`` set iff ``g[r][c+1] > g[r][c]`` (strict);
    - aHash bit set iff ``64 * g[r][c] > sum(g)`` (strict — the
      integer-exact form of "above the mean");
    - packed row-major into a SIGNED int64 (two's-complement reinterpret,
      the simhash convention).

    Map-only, one Arrow pass, no shuffle. Rows whose payload does not
    decode as BMP (other kinds, corrupt bytes, NULL) drop out — they have
    no pixels to hash (the simhash no-tokens rule)."""
    import numpy as np

    from metadata_ingestion_framework_spark.operators.codecs import decode_bmp
    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    id_type = dict(media.dtypes)[id_col]
    df = _widen_narrow_input(media.select(id_col, payload_col))
    shifts = np.arange(64, dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, dhs, ahs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    px = decode_bmp(bytes(payload)).astype(np.int64)
                except ValueError:  # non-BMP kind / corrupt payload
                    continue
                lum = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                h, w = lum.shape
                ys = np.arange(8) * h // 8
                g9 = lum[ys][:, np.arange(9) * w // 9]   # 8 x 9
                dbits = (g9[:, 1:] > g9[:, :-1]).ravel()  # k = r*8 + c
                g8 = lum[ys][:, np.arange(8) * w // 8]   # 8 x 8
                abits = (64 * g8 > g8.sum()).ravel()
                # distinct powers of two: uint64 sum == bitwise OR, exact
                dfp = (dbits.astype(np.uint64) << shifts).sum(dtype=np.uint64)
                afp = (abits.astype(np.uint64) << shifts).sum(dtype=np.uint64)
                ids.append(mid)
                dhs.append(dfp.astype(np.int64))
                ahs.append(afp.astype(np.int64))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                "dhash": pd.Series(dhs, dtype="int64"),
                "ahash": pd.Series(ahs, dtype="int64"),
            })

    return df.mapInPandas(
        run, schema=f"{id_col} {id_type}, dhash long, ahash long"
    )


def audio_hashes(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual audio fingerprints (r14, VERDICT r13 item 2): 64-bit
    ``ehash`` (energy-delta) and ``mhash`` (energy-above-mean) per
    decodable PCM16 WAV payload — the audio face of the dedup family,
    the time-domain shape of the published Haitsma-Kalker energy-
    difference fingerprint (bit = sign of adjacent band-energy delta),
    with the image operator's grid conventions so the hashes are
    SQL-replayable from the ``synthesize_real_media`` formulas:

    - sample energies ``e_i = x_i * x_i`` (int64 — exact);
    - cell ASSIGNMENT ``cell(i) = i * n_cells // n`` (one integer
      expression, the GROUP BY the oracle runs; 65 cells for ehash,
      64 for mhash);
    - ehash bit ``k`` set iff ``E65[k+1] > E65[k]`` (strict) — adjacent
      energy deltas, 65 cells -> 64 bits (the dHash 8x9 -> 64 shape);
    - mhash bit ``j`` set iff ``64 * E64[j] > sum(e)`` (strict — the
      aHash integer-exact "above the mean");
    - packed into SIGNED int64 (two's-complement, the simhash
      convention).

    Both hashes are AMPLITUDE-INVARIANT (scaling x by a scales every
    energy by a^2; strict comparisons are unchanged) — a re-encoded or
    volume-normalized copy fingerprints identically, which is the
    robustness property the published fingerprint gets from band-energy
    signs. Map-only, one Arrow pass, no shuffle. Rows that fail WAV
    decode or hold zero samples drop out (the simhash no-tokens rule);
    payloads shorter than 65 samples hash with empty cells as 0 energy.
    """
    import numpy as np

    from metadata_ingestion_framework_spark.operators.codecs import decode_wav
    from metadata_ingestion_framework_spark.operators.dedup import (
        _widen_narrow_input,
    )

    id_type = dict(media.dtypes)[id_col]
    df = _widen_narrow_input(media.select(id_col, payload_col))
    shifts = np.arange(64, dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, ehs, mhs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    _, x = decode_wav(bytes(payload))
                except ValueError:  # non-WAV kind / corrupt payload
                    continue
                n = len(x)
                if n == 0:
                    continue
                e = x.astype(np.int64) ** 2
                idx = np.arange(n, dtype=np.int64)
                # exact int64 scatter-add (bincount would go float64)
                e65 = np.zeros(65, dtype=np.int64)
                np.add.at(e65, idx * 65 // n, e)
                e64 = np.zeros(64, dtype=np.int64)
                np.add.at(e64, idx * 64 // n, e)
                ebits = e65[1:] > e65[:-1]
                # overflow-free form of `64 * e64 > tot` (r14 ADVICE:
                # the 64x product wraps int64 once a cell reaches 2^57 —
                # multi-hour loud audio — while DuckDB's HUGEINT twin
                # doesn't): for ints, 64*e > tot  ⟺  e > tot // 64.
                mbits = e64 > e.sum() // 64
                # distinct powers of two: uint64 sum == bitwise OR, exact
                efp = (ebits.astype(np.uint64) << shifts).sum(dtype=np.uint64)
                mfp = (mbits.astype(np.uint64) << shifts).sum(dtype=np.uint64)
                ids.append(mid)
                ehs.append(efp.astype(np.int64))
                mhs.append(mfp.astype(np.int64))
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                "ehash": pd.Series(ehs, dtype="int64"),
                "mhash": pd.Series(mhs, dtype="int64"),
            })

    return df.mapInPandas(
        run, schema=f"{id_col} {id_type}, ehash long, mhash long"
    )


def audio_near_duplicates(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    blocks: int = 4,
    hash_col: str = "ehash",
) -> DataFrame:
    """Perceptual near-duplicate audio pairs ``(id_a, id_b, hamming)``:
    :func:`audio_hashes` + the SHARED ``dedup.hamming_banded_pairs``
    block-permutation candidate join — byte-identical plan to the image
    and simhash faces (bounded uniform (block, value) shuffle keys,
    codegen bit_count verify before the dedup shuffle; exact for
    ``max_hamming <= blocks-1`` by pigeonhole). Release the result's
    ``_persisted_deps`` when done."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        hamming_banded_pairs,
    )

    fps = audio_hashes(media, payload_col, id_col).persist()
    out = hamming_banded_pairs(
        fps.select(id_col, hash_col), hash_col, id_col, max_hamming, blocks
    )
    out._persisted_deps = [fps]
    return out


def video_near_duplicates(
    media: DataFrame,
    every_ms: int = 1000,
    max_hamming: int = 3,
    blocks: int = 4,
    min_matching_frames: int = 1,
    hash_col: str = "dhash",
) -> DataFrame:
    """Frame-level perceptual video near-duplicates (r14, VERDICT r13
    item 3 — the composition pytest promoted to an operator):
    ``sample_frames`` (real BMV frame extraction, O(1) container seeks)
    -> ``image_hashes`` over the frame payloads keyed by the
    ``(media_id, frame_ts)`` struct -> the SHARED
    ``dedup.hamming_banded_pairs`` -> per video pair aggregation.

    Match rule (both VERDICT-suggested faces in one output): a video
    pair surfaces when it has at least ``min_matching_frames`` verified
    frame-hash matches (distinct ``(ts_a, ts_b)`` pairs within
    ``max_hamming``), and carries ``best_hamming`` — the minimum frame
    Hamming distance — so a best-frame threshold is a filter on the
    result. Returns ``(id_a, id_b, n_frame_matches, best_hamming)`` with
    ``id_a < id_b`` (struct ordering is media-major, so cross-video
    banded pairs are already canonically ordered).

    ``media`` is the synthesize_media shape (media_id, kind, payload,
    duration_ms): ``sample_frames`` keeps only kind == 'video' rows and
    samples one frame per ``every_ms``. Frames that fail BMP decode drop
    out per the image_hashes no-pixels rule — a video pairs on its
    decodable frames only. Scale shape: frame explosion is JVM-side,
    hashing is ONE Arrow pass, and the candidate join is the same
    bounded (block, value)-key shuffle as every Hamming face — at 100 TB
    the frame table is ~duration/every_ms x the video count, each frame
    a skinny (struct, int64) row into the banding. Release
    ``_persisted_deps`` when done."""
    frames = sample_frames(media, every_ms).withColumn(
        "__fid", F.struct("media_id", "frame_ts")
    )
    fps = image_hashes(frames, payload_col="frame", id_col="__fid").persist()
    from metadata_ingestion_framework_spark.operators.dedup import (
        hamming_banded_pairs,
    )

    pairs = hamming_banded_pairs(
        fps.select("__fid", hash_col), hash_col, "__fid", max_hamming, blocks
    )
    out = (
        pairs.filter(F.col("id_a.media_id") != F.col("id_b.media_id"))
        .groupBy(
            F.col("id_a.media_id").alias("id_a"),
            F.col("id_b.media_id").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_frame_matches"),
            F.min("hamming").alias("best_hamming"),
        )
        .filter(F.col("n_frame_matches") >= min_matching_frames)
    )
    out._persisted_deps = [fps]
    return out


def image_near_duplicates(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    blocks: int = 4,
    hash_col: str = "dhash",
) -> DataFrame:
    """Perceptual near-duplicate image pairs ``(id_a, id_b, hamming)``:
    :func:`image_hashes` + the simhash block-permutation candidate join
    (``dedup.hamming_banded_pairs`` — bounded uniform (block, value)
    shuffle keys, codegen bit_count verify before the dedup shuffle;
    exact for ``max_hamming <= blocks-1`` by pigeonhole). Release the
    result's ``_persisted_deps`` when done."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        hamming_banded_pairs,
    )

    fps = image_hashes(media, payload_col, id_col).persist()
    out = hamming_banded_pairs(
        fps.select(id_col, hash_col), hash_col, id_col, max_hamming, blocks
    )
    out._persisted_deps = [fps]
    return out


def _clip_scores(
    df: DataFrame, cap_vec_col: str, img_vec_col: str, score_col: str
) -> DataFrame:
    """Shared scoring step of the CLIP gates: ROUND(cosine, 6) when the
    pair is scorable (both vectors present, same non-zero dim), NULL
    otherwise — ONE definition so the threshold and top-fraction gates
    cannot drift (the r18 review's shared-SQL rule, applied here)."""
    from metadata_ingestion_framework_spark.operators.similarity import (
        cosine,
    )

    a, b = F.col(cap_vec_col), F.col(img_vec_col)
    scorable = (
        a.isNotNull()
        & b.isNotNull()
        & (F.size(a) == F.size(b))
        & (F.size(a) > 0)
    )
    return df.withColumn(
        score_col, F.when(scorable, F.round(cosine(a, b), 6))
    )


def clip_score_gate(
    df: DataFrame,
    cap_vec_col: str,
    img_vec_col: str,
    threshold: float = 0.28,
    score_col: str = "clip_score",
    out_col: str = "aligned",
) -> DataFrame:
    """CLIP-score alignment gate (r18, VERDICT r17 item 3) — the
    DataComp/LAION headline filter: per-(caption, image) cosine between
    the pair's two embedding columns, thresholded, run AHEAD of pair
    dedup (:class:`~.incremental.CrossModalPairStore`) so dedup only
    sees aligned pairs. No reference analogue (Task.scala's gates are
    row-level SQL filters; this is the LLM-pipeline extension of that
    stage to paired embeddings).

    Adds ``score_col`` = ROUND(cosine, 6) and ``out_col`` =
    score >= ``threshold``. Dirty pairs — either vector NULL, empty, or
    the two dims mismatching — carry NULL in BOTH columns (the
    cross-modal family's NULL-propagation contract: the gate never
    invents a verdict for a pair it cannot score; downstream owns the
    dirty-row policy). A zero-norm vector scores 0.0 (the engine-wide
    zero-denominator rule, similarity.py::cosine) and gates False.

    Scale shape: map-only, one cosine HOF fold per ROW (not per
    candidate — unlike the top-k kernels there is no k multiplier), so
    the interpreted-lambda cost is ~2*dim µs/row and stays embarrassingly
    parallel; no shuffle, no Python. The ROUND(6) score is the
    oracle-proven cross-engine form (sequential fold == DuckDB
    list_dot_product, bit-for-bit)."""
    out = _clip_scores(df, cap_vec_col, img_vec_col, score_col)
    return out.withColumn(
        out_col,
        F.when(
            F.col(score_col).isNotNull(),
            F.col(score_col) >= F.lit(float(threshold)),
        ),
    )


def clip_frac_gate(
    df: DataFrame,
    cap_vec_col: str,
    img_vec_col: str,
    id_cols: list[str],
    keep_frac: float = 0.3,
    score_col: str = "clip_score",
    out_col: str = "aligned",
    shards: int | None = None,
) -> DataFrame:
    """DataComp's TOP-FRACTION CLIP rule (r18): instead of a fixed
    threshold, keep the best ``keep_frac`` of SCORABLE pairs by
    (score DESC, id ASC) — the form the DataComp baselines actually
    publish ("keep top 30% by CLIP score"), robust to embedding-model
    recalibration where a fixed 0.28 is not. Composes ahead of
    :class:`~.incremental.CrossModalPairStore` exactly like
    :func:`clip_score_gate`.

    Keep rule, engine-exact: rank <= FLOOR(keep_frac * n_scored + 0.5)
    with the unique ``id_cols`` tiebreak. Dirty pairs (NULL vector,
    empty, dim mismatch) carry NULL score AND NULL verdict and are
    EXCLUDED from both the rank and ``n_scored`` (the family's
    NULL-propagation contract — an unscorable pair neither competes nor
    counts).

    Scale shape: scoring is map-only; the global rank rides
    :func:`~..functions.sampling._grouped_rank`'s two-stage de-skewed
    machinery (range-sharded local windows + broadcast offsets — never
    one global window task; the adaptive small-input bypass keeps test
    corpora cheap). Release ``_persisted_deps`` when done."""
    from metadata_ingestion_framework_spark.functions.sampling import (
        _attach_deps,
        _grouped_rank,
    )

    scored = _clip_scores(df, cap_vec_col, img_vec_col, score_col)
    null_side = scored.filter(F.col(score_col).isNull()).withColumn(
        out_col, F.lit(None).cast("boolean")
    )
    order = [F.col(score_col).desc_nulls_last()] + [
        F.col(c).asc_nulls_last() for c in id_cols
    ]
    ranked, sharded = _grouped_rank(
        scored.filter(F.col(score_col).isNotNull()), [], order, shards
    )
    cut = F.floor(
        F.lit(float(keep_frac)) * F.col("__n") + F.lit(0.5)
    ).cast("long")
    kept = ranked.withColumn(out_col, F.col("__rank") <= cut).select(
        *scored.columns, out_col
    )
    return _attach_deps(
        kept.unionByName(null_side),
        [sharded] if sharded is not None else [],
        df,
    )
