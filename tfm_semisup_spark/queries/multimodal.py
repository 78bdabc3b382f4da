"""Multimodal plumbing check: binary payload column -> Arrow-batched
mapInPandas feature extraction (stubbed decode, real plumbing).

The oracle reproduces the stub's arithmetic relationally (corpus is
ASCII, so byte == character): proof the Python batch path is
deterministic and schema-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.multimodal import extract_media_features, with_binary_payload
from tfm_semisup_spark.queries import register

MULTIMODAL_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(list_sum(list_transform(generate_series(1, least(64, length(text))),
                                    i -> ord(substr(text, i, 1)))) AS BIGINT) % 997
         AS checksum_mod
FROM documents
"""


@register("multimodal_feature_stub", MULTIMODAL_ORACLE)
def multimodal_feature_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(with_binary_payload(docs))


# Frame/chunk sampling plumbing: one output row per fixed-size payload
# chunk (the shape of video frame-sampling / audio windowing), produced
# by an Arrow-batched mapInPandas; oracle reproduces the chunk geometry
# with generate_series.
CHUNKS_ORACLE = """
SELECT d.doc_id,
       CAST(t.i AS BIGINT) AS chunk_idx,
       CAST(least(100, octet_length(encode(d.text)) - t.i * 100) AS BIGINT) AS chunk_len
FROM documents d,
     UNNEST(generate_series(0, CAST(ceil(octet_length(encode(d.text)) / 100.0) AS BIGINT) - 1))
       AS t(i)
"""


@register("multimodal_chunk_sample", CHUNKS_ORACLE)
def multimodal_chunk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tfm_semisup_spark.operators.multimodal import sample_chunks

    docs = load_table(spark, sf_dir, "documents")
    return sample_chunks(with_binary_payload(docs), chunk_size=100)


# Resize/thumbnail plumbing: binary-out mapInPandas; the oracle checks
# the byte-exact contract on the lengths (the thumb bytes themselves
# are a prefix of the UTF-8 payload — substring-checkable, but DuckDB
# BLOB hex formatting differs from the driver's bytes repr, so the
# oracled columns are the numeric contract).
RESIZE_ORACLE = """
SELECT doc_id,
       CAST(least(octet_length(encode(text)), 256) AS BIGINT) AS thumb_bytes,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


# Real image decode (VERDICT r5 #5): per-doc synthetic BMP/PPM payloads
# (pixel values a closed-form function of doc_id and the row-major
# pixel index) are ENCODED in one Arrow kernel, then DECODED by the
# real pure-numpy parser in operators/multimodal.py::decode_images —
# so the oracle can recompute the per-channel means relationally with
# generate_series, proving the decoder recovers every planted pixel.
# Even doc_ids take the BMP path (bottom-up rows, BGR, 4-byte padding),
# odd take PPM (P6 header) — both parsers are on the oracle path.
# Means are rounded at 6 dp: pixel sums are exact integers in double
# and every mean has denominator w*h <= 48, so no value can sit on a
# 6-dp rounding tie (the Spark-vs-DuckDB HALF_UP hazard).
BMP_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         4 + doc_id % 5 AS w,
         3 + doc_id % 4 AS h
  FROM documents
),
pix AS (
  SELECT doc_id, w, h, u.k
  FROM dims, UNNEST(generate_series(0, w * h - 1)) AS u(k)
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       ROUND(AVG((doc_id * 7 + k) % 256), 6) AS mean_r,
       ROUND(AVG((doc_id * 11 + 2 * k) % 256), 6) AS mean_g,
       ROUND(AVG((doc_id * 13 + 3 * k) % 256), 6) AS mean_b
FROM pix
GROUP BY doc_id, w, h
"""


def _encode_planted_images(batches):
    """Arrow encode stage shared by the decode and resize oracle
    queries: each doc_id becomes a real BMP (even ids) or PPM (odd)
    payload whose pixel (row-major index k) values are closed-form in
    (doc_id, k) — so any downstream pixel selection is
    SQL-recomputable."""
    import numpy as np
    import pandas as pd

    from tfm_semisup_spark.operators.multimodal import encode_bmp, encode_ppm

    for batch in batches:
        payloads = []
        ids = batch["doc_id"]
        for doc_id in ids:
            w = 4 + doc_id % 5
            h = 3 + doc_id % 4
            k = np.arange(w * h, dtype=np.int64)
            arr = np.stack(
                [
                    (doc_id * 7 + k) % 256,
                    (doc_id * 11 + 2 * k) % 256,
                    (doc_id * 13 + 3 * k) % 256,
                ],
                axis=1,
            ).astype(np.uint8).reshape(h, w, 3)
            payloads.append(
                encode_bmp(arr) if doc_id % 2 == 0 else encode_ppm(arr)
            )
        yield pd.DataFrame({"doc_id": ids, "payload": payloads})


def _planted_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _encode_planted_images, schema="doc_id long, payload binary"
    )


@register("multimodal_bmp_decode_stats", BMP_DECODE_ORACLE)
def multimodal_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile-shaped decode path with planted pixels: encode each
    doc_id into a real BMP (even ids) or PPM (odd ids) payload, run the
    real numpy decoder, emit per-channel means. One narrow Arrow stage
    for encode feeding one for decode — no shuffle anywhere."""
    from tfm_semisup_spark.operators.multimodal import decode_images

    payloads = _planted_payloads(spark, sf_dir)
    return decode_images(payloads).select(
        "doc_id",
        "format",
        "width",
        "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


# Real AUDIO decode: per-doc synthetic 16-bit PCM WAV payloads (ramp
# waveform closed-form in doc_id and the sample index) encoded in one
# Arrow kernel, decoded by the real RIFF/WAVE parser
# (operators/multimodal.py::decode_wav), stats re-derived relationally.
# No rounding anywhere: every intermediate (integer sample sums, sums
# of squares <= 5.6e7) is exact in double and the final division/sqrt
# are IEEE-identical in both engines, so the driver's %.6f
# normalization sees bit-equal doubles by construction.
WAV_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         8000 + (doc_id % 3) * 4000 AS rate,
         50 + doc_id % 7 AS n
  FROM documents
),
samp AS (
  SELECT doc_id, rate, n,
         CAST(((doc_id * 3 + u.i) % 2001) - 1000 AS DOUBLE) AS x
  FROM dims, UNNEST(generate_series(0, n - 1)) AS u(i)
)
SELECT doc_id,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(n AS BIGINT) AS n_samples,
       AVG(x) AS mean_amp,
       SQRT(AVG(x * x)) AS rms_amp
FROM samp
GROUP BY doc_id, rate, n
"""


@register("multimodal_wav_decode_stats", WAV_DECODE_ORACLE)
def multimodal_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of multimodal_bmp_decode_stats: encode each doc_id
    into a real mono 16-bit PCM WAV (planted ramp waveform), decode
    with the real RIFF parser, emit rate/length/mean/RMS. Two narrow
    Arrow stages, no shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from tfm_semisup_spark.operators.multimodal import decode_audio, encode_wav

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            payloads = []
            ids = batch["doc_id"]
            for doc_id in ids:
                rate = 8000 + (doc_id % 3) * 4000
                n = 50 + doc_id % 7
                i = np.arange(n, dtype=np.int64)
                samples = (((doc_id * 3 + i) % 2001) - 1000).astype(np.int16)
                payloads.append(encode_wav(samples, sample_rate=int(rate)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return decode_audio(payloads)


@register("multimodal_resize_stub", RESIZE_ORACLE)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail pass over the corpus payloads: Arrow mapInPandas
    truncation stub (operators/multimodal.py::resize_media), joined
    back to the metadata struct for the original size — the
    decode-free slice of a real image-resize stage."""
    from tfm_semisup_spark.operators.multimodal import (
        resize_media,
        with_binary_payload,
    )

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    thumbs = resize_media(docs, max_bytes=256)
    meta = docs.select("doc_id", F.col("media_meta.n_bytes").alias("n_bytes"))
    return thumbs.join(meta, "doc_id").select("doc_id", "thumb_bytes", "n_bytes")


# REAL nearest-neighbor thumbnail (upgrades the byte-truncation resize
# stub to actual pixel math): decode the planted payloads, NN-resize to
# a 3x2 thumbnail in the same Arrow kernel, emit per-channel THUMBNAIL
# means. The NN mapping is pure integer index selection — output pixel
# (x, y) samples source index ((y*h)//th)*w + ((x*w)//tw) — so the
# oracle regenerates the exact sampled pixel set with generate_series
# and integer division. Means are over tw*th = 6 pixels: n/6 never
# terminates at the 7th decimal, so 6-dp rounding has no HALF_UP
# boundary (same argument as the decode means).
RESIZE_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         4 + doc_id % 5 AS w,
         3 + doc_id % 4 AS h
  FROM documents
),
grid AS (
  SELECT doc_id, w, h,
         ((ty.y * h) // 2) * w + ((tx.x * w) // 3) AS k
  FROM dims,
       UNNEST(generate_series(0, 2)) AS tx(x),
       UNNEST(generate_series(0, 1)) AS ty(y)
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS thumb_w,
       CAST(2 AS BIGINT) AS thumb_h,
       ROUND(AVG((doc_id * 7 + k) % 256), 6) AS tmean_r,
       ROUND(AVG((doc_id * 11 + 2 * k) % 256), 6) AS tmean_g,
       ROUND(AVG((doc_id * 13 + 3 * k) % 256), 6) AS tmean_b
FROM grid
GROUP BY doc_id, w, h
"""


@register("multimodal_resize_decode_stats", RESIZE_DECODE_ORACLE)
def multimodal_resize_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image-resize stage: planted BMP/PPM payloads -> real numpy
    decode -> real nearest-neighbor 3x2 thumbnail -> per-channel
    thumbnail means, all in one narrow Arrow pass (no shuffle). The
    oracle recomputes the sampled pixel set relationally, proving the
    resize picks exactly the pixels the NN mapping specifies."""
    from tfm_semisup_spark.operators.multimodal import decode_resize_images

    payloads = _planted_payloads(spark, sf_dir)
    return decode_resize_images(payloads, thumb_w=3, thumb_h=2).select(
        "doc_id",
        "format",
        "width",
        "height",
        "thumb_w",
        "thumb_h",
        F.round("tmean_r", 6).alias("tmean_r"),
        F.round("tmean_g", 6).alias("tmean_g"),
        F.round("tmean_b", 6).alias("tmean_b"),
    )


# Audio FRAMING tier: the per-clip peak-frame energy over fixed
# 16-sample windows at hop 8 (50% overlap) — the first step of any
# real audio featurizer (VAD, spectral features, fingerprinting).
# Framing happens INSIDE the Arrow kernel via a numpy stride index
# (operators/multimodal.py::frame_audio_rms), never as an exploded
# row-per-frame shuffle; the oracle re-derives the same frames
# relationally with generate_series. frame_len/hop are powers of two
# and samples are 16-bit integers, so sum-of-squares, /16 and sqrt
# are all exact-or-correctly-rounded — NO rounding anywhere (the
# multimodal_wav_decode_stats argument); the peak argmax therefore
# picks the same frame in both engines, ties to the lowest index.
WAV_FRAME_ORACLE = """
WITH dims AS (
  SELECT doc_id, 50 + doc_id % 7 AS n FROM documents
),
frames AS (
  SELECT doc_id, n, u.f
  FROM dims, UNNEST(generate_series(0, (n - 16) // 8)) AS u(f)
),
samp AS (
  SELECT doc_id, f,
         CAST(((doc_id * 3 + f * 8 + v.j) % 2001) - 1000 AS DOUBLE) AS x
  FROM frames, UNNEST(generate_series(0, 15)) AS v(j)
),
frame_rms AS (
  SELECT doc_id, f, SQRT(SUM(x * x) / 16) AS rms
  FROM samp GROUP BY doc_id, f
),
ranked AS (
  SELECT doc_id, f, rms,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY rms DESC, f) AS rk,
         COUNT(*) OVER (PARTITION BY doc_id) AS nf
  FROM frame_rms
)
SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
       CAST(f AS BIGINT) AS peak_frame, rms AS peak_rms
FROM ranked WHERE rk = 1
"""


@register("multimodal_wav_frame_rms", WAV_FRAME_ORACLE)
def multimodal_wav_frame_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-frame energy of each planted WAV clip: (doc_id, n_frames,
    peak_frame, peak_rms) over 16-sample frames at hop 8."""
    from collections.abc import Iterator

    import pandas as pd

    from tfm_semisup_spark.operators.multimodal import (
        encode_wav,
        frame_audio_rms,
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            payloads = []
            ids = batch["doc_id"]
            for doc_id in ids:
                rate = 8000 + (doc_id % 3) * 4000
                n = 50 + doc_id % 7
                i = np.arange(n, dtype=np.int64)
                samples = (((doc_id * 3 + i) % 2001) - 1000).astype(np.int16)
                payloads.append(encode_wav(samples, sample_rate=int(rate)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return frame_audio_rms(payloads, frame_len=16, hop=8)


# VIDEO frame-sampling tier: planted RAWV containers (a minimal
# length-prefixed frame container; real codecs raise by signature —
# operators/multimodal.py::decode_video_rawv) whose frames are REAL
# 4x3 BMP payloads with pixels closed-form in (doc_id, frame, k).
# Every 3rd frame is sampled and decoded by the real BMP parser; the
# oracle regenerates exactly the sampled frame set with
# generate_series. Means are over w*h = 12 pixels: n/12 either
# terminates within 2 decimals (k ≡ 0 mod 3) or repeats forever —
# never a 6-dp HALF_UP tie (the BMP-decode argument).
_VIDEO_STRIDE = 3

VIDEO_FRAMESAMPLE_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, 6 + doc_id % 5 AS nf FROM documents
),
sampled AS (
  SELECT doc_id, nf, u.f
  FROM dims, UNNEST(generate_series(0, nf - 1)) AS u(f)
  WHERE u.f % {_VIDEO_STRIDE} = 0
),
pix AS (
  SELECT doc_id, nf, f, v.k
  FROM sampled, UNNEST(generate_series(0, 11)) AS v(k)
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame,
       CAST(nf AS BIGINT) AS n_frames,
       ROUND(AVG((doc_id * 7 + f * 17 + k) % 256), 6) AS mean_r,
       ROUND(AVG((doc_id * 11 + f * 19 + 2 * k) % 256), 6) AS mean_g,
       ROUND(AVG((doc_id * 13 + f * 23 + 3 * k) % 256), 6) AS mean_b
FROM pix
GROUP BY doc_id, f, nf
"""


@register("multimodal_video_framesample_stats", VIDEO_FRAMESAMPLE_ORACLE)
def multimodal_video_framesample_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Strided frame sampling over planted RAWV video containers: one
    row per SAMPLED frame (every {s}rd), decoded by the real BMP
    parser — (doc_id, frame, n_frames, mean_r, mean_g, mean_b). Only
    sampled frames are decoded (length-prefix skip), the
    decode-few-frames-per-clip production shape.""".format(s=_VIDEO_STRIDE)
    from collections.abc import Iterator

    import pandas as pd

    from tfm_semisup_spark.operators.multimodal import (
        encode_bmp,
        encode_video_rawv,
        framesample_videos,
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            payloads = []
            ids = batch["doc_id"]
            k = np.arange(12, dtype=np.int64)
            for doc_id in ids:
                nf = 6 + doc_id % 5
                frames = []
                for f in range(nf):
                    arr = np.stack(
                        [
                            (doc_id * 7 + f * 17 + k) % 256,
                            (doc_id * 11 + f * 19 + 2 * k) % 256,
                            (doc_id * 13 + f * 23 + 3 * k) % 256,
                        ],
                        axis=1,
                    ).astype(np.uint8).reshape(3, 4, 3)
                    frames.append(encode_bmp(arr))
                payloads.append(encode_video_rawv(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return framesample_videos(payloads, stride=_VIDEO_STRIDE)
