"""Multimodal column plumbing (SURVEY.md §2.3).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Heavy per-item work (decode, resize,
feature-extract, frame-sample) runs through Arrow-batched
``mapInPandas`` — the ONLY sanctioned Python boundary in the engine —
so a 100 TB media table streams through Python in columnar batches
instead of row-at-a-time pickling.

Decode tiers: UNCOMPRESSED image formats (24-bit BMP, P6 PPM) are
decoded for real — pure-numpy header+pixel parsing inside the Arrow
kernel (``decode_images``), no media libs needed. Compressed formats
(PNG/JPEG/GIF) raise NotImplementedError by signature: entropy coding
needs a codec library this container lacks; swap ``decode_payload``
for PIL/ffmpeg in production — the mapInPandas signature, schema, and
plan shape do not change. ``extract_media_features`` remains the
format-agnostic checksum stub for payloads that are not images at all.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FEATURE_SCHEMA = "doc_id long, n_bytes long, checksum_mod long"


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column + metadata struct from text
    (stand-in for real media payloads; plumbing is type-faithful)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ),
    )


def _extract_features(batch: "pd.DataFrame") -> "pd.DataFrame":
    """Stub feature extractor over one Arrow batch.

    Real implementation would decode ``payload`` (image/audio bytes) and
    emit embeddings / frames. Deterministic stand-in: byte length and a
    cheap checksum, so tests pin the batch plumbing end-to-end.
    """
    import pandas as pd

    # NULL payloads (e.g. NULL source text) are treated as empty media,
    # not task-killing TypeErrors
    payloads = batch["payload"].map(lambda b: b if b is not None else b"")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "checksum_mod": payloads.map(lambda b: sum(b[:64]) % 997).astype("int64"),
        }
    )


def extract_media_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload).

    mapInPandas keeps partitioning intact (narrow op): at scale, one
    Python worker per core streams batches; no shuffle is introduced.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            yield _extract_features(batch)

    # NO repartition here: mapInPandas parallelism comes from input
    # splits (plentiful on a real multi-file corpus), and forcing a
    # shuffle costs more than it buys at small payload sizes (measured
    # 1.8s -> 7.7s at sf0.1 with a 32-way repartition: Python worker
    # fan-out dominates). Callers with a single-split source and HEAVY
    # per-item decode should repartition themselves.
    return df.select("doc_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


CHUNK_SCHEMA = "doc_id long, chunk_idx long, chunk_len long"


def sample_chunks(df: DataFrame, chunk_size: int = 100) -> DataFrame:
    """Frame/chunk sampling plumbing: one output row per fixed-size
    payload chunk — the 1-to-N shape of video frame-sampling or audio
    windowing, as an Arrow-batched mapInPandas (rows fan out inside the
    Python worker; no shuffle introduced)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            ids, idxs, lens = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n = len(payload) if payload is not None else 0
                for i in range(0, max((n + chunk_size - 1) // chunk_size, 0)):
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(min(chunk_size, n - i * chunk_size))
            yield pd.DataFrame(
                {"doc_id": ids, "chunk_idx": idxs, "chunk_len": lens}
            ).astype("int64")

    return df.select("doc_id", "payload").mapInPandas(run, schema=CHUNK_SCHEMA)


# ---------------------------------------------------------------------------
# Real image decode for UNCOMPRESSED formats (VERDICT r5 #5): BMP
# (24-bit BI_RGB) and PPM (P6) are parsed in pure numpy inside the same
# Arrow mapInPandas boundary — no media libs needed. Compressed formats
# (PNG/JPEG/GIF/WebP) still raise NotImplementedError loudly: entropy
# decoding genuinely needs a codec library this container lacks.
# Encoders are provided for fixture/test generation so the full path
# binaryFile -> payload -> pixels -> feature stats is testable
# end-to-end with planted bytes.
# ---------------------------------------------------------------------------

_COMPRESSED_SIGNATURES = {
    b"\x89PNG": "png",
    b"\xff\xd8": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "webp/riff",
}


def encode_bmp(pixels) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP from an (h, w, 3) uint8 RGB
    array — bottom-up row order, 4-byte-padded rows, BGR channel order,
    exactly the layout the decoder must undo."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    pixel_bytes = bytes(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + pixel_bytes


def encode_ppm(pixels) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h, w, 3) uint8 RGB array."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_payload(data: bytes):
    """Parse one image payload -> (format, (h, w, 3) uint8 RGB array).

    Supports the two uncompressed formats a pure-numpy parser can
    handle: BMP (24-bit BI_RGB, top-down or bottom-up) and PPM (P6).
    Compressed formats raise NotImplementedError by signature so a
    misrouted JPEG fails loudly, never as a garbage pixel array."""
    import struct

    import numpy as np

    for sig, fmt in _COMPRESSED_SIGNATURES.items():
        if data[: len(sig)] == sig:
            raise NotImplementedError(
                f"{fmt} is entropy-coded; decoding needs a codec library "
                "not present in this container (PIL/opencv/ffmpeg)"
            )
    if data[:2] == b"BM":
        if len(data) < 54:
            raise ValueError("truncated BMP header")
        (offset,) = struct.unpack_from("<I", data, 10)
        _dib_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
        (bpp,) = struct.unpack_from("<H", data, 28)
        (compression,) = struct.unpack_from("<I", data, 30)
        if compression != 0 or bpp != 24:
            raise NotImplementedError(
                f"only 24-bit BI_RGB BMP supported (bpp={bpp}, "
                f"compression={compression})"
            )
        h = abs(h_signed)
        stride = (w * 3 + 3) // 4 * 4
        raw = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        if h_signed > 0:  # bottom-up (the default) -> flip to top-down
            rows = rows[::-1]
        return "bmp", np.ascontiguousarray(rows)
    if data[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws>,
        # with '#' comments allowed between tokens
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(data[start:pos]))
        pos += 1  # the single whitespace byte after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        raw = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
        return "ppm", raw.reshape(h, w, 3).copy()
    raise NotImplementedError(
        f"unrecognized image signature {data[:4]!r}; supported "
        "uncompressed formats: BMP (24-bit), PPM (P6)"
    )


# --- audio: uncompressed RIFF/WAVE PCM, same pure-numpy approach ------


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """16-bit PCM WAV from an (n,) or (n, channels) int16 array."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()  # interleaved little-endian int16
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(data: bytes):
    """Parse a RIFF/WAVE payload -> (sample_rate, (n, channels) int16
    array). PCM 16-bit only; compressed codecs (MP3/AAC/mu-law) raise
    NotImplementedError — same loud-failure contract as the image
    path."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            f"not a RIFF/WAVE payload (signature {data[:4]!r}); "
            "compressed audio needs a codec library"
        )
    pos = 12
    fmt_info = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (chunk_len,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if chunk_id == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", data, body)
            (bits,) = struct.unpack_from("<H", data, body + 14)
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only 16-bit PCM WAV supported (format={audio_fmt}, "
                    f"bits={bits})"
                )
            fmt_info = (rate, ch)
        elif chunk_id == b"data":
            if fmt_info is None:
                raise ValueError("WAV data chunk before fmt chunk")
            rate, ch = fmt_info
            n = chunk_len // (2 * ch)
            raw = np.frombuffer(data, dtype="<i2", count=n * ch, offset=body)
            return rate, raw.reshape(n, ch).copy()
        pos = body + chunk_len + (chunk_len & 1)  # chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")


AUDIO_SCHEMA = (
    "doc_id long, sample_rate long, n_channels long, n_samples long, "
    "mean_amp double, rms_amp double"
)

FRAME_RMS_SCHEMA = (
    "doc_id long, n_frames long, peak_frame long, peak_rms double"
)


def frame_audio_rms(
    df: DataFrame,
    frame_len: int = 16,
    hop: int = 8,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode WAV payloads and run the standard audio FRAMING step
    (fixed-length windows at 50% overlap), emitting the per-clip peak
    frame energy: (doc_id, n_frames, peak_frame, peak_rms). Frames are
    FULL windows only (j = f*hop .. f*hop+frame_len-1); ties on equal
    RMS resolve to the lowest frame index.

    frame_len and hop default to powers of two so the mean inside the
    RMS is an exponent shift — with integer 16-bit samples the whole
    statistic (sum of squares ≤ frame_len·2³⁰, /frame_len, sqrt) is
    computed exactly and identically in any engine: no rounding is
    needed anywhere (the multimodal_wav_decode_stats argument).
    Narrow Arrow op, no shuffle — framing stays inside the kernel via
    a numpy stride trick, never an exploded row per frame."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            out = {k: [] for k in ("doc_id", "n_frames", "peak_frame", "peak_rms")}
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                _, arr = decode_wav(bytes(payload))
                mono = arr[:, 0].astype(np.float64)
                n_frames = max(0, (len(mono) - frame_len) // hop + 1)
                if n_frames == 0:
                    continue
                idx = (
                    np.arange(frame_len)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                frames = mono[idx]
                rms = np.sqrt((frames * frames).sum(axis=1) / frame_len)
                peak = int(np.argmax(rms))  # argmax returns the FIRST max
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["peak_frame"].append(peak)
                out["peak_rms"].append(float(rms[peak]))
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(
        run, schema=FRAME_RMS_SCHEMA
    )


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode (doc_id, payload) WAV bytes -> per-clip stats (rate,
    channels, length, mean amplitude, RMS) through the Arrow
    mapInPandas boundary. Narrow op, no shuffle — the audio twin of
    decode_images."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_channels", "n_samples",
                    "mean_amp", "rms_amp",
                )
            }
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                rate, arr = decode_wav(bytes(payload))
                flat = arr.astype(np.float64)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_channels"].append(arr.shape[1])
                out["n_samples"].append(arr.shape[0])
                out["mean_amp"].append(float(flat.mean()))
                out["rms_amp"].append(float(np.sqrt((flat * flat).mean())))
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(run, schema=AUDIO_SCHEMA)


DECODE_SCHEMA = (
    "doc_id long, format string, width long, height long, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Decode (doc_id, payload) image bytes -> per-image pixel stats
    via the standard Arrow mapInPandas boundary (real decode, not the
    stub): format, dimensions, per-channel means. Narrow op — no
    shuffle; parallelism comes from input splits, same contract as
    extract_media_features."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            out = {k: [] for k in ("doc_id", "format", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                fmt, arr = decode_payload(bytes(payload))
                means = arr.reshape(-1, 3).mean(axis=0)
                out["doc_id"].append(doc_id)
                out["format"].append(fmt)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(run, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, thumb binary, thumb_bytes long"


def resize_media(df: DataFrame, max_bytes: int = 256) -> DataFrame:
    """Resize/thumbnail plumbing: per-payload size reduction through
    the same Arrow mapInPandas boundary a real image resize would use.

    Stub semantics (no image libs in this container): the "thumbnail"
    is the payload truncated to ``max_bytes`` — deterministic and
    byte-exact, so the contract (binary out-column, per-row bound
    ``thumb_bytes = min(n_bytes, max_bytes)``) is testable and even
    SQL-oracle-checkable on the length. Swap the body for
    PIL.Image.thumbnail in production; schema and plan shape hold.
    Narrow op: no shuffle introduced."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for batch in batches:
            thumbs = batch["payload"].map(
                lambda b: (b if b is not None else b"")[:max_bytes]
            )
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "thumb": thumbs,
                    "thumb_bytes": thumbs.map(len).astype("int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def resize_nearest(img, thumb_w: int, thumb_h: int):
    """REAL nearest-neighbor resize of an (h, w, 3) uint8 array to
    (thumb_h, thumb_w, 3): output pixel (x, y) samples source pixel
    (floor(x*w/tw), floor(y*h/th)) — the standard NN mapping, pure
    numpy fancy indexing (no image libs needed, unlike the
    entropy-coded formats that stay behind NotImplementedError)."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(thumb_h, dtype=np.int64) * h) // thumb_h
    xs = (np.arange(thumb_w, dtype=np.int64) * w) // thumb_w
    return img[ys][:, xs]


RESIZE_STATS_SCHEMA = (
    "doc_id long, format string, width long, height long, "
    "thumb_w long, thumb_h long, tmean_r double, tmean_g double, "
    "tmean_b double"
)


def decode_resize_images(
    df: DataFrame,
    thumb_w: int = 3,
    thumb_h: int = 2,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode image payloads and produce a REAL nearest-neighbor
    thumbnail in the same Arrow kernel (decode -> resize -> stats, one
    pass over the bytes, no intermediate pixel materialization between
    stages). Emits source dims + per-channel THUMBNAIL means. Narrow
    op — no shuffle; the thumbnail math is integer index selection, so
    the sampled pixel set is closed-form in (w, h, thumb_w, thumb_h)
    and SQL-oracle-checkable for planted payloads."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = (
            "doc_id", "format", "width", "height",
            "thumb_w", "thumb_h", "tmean_r", "tmean_g", "tmean_b",
        )
        for batch in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                fmt, arr = decode_payload(bytes(payload))
                thumb = resize_nearest(arr, thumb_w, thumb_h)
                means = thumb.reshape(-1, 3).mean(axis=0)
                out["doc_id"].append(doc_id)
                out["format"].append(fmt)
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["thumb_w"].append(thumb_w)
                out["thumb_h"].append(thumb_h)
                out["tmean_r"].append(float(means[0]))
                out["tmean_g"].append(float(means[1]))
                out["tmean_b"].append(float(means[2]))
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(
        run, schema=RESIZE_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Video tier: uncompressed frame container + strided frame sampling
# ---------------------------------------------------------------------------
#
# Real video codecs need libraries this environment doesn't ship, so —
# per the loud-failure contract above — compressed containers raise by
# signature. What a 100 TB pipeline actually exercises end-to-end is
# the CONTAINER + FRAME-SAMPLING machinery, and that is real here: a
# minimal length-prefixed frame container ("RAWV") whose frames are
# real BMP payloads, parsed by the same pure-numpy decoder as the
# image tier. Frame sampling (every k-th frame) happens INSIDE the
# Arrow kernel: only sampled frames are decoded — the exact shape of a
# production decode-few-frames-per-clip stage.

VIDEO_MAGIC = b"RAWV"


def encode_video_rawv(frames: list) -> bytes:
    """Pack already-encoded frame payloads (e.g. BMP bytes) into the
    minimal container: magic + u32 frame count + per-frame u32 length
    prefix. Deterministic byte-for-byte."""
    import struct

    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        parts.append(struct.pack("<I", len(fr)))
        parts.append(fr)
    return b"".join(parts)


def decode_video_rawv(data: bytes) -> list:
    """Unpack a RAWV container -> list of frame payload bytes.
    Anything else (MP4/AVI/MKV/WebM by signature) raises
    NotImplementedError — compressed video needs a codec library."""
    import struct

    if data[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            f"not a RAWV container (signature {data[:4]!r}); compressed "
            "video needs a codec library"
        )
    (n,) = struct.unpack_from("<I", data, 4)
    frames, pos = [], 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, pos)
        frames.append(data[pos + 4 : pos + 4 + ln])
        pos += 4 + ln
    return frames


FRAMESAMPLE_SCHEMA = (
    "doc_id long, frame long, n_frames long, "
    "mean_r double, mean_g double, mean_b double"
)


def framesample_videos(
    df: DataFrame, stride: int = 3, payload_col: str = "payload"
) -> DataFrame:
    """Strided frame sampling + decode: for every ``stride``-th frame
    of each RAWV payload, decode the frame image and emit per-channel
    means — one output row per SAMPLED frame (the 1-to-N multimodal
    shape). Unsampled frames are never decoded (their bytes are
    skipped via the length prefix), which is the point of the
    container design at scale. Narrow Arrow op, no shuffle."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "frame", "n_frames", "mean_r", "mean_g", "mean_b",
                )
            }
            for doc_id, payload in zip(batch["doc_id"], batch[payload_col]):
                frames = decode_video_rawv(bytes(payload))
                for f in range(0, len(frames), stride):
                    _fmt, img = decode_payload(frames[f])
                    flat = img.reshape(-1, 3).astype(np.float64)
                    out["doc_id"].append(doc_id)
                    out["frame"].append(f)
                    out["n_frames"].append(len(frames))
                    out["mean_r"].append(float(flat[:, 0].mean()))
                    out["mean_g"].append(float(flat[:, 1].mean()))
                    out["mean_b"].append(float(flat[:, 2].mean()))
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(
        run, schema=FRAMESAMPLE_SCHEMA
    )
