"""Multimodal column plumbing (SURVEY.md §2.3).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. Heavy per-item work (decode, resize,
feature-extract, frame-sample) runs through Arrow-batched
``mapInPandas`` — the ONLY sanctioned Python boundary in the engine —
so a 100 TB media table streams through Python in columnar batches
instead of row-at-a-time pickling.

The decode step itself is stubbed (no image/audio libs in this
container): ``decode_stub`` computes deterministic per-payload features
(byte length, a checksum-derived pseudo-dimension) so the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested. Swap
``_extract_features`` for a real decoder (PIL/torchaudio/ffmpeg) in
production; the UDF signature and plan shape do not change.
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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Placeholder for a real image decode — the container has no image
    libs. Kept as an explicit NotImplementedError so callers fail loudly
    rather than silently skipping the decode."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not in this container); "
        "use extract_media_features for the tested stub path"
    )


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
