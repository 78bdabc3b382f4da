"""Strict first-fit sequence packing (training-data prep).

``queries/corpus_prep.py::pack_token_bins`` is the streaming-concat
form (cumulative-token bins; documents may straddle a bin boundary) —
pure SQL, oracle-checked. This module adds STRICT packing: a document
never straddles; a new bin opens when the current one cannot hold the
next document. That decision is inherently sequential per bucket, so
it is exactly the sanctioned Arrow-boundary shape:
``repartition(bucket) + sortWithinPartitions + mapInPandas`` with
sequential state carried across Arrow batches (same pattern as the
grouped-trend operator, SCALE.md round-2 lessons).

Scale: each bucket packs independently (bucket = xxhash64(id) % B), so
parallelism is B-wide whatever the corpus size; state per partition is
one (bucket, bin, fill) triple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "doc_id long, pack_bucket int, pack_bin long, n_tokens long"


def pack_first_fit(
    docs: DataFrame,
    ctx_tokens: int = 256,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_col: str | None = None,
) -> DataFrame:
    """(doc_id, pack_bucket, pack_bin, n_tokens) with the strict
    invariant: sum(n_tokens) per (bucket, bin) <= ctx_tokens unless the
    bin holds a single oversized document. Deterministic: hash bucket +
    id order. ``bucket_col`` names a precomputed bucket column on
    ``docs`` (e.g. the portable md5 bucket the replay oracle shares
    with DuckDB); default is the xxhash64 production bucket."""

    tokens = F.size(F.filter(F.split(text_col, " "), lambda t: t != "")).cast("long")
    bucket = (
        F.col(bucket_col).cast("int")
        if bucket_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    )
    prepared = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        bucket.alias("pack_bucket"),
        tokens.alias("n_tokens"),
    )

    def pack_batches(batches):
        import pandas as pd

        # sequential first-fit state, carried across Arrow batches;
        # resets whenever the (sorted) bucket changes
        cur_bucket, cur_bin, fill = None, 0, 0
        for pdf in batches:
            out_bin = []
            for bucket, nt in zip(pdf["pack_bucket"], pdf["n_tokens"]):
                if bucket != cur_bucket:
                    cur_bucket, cur_bin, fill = bucket, 0, 0
                if fill > 0 and fill + nt > ctx_tokens:
                    cur_bin += 1
                    fill = 0
                fill += nt  # an oversized doc sits alone in its bin
                out_bin.append(cur_bin)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pack_bucket": pdf["pack_bucket"],
                    "pack_bin": pd.Series(out_bin, dtype="int64"),
                    "n_tokens": pdf["n_tokens"],
                }
            )

    return (
        prepared.repartition("pack_bucket")
        .sortWithinPartitions("pack_bucket", "doc_id")
        .mapInPandas(pack_batches, schema=PACK_SCHEMA)
    )
