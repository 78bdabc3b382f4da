"""Fluent corpus-processing pipeline — the user-facing composition of
the engine's dedup / quality / text operators.

Every step is a lazy DataFrame->DataFrame transformation (nothing
executes until an action), so a chained pipeline compiles to ONE
Catalyst plan: filters merge, projections prune, and the optimizer
sees the whole flow. Example:

    clean = (
        CorpusPipeline.from_documents(docs)
        .dedup_exact()
        .filter_language({"en", "de"})
        .filter_quality(min_tokens=10, max_stop_ratio=0.5)
        .near_dedup_minhash(jaccard_threshold=0.8)
        .with_fingerprints()
        .df()
    )

This is the 100 TB ingest shape: narrow ops stay pipelined, the only
shuffles are the two dedup groupBys/joins, and every step is
individually covered by an oracle-checked query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class CorpusPipeline:
    """Immutable fluent wrapper: each step returns a NEW pipeline over
    the transformed (still-lazy) DataFrame."""

    def __init__(self, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
        self._df = df
        self.text_col = text_col
        self.id_col = id_col

    @classmethod
    def from_documents(
        cls, df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> "CorpusPipeline":
        return cls(df, text_col, id_col)

    def df(self) -> DataFrame:
        return self._df

    def _next(self, df: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(df, self.text_col, self.id_col)

    def _tokens(self) -> Column:
        return F.filter(F.split(self.text_col, " "), lambda t: t != "")

    # -- dedup steps ---------------------------------------------------

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep the min-id row per exact content hash (md5). Shuffles
        only (hash, id); the text rides along in the keeper row."""
        from pyspark.sql.window import Window

        w = Window.partitionBy(F.md5(self.text_col)).orderBy(self.id_col)
        return self._next(
            self._df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    def near_dedup_minhash(
        self, jaccard_threshold: float = 0.8, num_hash_tables: int = 3, seed: int = 42
    ) -> "CorpusPipeline":
        """Drop the higher-id member of every near-duplicate pair
        (MinHash LSH candidates, exact Jaccard verification)."""
        from tfm_semisup_spark.operators.dedup import minhash_near_dup_pairs

        pairs = minhash_near_dup_pairs(
            self._df.select(F.col(self.id_col).alias("doc_id"), F.col(self.text_col).alias("text")),
            jaccard_threshold=jaccard_threshold,
            num_hash_tables=num_hash_tables,
            seed=seed,
        )
        losers = pairs.select(F.col("doc_b").alias(self.id_col)).distinct()
        return self._next(self._df.join(losers, self.id_col, "left_anti"))

    # -- quality / language filters -------------------------------------

    def filter_language(self, langs: set[str], lang_col: str = "lang") -> "CorpusPipeline":
        return self._next(self._df.where(F.col(lang_col).isin(*sorted(langs))))

    def filter_quality(
        self,
        min_tokens: int = 1,
        max_tokens: int | None = None,
        max_stop_ratio: float | None = None,
        stopwords: tuple[str, ...] = ("the", "a"),
    ) -> "CorpusPipeline":
        toks = self._tokens()
        cond = F.size(toks) >= min_tokens
        if max_tokens is not None:
            cond = cond & (F.size(toks) <= max_tokens)
        if max_stop_ratio is not None:
            stop_count = F.size(F.filter(toks, lambda t: t.isin(list(stopwords))))
            cond = cond & (stop_count * 1.0 / F.size(toks) <= max_stop_ratio)
        return self._next(self._df.where(cond))

    def filter_quality_gopher(self, **overrides) -> "CorpusPipeline":
        """Gopher/C4-style rule-chain preset (operators/quality.py):
        word count, mean word length, alphabetic ratio, type-token
        ratio, stopword signal — all columnar, one where()."""
        from tfm_semisup_spark.operators.quality import filter_quality_gopher

        return self._next(
            filter_quality_gopher(self._df, text_col=self.text_col, **overrides)
        )

    # -- enrichment ------------------------------------------------------

    def with_fingerprints(self) -> "CorpusPipeline":
        return self._next(
            self._df.withColumn("content_fp", F.md5(self.text_col)).withColumn(
                "n_tokens", F.size(self._tokens()).cast("long")
            )
        )

    def with_token_count(self, out_col: str = "n_tokens") -> "CorpusPipeline":
        return self._next(
            self._df.withColumn(out_col, F.size(self._tokens()).cast("long"))
        )

    # -- corpus-prep steps (round 2): sampling, chunking, packing --------

    def stratified_sample(
        self, rates: dict[str, float], seed: int = 17, lang_col: str = "lang"
    ) -> "CorpusPipeline":
        """Deterministic per-language downsampling: keep iff
        pmod(xxhash64(id, seed), 10000) < rate*10000 (unlisted languages
        keep everything). Stateless hash filter — membership is stable
        across reruns, partitionings and cluster sizes."""
        rate = F.coalesce(
            *[F.when(F.col(lang_col) == lang, F.lit(r)) for lang, r in sorted(rates.items())],
            F.lit(1.0),
        )
        kept = (
            F.pmod(F.xxhash64(F.col(self.id_col), F.lit(seed)), F.lit(10_000))
            < rate * 10_000
        )
        return self._next(self._df.where(kept))

    def chunk(self, chunk_tokens: int = 60, step: int = 45) -> "CorpusPipeline":
        """Explode documents into overlapping word-window chunks; the
        text column is REPLACED by the chunk text and a `chunk_id`
        column is added (all other columns ride along). Narrow per-row
        explode — no shuffle."""
        toks = self._tokens()
        other = [c for c in self._df.columns if c != self.text_col]
        exploded = (
            self._df.withColumn("__w", toks)
            .where(F.size("__w") > 0)
            .select(
                *other,
                "__w",
                F.posexplode(
                    F.sequence(F.lit(0), F.size("__w") - 1, F.lit(step))
                ).alias("chunk_id", "__start"),
            )
        )
        chunk_text = F.array_join(
            F.slice(F.col("__w"), F.col("__start") + 1, chunk_tokens), " "
        )
        return self._next(
            exploded.select(
                *other, F.col("chunk_id").cast("long").alias("chunk_id"),
                chunk_text.alias(self.text_col),
            )
        )

    def pack(
        self, ctx_tokens: int = 256, n_buckets: int = 32
    ) -> "CorpusPipeline":
        """Assign rows (deterministic id order) to ~ctx_tokens bins via
        the cumulative-token bin id, windowed PER id-BUCKET so no global
        sort exists at any scale. Adds `pack_bucket` and `pack_bin`."""
        from pyspark.sql.window import Window

        toks = F.size(self._tokens()).cast("long")
        w = (
            Window.partitionBy("pack_bucket")
            .orderBy(self.id_col, "chunk_id" if "chunk_id" in self._df.columns else self.id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tokened = self._df.withColumn("__nt", toks).withColumn(
            "pack_bucket", F.pmod(F.xxhash64(F.col(self.id_col)), F.lit(n_buckets))
        )
        return self._next(
            tokened.withColumn(
                "pack_bin",
                F.floor((F.sum("__nt").over(w) - F.col("__nt")) / ctx_tokens),
            ).drop("__nt")
        )
