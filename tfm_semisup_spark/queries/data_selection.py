"""DSIR-style importance-weighted training-data selection.

``dsir_importance_select`` implements the scoring core of Data
Selection via Importance Resampling (Xie et al., NeurIPS 2023): model
a TARGET distribution (here the ``lang = 'en'`` slice — the
"looks-like-my-eval-set" proxy) and the RAW corpus distribution over
HASHED unigram features, and weight every raw document by its
log importance ratio

    log w(d) = Σ_b count_d(b) · ln( p_target(b) / p_raw(b) )

with add-1 smoothed bucket probabilities. The top-weighted documents
are the ones importance resampling would draw first.

No reference analog (extension surface; the LLM-corpus-pipeline tier
alongside stratified/temperature sampling and the curriculum
manifest).

Spark-first / 100 TB shape:
- features are portable md5 buckets (mod _DSIR_BUCKETS), so the
  feature space is CONSTANT-size: both bucket profiles are one
  fact-scale groupBy each, and the log-ratio table is a bounded
  broadcast join side (the IVF-centroid discipline — corpus text
  never joins corpus text);
- per-bucket log-ratios are quantized ONCE on the bounded bucket grid
  (floor(10⁶·ln), a single libm call per bucket on each engine over
  identical exact-rational inputs); per-document scores are then
  exact integer Σ count·lr_q — no summation-order ULP at fact scale
  (the logppl family tolerates double avg; this family removes the
  hazard entirely);
- the smoothed ratio is assembled as exact integer numerator /
  denominator in DECIMAL(38,0)/HUGEINT before ONE double division —
  token totals square in the cross product, so BIGINT would overflow
  past ~10⁹ tokens per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.layout import (
    md5_uniform16_spark_sql,
    md5_uniform16_sql,
)
from tfm_semisup_spark.queries import register

_DSIR_BUCKETS = 4096
_LR_SCALE = 1_000_000
_DSIR_TOP = 20
_TERM_MD5 = "md5(term)"
_DEC = "decimal(38,0)"

_BUCKET_SQL = f"({md5_uniform16_sql(_TERM_MD5)} % {_DSIR_BUCKETS})"
_BUCKET_SPARK = f"({md5_uniform16_spark_sql(_TERM_MD5)} % {_DSIR_BUCKETS})"

DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
feats AS (
  SELECT doc_id, lang, source,
         CAST({_BUCKET_SQL} AS BIGINT) AS b
  FROM toks
),
target AS (
  SELECT b, COUNT(*)::HUGEINT AS ct FROM feats WHERE lang = 'en' GROUP BY b
),
raw AS (SELECT b, COUNT(*)::HUGEINT AS cr FROM feats GROUP BY b),
tot AS (
  SELECT (SELECT SUM(ct) FROM target) AS tt,
         (SELECT SUM(cr) FROM raw) AS tr
),
lr AS (
  SELECT r.b,
         CAST(FLOOR(LN(
           CAST((COALESCE(t.ct, 0) + 1) * (o.tr + {_DSIR_BUCKETS})
                AS DOUBLE)
           / CAST((r.cr + 1) * (o.tt + {_DSIR_BUCKETS}) AS DOUBLE)
         ) * {_LR_SCALE}) AS BIGINT) AS lr_q
  FROM raw r LEFT JOIN target t ON r.b = t.b CROSS JOIN tot o
),
docfeat AS (
  SELECT doc_id, lang, source, b, COUNT(*)::BIGINT AS c
  FROM feats GROUP BY doc_id, lang, source, b
),
scores AS (
  SELECT d.doc_id, d.lang, d.source,
         SUM(d.c)::BIGINT AS n_tokens,
         SUM(d.c * l.lr_q)::BIGINT AS logweight_q
  FROM docfeat d JOIN lr l ON d.b = l.b
  WHERE d.lang <> 'en'
  GROUP BY d.doc_id, d.lang, d.source
)
SELECT doc_id, lang, source, n_tokens, logweight_q
FROM scores
ORDER BY logweight_q DESC, doc_id
LIMIT {_DSIR_TOP}
"""


@register("dsir_importance_select", DSIR_ORACLE)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_DSIR_TOP} non-target documents by DSIR log importance
    weight: (doc_id, lang, source, n_tokens, logweight_q)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(
            F.filter(F.split("text", " "), lambda t: t != "")
        ).alias("term"),
    )
    feats = toks.select(
        "doc_id",
        "lang",
        "source",
        F.expr(_BUCKET_SPARK).cast("bigint").alias("b"),
    )
    target = (
        feats.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast(_DEC).alias("ct"))
    )
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).cast(_DEC).alias("cr"))
    tot = raw.crossJoin(F.broadcast(target.agg(F.sum("ct").alias("tt")))).agg(
        F.max("tt").alias("tt"), F.sum("cr").alias("tr")
    )
    # bounded bucket grid (<= _DSIR_BUCKETS rows): quantize ln once
    num = (
        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
        * (F.col("tr") + F.lit(_DSIR_BUCKETS))
    ).cast(_DEC)
    den = (
        (F.col("cr") + 1) * (F.col("tt") + F.lit(_DSIR_BUCKETS))
    ).cast(_DEC)
    lr = (
        raw.join(target, "b", "left_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                F.log(num.cast("double") / den.cast("double"))
                * F.lit(_LR_SCALE)
            )
            .cast("bigint")
            .alias("lr_q"),
        )
    )
    docfeat = feats.groupBy("doc_id", "lang", "source", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    scores = (
        docfeat.where(F.col("lang") != "en")
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lr_q")).cast("bigint").alias(
                "logweight_q"
            ),
        )
    )
    return scores.orderBy(F.col("logweight_q").desc(), "doc_id").limit(
        _DSIR_TOP
    )


# ---------------------------------------------------------------------------
# Temperature-weighted domain mixture plan (epochs-per-source readout)
# ---------------------------------------------------------------------------
#
# The mixture-planning arithmetic behind multilingual/multi-domain
# sampling (the p^α, α = 0.75 rule of XLM-R / mT5; the quantity DoReMi
# optimizes per-domain): given per-source token counts n_s, the
# temperature weight w_s = n_s^0.75, the sampled share w_s/Σw, and the
# implied EPOCH COUNT over each source when drawing a one-epoch-
# equivalent budget T = Σn: epochs_s = T·(w_s/Σw)/n_s — the upsampling
# factor a small domain pays (the repetition-risk readout of
# Muennighoff et al. 2023). Distinct from domain_temperature_sample
# (which draws rows): this is the PLAN over the bounded source grid.
#
# Arithmetic parity: n^0.75 uses the negative_sampling_table idiom —
# floor(sqrt(sqrt(n³))) with n capped at 200 000 so n³ stays exactly
# representable in a double (2^53 bound) and IEEE sqrt is correctly
# rounded on both engines, no libm pow(); shares and epochs are exact
# integer floor divisions in DECIMAL(38,0)/HUGEINT. Production scale
# would rescale to kilotokens before the cap; the cap IS the
# double-exactness bound, not a modeling choice.

_MIX_CAP = 200_000  # 200000³ < 2^53
_MIX_SCALE = 1_000_000


def _mix_w_sql(n: str) -> str:
    return (
        f"CAST(FLOOR(sqrt(sqrt("
        f"CAST(LEAST({n}, {_MIX_CAP}) AS DOUBLE)"
        f" * LEAST({n}, {_MIX_CAP})"
        f" * LEAST({n}, {_MIX_CAP})))) AS BIGINT)"
    )


MIXTURE_ORACLE = f"""
WITH toks AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT
           AS n_toks
  FROM documents
),
per_source AS (
  SELECT source, SUM(n_toks)::HUGEINT AS n_tokens FROM toks GROUP BY source
),
weighted AS (
  SELECT source, n_tokens, {_mix_w_sql('n_tokens')} AS w FROM per_source
),
tot AS (
  SELECT SUM(w)::HUGEINT AS sw, SUM(n_tokens)::HUGEINT AS t FROM weighted
)
SELECT w.source,
       w.n_tokens::BIGINT AS n_tokens,
       w.w::BIGINT AS weight,
       CAST((w.w * {_MIX_SCALE}) // o.sw AS BIGINT) AS share_ppm,
       CAST((o.t * w.w * {_MIX_SCALE}) // (o.sw * w.n_tokens) AS BIGINT)
         AS epochs_ppm
FROM weighted w CROSS JOIN tot o
"""


@register("domain_mixture_plan", MIXTURE_ORACLE)
def domain_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source temperature-mixture plan: (source, n_tokens, weight,
    share_ppm, epochs_ppm) — exact integer shares/epochs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        .cast("bigint")
        .alias("n_toks"),
    )
    per_source = toks.groupBy("source").agg(
        F.sum("n_toks").cast(_DEC).alias("n_tokens")
    )
    weighted = per_source.select(
        "source", "n_tokens", F.expr(_mix_w_sql("n_tokens")).cast(_DEC).alias("w")
    )
    tot = weighted.agg(
        F.sum("w").alias("sw"), F.sum("n_tokens").alias("t")
    )

    def _floordiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast(_DEC)

    j = weighted.crossJoin(F.broadcast(tot))
    return j.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("w").cast("bigint").alias("weight"),
        _floordiv((F.col("w") * F.lit(_MIX_SCALE)).cast(_DEC), F.col("sw"))
        .cast("bigint")
        .alias("share_ppm"),
        _floordiv(
            (F.col("t") * F.col("w") * F.lit(_MIX_SCALE)).cast(_DEC),
            (F.col("sw") * F.col("n_tokens")).cast(_DEC),
        )
        .cast("bigint")
        .alias("epochs_ppm"),
    )
