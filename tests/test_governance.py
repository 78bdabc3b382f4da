"""PII redaction, contamination screen, and domain-mix sampling units
(queries/pii.py, queries/contamination.py, corpus_prep domain mix)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.operators.pii import (
    PII_PATTERNS,
    pii_counts,
    redact,
    with_pii_columns,
)

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_redact(spark):
    rows = [
        (1, "mail me at jo.doe+x@ex-ample.co.uk today"),
        (2, "server 192.168.1.254 and backup 10.0.0.1"),
        (3, "call 555-0199 or 555-0200"),
        (4, "clean text with no identifiers at all"),
        (5, None),
    ]
    out = with_pii_columns(_df(spark, rows)).orderBy("doc_id").collect()
    assert [r["n_email"] for r in out[:4]] == [1, 0, 0, 0]
    assert [r["n_ipv4"] for r in out[:4]] == [0, 2, 0, 0]
    assert [r["n_phone"] for r in out[:4]] == [0, 0, 2, 0]
    assert [r["pii_any"] for r in out[:4]] == [True, True, True, False]
    assert out[0]["redacted"] == "mail me at <EMAIL> today"
    assert out[1]["redacted"] == "server <IPV4> and backup <IPV4>"
    assert out[2]["redacted"] == "call <PHONE> or <PHONE>"
    assert out[3]["redacted"] == rows[3][1]
    # null text propagates null, never throws
    assert out[4]["redacted"] is None


def test_redact_is_idempotent(spark):
    once = _df(spark, [(1, "a@b.co at 1.2.3.4")]).select(
        redact("text").alias("r")
    )
    twice = once.select(redact("r").alias("r"))
    assert once.collect() == twice.collect()


def test_pii_plan_is_narrow(spark):
    """Detection+redaction must be a single projection over the scan —
    no Exchange, no Python."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = with_pii_columns(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_contamination_flags_planted_docs(spark):
    from tfm_semisup_spark.queries.contamination import contamination_screen

    out = contamination_screen(spark, SF_DIR)
    flagged_total = out.agg(F.sum("n_contaminated")).head()[0]
    # every 37th non-benchmark doc gets benchmark text appended; at
    # sf0.001 (50 docs) that is doc_ids {5, 42} at minimum
    assert flagged_total >= 2


def test_domain_mix_rates_and_determinism(spark):
    from tfm_semisup_spark.queries.corpus_prep import domain_mix_sample

    a = {r["source"]: r for r in domain_mix_sample(spark, SF_DIR).collect()}
    b = {r["source"]: r for r in domain_mix_sample(spark, SF_DIR).collect()}
    assert a == b  # content-keyed, rerun-stable
    for src, row in a.items():
        k = int(src[3:]) % 4
        assert row["target_rate"] == round((16 - 4 * k) / 16.0, 4)
        assert 0 <= row["n_kept"] <= row["n_total"]
    # rate 16/16 sources keep everything
    for src, row in a.items():
        if int(src[3:]) % 4 == 0:
            assert row["n_kept"] == row["n_total"]


def test_patterns_have_no_lookaround():
    """RE2 (the oracle engine) lacks lookarounds; the shared patterns
    must stay in the common subset."""
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?<" not in pat and "(?!" not in pat


def test_temperature_sample_rates_and_determinism(spark):
    """alpha=0.5 mixing: rate_64k non-increasing in source size,
    capped at 65536, n_kept consistent with the per-doc threshold rule,
    rerun-stable (md5-keyed, partitioning-free)."""
    from tfm_semisup_spark.queries.corpus_prep import domain_temperature_sample

    a = {r["source"]: r for r in domain_temperature_sample(spark, SF_DIR).collect()}
    b = {r["source"]: r for r in domain_temperature_sample(spark, SF_DIR).collect()}
    assert a == b and len(a) > 0
    for src, row in a.items():
        assert 0 < row["rate_64k"] <= 65536
        assert 0 <= row["n_kept"] <= row["n_total"]
        # full-keep sources keep everything, and their checksum says so
        if row["rate_64k"] == 65536:
            assert row["n_kept"] == row["n_total"]
    # monotone: a strictly larger source never gets a larger threshold
    rows = sorted(a.values(), key=lambda r: r["n_total"])
    for lo, hi in zip(rows, rows[1:]):
        if hi["n_total"] > lo["n_total"]:
            assert hi["rate_64k"] <= lo["rate_64k"]


def test_zipf_audit_shape(spark):
    """Zipf fit: one row per lang, slope strictly negative (counts
    decrease along the rank head by construction), head <= 30 terms,
    deterministic."""
    from tfm_semisup_spark.queries.text_analysis2 import zipf_token_audit

    a = sorted(map(tuple, zipf_token_audit(spark, SF_DIR).collect()))
    b = sorted(map(tuple, zipf_token_audit(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0
    for lang, n_terms, slope, intercept in a:
        assert 0 < n_terms <= 30
        assert slope < 0
        assert intercept > 0  # ln(top count) with positive counts
