"""Gopher/C4 quality rule chain (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tfm_semisup_spark.io import load_table
from tfm_semisup_spark.operators.quality import (
    filter_quality_gopher,
    with_quality_flags,
)

SF = "/root/testdata/sf0.001"


def _doc(doc_id, text):
    return (doc_id, text, "en", "srcT", len(text))

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_each_rule_kills_its_planted_violator(spark):
    good = "the a " + " ".join(f"tok{i}" for i in range(40))
    planted = [
        _doc(1, good),                                     # passes all
        _doc(2, "the a short doc only"),                   # word_count (<20)
        _doc(3, "the a " + " ".join(["zz"] * 48)),         # mwl<3 + ttr
        _doc(4, "the a " + " ".join(f"w{'x' * 12}{i}" for i in range(40))),  # mwl>8
        _doc(5, "the a " + " ".join(["0123"] * 4) + " " + " ".join(f"n{i}" for i in range(40))),
        _doc(6, " ".join(f"tok{i}" for i in range(40))),   # no stopwords
    ]
    df = with_quality_flags(spark.createDataFrame(planted, DOC_SCHEMA))
    got = {r["doc_id"]: r.asDict() for r in df.collect()}
    assert got[1]["quality_pass"]
    assert not got[2]["word_count"]
    assert not got[3]["mean_word_len"] and not got[3]["type_token_ratio"]
    assert not got[4]["mean_word_len"]
    assert not got[6]["stopword_signal"]
    for d in (2, 3, 4, 6):
        assert not got[d]["quality_pass"]


def test_alpha_ratio_rule_fires_on_numeric_soup(spark):
    digits = "the a " + " ".join(str(1000 + i) for i in range(38))
    df = with_quality_flags(spark.createDataFrame([_doc(1, digits)], DOC_SCHEMA))
    row = df.head()
    assert not row["alpha_ratio"] and not row["quality_pass"]


def test_empty_doc_fails_closed_not_null(spark):
    df = with_quality_flags(spark.createDataFrame([_doc(1, " ")], DOC_SCHEMA))
    row = df.head()
    assert row["quality_pass"] is False  # not None: fail-closed


def test_filter_equals_flag_projection_on_corpus(spark):
    docs = load_table(spark, SF, "documents")
    kept = {r["doc_id"] for r in filter_quality_gopher(docs).select("doc_id").collect()}
    flagged = {
        r["doc_id"]
        for r in with_quality_flags(docs).where("quality_pass").select("doc_id").collect()
    }
    assert kept == flagged
    assert 0 < len(kept) < docs.count()  # live signal both ways


def test_pipeline_stage_and_plan_shape(spark):
    from tfm_semisup_spark.pipeline import CorpusPipeline

    docs = load_table(spark, SF, "documents")
    out = CorpusPipeline.from_documents(docs).filter_quality_gopher().df()
    assert out.count() == filter_quality_gopher(docs).count()
    # pure narrow filter: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_model_based_quality_scorer_generalizes_rules(spark):
    """Distilled quality classifier (operators/quality_model.py): train
    on the hash-selected seed split weak-labeled by the Gopher rules,
    then check (a) scoring is one narrow projection with quality_prob
    in [0,1], (b) the model separates rule-passing docs from planted
    violators, (c) the filter form keeps only above-threshold docs and
    preserves the input schema."""
    from tfm_semisup_spark.operators.quality_model import (
        quality_filter_by_model,
        score_quality,
        train_quality_model,
    )

    docs = load_table(spark, SF, "documents")
    model = train_quality_model(docs, train_mod=1)

    scored = score_quality(model, docs).collect()
    assert len(scored) == docs.count()
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in scored)

    # planted extremes: clean prose vs violator soup the rules reject
    good = "the a " + " ".join(f"tok{i}" for i in range(60))
    bad = " ".join(["zz"] * 40)
    probe = spark.createDataFrame(
        [(900001, good, "en", "probe", len(good)), (900002, bad, "en", "probe", len(bad))],
        DOC_SCHEMA,
    )
    probs = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, probe).collect()}
    assert probs[900001] > probs[900002]

    kept = quality_filter_by_model(model, docs, threshold=0.5)
    assert kept.columns == docs.columns
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    above = {r["doc_id"] for r in score_quality(model, docs).collect() if r["quality_prob"] >= 0.5}
    assert kept_ids == above


def test_unknown_rule_override_raises_clearly(spark):
    """round 4 (ADVICE r3): a typo'd or legacy kwarg (e.g. the removed
    `seed`) must raise a clear TypeError at the call site, not surface
    as a confusing error downstream."""
    import pytest

    from tfm_semisup_spark.operators.quality import with_quality_flags
    from tfm_semisup_spark.operators.quality_model import train_quality_model

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(TypeError, match="unknown quality rule override.*seed"):
        with_quality_flags(docs, seed=42)
    with pytest.raises(TypeError, match="unknown quality rule override"):
        train_quality_model(docs, seed=42)
    # valid overrides still work
    assert "quality_pass" in with_quality_flags(docs, min_words=1).columns
