"""Gopher/C4 rule-filter semantics on hand-built documents — the
DuckDB oracle gate pins full-corpus parity; these pin the individual
rule boundaries and the zero-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _metrics(spark, rows):
    """Run the rule projection over in-memory docs via a temp parquet
    round-trip (the operator reads a documents table path)."""
    import tempfile

    from almost_any_file_to_pandas_spark.operators.quality import (
        text_gopher_quality_rules,
    )

    tmp = tempfile.mkdtemp(prefix="gopher_docs_")
    df = spark.createDataFrame(
        [
            (i, t, "en", "unit", len(t))
            for i, t in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    out = text_gopher_quality_rules(spark, tmp)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_rule_boundaries(spark):
    long_good = " ".join(["the", "and"] * 30)  # 60 words, 2 stopwords
    too_short = "the and of words here"  # 5 words
    no_stopwords = " ".join(["zz"] * 60)  # 0 distinct stopword hits
    bullets = "\n".join(["- item the and"] * 5) + "\n" + " ".join(["w"] * 60)
    symbols = " ".join(["the", "and"] * 30) + " " + "# " * 30

    m = _metrics(
        spark, [long_good, too_short, no_stopwords, bullets, symbols]
    )
    assert m[0]["keep"] is True
    assert m[0]["n_stopwords"] == 2
    # word-count floor binds
    assert m[1]["keep"] is False and m[1]["n_words"] == 5
    # stopword floor binds even at valid length
    assert m[2]["keep"] is False and m[2]["n_stopwords"] == 0
    # bullet fraction: 5 of 6 lines start with '-' → 0.833 < 0.9 cap,
    # but mean word length of 'w'-words drags below 3.0 → dropped by
    # the length rule, and the bullet metric is still measured
    assert abs(m[3]["bullet_line_frac"] - round(5 / 6, 6)) < 1e-9
    # symbol ratio: 30 '#' over 90 words = 0.333 > 0.1 cap
    assert m[4]["symbol_ratio"] > 0.1 and m[4]["keep"] is False


def test_gopher_ellipsis_and_alpha_rules(spark):
    ellipsis_heavy = "\n".join(
        [" ".join(["the", "and"] * 15) + " …"] * 3
    )  # every line ends with … → frac 1.0 > 0.3
    numeric_heavy = " ".join(["123"] * 48 + ["the", "and"] * 6)
    m = _metrics(spark, [ellipsis_heavy, numeric_heavy])
    assert m[0]["ellipsis_line_frac"] == 1.0
    assert m[0]["keep"] is False
    # 12 alpha words of 60 → 0.2 < 0.8 floor
    assert m[1]["alpha_word_frac"] < 0.8 and m[1]["keep"] is False


def test_gopher_plan_is_one_stage_no_python_no_shuffle(spark):
    """The whole rule set must stay a single narrow stage over the
    scan: no Exchange, no Python evaluation node. (The higher-order
    transform/filter/aggregate lambdas are interpreted JVM
    expressions, so they legitimately break the codegen span — the
    plan still has no stage boundary.)"""
    from almost_any_file_to_pandas_spark.operators.quality import (
        text_gopher_quality_rules,
    )

    df = text_gopher_quality_rules(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
