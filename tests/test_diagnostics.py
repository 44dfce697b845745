"""Diagnostic twins + adversarial residue inputs for the three gate
rows that were red in the round-3 driver run.

The twins (operators/diagnostics.py) give per-column localization IF
a driver run reds a parent again. These tests cover the other half of
the r4 verdict's ask: the plausible DATA-DEPENDENT residues a clean
synthetic corpus never exercises —

- ``value`` doubles sitting on decimal(25,6) rounding ties through
  the sessionization value path,
- multi-space runs / unicode whitespace / NULL and empty text through
  the ``_occurrences`` replace-arithmetic stopword scan,
- cumulative token sums landing EXACTLY on the budget line.

Each test materializes the adversarial rows as parquet, runs the
REGISTERED query callable against Spark and the REGISTERED oracle SQL
against DuckDB on the same file, and requires the driver-protocol
fingerprint (sorted columns, sorted stringified rows) to match — a
faithful local replica of the gate on inputs chosen to break it.
"""

from __future__ import annotations

import datetime
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

SF_DIR = "/root/testdata/sf0.001"


def _fingerprint(cols, rows):
    from check_oracle import frame_fingerprint

    return frame_fingerprint(cols, rows)


def _gate_compare(spark, sf_dir, query_name):
    """Run one registered query vs its registered oracle on sf_dir,
    driver-protocol compare."""
    import duckdb

    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    sdf = plans.QUERIES[query_name](spark, sf_dir)
    s_fp = _fingerprint(sdf.columns, [tuple(r) for r in sdf.collect()])

    import os

    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark writes a directory of parts
            path = f"{path}/*.parquet"
        elif not os.path.exists(path):
            continue  # table not materialized for this fixture
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    cur = con.execute(plans.ORACLES[query_name])
    cols = [d[0] for d in cur.description]
    d_fp = _fingerprint(cols, cur.fetchall())
    assert s_fp == d_fp, (
        f"{query_name} diverges on adversarial input:"
        f" spark={s_fp} duckdb={d_fp}"
    )


def test_diag_twins_project_parent_columns():
    """Every twin's output columns are a subset of its parent's, and
    every twin is oracle-paired — the localization contract."""
    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    parents = {
        "diag_session_": "events_sessionization",
        "diag_hygiene_": "embedding_hygiene_report",
        "diag_budget_budgets": "text_token_budget_trim",
        "diag_budget_kept": "text_token_budget_trim",
    }
    twins = [n for n in plans.QUERIES if n.startswith("diag_")]
    assert len(twins) == 9
    for name in twins:
        assert name in plans.ORACLES, f"{name} must be oracle-paired"
        # r10 (r9 verdict #1): the twins moved INTO gate slots so the
        # driver's own CORRECTNESS artifact localizes the red rows'
        # divergence column-by-column
        assert name in plans.GATE_ORDER, f"{name} must hold a gate slot"


def _events_dir(spark, tmp_path, values):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "view", v, None)
        for i, v in enumerate(values)
    ]
    # second user: one big gap to exercise multi-session grouping too
    rows += [
        (100, base, 2, "view", values[0], None),
        (101, base + datetime.timedelta(hours=9), 2, "view", values[-1], None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_sessionization_value_decimal_ties(spark, tmp_path):
    """``value`` doubles at/near decimal(25,6) rounding boundaries
    through the sessionization value path. These all agree across
    engines: the nearest double to each literal is strictly off the
    6dp tie, so both engines round the same way. (The exact-tie class
    where they DON'T agree is pinned by the xfail test below.)"""
    sf = _events_dir(
        spark,
        tmp_path,
        [
            1.0000005,          # shortest-repr tie, small magnitude
            2.0000015,
            -1.0000005,
            0.0000005,
            7.00000049999999,   # just under the tie
            7.00000050000001,   # just over the tie
            0.1 + 0.2,          # classic non-representable sum
            185.22,             # the driver generator's 2dp class
        ],
    )
    _gate_compare(spark, sf, "events_sessionization")
    _gate_compare(spark, sf, "diag_session_values")


def test_sessionization_shortest_repr_tie_now_hardened(spark, tmp_path):
    """ROUND-7 FLIP of the long-standing strict xfail. Through the old
    double→DECIMAL(25,6) value path this exact input DIVERGED: Spark
    casts via Java's SHORTEST decimal repr (BigDecimal.valueOf →
    Double.toString), so a double whose shortest repr is an exact
    7-digit tie (123456789.0000005) rounded HALF_UP to …000001, while
    DuckDB rounded the exact binary value (…00000049999…) DOWN to
    …000000 (characterized round 5; unreachable on the driver's
    2-decimal generator, which is why the row stayed frozen until the
    rotation window). The round-7 hardening — per-row
    FLOOR(value·1e6+0.5) BIGINT sums on BOTH engines — computes the
    identical IEEE product before any rounding, so the former
    divergence input now hash-matches."""
    sf = _events_dir(spark, tmp_path, [123456789.0000005, 185.22])
    _gate_compare(spark, sf, "diag_session_values")
    _gate_compare(spark, sf, "events_sessionization")


@pytest.fixture()
def whitespace_docs_dir(spark, tmp_path):
    """Documents stressing the `_occurrences` stopword scan: runs of
    spaces (overlap semantics of replace), unicode whitespace
    (NBSP/em-space are NOT token separators — both engines must agree
    they don't match ' the '), tabs/newlines, NULL and empty text,
    stopwords at string edges, and adjacent-stopword runs where
    non-overlapping replace semantics decide the count."""
    rows = [
        (1, "the cat sat on the mat", "en", "web", 0),
        (2, "the  the   the", "en", "web", 0),         # space runs
        (3, "the cat and dog", "en", "web", 0),  # NBSP / em-space
        (4, "the\tcat\nand dog", "en", "web", 0),       # tab / newline
        (5, "", "en", "web", 0),                        # empty
        (6, None, "en", "web", 0),                      # NULL text
        (7, "a a a a a", "en", "wiki", 0),              # adjacent run
        (8, "of", "en", "wiki", 0),                     # exact stopword
        (9, " the ", "en", "wiki", 0),                  # pre-padded
        (10, "THE The tHe", "en", "wiki", 0),           # case folding
        (11, "in in of of to to and and is is it it", "en", "wiki", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_occurrences_whitespace_residues(spark, whitespace_docs_dir):
    _gate_compare(spark, whitespace_docs_dir, "diag_budget_qkeys")


def test_budget_trim_on_whitespace_docs(spark, whitespace_docs_dir):
    """The full parent query on the same hostile text — NULL text must
    flow through the window and budget join without either engine
    dropping or NULL-poisoning rows differently."""
    _gate_compare(spark, whitespace_docs_dir, "text_token_budget_trim")


@pytest.fixture()
def budget_tie_docs_dir(spark, tmp_path):
    """Sources engineered so the greedy fill lands EXACTLY on the
    budget line, one token over it, and with q_key ties across the
    line (doc_id asc must break them identically).

    src_exact: totals 20 → budget 10; docs of 4+6 tokens fill to
    exactly 10 (cum==budget kept), next doc crosses.
    src_tie: every doc has the SAME q_key, so the kept set is decided
    purely by doc_id order at the line.
    src_odd: total 7 → budget ceil(7/2)=4; first doc has 4 tokens —
    cum==budget on the first row.
    """

    def doc(n_tokens, n_stop):
        # n_stop stopword tokens ('the') then filler — q_key is
        # (n_stop*1e6) div n_tokens, controllable per doc
        toks = ["the"] * n_stop + [f"w{i}" for i in range(n_tokens - n_stop)]
        return " ".join(toks)

    rows = [
        # src_exact: q_keys descending 750000, 500000, 0
        (1, doc(4, 3), "en", "src_exact", 0),
        (2, doc(6, 3), "en", "src_exact", 0),
        (3, doc(10, 0), "en", "src_exact", 0),
        # src_tie: all q_key == 500000, 5 docs × 4 tokens, total 20,
        # budget 10 → exactly docs 10,11 kept (doc_id asc)
        (10, doc(4, 2), "en", "src_tie", 0),
        (11, doc(4, 2), "en", "src_tie", 0),
        (12, doc(4, 2), "en", "src_tie", 0),
        (13, doc(4, 2), "en", "src_tie", 0),
        (14, doc(4, 2), "en", "src_tie", 0),
        # src_odd: budget 4, first doc exactly 4 tokens
        (20, doc(4, 4), "en", "src_odd", 0),
        (21, doc(3, 0), "en", "src_odd", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_budget_trim_exact_budget_line(spark, budget_tie_docs_dir):
    _gate_compare(spark, budget_tie_docs_dir, "text_token_budget_trim")
    _gate_compare(spark, budget_tie_docs_dir, "diag_budget_kept")

    # independent arithmetic pin, not just cross-engine agreement
    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    out = {
        r["source"]: r
        for r in plans.QUERIES["text_token_budget_trim"](
            spark, budget_tie_docs_dir
        ).collect()
    }
    assert out["src_exact"]["budget"] == 10
    assert out["src_exact"]["tokens_kept"] == 10  # cum==budget kept
    assert out["src_exact"]["n_kept"] == 2
    assert out["src_tie"]["n_kept"] == 2  # doc_id asc breaks the tie
    assert out["src_odd"]["tokens_kept"] == 4
    assert out["src_odd"]["n_kept"] == 1


def test_hygiene_diag_twins_on_corrupt_corpus(spark, tmp_path):
    """Corrupt embeddings through the REGISTERED hygiene query and its
    diagnostic twins vs the oracle — NULLs, dimension drift, NaN, Inf,
    zero vectors, plus a norm whose sumsq·1e6 sits near a quantization
    boundary."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "a"),
        (1, None, "a"),
        (2, [1.0, 2.0], "a"),                       # dim drift
        (3, [float("nan"), 1.0, 1.0, 1.0], "a"),
        (4, [float("inf"), 1.0, 1.0, 1.0], "a"),
        (5, [0.0, 0.0, 0.0, 0.0], "a"),             # zero norm
        (6, [1.0000005, 0.0, 0.0, 0.0], "b"),       # tie-adjacent norm
        (7, [0.5, 0.5, 0.5, 0.5], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    for q in (
        "embedding_hygiene_report",
        "diag_hygiene_counts",
        "diag_hygiene_minmax_norms",
        "diag_hygiene_avg_norm",
    ):
        _gate_compare(spark, str(tmp_path), q)


def test_budget_trim_twopass_equals_parent(spark, budget_tie_docs_dir):
    """The two-pass (level-quantile cut + boundary-only window) form
    must equal the parent's full-window form row-for-row — including
    on the engineered exact-budget-line fixture, where the boundary
    level logic is maximally stressed — and on real testdata."""
    from almost_any_file_to_pandas_spark import plans

    plans.load_all()
    for sf in (budget_tie_docs_dir, SF_DIR):
        a = plans.QUERIES["text_token_budget_trim"](spark, sf)
        b = plans.QUERIES["text_token_budget_trim_twopass"](spark, sf)
        fa = _fingerprint(a.columns, [tuple(r) for r in a.collect()])
        fb = _fingerprint(b.columns, [tuple(r) for r in b.collect()])
        assert fa == fb, f"two-pass diverges from parent on {sf}"
    _gate_compare(
        spark, budget_tie_docs_dir, "text_token_budget_trim_twopass"
    )
