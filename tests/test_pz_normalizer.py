"""Unit tests for __spark_entry__._pz — the oracle-side -0.0 normalizer
(r06 verdict item 3). Contract: every native round(...) call in oracle SQL
is rewritten to (round(...) + 0.0); quoted literals are untouched; the
rewrite is value-preserving except -0.0 -> +0.0."""

from __future__ import annotations

import struct

import duckdb

from __spark_entry__ import _pz


def test_simple_wrap():
    assert _pz("SELECT round(x, 6) AS v FROM t") == (
        "SELECT (round(x, 6) + 0.0) AS v FROM t"
    )


def test_nested_round_and_parens():
    s = "SELECT abs(round(a / (b + round(c, 2)), 6)) FROM t"
    assert _pz(s) == (
        "SELECT abs((round(a / (b + (round(c, 2) + 0.0))) + 0.0)) FROM t"
        .replace("(round(a / (b + (round(c, 2) + 0.0))) + 0.0)",
                 "(round(a / (b + (round(c, 2) + 0.0)), 6) + 0.0)")
    )


def test_word_boundary_not_rewritten():
    s = "SELECT around(x), my_round(y), xround(z) FROM t"
    assert _pz(s) == s


def test_quoted_literal_untouched():
    s = "SELECT 'round(x, 6)' AS lit, round(y, 6) AS v FROM t"
    assert _pz(s) == "SELECT 'round(x, 6)' AS lit, (round(y, 6) + 0.0) AS v FROM t"


def test_quote_with_escape_and_parens():
    s = "SELECT regexp_replace(t, 'a''b(round(', '') , round(v, 3) FROM x"
    out = _pz(s)
    assert "'a''b(round('" in out
    assert "(round(v, 3) + 0.0)" in out


def test_case_insensitive():
    # matched case-insensitively; emitted lowercase (SQL-equivalent)
    assert _pz("SELECT ROUND(x, 6) FROM t") == "SELECT (round(x, 6) + 0.0) FROM t"


def test_duckdb_semantics_negzero_normalized():
    con = duckdb.connect()
    raw = con.execute("SELECT round(-1e-9::DOUBLE, 6)").fetchone()[0]
    wrapped = con.execute(_pz("SELECT round(-1e-9::DOUBLE, 6)")).fetchone()[0]
    assert struct.pack("<d", raw) == struct.pack("<d", -0.0)
    assert struct.pack("<d", wrapped) == struct.pack("<d", 0.0)


def test_duckdb_semantics_values_preserved():
    con = duckdb.connect()
    for expr in ["round(1.2345678::DOUBLE, 6)", "round(-7.5::DOUBLE, 0)",
                 "round(NULL::DOUBLE, 6)", "round(0.7 * 3, 6)"]:
        a = con.execute(f"SELECT {expr}").fetchone()[0]
        b = con.execute(_pz(f"SELECT {expr}")).fetchone()[0]
        if a is None:
            assert b is None
        else:
            assert float(a) == float(b)


def test_every_registered_oracle_still_parses():
    """The whole rewritten corpus must still be valid DuckDB SQL (parse
    via EXPLAIN against empty views of the standard tables)."""
    import pathlib
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = pathlib.Path(sf) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = []
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:200]))
    assert not bad, bad
