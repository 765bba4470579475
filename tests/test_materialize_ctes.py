"""Unit pins for catalog.materialize_ctes — the r14 oracle-OOM fix.

The starve gate (test_oracle_memory.py) proves the BEHAVIOR (every
oracle under 256 MB no-spill); these pin the TRANSFORM itself so a
regex or threshold edit fails fast with a readable diff instead of as
an OOM three suites later.
"""

from __future__ import annotations

from spark_dns_spark.plans.catalog import (
    MAT_CTE_MIN,
    _CTE_DEF,
    materialize_ctes,
)


def test_plain_ctes_materialized():
    sql = "WITH a AS (SELECT 1), b AS (SELECT * FROM a) SELECT * FROM b"
    out = materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out
    assert "b AS MATERIALIZED (" in out


def test_idempotent():
    sql = "WITH a AS (SELECT 1), b AS (SELECT * FROM a) SELECT * FROM b"
    once = materialize_ctes(sql)
    assert materialize_ctes(once) == once


def test_existing_materialized_untouched():
    sql = "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a"
    assert materialize_ctes(sql) == sql


def test_recursive_plain_form_member_left_inlined():
    # pack_greedy_bins shape: the recursive member g references itself
    # in plain (no column list) form — must NOT get the keyword.
    sql = (
        "WITH RECURSIVE t AS (SELECT 1 AS n), "
        "g AS (SELECT n FROM t UNION ALL SELECT n + 1 FROM g WHERE n < 3) "
        "SELECT * FROM g"
    )
    out = materialize_ctes(sql)
    assert "t AS MATERIALIZED (" in out  # non-recursive member: yes
    assert "g AS MATERIALIZED (" not in out  # self-referencing: never


def test_column_list_member_never_matches():
    # the catalog's usual recursive form: reach(src, dst) AS ( ... )
    sql = (
        "WITH RECURSIVE e AS (SELECT 1 AS src, 2 AS dst), "
        "reach(src, dst) AS (SELECT src, src FROM e UNION "
        "SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src) "
        "SELECT * FROM reach"
    )
    out = materialize_ctes(sql)
    assert "e AS MATERIALIZED (" in out
    assert "reach(src, dst) AS (" in out  # untouched


def test_register_threshold_is_depth_gated():
    # A shallow text (< MAT_CTE_MIN CTEs) must keep inlining — the
    # pushdown-friendly default for TPC-H-class oracles.
    shallow = "WITH a AS (SELECT 1) SELECT * FROM a"
    assert len(_CTE_DEF.findall(shallow)) < MAT_CTE_MIN


def test_named_window_clause_left_untouched():
    # `WINDOW w AS (PARTITION BY ...)` shares the `name AS (` shape
    # but is NOT a CTE — rewriting it would be a DuckDB parse error.
    sql = (
        "WITH a AS (SELECT 1 AS x), b AS (SELECT * FROM a), "
        "c AS (SELECT * FROM a), d AS (SELECT * FROM a), "
        "e AS (SELECT * FROM a), f AS (SELECT * FROM a), "
        "g AS (SELECT * FROM a), h AS (SELECT * FROM a) "
        "SELECT x, row_number() OVER w AS rn, sum(x) OVER w2 AS s "
        "FROM h WINDOW w AS (PARTITION BY x ORDER BY x), "
        "w2 AS (ORDER BY x)"
    )
    out = materialize_ctes(sql)
    assert "WINDOW w AS (PARTITION BY" in out  # first (lookbehind)
    assert "w2 AS (ORDER BY x)" in out  # second (body heuristic)
    assert "h AS MATERIALIZED (" in out  # real CTEs still transformed


def test_string_literal_parens_do_not_break_body_scan():
    # an unbalanced paren inside a SQL string literal must not
    # mis-extent the body scan (it previously could mislabel a
    # recursive member as safe to materialize).
    sql = (
        "WITH g AS (SELECT regexp_replace(t, '^\\(', '') AS t, n "
        "FROM src UNION ALL SELECT t, n + 1 FROM g WHERE n < 3) "
        "SELECT * FROM g"
    )
    out = materialize_ctes(sql)
    assert "g AS MATERIALIZED (" not in out  # still seen as recursive
