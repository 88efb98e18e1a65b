"""Driver-contract invariants for __spark_entry__.py: every oracle has
a query, names are stable kebab-case, SQL strings only reference the
pre-registered views. Pure-Python (no Spark session) so it runs first
and fails fast on a registration typo."""

import re

import __spark_entry__ as E

TABLES = {"region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"}


def test_every_oracle_key_has_a_query():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs), sorted(set(os_) - set(qs))


def test_query_names_are_kebab_case_and_callables():
    qs = E.queries()
    for name, fn in qs.items():
        assert re.fullmatch(r"[a-z0-9]+(-[a-z0-9]+)*", name), name
        assert callable(fn), name


def test_oracle_sql_strings_are_nonempty_and_reference_known_views():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
        sql = re.sub(r"--[^\n]*", "", sql)  # comments aren't relations
        # every FROM/JOIN target must be a registered view or a CTE
        # defined in the same statement (WITH x AS ...)
        ctes = set(re.findall(
            r"(?i)(?:with(?:\s+recursive)?|,)\s*(\w+)\s*(?:\([^)]*\))?\s+as\s*\(",
            sql))
        targets = re.findall(r"(?i)(?:from|join)\s+([a-z_][a-z0-9_]*)", sql)
        for t in targets:
            # 'range' is DuckDB's built-in table function (FROM range(n))
            assert t.lower() in TABLES or t in ctes or t.lower() in (
                "lateral", "range"), f"{name}: unknown relation {t!r}"


def test_entry_callable_exists():
    assert callable(E.entry)
