"""Driver-contract invariants for __spark_entry__ — the round-3 lesson:
a NameError inside queries() silently zeroes the whole correctness round,
so the dict must BUILD (and stay oracle-complete) under plain pytest,
no Spark session required."""

import __spark_entry__ as entrymod


def test_queries_dict_builds_and_is_callable():
    qs = entrymod.queries()
    assert len(qs) >= 80
    for name, fn in qs.items():
        assert callable(fn), name


def test_every_query_has_an_oracle_and_vice_versa():
    qs = set(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert set(oracles) == qs, (
        set(oracles) ^ qs
    )
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_oracle_sql_is_parseable_by_duckdb():
    """Every oracle must at least PARSE in DuckDB (tables mocked as empty
    views) — catches syntax errors (reserved words, dialect slips) that
    would degrade a query to rows-only at driver time."""
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        sf = "/root/testdata/sf0.001"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet') LIMIT 0"
        )
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as exc:  # pragma: no cover - failure carries name
            raise AssertionError(f"oracle for {name} failed to parse: {exc}")
