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


def test_bench_and_scale_headline_names_resolve():
    """Every name bench.py and tools/scale_bench.py time must exist in
    queries() — a renamed/removed query must fail HERE, not as a silent
    skip (bench's qs.get(name) tolerates misses) or a driver-time error."""
    import importlib.util
    import os

    qs = set(entrymod.queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def load(path, name):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    bench = load(os.path.join(root, "bench.py"), "bench_contract_check")
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench.HEADLINE names not in queries(): {missing}"

    scale = load(
        os.path.join(root, "tools", "scale_bench.py"), "scale_contract_check"
    )
    missing = [n for n in scale.QUERIES if n not in qs]
    assert not missing, f"scale_bench.QUERIES names not in queries(): {missing}"
