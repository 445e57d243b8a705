"""Driver-contract smoke: entry() runs, queries() have matching oracles."""

import __spark_entry__ as entrymod


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 15
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"template_id", "lang", "n_docs"}


def test_each_query_runs_at_smoke_scale(spark):
    sf = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf)
        assert df.count() >= 0, name
