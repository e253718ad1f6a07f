"""Driver-contract smoke tests: entry() + registry integrity."""

from __future__ import annotations

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_oracle_key_has_query():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_queries_run_nonempty_sample(spark):
    qs = E.queries()
    for name in ["q1_pricing_summary", "union_mismatched_entities", "text_token_stats",
                 "sim_cosine_topk", "events_sessionize"]:
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, name
