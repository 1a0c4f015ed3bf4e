"""The main correctness gate, run locally: every registered query with
an oracle must match DuckDB exactly (count + schema + values) at the
smoke scale factor — a faithful replica of the driver's t2 check."""

from __future__ import annotations

import pytest

from log2ck_spark.queries import ORACLES, QUERIES, load_all
from tests.oracle_harness import compare, run_oracle

load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare(spark_df, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert df.schema is not None
