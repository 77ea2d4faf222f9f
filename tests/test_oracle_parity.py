"""Every declared query vs its DuckDB oracle — the local replica of the
driver's sf0.01 correctness gate, run at sf0.001 for speed (set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full-fidelity run)."""

from __future__ import annotations

import pytest

from flink_wordcount_spark.oracle import compare
from flink_wordcount_spark.plans import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, name, QUERIES[name], ORACLES.get(name))
    assert ok, f"{name}: {msg}"


def test_all_queries_have_oracle_or_reason():
    missing = sorted(set(QUERIES) - set(ORACLES))
    # rows-only queries must be deliberate; keep the list short and documented
    allowed_rows_only = {n for n in missing if n.startswith(("lsh_", "approx_", "stream_", "mm_"))}
    assert missing == sorted(allowed_rows_only), f"undocumented rows-only queries: {missing}"
