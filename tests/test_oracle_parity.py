"""Run every registered query against its DuckDB oracle — the local
mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query


def _cases():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, name, fn, oracle):
    if oracle is None:
        df = fn(spark, SF_ORACLE)
        assert df.count() >= 0  # rows-only check, mirroring the driver
    else:
        compare_query(spark, SF_ORACLE, fn, oracle)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 8
