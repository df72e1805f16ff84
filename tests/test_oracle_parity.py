"""DuckDB-oracle parity for every SQL✓ operator (mirrors the driver's
CORRECTNESS gate at sf0.001 for speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from glre_spark.operators import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR
from tests.oracle_util import compare, duck_run

_ensure_loaded()
SQL_OPS = sorted(k for k, (_, sql) in REGISTRY.items() if sql is not None)
ROWS_ONLY_OPS = sorted(k for k, (_, sql) in REGISTRY.items() if sql is None)


@pytest.mark.parametrize("name", SQL_OPS)
def test_oracle_parity(spark, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    ddf = duck_run(SF_DIR, sql)
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", [n for n in ROWS_ONLY_OPS if not n.startswith("glre_")])
def test_rows_only_ops_run(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
