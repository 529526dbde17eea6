"""Scale guards for exactness-baseline operators.

Two registered queries are intentionally non-scalable exactness
baselines (their LSH/IVF twins are the 100 TB path): the O(n²)
pairwise-cosine dedup and the linear-scan brute-force kNN. Nothing in
Catalyst stops a user from pointing them at a billion-row corpus —
they plan as broadcast nested-loop joins, not CartesianProduct, so the
plan lint can't catch it either. This guard does: any invocation above
the row threshold fails fast with a pointer to the scale path, for the
cost of one count() over the (columnar, count-optimized) parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Upper bound for exact all-pairs / linear-scan baselines. Above
#: this, the quadratic candidate space (~5e9 pairs at the limit) stops
#: being "verification baseline" and starts being a cluster-melter.
MAX_EXACT_BASELINE_ROWS = 100_000


class BaselineScaleError(RuntimeError):
    """Raised when an exactness baseline is invoked beyond its bound."""


def assert_baseline_size(df: DataFrame, op: str, scale_path: str) -> DataFrame:
    n = df.count()
    if n > MAX_EXACT_BASELINE_ROWS:
        raise BaselineScaleError(
            f"{op} is an exactness baseline bounded to "
            f"{MAX_EXACT_BASELINE_ROWS} input rows (got {n}); at scale "
            f"use {scale_path} instead"
        )
    return df
