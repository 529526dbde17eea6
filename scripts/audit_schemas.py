"""Audit every registered query's OUTPUT schema for driver-hostile columns.

The driver canonicalizes compared results through ``pandas.sort_values``
over all columns; a top-level ArrayType (python list) or MapType (dict)
cell is unhashable there and kills the row before any comparison — the
exact failure CORRECTNESS_r04 recorded for ``embedding_quantize_int8``.

This script builds (never executes) each registered query at the schema
probe dir and reports any top-level Array/Map/Struct output column, so
the boundary flattening in ``plans/registry.boundary_cast`` provably
covers the whole registry before a rotation window fires it 37 times.

Run:  python scripts/audit_schemas.py [sf_dir]
Exit: 0 when no registered query leaks an Array/Map column, 1 otherwise.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import types as T  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry_mod
    from orders_currency_conversion_etl_spark.session import get_spark

    spark = get_spark()
    queries = entry_mod.queries()

    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in queries.items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as exc:  # noqa: BLE001 — report, don't abort audit
            errs[name] = f"{type(exc).__name__}: {exc}"
            continue
        hostile = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if hostile:
            bad[name] = hostile

    print(f"audited {len(queries)} registered queries at {sf_dir}")
    if errs:
        print(f"\n{len(errs)} queries failed to build:")
        for name, e in sorted(errs.items()):
            print(f"  {name}: {e}")
    if bad:
        print(f"\n{len(bad)} queries leak Array/Map/Struct output columns:")
        for name, cols in sorted(bad.items()):
            print(f"  {name}: {', '.join(cols)}")
    else:
        print("no Array/Map/Struct output columns anywhere — registry is "
              "driver-canonicalization-safe")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
