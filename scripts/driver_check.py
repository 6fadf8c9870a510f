"""Local, dtype-faithful mirror of the driver's correctness gate.

The driver compares Spark ``toPandas()`` output against DuckDB
``.df()`` output after sorting columns by name — and its value hash is
sensitive to pandas dtypes (a DuckDB HUGEINT materializes as float64
and hash-mismatches a Spark bigint even when the printed values are
equal).  The pytest harness (tests/test_driver_contract.py) normalizes
through ``str`` and misses that class of bug; this script does not.

Usage: python scripts/driver_check.py [sf_dir] [query ...]
  default sf_dir /root/testdata/sf0.01, default = all oracle queries.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from face_hunter_spark.session import build_session  # noqa: E402


def norm_cell(v):
    """Dtype-preserving normalization: floats round to 9 places but keep
    their float-ness; ints stay ints.  int64 vs float64 therefore
    mismatch, like the driver's hash."""
    if v is None:
        return None
    import numpy as np

    if isinstance(v, (np.floating, float)):
        f = float(v)
        return ("f", "NaN" if math.isnan(f) else repr(round(f, 9)))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return ("i", int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("l", tuple(norm_cell(x) for x in v))
    return ("s", str(v))


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i].lower() for i in order], out


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        args = args[1:]

    oracles = entrymod.oracle_sql()
    all_q = entrymod.queries()
    names = args or sorted(all_q)

    spark = build_session(
        app_name="driver-check", master="local[8]", shuffle_partitions=16
    )
    con = duckdb.connect()
    for t in entrymod.DQ.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name in names:
        pdf = all_q[name](spark, sf_dir).toPandas()
        s_cols, s_rows = normalize(
            list(pdf.columns), list(pdf.itertuples(index=False, name=None))
        )
        if name not in oracles:
            print(f"{name:32s} rows-only  spark_rows={len(s_rows)}")
            continue
        res = con.sql(oracles[name])
        ddf = res.df()
        d_cols, d_rows = normalize(
            list(ddf.columns), list(ddf.itertuples(index=False, name=None))
        )
        ok_cols = s_cols == d_cols
        ok_rows = len(s_rows) == len(d_rows)
        mism = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ] if ok_rows else []
        ok = ok_cols and ok_rows and not mism
        status = "OK " if ok else "FAIL"
        print(f"{name:32s} {status} rows={len(s_rows)}/{len(d_rows)}"
              + ("" if ok_cols else f" cols {s_cols} vs {d_cols}")
              + (f" first-mismatch: {mism[0]}" if mism else ""))
        failures += 0 if ok else 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
