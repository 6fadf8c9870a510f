"""Local mirror of the driver's correctness gate: run every
``queries()`` entry and compare against ``oracle_sql()`` via DuckDB —
row count, column names, and order-insensitive values (exact string
normalization, stricter than a hash)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

from tests.conftest import requires_testdata

pytestmark = requires_testdata


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def _duck(sf_dir):
    con = duckdb.connect()
    for t in entrymod.DQ.TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, name):
    q = ALL_QUERIES[name]
    df = q(spark, SF_DIR)
    pdf = df.toPandas()
    spark_cols, spark_rows = _normalize(
        list(pdf.columns), pdf.itertuples(index=False, name=None)
    )
    assert len(spark_rows) >= 0  # smoke: query ran
    if name not in ORACLES:
        # rows-only contract: non-empty and stable schema.  As of
        # round 2 every query carries an exact oracle, so this branch
        # should not trigger; it remains for future additions.
        assert len(pdf.columns) > 0
        assert len(spark_rows) > 0, f"{name} returned no rows"
        return
    con = _duck(SF_DIR)
    res = con.sql(ORACLES[name])
    duck_cols, duck_rows = _normalize(res.columns, res.fetchall())
    assert [c.lower() for c in spark_cols] == [c.lower() for c in duck_cols], (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    mism = [
        (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} value mismatches; first 3: {mism[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"subj", "pred", "obj"} <= set(df.columns)
