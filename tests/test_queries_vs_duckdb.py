"""Oracle parity: every registry query vs its DuckDB SQL at sf0.001.

Mirrors the driver's CORRECTNESS check (row count + schema-insensitive
sorted-value comparison) so a drift between the Spark formulation and
the SQL oracle fails HERE first, not in the graded run.
"""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _registry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    return entry


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _compare(name, spark_df, duck_df):
    a = _norm(spark_df)
    b = _norm(duck_df)
    assert list(a.columns) == list(b.columns), (name, list(a.columns), list(b.columns))
    assert len(a) == len(b), (name, len(a), len(b))
    for c in a.columns:
        av, bv = a[c], b[c]
        # dtype-strict: the driver's value-hash is dtype-sensitive, so an
        # int64-vs-float64 drift (e.g. DuckDB HUGEINT sums) must fail here.
        assert av.dtype.kind == bv.dtype.kind, (name, c, av.dtype, bv.dtype)
        if av.dtype.kind in "iu":
            # integer WIDTH too (round 5: doc_unicode_clean shipped int32
            # vs the oracle's int64 and the kind check let it through)
            assert str(av.dtype) == str(bv.dtype), (name, c, av.dtype, bv.dtype)
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~((av - bv).abs() < 1e-9) & ~(av.isna() & bv.isna())
        else:
            bad = av.astype(str) != bv.astype(str)
        assert not bad.any(), (
            name, c,
            a[bad].head(3).to_dict("records"),
            b[bad].head(3).to_dict("records"),
        )


def _query_names():
    e = _registry()
    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    e = _registry()
    spark_df = e.queries()[name](spark, SF_DIR).toPandas()
    duck_df = duck.execute(e.oracle_sql()[name]).df()
    assert len(spark_df) > 0, f"{name}: empty result"
    _compare(name, spark_df, duck_df)


def test_every_query_has_an_oracle():
    """Round 2 closed the last no-oracle rows (crawl_wave_loop via the
    golden fixture, ann_ivf_label_cells via the centroid SQL): every
    queries() entry must stay fully hash-gradable."""
    e = _registry()
    assert set(e.queries()) - set(e.oracle_sql()) == set()
