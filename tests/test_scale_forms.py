"""100-TB scale variants of the three single-partition-window queries
(round-4 verdict item 3).

Each graded query keeps its exact window form as the oracle spec; the
scale form must (a) produce an equivalent result within its documented
tolerance on the fixture and (b) carry a plan with NO per-language
Window (the defect being fixed: ntile/rank/running-sum over
partitionBy(lang) sorts a whole language inside one task at web
scale)."""

import pandas as pd
import pytest

from crawler_spark.plans.queries_docs import (
    SEQ_LEN,
    doc_fluency_buckets,
    doc_mix_rebalance,
    doc_sequence_packing,
)

SF = "/root/testdata/sf0.001"


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# --------------------------------------------------------------- fluency

def test_fluency_buckets_scale_form_agrees(spark):
    exact = doc_fluency_buckets(spark, SF).toPandas().set_index("doc_id")
    scale = doc_fluency_buckets(spark, SF, scale_form=True).toPandas().set_index("doc_id")
    assert set(exact.index) == set(scale.index)
    scale = scale.loc[exact.index]
    # fluency values identical (same upstream model); buckets may differ
    # only at tercile edges (sketch error + tie handling)
    pd.testing.assert_series_equal(exact["fluency"], scale["fluency"])
    agree = (exact["bucket"] == scale["bucket"]).mean()
    assert agree >= 0.95, f"bucket agreement {agree:.3f} < 0.95"
    # every (lang, bucket) cell within 15% of the exact tercile size
    ce = exact.groupby(["lang", "bucket"]).size()
    cs = scale.groupby(["lang", "bucket"]).size()
    for key, n_exact in ce.items():
        n_scale = cs.get(key, 0)
        assert abs(n_scale - n_exact) <= max(2, 0.15 * n_exact), (key, n_exact, n_scale)


def test_fluency_buckets_scale_form_is_window_free(spark):
    plan = _optimized_plan(doc_fluency_buckets(spark, SF, scale_form=True))
    # the bucket assignment itself must be stateless; the only Window
    # allowed would be none at all
    assert "Window" not in plan, plan


# --------------------------------------------------------------- packing

def test_sequence_packing_sharded_is_exact_per_stratum(spark):
    k = 4
    out = doc_sequence_packing(spark, SF, n_shards=k).toPandas()
    base = doc_sequence_packing(spark, SF).toPandas()
    # same universe of docs, same token counts
    assert set(out["doc_id"]) == set(base["doc_id"])
    merged = out.merge(base[["doc_id", "n_tokens"]], on="doc_id", suffixes=("", "_b"))
    assert (merged["n_tokens"] == merged["n_tokens_b"]).all()
    assert out["shard"].between(0, k - 1).all()
    assert out["seq_offset"].between(0, SEQ_LEN - 1).all()
    # recompute every stratum's prefix sum in pandas: the sharded form
    # must be the EXACT packing of its own stratum's stream
    for (_, _), g in out.groupby(["lang", "shard"]):
        g = g.sort_values("doc_id").reset_index(drop=True)
        start = g["n_tokens"].cumsum().shift(1, fill_value=0)
        assert (g["seq_id"] == start // SEQ_LEN).all()
        assert (g["seq_offset"] == start % SEQ_LEN).all()


def test_sequence_packing_shard_window_keyed_by_shard(spark):
    plan = _optimized_plan(doc_sequence_packing(spark, SF, n_shards=4))
    # the running-sum window must partition by (lang, shard) — the shard
    # key appearing in the Window spec is what breaks the per-language
    # single partition
    assert "windowspecdefinition(lang" in plan and "shard" in plan.split(
        "windowspecdefinition", 1
    )[1].split(")", 1)[0], plan


# ------------------------------------------------------------- rebalance

def test_mix_rebalance_scale_form_counts_and_determinism(spark):
    exact = doc_mix_rebalance(spark, SF).toPandas()
    m = exact.groupby("lang").size()
    assert m.nunique() == 1  # the exact form's contract
    m = int(m.iloc[0])
    scale = doc_mix_rebalance(spark, SF, scale_form=True).toPandas()
    counts = scale.groupby("lang").size()
    for lang, n in counts.items():
        # binomial noise around m: 4 sigma + slack for tiny fixtures
        tol = max(4, 4 * (m ** 0.5))
        assert abs(n - m) <= tol, (lang, n, m)
    # the minimum language keeps everything (fraction 1)
    import duckdb

    full = duckdb.sql(
        f"SELECT lang, count(*) n FROM '{SF}/documents.parquet' GROUP BY lang"
    ).df()
    min_lang = full.sort_values(["n", "lang"]).iloc[0]["lang"]
    assert counts[min_lang] == m
    # deterministic: a second run selects the identical row set
    again = doc_mix_rebalance(spark, SF, scale_form=True).toPandas()
    pd.testing.assert_frame_equal(
        scale.sort_values(["lang", "doc_id"]).reset_index(drop=True),
        again.sort_values(["lang", "doc_id"]).reset_index(drop=True),
    )


def test_mix_rebalance_scale_form_is_window_free(spark):
    plan = _optimized_plan(doc_mix_rebalance(spark, SF, scale_form=True))
    # one Window remains upstream (the broadcast min-over-counts on the
    # TINY per-lang counts table — bounded cardinality); the row-level
    # path must not sort documents. Assert no row_number over documents:
    assert "row_number" not in plan, plan
