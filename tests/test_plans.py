"""Plan-quality audits: the optimizations we rely on must be visible in
the physical plan, not assumed (predicate pushdown into parquet scans,
broadcast joins for dimension/config tables, whole-stage codegen)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_tpch_q1_pushdown_and_pruning(spark):
    from crawler_spark.plans.queries import QUERIES

    df = QUERIES["tpch_q1_pricing_summary"].fn(spark, SF)
    plan = _plan(df)
    # the shipdate filter must reach the parquet scan
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: untouched lineitem columns must not be read
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    assert "l_quantity" in read_schema


def test_tpch_q3_broadcasts_dimension(spark):
    from crawler_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["tpch_q3_shipping_priority"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan  # customer side is broadcast


def test_provenance_join_is_broadcast(spark):
    from crawler_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["provenance_enrichment"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_whole_stage_codegen_on_scalar_pipeline(spark):
    from crawler_spark.plans.queries import QUERIES

    df = QUERIES["url_canonicalize"].fn(spark, SF)
    df.collect()  # AQE: codegen stages only appear in the FINAL plan
    plan = _plan(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in the tree string
    assert "isFinalPlan=true" in plan and "*(1)" in plan


def test_dedup_gate_is_left_anti(spark):
    from crawler_spark.operators import dedup as dd

    seen = spark.createDataFrame([("a", 1)], "canon string, url_hash long")
    cand = spark.createDataFrame([("a", 1), ("b", 2)], "canon string, url_hash long")
    plan = _optimized(dd.filter_new(cand, seen, None))
    assert "LeftAnti" in plan


def test_bloom_probe_single_join_no_python(spark):
    """The probe path must be one join + codegen bit test — no
    BatchEvalPython / ArrowEvalPython stages (the dedup hot path stays
    JVM-side; SURVEY §4.2)."""
    from crawler_spark.operators import dedup as dd

    n_shards, m_bits = 4, 1 << 12
    keys = spark.range(100).select(F.xxhash64("id").alias("url_hash"))
    shards = dd.update_shards(dd.empty_shards(spark, n_shards, m_bits), keys, n_shards, m_bits)
    blobs = dd.densify(shards, m_bits).localCheckpoint()
    cand = spark.range(50).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").cast("string").alias("canon")
    )
    plan = _plan(dd.probe_shards(cand, blobs, n_shards, m_bits))
    assert "EvalPython" not in plan  # neither Batch- nor ArrowEvalPython
    # sparse update plan is also pure JVM
    uplan = _plan(dd.update_shards(shards, keys, n_shards, m_bits))
    assert "EvalPython" not in uplan


def test_partitioned_items_sink_prunes(spark, tmp_path):
    from crawler_spark.sources.sinks import write_items_partitioned

    rows = [(f"https://h/{i}", f"s{i%2}", "t", "2024-06-0" + str(1 + i % 3), "p", 1)
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "url string, source string, title string, publish_time string, province string, wave int"
    )
    out = str(tmp_path / "pq")
    write_items_partitioned(df, out)
    back = spark.read.parquet(out).filter("source = 's0' AND publish_date = DATE '2024-06-01'")
    plan = _plan(back)
    # partition filters must appear as PartitionFilters, not data filters
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:220]
    assert "source" in seg and "publish_date" in seg


def test_ann_topk_is_take_ordered_not_global_window(spark):
    """brute_force_topk must plan the top-k as TakeOrderedAndProject
    (per-partition partial top-k, driver merge) — NOT a global
    unpartitioned Window over the full scored table, which funnels every
    row through one task and dies at 10^9 vectors. The only Window
    allowed is the rank() over the k-row result of the limit."""
    from crawler_spark.operators.similarity import brute_force_topk

    e = spark.range(1000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.rand(seed=i) * 2 - 1) for i in range(8)]).alias("embedding"),
    )
    df = brute_force_topk(e, [0.1] * 8, k=5)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    # the Window (rank over k rows) must sit ABOVE the TakeOrdered — i.e.
    # the scored table itself must never flow into a Window.
    w_pos = plan.find("Window")
    t_pos = plan.find("TakeOrderedAndProject")
    assert w_pos == -1 or w_pos < t_pos  # tree prints top-down


def test_bloom_probe_broadcasts_small_blobs(spark):
    """The dense-blob probe side comes out of an applyInPandas (opaque
    stats), so without the explicit hint Catalyst picks a sort-merge
    join and re-shuffles every candidate by shard. When the whole
    filter is broadcast-sized the probe must be a broadcast hash join —
    a narrow stage over the candidates."""
    from crawler_spark.operators import dedup as dd

    n_shards, m_bits = 4, 1 << 12
    keys = spark.range(100).select(F.xxhash64("id").alias("url_hash"))
    shards = dd.update_shards(dd.empty_shards(spark, n_shards, m_bits), keys, n_shards, m_bits)
    blobs = dd.densify(shards, m_bits).localCheckpoint()
    cand = spark.range(50).select(
        F.xxhash64("id").alias("url_hash"), F.col("id").cast("string").alias("canon")
    )
    plan = _plan(dd.probe_shards(cand, blobs, n_shards, m_bits))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_checkpointed_private_api_pinned(spark):
    """_checkpointed (engine/driver.py) reaches into PySpark internals
    (``_jdf``, ``internalCreateDataFrame``) to rebuild a checkpointed
    DataFrame with FRESH default plan statistics — localCheckpoint alone
    inherits the parent plan's sizeInBytes, which compounds
    geometrically across crawl waves. Pin both assumptions so a PySpark
    upgrade fails HERE, not three hours into a crawl."""
    from crawler_spark.engine.driver import _checkpointed

    # the private entry point the rebuild depends on
    assert hasattr(spark._jsparkSession, "internalCreateDataFrame")

    big = spark.range(0, 2000).crossJoin(spark.range(0, 50))
    inherited = int(
        big.localCheckpoint(eager=True)
        ._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    reb = _checkpointed(big)
    rebuilt = int(
        reb._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    default = int(
        spark._jsparkSession.sessionState().conf().defaultSizeInBytes()
    )
    # data and schema survive the rebuild
    assert reb.count() == 2000 * 50
    assert reb.schema == big.schema
    # the rebuilt plan carries the session-default leaf statistic, NOT
    # the inherited (product-of-children) one
    assert rebuilt == default
    assert inherited != default  # the pathology _checkpointed exists for


def test_acc_collapse_bounds_plan_growth(spark):
    """A 200-wave crawl accumulates one output branch per wave; the
    _Acc collapse must keep the FINAL union's leaf count O(waves/every),
    so planning cost stays flat over arbitrarily long crawls."""
    from crawler_spark.engine.driver import _Acc
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    acc = _Acc(spark, schema, every=8)
    for i in range(200):
        acc.add(spark.createDataFrame([(i,)], schema))
    out = acc.result()
    assert out.count() == 200
    leaves = out._jdf.queryExecution().analyzed().toString().count("LogicalRDD")
    # 200/8 = 25 collapsed chunks + <8 tail branches, not 200
    assert leaves <= 33


def test_observation_fires_under_local_checkpoint(spark):
    """The wave loop piggybacks its per-wave counts on the checkpoint
    action via observe() — zero extra jobs. That relies on
    localCheckpoint materialization routing through the observed plan's
    CollectMetrics node. Pin it (including the empty-input edge) so a
    PySpark behavior change fails HERE, not as a wedged crawl waiting
    on Observation.get."""
    import threading

    from pyspark.sql import Observation

    from crawler_spark.engine.driver import _checkpointed

    def observed_counts(df, *exprs, timeout=30.0):
        obs = Observation()
        _checkpointed(df.observe(obs, *exprs))
        out: dict = {}
        th = threading.Thread(target=lambda: out.update(obs.get))
        th.start()
        th.join(timeout=timeout)
        assert out, "Observation never fired under localCheckpoint"
        return out

    got = observed_counts(
        spark.range(1000),
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("id") % 2 == 0).cast("long")).alias("even"),
    )
    assert got == {"n": 1000, "even": 500}

    # empty-but-partitioned (the exhausted-wave new_frontier shape):
    # count must come back 0, sum None — never hang
    got = observed_counts(
        spark.range(1000).filter(F.col("id") < 0).coalesce(4),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("id")).alias("s"),
    )
    assert got["n"] == 0 and got["s"] is None


def test_top_bigrams_topk_is_take_ordered(spark):
    """doc_top_bigrams' top-20 must plan as TakeOrderedAndProject over
    the partial-aggregated counts — a global sort (range-partition
    Exchange) of the full bigram table would shuffle every distinct
    bigram at corpus scale just to keep 20 rows."""
    import crawler_spark.plans.queries_docs  # noqa: F401  (registers)
    from crawler_spark.plans.queries import QUERIES

    df = QUERIES["doc_top_bigrams"].fn(spark, SF)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_stratified_sample_is_shuffle_free(spark):
    """The md5-threshold sample must stay a scan+filter: no Exchange
    below the final orderBy (the keep rule is a pure row-local
    function of doc_id and lang)."""
    import crawler_spark.plans.queries_docs  # noqa: F401  (registers)
    from crawler_spark.plans.queries import QUERIES

    df = QUERIES["doc_stratified_sample"].fn(spark, SF)
    # strip the presentation orderBy: the operator itself is the filter
    inner = df.drop("sample_key")._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in inner and "Aggregate" not in inner


def test_repetition_and_pii_are_shuffle_free_jvm_side(spark):
    """doc_token_repetition and doc_pii_scrub are per-row HOF/regex
    work: the optimized plan below the presentation orderBy must carry
    no Join/Aggregate, and no Python eval node may appear — at 100 TB
    both are embarrassingly parallel codegen scans."""
    import crawler_spark.plans.queries_docs  # noqa: F401  (registers)
    from crawler_spark.plans.queries import QUERIES

    for name in ("doc_token_repetition", "doc_pii_scrub"):
        df = QUERIES[name].fn(spark, SF)
        opt = _optimized(df)
        assert "Join" not in opt and "Aggregate" not in opt, name
        plan = _plan(df)
        assert "EvalPython" not in plan, name


def test_decontaminate_broadcasts_eval_shingles(spark):
    """doc_decontaminate's train-vs-eval shingle join must be a
    BroadcastHashJoin (eval slices are tiny vs the corpus); a
    SortMergeJoin would shuffle every training shingle."""
    import crawler_spark.plans.queries_docs  # noqa: F401  (registers)
    from crawler_spark.plans.queries import QUERIES

    plan = _plan(QUERIES["doc_decontaminate"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_is_union_window_no_join(spark):
    """The as-of operator must compile to the union-window plan: zero
    join operators and exactly ONE hash-partitioning Exchange (the key
    shuffle feeding the Window). A per-left-row probe join (lateral /
    nested-loop) would be quadratic at web scale."""
    from crawler_spark.plans.queries import QUERIES

    df = QUERIES["events_asof_join"].fn(spark, SF)
    plan = _plan(df)
    assert "Join" not in plan, plan
    assert plan.lower().count("hashpartitioning") == 1, plan
    assert "Window" in plan


def test_interval_join_is_equi_bin_not_nested_loop(spark):
    """The range join must go through the bin-key equi-join — a raw
    time-inequality join plans as BroadcastNestedLoopJoin, which is the
    quadratic scale-killer this operator exists to avoid."""
    from crawler_spark.plans.queries import QUERIES

    df = QUERIES["events_interval_join"].fn(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "_bin" in plan  # the quantized equi key is the join key


def test_dup_kgram_has_no_self_join_on_docs(spark):
    """Exact-substring dedup must stay linear: gram aggregation + semi
    join. No cartesian/nested-loop operator may appear — the family
    has no all-pairs stage by construction."""
    import crawler_spark.plans.queries_docs  # noqa: F401  (registers)
    from crawler_spark.plans.queries import QUERIES

    df = QUERIES["doc_dup_kgram_windows"].fn(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmv_sketch_is_take_ordered(spark):
    """The k-smallest-hash pass of the KMV sketch must plan as
    TakeOrderedAndProject (per-partition partial top-k) — a global sort
    of all distinct hashes defeats the point of a sketch at 10^10
    keys."""
    from crawler_spark.plans.queries_graph import events_distinct_kmv

    plan = _plan(events_distinct_kmv(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_pagerank_no_nested_loop_joins(spark):
    """Every per-iteration join in the PageRank plan must be an
    equi-join (broadcast or shuffled hash/SMJ on src/dst) — a
    BroadcastNestedLoopJoin/CartesianProduct anywhere means an O(N·E)
    stage that cannot survive a real graph."""
    from crawler_spark.plans.queries_graph import docs_link_pagerank

    plan = _plan(docs_link_pagerank(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_chunk_dedup_single_dedup_shuffle_jvm_side(spark):
    """Chunk-level dedup must stay entirely JVM-side (tokenize, slice,
    window, regroup are all Catalyst) and key its dedup shuffle on the
    chunk — no Python eval, no nested-loop join anywhere."""
    from crawler_spark.plans.queries_docs import doc_chunk_dedup

    plan = _plan(doc_chunk_dedup(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bigram_fluency_jvm_side_equi_joins_only(spark):
    """The bigram-LM fluency filter must stay entirely JVM-side and join
    the model count tables on their natural keys as EQUI joins — the
    join strategy (broadcast here at sf0.001, shuffle at web scale) is
    Catalyst's stats-driven call, but a nested-loop/cartesian candidate
    generator must never appear. The only nested-loop allowed is the
    1-row vocab-scalar cross join."""
    from crawler_spark.plans.queries_docs import doc_bigram_fluency

    plan = _plan(doc_bigram_fluency(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the c12/c1 model joins are hash equi-joins
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    # at most one nested-loop: the broadcast of the 1-row vocab scalar
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_tfidf_jvm_side_df_join_keyed(spark):
    """TF-IDF: document-frequency table joined on the term key as a hash
    equi-join (strategy is stats-driven: broadcast at sf0.001, shuffle
    at web scale), per-doc top-3 via a doc-partitioned window; all
    JVM-side; the only nested-loop is the 1-row N-scalar cross join."""
    from crawler_spark.plans.queries_docs import doc_tfidf_top_terms

    plan = _plan(doc_tfidf_top_terms(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    # the top-3 window is partitioned by doc_id (never a global window)
    assert "row_number()" in plan and "windowspecdefinition(doc_id" in plan


def test_fluency_buckets_window_partitioned_by_lang(spark):
    """The CCNet tercile split must be a lang-partitioned ntile window
    (never a global sort) on top of the fluency plan's equi-joins; all
    JVM-side; the only nested-loop is the 1-row vocab-scalar cross
    join inherited from the fluency model."""
    from crawler_spark.plans.queries_docs import doc_fluency_buckets

    plan = _plan(doc_fluency_buckets(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "ntile(3)" in plan and "windowspecdefinition(lang" in plan


def test_domain_reputation_keyed_shuffles_no_nested_loop(spark):
    """Domain reputation: the dup-count join keys on the md5 hash and
    the rollup groups by source — both keyed exchanges; no window, no
    nested-loop/cartesian, no Python anywhere."""
    from crawler_spark.plans.queries_docs import doc_domain_reputation

    plan = _plan(doc_domain_reputation(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "Window" not in plan


def test_lsh_exact_verify_semi_prunes_candidates(spark):
    """The exact-verify stage must fetch shingle sets only for docs in
    a candidate pair: a left-semi join prunes the documents scan before
    the (expensive) shingle-hash projection, and the pair joins are
    hash equi-joins on the id key. The minhash signature pass is the
    one Arrow stage; no row-at-a-time Python, no cartesian."""
    from crawler_spark.plans.queries_docs import dedup_lsh_exact_verify

    plan = _plan(dedup_lsh_exact_verify(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_simhash_pairs_band_equi_join_no_cartesian(spark):
    """SimHash pairing must meet candidates in a (band, byte) hash
    equi-join — never a nested-loop/cartesian all-pairs stage; the
    signature pass is the one Arrow stage."""
    from crawler_spark.plans.queries_docs import dedup_simhash_pairs

    plan = _plan(dedup_simhash_pairs(spark, "/root/testdata/sf0.001"))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_vocab_oov_topk_is_take_ordered_and_broadcast_probe(spark):
    """The top-1000 vocab must be a TakeOrderedAndProject (partial
    per-partition top-k, no global sort) and the membership probe must
    broadcast the k-bounded vocab; all JVM-side."""
    from crawler_spark.plans.queries_docs import doc_vocab_oov_rate

    plan = _plan(doc_vocab_oov_rate(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_gopher_filter_is_pure_projection(spark):
    """The Gopher rule gate must be one Catalyst projection over the
    scan — no Python eval, no join, no aggregation exchange (the only
    exchange is the final presentation sort)."""
    from crawler_spark.plans.queries_docs import doc_gopher_quality_filter

    plan = _plan(doc_gopher_quality_filter(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_snapshot_delta_joins_digests_not_text(spark):
    """The recrawl diff must full-outer-join on doc_id carrying only
    md5 digests — the text column must not survive into the join
    (project-before-shuffle), and no nested-loop stage may appear."""
    from crawler_spark.plans.queries_docs import crawl_snapshot_delta

    df = crawl_snapshot_delta(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    # the join itself sees (doc_id, hash) pairs only
    import re
    joins = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln]
    assert joins and all("text" not in ln for ln in joins)


def test_scalar_quantize_broadcasts_dim_stats(spark):
    """int8 quantization: the per-dim min/max stats table is dim-bounded
    and must broadcast to the quantization projection (never a shuffled
    join of the exploded rows against the stats)."""
    from crawler_spark.plans.queries_docs import embedding_scalar_quantize

    plan = _plan(embedding_scalar_quantize(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    assert "Generate" in plan  # posexplode stays JVM-side


def test_incremental_gate_is_asymmetric_equi_join(spark):
    """The incremental dedup gate must meet new-vs-old candidates in a
    bucket hash equi-join (no cartesian/nested-loop), and the signature
    passes are the only Arrow stages."""
    from crawler_spark.plans.queries_docs import dedup_incremental_lsh_gate

    plan = _plan(dedup_incremental_lsh_gate(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_cms_sketch_broadcasts_to_probe(spark):
    """The 4x512 CMS table must broadcast to the heavy-hitter probe, the
    top-20 must be TakeOrderedAndProject, and no Python eval appears."""
    from crawler_spark.plans.queries_docs import doc_cms_heavy_hitters

    plan = _plan(doc_cms_heavy_hitters(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_is_scan_filter(spark):
    """Quality-weighted sampling must stay a shuffle-free scan+filter
    (pure function of doc_id and text; no join, no aggregation)."""
    from crawler_spark.plans.queries_docs import doc_weighted_sample

    plan = _plan(doc_weighted_sample(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_bpe_pairs_topk_take_ordered_jvm_side(spark):
    """BPE pair counting must stay JVM-side (explode+substr in codegen),
    aggregate with partial (map-side) combine on the pair key, and take
    the top-20 via TakeOrderedAndProject — never a global sort."""
    from crawler_spark.plans.queries_quality import doc_bpe_pair_stats

    plan = _plan(doc_bpe_pair_stats(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the pair shuffle


def test_line_dedup_single_line_shuffle_no_python(spark):
    """Line dedup must shuffle on the line string only (one groupBy for
    first-owner, one doc-level agg) with no Python eval and no
    nested-loop join anywhere."""
    from crawler_spark.plans.queries_quality import doc_line_dedup

    plan = _plan(doc_line_dedup(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_degree_no_cartesian_keyed_joins_only(spark):
    """Reciprocity is a composite-key equi-self-join; the plan must not
    contain a cartesian or nested-loop join."""
    from crawler_spark.plans.queries_quality import docs_host_degree_stats

    plan = _plan(docs_host_degree_stats(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_triangles_equi_joins_only(spark):
    """Wedge and closure joins must be hash/sort-merge equi-joins — a
    cartesian or nested-loop join here would be quadratic in edges."""
    from crawler_spark.plans.queries_quality import docs_graph_triangles

    plan = _plan(docs_graph_triangles(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_heldout_bigram_model_never_broadcast_joins_on_keys(spark):
    """The train-split bigram model joins the valid bigrams on natural
    keys (w1, w2) / (w1); only the 1-row vocab scalar broadcasts and no
    Python eval appears."""
    from crawler_spark.plans.queries_quality import doc_heldout_bigram_score

    plan = _plan(doc_heldout_bigram_score(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_norm_stats_array_fold_no_explode(spark):
    """The squared norm folds INSIDE the array column: the plan must
    contain no Generate (explode) node — per-element rows never exist —
    no Python eval, and only the bounded (label, norm_bits) aggregate
    may shuffle."""
    from crawler_spark.plans.queries_pipeline import embedding_norm_stats

    plan = _plan(embedding_norm_stats(spark, "/root/testdata/sf0.001"))
    assert "Generate" not in plan  # no posexplode — fold stays in-array
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
