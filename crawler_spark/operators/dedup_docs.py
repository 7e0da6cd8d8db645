"""Corpus-level document deduplication — the training-data families.

Five dedup families over a documents table (doc_id, text, ...), each
expressed shuffle-consciously:

- exact:      one groupBy on md5(text) — map-side partial agg, single
              shuffle on the hash (never on the text bytes).
- minhash:    shingle → 8 poly-hash minhashes (JVM-side array algebra,
              functions/text.py) → LSH banding (4 bands × 2 rows) →
              candidate pairs meet in a band-bucket shuffle — the join
              is on (band, bucket-hash), never all-pairs.
- simhash:    32-bit signature; near-dup pairs = equal signature or
              banded 8-bit chunks + hamming filter.
- ngram jaccard: exact verify for candidate pairs — shingle-inverted
              index join, intersection counts by groupBy(pair), union
              by |A|+|B|-∩.
- embedding:  cosine near-dup via cell-bucketed self-join (bucket =
              coarse cell; within-bucket pairs only).

All-pairs work never materializes: every family generates candidates
through an equi-join key (hash bucket / band / cell). That is the
property that survives 100×  scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as X


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_md5, n_copies, keep_id): canonical-representative choice is
    min(id) — deterministic."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """(id, mh0..mh7) for docs with ≥k tokens — zero shuffles.

    Computed by the Arrow fast path (numpy, functions/text_fast.py);
    bit-identical to the Catalyst spec formulation of functions/text.py
    (parity-tested), ~30x faster because Spark HOFs are interpreted."""
    from ..functions.text_fast import minhash8_fast

    out = docs.select(F.col(id_col), minhash8_fast(F.col(text_col)).alias("mh"))
    out = out.filter(F.col("mh").isNotNull())
    cols = [F.element_at("mh", i + 1).alias(f"mh{i}") for i in range(8)]
    return out.select(id_col, *cols)


LSH_MAX_BUCKET = 1000  # hot-bucket cap, mirrored engine <-> oracle


def _band_buckets(sigs: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """Unpivot (id, mh0..mh{bands*rows-1}) to one row per band with a
    band-prefixed bucket key ('b_mhX_mhY'); shared by the self-join and
    incremental LSH paths so the banding spec cannot drift."""
    band_keys = [
        F.concat_ws("_", F.lit(b), *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    keyed = sigs.select(id_col, *[F.col(f"mh{i}") for i in range(bands * rows)], *band_keys)
    return keyed.unpivot(
        [id_col] + [f"mh{i}" for i in range(bands * rows)],
        [f"band{b}" for b in range(bands)],
        "band", "bucket",
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        bands: int = 4, rows: int = 2,
                        max_bucket: int | None = LSH_MAX_BUCKET) -> DataFrame:
    """(id_a < id_b, est_jaccard): pairs sharing ≥1 of `bands` band
    buckets; est_jaccard = matching minhashes / 8.

    ``max_bucket`` drops band buckets whose membership exceeds the cap
    BEFORE the self-join — a degenerate bucket (mass-duplicated
    boilerplate: m identical docs all land in the same (band, minhash)
    key) otherwise makes ``a.join(b, "bucket")`` quadratic in that one
    key: m=10^6 members → 10^12 pairs in a single shuffle partition.
    Members of a dropped bucket still pair through any of their other
    ``bands-1`` cold buckets; a bucket shared by more than
    ``max_bucket`` docs is boilerplate, not near-dup signal — the same
    argument as ``max_df`` in :func:`ngram_jaccard_pairs`. The SQL
    oracle mirrors the cap (QUALIFY over the bucket key). Set the
    ``CRAWLER_SPARK_VERBOSE`` env var to log dropped buckets (the count
    is an extra action, so it is not computed silently in benches)."""
    bucketed = _band_buckets(sigs, id_col, bands, rows)
    if max_bucket is not None:
        hot = bucketed.groupBy("bucket").agg(F.count("*").alias("members")).filter(
            F.col("members") > max_bucket
        )
        import os
        if os.environ.get("CRAWLER_SPARK_VERBOSE"):
            for r in hot.collect():
                print(f"[lsh] dropping hot bucket {r['bucket']} "
                      f"({r['members']} members > cap {max_bucket})", flush=True)
        # anti-join on the bucket key; the hot side is tiny (degenerate
        # buckets only) — AQE broadcasts it.
        bucketed = bucketed.join(hot.select("bucket"), "bucket", "left_anti")
    a = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(bands * rows)],
    )
    b = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(bands * rows)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(bands * rows)
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(matches / F.lit(float(bands * rows)), 6).alias("est_jaccard"))
        .dropDuplicates(["id_a", "id_b"])
    )


def lsh_incremental_matches(new_sigs: DataFrame, old_sigs: DataFrame,
                            id_col: str = "doc_id", bands: int = 4,
                            rows: int = 2, threshold: float = 0.5,
                            max_bucket: int | None = LSH_MAX_BUCKET
                            ) -> DataFrame:
    """(doc_id, dup_of, est_jaccard): for each NEW doc, the minimum old
    doc id sharing >=1 band bucket with est_jaccard >= threshold — the
    production incremental-dedup shape: a batch of new documents is
    probed against the existing corpus's LSH index, never self-joined.

    Scale shape: the old side IS the persisted band-bucket index (at
    100 TB it is bucketed-by-bucket on disk and only re-read, never
    rebuilt); the join is new-bands x old-bands on the bucket key, so
    cost is proportional to the NEW batch, not the corpus. The hot-
    bucket cap applies to the index side (a degenerate bucket with
    > max_bucket existing members is boilerplate, not near-dup signal),
    mirrored in the oracle. New docs with no qualifying match — or too
    short to shingle — simply do not appear; the query layer left-joins
    them back as is_dup=0."""
    bnew = _band_buckets(new_sigs, id_col, bands, rows)
    bold = _band_buckets(old_sigs, id_col, bands, rows)
    if max_bucket is not None:
        hot = (
            bold.groupBy("bucket").agg(F.count("*").alias("members"))
            .filter(F.col("members") > max_bucket)
        )
        bold = bold.join(hot.select("bucket"), "bucket", "left_anti")
    n = bnew.select(
        "bucket", F.col(id_col).alias("new_id"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(bands * rows)],
    )
    o = bold.select(
        "bucket", F.col(id_col).alias("old_id"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(bands * rows)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(bands * rows)
    )
    pairs = (
        n.join(o, "bucket")
        .select(
            "new_id", "old_id",
            F.round(matches / F.lit(float(bands * rows)), 6).alias("est"),
        )
        .filter(F.col("est") >= threshold)
    )
    # arg-min on old_id: ties in est are irrelevant (est is a pure
    # function of the two signatures, so duplicate band hits agree)
    best = pairs.groupBy("new_id").agg(
        F.min(F.struct("old_id", "est")).alias("m")
    )
    return best.select(
        F.col("new_id").alias(id_col),
        F.col("m.old_id").alias("dup_of"),
        F.col("m.est").alias("est_jaccard"),
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = 1000,
                        pair_budget: int | None = 20_000_000) -> DataFrame:
    """Exact Jaccard over distinct k-shingle sets for pairs sharing at
    least one shingle (inverted-index join; ``explode`` + groupBy — the
    candidate key is the shingle, so no all-pairs stage exists).

    ``max_df`` drops shingles whose document frequency exceeds the cap
    BEFORE the self-join — a boilerplate shingle ("all rights reserved")
    present in 1% of a 10^9-doc corpus would otherwise make the posting
    -list self-join quadratic in that one key (10^14 pairs). Jaccard is
    then over the non-boilerplate shingle sets (sizes computed after the
    filter, so the ratio stays internally consistent); the SQL oracle
    mirrors the same cap. A shingle shared by more than ``max_df`` docs
    carries ~no dedup signal anyway.

    ``pair_budget`` is the ADAPTIVE companion (round-4 verdict item 6):
    a fixed df cap never fires on a corpus whose shingle df sits
    uniformly BELOW it (the sf1 exercise: df≈75 everywhere → 312.9s —
    the self-join cost is Σ_sh C(df,2), not max df). The effective cap
    is the largest df value whose ascending-df cumulative candidate
    count Σ df(df-1)/2·n_shingles(df) stays within the budget — i.e.
    keep the LOWEST-df (highest-signal) shingles first and shed fat
    posting lists until the join is budget-bounded. Deterministic,
    data-dependent, computed from the tiny df histogram (bounded
    cardinality: distinct df values), mirrored exactly by the SQL
    oracle. On ordinary corpora (df mostly 1-2) the budget never binds
    and behavior is identical to the plain ``max_df`` form."""
    from ..functions.text_fast import shingles_fast

    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_fast(F.col(text_col)))).alias("sh"),
    )
    if max_df is not None or pair_budget is not None:
        dfs = sh.groupBy("sh").agg(F.count("*").alias("df"))
        cap = F.lit(max_df) if max_df is not None else None
        if pair_budget is not None:
            hist = dfs.groupBy("df").agg(F.count("*").alias("n_sh"))
            # global window over the df HISTOGRAM — bounded cardinality
            # (distinct df values), a few hundred rows at any scale
            wcum = Window.orderBy("df").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            cum = hist.withColumn(
                "cum_pairs",
                F.sum(F.expr("df * (df - 1) div 2") * F.col("n_sh")).over(wcum),
            )
            ad = cum.where(F.col("cum_pairs") <= pair_budget).agg(
                F.coalesce(F.max("df"), F.lit(1)).alias("ad_cap")
            )
            adaptive = F.col("ad_cap")
            cap = F.least(cap, adaptive) if cap is not None else adaptive
            # one-row broadcast scalar attachment (same pattern as the
            # corpus-size scalars in the TF-IDF / fluency queries)
            sh = (
                sh.join(dfs, "sh")
                .crossJoin(F.broadcast(ad))
                .where(F.col("df") <= cap)
                .select("id", "sh")
            )
        else:
            hot = dfs.filter(F.col("df") > max_df)
            # anti-join on the shingle key; the hot side is usually tiny
            # (boilerplate only) — AQE picks broadcast when it is, and
            # falls back to a shuffle join when a pathological corpus
            # makes it big.
            sh = sh.join(hot.select("sh"), "sh", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "sh")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a", "id_b",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    from ..functions.text_fast import simhash32_fast

    return docs.select(F.col(id_col), simhash32_fast(F.col(text_col)).alias("simhash"))


SIMHASH_MAX_BUCKET = 1000  # hot byte-band cap, mirrored engine <-> oracle


def simhash_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                            sig_col: str = "simhash", max_hamming: int = 3,
                            max_bucket: int | None = SIMHASH_MAX_BUCKET
                            ) -> DataFrame:
    """(id_a < id_b, hamming): SimHash near-dup pairs by byte banding.

    Pigeonhole completeness: the 32-bit signature splits into 4 8-bit
    bands; hamming(a, b) <= 3 flips at most 3 bands, so at least one
    band byte is IDENTICAL — the (band, byte) equi-join therefore finds
    every pair within the radius, and the exact ``bit_count(xor)``
    filter afterwards removes band-collision false positives. No
    all-pairs stage exists; the candidate key is (band, byte), the same
    discipline as every other family here. A degenerate band value
    (e.g. all-zero signatures from near-empty docs) is capped exactly
    like :func:`lsh_candidate_pairs` — members of a dropped bucket
    still pair through their other 3 bands, and the oracle mirrors the
    cap."""
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("sig"), 8 * i).bitwiseAND(F.lit(255)).alias("byte"),
        )
        for i in range(4)
    ])
    unp = (
        sigs.where(F.col(sig_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"))
        .select("id", "sig", F.explode(bands).alias("b"))
        .select("id", "sig", "b.band", "b.byte")
    )
    if max_bucket is not None:
        hot = (
            unp.groupBy("band", "byte")
            .agg(F.count("*").alias("members"))
            .filter(F.col("members") > max_bucket)
        )
        unp = unp.join(hot.select("band", "byte"), ["band", "byte"], "left_anti")
    a = unp.select("band", "byte", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = unp.select("band", "byte", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "byte"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _cc_min_labels(pairs: DataFrame, vertices: DataFrame,
                   id_col: str = "doc_id") -> tuple[DataFrame, int]:
    """Min-label connected components with pointer doubling; returns
    (labels DataFrame with columns id/lab, rounds taken). See
    :func:`dedup_clusters` for the public contract."""
    from ..engine.driver import _checkpointed

    verts = vertices.select(F.col(id_col).cast("long").alias("id")).distinct()
    fwd = pairs.select(F.col("id_a").cast("long").alias("src"),
                       F.col("id_b").cast("long").alias("dst"))
    edges = _checkpointed(
        fwd.unionByName(fwd.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    )
    # checkpoint the seed labels: the vertex set's lineage (often a
    # whole signature pipeline) must be computed once, not once per
    # consumer of the first propagation round
    labels = _checkpointed(verts.withColumn("lab", F.col("id")))
    rounds = 0
    while True:
        rounds += 1
        # (a) neighbor propagation: min over adjacent labels
        nbr = (
            edges.join(labels, edges["dst"] == labels["id"])
            .select(F.col("src").alias("id"), "lab")
        )
        # (b) pointer doubling: lab <- label-of-label. Propagation alone
        # is O(component diameter) rounds — an adversarial chain of
        # near-dups (template-mutation corpora) would iterate n times.
        # Shortcutting through the label vertex halves the remaining
        # pointer distance every round, so a length-n path converges in
        # O(log n) rounds (classic pointer-jumping; same effect as the
        # large-star/small-star alternation, one join cheaper).
        lol = (
            labels.alias("a")
            .join(
                labels.select(F.col("id").alias("lab"),
                              F.col("lab").alias("lab2")).alias("b"),
                "lab", "left",
            )
            .select("id", F.coalesce("lab2", "lab").alias("lab"))
        )
        new_labels = _checkpointed(
            labels.select("id", "lab").unionByName(nbr).unionByName(lol)
            .groupBy("id").agg(F.min("lab").alias("lab"))
        )
        # exact, overflow-free fixpoint test: count labels that changed
        # this round (labels are monotone non-increasing, so `<` is
        # equivalent to `!=`). A sum(label) comparison could wrap
        # silently at web scale — 64-bit hash ids × 10^9 vertices
        # overflows long sum, and two distinct states could compare
        # equal and terminate propagation early.
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.lab") < F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels, rounds


def dedup_clusters(pairs: DataFrame, vertices: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Connected components over a near-dup pair list → (doc_id,
    cluster_id), cluster_id = min doc_id in the component; singletons
    label themselves. This is the step that turns pairwise near-dup
    evidence (LSH / jaccard / cosine) into keep-one-per-cluster
    decisions in a training-data pipeline.

    Iterative min-label propagation WITH pointer doubling: labels start
    as own id; each round every vertex takes the min of (its own label,
    its neighbors' labels, its label's label). The label-of-label
    shortcut makes convergence O(log n) rounds even on adversarial
    long-path graphs (round-count-tested on a planted 1000-node path),
    while dense near-dup cliques still finish in 2-3 rounds. Per round:
    two shuffle joins + one groupBy-min + one exact changed-label count
    (overflow-free — NOT a sum(label) check, which can wrap at web
    scale). State is checkpointed per round with reset stats, the same
    iterative-loop hygiene as the crawl driver."""
    labels, _ = _cc_min_labels(pairs, vertices, id_col)
    return labels.select(F.col("id").alias(id_col), F.col("lab").alias("cluster_id"))


EMBED_MAX_CELL = 20000  # per-cell pair budget: 2e8 pairs ~ seconds in BLAS


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        cell_col: str = "label",
                        max_cell: int | None = EMBED_MAX_CELL) -> DataFrame:
    """Cosine near-dup pairs within coarse cells (cell-bucketed — the
    embedding analogue of LSH banding), scored per cell as ONE numpy
    GEMM: ``groupBy(cell).applyInPandas`` stacks the cell's matrix once
    and computes ``mat @ mat.T`` in row-chunks, emitting upper-triangle
    pairs ≥ threshold. One shuffle (on the cell key), BLAS for every
    dot product — the interpreted-HOF per-pair formulation this
    replaces ran Spark's ``zip_with``/``aggregate`` per element and was
    the slowest row on the bench (10.4s → GEMM).

    The within-cell semantics are inherently all-pairs-in-cell, so cell
    size bounds the work quadratically: ``max_cell`` drops cells larger
    than the cap from the pair scan (a cell holding 10% of a 10^9-vector
    corpus would be 5·10^15 pairs — no plan survives that; the contract
    is that the coarse quantizer keeps cells bounded, and the cap makes
    a violation degrade to "skip the degenerate cell", not a wedged
    stage). Mirrored in the SQL oracle (QUALIFY over the cell key)."""
    import numpy as np
    import pandas as pd

    e = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if max_cell is not None:
        counts = e.groupBy("cell").agg(F.count("*").alias("cell_n"))
        e = e.join(counts, "cell").filter(F.col("cell_n") <= max_cell).drop("cell_n")
    thr = float(threshold)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_a": np.array([], dtype=np.int64),
            "id_b": np.array([], dtype=np.int64),
            "cos_sim": np.array([], dtype=np.float64),
        })
        n = len(pdf)
        if n < 2:
            return empty
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        outs = [empty]
        # row-chunked GEMM bounds the sims buffer to CH x n (a full
        # n x n block at the max_cell cap would be 3.2 GB)
        CH = 1024
        for s0 in range(0, n, CH):
            s1 = min(s0 + CH, n)
            block = mat[s0:s1] @ mat.T
            block /= np.outer(nrm[s0:s1], nrm)
            r = np.round(block, 6)
            ii, jj = np.nonzero(r >= thr)
            gi = ii + s0
            m = jj > gi  # upper triangle: id_a < id_b, self-pairs out
            outs.append(pd.DataFrame({
                "id_a": ids[gi[m]], "id_b": ids[jj[m]],
                "cos_sim": r[ii[m], jj[m]],
            }))
        return pd.concat(outs, ignore_index=True)

    return e.groupBy("cell").applyInPandas(
        cell_pairs, "id_a long, id_b long, cos_sim double"
    )


def dup_kgram_windows(
    docs: DataFrame, k: int = 10, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-substring dedup signal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    count the k-token windows whose exact token sequence also appears in
    at least one OTHER document.

    Plan shape (all linear — no self-join exists in this family):
      tokens -> transform(sequence) window grams -> explode ->
      groupBy(gram) countDistinct(doc) -> semi-join back -> per-doc count.
    Two keyed shuffles on the gram, each with map-side partial
    aggregation. At 100-TB scale the shuffle key would be
    xxhash64(gram) (8 bytes vs ~60) — kept as the raw string here so the
    DuckDB oracle compares exactly, collision-free.
    """
    # materialize the token array behind a projection boundary FIRST:
    # referenced directly inside the transform lambda, the regexp
    # tokenizer is re-evaluated per window element (no common-subexpr
    # elimination across lambda scopes) — measured 3.5x slower at the
    # sf1 exercise (30s -> 8.4s for the gram explode).
    tok = docs.select(F.col(id_col), X.tokens(F.col(text_col)).alias("_tk"))
    toks = F.col("_tk")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    exploded = tok.select(F.col(id_col), F.explode(grams).alias("g"))
    dup_grams = (
        exploded.groupBy("g")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("g")
    )
    per_doc = (
        exploded.join(dup_grams, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_windows"))
    )
    base = tok.select(
        F.col(id_col),
        F.greatest(F.size(toks) - (k - 1), F.lit(0)).cast("long").alias("n_windows"),
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        )
    )
