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


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        bands: int = 4, rows: int = 2) -> DataFrame:
    """(id_a < id_b, est_jaccard): pairs sharing ≥1 of `bands` band
    buckets; est_jaccard = matching minhashes / 8."""
    band_keys = [
        F.concat_ws("_", F.lit(b), *[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    keyed = sigs.select(id_col, *[F.col(f"mh{i}") for i in range(bands * rows)], *band_keys)
    bucketed = keyed.unpivot(
        [id_col] + [f"mh{i}" for i in range(bands * rows)],
        [f"band{b}" for b in range(bands)],
        "band", "bucket",
    )
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


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = 1000) -> DataFrame:
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
    carries ~no dedup signal anyway."""
    from ..functions.text_fast import shingles_fast

    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_fast(F.col(text_col)))).alias("sh"),
    )
    if max_df is not None:
        hot = sh.groupBy("sh").agg(F.count("*").alias("df")).filter(
            F.col("df") > max_df
        )
        # anti-join on the shingle key; the hot side is usually tiny
        # (boilerplate only) — AQE picks broadcast when it is, and falls
        # back to a shuffle join when a pathological corpus makes it big.
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


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        cell_col: str = "label") -> DataFrame:
    """Cosine near-dup pairs within coarse cells (cell-bucketed
    self-join — the embedding analogue of LSH banding)."""
    from .similarity import cosine

    e = embeddings.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a = e.select("cell", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = e.select("cell", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
