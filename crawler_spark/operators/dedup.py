"""URL-seen set — partitioned Bloom shards + exact-confirm anti-join.

The reference's dedup is Scrapy's RFPDupeFilter: an exact, in-memory,
process-lifetime set of request fingerprints (opted into algo "2.7" at
reference ``project/settings.py:94``), consulted at enqueue time — a
duplicate canonical URL is silently dropped. Observable contract: a URL
is crawled at most once per crawl.

At 10^10 URLs an exact distributed anti-join against the full seen
table every wave means shuffling the whole multi-TB seen table
repeatedly. The north_rule architecture, implemented 100% in Catalyst
expressions (NO Python in the dedup hot path — bitwise ops stay in
whole-stage codegen):

- the seen set lives as ``n_shards`` Bloom bitmaps, each a dense
  ``array<long>`` of ``m_bits/64`` words, keyed by
  ``shard = url_hash % n_shards`` (url_hash = xxhash64 of the
  canonical URL);
- per key, K=5 bit positions from affine maps of the hash
  (``(h' * (2i+1) + Ci) mod m_bits`` with h' pre-reduced below 2^31 so
  no arithmetic overflows);
- build/update: the wave's new keys explode into (shard, word, bits)
  rows, ``bit_or`` per word, densify per shard, ``zip_with(|)`` into
  the old blob — incremental, never rebuilt from scratch;
- probe: ONE equi-join candidate→shard blob + a codegen'd expression
  testing the K bits (``element_at`` + ``&``);
- Bloom "no" is authoritative (no false negatives) → row is NEW —
  the common case, touching only O(wave × blob) bytes;
- Bloom "maybe" goes to an exact anti-join against the seen table —
  false positives are rescued, end-to-end semantics EXACT.

Sizing (cluster): for p=1% at n keys, m ≈ 9.6·n bits. 10^10 URLs over
4096 shards → ~2.4M keys/shard → ~2.9MB blob; a wave's probe join
moves 4096 × 3MB = 12GB of blobs once — far cheaper than re-shuffling
the 10^10-row seen table. Blob update is the same order. The shard
count is the partitioning knob: more shards = finer probe-join
distribution (the blob table is hash-partitioned on shard, so both
sides co-locate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("words", T.ArrayType(T.LongType()), False),
    ]
)

K_HASHES = 5
# odd multipliers + offsets for the K affine position maps
_COEF = [(2 * i + 3, 0x9E37 + 77 * i) for i in range(K_HASHES)]


def _hprime(url_hash: Column) -> Column:
    # reduce below 2^31 so pos arithmetic stays far from long overflow
    return F.pmod(url_hash, F.lit((1 << 31) - 1))


def _pos(url_hash: Column, i: int, m_bits: int) -> Column:
    a, c = _COEF[i]
    return F.pmod(_hprime(url_hash) * F.lit(a) + F.lit(c), F.lit(m_bits))


def _shard_of(url_hash: Column, n_shards: int) -> Column:
    return F.pmod(url_hash, F.lit(n_shards)).cast("int")


def empty_shards(spark: SparkSession, n_shards: int, m_bits: int) -> DataFrame:
    return spark.createDataFrame([], SHARD_SCHEMA)


def update_shards(
    shards: DataFrame, new_hashes: DataFrame, n_shards: int, m_bits: int
) -> DataFrame:
    """OR the new keys' bits into their shard blobs. Shards untouched by
    the wave pass through unchanged (full outer join on shard)."""
    n_words = m_bits // 64
    keys = new_hashes.select(
        _shard_of(F.col("url_hash"), n_shards).alias("shard"), "url_hash"
    )
    pos = keys.select(
        "shard",
        F.explode(
            F.array(*[_pos(F.col("url_hash"), i, m_bits) for i in range(K_HASHES)])
        ).alias("p"),
    )
    sparse = (
        pos.select(
            "shard",
            (F.col("p") / 64).cast("int").alias("w"),
            # expr form: shiftleft's bit-count must be an expression here
            F.expr("shiftleft(cast(1 as bigint), cast(pmod(p, 64) as int))").alias("m"),
        )
        .groupBy("shard", "w")
        .agg(F.bit_or("m").alias("bits"))
    )
    dense_new = (
        sparse.groupBy("shard")
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("wm"))
        .select(
            "shard",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(F.element_at(F.col("wm"), i), F.lit(0).cast("long")),
            ).alias("new_words"),
        )
    )
    counts = keys.groupBy("shard").agg(F.count("*").alias("new_n"))
    dense_new = dense_new.join(counts, "shard")
    merged = (
        shards.join(dense_new, "shard", "full")
        .select(
            "shard",
            F.lit(m_bits).alias("m_bits"),
            (F.coalesce(F.col("n_keys"), F.lit(0)) + F.coalesce(F.col("new_n"), F.lit(0))).alias("n_keys"),
            F.when(
                F.col("words").isNull(), F.col("new_words")
            ).when(
                F.col("new_words").isNull(), F.col("words")
            ).otherwise(
                F.zip_with(F.col("words"), F.col("new_words"), lambda a, b: a.bitwiseOR(b))
            ).alias("words"),
        )
    )
    return merged


def probe_shards(
    candidates: DataFrame, shards: DataFrame, n_shards: int, m_bits: int
) -> DataFrame:
    """Adds ``maybe_seen`` via one join + a codegen bit test. Candidates
    must carry ``url_hash``."""
    keyed = candidates.withColumn("_shard", _shard_of(F.col("url_hash"), n_shards))
    blob = shards.select(F.col("shard").alias("_shard"), "words")
    joined = keyed.join(blob, "_shard", "left")
    for i in range(K_HASHES):
        joined = joined.withColumn(f"_p{i}", _pos(F.col("url_hash"), i, m_bits))
    test = F.lit(True)
    for i in range(K_HASHES):
        word = F.element_at(F.col("words"), (F.col(f"_p{i}") / 64).cast("int") + 1)
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(pmod(_p{i}, 64) as int))")
        test = test & (word.bitwiseAND(mask) != 0)
    return joined.withColumn(
        "maybe_seen",
        F.when(F.col("words").isNull(), F.lit(False)).otherwise(test),
    ).drop("_shard", "words", *[f"_p{i}" for i in range(K_HASHES)])


def filter_new(
    candidates: DataFrame,
    seen: DataFrame,
    shards: DataFrame | None,
    n_shards: int = 64,
    m_bits: int = 1 << 17,
) -> DataFrame:
    """The dedup gate (reference O10 ``calculate_task_item`` +
    RFPDupeFilter E1): keep candidates whose canonical URL was never
    scheduled. Exact semantics always; Bloom shards (if given) prune the
    exact anti-join down to the "maybe" subset.

    ``candidates`` carry (canon, url_hash, ...); ``seen`` is the
    authoritative (canon, url_hash) table."""
    if shards is None:
        return candidates.join(seen.select("canon"), "canon", "left_anti")
    probed = probe_shards(candidates, shards, n_shards, m_bits)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rescued = maybes.join(seen.select("canon"), "canon", "left_anti")
    return fresh.unionByName(rescued)
