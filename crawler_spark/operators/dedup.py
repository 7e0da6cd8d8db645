"""URL-seen set — partitioned Bloom shards + exact-confirm anti-join.

The reference's dedup is Scrapy's RFPDupeFilter: an exact, in-memory,
process-lifetime set of request fingerprints (opted into algo "2.7" at
reference ``project/settings.py:94``), consulted at enqueue time — a
duplicate canonical URL is silently dropped. Observable contract: a URL
is crawled at most once per crawl.

At 10^10 URLs an exact distributed anti-join against the full seen
table every wave means shuffling the multi-TB seen table repeatedly.
The north_rule architecture:

- persistent state: a SPARSE words table ``(shard, w, bits)`` — the
  non-zero 64-bit words of ``n_shards`` Bloom bitmaps of ``m_bits``
  each, keyed by ``shard = url_hash % n_shards`` (url_hash = xxhash64
  of the canonical URL). Incremental update is one codegen'd
  shuffle: explode each new key into K=5 bit positions, ``bit_or``
  per (shard, word), union with the old words, ``bit_or`` again.
  (A dense-array update was 10x slower: Catalyst higher-order
  functions are interpreted, and ``element_at`` on a map is a linear
  scan — the map-probe densify was O(words x map) on the driver of
  every wave.)
- probe-time: the words of each shard are scattered into one dense
  ``array<long>`` blob per shard (numpy, via applyInPandas — this
  touches only the COMPRESSED bloom representation, never data rows),
  then candidates probe with ONE equi-join on shard + a codegen'd
  K-bit test expression. The driver densifies once per wave and
  reuses the blobs for every filter_new call in that wave.
- Bloom "no" is authoritative (no false negatives) → row is NEW;
  Bloom "maybe" goes to an exact anti-join against the seen table —
  false positives rescued, end-to-end semantics EXACT.

Sizing (cluster): for p=1% at n keys, m ≈ 9.6n bits. 10^10 URLs over
4096 shards → ~2.4M keys/shard → ~2.9MB blob; a wave's probe join
moves 4096 x 3MB = 12GB of blobs once — far cheaper than re-shuffling
the 10^10-row seen table. The sparse update shuffles only
O(wave x K) positions. Densify is O(bloom bytes) of numpy writes,
shard-parallel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# persistent sparse representation
SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("bits", T.LongType(), False),
    ]
)

# probe-time dense representation
BLOB_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("words", T.ArrayType(T.LongType()), False),
    ]
)

K_HASHES = 5
# odd multipliers + offsets for the K affine position maps
_COEF = [(2 * i + 3, 0x9E37 + 77 * i) for i in range(K_HASHES)]


def _hprime(url_hash: Column) -> Column:
    # reduce below 2^31 so position arithmetic stays far from overflow
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
    """OR the new keys' bits into the sparse words — one codegen'd
    groupBy on (shard, w), no Python, no HOFs."""
    keys = new_hashes.select(
        _shard_of(F.col("url_hash"), n_shards).alias("shard"), "url_hash"
    )
    pos = keys.select(
        "shard",
        F.explode(
            F.array(*[_pos(F.col("url_hash"), i, m_bits) for i in range(K_HASHES)])
        ).alias("p"),
    )
    sparse = pos.select(
        "shard",
        (F.col("p") / 64).cast("int").alias("w"),
        F.expr("shiftleft(cast(1 as bigint), cast(pmod(p, 64) as int))").alias("bits"),
    )
    return (
        shards.unionByName(sparse)
        .groupBy("shard", "w")
        .agg(F.bit_or("bits").alias("bits"))
    )


def densify(shards: DataFrame, m_bits: int) -> DataFrame:
    """Sparse words → one dense blob row per shard (numpy scatter over
    the bloom's own representation — bounded by bloom bytes, not by
    data rows; shard-parallel)."""
    n_words = m_bits // 64

    def scatter(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for shard, grp in pdf.groupby("shard"):
            words = np.zeros(n_words, dtype=np.int64)
            words[grp["w"].to_numpy()] = grp["bits"].to_numpy()
            out.append((int(shard), words.tolist()))
        return pd.DataFrame(out, columns=["shard", "words"])

    return shards.groupBy("shard").applyInPandas(scatter, BLOB_SCHEMA)


# broadcast the dense blobs when the whole filter fits comfortably in
# the driver/executors (sandbox: 64 shards x 16KiB = 1MB); above this
# the probe is a shuffle join on shard, which is the 10^10-scale story
# (4096 x 3MB = 12GB of blobs moved once per wave).
BROADCAST_BLOB_BYTES = 64 * 1024 * 1024


def probe_shards(
    candidates: DataFrame,
    blobs: DataFrame,
    n_shards: int,
    m_bits: int,
) -> DataFrame:
    """Adds ``maybe_seen`` via one join + a codegen bit test. Candidates
    must carry ``url_hash``; ``blobs`` comes from :func:`densify`.

    The blob side's stats are opaque to Catalyst (it comes out of an
    applyInPandas), so without a hint the planner picks a sort-merge
    join and re-shuffles every candidate by shard. When the bloom is
    broadcast-sized the probe must be a broadcast hash join — a NARROW
    stage over the candidates, no exchange at all."""
    keyed = candidates.withColumn("_shard", _shard_of(F.col("url_hash"), n_shards))
    blob = blobs.select(F.col("shard").alias("_shard"), "words")
    if n_shards * (m_bits // 8) <= BROADCAST_BLOB_BYTES:
        blob = F.broadcast(blob)
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
    shards_or_blobs: DataFrame | None,
    n_shards: int = 64,
    m_bits: int = 1 << 17,
    prebuilt_blobs: bool = False,
) -> DataFrame:
    """The dedup gate (reference O10 ``calculate_task_item`` +
    RFPDupeFilter E1): keep candidates whose canonical URL was never
    scheduled. Exact semantics always; the Bloom (if given) prunes the
    exact anti-join down to the "maybe" subset.

    ``shards_or_blobs``: the sparse words table, or (with
    ``prebuilt_blobs=True``) an already-densified blob table — the
    driver densifies once per wave and reuses."""
    if shards_or_blobs is None:
        return candidates.join(seen.select("canon"), "canon", "left_anti")
    blobs = shards_or_blobs if prebuilt_blobs else densify(shards_or_blobs, m_bits)
    probed = probe_shards(candidates, blobs, n_shards, m_bits)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    rescued = maybes.join(seen.select("canon"), "canon", "left_anti")
    return fresh.unionByName(rescued)
