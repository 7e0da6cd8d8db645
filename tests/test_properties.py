"""Property-based checks (SURVEY.md §5.2.6).

- canonicalization: Column expr == Python mirror for arbitrary URLs;
  idempotence (canon(canon(u)) == canon(u)).
- Bloom seen-set: NO false negatives ever; false positives always
  rescued by the exact confirm (filter_new == plain anti-join).
"""

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark.canonical import canonicalize_url, canonicalize_url_col
from crawler_spark.operators import dedup as dd

_seg = st.text(alphabet=string.ascii_letters + string.digits + "-._~", min_size=1, max_size=8)
_urls = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}/{path}{q}{frag}"
    ),
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.builds(lambda a, b: f"{a}.{b}", _seg, st.sampled_from(["com", "local", "org"])),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _seg,
    st.one_of(
        st.just(""),
        st.builds(lambda ks: "?" + "&".join(f"{k}={v}" for k, v in ks),
                  st.lists(st.tuples(_seg, _seg), min_size=1, max_size=4)),
    ),
    st.sampled_from(["", "#x", "#frag/“"]),
)


class TestCanonicalProperties:
    @given(url=_urls)
    @settings(max_examples=200, deadline=None)
    def test_python_idempotent(self, url):
        c = canonicalize_url(url)
        assert canonicalize_url(c) == c

    def test_column_matches_python_on_many(self, spark):
        # one Spark job over a generated corpus (per-example Spark jobs
        # would be minutes of overhead)
        import random

        rng = random.Random(7)
        segs = ["a", "B9", "x-y", "p.q", "detail", "索引"]
        urls = []
        for _ in range(200):
            scheme = rng.choice(["http", "https", "HTTP", "Https"])
            host = f"{rng.choice(segs)}.{rng.choice(['com', 'local', 'ORG'])}"
            port = rng.choice(["", ":80", ":443", ":8080"])
            path = "/".join(rng.choices(segs, k=rng.randint(0, 3)))
            q = (
                "?" + "&".join(f"{rng.choice(segs)}={rng.randint(0,99)}"
                               for _ in range(rng.randint(1, 4)))
                if rng.random() < 0.7 else ""
            )
            frag = rng.choice(["", "#x", "#a/b"])
            urls.append(f"{scheme}://{host}{port}/{path}{q}{frag}")
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [r["c"] for r in df.select(canonicalize_url_col(F.col("url")).alias("c")).collect()]
        want = [canonicalize_url(u) for u in urls]
        assert got == want


class TestBloomProperties:
    def test_filter_new_equals_exact_antijoin(self, spark):
        import random

        rng = random.Random(42)
        seen_keys = [rng.getrandbits(62) for _ in range(500)]
        cand_keys = seen_keys[250:] + [rng.getrandbits(62) for _ in range(500)]
        seen = spark.createDataFrame(
            [(str(k), k) for k in seen_keys], "canon string, url_hash long"
        )
        cand = spark.createDataFrame(
            [(str(k), k) for k in cand_keys], "canon string, url_hash long"
        )
        for m_bits in (128, 1 << 12, 1 << 16):  # saturated → roomy
            shards = dd.update_shards(
                dd.empty_shards(spark, 8, m_bits), seen.select("url_hash"), 8, m_bits
            )
            with_bloom = sorted(
                r["canon"] for r in dd.filter_new(cand, seen, shards, 8, m_bits).collect()
            )
            exact = sorted(
                r["canon"] for r in dd.filter_new(cand, seen, None).collect()
            )
            assert with_bloom == exact, f"m_bits={m_bits}"
