"""Unit tests: politeness rank, Bloom shards, robots gate, parsing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.parsing import build_tree, extract_text_page, parse_list_page
from crawler_spark.operators import dedup as dd
from crawler_spark.operators.politeness import admit_per_host
from crawler_spark.operators.robots import ROBOTS_SCHEMA, apply_robots, robots_allowed_py


# ---------------------------------------------------------------- politeness

def test_admit_per_host_budget_and_order(spark):
    rows = [
        (f"https://h{h}.local/u{i:03d}", f"h{h}.local", i % 3, 2)
        for h in range(3)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "url string, host string, discovered_wave int, budget int")
    out = admit_per_host(df, "budget", n_salts=4).toPandas()
    adm = out[out.admitted]
    assert len(adm) == 6  # 2 per host
    for h in range(3):
        sub = adm[adm.host == f"h{h}.local"].sort_values("url")
        # first budget rows of the (discovered_wave, url) total order
        want = sorted(
            [r[0] for r in rows if r[1] == f"h{h}.local"],
            key=lambda u: (int(u[-3:]) % 3, u),
        )[:2]
        assert sorted(sub.url) == sorted(want)


def test_admit_matches_naive_window(spark):
    """Two-phase salted top-k must equal the naive single-window rank."""
    from pyspark.sql import Window

    rows = [
        (f"https://skew.local/{i:05d}", "skew.local", i % 7, 13) for i in range(500)
    ] + [(f"https://tiny.local/{i}", "tiny.local", 0, 3) for i in range(2)]
    df = spark.createDataFrame(rows, "url string, host string, discovered_wave int, budget int")
    fast = set(
        r["url"]
        for r in admit_per_host(df, "budget", n_salts=8).filter("admitted").collect()
    )
    w = Window.partitionBy("host").orderBy("discovered_wave", "url")
    naive = set(
        r["url"]
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("budget"))
        .collect()
    )
    assert fast == naive


# --------------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_rescue(spark):
    n_shards, m_bits = 4, 128  # near-saturated bitmap → force false positives
    seen_urls = [(f"u{i}", i * 7919) for i in range(200)]
    seen = spark.createDataFrame(seen_urls, "canon string, url_hash long")
    shards = dd.update_shards(
        dd.empty_shards(spark, n_shards, m_bits),
        seen.select("url_hash"), n_shards, m_bits,
    )
    blobs = dd.densify(shards, m_bits)
    probed = dd.probe_shards(seen, blobs, n_shards, m_bits)
    # every inserted key must report maybe_seen (no false negatives)
    assert probed.filter(~F.col("maybe_seen")).count() == 0

    cands = spark.createDataFrame(
        [(f"u{i}", i * 7919) for i in range(150, 400)], "canon string, url_hash long"
    )
    out = dd.filter_new(cands, seen, shards, n_shards, m_bits)
    got = sorted(r["canon"] for r in out.collect())
    assert got == [f"u{i}" for i in range(200, 400)]  # exact despite tiny bloom
    # and the tiny bloom really does fire false positives (rescue path ran)
    fp = dd.probe_shards(
        cands.filter(F.col("url_hash") >= 200 * 7919), blobs, n_shards, m_bits
    ).filter(F.col("maybe_seen")).count()
    assert fp > 0


def test_bloom_incremental_update(spark):
    n_shards, m_bits = 4, 1 << 14
    s0 = dd.empty_shards(spark, n_shards, m_bits)
    h1 = spark.createDataFrame([(i * 31 + 7,) for i in range(50)], "url_hash long")
    h2 = spark.createDataFrame([(i * 131 + 3,) for i in range(50)], "url_hash long")
    s1 = dd.update_shards(s0, h1, n_shards, m_bits)
    s2 = dd.update_shards(s1, h2, n_shards, m_bits)
    both = h1.unionByName(h2).withColumn("canon", F.col("url_hash").cast("string"))
    probed = dd.probe_shards(both, dd.densify(s2, m_bits), n_shards, m_bits)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


# -------------------------------------------------------------------- robots

ROBOTS = [
    {"host": "a.local", "path_prefix": "/private/", "allow": False, "crawl_delay": None},
    {"host": "a.local", "path_prefix": "/private/open/", "allow": True, "crawl_delay": None},
    {"host": "a.local", "path_prefix": "/", "allow": True, "crawl_delay": 4.0},
]


def test_robots_gate_spark_matches_python(spark):
    urls = [
        "https://a.local/ok.html",
        "https://a.local/private/x.html",
        "https://a.local/private/open/y.html",
        "https://b.local/anything",
    ]
    rules = spark.createDataFrame(
        [(r["host"], r["path_prefix"], r["allow"], r["crawl_delay"]) for r in ROBOTS],
        ROBOTS_SCHEMA,
    )
    df = spark.createDataFrame(
        [(u, u.split("/")[2]) for u in urls], "url string, host string"
    )
    got = {
        r["url"]: (r["robots_allowed"], r["robots_delay"])
        for r in apply_robots(df, rules).collect()
    }
    for u in urls:
        host = u.split("/")[2]
        assert got[u][0] == robots_allowed_py(ROBOTS, host, u), u
    assert got["https://a.local/ok.html"] == (True, 4.0)
    assert got["https://a.local/private/x.html"][0] is False
    assert got["https://a.local/private/open/y.html"][0] is True
    assert got["https://b.local/anything"] == (True, None)


# ------------------------------------------------------------------- parsing

def test_tree_builder_child_vs_descendant_axis():
    html = '<div class="row"><a href="/d/1"><span>T</span></a><span>D</span></div>'
    items = parse_list_page(html, "xpath_sizebid")
    assert items == [
        {"title": "T", "raw_time": "D", "href": "/d/1",
         "pro_url": None, "item_id": None, "origin_url": None}
    ]


def test_extract_text_contract_edges():
    html = (
        '<html><body><div class="content">'
        "<p>  a  </p><p>b<b>c</b>d</p><p>x<br/>y</p><p>   </p>"
        '</div><div class="footer">no</div></body></html>'
    )
    assert extract_text_page(html) == "a\nb\nc\nd\nx\ny"
    assert extract_text_page('<html><div class="content"></div></html>') == ""
    assert extract_text_page("<html><p>no content div</p></html>") is None


def test_parse_json_kind_and_malformed():
    good = '{"data":{"list":[{"name":"N","proStartTime":"2024-01-02T09:00:00","proUrl":null,"id":5,"viewUrl":"http://v"}]}}'
    items = parse_list_page(good, "json_dz100")
    assert items[0]["item_id"] == 5 and items[0]["pro_url"] is None
    assert parse_list_page("not json{", "json_dz100") == []
    assert parse_list_page('{"data":{}}', "json_dz100") == []


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A boilerplate shingle present in half the docs must be excluded by
    the DF cap (bounding the posting-list self-join) — and the Jaccard
    values must equal a pure-Python recomputation under the same cap."""
    from crawler_spark.functions.text_fast import shingles_py
    from crawler_spark.operators.dedup_docs import ngram_jaccard_pairs

    boiler = "all rights reserved worldwide"
    docs = []
    for i in range(30):
        body = f"unique tale number {i} about topic {i % 4} with twist {i}"
        if i % 2 == 0:
            body += " " + boiler          # hot shingles in 50% of docs
        docs.append((i, body))
    # one true near-dup pair, both carrying the boilerplate
    docs.append((100, "identical payload text repeated here exactly " + boiler))
    docs.append((101, "identical payload text repeated here exactly " + boiler))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    cap = 5
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.3, max_df=cap).collect()
    }

    # pure-Python mirror with the same cap
    sets = {i: set(shingles_py(t)) for i, t in docs}
    from collections import Counter

    dfreq = Counter(s for v in sets.values() for s in v)
    sets = {i: {s for s in v if dfreq[s] <= cap} for i, v in sets.items()}
    want = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter and union and round(inter / union, 6) >= 0.3:
                want[(a, b)] = round(inter / union, 6)
    assert got == want
    assert (100, 101) in got            # the true dup survives the cap
    # and the boilerplate shingles were really dropped: no pair exists
    # purely via the hot shingle (e.g. docs 0 and 2 share only boiler)
    assert (0, 2) not in got


def test_ngram_jaccard_adaptive_pair_budget(spark):
    """A corpus whose shingle df sits uniformly BELOW the fixed cap (the
    sf1 exercise's failure mode: df≈75 vs cap 1000 → 312.9s) must be
    bounded by the pair budget instead: the effective cap is the largest
    df whose ascending-df cumulative Σ df(df-1)/2 candidate count fits
    the budget — verified against a pure-Python mirror of the rule, and
    the planted low-df near-dup pair must survive (lowest-df shingles
    are shed LAST)."""
    from collections import Counter

    from crawler_spark.functions.text_fast import shingles_py
    from crawler_spark.operators.dedup_docs import ngram_jaccard_pairs

    # small shared vocabulary → many mid-df shingles, none above max_df
    docs = []
    for i in range(24):
        words = [f"w{(i + j) % 8}" for j in range(10)]
        docs.append((i, " ".join(words)))
    # planted near-dup pair with UNIQUE (df=2) shingles
    docs.append((200, "alpha beta gamma delta epsilon zeta eta theta"))
    docs.append((201, "alpha beta gamma delta epsilon zeta eta iota"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    budget = 60
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, threshold=0.1, max_df=1000, pair_budget=budget
        ).collect()
    }

    # pure-Python mirror of the adaptive rule
    sets = {i: set(shingles_py(t)) for i, t in docs}
    dfreq = Counter(s for v in sets.values() for s in v)
    hist = Counter(dfreq.values())
    cum, ad_cap = 0, 1
    for dv in sorted(hist):
        cum += dv * (dv - 1) // 2 * hist[dv]
        if cum <= budget:
            ad_cap = dv
        else:
            break
    assert ad_cap < max(dfreq.values()), "budget must actually bind here"
    fsets = {i: {s for s in v if dfreq[s] <= ad_cap} for i, v in sets.items()}
    want = {}
    ids = sorted(fsets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            inter = len(fsets[a] & fsets[b])
            union = len(fsets[a] | fsets[b])
            if inter and union and round(inter / union, 6) >= 0.1:
                want[(a, b)] = round(inter / union, 6)
    assert got == want
    assert (200, 201) in got            # df=2 signal shingles shed last


def test_lsh_hot_bucket_cap(spark):
    """A degenerate band bucket (mass-duplicated boilerplate: 50
    identical docs → all four of their band buckets hold 50 members)
    must be dropped by the bucket cap BEFORE the self-join — the 1225
    within-mega pairs never materialize — while cold-bucket pairs are
    untouched: the capped run over the full set equals the uncapped run
    over the non-degenerate subset."""
    from crawler_spark.operators import dedup_docs as DD

    mega = [(i, "identical boilerplate page body repeated across mirror sites")
            for i in range(50)]
    normal = [
        (100 + i, f"unique story {i} about subject {i % 3} with detail {i} and flair {i * 7}")
        for i in range(12)
    ]
    normal += [
        (200, "shared payload text appearing here exactly twice today"),
        (201, "shared payload text appearing here exactly twice today"),
    ]
    sigs = DD.minhash_signatures(
        spark.createDataFrame(mega + normal, "doc_id long, text string")
    )
    capped = {(r.id_a, r.id_b)
              for r in DD.lsh_candidate_pairs(sigs, max_bucket=10).collect()}
    assert not any(a < 50 and b < 50 for a, b in capped)  # mega pairs gone
    assert (200, 201) in capped                           # cold pair survives
    ref_sigs = DD.minhash_signatures(
        spark.createDataFrame(normal, "doc_id long, text string")
    )
    ref = {(r.id_a, r.id_b)
           for r in DD.lsh_candidate_pairs(ref_sigs, max_bucket=None).collect()}
    assert capped == ref


def test_embedding_cell_cap_and_gemm_parity(spark):
    """The per-cell GEMM pair scan: (a) a cell above max_cell is skipped
    entirely (the quadratic stage never runs over it); (b) surviving
    cells' pairs equal a pure-numpy per-pair recomputation."""
    import numpy as np

    from crawler_spark.operators.dedup_docs import embedding_near_dups

    rng = np.random.RandomState(7)
    base = rng.randn(8, 16)
    base[1] = base[0] + 0.01 * rng.randn(16)  # near-dup of vec 0
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(8)]
    rows += [(100 + i, [float(x) for x in rng.randn(16)], 1) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")

    out = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups(df, threshold=0.9, max_cell=10).collect()
    }
    assert all(a < 100 and b < 100 for a, b in out)  # mega cell skipped
    exp = {}
    for a in range(8):
        for b in range(a + 1, 8):
            c = float(np.round(
                np.dot(base[a], base[b])
                / (np.linalg.norm(base[a]) * np.linalg.norm(base[b])), 6))
            if c >= 0.9:
                exp[(a, b)] = c
    assert (0, 1) in exp and out == exp


def test_ppm_decode_roundtrip():
    """decode_pixels really decodes binary PPM (pure numpy, no codec):
    synthetic_ppm round-trips bit-exactly, comments in the header are
    skipped, and codec formats still raise the declared stub error."""
    import numpy as np
    import pytest as _pytest

    from crawler_spark.operators.multimodal import (
        decode_pixels, synthetic_png, synthetic_ppm,
    )

    w, h, mid = 9, 7, 42
    payload = synthetic_ppm(mid, w, h)
    got_w, got_h, px = decode_pixels(payload)
    assert (got_w, got_h) == (w, h) and px.shape == (h, w, 3)
    j = np.arange(w * h * 3, dtype=np.int64)
    assert np.array_equal(px.reshape(-1), ((mid * 7 + j * 13) % 256).astype(np.uint8))

    commented = b"P6\n# a comment\n" + f"{w} {h}\n# more\n255\n".encode() \
        + payload.split(b"255\n", 1)[1]
    cw, ch, cpx = decode_pixels(commented)
    assert (cw, ch) == (w, h) and np.array_equal(cpx, px)

    with _pytest.raises(NotImplementedError):
        decode_pixels(synthetic_png(1, 4, 4))  # codec formats stay stubbed


def test_dedup_clusters_components(spark):
    """Min-label propagation: a 5-path (diameter 4 → multiple rounds),
    a separate pair, and an isolated vertex all label correctly."""
    from crawler_spark.operators.dedup_docs import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 10, 11, 20)], "doc_id long"
    )
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs, verts).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_ppm_decode_malformed_rows_degrade_per_row(spark):
    """Malformed payloads must raise (bounded) ValueError, never hang,
    and pixel_stats must skip them per-row, not fail the job."""
    import pytest as _pytest

    from crawler_spark.operators.multimodal import (
        decode_pixels, pixel_stats, synthetic_ppm,
    )

    bad = [
        b"P6",                       # header cut at the magic
        b"P6\n9 7",                  # cut mid-token, no trailing space
        b"P6\n# only a comment",     # comment runs to EOF
        b"P6\nx y\n255\n" + b"\x00" * 32,  # garbage tokens
        b"P6\n9 7\n255\n" + b"\x00" * 10,  # body shorter than w*h*3
        b"P6\n-3 7\n255\n" + b"\x00" * 64,  # non-positive dims
    ]
    for payload in bad:
        with _pytest.raises(ValueError):
            decode_pixels(payload)

    good = synthetic_ppm(7, 4, 3)
    media = spark.createDataFrame(
        [(1, good), (2, bad[0]), (3, bad[3]), (4, bad[4])],
        "media_id long, payload binary",
    )
    out = pixel_stats(media).collect()
    assert [r.media_id for r in out] == [1]  # one good row survives


def test_dedup_clusters_path_graph_log_rounds(spark):
    """Pointer doubling: a planted 1000-node path converges in O(log n)
    rounds (~12), not O(n) — the adversarial template-mutation shape."""
    from crawler_spark.operators.dedup_docs import _cc_min_labels

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    labels, rounds = _cc_min_labels(pairs, verts)
    assert rounds <= 20, f"path graph took {rounds} rounds"
    got = labels.collect()
    assert len(got) == n and all(r.lab == 0 for r in got)


def test_robots_wildcard_end_anchor(spark):
    """RFC 9309 wildcards: '*' spans any bytes, trailing '$' anchors the
    path end; engine (Catalyst regex) and python mirror must agree."""
    from crawler_spark.operators.robots import (
        ROBOTS_SCHEMA, apply_robots, pattern_matches_py, robots_allowed_py,
    )

    rules = [
        {"host": "w.local", "path_prefix": "/", "allow": True, "crawl_delay": None},
        {"host": "w.local", "path_prefix": "/a/*/c", "allow": False, "crawl_delay": None},
        {"host": "w.local", "path_prefix": "/exact$", "allow": False, "crawl_delay": None},
        {"host": "w.local", "path_prefix": "/p/*.pdf$", "allow": False, "crawl_delay": None},
        {"host": "w.local", "path_prefix": "/a/b/c/deep", "allow": True, "crawl_delay": None},
    ]
    cases = {
        "https://w.local/a/x/c/y": False,     # '*' mid-pattern deny
        "https://w.local/a/c": True,          # '*' must span >= 0 chars but /a/c has no middle seg... matches? '^/a/.*/c' vs '/a/c' -> no
        "https://w.local/exact": False,       # '$' exact hit
        "https://w.local/exactly": True,      # '$' must NOT match longer path
        "https://w.local/p/x/file.pdf": False,  # '*' + '$' suffix match
        "https://w.local/p/x/file.pdfx": True,  # anchored: trailing junk escapes
        "https://w.local/a/b/c/deep/doc": True,  # longer literal allow beats shorter wild deny
        "https://w.local/other": True,
    }
    for url, want in cases.items():
        assert robots_allowed_py(rules, "w.local", url) is want, url

    rdf = spark.createDataFrame(
        [(r["host"], r["path_prefix"], r["allow"], r["crawl_delay"]) for r in rules],
        ROBOTS_SCHEMA,
    )
    fr = spark.createDataFrame(
        [(u, "w.local") for u in cases], "url string, host string"
    )
    got = {r.url: r.robots_allowed for r in apply_robots(fr, rdf).collect()}
    assert got == cases

    # python-mirror micro-parity for the raw pattern matcher
    assert pattern_matches_py("/a/*/c", "/a/x/c")
    assert not pattern_matches_py("/a/*/c", "/a/x/d")
    assert pattern_matches_py("/x$", "/x") and not pattern_matches_py("/x$", "/xy")
    assert pattern_matches_py("/*", "/anything")


def test_admit_under_budget_shortcut_matches_naive(spark):
    """Hosts whose pending count fits the budget skip the rank entirely
    (no single-task hot-host sort) — result must equal the naive window
    across a mix of under- and over-budget hosts."""
    from pyspark.sql import Window

    rows = (
        [(f"https://big.local/{i:05d}", "big.local", i % 3, 5000) for i in range(400)]
        + [(f"https://tight.local/{i:05d}", "tight.local", i % 3, 7) for i in range(60)]
    )
    df = spark.createDataFrame(
        rows, "url string, host string, discovered_wave int, budget int"
    )
    got = admit_per_host(df, "budget", n_salts=4).select("url", "admitted")
    w = Window.partitionBy("host").orderBy("discovered_wave", "url")
    want = df.withColumn(
        "admitted", F.row_number().over(w) <= F.col("budget")
    ).select("url", "admitted")
    g = {r.url: r.admitted for r in got.collect()}
    e = {r.url: r.admitted for r in want.collect()}
    assert g == e
    assert all(g[u] for u in g if u.startswith("https://big"))


def test_embedding_cosine_rounds_before_threshold(spark):
    """The near-dup contract is round(sim, 6) >= threshold — a raw cosine
    of 0.3499996 IS a 0.35-threshold pair. The DuckDB oracle mirrors this
    (round inside its WHERE); the sf1.0 exercise caught the drift where
    the oracle thresholded the unrounded value and dropped the pair."""
    import numpy as np

    from crawler_spark.operators.dedup_docs import embedding_near_dups

    c = 0.3499996  # rounds UP to the threshold
    s = float(np.sqrt(1 - c * c))
    rows = [
        (1, [1.0] + [0.0] * 63, 7),
        (2, [c, s] + [0.0] * 62, 7),
        (3, [0.0, 0.0, 1.0] + [0.0] * 61, 7),  # orthogonal to both -> no pair
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = embedding_near_dups(e, threshold=0.35).collect()
    assert [(r.id_a, r.id_b, r.cos_sim) for r in out] == [(1, 2, 0.35)]


def test_asof_join_edge_semantics(spark):
    """Pin the as-of contract on handcrafted rows: strict excludes a
    right row at the exact same timestamp; inclusive takes it; ties
    among right rows at the same ts resolve to the greatest tiebreak;
    a left row before any right row gets nulls."""
    import datetime as dt

    from crawler_spark.operators.temporal import asof_join

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, ts(5)), (2, ts(10)), (3, ts(1))], "lid int, ts timestamp"
    ).withColumn("user", F.lit(7))
    # rights: two at ts=5 (tie), one at ts=9
    right = spark.createDataFrame(
        [(100, ts(5)), (101, ts(5)), (102, ts(9))], "rid int, ts timestamp"
    ).withColumn("user", F.lit(7))

    strict = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(left, right, on=["user"], payload=["rid"]).collect()
    }
    # lid=1 at ts=5: same-ts rights EXCLUDED under strict -> no prior
    assert strict == {1: None, 2: 102, 3: None}

    incl = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, on=["user"], payload=["rid"], strict=False
        ).collect()
    }
    # lid=1 now matches the ts=5 pair; tie -> greatest rid (101)
    assert incl == {1: 101, 2: 102, 3: None}


def test_interval_join_boundaries(spark):
    """[start, end) boundaries exact in integer micros: a point at
    start matches, a point at start+width does not."""
    import datetime as dt

    from crawler_spark.operators.temporal import interval_join

    def ts(s, us=0):
        return dt.datetime(2024, 1, 1, 0, 0, s, us)

    points = spark.createDataFrame(
        [(1, ts(10)), (2, ts(11, 999999)), (3, ts(12)), (4, ts(9, 999999))],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame([(100, ts(10))], "iid int, ts timestamp")
    got = sorted(
        r["pid"]
        for r in interval_join(
            points, intervals, point_ts="ts", start_ts="ts",
            width_us=2_000_000, point_cols=["pid"], interval_cols=["iid"],
        ).collect()
    )
    assert got == [1, 2]  # 10.000000 and 11.999999 in; 12.000000 and 9.999999 out


def test_asof_join_tolerance(spark):
    """tolerance_us (merge_asof parity): a prior match older than the
    tolerance becomes a NON-match (nulls), and asof_ts_us reports the
    matched right timestamp when within tolerance."""
    import datetime as dt

    from crawler_spark.operators.temporal import asof_join

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, ts(10)), (2, ts(30))], "lid int, ts timestamp"
    ).withColumn("user", F.lit(7))
    right = spark.createDataFrame(
        [(100, ts(8))], "rid int, ts timestamp"
    ).withColumn("user", F.lit(7))

    rows = {
        r["lid"]: (r["asof_rid"], r["asof_ts_us"])
        for r in asof_join(
            left, right, on=["user"], payload=["rid"],
            tolerance_us=5_000_000,
        ).collect()
    }
    assert rows[1][0] == 100 and rows[1][1] is not None  # 2s gap, in
    assert rows[2] == (None, None)                       # 22s gap, out


def test_simhash_pairs_pigeonhole_exact(spark):
    """Byte-banded SimHash pairing vs brute force: on random 32-bit
    signatures the operator must return EXACTLY the hamming<=3 pairs
    (banding is pigeonhole-complete for the radius; the bit_count(xor)
    filter kills band-collision false positives)."""
    import random

    from crawler_spark.operators.dedup_docs import simhash_candidate_pairs

    rng = random.Random(7)
    base = [rng.getrandbits(32) for _ in range(40)]
    sigs = []
    for i, s in enumerate(base):
        sigs.append((2 * i, s))
        # a planted neighbor at hamming 1-3 and a far sibling
        flips = rng.sample(range(32), rng.randint(1, 3))
        m = s
        for b in flips:
            m ^= 1 << b
        sigs.append((2 * i + 1, m))
    df = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_candidate_pairs(df, max_bucket=None).collect()
    }
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            a, b = sigs[i], sigs[j]
            h = bin(a[1] ^ b[1]).count("1")
            if h <= 3:
                lo, hi = min(a[0], b[0]), max(a[0], b[0])
                want.add((lo, hi, h))
    assert got == want and len(want) >= 40  # every planted neighbor found


def test_simhash_hot_band_cap(spark):
    """A degenerate band value (mass-identical signatures) past the cap
    must not enter the self-join; members still pair through nothing
    (all four bands hot) — zero pairs with the cap, quadratic without."""
    from crawler_spark.operators.dedup_docs import simhash_candidate_pairs

    n = 1200  # > SIMHASH_MAX_BUCKET
    df = spark.createDataFrame(
        [(i, 0x0F0F0F0F) for i in range(n)], "doc_id long, simhash long"
    )
    capped = simhash_candidate_pairs(df).count()
    assert capped == 0
    uncapped = simhash_candidate_pairs(
        df.limit(50), max_bucket=None
    ).count()
    assert uncapped == 50 * 49 // 2


def test_lsh_incremental_gate_flags_planted_dup(spark):
    """A new doc whose text duplicates an old doc must gate as a dup of
    that old doc; a unique new doc must pass. Asymmetric shape: matches
    only ever pair new-vs-old, never new-vs-new."""
    from crawler_spark.operators.dedup_docs import (
        lsh_incremental_matches, minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    old = spark.createDataFrame(
        [(1, base), (2, "completely different ancient corpus text about ships and harbors")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, base),  # exact dup of old doc 1
         (11, base + " tomorrow"),  # near dup of old doc 1
         (12, "a unique new document with novel words like zephyr quasar and marble"),
         (13, base)],  # second dup — must NOT match new doc 10, only old 1
        "doc_id long, text string",
    )
    hits = {
        r["doc_id"]: (r["dup_of"], r["est_jaccard"])
        for r in lsh_incremental_matches(
            minhash_signatures(new), minhash_signatures(old)
        ).collect()
    }
    assert hits[10] == (1, 1.0)
    assert 13 in hits and hits[13][0] == 1  # matched OLD 1, not new 10
    assert 12 not in hits
    if 11 in hits:  # near-dup may or may not clear 0.5 est; if it does, old 1
        assert hits[11][0] == 1


def test_cms_never_underestimates_and_collides_when_narrow(spark):
    """CountMin contract on a planted corpus: est_count >= true_count for
    every probed term (grading invariant), and with the heavy skew here
    the 4x512 sketch still returns exact counts for the heavy hitter."""
    import __spark_entry__ as E

    import pandas as pd

    rows = [(i, ("alpha " * 50) if i % 2 == 0 else ("beta gamma " * 10), "en", "s", 100)
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        out = E.queries()["doc_cms_heavy_hitters"](spark, tmp).toPandas()
    assert (out.est_count >= out.true_count).all()
    alpha = out[out.term == "alpha"].iloc[0]
    assert alpha.true_count == 50 * 20
