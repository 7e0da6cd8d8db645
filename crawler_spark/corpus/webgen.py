"""Deterministic virtual web — the offline fetch corpus (FIXTURES.md §1).

The sandbox has no network, so "fetch" is an equi-join against a
``pages`` table shaped per BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

This module generates that table so that it *structurally mimics* the
five reference sites — the same node shapes the reference spiders'
XPaths select (SURVEY.md §2.1 O3/O5), including every edge the
reference code paths exercise:

- relative hrefs needing absolutization (``ahhyzb_zhaobiao.py:52``),
- a JSON API body ``{"data":{"list":[...]}}`` with null / empty /
  present ``proUrl`` (``dz100_zhaobiao.py:45-58``),
- the full-width-colon date field ``发布时间：YYYY-MM-DD HH:MM`` in the
  5th ``<span>`` (``zybtp_zhaobiao.py:50``),
- dead links (fetch-miss / errback path, ``sizebid_zhaobiao.py:56``),
- one detail URL cited by two list pages fetched in the same wave
  (within-wave duplicate),
- cross-page duplicate items (cross-wave dedup),
- a list page repeating the previous page's items (the
  "zero new items => stop paginating" condition),
- an empty list page (stop condition; the reference *crashes* here —
  unbound ``baseItem`` — a bug we do not reproduce),
- detail pages with leading/trailing whitespace, nested inline tags,
  ``<br/>``, and one empty-content page.

Everything is a pure function of ``(spec.seed, site, section, page,
slot)`` via blake2b — no RNG state — so the corpus can be generated
EITHER driver-side (pandas, for tests) or distributed (mapInPandas over
the (site, section, page) key space, for bench/scale) and the rows are
byte-identical both ways. At 10^10-URL scale only the distributed path
is viable; the key space is tiny relative to the rows it expands into,
which is exactly the shape Spark wants (narrow expansion, no shuffle).

Alongside the pages it emits *truth* records (what each list page says,
what each detail page's extracted text must be). The pure-Python oracle
crawler (``corpus/oracle.py``) consumes truth records WITHOUT parsing
HTML, so the engine's Arrow-UDF HTML parsing is verified against an
independent path (render vs parse).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from datetime import date, datetime, timedelta
from typing import Iterator, Mapping

import pandas as pd

from ..config import SITES, SiteConfig

EPOCH = datetime(2024, 10, 1, 0, 0, 0)

_ADJ = ["市政", "城区", "园区", "乡村", "高新", "滨河", "东部", "西部", "中心", "开发区"]
_NOUN = ["道路改造", "污水处理", "学校扩建", "医院设备", "桥梁加固", "绿化养护",
         "管网铺设", "安置房建设", "照明提升", "河道治理"]
_KIND = ["招标公告", "竞争性磋商", "中标候选人公示", "采购公告", "资格预审公告"]
_SENT = ["受招标人委托", "现对本项目进行公开招标", "欢迎合格的投标人参加投标",
         "本项目已具备招标条件", "资金来源为财政资金", "投标截止时间详见招标文件",
         "请于规定时间内递交投标文件", "开标地点为公共资源交易中心",
         "联系方式详见招标文件", "特此公告"]


def _h(*parts: object) -> int:
    """Deterministic 63-bit hash of the key tuple (stable across runs)."""
    raw = "\x1f".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(), "big") & 0x7FFF_FFFF_FFFF_FFFF


@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    items_per_page: int = 8
    default_pages: int = 6
    # per "source#sec" overrides of list-page count
    pages_per_section: Mapping[str, int] = field(default_factory=dict)
    miss_every: int = 17       # ~1/17 of items link to a nonexistent page
    empty_last_page_sources: tuple[str, ...] = ("m.sizebid-test.local",)
    detail_chunks_min: int = 3   # detail page size: n = min + h % span
    detail_chunks_span: int = 5  # (bench uses fatter pages)

    def n_pages(self, source: str, sec: int) -> int:
        return self.pages_per_section.get(f"{source}#{sec}", self.default_pages)


# spec presets ---------------------------------------------------------------

def test_spec() -> CorpusSpec:
    """Small corpus for pytest: exercises every edge, ~300 pages."""
    return CorpusSpec(
        pages_per_section={
            "jypt.ahhyzb-test.local#0": 20,   # > max_page=10 → page-budget stop
            "ggzy.pds-test.local#1": 5,       # pages ≥3 repeat page 2 → no-new stop
        },
    )


def bench_spec(scale: int = 1) -> CorpusSpec:
    """Bench corpus: one deliberately skewed host holds ~80% of the URLs
    (host-skew / salting test per FIXTURES.md §1)."""
    return CorpusSpec(
        items_per_page=20,
        default_pages=40 * scale,
        pages_per_section={
            "jypt.ahhyzb-test.local#0": 640 * scale,  # the skew host
        },
        empty_last_page_sources=(),
    )


def bench_sites(
    n_hosts: int = 8,
    sections: int = 2000,
    skew: float = 0.8,
    crawl_delay: float = 0.001,
    max_page: int = 2,
) -> tuple[SiteConfig, ...]:
    """Synthetic bench site set for THROUGHPUT runs: many parallel seed
    sections so the frontier gets wide in one wave (pagination chains
    are inherently sequential — wave-throughput needs breadth). Host 0
    carries ``skew`` of all sections (the politeness-window and
    fetch-join skew case); parse kinds cycle through all five reference
    shapes so the Arrow parsers all run. Tiny crawl_delay = politeness
    effectively open, measuring machine throughput, not courtesy."""
    kinds = ["xpath_sizebid", "xpath_ahhyzb", "json_dz100", "xpath_zybtp", "xpath_ggzy"]
    skew_sections = int(sections * skew)
    rest = sections - skew_sections
    per_other = max(1, rest // max(1, n_hosts - 1))
    sites = []
    for h in range(n_hosts):
        host = f"bench{h}.local"
        kind = kinds[h % len(kinds)]
        n_sec = skew_sections if h == 0 else per_other
        tpls = tuple(
            f"https://{host}/s{j}/{{page}}.html" for j in range(n_sec)
        )
        base = (
            f"https://{host}/api/bid/detail?id={{id}}"
            if kind == "json_dz100"
            else f"https://{host}"
        )
        sites.append(
            SiteConfig(
                source=host, site_name=f"bench{h}", province="全国", city="",
                county="", seed_templates=tpls, contents_base_url=base,
                parse_kind=kind, max_page=max_page, crawl_delay=crawl_delay,
            )
        )
    return tuple(sites)


# truth records --------------------------------------------------------------

@dataclass(frozen=True)
class ItemTruth:
    item_id: int
    title: str          # post-strip (what extraction must yield)
    publish_time: str   # ISO date YYYY-MM-DD (post string-ops)
    url: str            # final absolute detail URL (post absolutize/coalesce)
    origin_url: str | None
    is_miss: bool       # detail URL absent from pages (dead link)


def _site_idx(site: SiteConfig) -> int:
    for i, s in enumerate(SITES):
        if s.source == site.source:
            return i
    # synthetic bench hosts: stable small index derived from the name
    return 5 + (_h("siteidx", site.source) % 50)


def _detail_id(site: SiteConfig, sec: int, page: int, slot: int) -> int:
    src_i = _site_idx(site)
    # Host A: even pages reuse the previous page's id at slot 3
    # (cross-wave duplicate item → dedup gate must drop it).
    if site.parse_kind == "xpath_sizebid" and page % 2 == 0 and slot == 3:
        page = page - 1
    # Host E section gzbgg: pages ≥3 repeat page 2 entirely
    # ("zero new items" pagination stop).
    if site.parse_kind == "xpath_ggzy" and sec == 1 and page >= 3:
        page = 2
    # Host D: section hcggg page 1 slot 0 shares gcggg's item
    # (within-wave duplicate across two list pages of the same wave).
    if site.parse_kind == "xpath_zybtp" and sec == 1 and page == 1 and slot == 0:
        sec = 0
    return src_i * 100_000_000 + sec * 1_000_000 + page * 1_000 + slot


def _title(spec: CorpusSpec, item_id: int) -> str:
    h = _h(spec.seed, "title", item_id)
    return (
        _ADJ[h % len(_ADJ)]
        + _NOUN[(h >> 8) % len(_NOUN)]
        + "项目"
        + _KIND[(h >> 16) % len(_KIND)]
        + f"[{item_id}]"
    )


def _pub_date(spec: CorpusSpec, item_id: int) -> date:
    return date(2024, 6, 1) + timedelta(days=_h(spec.seed, "date", item_id) % 120)


def _detail_url(site: SiteConfig, item_id: int, pro: bool = False) -> str:
    base = f"https://{site.source}"
    k = site.parse_kind
    if k == "xpath_sizebid":
        return f"{base}/detail/{item_id}.html"
    if k == "xpath_ahhyzb":
        return f"{base}/d/{item_id}.html"
    if k == "json_dz100":
        if pro:
            return f"{base}/api/bid/detail?id={item_id}&src=pro"
        return f"{base}/api/bid/detail?id={item_id}"
    if k == "xpath_zybtp":
        return f"{base}/tpgg/{item_id}.jhtml"
    if k == "xpath_ggzy":
        return f"{base}/c/{item_id}.jhtml"
    raise ValueError(k)


def list_items(spec: CorpusSpec, site: SiteConfig, sec: int, page: int) -> list[ItemTruth]:
    """Truth for one list page: the items it advertises."""
    if (
        site.source in spec.empty_last_page_sources
        and page == spec.n_pages(site.source, sec)
    ):
        return []  # empty list page edge (stop condition c)
    items: list[ItemTruth] = []
    for slot in range(spec.items_per_page):
        item_id = _detail_id(site, sec, page, slot)
        is_miss = _h(spec.seed, "miss", item_id) % spec.miss_every == 0
        pro = site.parse_kind == "json_dz100" and slot % 3 == 0
        # dz100 origin_url is synthesized from an id TEMPLATE by the
        # spider (reference dz100_zhaobiao.py:58) — it is crawl config,
        # not response data, so the truth mirrors the config template.
        origin = (
            site.origin_url_template.format(id=item_id)
            if site.origin_url_template
            else None
        )
        items.append(
            ItemTruth(
                item_id=item_id,
                title=_title(spec, item_id),
                publish_time=_pub_date(spec, item_id).isoformat(),
                url=_detail_url(site, item_id, pro=pro),
                origin_url=origin,
                is_miss=is_miss,
            )
        )
    return items


def list_page_url(site: SiteConfig, sec: int, page: int) -> str:
    return site.seed_templates[sec].format(page=page)


# HTML / JSON rendering ------------------------------------------------------

def _render_list_html(spec: CorpusSpec, site: SiteConfig, sec: int, page: int,
                      items: list[ItemTruth]) -> bytes:
    k = site.parse_kind
    rows: list[str] = []
    for it in items:
        href = it.url[len(f"https://{site.source}"):]  # relative form
        d = it.publish_time
        # raw title as written into HTML: padded with whitespace on a
        # deterministic subset of items (strip edge, reference O6)
        t = it.title if _h(spec.seed, "pad", it.item_id) % 3 else f"  {it.title}  "
        if k == "xpath_sizebid":
            rows.append(
                f'<div class="row"><a href="{href}"><span>{t}</span></a>'
                f"<span>{d}</span></div>"
            )
        elif k == "xpath_ahhyzb":
            rows.append(
                f'<li class="infos-item"><a title="{t}" href="{href}"></a>'
                f"<span>{d}</span></li>"
            )
        elif k == "xpath_zybtp":
            rows.append(
                f'<li><a href="{href}">{t}</a><p><span>浏览</span><span>12</span>'
                f"<span>来源</span><span>本网</span>"
                f"<span>发布时间：{d} 10:30</span></p></li>"
            )
        elif k == "xpath_ggzy":
            rows.append(
                f'<li><a title="{t}" href="{href}"></a><span>{d}</span></li>'
            )
        else:
            raise ValueError(k)
    body = "\n".join(rows)
    if k == "xpath_sizebid":
        doc = f'<html><body><div class="container">\n{body}\n</div></body></html>'
    elif k == "xpath_ahhyzb":
        doc = f'<html><body><ul class="infos">\n{body}\n</ul></body></html>'
    elif k == "xpath_zybtp":
        doc = f'<html><body><div class="List2 Top5"><ul>\n{body}\n</ul></div></body></html>'
    else:  # xpath_ggzy
        doc = f'<html><body><div class="channel_list"><ul>\n{body}\n</ul></div></body></html>'
    return doc.encode("utf-8")


def _render_list_json(site: SiteConfig, items: list[ItemTruth]) -> bytes:
    nodes = []
    for i, it in enumerate(items):
        pro = it.url.endswith("&src=pro")
        nodes.append(
            {
                "name": it.title,
                "proStartTime": f"{it.publish_time}T09:30:00",
                # slot%3: 0 → real proUrl, 1 → empty string, 2 → null
                # (conditional-coalesce edge, dz100_zhaobiao.py:53-56)
                "proUrl": it.url if pro else ("" if i % 3 == 1 else None),
                "id": it.item_id,
            }
        )
    return json.dumps({"data": {"list": nodes}}, ensure_ascii=False).encode("utf-8")


def detail_chunks(spec: CorpusSpec, item_id: int) -> list[str]:
    """Logical text nodes of the detail page, in document order.
    Extraction contract: strip each chunk, drop empties, join with \\n."""
    if _h(spec.seed, "empty", item_id) % 19 == 0:
        return []  # empty-content page edge
    n = spec.detail_chunks_min + _h(spec.seed, "nchunk", item_id) % spec.detail_chunks_span
    out = []
    for i in range(n):
        h = _h(spec.seed, "chunk", item_id, i)
        out.append(_SENT[h % len(_SENT)] + "，编号" + str(item_id % 10_000) + "。")
    return out


def detail_text(spec: CorpusSpec, item_id: int) -> str:
    return "\n".join(c.strip() for c in detail_chunks(spec, item_id) if c.strip())


def _render_detail_html(spec: CorpusSpec, item_id: int) -> bytes:
    chunks = detail_chunks(spec, item_id)
    paras: list[str] = []
    for i, c in enumerate(chunks):
        style = _h(spec.seed, "style", item_id, i) % 4
        if style == 0:
            paras.append(f"<p>{c}</p>")
        elif style == 1:
            paras.append(f"<p>  {c}\t</p>")  # whitespace edge
        elif style == 2 and len(c) > 8:
            paras.append(f"<p>{c[:4]}<b>{c[4:8]}</b>{c[8:]}</p>")  # nested tag
        else:
            mid = len(c) // 2
            paras.append(f"<p>{c[:mid]}<br/>{c[mid:]}</p>")  # <br/> edge
    body = "".join(paras)
    return (
        f'<html><body><h1>公告详情</h1><div class="content">{body}</div>'
        f"<div class=\"footer\">版权所有</div></body></html>"
    ).encode("utf-8")


def _detail_truth_text(spec: CorpusSpec, item_id: int) -> str:
    """Golden text for the rendered page — accounts for the rendering
    styles above splitting chunks into multiple DOM text nodes."""
    chunks = detail_chunks(spec, item_id)
    nodes: list[str] = []
    for i, c in enumerate(chunks):
        style = _h(spec.seed, "style", item_id, i) % 4
        if style == 0:
            nodes.append(c)
        elif style == 1:
            nodes.append(f"  {c}\t")
        elif style == 2 and len(c) > 8:
            nodes.extend([c[:4], c[4:8], c[8:]])
        else:
            mid = len(c) // 2
            nodes.extend([c[:mid], c[mid:]])
    return "\n".join(n.strip() for n in nodes if n.strip())


def _warc_ts(url: str) -> datetime:
    return EPOCH + timedelta(seconds=_h("warc", url) % (30 * 86400))


# page-row generation --------------------------------------------------------

def section_keys(spec: CorpusSpec, sites: tuple[SiteConfig, ...] = SITES) -> list[tuple[str, int, int]]:
    """The (source, sec, page) key space the corpus expands from."""
    keys = []
    for site in sites:
        for sec in range(len(site.seed_templates)):
            for page in range(1, spec.n_pages(site.source, sec) + 1):
                keys.append((site.source, sec, page))
    return keys


def rows_for_key(spec: CorpusSpec, site: SiteConfig, sec: int, page: int) -> Iterator[dict]:
    """All pages rows stemming from one list-page key: the list page
    itself plus the detail pages of its non-miss items. Pure function of
    the key — safe to run on any executor."""
    items = list_items(spec, site, sec, page)
    lurl = list_page_url(site, sec, page)
    html = (
        _render_list_json(site, items)
        if site.parse_kind == "json_dz100"
        else _render_list_html(spec, site, sec, page, items)
    )
    yield {
        "url": lurl,
        "warc_ts": _warc_ts(lurl),
        "html": html,
        "text": None,
        "lang": "zh",
    }
    for it in items:
        if it.is_miss:
            continue
        yield {
            "url": it.url,
            "warc_ts": _warc_ts(it.url),
            "html": _render_detail_html(spec, it.item_id),
            "text": _detail_truth_text(spec, it.item_id),
            "lang": "zh",
        }


def corpus_pandas(spec: CorpusSpec, sites: tuple[SiteConfig, ...] = SITES) -> pd.DataFrame:
    """Driver-side corpus (tests). Deduped on url (shared items render
    identical rows from multiple keys)."""
    rows: dict[str, dict] = {}
    for source, sec, page in section_keys(spec, sites):
        site = next(s for s in sites if s.source == source)
        for r in rows_for_key(spec, site, sec, page):
            rows.setdefault(r["url"], r)
    df = pd.DataFrame(list(rows.values()), columns=["url", "warc_ts", "html", "text", "lang"])
    return df.sort_values("url").reset_index(drop=True)


def corpus_df(spark, spec: CorpusSpec, sites: tuple[SiteConfig, ...] = SITES,
              parallelism: int | None = None):
    """Distributed corpus generation: the (source, sec, page) key table is
    tiny; each key expands to 1+items_per_page rows inside mapInPandas on
    executors (narrow, no shuffle until the final url-dedup)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    site_by_source = {s.source: s for s in sites}
    keys = section_keys(spec, sites)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for source, sec, page in zip(b["source"], b["sec"], b["page"]):
                site = site_by_source[source]
                out.extend(rows_for_key(spec, site, int(sec), int(page)))
            if out:
                yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    n = parallelism or spark.sparkContext.defaultParallelism
    kdf = spark.createDataFrame(keys, "source string, sec int, page int").repartition(n)
    # within-corpus duplicate urls (shared items) render identically from
    # every citing key, so dropDuplicates is safe
    return kdf.mapInPandas(gen, schema).dropDuplicates(["url"])
