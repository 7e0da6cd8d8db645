"""Page parsing — the Arrow-vectorized replacement for spider callbacks.

The reference parses every response row-at-a-time in Python callbacks
(XPath via ``response.xpath``: ``sizebid_zhaobiao.py:43-50``,
``ahhyzb_zhaobiao.py:45-52``, ``zybtp_zhaobiao.py:44-51``,
``Henan_KaiFeng_ggzy_zhaobiao.py:46-53``; JSON via
``response.json()['data']['list']``: ``dz100_zhaobiao.py:45-58``).

Here parsing is two scalar pandas UDFs over Arrow batches — one page
per *row*, thousands of pages per *batch*, zero per-row Python
round-trips (BASELINE.json input_hint: "no per-row Python"):

- :func:`parse_list` — html/json bytes + parse_kind → array<struct>
  of advertised items, exploded downstream. This is the UDTF-shaped
  operator of SURVEY.md §2.3.
- :func:`extract_text` — detail html bytes → extracted text, the
  byte-identity surface (input_hint per-row invariant).

The HTML engine is a dependency-free mini-DOM built on stdlib
``html.parser`` (lxml is not in this image). Selector semantics mimic
the reference XPaths exactly: child-axis vs descendant-axis is
preserved (e.g. ``./span/text()`` means *direct child* span — the span
inside the sibling ``<a>`` must NOT match).

Everything downstream of the UDF (trim, the full-width-colon split,
substring, URL absolutization, the proUrl conditional coalesce) is done
in Catalyst expressions, not in Python — see
:func:`crawler_spark.operators.parse_wave.parsed_items`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# mini-DOM
# ---------------------------------------------------------------------------

_VOID = {"br", "img", "hr", "meta", "link", "input", "area", "base", "col",
         "embed", "source", "track", "wbr"}


@dataclass
class Node:
    tag: str
    attrs: dict[str, str | None] = field(default_factory=dict)
    # children: Node for elements, str for text chunks, in document order
    children: list = field(default_factory=list)

    def child_elems(self, tag: str | None = None) -> list["Node"]:
        return [c for c in self.children
                if isinstance(c, Node) and (tag is None or c.tag == tag)]

    def own_text(self) -> str:
        """Concatenated text chunks that are DIRECT children (XPath ./text())."""
        return "".join(c for c in self.children if isinstance(c, str))

    def iter_elems(self) -> Iterable["Node"]:
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_elems()

    def iter_text(self) -> Iterable[str]:
        """All text chunks under this node, document order (XPath .//text())."""
        for c in self.children:
            if isinstance(c, str):
                yield c
            else:
                yield from c.iter_text()

    def find_all(self, tag: str, cls: str | None = None) -> list["Node"]:
        out = []
        for e in self.iter_elems():
            if e.tag == tag and (cls is None or e.attrs.get("class") == cls):
                out.append(e)
        return out


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs: list) -> None:
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list) -> None:
        self.stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag: str) -> None:
        # tolerate unbalanced markup: pop to the nearest matching open tag
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)


def build_tree(html: bytes | str) -> Node:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


# ---------------------------------------------------------------------------
# per-kind list parsers (selector semantics per reference file:line)
# ---------------------------------------------------------------------------

def _first(nodes: list, default=None):
    return nodes[0] if nodes else default


def _parse_sizebid(root: Node) -> list[dict]:
    # //div[@class="row"]; ./a/span/text(); ./span/text(); ./a/@href
    # (reference sizebid_zhaobiao.py:43-50)
    out = []
    for row in root.find_all("div", "row"):
        a = _first(row.child_elems("a"))
        if a is None:
            continue
        span_in_a = _first(a.child_elems("span"))
        out.append({
            "title": span_in_a.own_text() if span_in_a else None,
            "raw_time": (_first(row.child_elems("span")) or Node("span")).own_text(),
            "href": a.attrs.get("href"),
            "pro_url": None, "item_id": None, "origin_url": None,
        })
    return out


def _parse_ahhyzb(root: Node) -> list[dict]:
    # //li[@class="infos-item"]; ./a/@title; ./a/@href; ./span/text()
    # (reference ahhyzb_zhaobiao.py:45-52)
    out = []
    for li in root.find_all("li", "infos-item"):
        a = _first(li.child_elems("a"))
        if a is None:
            continue
        out.append({
            "title": a.attrs.get("title"),
            "raw_time": (_first(li.child_elems("span")) or Node("span")).own_text(),
            "href": a.attrs.get("href"),
            "pro_url": None, "item_id": None, "origin_url": None,
        })
    return out


def _parse_zybtp(root: Node) -> list[dict]:
    # //div[@class="List2 Top5"]/ul/li; ./a/text(); ./p/span[5]/text(); ./a/@href
    # (reference zybtp_zhaobiao.py:44-51)
    out = []
    for div in root.find_all("div", "List2 Top5"):
        for ul in div.child_elems("ul"):
            for li in ul.child_elems("li"):
                a = _first(li.child_elems("a"))
                if a is None:
                    continue
                p = _first(li.child_elems("p"))
                spans = p.child_elems("span") if p else []
                raw_time = spans[4].own_text() if len(spans) >= 5 else ""
                out.append({
                    "title": a.own_text(),
                    "raw_time": raw_time,
                    "href": a.attrs.get("href"),
                    "pro_url": None, "item_id": None, "origin_url": None,
                })
    return out


def _parse_ggzy(root: Node) -> list[dict]:
    # //div[@class="channel_list"]/ul/li; ./a/@title; ./a/@href; ./span/text()
    # (reference Henan_KaiFeng_ggzy_zhaobiao.py:46-53)
    out = []
    for div in root.find_all("div", "channel_list"):
        for ul in div.child_elems("ul"):
            for li in ul.child_elems("li"):
                a = _first(li.child_elems("a"))
                if a is None:
                    continue
                out.append({
                    "title": a.attrs.get("title"),
                    "raw_time": (_first(li.child_elems("span")) or Node("span")).own_text(),
                    "href": a.attrs.get("href"),
                    "pro_url": None, "item_id": None, "origin_url": None,
                })
    return out


def _parse_dz100(raw: bytes | str) -> list[dict]:
    # response.json()['data']['list']; node name/proStartTime/proUrl/id
    # (reference dz100_zhaobiao.py:45-58)
    if isinstance(raw, (bytes, bytearray)):
        raw = raw.decode("utf-8", errors="replace")
    try:
        doc = json.loads(raw)
    except ValueError:
        return []
    nodes = (doc.get("data") or {}).get("list") or []
    out = []
    for n in nodes:
        out.append({
            "title": n.get("name"),
            "raw_time": n.get("proStartTime"),
            "href": None,
            "pro_url": n.get("proUrl"),
            "item_id": n.get("id"),
            # origin_url is NOT read from the response: the reference
            # synthesizes it from an id template (dz100_zhaobiao.py:58);
            # the engine builds it in the driver from config
            # origin_url_template.
            "origin_url": None,
        })
    return out


_HTML_PARSERS = {
    "xpath_sizebid": _parse_sizebid,
    "xpath_ahhyzb": _parse_ahhyzb,
    "xpath_zybtp": _parse_zybtp,
    "xpath_ggzy": _parse_ggzy,
}

ITEM_STRUCT = T.StructType([
    T.StructField("title", T.StringType()),
    T.StructField("raw_time", T.StringType()),
    T.StructField("href", T.StringType()),
    T.StructField("pro_url", T.StringType()),
    T.StructField("item_id", T.LongType()),
    T.StructField("origin_url", T.StringType()),
])
ITEM_ARRAY = T.ArrayType(ITEM_STRUCT)


def parse_list_page(html: bytes | str | None, parse_kind: str) -> list[dict]:
    """Parse one list page (pure function; unit-testable without Spark)."""
    if html is None:
        return []
    if parse_kind == "json_dz100":
        return _parse_dz100(html)
    fn = _HTML_PARSERS.get(parse_kind)
    if fn is None:
        return []
    return fn(build_tree(html))


@F.pandas_udf(ITEM_ARRAY)
def parse_list(html: pd.Series, parse_kind: pd.Series) -> pd.Series:
    """Vectorized list-page parser: one Arrow batch of pages in, one
    array-of-item-structs column out; exploded by the caller."""
    return pd.Series(
        [parse_list_page(h, k) for h, k in zip(html, parse_kind)],
        dtype=object,
    )


# ---------------------------------------------------------------------------
# detail-page text extraction (the byte-identity surface)
# ---------------------------------------------------------------------------

def extract_text_page(html: bytes | str | None) -> str | None:
    """Extraction contract (stands in for the reference's external
    ``parse_content_detal``, call sites ``sizebid_zhaobiao.py:55`` etc.,
    whose implementation is unrecoverable — SURVEY.md §5.2):
    all text nodes under the first ``<div class="content">``, document
    order, each stripped, empties dropped, joined with newline."""
    if html is None:
        return None
    root = build_tree(html)
    div = _first(root.find_all("div", "content"))
    if div is None:
        return None
    parts = [t.strip() for t in div.iter_text()]
    return "\n".join(p for p in parts if p)


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return pd.Series([extract_text_page(h) for h in html], dtype=object)


# ---------------------------------------------------------------------------
# single-pass page enrichment (the wave loop's one heavy UDF)
# ---------------------------------------------------------------------------

ENRICH_STRUCT = T.StructType(
    [
        T.StructField("anns", ITEM_ARRAY),     # list pages: parsed items
        T.StructField("text", T.StringType()),  # detail pages: extracted text
    ]
)


@F.pandas_udf(ENRICH_STRUCT)
def enrich_page(
    html: pd.Series, kind: pd.Series, parse_kind: pd.Series
) -> pd.DataFrame:
    """Dispatch list-parse vs detail-extract per row in ONE Arrow pass —
    the wave loop touches each fetched page's html exactly once and
    checkpoints only the (much smaller) parse products, never the html.
    (Two separate ``when``-guarded UDF columns would evaluate both UDFs
    over every row: Catalyst does not short-circuit UDF branches.)"""
    anns: list = []
    texts: list = []
    for h, k, pk in zip(html, kind, parse_kind):
        if h is None:
            anns.append(None)
            texts.append(None)
        elif k == "list":
            anns.append(parse_list_page(h, pk))
            texts.append(None)
        else:
            anns.append(None)
            texts.append(extract_text_page(h))
    return pd.DataFrame({"anns": anns, "text": texts})
