"""Pure-Python oracle crawler — the reference-semantics golden path.

Re-executes the crawl single-threaded over the generator's *truth*
records (NOT over HTML — rendering and parsing are verified against
each other by the engine tests, SURVEY.md §5.2): same wave semantics as
``engine/driver.py`` (see the WAVE SEMANTICS contract there), same
canonicalization, same politeness budgets, same pagination stops.

It produces golden:
- ``items``   — (url, source, title, publish_time, origin_url,
  province/city/county/site_name, text, wave),
- ``pops``    — deterministic pop order (pop_seq, wave, url),
- ``seen``    — the final scheduled-URL set (canonical),
- ``errors``  — (url, kind, wave, status).

The crawl-equivalence tests assert the Spark engine reproduces all
four bit-for-bit. No Spark, no pandas: dicts + sorted() only, so a bug
shared between engine and oracle would have to be a spec bug, not an
implementation artifact.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..canonical import canonicalize_url, host_of_py
from ..config import SITES, SiteConfig
from ..operators.robots import robots_allowed_py
from . import webgen as wg


@dataclass
class OracleResult:
    items: list[dict] = field(default_factory=list)
    pops: list[tuple[int, int, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    errors: list[dict] = field(default_factory=list)
    waves: int = 0


def _corpus_urls(spec: wg.CorpusSpec, sites: tuple[SiteConfig, ...]) -> dict[str, int | None]:
    """url -> item_id for detail pages (None for list pages)."""
    out: dict[str, int | None] = {}
    for source, sec, page in wg.section_keys(spec, sites):
        site = next(s for s in sites if s.source == source)
        out[wg.list_page_url(site, sec, page)] = None
        for it in wg.list_items(spec, site, sec, page):
            if not it.is_miss:
                out[it.url] = it.item_id
    return out


def oracle_crawl(
    spec: wg.CorpusSpec,
    sites: tuple[SiteConfig, ...] = SITES,
    wave_seconds: float = 8.0,
    max_waves: int = 200,
    obey_robots: bool = False,
    robots_rules: list[dict] | None = None,
) -> OracleResult:
    site_by_source = {s.source: s for s in sites}
    corpus = _corpus_urls(spec, sites)
    # truth lookup: list url -> (site, sec, page)
    list_key: dict[str, tuple[SiteConfig, int, int]] = {}
    for source, sec, page in wg.section_keys(spec, sites):
        site = site_by_source[source]
        list_key[wg.list_page_url(site, sec, page)] = (site, sec, page)
    # beyond-corpus list pages (requested but never generated) are misses;
    # resolve their (site, sec) for bookkeeping via template matching.

    res = OracleResult()
    # frontier rows: dicts
    frontier: list[dict] = []
    for s in sites:
        for tpl in s.seed_templates:
            url = tpl.format(page=1)
            frontier.append(
                {"url": url, "canon": canonicalize_url(url), "host": host_of_py(url),
                 "source": s.source, "kind": "list", "page": 1, "tpl": tpl,
                 "discovered_wave": 0, "title": None, "publish_time": None,
                 "origin_url": None}
            )
    res.seen = {r["canon"] for r in frontier}

    wave = 0
    pop_seq = 0
    while frontier and wave < max_waves:
        wave += 1
        # robots gate
        if obey_robots and robots_rules:
            denied = [r for r in frontier
                      if not robots_allowed_py(robots_rules, r["host"], r["url"])]
            for r in denied:
                res.errors.append({"url": r["url"], "kind": r["kind"],
                                   "wave": wave, "status": "robots"})
            frontier = [r for r in frontier
                        if robots_allowed_py(robots_rules, r["host"], r["url"])]
            # one override per host; max = politest (mirrors apply_robots'
            # aggregation of duplicate '/' rules)
            delay_over: dict[str, float] = {}
            for r in robots_rules:
                if r["path_prefix"] == "/" and r.get("crawl_delay"):
                    h = r["host"]
                    delay_over[h] = max(delay_over.get(h, 0.0), r["crawl_delay"])
        else:
            delay_over = {}

        # politeness admission: first B per host by (discovered_wave, url)
        admitted: list[dict] = []
        deferred: list[dict] = []
        by_host: dict[str, list[dict]] = {}
        for r in frontier:
            by_host.setdefault(r["host"], []).append(r)
        for host, rows in by_host.items():
            cfg = site_by_source[rows[0]["source"]]
            delay = delay_over.get(host, cfg.crawl_delay)
            budget = max(1, math.floor(wave_seconds / delay))
            rows.sort(key=lambda r: (r["discovered_wave"], r["url"]))
            admitted.extend(rows[:budget])
            deferred.extend(rows[budget:])

        # pop order
        for r in sorted(admitted, key=lambda r: (r["host"], r["discovered_wave"], r["url"])):
            pop_seq += 1
            res.pops.append((pop_seq, wave, r["url"]))

        # fetch + parse
        candidates: list[dict] = []        # detail candidates w/ parent
        page_stats: list[dict] = []        # per fetched list page
        for r in admitted:
            if r["url"] not in corpus:
                res.errors.append({"url": r["url"], "kind": r["kind"],
                                   "wave": wave, "status": "miss"})
                continue
            if r["kind"] == "list":
                site, sec, page = list_key[r["url"]]
                truth = wg.list_items(spec, site, sec, page)
                for it in truth:
                    candidates.append(
                        {"parent_url": r["url"], "url": it.url,
                         "canon": canonicalize_url(it.url),
                         "host": host_of_py(it.url), "source": r["source"],
                         "title": it.title, "publish_time": it.publish_time,
                         "origin_url": it.origin_url}
                    )
                page_stats.append({"parent_url": r["url"], "source": r["source"],
                                   "page": page, "tpl": r["tpl"],
                                   "n_items": len(truth)})
            else:
                cfg = site_by_source[r["source"]]
                item_id = corpus[r["url"]]
                res.items.append(
                    {"url": r["url"], "source": r["source"], "title": r["title"],
                     "publish_time": r["publish_time"],
                     "origin_url": r["origin_url"], "province": cfg.province,
                     "city": cfg.city, "county": cfg.county,
                     "site_name": cfg.site_name,
                     "text": wg._detail_truth_text(spec, item_id), "wave": wave}
                )

        # dedup gate vs seen-at-wave-start
        fresh = [c for c in candidates if c["canon"] not in res.seen]
        new_per_parent: dict[str, int] = {}
        for c in fresh:
            new_per_parent[c["parent_url"]] = new_per_parent.get(c["parent_url"], 0) + 1
        # within-wave collapse — deterministic representative per canon:
        # min by (parent_url, url, publish_time, title, origin_url) with
        # None smallest, mirroring the engine's struct-min (Spark struct
        # ordering is field-by-field with nulls first; url_hash/host/
        # source are functions of url so they never break a tie).
        def _rep_key(c: dict):
            def k(x):
                return (x is not None, x if x is not None else "")

            return (c["parent_url"], c["url"], k(c["publish_time"]),
                    k(c["title"]), k(c["origin_url"]))

        new_detail: dict[str, dict] = {}
        for c in fresh:
            cur = new_detail.get(c["canon"])
            if cur is None or _rep_key(c) < _rep_key(cur):
                new_detail[c["canon"]] = c

        # pagination
        next_pages: list[dict] = []
        for ps in page_stats:
            cfg = site_by_source[ps["source"]]
            if (ps["n_items"] > 0 and new_per_parent.get(ps["parent_url"], 0) > 0
                    and ps["page"] < cfg.max_page):
                url = ps["tpl"].format(page=ps["page"] + 1)
                next_pages.append(
                    {"url": url, "canon": canonicalize_url(url),
                     "host": host_of_py(url), "source": ps["source"],
                     "kind": "list", "page": ps["page"] + 1, "tpl": ps["tpl"],
                     "discovered_wave": wave, "title": None,
                     "publish_time": None, "origin_url": None}
                )

        new_rows: list[dict] = []
        for c in new_detail.values():
            new_rows.append(
                {"url": c["url"], "canon": c["canon"], "host": c["host"],
                 "source": c["source"], "kind": "detail", "page": None,
                 "tpl": None, "discovered_wave": wave, "title": c["title"],
                 "publish_time": c["publish_time"],
                 "origin_url": c["origin_url"]}
            )
        for p in next_pages:
            if p["canon"] not in res.seen:
                new_rows.append(p)

        for r in new_rows:
            res.seen.add(r["canon"])
        frontier = deferred + new_rows

    res.waves = wave
    return res
