"""Single-threaded pure-Python reference oracle.

Replays the reference crawler's algorithm exactly (deterministic
serialization per SURVEY.md §3.4) over an in-memory corpus, producing the
golden fetch order, seen-set, stats, edges and inbound-links index that the
Spark engine is asserted against in pytest.

The serialization contract: the reference's single-worker order is FIFO by
discovery (Resque list, ``lib/crawl_job.rb:112``), which equals BFS by
``(depth, discovery_order)``. The oracle implements the *wave model* (all
URLs admitted for a round are fetched before their children are considered)
— provably identical to FIFO order when no politeness budget is set,
because children always enter the queue after everything already queued.
With a per-host politeness budget the wave model *defines* the contract
(the reference has no standalone politeness).

Key reference behaviors replayed:

* link extraction order & uniq — ``lib/content_link_parser.rb:35-55``
* internal/external classification — ``lib/cobweb_links.rb:30-41``
* https→http normalization — ``lib/cobweb_crawler.rb:112-114``
* seen rejection (crawled ∪ queued) — ``lib/cobweb_crawler.rb:118-119``
* crawl_limit / crawl_limit_by_page — ``lib/crawl.rb:38-62,173-182``
* redirect chains + redirect_through — ``lib/cobweb.rb:188-207``
* stats — ``lib/stats.rb:53-156``
* robots precedence allow-then-disallow — ``lib/robots.rb:28-37``
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from .config import CrawlConfig
from .model import LINK_KIND_CATEGORIES
from .patterns import LinkClassifier, mime_matches
from .urls import canonicalize, host_of, is_link_loop, join_no_fragment


@dataclass
class OracleDoc:
    """One corpus row == one fetchable resource (canonical URL = doc_id)."""

    doc_id: str
    spans: list[tuple] = field(default_factory=list)  # (kind,text,media_ref,offset)
    status_code: int = 200
    mime_type: str = "text/html"
    character_set: str | None = None
    length: int = 0
    response_time: float = 0.0
    location: str | None = None


@dataclass
class FetchedPage:
    url: str
    base_url: str
    queued_url: str
    status_code: int
    mime_type: str
    length: int
    response_time: float
    text_content: bool
    redirect_through: list[str] | None
    error: str | None
    permitted: bool
    depth: int
    discovery_order: int
    fetch_order: int
    parent: str | None
    wave_id: int
    links: list[str] = field(default_factory=list)  # all_links output


@dataclass
class OracleResult:
    pages: list[FetchedPage]
    seen: set
    crawled: set
    queued_remaining: set
    edges: list[tuple]  # (src, dst) enqueue edges (navigation hash)
    inbound: dict  # normalized target -> set(srcs), store_inbound_links
    stats: dict

    @property
    def fetch_sequence(self) -> list[str]:
        return [p.queued_url for p in self.pages]


def extract_all_links(
    page_url: str, spans: list[tuple], kind_categories: dict | None = None
) -> list[str]:
    """``ContentLinkParser#all_links`` over pre-parsed spans.

    Replays ``lib/content_link_parser.rb:35-55``: per-category collection in
    (selector_rank, document_offset) order with per-category uniq, category
    flattening in category-rank order (links→images→related→scripts→styles
    by default; ``kind_categories`` carries additional_tags /
    ignore_default_tags overrides) with global uniq, absolutization against
    <base href> then the page URL, nil drop, repeated-segment loop
    rejection, http/https scheme filter.
    """
    kc = LINK_KIND_CATEGORIES if kind_categories is None else kind_categories
    cat_order = [
        cat
        for _crank, cat in sorted(
            {(crank, cat) for cats in kc.values() for (cat, crank, _s) in cats}
        )
    ]
    base = ""
    for kind, text, _media, _off in spans:
        if kind == "base" and text:
            base = text
            break

    per_cat: dict[str, list[str]] = {c: [] for c in cat_order}
    hits: dict[str, list[tuple]] = {c: [] for c in cat_order}
    for kind, text, media, off in spans:
        for cat, _crank, srank in kc.get(kind, ()):
            raw = text if text is not None else media
            if raw is None:
                continue
            hits[cat].append((srank, off, raw))
    for cat in cat_order:
        seen_raw = set()
        for _srank, _off, raw in sorted(hits[cat], key=lambda t: (t[0], t[1])):
            if raw not in seen_raw:
                seen_raw.add(raw)
                per_cat[cat].append(raw)

    flat: list[str] = []
    seen_raw = set()
    for cat in cat_order:
        for raw in per_cat[cat]:
            if raw not in seen_raw:
                seen_raw.add(raw)
                flat.append(raw)

    links = []
    for raw in flat:
        joined = join_no_fragment(page_url, join_no_fragment(base, raw))
        if joined is None:
            continue
        links.append(joined)
    links = [l for l in links if not is_link_loop(l)]
    links = [l for l in links if l.split(":")[0] in ("http", "https")]
    return links


class RobotsRules:
    """Per-(host, user_agent) allow/disallow lists with the reference's
    precedence (``lib/robots.rb:28-37``): first allow match wins, then
    first disallow match rejects, else allowed. Unknown host ⇒ allowed."""

    def __init__(self, rules: list[tuple]):
        # rules: (host, user_agent, rule, pattern, rank)
        self.by_host: dict[str, dict[str, dict[str, list[tuple]]]] = {}
        for host, ua, rule, pattern, rank in rules:
            self.by_host.setdefault(host, {}).setdefault(
                ua.lower(), {"allow": [], "disallow": []}
            )[rule].append((rank, pattern))

    def allowed(self, url: str, user_agent: str) -> bool:
        from .patterns import escape_pattern_for_regex
        import re
        from urllib.parse import urlsplit

        host = host_of(url)
        uas = self.by_host.get(host)
        if uas is None:
            return True
        params = uas.get(user_agent.lower()) or uas.get("*")
        if params is None:
            return True
        path = urlsplit(url).path
        for _rank, pattern in sorted(params["allow"]):
            if re.search(escape_pattern_for_regex(pattern), path):
                return True
        for _rank, pattern in sorted(params["disallow"]):
            if re.search(escape_pattern_for_regex(pattern), path):
                return False
        return True


class CrawlOracle:
    def __init__(
        self,
        corpus: dict[str, OracleDoc],
        config: CrawlConfig,
        robots: RobotsRules | None = None,
    ):
        self.corpus = corpus
        self.config = config
        self.robots = robots or RobotsRules([])

    # -- fetch with redirect following (lib/cobweb.rb:122-304) --------------
    def _fetch(self, queued_url: str) -> dict:
        cfg = self.config
        start = canonicalize(queued_url)
        cur = start
        chain = [start]
        doc = self.corpus.get(cur)
        hops_allowed = cfg.redirect_limit - 1 if cfg.redirect_limit else 0
        while (
            doc is not None
            and cfg.follow_redirects
            and doc.status_code is not None
            and 300 <= doc.status_code < 400
        ):
            target = join_no_fragment(cur, doc.location or "")
            target = canonicalize(target)
            chain.append(target)
            if len(chain) - 1 > hops_allowed:
                return {
                    "url": chain[-2] if len(chain) > 2 else chain[-1],
                    "base_url": start,
                    "status_code": 0,
                    "mime_type": "error/dnslookup",
                    "length": 0,
                    "response_time": 0.0,
                    "redirect_through": chain[:-1] if len(chain) > 2 else None,
                    "error": "Redirect Limit reached",
                    "spans": [],
                    "character_set": None,
                }
            cur = target
            doc = self.corpus.get(cur)
        if doc is None:
            # URL absent from corpus: static-file-server 404 (or socket
            # error when missing_status == 0, lib/cobweb.rb:270-284)
            status = cfg.missing_status
            mime = cfg.missing_mime if status != 0 else "error/dnslookup"
            return {
                "url": cur,
                "base_url": start,
                "status_code": status,
                "mime_type": mime,
                "length": 0,
                "response_time": 0.0,
                "redirect_through": chain if len(chain) > 1 else None,
                "error": "not in corpus" if status == 0 else None,
                "spans": [],
                "character_set": None,
            }
        return {
            "url": cur,
            "base_url": start,
            "status_code": doc.status_code,
            "mime_type": doc.mime_type,
            "length": doc.length,
            "response_time": doc.response_time,
            "redirect_through": chain if len(chain) > 1 else None,
            "error": None,
            "spans": doc.spans,
            "character_set": doc.character_set,
        }

    # -- main loop -----------------------------------------------------------
    def crawl(self, base_url: str | None) -> OracleResult:
        cfg = self.config
        classifier = cfg.classifier(base_url)
        valid_mime_re = cfg.valid_mime_re
        text_mime_re = cfg.text_mime_re
        kind_categories = cfg.kind_categories()

        # wave-0 frontier: seed_urls in rank order then base_url
        # (sadd order in lib/cobweb_crawler.rb:26 then :52)
        seeds: list[str] = []
        for s in cfg.seed_urls:
            if s not in seeds:
                seeds.append(s)
        if base_url is not None and base_url not in seeds:
            seeds.append(base_url)

        seen: set = set(seeds)
        crawled: set = set()
        # frontier entries: (depth, discovery_order, url, parent)
        frontier: list[tuple] = [(0, i, u, None) for i, u in enumerate(seeds)]
        next_order = len(seeds)
        fetch_order = 0
        pages_counted = 0  # crawl-limit counter (by-page aware)
        pages: list[FetchedPage] = []
        edges: list[tuple] = []
        inbound: dict = defaultdict(set)
        wave_id = 0

        while frontier and wave_id < cfg.max_waves:
            frontier.sort(key=lambda t: (t[0], t[1]))
            # politeness admission: per-host token budget per wave
            if cfg.host_budget is not None:
                taken_per_host: dict[str, int] = defaultdict(int)
                admitted, deferred = [], []
                for entry in frontier:
                    h = host_of(entry[2])
                    if taken_per_host[h] < cfg.host_budget:
                        taken_per_host[h] += 1
                        admitted.append(entry)
                    else:
                        deferred.append(entry)
            else:
                admitted, deferred = frontier, []

            new_links_this_wave: list[tuple] = []
            limit_hit = False
            for depth, order, url, parent in admitted:
                # crawl-limit gate before each fetch (lib/crawl.rb:69)
                if cfg.crawl_limit is not None and pages_counted >= int(
                    cfg.crawl_limit
                ):
                    limit_hit = True
                    break
                content = self._fetch(url)
                crawled.add(url)
                if (
                    fetch_order == 0
                    and cfg.first_page_redirect_internal
                    and content["redirect_through"]
                ):
                    # first fetched page redirected: widen internal_urls
                    # with the destination's scheme://host/* before any
                    # link selection (lib/crawl.rb:113,348-356;
                    # lib/crawl_helper.rb:54,201-209; default-on per
                    # lib/cobweb.rb:54). redirect_through.last ==
                    # content[:url], the final chain URL.
                    from urllib.parse import urlsplit

                    p = urlsplit(content["redirect_through"][-1])
                    classifier = cfg.classifier(
                        base_url,
                        extra_internal=[f"{p.scheme}://{p.hostname}/*"],
                    )
                if (
                    cfg.mark_redirect_final_crawled
                    and content["url"] is not None
                    and content["url"] != url
                ):
                    # redirect final URL also marked crawled
                    # (lib/crawl_helper.rb:35-39)
                    crawled.add(content["url"])
                    seen.add(content["url"])

                permitted = mime_matches(valid_mime_re, content["mime_type"])
                is_page = (
                    "text/html" in (content["mime_type"] or "")
                    if cfg.crawl_limit_by_page
                    else True
                )
                if is_page:
                    pages_counted += 1

                page = FetchedPage(
                    url=content["url"],
                    base_url=content["base_url"],
                    queued_url=url,
                    status_code=content["status_code"],
                    mime_type=content["mime_type"],
                    length=content["length"],
                    response_time=content["response_time"],
                    text_content=mime_matches(
                        text_mime_re, content["mime_type"]
                    ),
                    redirect_through=content["redirect_through"],
                    error=content["error"],
                    permitted=permitted,
                    depth=depth,
                    discovery_order=order,
                    fetch_order=fetch_order,
                    parent=parent,
                    wave_id=wave_id,
                )
                fetch_order += 1

                if permitted:
                    document_links = extract_all_links(
                        content["url"], content["spans"], kind_categories
                    )
                    # per-page uniq (lib/cobweb_crawler.rb:102)
                    document_links = list(dict.fromkeys(document_links))
                    page.links = document_links

                    if cfg.store_inbound_links:
                        for link in document_links:
                            inbound[canonicalize(link)].add(url)

                    selected = []
                    # selection self-gates expansion: a page whose queued
                    # URL is external (enqueued via crawl_linked_external)
                    # never passes internal?(url) for its own children —
                    # matching lib/cobweb_crawler.rb:108 exactly.
                    for link in document_links:
                        if classifier.internal(link) or (
                            cfg.crawl_linked_external
                            and classifier.internal(url)
                            and not classifier.matches_external(link)
                        ):
                            selected.append(link)
                    if cfg.treat_https_as_http:
                        selected = [
                            ("http" + l[5:]) if l.startswith("https") else l
                            for l in selected
                        ]
                    if cfg.obey_robots:
                        selected = [
                            l
                            for l in selected
                            if self.robots.allowed(l, cfg.user_agent)
                        ]
                    for link in selected:
                        if link and link not in seen:
                            seen.add(link)
                            new_links_this_wave.append(
                                (depth + 1, next_order, link, url)
                            )
                            next_order += 1
                            edges.append((url, link))
                pages.append(page)

            if limit_hit:
                frontier = []
                break
            frontier = deferred + new_links_this_wave
            wave_id += 1

        stats = self._stats([p for p in pages if p.permitted])
        queued_remaining = {e[2] for e in frontier}
        return OracleResult(
            pages=pages,
            seen=seen,
            crawled=crawled,
            queued_remaining=queued_remaining | {e[2] for e in []},
            edges=edges,
            inbound={k: set(v) for k, v in inbound.items()},
            stats=stats,
        )

    # -- statistics (lib/stats.rb:53-156) ------------------------------------
    @staticmethod
    def _stats(pages: list[FetchedPage]) -> dict:
        mime_counts: dict[str, int] = defaultdict(int)
        status_counts: dict[str, int] = defaultdict(int)
        s = {
            "page_count": 0,
            "asset_count": 0,
            "page_size": 0,
            "asset_size": 0,
            "total_redirects": 0,
            "total_length": 0,
            "crawl_counter": len(pages),
        }
        rts, lens = [], []
        for p in pages:
            mime_counts[p.mime_type] += 1
            status_counts[str(p.status_code)] += 1
            is_page = "text/html" in (p.mime_type or "") or (
                "application/xhtml+xml" in (p.mime_type or "")
            )
            if is_page:
                s["page_count"] += 1
                s["page_size"] += p.length
            else:
                s["asset_count"] += 1
                s["asset_size"] += p.length
            if p.redirect_through:
                s["total_redirects"] += len(p.redirect_through)
            s["total_length"] += p.length
            rts.append(p.response_time)
            lens.append(p.length)
        if pages:
            s["average_response_time"] = sum(rts) / len(rts)
            s["minimum_response_time"] = min(rts)
            s["maximum_response_time"] = max(rts)
            s["average_length"] = sum(lens) / len(lens)
            s["minimum_length"] = min(lens)
            s["maximum_length"] = max(lens)
        s["mime_counts"] = dict(mime_counts)
        s["status_counts"] = dict(status_counts)
        return s
