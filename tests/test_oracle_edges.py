"""Additional reference-semantics edge cases (oracle-level, no Spark)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cobweb_spark.config import CrawlConfig
from cobweb_spark.oracle import CrawlOracle, OracleDoc
from cobweb_spark.testkit import fixtures as fx
from cobweb_spark.urls import canonicalize, join_no_fragment

BASE = fx.SAMPLE_SITE_BASE


class TestHttpsAsHttpOff:
    def test_neither_form_queued(self, sample_site_corpus):
        # cobweb_crawler_spec.rb:80-86: with treat_https_as_http=false the
        # https link fails the (http-only) internal patterns, so NEITHER
        # form is queued
        cfg = CrawlConfig(treat_https_as_http=False, crawl_limit=1)
        r = CrawlOracle(sample_site_corpus, cfg).crawl(BASE)
        assert "https://localhost:3532/secure" not in r.seen
        assert "http://localhost:3532/secure" not in r.seen


class TestExternalOverride:
    def test_external_urls_override_internal(self):
        corpus = {
            "http://in.com/": OracleDoc(
                doc_id="http://in.com/",
                spans=[
                    ("a", "http://in.com/blog/a.html", None, 0),
                    ("a", "http://in.com/page.html", None, 1),
                ],
            ),
            "http://in.com/page.html": OracleDoc(
                doc_id="http://in.com/page.html", spans=[]
            ),
        }
        cfg = CrawlConfig(external_urls=["http://in.com/blog"])
        r = CrawlOracle(corpus, cfg).crawl("http://in.com/")
        assert "http://in.com/page.html" in r.seen
        assert "http://in.com/blog/a.html" not in r.seen


class TestSeedUrls:
    def test_seeds_enqueued_regardless_of_filters(self, sample_site_corpus):
        # README.textile:115: seed urls are queued regardless of any other
        # setting — even when they'd fail the internal filter
        cfg = CrawlConfig(seed_urls=["http://elsewhere.example.com/x"])
        r = CrawlOracle(sample_site_corpus, cfg).crawl(BASE)
        assert "http://elsewhere.example.com/x" in r.seen
        assert "http://elsewhere.example.com/x" in r.fetch_sequence
        # but its children (none; 404) never expand, and external links
        # from internal pages still rejected
        assert not any("themeforest" in u for u in r.seen)

    def test_seed_order_precedes_base(self, sample_site_corpus):
        cfg = CrawlConfig(
            seed_urls=["http://localhost:3532/more.html"]
        )
        r = CrawlOracle(sample_site_corpus, cfg).crawl(BASE)
        assert r.fetch_sequence[0] == "http://localhost:3532/more.html"
        assert r.fetch_sequence[1] == BASE


class TestFirstDiscoveryTieBreak:
    def test_earlier_parent_wins(self):
        corpus = {
            "http://s.com/": OracleDoc(
                doc_id="http://s.com/",
                spans=[
                    ("a", "http://s.com/a.html", None, 0),
                    ("a", "http://s.com/b.html", None, 1),
                ],
            ),
            "http://s.com/a.html": OracleDoc(
                doc_id="http://s.com/a.html",
                spans=[("a", "http://s.com/shared.html", None, 0)],
            ),
            "http://s.com/b.html": OracleDoc(
                doc_id="http://s.com/b.html",
                spans=[("a", "http://s.com/shared.html", None, 0)],
            ),
            "http://s.com/shared.html": OracleDoc(
                doc_id="http://s.com/shared.html", spans=[]
            ),
        }
        r = CrawlOracle(corpus, CrawlConfig()).crawl("http://s.com/")
        shared = [p for p in r.pages if p.url.endswith("shared.html")][0]
        assert shared.parent == "http://s.com/a.html"  # earlier fetch order

    def test_https_collapse_first_occurrence(self):
        # https and http forms of the same target in one page collapse to
        # the earlier position after normalization
        corpus = {
            "http://s.com/": OracleDoc(
                doc_id="http://s.com/",
                spans=[
                    ("a", "https://s.com/x.html", None, 0),
                    ("a", "http://s.com/x.html", None, 1),
                ],
            ),
            "http://s.com/x.html": OracleDoc(
                doc_id="http://s.com/x.html", spans=[]
            ),
        }
        r = CrawlOracle(corpus, CrawlConfig()).crawl("http://s.com/")
        assert r.fetch_sequence.count("http://s.com/x.html") == 1


class TestCanonicalizeProperties:
    @given(
        st.text(
            alphabet="abcdefghij/._-%34AB",
            min_size=0,
            max_size=30,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, path):
        url = "http://example.com/" + path
        once = canonicalize(url)
        assert canonicalize(once) == once

    @given(st.sampled_from(["http", "https"]), st.integers(1, 65535))
    @settings(max_examples=50, deadline=None)
    def test_default_port_only_stripped_for_scheme(self, scheme, port):
        url = f"{scheme}://h.com:{port}/p"
        out = canonicalize(url)
        default = 80 if scheme == "http" else 443
        if port == default:
            assert f":{port}" not in out
        else:
            assert f":{port}" in out

    @given(
        st.text(alphabet="abc/.-", min_size=0, max_size=20),
        st.text(alphabet="abc/.-#", min_size=0, max_size=20),
    )
    @settings(max_examples=200, deadline=None)
    def test_join_never_keeps_fragment(self, base_path, link):
        joined = join_no_fragment("http://x.com/" + base_path, link)
        assert joined is None or "#" not in joined
