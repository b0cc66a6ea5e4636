"""Unit tests: URL canonicalization, joining, loop filters, patterns.

Goldens from the reference specs:
  spec/cobweb/cobweb_spec.rb:39-82   (escape_pattern_for_regex)
  spec/cobweb/cobweb_links_spec.rb   (internal/external semantics)
  spec/cobweb/content_link_parser_spec.rb:116-121 (loop filter)
"""

from cobweb_spark.patterns import (
    LinkClassifier,
    compile_mime_patterns,
    escape_pattern_for_regex,
    mime_matches,
)
from cobweb_spark.urls import (
    canonicalize,
    default_internal_patterns,
    host_of,
    is_link_loop,
    join_no_fragment,
)


class TestCanonicalize:
    def test_lowercase_scheme_host(self):
        assert canonicalize("HTTP://WWW.Example.COM/Path") == (
            "http://www.example.com/Path"
        )

    def test_default_port_stripped(self):
        assert canonicalize("http://example.com:80/") == "http://example.com/"
        assert canonicalize("https://example.com:443/") == "https://example.com/"
        assert (
            canonicalize("http://example.com:3532/x")
            == "http://example.com:3532/x"
        )

    def test_fragment_stripped(self):
        # lib/cobweb.rb:126 — fragment removed before fetch
        assert canonicalize("http://a.com/p#frag") == "http://a.com/p"

    def test_empty_path_gets_slash(self):
        assert canonicalize("http://a.com") == "http://a.com/"

    def test_dot_segments_removed(self):
        assert canonicalize("http://a.com/x/../y/./z") == "http://a.com/y/z"

    def test_percent_normalization(self):
        assert canonicalize("http://a.com/%7euser") == "http://a.com/~user"
        assert canonicalize("http://a.com/a%2fb") == "http://a.com/a%2Fb"

    def test_query_preserved(self):
        assert (
            canonicalize("http://a.com/p?q=1&r=2")
            == "http://a.com/p?q=1&r=2"
        )

    def test_stray_percent_escaped_idempotently(self):
        # round-2 hypothesis counterexample: '%%333' decoded the inner %33
        # on pass 1, minting a NEW escape ('%33') that pass 2 decoded again.
        # Fixed: bare '%' → '%25' in the same single scan.
        once = canonicalize("http://example.com/%%333")
        assert once == "http://example.com/%2533"
        assert canonicalize(once) == once
        # truncated escape at end-of-string
        assert canonicalize("http://a.com/x%3") == "http://a.com/x%253"
        assert canonicalize("http://a.com/x%") == "http://a.com/x%25"
        # valid escapes still decode (unreserved) / uppercase (reserved)
        assert canonicalize("http://a.com/%41%2f%") == "http://a.com/A%2F%25"


class TestJoin:
    def test_relative(self):
        assert (
            join_no_fragment("http://x.com/dir/", "page.html")
            == "http://x.com/dir/page.html"
        )

    def test_absolute_passthrough(self):
        assert (
            join_no_fragment("http://x.com/", "http://y.com/z")
            == "http://y.com/z"
        )

    def test_fragment_stripped(self):
        assert join_no_fragment("http://x.com/", "#top") == "http://x.com/"
        assert (
            join_no_fragment("http://x.com/", "p.html#sec")
            == "http://x.com/p.html"
        )

    def test_empty_base(self):
        # all_links double-join with @base_url='' (content_link_parser.rb:48)
        assert join_no_fragment("", "mailto:a@b.com") == "mailto:a@b.com"
        assert join_no_fragment("", "page.html") == "page.html"

    def test_scheme_preserving(self):
        assert (
            join_no_fragment("http://x.com/", "javascript:alert('hi');")
            == "javascript:alert('hi');"
        )


class TestLoopFilter:
    # content_link_parser_spec.rb:116-121
    def test_kept_single_trailing_repeat(self):
        assert not is_link_loop(
            "http://www.ge.com/repeated1/repeated2/nothing/repeated1/"
        )

    def test_rejected_pair_repeat(self):
        assert is_link_loop(
            "http://www.ge.com/repeated1/repeated2/nothing/repeated1/repeated2"
        )

    def test_kept_interrupted_pair(self):
        assert not is_link_loop(
            "http://www.ge.com/repeated1/repeated2/nothing/repeated1/asdf/repeated2"
        )

    def test_rejected_adjacent_repeat(self):
        assert is_link_loop("http://x.com/a/x/x/b")

    def test_normal_urls_kept(self):
        assert not is_link_loop("http://sample-links.com/stylesheets/punk.css")
        assert not is_link_loop("http://localhost:3532/css/style_text.css")


class TestEscapePattern:
    # cobweb_spec.rb:39-82
    def test_escapes(self):
        assert escape_pattern_for_regex("hello.com") == r"hello\.com"
        assert escape_pattern_for_regex("hello?") == r"hello\?"
        assert escape_pattern_for_regex("hello+") == r"hello\+"
        assert escape_pattern_for_regex("*hello") == ".*?hello"

    def test_https_widening(self):
        assert (
            escape_pattern_for_regex("http://asdf.com")
            == r"https?://asdf\.com"
        )
        assert (
            escape_pattern_for_regex(
                "http://asdf.com", treat_https_as_http=False
            )
            == r"http://asdf\.com"
        )


class TestLinkClassifier:
    # cobweb_links_spec.rb:41-108
    def test_basic_internal_external(self):
        c = LinkClassifier.compile(
            ["http://domain_one.com/"], ["http://domain_two.com/"]
        )
        assert c.internal("http://domain_one.com/pageone.html")
        assert not c.external("http://domain_one.com/pageone.html")
        assert c.external("http://domain_two.com/pageone.html")
        assert c.external("http://external.com/pageone.html")

    def test_external_overrides_internal(self):
        c = LinkClassifier.compile(
            ["http://domain_one.com/"], ["http://domain_one.com/blog"]
        )
        assert c.internal("http://domain_one.com/pageone.html")
        assert not c.internal("http://domain_one.com/blog/pageone.html")
        assert c.external("http://domain_one.com/blog/pageone.html")

    def test_anchored_at_start(self):
        c = LinkClassifier.compile(
            ["http://www.domain_one.com/"], ["http://www.domain_two.com/"]
        )
        assert c.internal("http://www.domain_one.com/pageone.html")
        assert not c.internal("http://www.domain_two.com/pageone.html")
        assert c.internal(
            "http://www.domain_one.com/pageone.html"
            "?url=http://www.domain_two.com/pageone.html"
        )
        assert not c.internal(
            "http://www.domain_two.com/pageone.html"
            "?url=http://www.domain_one.com/pageone.html"
        )

    def test_wildcards(self):
        c = LinkClassifier.compile(
            ["http://*.domain_one.com/"], ["http://blog.domain_one.com/"]
        )
        assert c.internal("http://www.domain_one.com/pageone.html")
        assert c.internal("http://images.domain_one.com/logo.png")
        assert not c.internal("http://blog.domain_one.com/pageone.html")

    def test_querystring_wildcards(self):
        c = LinkClassifier.compile(
            ["http://www.ford.com/"], ["http://*.ford.com/*?*view=print"]
        )
        assert c.external(
            "http://corporate.ford.com/news-center/press-releases-detail/"
            "pr-doug-scott2658-marketing-manager-31039?view=print"
        )
        assert not c.internal(
            "http://corporate.ford.com/news-center/press-releases-detail/"
            "pr-doug-scott2658-marketing-manager-31039?view=print"
        )

    def test_multiple_wildcards(self):
        c = LinkClassifier.compile(["http://*.*.domain_one.com/"])
        assert not c.internal("http://www.domain_one.com/pageone.html")
        assert c.internal("http://www.marketing.domain_one.com/pageone.html")
        assert c.internal("http://blog.designers.domain_one.com/pagetwo.html")

    def test_https_as_http(self):
        c = LinkClassifier.compile(["http://localhost:3532/*"])
        assert c.internal("https://localhost:3532/secure")

    def test_empty_internal_never_matches(self):
        c = LinkClassifier.compile([])
        assert not c.internal("http://x.com/")


class TestMimePatterns:
    def test_wildcard_all(self):
        re_ = compile_mime_patterns(["*/*"])
        assert mime_matches(re_, "text/html")
        assert mime_matches(re_, "error/dnslookup")
        # mime "" (no Content-Type) fails even */* — crawl_object.rb:11-16
        assert not mime_matches(re_, "")

    def test_text_family(self):
        re_ = compile_mime_patterns(["text/*", "application/xhtml+xml"])
        assert mime_matches(re_, "text/css")
        assert mime_matches(re_, "application/xhtml+xml")
        assert not mime_matches(re_, "image/jpeg")


def test_default_internal_patterns():
    # lib/cobweb.rb:77-82: host pattern and host:port pattern
    assert default_internal_patterns("http://localhost:3532/") == [
        "http://localhost/*",
        "http://localhost:3532/*",
    ]
    assert default_internal_patterns("http://example.com/a") == [
        "http://example.com/*",
        "http://example.com:80/*",
    ]


def test_host_of():
    assert host_of("http://a.com/x") == "a.com"
    assert host_of("http://a.com:8080/x") == "a.com:8080"
    assert host_of("https://A.com:443/x") == "a.com"
