"""URL utilities shared by the Spark pandas UDFs and the pure-Python oracle.

Semantics mirror the reference crawler's URL handling:

* ``canonicalize``      — ``Addressable::URI#normalize!`` + ``fragment=nil``
                          as done before every fetch (reference
                          ``lib/cobweb.rb:124-127``).
* ``join_no_fragment``  — ``Addressable::URI.join`` + fragment strip
                          (reference ``lib/uri_helper.rb:4-8``).
* ``default_internal_patterns`` — the two wildcard patterns derived from a
                          base URL on crawl start (``lib/cobweb.rb:77-82``).

Pure Python (stdlib only) so the exact same code runs driver-side, in the
oracle, and inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# RFC 3986 unreserved characters: never percent-encoded in a normalized URL.
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = set("0123456789abcdefABCDEF")


def _normalize_pct(component: str) -> str:
    """Normalize percent-encoding in a single idempotent scan.

    Mirrors Addressable ``normalize!`` (reference ``lib/cobweb.rb:124-127``):
    valid ``%XX`` escapes decode iff the octet is unreserved, else the hex is
    uppercased; a ``%`` NOT followed by two hex digits is itself escaped to
    ``%25`` in the same pass.  That last rule is what makes the function
    idempotent — decoding can never mint a new escape out of a stray ``%``
    (e.g. ``%%333`` → ``%2533``, which is a fixed point), because every ``%``
    in the output is the head of a valid escape whose octet is not
    unreserved (so a second pass only re-uppercases, a no-op).
    """
    if "%" not in component:
        return component
    out: list[str] = []
    i, n = 0, len(component)
    while i < n:
        ch = component[i]
        if ch != "%":
            out.append(ch)
            i += 1
            continue
        hex2 = component[i + 1 : i + 3]
        if len(hex2) == 2 and hex2[0] in _HEX and hex2[1] in _HEX:
            octet = chr(int(hex2, 16))
            if octet in _UNRESERVED:
                out.append(octet)
            else:
                out.append("%" + hex2.upper())
            i += 3
        else:
            out.append("%25")
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, as Addressable normalize does."""
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1) if path.startswith("/") else path.find("/")
            if i == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:i])
                path = path[i:]
    return "".join(output)


@lru_cache(maxsize=65536)
def canonicalize(url: str) -> str:
    """Canonical form used as the fetch key (== ``documents.doc_id``).

    Mirrors ``Addressable::URI.parse(url).normalize!; fragment=nil``
    (reference ``lib/cobweb.rb:124-127``): lowercase scheme/host, strip
    default port, drop fragment, normalize percent-encoding, remove dot
    segments, and give authority-URLs an explicit "/" path.
    """
    if url is None:
        return None
    # Malformed/out-of-range ports ("http://h:8x/", "http://h:99999/")
    # raise ValueError from urlsplit accessors. The reference drops such
    # links as nil joins (lib/content_link_parser.rb:49); returning None
    # here mirrors join_no_fragment's nil-drop so one bad href can never
    # abort a crawl job.
    try:
        parts = urlsplit(url.strip())
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        port = parts.port
    except (ValueError, AttributeError):
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _normalize_pct(parts.path)
    path = _remove_dot_segments(path)
    if netloc and not path:
        path = "/"
    query = _normalize_pct(parts.query) if parts.query else parts.query
    return urlunsplit((scheme, netloc, path, query, ""))


def join_no_fragment(base: str, link: str) -> str | None:
    """Absolutize ``link`` against ``base`` and strip the fragment.

    Mirrors ``UriHelper.join_no_fragment`` (``lib/uri_helper.rb:4-8``):
    no normalization happens here — the queued-URL strings the reference
    stores in its seen-sets are *absolutized but not normalized*.
    Returns None when the join is impossible (reference drops nils,
    ``lib/content_link_parser.rb:49``).
    """
    try:
        if link is None:
            return None
        joined = urljoin(base or "", link)
        # strip fragment only; leave everything else untouched
        hash_idx = joined.find("#")
        if hash_idx != -1:
            joined = joined[:hash_idx]
        return joined
    except (ValueError, AttributeError):
        return None


def host_of(url: str) -> str:
    """Lowercased host (with non-default port) — the politeness shard key."""
    try:
        parts = urlsplit(url)
        host = (parts.hostname or "").lower()
        if parts.port is not None and parts.port != _DEFAULT_PORTS.get(
            parts.scheme.lower()
        ):
            host = f"{host}:{parts.port}"
        return host
    except ValueError:
        return ""


def default_internal_patterns(base_url: str) -> list[str]:
    """Wildcard internal_urls derived from the base URL on crawl start.

    Mirrors ``lib/cobweb.rb:77-82``: ``scheme://host/*`` and
    ``scheme://host:inferred_port/*``.
    """
    parts = urlsplit(base_url)
    scheme = parts.scheme
    host = parts.hostname or ""
    port = parts.port or _DEFAULT_PORTS.get(scheme.lower(), 80)
    return [f"{scheme}://{host}/*", f"{scheme}://{host}:{port}/*"]


# Link-loop rejection patterns — reference ``lib/content_link_parser.rb:51-52``.
# Kept as raw strings usable both by Python ``re`` and Spark/Java ``rlike``
# (both support lazy quantifiers and backreferences with identical semantics
# for these patterns).
LOOP_RE_1 = r"/([^/]+?)/\1/"
LOOP_RE_2 = r"([^/]+?)/([^/]+?)/.*?\1/\2"

_loop1 = re.compile(LOOP_RE_1)
_loop2 = re.compile(LOOP_RE_2)


def is_link_loop(url: str) -> bool:
    """True if the URL trips either repeated-segment pattern."""
    return bool(_loop1.search(url) or _loop2.search(url))
