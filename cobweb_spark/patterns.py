"""Wildcard URL-pattern compilation (internal/external/mime classification).

Mirrors the reference's pattern language:

* ``escape_pattern_for_regex`` — ``lib/cobweb.rb:454-463``: escape ``.``,
  ``?``, ``+``; ``*`` becomes the lazy ``.*?``; with treat_https_as_http
  (default true) ``http:`` widens to ``https?:``.
* internal/external classification — ``lib/cobweb_links.rb:15-41``:
  a link is *internal* iff it matches (anchored at start) any internal
  pattern AND no external pattern; external patterns override internal.

Patterns compile to single alternation regexes that run identically under
Python ``re`` (oracle) and Java regex (``Column.rlike`` in Spark), keeping
the hot-path classification entirely JVM-side.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Regex that can never match anything (empty alternation guard).
MATCH_NOTHING = r"(?!)"


def escape_pattern_for_regex(pattern: str, treat_https_as_http: bool = True) -> str:
    """Wildcard pattern → regex fragment (reference ``lib/cobweb.rb:454-463``)."""
    pattern = pattern.replace(".", r"\.")
    pattern = pattern.replace("?", r"\?")
    pattern = pattern.replace("+", r"\+")
    pattern = pattern.replace("*", ".*?")
    if treat_https_as_http:
        pattern = pattern.replace("http:", "https?:")
    return pattern


def compile_alternation(
    patterns: list[str], treat_https_as_http: bool = True, anchored: bool = True
) -> str:
    """Join wildcard patterns into one regex string.

    Anchored at the start like ``Regexp.new("^#{...}")`` in
    ``lib/cobweb_links.rb:15-16``. An empty pattern list yields a
    never-matching regex so ``internal?`` is False with no internal_urls.
    """
    if not patterns:
        return MATCH_NOTHING
    alts = "|".join(
        escape_pattern_for_regex(p, treat_https_as_http) for p in patterns
    )
    return ("^" if anchored else "") + f"(?:{alts})"


@dataclass(frozen=True)
class LinkClassifier:
    """Compiled internal/external classifier (``lib/cobweb_links.rb``).

    ``internal_re``/``external_re`` are plain regex strings — hand them to
    ``Column.rlike`` in Spark or use :meth:`internal` in the oracle.
    """

    internal_re: str
    external_re: str

    @classmethod
    def compile(
        cls,
        internal_urls: list[str],
        external_urls: list[str] | None = None,
        treat_https_as_http: bool = True,
    ) -> "LinkClassifier":
        return cls(
            internal_re=compile_alternation(internal_urls, treat_https_as_http),
            external_re=compile_alternation(
                external_urls or [], treat_https_as_http
            ),
        )

    def internal(self, link: str) -> bool:
        """``lib/cobweb_links.rb:30-32``: internal AND not external."""
        return bool(re.search(self.internal_re, link)) and not re.search(
            self.external_re, link
        )

    def external(self, link: str) -> bool:
        """``lib/cobweb_links.rb:34-37``."""
        return not re.search(self.internal_re, link) or bool(
            re.search(self.external_re, link)
        )

    def matches_external(self, link: str) -> bool:
        """``lib/cobweb_links.rb:39-41``."""
        return bool(re.search(self.external_re, link))


def compile_mime_patterns(valid_mime_types: list[str]) -> str:
    """Mime wildcard list → one regex (``lib/crawl_object.rb:11-16``).

    The reference matches *unanchored* (Ruby ``String#match``), so
    ``"*/*"`` permits everything including ``error/dnslookup`` rows.
    """
    if not valid_mime_types:
        return MATCH_NOTHING
    return (
        "(?:"
        + "|".join(
            escape_pattern_for_regex(p, treat_https_as_http=False)
            for p in valid_mime_types
        )
        + ")"
    )


def mime_matches(mime_re: str, mime_type: str) -> bool:
    return bool(re.search(mime_re, mime_type or ""))
