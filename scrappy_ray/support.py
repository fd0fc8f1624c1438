"""String/URI helpers replicating the reference's support layer.

Reference: /root/reference/lib/scrappy/support.rb:26-39 (wikify,
underscore, String#clean), /root/reference/lib/scrappy/agent/agent.rb:154-158
(complete_uri), /root/reference/lib/scrappy/extractor/fragment.rb:127-135
(the quirky 4-chunk relative-URI base).
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urljoin, urlparse

# Ruby: Iconv('UTF-8//IGNORE') + gsub("\302\240"," ") + strip
# (support.rb:37-39). Invalid UTF-8 is dropped at html-binary decode time
# (bytes.decode(..., errors="ignore")); on str we replace NBSP and strip.
_NBSP = " "


def clean(s: str | None) -> str:
    """Ruby String#clean: UTF-8//IGNORE + NBSP→space + strip."""
    if s is None:
        return ""
    return s.replace(_NBSP, " ").strip()


def decode_html(html: bytes | str) -> str:
    """Decode page bytes as UTF-8, dropping invalid sequences
    (mirrors Iconv UTF-8//IGNORE, support.rb:24,37)."""
    if isinstance(html, bytes):
        return html.decode("utf-8", errors="ignore")
    return html


_WIKIFY_RE = re.compile(r"^[a-z]|\s+[a-z]")


def wikify(s: str) -> str:
    """CamelCase words then strip whitespace (support.rb:26-28)."""
    s = _WIKIFY_RE.sub(lambda m: m.group(0).upper(), s)
    return re.sub(r"\s", "", s)


def underscore(s: str) -> str:
    """snake_case (support.rb:29-35)."""
    s = s.replace("::", "/")
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", s)
    s = re.sub(r"([a-z\d])([A-Z])", r"\1_\2", s)
    s = s.replace("-", "_")
    s = re.sub(r"\s+", "_", s)
    return s.lower()


def complete_uri(uri: str) -> str:
    """Seed normalization (agent.rb:154-158): bare word → word.com,
    schemeless → http:// prefix."""
    if re.fullmatch(r"\w+", uri):
        uri = f"{uri}.com"
    if not re.match(r"\A\w*:", uri):
        uri = f"http://{uri}"
    return uri


def four_chunk_base(uri: str) -> str:
    """The reference's relative-resolution base: first four '/'-chunks,
    i.e. scheme://host/first-path-segment (fragment.rb:133)."""
    return "/".join(uri.split("/")[0:4])


@lru_cache(maxsize=8192)
def _resolve_cached(base: str, rel_uri: str) -> str | None:
    # keyed on the four-chunk BASE, not the full doc uri, so every page
    # of a host shares cache entries for its repeated nav/footer links
    try:
        out = urljoin(base, rel_uri)
        # Ruby URI.merge raises on garbage; urljoin is laxer. Reject
        # results with no scheme/netloc so behavior matches the rescue.
        p = urlparse(out)
        if not p.scheme:
            return None
        return out
    except (ValueError, AttributeError):
        return None


def parse_uri(doc_uri: str, rel_uri: str | None) -> str | None:
    """Resolve a (possibly relative) URI against the doc URI using the
    reference's quirky base (fragment.rb:127-135). Returns None when a
    fresh bnode should be minted instead (the reference's ID('*'))."""
    if rel_uri is None:
        return None
    return _resolve_cached(four_chunk_base(doc_uri), rel_uri)


def host_of(url: str) -> str:
    """Host key for politeness partitioning."""
    try:
        return urlparse(url).netloc.lower()
    except ValueError:
        return ""


def strip_query(url: str) -> str:
    """UriSelector's query-strip rule (selectors/uri.rb:5):
    /\\A([^\\?]*)(\\?.*\\Z)?/ capture 1."""
    return url.split("?", 1)[0]


def canonicalize(url: str) -> str:
    """Canonical URL for the seen-set / page-store key: complete +
    drop fragment. (Query string is KEPT — the reference treats
    distinct queries as distinct pages; only UriSelector matching
    strips it.)"""
    url = complete_uri(url.strip())
    return url.split("#", 1)[0]
