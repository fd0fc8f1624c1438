"""Web-text cleanup operators — URL canonicalization/dedup, PII
scrubbing, unicode text normalization.

All transforms are zero-copy Arrow ``map_batches`` kernels
(``pyarrow.compute`` string/regex functions — RE2, the same engine
DuckDB's ``regexp_replace`` uses, so the oracles share regex
semantics exactly). No per-row Python anywhere.

Reference parity note: the reference engine's URL handling is
canonicalize-on-discovery (urlizer); these operators generalize that
into standalone corpus-cleanup stages a training-data pipeline runs
over a crawled pages/documents table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# -- URL canonicalization -------------------------------------------------

# policy (documented, applied in order):
#   1. strip the fragment            (#… never reaches the server)
#   2. drop default ports            (:80 / :443 before the path or end)
#   3. strip trailing slashes        (path-identity for the common case)
#   4. case-fold the whole URL       (scheme+host are case-insensitive;
#      folding the path too is this canonicalizer's dedup policy —
#      lossy on case-sensitive paths, standard for near-dup corpora)
# Query strings are preserved as-is (no param reordering).
_FRAGMENT = r"#.*$"
_DEFAULT_PORT = r":(80|443)(/|$)"
_TRAILING_SLASH = r"/+$"


def canonical_url_array(urls: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """The canonical form of each url (vectorized kernel chain)."""
    s = pc.cast(urls, pa.string())
    s = pc.replace_substring_regex(s, pattern=_FRAGMENT, replacement="")
    s = pc.replace_substring_regex(s, pattern=_DEFAULT_PORT, replacement=r"\2")
    s = pc.replace_substring_regex(s, pattern=_TRAILING_SLASH, replacement="")
    return pc.utf8_lower(s)


def canonicalize_urls(ds, url_col: str = "url", out_col: str = "canonical_url"):
    """Append ``out_col`` with the canonical form of ``url_col``."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, canonical_url_array(batch.column(url_col)))

    return ds.map_batches(add, batch_format="pyarrow")


def url_dedup(ds, url_col: str = "url", id_col: str = "doc_id"):
    """Keep the min-id row of each canonical-URL group: canonicalize
    per batch (vectorized), then one hash-aggregate ``groupby`` — the
    same min-per-key shape as ``exact_dedup`` (no per-group Python,
    scales to a 10^10-row url table as a single key exchange)."""
    from ray.data.aggregate import Min

    return (
        canonicalize_urls(ds, url_col, "_curl")
        .groupby("_curl")
        .aggregate(Min(id_col, alias_name=id_col))
        .rename_columns({"_curl": "canonical_url"})
    )


# -- PII scrubbing --------------------------------------------------------

# RE2-compatible patterns (no lookaround), applied in order: emails
# first (their local parts contain digits a later pass must not see),
# then phone-like runs, then bare IPv4s (dots keep them out of the
# phone class). DuckDB regexp_replace(…,'g') applies the same RE2
# patterns for the oracle.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def scrub_pii_array(texts: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    s = pc.cast(texts, pa.string())
    for pattern, repl in PII_PATTERNS:
        s = pc.replace_substring_regex(s, pattern=pattern, replacement=repl)
    return s


def scrub_pii(ds, text_col: str = "text", out_col: str | None = None):
    """Redact emails / phone numbers / IPv4 addresses in ``text_col``
    (in place unless ``out_col`` names a new column)."""
    target = out_col or text_col

    def scrub(batch: pa.Table) -> pa.Table:
        cleaned = scrub_pii_array(batch.column(text_col))
        if target in batch.column_names:
            i = batch.column_names.index(target)
            return batch.set_column(i, target, cleaned)
        return batch.append_column(target, cleaned)

    return ds.map_batches(scrub, batch_format="pyarrow")


# -- unicode normalization ------------------------------------------------


def normalize_text_array(texts: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """NFC-normalize, collapse whitespace runs to single spaces, trim.
    Matches DuckDB ``trim(regexp_replace(nfc_normalize(t),'\\s+',' ','g'))``.

    NFC goes through stdlib ``unicodedata`` (a C call per string):
    this container's pyarrow build has a broken ``utf8_normalize``
    (NFC of U+00E1 returns the DECOMPOSED pair — verified), so Arrow
    can't do the composition. ``is_normalized`` (also C) short-circuits
    the common already-NFC case, so the per-row Python cost is one
    cheap check for typical web text."""
    import unicodedata

    s = pc.cast(texts, pa.string())
    vals = s.to_pylist() if isinstance(s, (pa.Array, pa.ChunkedArray)) else list(s)
    nfc = pa.array(
        [None if v is None
         else (v if unicodedata.is_normalized("NFC", v) else unicodedata.normalize("NFC", v))
         for v in vals],
        pa.string(),
    )
    s = pc.replace_substring_regex(nfc, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(s)


def normalize_text(ds, text_col: str = "text", out_col: str | None = None):
    target = out_col or text_col

    def norm(batch: pa.Table) -> pa.Table:
        cleaned = normalize_text_array(batch.column(text_col))
        if target in batch.column_names:
            i = batch.column_names.index(target)
            return batch.set_column(i, target, cleaned)
        return batch.append_column(target, cleaned)

    return ds.map_batches(norm, batch_format="pyarrow")


# -- domain-level filtering ----------------------------------------------


def domain_stats(ds, domain_col: str = "source", text_col: str = "text"):
    """Per-domain corpus stats: doc count + mean quality score.

    Pattern for 100 TB: quality is computed inline in ONE streaming
    pass whose output is a per-batch PARTIAL aggregate (domain, n,
    sum_quality) — the wide ``groupby`` only ever sees
    O(domains × blocks) rows, never O(documents). Host-level quality
    gating is the standard CC-pipeline domain filter (C4/Gopher-style
    source filtering); the reference's per-host politeness state
    (state/politeness.py) is the crawl-time analogue.
    """
    from .textstats import quality_kernel

    def partial(batch: pa.Table) -> pa.Table:
        qual = quality_kernel(batch.column(text_col))["quality"]
        t = pa.table({domain_col: batch.column(domain_col), "q": qual})
        return t.group_by(domain_col).aggregate([("q", "sum"), ("q", "count")])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby(domain_col).sum(["q_sum", "q_count"])

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.cast(batch.column("sum(q_count)"), pa.int64())
        mean = pc.divide(batch.column("sum(q_sum)"),
                         pc.cast(n, pa.float64()))
        return pa.table({
            domain_col: batch.column(domain_col),
            "n_docs": n,
            "mean_quality": mean,
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def domain_filter(ds, min_docs: int = 1, min_quality: float = 0.0,
                  domain_col: str = "source", text_col: str = "text",
                  keep_broadcast_max: int = 5_000_000,
                  num_partitions: int = 8):
    """Keep only documents from domains passing count + mean-quality
    thresholds. The keep-set is one row per surviving domain — small
    at bench scale but O(domains) at crawl scale (tens of millions of
    hosts), so the gather is GUARDED: ≤``keep_broadcast_max`` domains
    are broadcast into the filter via closure capture (a broadcast
    semi-join, never a shuffle of the documents table); above the
    guard the documents are inner-hash-joined against the distributed
    keep-domain table instead — no driver gather at any size."""
    import pyarrow.compute as pc

    stats = domain_stats(ds, domain_col=domain_col, text_col=text_col)

    def keep_only(batch: pa.Table) -> pa.Table:
        ok = pc.and_(pc.greater_equal(batch.column("n_docs"), min_docs),
                     pc.greater_equal(batch.column("mean_quality"),
                                      min_quality))
        return batch.filter(pc.fill_null(ok, False)).select([domain_col])

    keep_ds = stats.map_batches(keep_only, batch_format="pyarrow") \
                   .materialize()  # consumed twice: count + (gather|join)
    if keep_ds.count() > keep_broadcast_max:
        from ..common import drop_empty_blocks

        return drop_empty_blocks(ds).join(
            drop_empty_blocks(keep_ds), join_type="inner",
            num_partitions=num_partitions, on=(domain_col,))
    keep = pa.array(
        sorted(r[domain_col] for r in keep_ds.take_all()), pa.string())

    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(pc.cast(batch.column(domain_col), pa.string()),
                                     value_set=keep))

    return ds.map_batches(flt, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, key_col: str = "url",
                  fp_col: str = "fingerprint", num_partitions: int = 8):
    """Crawl snapshot delta: compare two crawls by a per-page content
    fingerprint and emit (key, status ∈ added|removed|changed|
    unchanged) — the recrawl scheduler's input (changed/added pages
    re-enter the frontier first; see pipelines/rankcrawl.py for the
    authority companion).

    ONE distributed full_outer hash join on the key, then a vectorized
    status kernel per batch — no driver state at any size; both inputs
    stream. Fingerprints are caller-supplied (md5/simhash/zlib-ratio —
    any equality-comparable column) so the diff itself stays
    content-agnostic."""
    left = old_ds.select_columns([key_col, fp_col])

    def rn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([key_col, fp_col + "_new"])

    right = new_ds.select_columns([key_col, fp_col]).map_batches(
        rn, batch_format="pyarrow"
    )
    j = left.join(right, join_type="full_outer", num_partitions=num_partitions,
                  on=(key_col,), left_suffix="", right_suffix="_r")

    def status(batch: pa.Table) -> pa.Table:
        old = batch.column(fp_col)
        new = batch.column(fp_col + "_new")
        has_old = pc.is_valid(old)
        has_new = pc.is_valid(new)
        same = pc.fill_null(pc.equal(old, new), False)
        st = pc.if_else(
            pc.and_not(has_old, has_new),  # only in the old snapshot
            pa.scalar("removed"),
            pc.if_else(
                pc.and_not(has_new, has_old),  # only in the new one
                pa.scalar("added"),
                pc.if_else(same, pa.scalar("unchanged"), pa.scalar("changed")),
            ),
        )
        return pa.table({key_col: batch.column(key_col), "status": st})

    return j.map_batches(status, batch_format="pyarrow")


def url_trap_stats(ds, url_col: str = "url", digits: int = 4,
                   max_query_ratio: float = 0.5, max_depth: int = 7):
    """Per-host crawler-trap signals (calendar pages, session-id query
    explosions, infinite path recursion — the classic frontier
    pathologies): url count, path-depth max/mean, query-string ratio,
    mean url length, and a ``trap`` verdict a frontier can subtract.

    Depth = count of '/' in the url minus the scheme's two (documented
    definition shared with the SQL oracle). One streaming pass emits
    per-batch PARTIAL per-host aggregates (Arrow group_by inside the
    batch), ONE small groupby reduces them — the shuffle moves
    O(hosts × blocks) rows, never O(urls)."""
    from ray.data.aggregate import Max, Sum

    from ..crawl.priority import _HOST_RE

    def partial(batch: pa.Table) -> pa.Table:
        u = pc.fill_null(pc.cast(batch.column(url_col), pa.string()), "")
        host = pc.fill_null(
            pc.struct_field(pc.extract_regex(u, _HOST_RE), "host"), ""
        )
        depth = pc.subtract(pc.count_substring(u, "/"), pa.scalar(2))
        q = pc.cast(pc.match_substring(u, "?"), pa.int64())
        t = pa.table({
            "host": host,
            "n": pa.array(np.ones(len(u), np.int64)),
            "depth": pc.cast(depth, pa.int64()),
            "q": q,
            "ulen": pc.cast(pc.utf8_length(u), pa.int64()),
        })
        return (
            t.group_by("host")
            .aggregate([("n", "sum"), ("depth", "sum"), ("depth", "max"),
                        ("q", "sum"), ("ulen", "sum")])
            .rename_columns(["host", "n", "depth_sum", "depth_max", "q_sum", "len_sum"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Sum("n", alias_name="n_urls"),
                   Sum("depth_sum", alias_name="ds_"),
                   Max("depth_max", alias_name="max_depth"),
                   Sum("q_sum", alias_name="qs_"),
                   Sum("len_sum", alias_name="ls_"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = np.asarray(pc.cast(batch.column("n_urls"), pa.float64()))

        def r(x):
            return np.asarray(
                pc.round(pa.array(x, pa.float64()), ndigits=digits,
                         round_mode="half_towards_infinity"),
                dtype=np.float64,
            )

        mean_depth = r(np.asarray(pc.cast(batch.column("ds_"), pa.float64())) / n)
        q_ratio = r(np.asarray(pc.cast(batch.column("qs_"), pa.float64())) / n)
        mean_len = r(np.asarray(pc.cast(batch.column("ls_"), pa.float64())) / n)
        mx = np.asarray(pc.cast(batch.column("max_depth"), pa.int64()))
        trap = (q_ratio > max_query_ratio) | (mx >= max_depth)
        return pa.table({
            "host": batch.column("host"),
            "n_urls": batch.column("n_urls"),
            "max_depth": batch.column("max_depth"),
            "mean_depth": pa.array(mean_depth, pa.float64()),
            "query_ratio": pa.array(q_ratio, pa.float64()),
            "mean_len": pa.array(mean_len, pa.float64()),
            "trap": pa.array(trap, pa.bool_()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


# -- Mirror detection -------------------------------------------------------


def mirror_sources(ds, text_col: str = "text", source_col: str = "source",
                   key_tokens: int = 8, min_sources: int = 2,
                   survivor_broadcast_max: int = 2_000_000):
    """Detect content mirrored across sources/hosts: groups of documents
    sharing a prefix fingerprint (md5 of the first ``key_tokens``
    whitespace tokens — the cheap syndication/mirror key) that span at
    least ``min_sources`` distinct sources. Returns one row per mirrored
    content group: ``(content_key, n_sources, sources)`` with sources as
    a sorted comma-joined distinct list.

    Scale shape (100 TB): stage 1 is an Arrow kernel per batch
    (split/slice/join in C; md5 shared with ``exact_dedup`` so the
    DuckDB oracle cannot drift); the DISTINCT pair set and the
    per-key source count are vectorized hash aggregates — the only
    per-group Python (the list-agg) runs on the MIRROR SURVIVORS, whose
    key set is broadcast as a semi-join filter (never O(corpus) driver
    state; ``survivor_broadcast_max`` guards the assumption and fails
    loudly rather than silently gathering an unexpectedly huge set).

    Reference parity: the reference has no corpus-level mirror op; this
    generalizes its canonicalize-on-discovery URL identity
    (urlizer, see canonical_url_array above) to content identity.
    """
    from .dedup import _md5_col

    def keyed(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column(text_col), pa.string()), " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, key_tokens), " ")
        return pa.table({
            "content_key": _md5_col(prefix.to_pylist()),
            source_col: pc.cast(batch.column(source_col), pa.string()),
        })

    # DISTINCT (key, source) pairs, then n_sources per key — both are
    # vectorized Arrow hash aggregates (one key exchange each).
    # materialized ONCE: pairs feeds both the count and the final
    # list-agg — lazily each consumer would re-hash the whole corpus
    pairs = ds.map_batches(keyed, batch_format="pyarrow") \
              .groupby(["content_key", source_col]).count() \
              .drop_columns(["count()"]).materialize()
    counts = pairs.groupby("content_key").count()

    def survivors_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("count()"), min_sources)
        return batch.filter(keep).select(["content_key"])

    surv_tbl = counts.map_batches(survivors_only, batch_format="pyarrow") \
                     .take_all()
    if len(surv_tbl) > survivor_broadcast_max:
        raise ValueError(
            f"mirror survivor set ({len(surv_tbl)}) exceeds the broadcast "
            f"guard ({survivor_broadcast_max}); raise the guard or switch "
            "the semi-join to the distributed hash join")
    surv_keys = pa.array(sorted(r["content_key"] for r in surv_tbl), pa.string())

    def semi(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("content_key"), value_set=surv_keys))

    def listagg(group: pa.Table) -> pa.Table:
        srcs = sorted(set(group.column(source_col).to_pylist()))
        return pa.table({
            "content_key": pa.array([group.column("content_key")[0].as_py()], pa.string()),
            "n_sources": pa.array([len(srcs)], pa.int64()),
            "sources": pa.array([",".join(srcs)], pa.string()),
        })

    return (pairs.map_batches(semi, batch_format="pyarrow")
            .groupby("content_key")
            .map_groups(listagg, batch_format="pyarrow"))


# -- Anchor-text aggregation ------------------------------------------------

_ANCHOR_RE = None  # compiled lazily once per process


def _anchor_re():
    global _ANCHOR_RE
    if _ANCHOR_RE is None:
        import re
        _ANCHOR_RE = (
            re.compile(rb'<a\s[^>]*?href="([^"]*)"[^>]*>(.*?)</a>',
                       re.S | re.I),
            re.compile(rb"<[^>]*>"),
        )
    return _ANCHOR_RE


def anchor_texts(pages_ds, url_col: str = "url", html_col: str = "html"):
    """Aggregate anchor text per link TARGET across a pages corpus —
    the classic web-corpus signal (anchor text describes the target
    better than the target's own page; used for retrieval and for
    crawl prioritization). Output one row per target:
    ``(dst, n_links, n_sources, top_anchor, top_anchor_n)`` where
    ``top_anchor`` is the most frequent anchor string (ties break
    lexicographically).

    Scale shape (100 TB): the per-page regex scan is the extract-stage
    precedent (bounded work per document, compiled once per process);
    everything after is vectorized hash aggregates over the exploded
    (dst, src, anchor) edge list — total-link counts, distinct-source
    counts, and (dst, anchor) counts whose per-target argmax reuses
    ``top_k_per_group`` (per-block partial top-k, so the shuffle moves
    ≤1 row per (dst, block)). The three O(unique targets) aggregates
    recombine via the distributed hash join, never a driver gather.

    Reference parity: the reference's link discovery keeps only hrefs
    (extractor core); anchor TEXT aggregation is new corpus surface.
    """
    from ray.data.aggregate import Count

    from ..common import drop_empty_blocks
    from ..pipelines.relational import top_k_per_group
    from ..support import decode_html, parse_uri

    def explode(batch: pa.Table) -> pa.Table:
        a_re, tag_re = _anchor_re()
        srcs, dsts, anchors = [], [], []
        for src, html in zip(batch.column(url_col).to_pylist(),
                             batch.column(html_col).to_pylist()):
            if html is None:
                continue
            raw = html if isinstance(html, bytes) else str(html).encode()
            for href, inner in a_re.findall(raw):
                dst = parse_uri(src, decode_html(href))
                if not dst:
                    continue
                text = decode_html(tag_re.sub(b"", inner)).strip()
                srcs.append(src)
                dsts.append(dst)
                anchors.append(text)
        return pa.table({
            "src": pa.array(srcs, pa.string()),
            "dst": pa.array(dsts, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        })

    # materialized ONCE: three aggregates consume the edge list — lazily
    # each would re-run the HTML regex scan over every page
    edges = pages_ds.map_batches(explode, batch_format="pyarrow").materialize()
    n_links = edges.groupby("dst").aggregate(Count(alias_name="n_links"))
    n_sources = (edges.groupby(["dst", "src"]).count()
                 .drop_columns(["count()"])
                 .groupby("dst").aggregate(Count(alias_name="n_sources")))
    pair_counts = edges.groupby(["dst", "anchor"]) \
                       .aggregate(Count(alias_name="n"))
    top = top_k_per_group(pair_counts, group_col="dst", key="n", k=1,
                          descending=True, tiebreak="anchor")
    top = top.map_batches(
        lambda t: t.rename_columns(["dst", "top_anchor", "top_anchor_n"]),
        batch_format="pyarrow")

    out = drop_empty_blocks(n_links).join(
        drop_empty_blocks(n_sources), "inner", 8, on=("dst",))
    return drop_empty_blocks(out).join(
        drop_empty_blocks(top), "inner", 8, on=("dst",))


# -- robots.txt coverage ----------------------------------------------------


def robots_stats(pages_ds, url_col: str = "url", html_col: str = "html"):
    """Per-host robots.txt coverage report over a pages corpus: how
    many Disallow rules each host publishes, its Crawl-delay, and what
    fraction of the host's crawled URLs those rules would block —
    the standard pre-crawl corpus audit (and a post-crawl compliance
    check). Output: ``(host, n_disallow, crawl_delay, n_urls,
    n_blocked)``; hosts with no robots.txt report 0 rules / null delay
    (allow-all, the same contract as state/robots.py's cache miss).

    Scale shape (100 TB): the rules side is O(hosts) — parsed from the
    ``*/robots.txt`` rows only (one bounded-Python parse per host,
    reusing ``state.robots.parse_robots`` so semantics cannot drift
    from the live crawl's politeness layer) and BROADCAST into one
    streaming pass over all URLs; per batch, URLs group by host and
    each host's few prefixes test via numpy startswith — no shuffle of
    the pages table, one small groupby-sum of per-batch partials.
    """
    from ray.data.aggregate import Max, Sum

    from ..state.robots import parse_robots

    host_re = r"^[a-z][a-z0-9+.-]*://([^/]+)"

    def hosts_of(urls: pa.ChunkedArray) -> pa.Array:
        ex = pc.extract_regex(pc.cast(urls, pa.string()),
                              pattern=r"^[a-z][a-z0-9+.-]*://(?P<host>[^/]+)")
        return pc.struct_field(ex, "host")

    def parse_rules(batch: pa.Table) -> pa.Table:
        urls = pc.cast(batch.column(url_col), pa.string())
        mask = pc.ends_with(urls, pattern="/robots.txt")
        sel = batch.filter(mask)
        hosts, nd, cd, prefixes = [], [], [], []
        for u, html in zip(hosts_of(sel.column(url_col)).to_pylist(),
                           sel.column(html_col).to_pylist()):
            r = parse_robots(html)
            hosts.append(u)
            nd.append(len([d for d in r.disallow if d]))
            cd.append(r.crawl_delay)
            prefixes.append("\x1f".join(d for d in r.disallow if d))
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "n_disallow": pa.array(nd, pa.int64()),
            "crawl_delay": pa.array(cd, pa.float64()),
            "prefixes": pa.array(prefixes, pa.string()),
        })

    rules_tbl = pa.concat_tables(list(
        pages_ds.map_batches(parse_rules, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow"))).combine_chunks()
    rule_map = {
        h: tuple(p for p in pre.split("\x1f") if p)
        for h, pre in zip(rules_tbl.column("host").to_pylist(),
                          rules_tbl.column("prefixes").to_pylist())
    }

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        urls = pc.cast(batch.column(url_col), pa.string())
        hosts = hosts_of(urls)
        # path = url minus scheme://host (robots prefixes match paths)
        paths = pc.replace_substring_regex(urls, pattern=host_re, replacement="")
        t = pa.table({"host": hosts, "path": paths})
        out_h, out_n, out_b = [], [], []
        for h in pc.unique(t.column("host")).to_pylist():
            grp = t.filter(pc.equal(t.column("host"), h))
            p = np.asarray(grp.column("path").to_pylist(), dtype=object)
            blocked = np.zeros(len(p), bool)
            for pre in rule_map.get(h, ()):
                blocked |= np.char.startswith(p.astype(str), pre)
            out_h.append(h)
            out_n.append(len(p))
            out_b.append(int(blocked.sum()))
        return pa.table({"host": pa.array(out_h, pa.string()),
                         "n": pa.array(out_n, pa.int64()),
                         "b": pa.array(out_b, pa.int64())})

    counts = (pages_ds.map_batches(partial, batch_format="pyarrow")
              .groupby("host")
              .aggregate(Sum("n", alias_name="n_urls"),
                         Sum("b", alias_name="n_blocked")))

    # attach the O(hosts) rule columns via the broadcast side
    nd_map = {h: n for h, n in zip(rules_tbl.column("host").to_pylist(),
                                   rules_tbl.column("n_disallow").to_pylist())}
    cd_map = {h: c for h, c in zip(rules_tbl.column("host").to_pylist(),
                                   rules_tbl.column("crawl_delay").to_pylist())}

    def finalize(batch: pa.Table) -> pa.Table:
        hs = batch.column("host").to_pylist()
        return pa.table({
            "host": batch.column("host"),
            "n_disallow": pa.array([nd_map.get(h, 0) for h in hs], pa.int64()),
            "crawl_delay": pa.array([cd_map.get(h) for h in hs], pa.float64()),
            "n_urls": pc.cast(batch.column("n_urls"), pa.int64()),
            "n_blocked": pc.cast(batch.column("n_blocked"), pa.int64()),
        })

    return counts.map_batches(finalize, batch_format="pyarrow")


# -- Revisit scheduling -----------------------------------------------------


def revisit_stats(ds, key_col: str = "user_id", ts_col: str = "ts",
                  state_col: str = "event_type", id_col: str = "event_id",
                  digits: int = 6):
    """Per-key change-rate estimation from an observation history — the
    input to a freshness-aware recrawl scheduler (Cho & Garcia-Molina,
    "Effective page refresh policies for web crawlers", TODS 2003): for
    each key, how many times it was observed, how often consecutive
    observations DIFFERED, the change rate, and the mean gap between
    observations. ``state/repository.py``'s observe() is the live
    read-through analogue; this is the batch audit over a history
    table. Keys observed once report 0 changes and null rate/gap.

    Shape: ``groupby(key).map_groups`` with one vectorized numpy pass
    per group (the rolling_window partitioning assumption: one key's
    history fits one worker — salt hot keys). Ordering ties on the
    timestamp break on ``id_col`` so the result is deterministic and
    matches an oracle ordering the same way.
    """

    def per_key(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(pc.cast(g.column(ts_col), pa.int64()))
        st = np.asarray(g.column(state_col).to_pylist(), dtype=object)
        n = len(ts)
        changes = int((st[1:] != st[:-1]).sum()) if n > 1 else 0
        if n > 1:
            rate = pc.round(pa.array([changes / (n - 1)], pa.float64()),
                            ndigits=digits,
                            round_mode="half_towards_infinity")
            gap = pc.round(
                pa.array([(float(ts[-1] - ts[0]) / (n - 1)) / 1_000_000.0],
                         pa.float64()),
                ndigits=digits, round_mode="half_towards_infinity")
        else:
            rate = pa.array([None], pa.float64())
            gap = pa.array([None], pa.float64())
        return pa.table({
            key_col: pa.array([g.column(key_col)[0].as_py()],
                              g.schema.field(key_col).type),
            "n_obs": pa.array([n], pa.int64()),
            "n_changes": pa.array([changes], pa.int64()),
            "change_rate": rate,
            "mean_gap_s": gap,
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def salt_hot_keys(ds, key_col: str, order_col: str, threshold: int,
                  n_salt: int = 16):
    """The hot-key salting helper for the ``groupby(key).map_groups``
    family (rolling_window / sessionize / revisit_stats): append a
    ``salt`` int32 column that splits each HOT key's rows (row count >
    ``threshold``) into up to ``n_salt`` CONTIGUOUS ``order_col``
    ranges, so no single worker ever holds a whole hot key's history.
    Cold keys get salt 0 (one group, the fast path).

    Salt is a pure function of the order value (per-key min/max range
    bucketing), so (a) rows with equal order values always share a
    chunk — a chunk boundary never splits a tie — and (b) salt is
    monotone in ``order_col``, so a merge step can stitch per-chunk
    partials back in order by sorting on salt. The hot-key stats table
    (count/min/max per hot key ONLY) is the tiny side: gathered once,
    broadcast via ``ray.put``.

    Use: ``groupby([key, "salt"]).map_groups(partial)`` then
    ``groupby(key).map_groups(merge)`` where ``merge`` orders chunks
    by salt and combines boundary state (see ``revisit_stats_salted``
    for the worked example)."""
    import ray
    from ray.data.aggregate import Max, Min, Sum

    from ..common import cached_get

    def partial(batch: pa.Table) -> pa.Table:
        o = pc.cast(batch.column(order_col), pa.int64())
        t = pa.table({key_col: batch.column(key_col), "o": o,
                      "n": pa.array(np.ones(len(o), np.int64))})
        return (t.group_by([key_col])
                .aggregate([("n", "sum"), ("o", "min"), ("o", "max")])
                .rename_columns([key_col, "n", "mn", "mx"]))

    stats = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(key_col)
             .aggregate(Sum("n", alias_name="n"),
                        Min("mn", alias_name="mn"),
                        Max("mx", alias_name="mx")))
    hot_rows = stats.filter(expr=f"n > {int(threshold)}").take_all()
    if not hot_rows:
        return ds.map_batches(
            lambda b: b.append_column(
                "salt", pa.array(np.zeros(b.num_rows, np.int32))),
            batch_format="pyarrow")
    hot_rows.sort(key=lambda r: r[key_col])
    hot_keys = pa.array([r[key_col] for r in hot_rows])
    mns = np.array([r["mn"] for r in hot_rows], np.int64)
    mxs = np.array([r["mx"] for r in hot_rows], np.int64)
    hot_ref = ray.put((hot_keys, mns, mxs))

    def add_salt(batch: pa.Table) -> pa.Table:
        keys, lo, hi = cached_get(hot_ref)
        idx = pc.index_in(batch.column(key_col), value_set=keys)
        idx_np = np.asarray(pc.fill_null(idx, -1), dtype=np.int64)
        salt = np.zeros(batch.num_rows, np.int32)
        hot = idx_np >= 0
        if hot.any():
            o = np.asarray(pc.cast(batch.column(order_col),
                                   pa.int64()))[hot]
            mn = lo[idx_np[hot]]
            span = np.maximum(hi[idx_np[hot]] - mn, 1)
            salt[hot] = np.minimum(
                ((o - mn) * n_salt) // (span + 1), n_salt - 1
            ).astype(np.int32)
        return batch.append_column("salt", pa.array(salt))

    return ds.map_batches(add_salt, batch_format="pyarrow")


def revisit_stats_salted(ds, key_col: str = "user_id", ts_col: str = "ts",
                         state_col: str = "event_type",
                         id_col: str = "event_id", digits: int = 6,
                         hot_threshold: int = 100_000, n_salt: int = 16):
    """``revisit_stats`` with the hot-key partitioning assumption
    REMOVED: keys above ``hot_threshold`` observations are salted into
    contiguous time chunks (``salt_hot_keys``), per-chunk partials
    computed in parallel, then stitched per key — n_changes adds the
    chunk-boundary comparisons (last state of chunk i vs first state
    of chunk i+1), so the output is IDENTICAL to the unsalted
    operator at any skew."""
    salted = salt_hot_keys(ds, key_col, ts_col, hot_threshold,
                           n_salt=n_salt)

    def chunk_stats(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(pc.cast(g.column(ts_col), pa.int64()))
        st = np.asarray(g.column(state_col).to_pylist(), dtype=object)
        n = len(ts)
        return pa.table({
            key_col: pa.array([g.column(key_col)[0].as_py()],
                              g.schema.field(key_col).type),
            "salt": pa.array([g.column("salt")[0].as_py()], pa.int32()),
            "n": pa.array([n], pa.int64()),
            "changes": pa.array(
                [int((st[1:] != st[:-1]).sum()) if n > 1 else 0],
                pa.int64()),
            "first_ts": pa.array([int(ts[0])], pa.int64()),
            "last_ts": pa.array([int(ts[-1])], pa.int64()),
            "first_st": pa.array([str(st[0])], pa.string()),
            "last_st": pa.array([str(st[-1])], pa.string()),
        })

    def merge(group: pa.Table) -> pa.Table:
        g = group.sort_by([("salt", "ascending")])
        n = int(pc.sum(g.column("n")).as_py())
        changes = int(pc.sum(g.column("changes")).as_py())
        first_st = g.column("first_st").to_pylist()
        last_st = g.column("last_st").to_pylist()
        changes += sum(1 for i in range(1, len(first_st))
                       if last_st[i - 1] != first_st[i])
        ts0 = int(g.column("first_ts")[0].as_py())
        ts1 = int(g.column("last_ts")[-1].as_py())
        if n > 1:
            rate = pc.round(pa.array([changes / (n - 1)], pa.float64()),
                            ndigits=digits,
                            round_mode="half_towards_infinity")
            gap = pc.round(
                pa.array([(float(ts1 - ts0) / (n - 1)) / 1_000_000.0],
                         pa.float64()),
                ndigits=digits, round_mode="half_towards_infinity")
        else:
            rate = pa.array([None], pa.float64())
            gap = pa.array([None], pa.float64())
        return pa.table({
            key_col: pa.array([g.column(key_col)[0].as_py()],
                              g.schema.field(key_col).type),
            "n_obs": pa.array([n], pa.int64()),
            "n_changes": pa.array([changes], pa.int64()),
            "change_rate": rate,
            "mean_gap_s": gap,
        })

    return (salted.groupby([key_col, "salt"])
            .map_groups(chunk_stats, batch_format="pyarrow")
            .groupby(key_col).map_groups(merge, batch_format="pyarrow"))


def url_template_stats(ds, url_col: str = "url", num_token: str = "<n>"):
    """Per-(host, path-template) URL census: collapse digit runs in
    each URL to ``num_token`` and count how many URL rows collapse
    into each resulting template — the standard crawl-audit view for
    parameter explosions (calendar/session/pagination traps emit
    thousands of URLs under one template; see ``url_trap_stats`` for
    the per-host verdict this feeds). Output one row per (host,
    template): ``(host, template, n_urls, sample_url)`` with
    ``sample_url`` the lexicographic min (deterministic exemplar).

    Scale shape (100 TB frontier): the templating is ONE RE2 kernel per
    batch (same engine as the DuckDB oracle, so digit-run semantics
    cannot drift); per-batch Arrow group_by emits PARTIAL (host,
    template) aggregates so the wide groupby moves O(templates ×
    blocks) rows, never O(urls) — the ``url_trap_stats`` shape.
    """
    from ray.data.aggregate import Min, Sum

    from ..crawl.priority import _HOST_RE

    def partial(batch: pa.Table) -> pa.Table:
        u = pc.fill_null(pc.cast(batch.column(url_col), pa.string()), "")
        host = pc.fill_null(
            pc.struct_field(pc.extract_regex(u, _HOST_RE), "host"), ""
        )
        tmpl = pc.replace_substring_regex(u, pattern=r"[0-9]+",
                                          replacement=num_token)
        t = pa.table({
            "host": host,
            "template": tmpl,
            "n": pa.array(np.ones(len(u), np.int64)),
            "u": u,
        })
        return (
            t.group_by(["host", "template"])
            .aggregate([("n", "sum"), ("u", "min")])
            .rename_columns(["host", "template", "n", "u_min"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "template"])
        .aggregate(Sum("n", alias_name="n_urls"),
                   Min("u_min", alias_name="sample_url"))
    )


def dup_histogram(ds, text_col: str = "text", key_tokens: int = 8):
    """Duplicate-cluster size histogram — the dedup AUDIT report
    (how much of the corpus sits in clusters of size 2, 3, ...):
    group documents by the same prefix fingerprint ``mirror_sources``
    uses, then count groups per cluster size. Output ``(size,
    n_groups)`` sorted by size.

    Scale: two vectorized hash aggregates (content-key counts, then a
    partial-aggregated histogram of those counts) — the second is tiny
    (O(distinct cluster sizes)); nothing is driver-gathered.
    """
    from .dedup import _md5_col

    def keyed(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column(text_col), pa.string()), " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, key_tokens), " ")
        return pa.table({"content_key": _md5_col(prefix.to_pylist())})

    sizes = (ds.map_batches(keyed, batch_format="pyarrow")
             .groupby("content_key").count())

    def partial_hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"size": pc.cast(batch.column("count()"), pa.int64())})
        return (t.group_by("size").aggregate([("size", "count")])
                 .rename_columns(["size", "n"]))

    return (sizes.map_batches(partial_hist, batch_format="pyarrow")
            .groupby("size").sum("n")
            .map_batches(lambda t: t.rename_columns(["size", "n_groups"]),
                         batch_format="pyarrow")
            .sort("size"))


def source_overlap(ds, source_a: str, source_b: str,
                   text_col: str = "text", source_col: str = "source",
                   key_tokens: int = 8):
    """Relational set operations over content identity: which content
    fingerprints (same prefix key as mirror_sources/dup_histogram)
    appear in BOTH of two sources (INTERSECT), only the first
    (EXCEPT a), or only the second (EXCEPT b). One streaming keyed pass
    with per-block (key, flag) dedup, then a single max-flag hash
    aggregate — the set algebra falls out of two bit columns, no joins.
    """
    from .dedup import _md5_col

    def keyed(batch: pa.Table) -> pa.Table:
        src = pc.cast(batch.column(source_col), pa.string())
        m = pc.or_(pc.equal(src, source_a), pc.equal(src, source_b))
        b = batch.filter(m)
        src = pc.cast(b.column(source_col), pa.string())
        toks = pc.split_pattern(pc.cast(b.column(text_col), pa.string()), " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, key_tokens), " ")
        t = pa.table({
            "content_key": _md5_col(prefix.to_pylist()),
            "in_a": pc.cast(pc.equal(src, source_a), pa.int64()),
            "in_b": pc.cast(pc.equal(src, source_b), pa.int64()),
        })
        g = t.group_by(["content_key"]).aggregate(
            [("in_a", "max"), ("in_b", "max")])
        return g.rename_columns(["content_key", "in_a", "in_b"])

    flags = (ds.map_batches(keyed, batch_format="pyarrow")
             .groupby("content_key").max(["in_a", "in_b"]))

    def op_of(batch: pa.Table) -> pa.Table:
        a = np.asarray(pc.cast(batch.column("max(in_a)"), pa.int64()))
        b = np.asarray(pc.cast(batch.column("max(in_b)"), pa.int64()))
        ops = np.where(a & b, "intersect",
                       np.where(a.astype(bool), "except_a", "except_b"))
        return pa.table({
            "content_key": batch.column("content_key"),
            "op": pa.array(ops.tolist(), pa.string()),
        })

    return flags.map_batches(op_of, batch_format="pyarrow")


def vocab_by_source(ds, text_col: str = "text", source_col: str = "source"):
    """Exact vocabulary size per source: per-block deduped
    (source, token) pairs (the distinct_count_by_group discipline over
    an EXPLODED token stream — the shuffle moves distinct pairs per
    block, never the token stream itself), then two hash aggregates."""
    from .stats import distinct_count_by_group

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column(text_col),
                                        pa.string()), " ")
        lens = pc.fill_null(pc.list_value_length(toks), 0)
        flat = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        src = pc.cast(batch.column(source_col), pa.string())
        t = pa.table({
            "source": pa.array(np.repeat(
                np.asarray(src, dtype=object),
                np.asarray(lens, dtype=np.int64)), pa.string()),
            "token": flat.flatten(),
        })
        # block-side dedup before anything crosses the wire
        return t.group_by(["source", "token"]).aggregate([])

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    return distinct_count_by_group(pairs, "source", "token")


def source_vocab_jaccard(ds, text_col: str = "text",
                         source_col: str = "source", digits: int = 6):
    """Vocabulary Jaccard similarity between every PAIR of sources —
    the corpus-audit view of near-mirror hosts. Distinct
    (source, token) pairs SELF-JOIN on token for the intersections (one
    distributed hash join — output O(Σ per-token source-count²),
    bounded because sources ≪ tokens; a token shared by all S sources
    fans out S², not corpus-sized); per-source vocab sizes come from
    the same pair table; the final |A∩B| / (|A|+|B|−|A∩B|) runs on the
    O(sources²) table."""
    from ..pipelines.analytics import _to_table
    from .stats import distinct_count_by_group

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column(text_col),
                                        pa.string()), " ")
        lens = pc.fill_null(pc.list_value_length(toks), 0)
        flat = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        src = pc.cast(batch.column(source_col), pa.string())
        t = pa.table({
            "source": pa.array(np.repeat(
                np.asarray(src, dtype=object),
                np.asarray(lens, dtype=np.int64)), pa.string()),
            "token": flat.flatten(),
        })
        return t.group_by(["source", "token"]).aggregate([])

    pairs = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby(["source", "token"]).count()
             .drop_columns(["count()"])
             .materialize())  # feeds sizes AND the self-join

    sizes_t = _to_table(distinct_count_by_group(pairs, "source", "token"))
    size_of = {sizes_t.column("source")[i].as_py():
               sizes_t.column("n_distinct")[i].as_py()
               for i in range(sizes_t.num_rows)}

    from ..common import drop_empty_blocks

    def ren_a(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["src_a", "token"])

    def ren_b(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["src_b", "token"])

    joined = drop_empty_blocks(
        pairs.map_batches(ren_a, batch_format="pyarrow")).join(
        drop_empty_blocks(pairs.map_batches(ren_b, batch_format="pyarrow")),
        "inner", 8, on=("token",))

    def keep_ordered(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch.column("src_a"),
                                    batch.column("src_b")))

    inter = _to_table(
        joined.map_batches(keep_ordered, batch_format="pyarrow")
        .groupby(["src_a", "src_b"]).count())
    if inter.num_rows == 0:
        return pa.table({"src_a": pa.array([], pa.string()),
                         "src_b": pa.array([], pa.string()),
                         "n_common": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    inter = inter.rename_columns(["src_a", "src_b", "n_common"])
    a = inter.column("src_a").to_pylist()
    b = inter.column("src_b").to_pylist()
    common = np.asarray(inter.column("n_common"), dtype=np.int64)
    union = np.array([size_of[x] for x in a], np.int64) + \
        np.array([size_of[x] for x in b], np.int64) - common
    jac = pc.round(pa.array(common / union.astype(np.float64),
                            pa.float64()),
                   ndigits=digits, round_mode="half_towards_infinity")
    return pa.table({
        "src_a": inter.column("src_a"),
        "src_b": inter.column("src_b"),
        "n_common": pa.array(common, pa.int64()),
        "jaccard": jac,
    }).sort_by([("src_a", "ascending"), ("src_b", "ascending")])


def badword_stats(ds, words, text_col: str = "text",
                  source_col: str = "source"):
    """Dictionary-based policy filter report (the C4 "bad words list"
    pass, Raffel et al. 2020 §2.2): per source, how many documents
    contain ≥1 blocklisted token and the total flagged-token count.
    Token membership is ONE ``pc.is_in`` over the flattened token
    array per batch (stays in C), per-doc counts fold with a
    bincount, and each block emits O(sources) partial rows — the
    shuffle never sees document text."""
    arr = pa.array(sorted(set(words)), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(text_col), pa.string())
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        hit = pc.is_in(flat, value_set=arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        idx = np.repeat(np.arange(len(lens)), lens)
        nb = np.bincount(idx, weights=hit, minlength=len(lens)).astype(np.int64)
        t = pa.table({
            source_col: batch.column(source_col),
            "docs": pa.array(np.ones(len(lens), np.int64)),
            "flagged": pa.array((nb > 0).astype(np.int64)),
            "bad_tokens": pa.array(nb),
        })
        g = t.group_by([source_col]).aggregate(
            [("docs", "sum"), ("flagged", "sum"), ("bad_tokens", "sum")])
        return g.rename_columns([source_col, "docs", "flagged", "bad_tokens"])

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(source_col)
           .aggregate(Sum("docs", alias_name="docs"),
                      Sum("flagged", alias_name="flagged"),
                      Sum("bad_tokens", alias_name="bad_tokens")))
    return out.map_batches(
        lambda t: t.rename_columns([source_col, "docs", "flagged",
                                    "bad_tokens"]),
        batch_format="pyarrow").sort(source_col)


def source_kl(ds, text_col: str = "text", source_col: str = "source",
              digits: int = 6, num_partitions: int = 8):
    """Per-source KL divergence (bits) of the token distribution vs
    the whole corpus — the domain-drift monitor: a source whose
    language diverges from the corpus mix scores high. Exact counts
    end to end: per-block (source, token) partials → one hash
    aggregate; global token counts are a second aggregate over the
    SAME (vocab-bounded) table, joined back distributed on token.
    Each term p·log2(p/q) is quantized to 1e-9 and summed as int64 —
    the float sum is order-independent, so the result hash-matches a
    SQL oracle computing the identical quantized terms. (q > 0
    wherever p > 0 because the corpus contains every source.)"""
    from ray.data.aggregate import Sum

    from ..common import drop_empty_blocks

    def tok_counts(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch.column(text_col), pa.string())
        toks = pc.split_pattern(text, " ")
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        srcs = pc.cast(batch.column(source_col), pa.string())
        t = pa.table({
            source_col: srcs.take(pa.array(
                np.repeat(np.arange(len(lens)), lens), pa.int64())),
            "tok": pc.list_flatten(toks),
        })
        g = t.group_by([source_col, "tok"]).aggregate([([], "count_all")])
        return g.rename_columns([source_col, "tok", "c"])

    st = (ds.map_batches(tok_counts, batch_format="pyarrow")
          .groupby([source_col, "tok"]).sum("c")
          .map_batches(lambda t: t.rename_columns([source_col, "tok", "c"]),
                       batch_format="pyarrow"))
    st = drop_empty_blocks(st).materialize()

    gt = (st.groupby("tok").sum("c")
          .map_batches(lambda t: t.rename_columns(["tok", "gc"]),
                       batch_format="pyarrow"))
    from ..pipelines.analytics import _to_table

    per_source = _to_table(st.groupby(source_col).sum("c"))
    n_by_src = {r[source_col]: int(r["sum(c)"])
                for r in per_source.to_pylist()}
    gn = float(sum(n_by_src.values()))

    joined = drop_empty_blocks(st).join(
        drop_empty_blocks(gt), "inner", num_partitions, on=("tok",))

    def terms(batch: pa.Table) -> pa.Table:
        # per-source totals looked up via dictionary codes — Python
        # touches O(distinct sources) labels, not O(rows)
        enc = batch.column(source_col).combine_chunks().dictionary_encode()
        lut = np.asarray([n_by_src[s] for s in enc.dictionary.to_pylist()],
                         dtype=np.float64)
        c = np.asarray(batch.column("c"), dtype=np.float64)
        gc = np.asarray(batch.column("gc"), dtype=np.float64)
        n = lut[np.asarray(enc.indices, dtype=np.int64)]
        p = c / n
        q = gc / gn
        term = p * np.log2(p / q)
        qterm = np.round(term * 1e9).astype(np.int64)
        return pa.table({source_col: batch.column(source_col),
                         "qt": pa.array(qterm)})

    out = (joined.map_batches(terms, batch_format="pyarrow")
           .groupby(source_col).aggregate(Sum("qt", alias_name="qt")))

    def finalize(batch: pa.Table) -> pa.Table:
        kl = pc.round(
            pc.divide(pc.cast(batch.column("qt"), pa.float64()), 1e9),
            ndigits=digits, round_mode="half_towards_infinity")
        return pa.table({source_col: batch.column(source_col),
                         "kl_bits": kl})

    return out.map_batches(finalize, batch_format="pyarrow").sort(source_col)
