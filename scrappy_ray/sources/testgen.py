"""Deterministic synthetic web: the Common-Crawl-style pages table.

Per BASELINE.json ``input_hint`` the engine's input is a Parquet table
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``; "fetching" a URL means looking it up here. This module
synthesizes that table at any scale, seeded and reproducible — page
content is a pure function of the page id, so any subset of ids can be
generated independently (embarrassingly parallel via Ray Data).

The corpus embeds every feature the KB fixture needs (FIXTURES.md §1):
link graph with relative+absolute hrefs, hot-host skew, deep chains,
pagination typed sc:Page, NewUri-minted tags (nofollow), NBSP bytes,
``|``-separated slices, section headings, visual v* attributes,
boolean/normalize fields, robots.txt pages, and articles with a
missing title to exercise min-cardinality drops.

Layout for ``n_hosts`` hosts × ``pages_per_host`` articles:
  http://site{k}.test/            index (links to first articles)
  http://site{k}.test/?page=2     pagination (sc:Page typed)
  http://site{k}.test/art/{i}     article i ∈ [0, pages_per_host)
  http://site{k}.test/robots.txt  robots (disallows /private/)
  http://site{k}.test/private/{j} crawlable-but-disallowed pages
Article i links to children 3i+1..3i+3 (BFS tree ⇒ depth semantics),
a hot-host article (skew), and a duplicate of its first link.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import pyarrow as pa

EPOCH_US = 1_600_000_000 * 1_000_000  # deterministic base timestamp


@dataclass
class SynthWebConfig:
    n_hosts: int = 4
    pages_per_host: int = 40
    hot_host: int = 0
    seed: int = 42

    @property
    def total_pages(self) -> int:
        # index + pagination + robots + privates(2) per host, + articles
        return self.n_hosts * (self.pages_per_host + 5)


def _h(cfg: SynthWebConfig, *parts) -> int:
    raw = (":".join(str(p) for p in parts) + f":{cfg.seed}").encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def host_url(k: int) -> str:
    return f"http://site{k}.test"


def seed_urls(cfg: SynthWebConfig) -> list[str]:
    return [f"{host_url(k)}/" for k in range(cfg.n_hosts)]


# -- per-page HTML ------------------------------------------------------

_WORDS = (
    "data web crawl graph node batch arrow stream shard block "
    "tierra mundo noticia datos red sistema grafo flujo".split()
)


def _words(cfg, key, n):
    return " ".join(_WORDS[_h(cfg, key, i) % len(_WORDS)] for i in range(n))


def _index_html(cfg: SynthWebConfig, k: int, page_no: int) -> str:
    base = host_url(k)
    first = (page_no - 1) * 5
    arts = [i for i in range(first, min(first + 5, cfg.pages_per_host))]
    items = "\n".join(
        f'<div class="noticia" vx="10" vy="{100 + 40 * j}" vw="600" vh="30" vsize="14" '
        f'vfont="Arial" vweight="400"><h3><a href="/art/{i}">Story {i} of site{k}</a></h3></div>'
        for j, i in enumerate(arts)
    )
    pagination = (
        f'<div class="pagination"><a href="{base}/?page={page_no + 1}">next</a></div>'
        if page_no == 1
        else ""
    )
    return (
        f"<html><head><title>site{k} index</title></head><body>"
        f'<h1 vx="10" vy="10" vw="600" vh="40" vsize="28" vfont="Georgia" vweight="700">site{k} news</h1>'
        f"{items}{pagination}"
        f'<div class="footer"><a href="http://site{cfg.hot_host}.test/">partner</a></div>'
        f"</body></html>"
    )


def _article_html(cfg: SynthWebConfig, k: int, i: int) -> str:
    base = host_url(k)
    missing_title = i % 7 == 3
    title = "" if missing_title else f"<h2>Article {i} — {_words(cfg, (k, i, 't'), 3)}</h2>"
    author = f"site{k} reporter {i % 9}"
    location = ["Madrid", "Lima", "Quito", "Bogota"][_h(cfg, (k, i, "loc")) % 4]
    date = f"2020-{1 + i % 12:02d}-{1 + i % 28:02d}"
    score = _h(cfg, (k, i, "s")) % 140  # some exceed normalize range 0-100
    featured = ["yes", "no", "maybe", "true", "-"][_h(cfg, (k, i, "f")) % 5]
    tag = f"Tag {_WORDS[_h(cfg, (k, i, 'tag')) % len(_WORDS)]}"

    kids = [j for j in (3 * i + 1, 3 * i + 2, 3 * i + 3) if j < cfg.pages_per_host]
    links = "".join(f'<a href="/art/{j}">rel {j}</a> ' for j in kids)
    if kids:  # duplicate link (seen-set exercise)
        links += f'<a href="/art/{kids[0]}">again</a> '
    links += f'<a href="http://site{cfg.hot_host}.test/art/{i % max(1, cfg.pages_per_host)}?ref=x{k}">hot</a> '
    if i % 11 == 5:
        links += f'<a href="{base}/private/{i % 2}">secret</a> '

    nbsp = " "
    body_words = _words(cfg, (k, i, "b"), 20)
    refs = (
        "<h4>references</h4>"
        f"<p>ref one {_words(cfg, (k, i, 'r1'), 4)}</p>"
        f"<p>ref two{nbsp}{_words(cfg, (k, i, 'r2'), 4)}</p>"
        "<h4>other</h4><p>not a reference</p>"
    )
    wiki = (
        f'<div class="content"><h2>Section {i}</h2><p>{body_words}</p>'
        f'<ul><li>alpha {i}</li><li>beta <b>bold{nbsp}text</b></li></ul>'
        f'<pre>code {i}</pre><a href="/art/{i}">self</a></div>'
    )
    return (
        f"<html><head><title>art {i}</title></head><body>"
        f'<div class="noticia" vx="20" vy="80" vw="600" vh="400" vsize="18" vfont="Georgia" vweight="700">'
        f"{title}"
        f'<div class="firma"><em>{author}</em><span class="localizacion">{location}</span></div>'
        f'<div class="metadata_noticia"><span class="fecha">published | {date} | {i}</span></div>'
        f'<div class="meta"><span class="featured">{featured}</span><span class="score">{score}</span></div>'
        f'<span class="tagname">{tag}</span>'
        f"</div>"
        f"{wiki}{refs}"
        f'<div class="links">{links}</div>'
        f"</body></html>"
    )


def _robots_html(cfg: SynthWebConfig, k: int) -> str:
    # served as the page body; the RobotsCache actor parses this text
    return "User-agent: *\nDisallow: /private/\n"


def _private_html(cfg: SynthWebConfig, k: int, j: int) -> str:
    return (
        f"<html><body><h2>private {j} of site{k}</h2>"
        f'<div class="links"><a href="/art/0">back</a></div></body></html>'
    )


def page_for_url(cfg: SynthWebConfig, url: str):
    """The synthetic web as a function url → (html, lang) | None.
    Used by the simulator for oracle-free golden generation."""
    for k in range(cfg.n_hosts):
        base = host_url(k)
        if url == f"{base}/":
            return _index_html(cfg, k, 1), "en"
        if url == f"{base}/?page=2":
            return _index_html(cfg, k, 2), "en"
        if url == f"{base}/robots.txt":
            return _robots_html(cfg, k), "en"
        if url.startswith(f"{base}/art/"):
            tail = url[len(f"{base}/art/") :].split("?", 1)[0]
            if tail.isdigit() and int(tail) < cfg.pages_per_host:
                i = int(tail)
                return _article_html(cfg, k, i), ("es" if i % 3 == 2 else "en")
        if url.startswith(f"{base}/private/"):
            tail = url[len(f"{base}/private/") :]
            if tail.isdigit() and int(tail) < 2:
                return _private_html(cfg, k, int(tail)), "en"
    return None


def all_urls(cfg: SynthWebConfig) -> list[str]:
    urls = []
    for k in range(cfg.n_hosts):
        base = host_url(k)
        urls.append(f"{base}/")
        urls.append(f"{base}/?page=2")
        urls.append(f"{base}/robots.txt")
        urls.extend(f"{base}/art/{i}" for i in range(cfg.pages_per_host))
        urls.extend(f"{base}/private/{j}" for j in range(2))
    return urls


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def make_page_batch(cfg: SynthWebConfig, urls: list[str]) -> pa.Table:
    """Build a pages-table batch for a list of urls (pure function —
    the Ray-parallel generation path maps this over url shards)."""
    from ..htmldom.dom import parse_html

    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for url in urls:
        page = page_for_url(cfg, url)
        if page is None:
            continue
        html, lang = page
        rows["url"].append(url)
        rows["warc_ts"].append(EPOCH_US + (_h(cfg, ("ts", url)) % 10_000_000) * 1_000_000)
        rows["html"].append(html.encode("utf-8"))
        rows["text"].append(parse_html(html).text)
        rows["lang"].append(lang)
    return pa.Table.from_pydict(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )


def generate_table(cfg: SynthWebConfig) -> pa.Table:
    return make_page_batch(cfg, all_urls(cfg))


def generate_parquet(cfg: SynthWebConfig, path: str, use_ray: bool = False, shard_size: int = 2000) -> str:
    """Write the pages table. With ``use_ray`` the url list is sharded
    and built via Ray Data map_batches (the 100TB-scale generation
    path); otherwise a single local parquet file."""
    import os

    os.makedirs(path, exist_ok=True)
    if not use_ray:
        import pyarrow.parquet as pq

        pq.write_table(generate_table(cfg), os.path.join(path, "part-0.parquet"))
        return path

    import ray.data

    urls = all_urls(cfg)

    def build(batch: pa.Table) -> pa.Table:
        return make_page_batch(cfg, batch.column("url").to_pylist())

    ds = ray.data.from_arrow(pa.Table.from_pydict({"url": pa.array(urls)}))
    ds.map_batches(build, batch_format="pyarrow", batch_size=shard_size).write_parquet(path)
    return path


# -- the KB fixture -----------------------------------------------------

def synth_kb_yaml() -> str:
    """The synthetic-web KB: a faithful retarget of the elmundo KB shape
    (/root/reference/extractors/elmundo.yarf:5-92) plus coverage for
    every selector type (Slice, Section, NewUri, Visual, boolean,
    normalize, WikiText/Html formats, cardinality)."""
    return """
prefixes:
  loc: "http://www.daml.org/experiment/ontology/location-ont#"
fragments:
  # index pages: post list + pagination (sc:Page ⇒ followed without
  # depth decrement, agent.rb:66,80)
  - name: index
    selector: {type: UriPattern, value: "http://site*.test/"}
    identifier: {type: BaseUri}
    type: sc:Index
    subfragments:
      - type: sioc:Post
        relation: sioc:container_of
        selector: {type: Css, value: ".noticia h3"}
        identifier: {type: Css, value: "a", attribute: href}
        subfragments:
          - type: rdf:Literal
            relation: dc:title
            selector: {type: Css, value: "a"}
      - type: sc:Page
        relation: sc:page
        selector: {type: Css, value: ".pagination a"}
        identifier: {type: Root, attribute: href}
  # pagination variants are indexes too
  - name: index_paged
    selector: {type: UriPattern, value: "http://site*.test/?page=*"}
    identifier: {type: BaseUri}
    type: sc:Index
    subfragments:
      - type: sioc:Post
        relation: sioc:container_of
        selector: {type: Css, value: ".noticia h3"}
        identifier: {type: Css, value: "a", attribute: href}
        subfragments:
          - type: rdf:Literal
            relation: dc:title
            selector: {type: Css, value: "a"}
  # article pages (elmundo 'noticia' shape)
  - name: article
    selector: {type: UriPattern, value: "http://site*.test/art/*"}
    identifier: {type: BaseUri}
    type: sioc:Post
    subfragments:
      - type: rdf:Literal
        relation: dc:title
        min_cardinality: 1
        selector: {type: Css, value: ".noticia h2"}
      - type: rdf:Literal
        relation: dc:creator
        selector: {type: Css, value: ".noticia .firma em"}
      - type: loc:Location
        relation: loc:location
        selector: {type: Css, value: ".noticia .firma .localizacion"}
        subfragments:
          - type: rdf:Literal
            relation: rdf:label
            selector: {type: Root}
      - type: rdf:Literal
        relation: dc:date
        selector:
          type: Css
          value: ".metadata_noticia .fecha"
          selector: {type: Slice, value: "|", index: 1}
      - type: rdf:Literal
        relation: sc:featured
        selector: {type: Css, value: ".meta .featured", boolean: "true"}
      - type: rdf:Literal
        relation: sc:score
        selector:
          type: Css
          value: ".meta .score"
          normalize_min: 0
          normalize_max: 100
          normalize_in_range: "true"
      - type: rdf:Literal
        relation: sc:refs
        selector: {type: Section, value: "references", nonempty: "true"}
      - type: rdf:Literal
        relation: sc:wiki
        selector: {type: Css, value: ".content", format: wikitext}
      - type: sc:Tag
        relation: sc:tag
        selector: {type: Css, value: ".tagname"}
        identifier:
          type: Root
          selector: {type: NewUri, prefix: "http://tags.test/", downcase: "true"}
      - # crawlable related links (plain rdf:Resource objects)
        relation: sioc:links_to
        selector: {type: Css, value: ".links a"}
        identifier: {type: Root, attribute: href}
  # visual headline fragment — applies to EVERY page (extractor.rb:48).
  # (A top-level rdf:Literal fragment would be dropped: extract_graph
  # only merges node results, extractor.rb:57 — so the headline is a
  # bnode with a literal subfragment.)
  - name: visual_headlines
    type: sc:Headline
    selector:
      type: Visual
      min_font_size: 20
      min_font_weight: 600
    subfragments:
      - type: rdf:Literal
        relation: sc:text
        selector: {type: Root, nonempty: "true"}
"""
