"""HTTP front over the engine — the reference's web-service surface.

Mirrors /root/reference/lib/scrappy/server/server.rb:19-41 (the
``/:format/*`` extraction proxy, with the ``http:/``→``http://`` path
fixup, JSONP ``?callback=``, and per-format content types from
agent.rb:12-13) and the admin API of server/admin.rb:10-252
(extractors CRUD, samples CRUD, train / test / optimize) as JSON
endpoints over the same engine objects (KB, trainer, optimizer,
per-predicate metrics).

Built on stdlib ``ThreadingHTTPServer`` — one process, thread-per-
request, sharing an in-memory ``EngineState``. Extraction of a single
URL is a pure-Python path (page-store point lookup + extract), so the
server needs no Ray session; heavy batch work stays in the Dataset
pipelines.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit

from ..extractor.core import clean_triples, extract
from ..functions.metrics import per_predicate_metrics, prf
from ..kb.loader import load_kb
from ..kb.model import KB
from ..learning import optimize_extractors, train
from ..sources.serializers import SERIALIZERS, serialize
from ..stages.fetch import default_num_buckets, lookup_urls

# agent.rb:12-13 ContentTypes (+ sensible text/plain defaults)
CONTENT_TYPES = {
    "rdfxml": "application/rdf+xml",
    "rdf": "application/rdf+xml",
    "json": "application/json",
    "ejson": "application/json",
    "ntriples": "text/plain",
    "yarf": "text/plain",
    "dot": "text/vnd.graphviz",
    "png": "image/png",  # server.rb png content type; rendered by sources/pngraph.py
}


class EngineState:
    """Shared server state: the KB, the samples store, and the pages
    table the 'fetch' resolves against."""

    def __init__(self, kb: KB | None = None, pages_store: str | None = None,
                 num_buckets: int | None = None, base_kb: KB | None = None):
        self.kb = kb or KB()
        self.base_kb = base_kb or self.kb  # trainer's provenance KB
        self.pages_store = pages_store
        self.num_buckets = num_buckets
        self.samples: list[dict] = []
        self.lock = threading.RLock()

    def fetch_html(self, url: str) -> bytes | None:
        if not self.pages_store:
            return None
        if self.num_buckets is None:
            self.num_buckets = default_num_buckets(self.pages_store)
        rows = lookup_urls(self.pages_store, self.num_buckets, [url])
        return rows[0]["html"] if rows else None

    def extract_url(self, url: str):
        html = self.fetch_html(url)
        if html is None:
            return None
        with self.lock:
            kb = self.kb
        return clean_triples(list(extract(kb, url, html).triples))


def _fix_scheme(url: str) -> str:
    # server.rb:29 — collapsed '//' in path-embedded URLs
    if re.search(r"https?:/\w", url):
        url = url.replace("http:/", "http://").replace("https:/", "https://")
    return url


class _Handler(BaseHTTPRequestHandler):
    state: EngineState  # injected by make_server

    # ---- helpers -----------------------------------------------------
    def _send(self, code: int, body: str | bytes, ctype: str = "application/json"):
        data = body.encode("utf-8") if isinstance(body, str) else body
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _json(self, code: int, obj):
        self._send(code, json.dumps(obj, indent=1, sort_keys=True))

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def log_message(self, *a):  # quiet; tests capture responses, not logs
        pass

    # ---- routing -----------------------------------------------------
    def do_GET(self):
        self._route("GET")

    def do_POST(self):
        self._route("POST")

    def do_DELETE(self):
        self._route("DELETE")

    def _route(self, method: str):
        try:
            split = urlsplit(self.path)
            parts = [unquote(p) for p in split.path.split("/") if p != ""]
            q = {k: v[0] for k, v in parse_qs(split.query).items()}
            wants_html = method == "GET" and "text/html" in (
                self.headers.get("Accept") or "")
            if not parts:
                if wants_html:
                    from . import ui

                    return self._send(200, ui.home_page(), "text/html")
                return self._json(200, {"service": "scrappy_ray", "formats": sorted(SERIALIZERS)})
            if parts == ["help"] and method == "GET":
                from . import ui

                return self._send(200, ui.help_page(), "text/html")
            if parts == ["javascript"] and method == "GET":
                from . import ui

                return self._send(200, ui.annotator_js(),
                                  "application/javascript")
            if parts[0] == "extractors":
                if wants_html and not parts[1:]:
                    from . import ui

                    with self.state.lock:
                        uris = sorted({
                            v
                            for f in self.state.kb.fragments
                            for s in f.selectors
                            if s.type in ("Uri", "UriPattern")
                            for v in s.values
                        })
                    return self._send(200, ui.extractors_page(uris),
                                      "text/html")
                return self._extractors(method, parts[1:])
            if parts[0] == "samples":
                if wants_html and not parts[1:]:
                    from . import ui

                    with self.state.lock:
                        ss = [{"id": i, "url": s["url"]}
                              for i, s in enumerate(self.state.samples)]
                    return self._send(200, ui.samples_page(ss), "text/html")
                return self._samples(method, parts[1:])
            if parts[0] == "kb" and method == "GET":
                return self._kb()
            if parts[0] in SERIALIZERS and len(parts) >= 2 and method in ("GET", "POST"):
                # raw subpath (not the re-joined parts) so trailing
                # slashes in the target URL survive
                raw = unquote(split.path)
                return self._proxy(parts[0], raw[len(parts[0]) + 2 :], q)
            self._json(404, {"error": f"no route {method} {split.path}"})
        except Exception as e:  # server.rb:38-40 — 500 on internal error
            self._json(500, {"error": f"{type(e).__name__}: {e}"})

    # ---- /:format/* (server.rb:19-41) --------------------------------
    def _proxy(self, fmt: str, url: str, q: dict):
        url = _fix_scheme(url)
        triples = self.state.extract_url(url)
        if triples is None:
            return self._json(404, {"error": f"url not in pages table: {url}"})
        out = serialize([(s, p, str(o), lit) for s, p, o, lit in triples], fmt)
        callback = q.get("callback")
        if callback and isinstance(out, str):  # JSONP (server.rb:36) — text formats only
            return self._send(200, f"{callback}({out})", "application/javascript")
        self._send(200, out, CONTENT_TYPES.get(fmt, "text/plain"))

    # ---- /extractors (admin.rb:30-60) --------------------------------
    def _extractors(self, method: str, rest: list[str]):
        st = self.state
        if method == "GET" and not rest:
            with st.lock:
                uris = sorted(
                    {
                        v
                        for f in st.kb.fragments
                        for s in f.selectors
                        if s.type in ("Uri", "UriPattern")
                        for v in s.values
                    }
                )
            return self._json(200, {"extractors": uris})
        if method == "POST" and not rest:
            new = load_kb(self._body().decode("utf-8"))
            with st.lock:
                st.kb.fragments.extend(new.fragments)
                st.kb.prefixes.update(new.prefixes)
            return self._json(201, {"added": len(new.fragments)})
        if method == "DELETE" and rest:
            # use the raw path so trailing slashes in the URI survive
            raw = unquote(urlsplit(self.path).path)
            uri = _fix_scheme(raw[len("/extractors/") :])
            with st.lock:
                before = len(st.kb.fragments)
                st.kb.fragments = [
                    f
                    for f in st.kb.fragments
                    if not any(
                        s.type in ("Uri", "UriPattern") and uri in s.values for s in f.selectors
                    )
                ]
                removed = before - len(st.kb.fragments)
            return self._json(200, {"removed": removed})
        self._json(404, {"error": "bad extractors route"})

    # ---- /samples (admin.rb:93-252) ----------------------------------
    def _samples(self, method: str, rest: list[str]):
        st = self.state
        if method == "GET" and not rest:
            with st.lock:
                return self._json(
                    200,
                    {"samples": [{"id": i, "url": s["url"]} for i, s in enumerate(st.samples)]},
                )
        if method == "POST" and not rest:
            doc = json.loads(self._body() or b"{}")
            if "url" not in doc or "html" not in doc:
                return self._json(400, {"error": "need url and html"})
            with st.lock:
                st.samples.append({"url": doc["url"], "html": doc["html"]})
                sid = len(st.samples) - 1
            return self._json(201, {"id": sid})
        if rest and rest[0] == "train" and method == "POST":
            sid = int(rest[1])
            with st.lock:
                sample = st.samples[sid]
                frags = train(st.base_kb, sample["url"], sample["html"])
                st.kb.fragments.extend(frags)
            return self._json(200, {"trained_fragments": len(frags)})
        if rest and rest[0] == "test" and method == "POST":
            sid = int(rest[1])
            with st.lock:
                sample = st.samples[sid]
                kb = st.kb
            got = {
                (s, p, str(o))
                for s, p, o, lit in clean_triples(list(extract(kb, sample["url"], sample["html"]).triples))
            }
            golden = {
                (s, p, str(o))
                for s, p, o, lit in clean_triples(
                    list(extract(st.base_kb, sample["url"], sample["html"]).triples)
                )
            }
            # admin.rb:167-239: total + per-predicate P/R/F
            per_pred = per_predicate_metrics(golden, got).to_pylist()
            return self._json(200, {"total": prf(golden, got), "per_predicate": per_pred})
        if rest and rest[0] == "optimize" and method == "POST":
            with st.lock:
                samples = [
                    {
                        "url": s["url"],
                        "html": s["html"],
                        "golden": {
                            (x, p, str(o))
                            for x, p, o, lit in clean_triples(
                                list(extract(st.base_kb, s["url"], s["html"]).triples)
                            )
                        },
                    }
                    for s in st.samples
                ]
                st.kb = optimize_extractors(st.kb, samples)
                n = len(st.kb.fragments)
            return self._json(200, {"fragments": n})
        if method == "GET" and rest:
            sid = int(rest[0])
            with st.lock:
                if sid >= len(st.samples):
                    return self._json(404, {"error": "no such sample"})
                return self._json(200, {"id": sid, **{k: str(v) for k, v in st.samples[sid].items()}})
        if method == "DELETE" and rest:
            sid = int(rest[0])
            with st.lock:
                if sid >= len(st.samples):
                    return self._json(404, {"error": "no such sample"})
                st.samples.pop(sid)
            return self._json(200, {"remaining": len(st.samples)})
        self._json(404, {"error": "bad samples route"})

    # ---- /kb ----------------------------------------------------------
    def _kb(self):
        with self.state.lock:
            n = len(self.state.kb.fragments)
            uris = sorted(
                {
                    v
                    for f in self.state.kb.fragments
                    for s in f.selectors
                    if s.type in ("Uri", "UriPattern")
                    for v in s.values
                }
            )
        self._json(200, {"fragments": n, "extractor_uris": uris})


def make_server(state: EngineState, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``port=0`` picks a free one.
    Call ``serve_forever()`` (e.g. in a thread) and ``shutdown()``."""
    handler = type("BoundHandler", (_Handler,), {"state": state})
    return ThreadingHTTPServer((host, port), handler)
