"""HTTP service tests: the /:format/* extraction proxy
(server.rb:19-41) and the admin API (admin.rb:30-252) driven through a
real ThreadingHTTPServer over loopback."""

import json
import threading
import urllib.request

import pytest

from scrappy_ray.kb import load_kb
from scrappy_ray.server import EngineState, make_server

KB_YAML = """
prefixes:
  dc: http://purl.org/dc/elements/1.1/
fragments:
  - name: titles
    selector: {type: Uri, value: "http://s.test/page"}
    identifier: {type: BaseUri}
    type: sc:Index
    subfragments:
      - type: sioc:Post
        selector: {type: Css, value: "h1"}
        identifier: {type: BaseUri}
        subfragments:
          - type: rdf:Literal
            relation: dc:title
            selector: {type: Root, nonempty: "true"}
"""

HTML = b"<html><body><h1>Hello Service</h1></body></html>"


class _Store:
    """EngineState with fetch stubbed to an in-memory page map (the
    page-store lookup path is covered by crawl tests)."""

    def __init__(self, kb, pages):
        self.state = EngineState(kb=kb)
        self.state.fetch_html = lambda url: pages.get(url)


@pytest.fixture(scope="module")
def server():
    kb = load_kb(KB_YAML)
    wrapped = _Store(kb, {"http://s.test/page": HTML})
    srv = make_server(wrapped.state)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, wrapped.state
    srv.shutdown()


def _get(url, method="GET", data=None):
    req = urllib.request.Request(url, method=method, data=data)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.headers.get("Content-Type"), r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read().decode()


def test_root_lists_formats(server):
    base, _ = server
    code, _, body = _get(base + "/")
    assert code == 200
    assert "ntriples" in json.loads(body)["formats"]


def test_format_proxy_ntriples_and_fixup(server):
    base, _ = server
    # the single-slash form the reference fixes up (server.rb:29)
    code, ctype, body = _get(base + "/ntriples/http:/s.test/page")
    assert code == 200 and ctype == "text/plain"
    assert "Hello Service" in body and "<http://purl.org/dc/elements/1.1/title>" in body


def test_format_proxy_rdfxml_content_type(server):
    base, _ = server
    code, ctype, body = _get(base + "/rdfxml/http://s.test/page")
    assert code == 200 and ctype == "application/rdf+xml"
    assert body.startswith('<?xml version="1.0"')


def test_format_proxy_jsonp_callback(server):
    base, _ = server
    code, ctype, body = _get(base + "/json/http://s.test/page?callback=cb")
    assert code == 200 and ctype == "application/javascript"
    assert body.startswith("cb(") and body.endswith(")")


def test_proxy_404_for_unknown_url(server):
    base, _ = server
    code, _, _ = _get(base + "/ntriples/http://missing.test/x")
    assert code == 404


def test_admin_extractors_crud(server):
    base, _ = server
    code, _, body = _get(base + "/extractors")
    assert code == 200
    assert json.loads(body)["extractors"] == ["http://s.test/page"]
    new_kb = (
        "fragments:\n"
        "  - selector: {type: Uri, value: 'http://added.test/'}\n"
        "    type: sc:Index\n"
    )
    code, _, body = _get(base + "/extractors", "POST", new_kb.encode())
    assert code == 201 and json.loads(body)["added"] == 1
    code, _, body = _get(base + "/extractors")
    assert "http://added.test/" in json.loads(body)["extractors"]
    code, _, body = _get(base + "/extractors/http://added.test/", "DELETE")
    assert code == 200 and json.loads(body)["removed"] == 1
    code, _, body = _get(base + "/extractors")
    assert "http://added.test/" not in json.loads(body)["extractors"]


def test_admin_samples_train_test(server):
    base, state = server
    sample = json.dumps({"url": "http://s.test/page", "html": HTML.decode()})
    code, _, body = _get(base + "/samples", "POST", sample.encode())
    assert code == 201
    sid = json.loads(body)["id"]
    code, _, body = _get(base + "/samples")
    assert any(s["id"] == sid for s in json.loads(body)["samples"])
    # test: engine KB vs base KB on the sample → P/R/F (admin.rb:167-239)
    code, _, body = _get(base + f"/samples/test/{sid}", "POST")
    assert code == 200
    rep = json.loads(body)
    assert rep["total"]["fscore"] == 1.0  # kb == base_kb here
    assert any(r["predicate"] == "dc:title" for r in rep["per_predicate"])
    # train: adds trained fragments to the KB
    n_before = len(state.kb.fragments)
    code, _, body = _get(base + f"/samples/train/{sid}", "POST")
    assert code == 200 and json.loads(body)["trained_fragments"] >= 1
    assert len(state.kb.fragments) > n_before
    # delete the sample
    code, _, body = _get(base + f"/samples/{sid}", "DELETE")
    assert code == 200


def test_bad_route_404_and_error_500(server):
    base, _ = server
    code, _, _ = _get(base + "/nope")
    assert code == 404
    code, _, _ = _get(base + "/samples/train/999", "POST")
    assert code == 500  # IndexError surfaced as internal error (server.rb:38-40)
