"""Minimal admin web UI: the reference's haml views re-expressed as
stdlib-rendered HTML over the SAME endpoints (reference:
views/home.haml, views/extractors.haml, views/samples.haml,
views/help.haml, layout in views/layout.haml; routes in
lib/scrappy/server/admin.rb:10-30).

Served by content negotiation: a browser (Accept: text/html) GETting
/, /extractors, /samples or /help receives these pages; API clients
keep the JSON responses unchanged. No template engine, no static
assets — one <style> block stands in for public/stylesheets, and the
visual-annotation bookmarklet (public/javascripts/annotator.js's job:
injecting ``v*`` attributes for VisualSelector training) is a small
inline script at /javascript."""

from __future__ import annotations

import html as _html

_STYLE = """
body{font-family:sans-serif;margin:2em auto;max-width:52em;color:#222}
#bar{border-bottom:1px solid #ccc;padding-bottom:.5em;margin-bottom:1.5em}
#bar a{margin-right:1.2em;text-decoration:none;color:#06c}
#footer{border-top:1px solid #ccc;margin-top:2em;padding-top:.5em;
 font-size:.85em;color:#777}
table{border-collapse:collapse}td,th{border:1px solid #ddd;padding:.3em .6em}
input,select,button{font-size:1em;padding:.2em}
code,pre{background:#f6f6f6;padding:.1em .3em}
""".strip()

_FORMATS = ("rdfxml", "png", "ejson", "json", "yarf", "ntriples")


def _layout(title: str, body: str) -> str:
    """views/layout.haml: shared chrome (top bar with section links,
    footer)."""
    return f"""<!DOCTYPE html>
<html><head><title>scrappy_ray — {_html.escape(title)}</title>
<style>{_STYLE}</style></head><body>
<div id="bar">
<a href="/">Home</a><a href="/extractors">Extractors</a>
<a href="/samples">Samples</a><a href="/help">Help</a>
</div>
{body}
<div id="footer"><p><a href="/">Home</a> | scrappy_ray admin</p></div>
</body></html>"""


def home_page() -> str:
    """views/home.haml: the scrape form — URI box + format picker,
    submitting to /{format}/{uri} (the proxy route)."""
    opts = "".join(f'<option value="{f}">{f}</option>' for f in _FORMATS)
    return _layout("Home", f"""
<div id="center"><h1>scrappy_ray</h1>
<form onsubmit="location.href='/'+this.format.value+'/'+
 encodeURI(this.uri.value.replace(/^https?:\\/\\//,''));return false;">
<input name="uri" size="40" placeholder="Enter URI...">
<select name="format">{opts}</select>
<button>Scrape</button>
</form></div>""")


def extractors_page(uris: list[str]) -> str:
    """views/extractors.haml: the extractor-URI listing with per-row
    delete, plus the add-KB form (admin.rb:30-60)."""
    rows = "".join(
        f"<tr><td><code>{_html.escape(u)}</code></td>"
        f"<td><button onclick=\"fetch('/extractors/'+"
        f"encodeURI('{_html.escape(u)}'.replace(/^https?:\\/\\//,'')),"
        "{method:'DELETE'}).then(()=>location.reload())\">delete"
        "</button></td></tr>"
        for u in uris
    )
    return _layout("Extractors", f"""
<h2>Extractors</h2>
<table><tr><th>URI</th><th></th></tr>{rows or
 '<tr><td colspan=2><i>none</i></td></tr>'}</table>
<h3>Add extractor (YARF)</h3>
<form onsubmit="fetch('/extractors',{{method:'POST',
 body:this.kb.value}}).then(()=>location.reload());return false;">
<textarea name="kb" rows="8" cols="70"></textarea><br>
<button>Add</button></form>""")


def samples_page(samples: list[dict]) -> str:
    """views/samples.haml: sample list with train/test/delete actions
    and the optimize-all button (admin.rb:93-175)."""
    rows = "".join(
        f"<tr><td>{s['id']}</td><td><code>{_html.escape(s['url'])}</code></td>"
        f"<td><button onclick=\"post('/samples/train/{s['id']}')\">train</button>"
        f" <button onclick=\"post('/samples/test/{s['id']}')\">test</button>"
        f" <button onclick=\"fetch('/samples/{s['id']}',{{method:'DELETE'}})"
        ".then(()=>location.reload())\">delete</button></td></tr>"
        for s in samples
    )
    return _layout("Samples", f"""
<h2>Samples</h2>
<script>function post(p){{fetch(p,{{method:'POST'}}).then(r=>r.json())
 .then(j=>document.getElementById('out').textContent=
 JSON.stringify(j,null,1))}}</script>
<table><tr><th>id</th><th>url</th><th></th></tr>{rows or
 '<tr><td colspan=3><i>none</i></td></tr>'}</table>
<p><button onclick="post('/samples/optimize/0')">optimize all</button></p>
<pre id="out"></pre>""")


def help_page() -> str:
    """views/help.haml: route reference."""
    return _layout("Help", """
<h2>Help</h2>
<table><tr><th>route</th><th>what</th></tr>
<tr><td><code>GET /{format}/{uri}</code></td>
 <td>extract the page and serialize (formats: rdfxml png ejson json
 yarf ntriples; <code>?callback=</code> for JSONP)</td></tr>
<tr><td><code>GET|POST|DELETE /extractors</code></td>
 <td>list / add (YARF body) / remove extractors</td></tr>
<tr><td><code>GET|POST|DELETE /samples</code></td>
 <td>sample store CRUD; <code>POST /samples/train/:id</code>,
 <code>/samples/test/:id</code>, <code>/samples/optimize/0</code></td></tr>
<tr><td><code>GET /kb</code></td><td>knowledge-base summary</td></tr>
<tr><td><code>GET /javascript</code></td>
 <td>visual-annotation bookmarklet (injects the <code>v*</code>
 attributes VisualSelector trains on)</td></tr></table>""")


def annotator_js() -> str:
    """/javascript (admin.rb:18-22 + public/javascripts/annotator.js's
    role): a bookmarklet-sized script that walks the DOM and injects
    the geometry/typography attributes (vx, vy, vw, vh, vsize, vweight,
    vcolor) that VisualSelector constraints match on — run it on a page
    in the browser, then POST the annotated outerHTML as a sample."""
    return """// scrappy_ray visual annotator: inject v* attributes
(function(){
  var els=document.getElementsByTagName('*');
  for(var i=0;i<els.length;i++){
    var e=els[i],r=e.getBoundingClientRect(),s=getComputedStyle(e);
    e.setAttribute('vx',Math.round(r.left+window.scrollX));
    e.setAttribute('vy',Math.round(r.top+window.scrollY));
    e.setAttribute('vw',Math.round(r.width));
    e.setAttribute('vh',Math.round(r.height));
    e.setAttribute('vsize',parseInt(s.fontSize)||0);
    e.setAttribute('vweight',s.fontWeight);
    e.setAttribute('vcolor',s.color);
  }
})();"""
