"""YARF KB parser parity: the reference's own extractor files load
unchanged and drive extraction with the expected semantics."""

from scrappy_ray.extractor import extract_record
from scrappy_ray.kb import load_kb_file
from scrappy_ray.kb.yarf import parse_yarf, yarf_to_kb

ELMUNDO = "/root/reference/extractors/elmundo.yarf"


def test_parse_reference_elmundo_structure():
    kb = load_kb_file(ELMUNDO)
    assert len(kb.fragments) == 2
    indice, noticia = kb.fragments
    assert indice.selectors[0].type == "Uri"
    assert indice.selectors[0].values == ["http://www.elmundo.es/"]
    assert indice.identifiers[0].type == "BaseUri"
    post = indice.subfragments[0]
    assert post.types == ["sioc:Post"]
    assert post.identifiers[0].attribute == ["href"]
    assert noticia.selectors[0].type == "UriPattern"
    rels = {r for sf in noticia.subfragments for r in sf.relations}
    assert {"dc:creator", "dc:title", "loc:location", "dc:date", "dc:description"} <= rels
    desc = [sf for sf in noticia.subfragments if "dc:description" in sf.relations][0]
    nested = desc.selectors[0].nested[0]
    assert nested.type == "Slice" and nested.values == ["|"] and nested.indexes == [1]
    assert kb.prefixes["sioc"] == "http://rdfs.org/sioc/ns#"


def test_extract_with_reference_kb():
    kb = load_kb_file(ELMUNDO)
    html = (
        b'<html><body><div class="noticia"><h2>Titular de prueba</h2>'
        b'<div class="firma"><em>Autor X</em><span class="localizacion">Madrid</span></div></div>'
        b'<div class="metadata_noticia"><span class="fecha">12/05/2011</span></div>'
        b'<div class="contenido_noticia_01"><span class="antetitulo">Secc | Ante</span></div>'
        b"</body></html>"
    )
    rec = extract_record(kb, "http://www.elmundo.es/a/1", html, 1)
    trip = set(map(tuple, rec["clean_triples"]))
    s = "http://www.elmundo.es/a/1"
    assert (s, "dc:title", "Titular de prueba", True) in trip
    assert (s, "dc:creator", "Autor X", True) in trip
    assert (s, "dc:date", "12/05/2011", True) in trip
    assert (s, "dc:description", "Ante", True) in trip  # slice index 1, stripped
    assert any(p == "loc:location" for _, p, _, _ in trip)
    # index page: posts found via .noticia h2/h3/h4 + href identifier
    idx_html = (
        b'<html><body><div class="noticia"><h3><a href="/a/1">T1</a></h3></div></body></html>'
    )
    rec2 = extract_record(kb, "http://www.elmundo.es/", idx_html, -1)
    trip2 = set(map(tuple, rec2["clean_triples"]))
    assert ("http://www.elmundo.es/a/1", "rdf:type", "sioc:Post", False) in trip2
    assert any(u["url"] == "http://www.elmundo.es/a/1" for u in rec2["links"])


def test_parse_yarf_literals_vs_nodes():
    triples, prefixes = parse_yarf(
        'pfx: http://x.test/ns#\n_:a:\n  rdf:type: sc:Fragment\n  sc:x: "lit val"\n  sc:y: pfx:Node\n'
    )
    assert prefixes["pfx"] == "http://x.test/ns#"
    assert ("_:a", "sc:x", "lit val", True) in triples
    assert ("_:a", "sc:y", "pfx:Node", False) in triples


def test_yarf_scraping_ontology_no_fragments():
    # the ontology file defines classes/properties, no extractor rules
    kb = yarf_to_kb(open("/root/reference/extra/scraping.yarf").read())
    assert kb.fragments == []
