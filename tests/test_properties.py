"""Property-based tests (hypothesis) for the pure-Python kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from scrappy_ray.extractor.selectors import ruby_split, ruby_to_f, ruby_to_i
from scrappy_ray.htmldom import parse_fragment
from scrappy_ray.htmldom.serialize import to_html
from scrappy_ray.state.cuckoo import CuckooFilter
from scrappy_ray.support import clean, complete_uri, underscore, wikify


@given(st.text(max_size=200))
def test_clean_idempotent(s):
    assert clean(clean(s)) == clean(s)
    assert "\xa0" not in clean(s)


@given(st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Zs")), max_size=50))
def test_wikify_no_whitespace(s):
    assert " " not in wikify(s)


@given(st.text(max_size=50))
def test_underscore_lowercase(s):
    assert underscore(s) == underscore(s)  # deterministic
    assert underscore(s).lower() == underscore(s)


@given(st.text(alphabet="abc|", max_size=30))
def test_ruby_split_no_trailing_empty(s):
    parts = ruby_split(s, "|")
    assert not parts or parts[-1] != ""


@given(st.text(max_size=20))
def test_ruby_coercions_never_raise(s):
    ruby_to_i(s)
    ruby_to_f(s)


@given(st.lists(st.binary(min_size=1, max_size=20), min_size=1, max_size=300, unique=True))
@settings(max_examples=30)
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(4096, seed=1)
    for k in keys:
        f.check_and_add(k)
    assert all(k in f for k in keys)  # cuckoo filters never false-negative


@given(st.text(alphabet=st.characters(blacklist_characters="<>&\"'", blacklist_categories=("Cs", "Cc")), max_size=60))
@settings(max_examples=50)
def test_serialize_parse_roundtrip_text(s):
    html = f"<div a=\"{s.replace(chr(10), ' ')}\">{s}</div>"
    doc = parse_fragment(html)
    reparsed = parse_fragment(to_html(doc))
    assert reparsed.text == doc.text


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=30))
def test_complete_uri_always_schemed(s):
    out = complete_uri(s)
    assert ":" in out or out == s


@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_extract_never_raises_on_arbitrary_bytes(data):
    """A malformed page must never kill the crawl (extract_record
    catches per-page failures — upgrade over the reference, which
    aborts on any exception)."""
    from scrappy_ray.extractor import extract_record
    from scrappy_ray.kb import load_kb
    from scrappy_ray.sources.testgen import synth_kb_yaml

    kb = load_kb(synth_kb_yaml())
    rec = extract_record(kb, "http://fuzz.test/p", data, 1)
    assert rec["fetched"] is True
    assert isinstance(rec["triples"], list)


@given(st.text(alphabet="<>ab c=\"'/!-&;", max_size=200))
@settings(max_examples=80, deadline=None)
def test_parse_html_never_raises(s):
    from scrappy_ray.htmldom import parse_html

    parse_html(s).text


# -- DOM index ≡ walk equivalence ----------------------------------------

_TAGS = ["div", "p", "a", "span", "li", "h2"]


@st.composite
def _rand_html(draw):
    """Random small nested HTML with classes/ids sprinkled in."""
    def element(depth):
        tag = draw(st.sampled_from(_TAGS))
        attrs = ""
        if draw(st.booleans()):
            attrs += f' class="{draw(st.sampled_from(["x", "y", "x y"]))}"'
        if draw(st.booleans()):
            attrs += f' id="{draw(st.sampled_from(["i1", "i2"]))}"'
        kids = ""
        if depth < 3:
            for _ in range(draw(st.integers(0, 3))):
                kids += element(depth + 1) if draw(st.booleans()) else draw(
                    st.sampled_from(["txt", " ", "ab"])
                )
        return f"<{tag}{attrs}>{kids}</{tag}>"

    return "".join(element(0) for _ in range(draw(st.integers(1, 3))))


_SELECTORS = [
    "a", "li", "div p", "div > p", ".x", "p.x", "li li", "h2, a",
    "div a, p span", "span[id]", "p[id=i1]", "#i2",
]
_XPATHS = ["//a", "//li", "//div", ".//p", "//span", "//*"]


@given(_rand_html(), st.sampled_from(_SELECTORS))
@settings(max_examples=120)
def test_css_index_path_equals_walk_path(html, selector):
    """The per-document tag index must be invisible: searching an
    indexed parse_html tree and the same tree with the index disabled
    must return the same nodes (by path) in the same order."""
    from scrappy_ray.htmldom.css import css_search
    from scrappy_ray.htmldom.dom import parse_html

    doc = parse_html(html)
    indexed = [n.path for n in css_search(doc, selector)]
    doc._idx.valid = False  # force the walk fallback on the same tree
    walked = [n.path for n in css_search(doc, selector)]
    assert indexed == walked


@given(_rand_html(), st.sampled_from(_XPATHS))
@settings(max_examples=60)
def test_xpath_index_path_equals_walk_path(html, xpath):
    from scrappy_ray.htmldom.dom import parse_html
    from scrappy_ray.htmldom.xpath import xpath_search

    doc = parse_html(html)
    indexed = [n.path for n in xpath_search(doc, xpath)]
    doc._idx.valid = False
    walked = [n.path for n in xpath_search(doc, xpath)]
    assert indexed == walked


@given(_rand_html(), st.sampled_from(_SELECTORS))
@settings(max_examples=60)
def test_css_scoped_index_search_equals_walk(html, selector):
    """Same equivalence from a non-root scope (interval filtering)."""
    from scrappy_ray.htmldom.css import css_search
    from scrappy_ray.htmldom.dom import parse_html

    doc = parse_html(html)
    divs = css_search(doc, "div")
    if not divs:
        return
    scope = divs[len(divs) // 2]
    indexed = [n.path for n in css_search(scope, selector)]
    doc._idx.valid = False
    walked = [n.path for n in css_search(scope, selector)]
    assert indexed == walked


@given(st.text(alphabet="<>ab c=\"'/!-&;\xa0liuptdh12", max_size=200))
@settings(max_examples=200, deadline=None)
def test_clone_for_reparse_matches_roundtrip_on_hostile_html(s):
    """Property: for ANY parsed element, the wikitext clone path equals
    the serialize+clean+re-parse path it replaces."""
    from scrappy_ray.extractor.formats import _clone_for_reparse, _wikitext
    from scrappy_ray.support import clean

    doc = parse_fragment(s)
    for el in list(doc.element_descendants())[:5]:
        via_clone = _wikitext(_clone_for_reparse(el), "http://p.test/a/b")
        via_rt = _wikitext(parse_fragment(clean(to_html(el))), "http://p.test/a/b")
        assert via_clone == via_rt


@given(st.lists(st.text(alphabet="abcx", min_size=1, max_size=4), min_size=1, max_size=60),
       st.integers(min_value=2, max_value=10), st.integers(min_value=0, max_value=8))
@settings(max_examples=60, deadline=None)
def test_chunk_documents_reconstruction(tokens, chunk_tokens, overlap):
    """Property: dropping each chunk's first `overlap` tokens (after
    chunk 0) and concatenating reconstructs the exact token stream, and
    every chunk except the last has exactly chunk_tokens tokens."""
    import ray

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import pyarrow as pa
    import ray.data

    from scrappy_ray.functions.textstats import chunk_documents

    text = " ".join(tokens)
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": [text]}))
    out = chunk_documents(ds, chunk_tokens=chunk_tokens, overlap=overlap).take_all()
    out.sort(key=lambda r: r["chunk_id"])
    rebuilt: list[str] = []
    for r in out:
        toks = r["chunk_text"].split(" ") if r["chunk_text"] != "" else [""]
        assert len(toks) == r["n_tokens"]
        rebuilt.extend(toks if r["chunk_id"] == 0 else toks[overlap:])
        if r is not out[-1]:
            assert r["n_tokens"] == chunk_tokens
    assert rebuilt == text.split(" ") if text else True


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_reduce_bounds(values, m):
    """MG reduction invariants: ≤ m survivors, every survivor count is
    a lower bound, the undercount per value is ≤ the returned bound,
    and any value with true count > bound survives."""
    import numpy as np
    import pyarrow as pa

    from collections import Counter

    from scrappy_ray.functions.sketch import _mg_reduce

    true = Counter(values)
    items = pa.array(sorted(true), pa.int64())
    counts = np.asarray([true[i.as_py()] for i in items], np.int64)
    vals, red, bound = _mg_reduce(items, counts.copy(), m)
    assert len(vals) <= m
    got = dict(zip(vals.to_pylist(), red.tolist()))
    for v, c in true.items():
        est = got.get(v, 0)
        assert est <= c                      # lower bound
        assert c - est <= bound              # undercount bound
        if c > bound:
            assert v in got                  # heavy values survive


# ---- stdlib PNG / APNG codec round-trips (round 5) ----------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    f0=st.integers(min_value=0, max_value=4),
)
def test_png_roundtrip_any_size_any_filter(w, h, seed, f0):
    """encode(filters cycling from f0) → stdlib decode reproduces the
    PIL-exact luma of the original RGB image for every size/filter."""
    import numpy as np

    from scrappy_ray.functions.multimodal import (_png_to_gray,
                                                  png_encode_filtered)

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    filters = [(f0 + i) % 5 for i in range(5)]
    got = _png_to_gray(png_encode_filtered(img, filters))
    assert got is not None
    gw, gh, gray = got
    assert (gw, gh) == (w, h)
    expect = ((img[:, :, 0].astype(np.uint32) * 19595
               + img[:, :, 1].astype(np.uint32) * 38470
               + img[:, :, 2].astype(np.uint32) * 7471 + 0x8000)
              >> 16).astype(np.uint8).ravel()
    assert np.array_equal(gray, expect)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=6),
    stride=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_apng_sampler_stride_semantics(n, stride, seed):
    """APNG encode → sample: frame indices are exactly
    range(0, n, stride) with the encoded dimensions."""
    import numpy as np
    import pyarrow as pa

    from scrappy_ray.functions.multimodal import (ApngFrameSampler,
                                                  apng_encode)

    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, size=(3, 5, 3), dtype=np.uint8)
              for _ in range(n)]
    out = ApngFrameSampler(stride=stride)(pa.table({
        "id": pa.array([1], pa.int64()),
        "payload": pa.array([apng_encode(frames)], pa.binary()),
    }))
    assert out.column("frame_idx").to_pylist() == list(range(0, n, stride))
    assert set(out.column("width").to_pylist()) <= {5}
    assert set(out.column("height").to_pylist()) <= {3}


# ---------------------------------------------------------------- JPEG codec


@given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 100),
       st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_jpeg_gray_roundtrip_any_shape_any_quality(h, w, q, seed):
    """Any (h, w) grayscale image at any quality round-trips to the
    exact source dimensions with bounded error (quantization noise is
    bounded by the quant table; 128-mean images keep DC error small)."""
    import numpy as np

    from scrappy_ray.functions.jpeg import jpeg_decode_luma, jpeg_encode

    rng = np.random.RandomState(seed)
    # smooth-ish content: coarse noise upsampled (worst-case white
    # noise has unbounded per-pixel quantization error at low Q)
    coarse = rng.randint(0, 256, (max(1, h // 8 + 1), max(1, w // 8 + 1)))
    img = np.kron(coarse, np.ones((8, 8)))[:h, :w].astype(np.uint8)
    out = jpeg_decode_luma(jpeg_encode(img, quality=q))
    assert out is not None
    ow, oh, px = out
    assert (ow, oh) == (w, h)
    assert px.shape == (w * h,)
    if q >= 85:
        mae = np.abs(px.reshape(h, w).astype(float)
                     - img.astype(float)).mean()
        assert mae < 16.0


@given(st.integers(8, 32), st.integers(8, 32), st.integers(0, 2**32 - 1),
       st.sampled_from(["444", "420"]), st.integers(0, 4))
@settings(max_examples=20, deadline=None)
def test_jpeg_color_roundtrip_and_restarts(h, w, seed, sub, rst):
    """Color encodes at any sampling with any restart interval decode
    to the right dims; RSTn placement never changes the pixels."""
    import numpy as np

    from scrappy_ray.functions.jpeg import jpeg_decode_luma, jpeg_encode

    rng = np.random.RandomState(seed)
    coarse = rng.randint(0, 256, (h // 8 + 1, w // 8 + 1, 3))
    img = np.kron(coarse, np.ones((8, 8, 1)))[:h, :w, :].astype(np.uint8)
    a = jpeg_decode_luma(jpeg_encode(img, 90, subsampling=sub))
    b = jpeg_decode_luma(jpeg_encode(img, 90, subsampling=sub,
                                     restart_interval=rst))
    assert a is not None and b is not None
    assert (a[0], a[1]) == (w, h)
    assert (a[2] == b[2]).all()


@given(st.binary(max_size=300))
@settings(max_examples=50, deadline=None)
def test_jpeg_decoder_never_crashes_on_fuzz(data):
    """Arbitrary bytes (including ones starting with the SOI marker)
    either decode or return None — never raise."""
    from scrappy_ray.functions.jpeg import jpeg_decode_luma

    jpeg_decode_luma(data)
    jpeg_decode_luma(b"\xff\xd8" + data)


@given(st.binary(max_size=200))
@settings(max_examples=50, deadline=None)
def test_gif_bmp_decoders_never_crash_on_fuzz(data):
    from scrappy_ray.functions.gif import bmp_decode_gray, gif_decode_gray

    gif_decode_gray(data)
    gif_decode_gray(b"GIF89a" + data)
    bmp_decode_gray(data)
    bmp_decode_gray(b"BM" + data)
