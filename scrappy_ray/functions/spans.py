"""Dolma-style span attributes (Soldaini et al. '24, public): taggers
emit (doc_id, start, end, tag) rows into a standalone ATTRIBUTE table;
appliers join attributes back onto the documents and rewrite text.

Why the indirection matters at 100 TB: tagging is the expensive pass —
it runs ONCE and its output persists as a (tiny) side table — while
policy (which tags to cut, what thresholds) changes often and cheaply:
re-running the apply join never re-reads model weights or re-matches
regexes. The attribute table is also the audit log (what was removed,
where, why).

Offsets are unicode codepoints (Python string indexing semantics).
Per-row work in both stages is payload-bounded (the
fingerprint/multimodal precedent); everything between rows is
vectorized or a Ray join/groupby.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class RegexSpanTagger:
    """Actor-pool tagging stage: the pattern compiles once per actor;
    each batch emits exploded (doc_id, start, end, tag) rows."""

    def __init__(self, pattern: str, tag: str, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.rx = re.compile(pattern)
        self.tag, self.text_col, self.id_col = tag, text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(
            pc.cast(batch.column(self.text_col), pa.string()), ""
        ).to_pylist()
        ids = np.asarray(
            pc.cast(batch.column(self.id_col), pa.int64()), dtype=np.int64
        )
        out_id, out_s, out_e = [], [], []
        for i, t in zip(ids.tolist(), texts):
            for m in self.rx.finditer(t):
                out_id.append(i)
                out_s.append(m.start())
                out_e.append(m.end())
        n = len(out_id)
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "start": pa.array(out_s, pa.int64()),
            "end": pa.array(out_e, pa.int64()),
            "tag": pa.array([self.tag] * n, pa.string()),
        })


def tag_spans(ds, pattern: str, tag: str, text_col: str = "text",
              id_col: str = "doc_id", concurrency: int = 4,
              batch_size: int = 1024):
    """Run a regex tagger over the corpus → attribute Dataset of
    (id, start, end, tag) rows."""
    return ds.map_batches(
        RegexSpanTagger,
        fn_constructor_args=(pattern, tag, text_col, id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def apply_span_removal(docs, spans, text_col: str = "text",
                       id_col: str = "doc_id", tags: list[str] | None = None,
                       num_partitions: int = 8):
    """Cut the tagged spans out of each document: fold the attribute
    table to per-doc offset lists (one groupby), LEFT OUTER join onto
    the documents (untagged docs pass through untouched), then rewrite
    each text from its surviving pieces. Overlapping spans (multiple
    taggers) merge before cutting. ``tags`` filters which attributes
    apply — the cheap policy knob."""
    if tags is not None:
        tset = pa.array(sorted(set(tags)), pa.string())
        spans = spans.map_batches(
            lambda b: b.filter(pc.is_in(b.column("tag"), value_set=tset)),
            batch_format="pyarrow",
        )

    def fold(g: pa.Table) -> pa.Table:
        s = np.asarray(g.column("start"), dtype=np.int64)
        e = np.asarray(g.column("end"), dtype=np.int64)
        order = np.argsort(s, kind="stable")
        s, e = s[order], e[order]
        # interval merge (spans per doc are few; bounded loop)
        ms, me = [int(s[0])], [int(e[0])]
        for a, b in zip(s[1:].tolist(), e[1:].tolist()):
            if a <= me[-1]:
                me[-1] = max(me[-1], b)
            else:
                ms.append(a)
                me.append(b)
        # Ray's hash join rejects list-typed payload columns — the
        # merged intervals ride across as one compact string
        enc = ",".join(f"{a}:{b}" for a, b in zip(ms, me))
        return pa.table({
            id_col: g.column(id_col).slice(0, 1),
            "_spans": pa.array([enc], pa.string()),
        })

    from ..common import drop_empty_blocks

    # O(tagged docs) rows — materialize once: the count guard below and
    # the join would otherwise each re-run the tagger upstream
    folded = spans.groupby(id_col).map_groups(fold, batch_format="pyarrow").materialize()
    folded = drop_empty_blocks(folded)
    if folded.count() == 0:
        # no applicable spans (e.g. the tag filter matched nothing):
        # identity — an empty right side would also degrade the join
        # schema and lose the key column
        return docs
    j = drop_empty_blocks(docs).join(
        drop_empty_blocks(folded), join_type="left_outer",
        num_partitions=num_partitions, on=(id_col,),
    )

    def cut(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "").to_pylist()
        encs = batch.column("_spans").to_pylist()
        out = []
        for t, enc in zip(texts, encs):
            if not enc:  # null: no spans for this doc
                out.append(t)
                continue
            pieces, prev = [], 0
            for sp in enc.split(","):
                a, b = sp.split(":")
                pieces.append(t[prev:int(a)])
                prev = int(b)
            pieces.append(t[prev:])
            out.append("".join(pieces))
        keep = [c for c in batch.column_names if c not in ("_spans", text_col)]
        res = batch.select(keep)
        return res.append_column(text_col, pa.array(out, pa.string()))

    return j.map_batches(cut, batch_format="pyarrow")
