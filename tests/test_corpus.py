"""End-to-end corpus-cleaning pipeline: planted exact dups, near dups,
junk and non-English docs must all be dropped; the funnel stats must
account for every stage."""

import pyarrow as pa


def test_clean_corpus_funnel(ray_session):
    import ray.data

    from scrappy_ray.pipelines.corpus import clean_corpus

    good = (
        "the quick brown fox jumps over the lazy dog and runs far away home tonight, "
        "he said that it was not a problem for them because they all have one."
    )
    near = good.replace("tonight", "today")
    spanish = (
        "el perro y el gato estaban en la casa porque no se puede hacer otra cosa "
        "cuando todo el mundo tiene que estar muy lejos desde la ciudad para ver."
    )
    junk = "000 111 222 333 444 555 666 777 888 999 000 111 222 333"
    rows = [
        (0, good),
        (1, good),      # exact dup of 0 → dropped
        (2, near),      # near dup of 0 → dropped by CC keep-set
        (3, spanish),   # wrong language → dropped
        (4, junk),      # digit-heavy, no stopwords → low quality
        (5, "they said this was another fine document about the things we all have seen and the one story that it was for them."),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    kept, stats = clean_corpus(ds, jaccard_threshold=0.5, min_quality=0.3)
    kept_ids = sorted(r["doc_id"] for r in kept.take_all())
    assert kept_ids == [0, 5]
    s = stats.to_pylist()[0]
    assert s["n_input"] == 6
    assert s["n_after_exact"] == 5      # doc 1 dropped
    assert s["n_after_neardup"] == 4    # doc 2 dropped
    assert s["n_kept"] == 2             # docs 3, 4 filtered
    assert s["total_tokens"] > 0

    # the distributed-CC path (auto-selected at scale by pair-endpoint
    # count) must produce the identical keep-set through the PIPELINE,
    # not just the primitive
    kept_d, stats_d = clean_corpus(
        ds, jaccard_threshold=0.5, min_quality=0.3, distributed_cc=True
    )
    assert sorted(r["doc_id"] for r in kept_d.take_all()) == kept_ids
    assert stats_d.to_pylist()[0] == s


def test_clean_corpus_optional_gates(ray_session):
    """Repetition / perplexity / domain gates: off by default (golden
    preserved elsewhere); when on, each drops its targeted docs and the
    stats row reports per-gate rejection counts."""
    import pyarrow as pa
    import ray.data

    from scrappy_ray.functions.counters import reset_counters
    from scrappy_ray.pipelines.corpus import clean_corpus

    reset_counters()
    goods = [
        "the cat and the dog are in the house, they have all of it today.",
        "a bird was on the roof and it had one song for this morning here.",
        "they were at the lake by the hill, and the water was not warm.",
        "this is an old book from the shelf that he had not read before.",
    ]
    rows = []
    for i, good in enumerate(goods):
        rows.append({"doc_id": i, "source": "good.test", "text": good})
    # repetitive doc: one bigram dominates
    rows.append({"doc_id": 10, "source": "good.test",
                 "text": "the cat " * 30 + "is on it and they have all of this."})
    # domain-gated doc: fine text, lonely domain
    rows.append({"doc_id": 20, "source": "tiny.test",
                 "text": "we can see the small town from here and it is a nice view."})
    ds = ray.data.from_items(rows)

    kept, stats = clean_corpus(
        ds, keep_langs=("en", "und"), min_quality=0.0,
        max_top_bigram_frac=0.4,  # planted doc scores 0.441
        max_ppl=1e9,                 # pass-all ppl gate (counters still exercise)
        domain_col="source", min_domain_docs=2,
    )
    got = sorted(r["doc_id"] for r in kept.take_all())
    assert got == [0, 1, 2, 3]  # 10 fails repetition, 20 fails domain
    s = stats.to_pylist()[0]
    assert s["rej_repetition"] >= 1
    assert s["rej_domain"] >= 1
    assert s["rej_ppl"] == 0
    assert s["n_kept"] == 4


def test_clean_corpus_decontam_gate(ray_session):
    """decontam_bench_ds drops exactly the docs sharing an n-gram with
    the benchmark set, inside the same streaming filter pass."""
    import ray.data

    from scrappy_ray.functions.counters import reset_counters
    from scrappy_ray.pipelines.corpus import clean_corpus

    reset_counters()
    rows = [
        {"doc_id": 0, "text": "the cat and the dog are in the house, they have all of it."},
        {"doc_id": 1, "text": "a bird was on the roof and it had one song for the morning."},
        # contains the bench 4-gram "we hold these truths"
        {"doc_id": 2, "text": "and so we hold these truths to be in the text of this day."},
    ]
    bench = ray.data.from_items(
        [{"doc_id": 100, "text": "we hold these truths to be self evident"}])
    kept, stats = clean_corpus(
        ray.data.from_items(rows), keep_langs=("en", "und"), min_quality=0.0,
        decontam_bench_ds=bench, decontam_n=4,
    )
    assert sorted(r["doc_id"] for r in kept.take_all()) == [0, 1]
    s = stats.to_pylist()[0]
    assert s["rej_contaminated"] == 1

    # gate off: everything survives, counter reports 0
    kept2, stats2 = clean_corpus(
        ray.data.from_items(rows), keep_langs=("en", "und"), min_quality=0.0)
    assert sorted(r["doc_id"] for r in kept2.take_all()) == [0, 1, 2]
    assert stats2.to_pylist()[0]["rej_contaminated"] == 0


def test_clean_corpus_compression_gate(ray_session):
    """Compression-ratio bounds drop boilerplate (too compressible)
    inside the same streaming filter pass; counter reports the drops."""
    import ray.data

    from scrappy_ray.functions.counters import reset_counters
    from scrappy_ray.pipelines.corpus import clean_corpus

    reset_counters()
    rows = [
        {"doc_id": 0, "text": "the cat and the dog are in the house, they have all of it."},
        {"doc_id": 1, "text": "buy now " * 100},  # boilerplate → ratio ~0.02
    ]
    kept, stats = clean_corpus(
        ray.data.from_items(rows), keep_langs=("en", "und"), min_quality=0.0,
        min_compression_ratio=0.2,
    )
    assert [r["doc_id"] for r in kept.take_all()] == [0]
    assert stats.to_pylist()[0]["rej_compression"] == 1


def test_clean_corpus_substr_dedup_stage(ray_session):
    """substr_dedup_n rewrites surviving docs' text in place: a span
    duplicated across two documents disappears from both, later gates
    see the deduped text, and the stats row counts removed tokens."""
    import ray.data

    from scrappy_ray.functions.counters import reset_counters
    from scrappy_ray.pipelines.corpus import clean_corpus

    reset_counters()
    shared = "alpha beta gamma delta epsilon zeta"  # 6-token planted span
    rows = [
        {"doc_id": 0, "text": f"the cat sat on the mat today {shared} and then it left."},
        {"doc_id": 1, "text": f"a dog ran over the hill fast {shared} before the rain came."},
        {"doc_id": 2, "text": "the bird has its own unique song for every single morning here."},
    ]
    kept, stats = clean_corpus(
        ray.data.from_items(rows), keep_langs=("en", "und"), min_quality=0.0,
        substr_dedup_n=6,
    )
    got = {r["doc_id"]: r["text"] for r in kept.take_all()}
    assert sorted(got) == [0, 1, 2]
    for d in (0, 1):
        assert "alpha" not in got[d] and "zeta" not in got[d]
    assert "unique song" in got[2]
    assert stats.to_pylist()[0]["substr_tokens_removed"] >= 12


def test_clean_corpus_classifier_gate(ray_session):
    """min_classifier_score gates on the learned quality classifier:
    a frozen pre-trained model drops the docs it scores low, inside the
    same streaming filter pass; the self-distilled branch trains from
    the heuristic teacher without error."""
    import pyarrow as pa
    import ray.data

    from scrappy_ray.functions.classifier import train_quality_classifier
    from scrappy_ray.functions.counters import reset_counters
    from scrappy_ray.pipelines.corpus import clean_corpus

    reset_counters()
    rng = __import__("numpy").random.default_rng(9)
    train_rows = []
    for i in range(200):
        pos = i % 2
        vocab = [f"good{j}" for j in range(20)] if pos else [f"junk{j}" for j in range(20)]
        train_rows.append({"doc_id": i, "label": pos,
                           "text": " ".join(rng.choice(vocab, 25))})
    model = train_quality_classifier(
        ray.data.from_items(train_rows), "label", dim=1 << 12,
        sample_k=128, iters=300)

    rows = [
        {"doc_id": 0, "text": "good1 good2 good3 good4 good5 good6 good7 good8"},
        {"doc_id": 1, "text": "good9 good10 good11 good0 good5 good2 good1 good3"},
        {"doc_id": 2, "text": "junk1 junk2 junk3 junk4 junk5 junk6 junk7 junk8"},
    ]
    kept, stats = clean_corpus(
        ray.data.from_items(rows), keep_langs=("en", "und"), min_quality=0.0,
        min_classifier_score=0.5, quality_model=model,
    )
    assert sorted(r["doc_id"] for r in kept.take_all()) == [0, 1]
    assert stats.to_pylist()[0]["rej_classifier"] == 1

    # self-distilled branch: teacher labels from the heuristic gate;
    # a permissive threshold trains the model but rejects nothing
    mixed = [
        {"doc_id": 0, "text": "the cat and the dog are in the house, they have all of it."},
        {"doc_id": 1, "text": "a bird was on the roof and it had one song for the morning."},
        {"doc_id": 2, "text": "9839 1220 3331 777 4 4 4 12 9 0 2 3"},
        {"doc_id": 3, "text": "404 500 301 12 9 0 88 77 66 55 44 33"},
    ]
    kept3, stats3 = clean_corpus(
        ray.data.from_items(mixed), keep_langs=("en", "und"), min_quality=0.0,
        min_classifier_score=1e-6, classifier_label_quality=0.5,
        classifier_dim=1 << 10, classifier_sample_k=16, classifier_iters=50,
    )
    assert sorted(r["doc_id"] for r in kept3.take_all()) == [0, 1, 2, 3]
    assert stats3.to_pylist()[0]["rej_classifier"] == 0
