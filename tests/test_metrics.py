"""Coverage raster + CER operators vs hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from reading_the_unreadable_spark.operators.metrics import (
    cer,
    cer_summary,
    page_coverage,
)


def test_coverage_simple(spark):
    # page: two 40x40 boxes side by side + one overlapping both
    rows = [
        ("d1", 0.0, 0.0, 40.0, 40.0),
        ("d1", 40.0, 0.0, 80.0, 40.0),
        ("d1", 20.0, 0.0, 60.0, 40.0),
        # d2: one box only, full coverage, zero overlap
        ("d2", 0.0, 0.0, 40.0, 40.0),
    ]
    df = spark.createDataFrame(rows, "doc_id string, x1 double, y1 double, x2 double, y2 double")
    got = {r["doc_id"]: r for r in page_coverage(df, num_partitions=2).collect()}
    assert got["d1"]["covered_frac"] == 1.0
    assert abs(got["d1"]["overlap_frac"] - 0.5) < 1e-6  # middle box doubles 40/80
    assert got["d2"]["covered_frac"] == 1.0
    assert got["d2"]["overlap_frac"] == 0.0
    assert got["d1"]["n_boxes"] == 3


def test_cer(spark):
    preds = spark.createDataFrame(
        [("a", "the quick brown fox"), ("b", "hello wxrld")],
        "doc_id string, text string",
    )
    gt = spark.createDataFrame(
        [("a", "the quick brown fox"), ("b", "hello world")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in cer(preds, gt).collect()}
    assert got["a"]["cer"] == 0.0
    assert abs(got["b"]["cer"] - 1 / 11) < 1e-6
    s = cer_summary(cer(preds, gt)).first()
    assert s["n_docs"] == 2
    assert s["median_cer"] < 0.05


def test_cer_spans_missing_prediction_counts_as_deletion(spark):
    """Span-grain CER: a ground-truth span the system never produced is
    charged its full length, not silently excluded."""
    from reading_the_unreadable_spark.operators.metrics import cer_spans

    gt = spark.createDataFrame(
        [("a", 0, "hello world"), ("a", 1, "gone span")],
        "doc_id string, span_idx int, text string",
    )
    pred = spark.createDataFrame(
        [("a", 0, "hello wxrld")],  # span 1 missing entirely
        "doc_id string, span_idx int, text string",
    )
    got = cer_spans(pred, gt).first()
    # lev: 1 (substitution) + 9 (full deletion of 'gone span'); len 11+9
    assert got["gt_len"] == 20
    assert abs(got["cer"] - 10 / 20) < 1e-9
    # hallucinated prediction-only spans are charged as insertions
    pred2 = pred.union(
        spark.createDataFrame(
            [("a", 7, "extra!")], "doc_id string, span_idx int, text string"
        )
    )
    got2 = cer_spans(pred2, gt).first()
    assert got2["gt_len"] == 20  # gt length unchanged
    assert abs(got2["cer"] - 16 / 20) < 1e-9  # +6 chars of insertion


def test_chunk_spans_grid(spark):
    from reading_the_unreadable_spark.operators.metrics import chunk_spans

    d = spark.createDataFrame(
        [("a", "one two three four five")], "doc_id string, text string"
    )
    got = chunk_spans(d, words_per_span=2).orderBy("span_idx").collect()
    assert [(r["span_idx"], r["text"]) for r in got] == [
        (0, "one two"),
        (1, "three four"),
        (2, "five"),
    ]


def test_coverage_on_pipeline_boxes(spark):
    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.operators.geometry import docs_to_boxes
    from reading_the_unreadable_spark.sources.docs import docs_from_rows

    docs = docs_from_rows(spark, synth.make_corpus(12, seed_tag="cov"))
    cov = page_coverage(docs_to_boxes(docs), num_partitions=4)
    rows = cov.collect()
    assert len(rows) == 12
    assert all(0 < r["covered_frac"] <= 1.0 for r in rows)
    assert all(0 <= r["overlap_frac"] <= r["covered_frac"] for r in rows)


def test_cer_spans_pure_hallucination_doc_not_null(spark):
    """A doc present ONLY in predictions has gt_len 0; its cer must be a
    finite penalty (the inserted-char count), never NULL/dropped — a
    NULL would silently vanish from cer_summary's percentiles."""
    from reading_the_unreadable_spark.operators.metrics import cer_spans

    gt = spark.createDataFrame(
        [("a", 0, "hello")], "doc_id string, span_idx int, text string"
    )
    pred = spark.createDataFrame(
        [("a", 0, "hello"), ("ghost", 0, "made up text")],
        "doc_id string, span_idx int, text string",
    )
    got = {r["doc_id"]: r for r in cer_spans(pred, gt).collect()}
    assert got["a"]["cer"] == 0.0
    assert got["ghost"]["gt_len"] == 0
    assert got["ghost"]["cer"] == float(len("made up text"))
    s = cer_summary(cer_spans(pred, gt)).first()
    assert s["n_docs"] == 2  # hallucinated doc participates in summary


def _py_bleu(pred: str, ref: str, max_n: int = 4):
    """Independent textbook BLEU (Papineni et al. 2002), no smoothing."""
    import math
    from collections import Counter

    p, r = pred.split(), ref.split()
    stats = {}
    for n in range(1, max_n + 1):
        pg = Counter(tuple(p[i : i + n]) for i in range(len(p) - n + 1))
        rg = Counter(tuple(r[i : i + n]) for i in range(len(r) - n + 1))
        match = sum(min(c, rg[g]) for g, c in pg.items())
        stats[n] = (match, sum(pg.values()))
    bp = 1.0 if len(p) >= len(r) else math.exp(1 - len(r) / len(p))
    if any(m == 0 or t == 0 for m, t in stats.values()):
        score = 0.0
    else:
        score = round(
            bp
            * math.exp(
                sum(math.log(m / t) for m, t in stats.values()) / max_n
            ),
            4,
        )
    return stats, round(bp, 4), score


def test_bleu_matches_python_reference(spark):
    from reading_the_unreadable_spark.operators.metrics import bleu

    cases = [
        ("a", "the cat sat on the mat", "the cat sat on the mat"),  # 1.0
        ("b", "the cat the cat on mat", "the cat sat on the mat"),  # clip
        ("c", "cat on mat", "the cat sat on the mat"),  # short → BP
        ("d", "dog barks loud", "the cat sat on the mat"),  # 0 match
        ("e", "x y", "x y z w"),  # fewer than 4 tokens → total_4 = 0
    ]
    gt = spark.createDataFrame(
        [(d, r) for d, _, r in cases], "doc_id string, text string"
    )
    pred = spark.createDataFrame(
        [(d, p) for d, p, _ in cases], "doc_id string, text string"
    )
    got = {r["doc_id"]: r for r in bleu(pred, gt).collect()}
    assert set(got) == {d for d, _, _ in cases}
    for doc_id, p, r in cases:
        stats, bp, score = _py_bleu(p, r)
        row = got[doc_id]
        assert row["len_pred"] == len(p.split())
        assert row["len_ref"] == len(r.split())
        for n in range(1, 5):
            assert (row[f"match_{n}"], row[f"total_{n}"]) == stats[n], (
                doc_id,
                n,
            )
        assert row["brevity_penalty"] == bp, doc_id
        assert row["bleu"] == score, doc_id
    assert got["a"]["bleu"] == 1.0
    assert got["d"]["bleu"] == 0.0 and got["e"]["bleu"] == 0.0


def test_bleu_empty_prediction_drops_doc(spark):
    from reading_the_unreadable_spark.operators.metrics import bleu

    gt = spark.createDataFrame(
        [("a", "some text"), ("b", "more text")],
        "doc_id string, text string",
    )
    pred = spark.createDataFrame(
        [("a", "some text"), ("b", "")], "doc_id string, text string"
    )
    rows = bleu(pred, gt).collect()
    assert [r["doc_id"] for r in rows] == ["a"]  # b has no candidates
