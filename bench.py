"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...}.

Also measures the extraction pipeline on a deterministic synthetic docs
corpus (generated distributed, written once to a cached parquet path) —
documents/sec is the BASELINE.md north metric.  Every timed query is
materialized with the noop sink so nothing is optimized away.

Scaling-efficiency evidence (two parallelism levels) lives in
scripts/scaling_bench.py → BENCH/BASELINE.md; this file is the per-round
single-level benchmark the driver invokes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "4000"))


def _synth_tag() -> str:
    """Fingerprint of the synthetic generator so cached corpora are
    invalidated whenever synth.py changes (stale spans would no longer
    match re-derived geometry).  Hashes the FULL synth_page output —
    kind/text/media/offset AND geometry — so a text-only generator
    change (e.g. an RNG-stream split) also invalidates the cache."""
    import hashlib

    from reading_the_unreadable_spark.synth import synth_page

    boxes = synth_page("bench-cache-probe_page_0")
    h = hashlib.md5()
    for b in boxes:
        h.update(
            repr(
                (b.kind, b.text, b.media_ref, b.offset, b.x1, b.y1, b.x2, b.y2, b.confidence)
            ).encode()
        )
    return h.hexdigest()[:8]


DOCS_CACHE = os.environ.get(
    "BENCH_DOCS_PATH", f"/tmp/bench_docs_{BENCH_DOCS}_{_synth_tag()}"
)

HEADLINE = [
    "pricing_summary",
    "top_customers",
    "region_revenue",
    "order_priority",
    "supplier_top3",
    "user_sessions",
    "latest_order",
    "monthly_revenue",
    "exact_dedup",
    "minhash_lsh",
    "ngram_jaccard",
    "simhash",
    "simhash_pairs",
    "rollup_revenue",
    "token_stats",
    "bpe_tokens",
    "quality_score",
    "lang_id",
    "readability",
    "cer_eval",
    "one_hot_labels",
    "cosine_topk",
    "ann_lsh",
    "ann_multiprobe",
    "ann_ivf",
    "embedding_near_dup",
    "label_centroids",
    "near_dup_verified",
    "merge_overlap",
    "html_strip",
    "html_main_text",
    "pdf_extract",
    "c4_filters",
    "gopher_signals",
    "gopher_filter",
    "para_dedup",
    "unigram_logprob",
    "bigram_logprob",
    "source_mix",
    "pack_sequences",
    "redact_pii",
    "combine_segments",
    "layout_postprocess",
    "extract_spans",
    "extract_spans_filled",
    "extract_articles",
    # round-5 additions
    "decontaminate",
    "ccnet_buckets",
    "winnow_pairs",
    "kmeans",
    "epoch_sample",
    "dedup_substrings",
    "dup_clusters",
    "warc_extract",
    "bpe_encode",
    "bm25",
    "tfidf_terms",
    "bleu_eval",
    "kn_logprob",
    "pmi_collocations",
    "rouge_eval",
    "chrf_eval",
    "allpairs_sim",
    "dataset_split",
    "source_overlap",
    "zipf_fit",
    "hits",
    "tokenizer_stats",
    "length_quantiles",
    "ngram_novelty",
    "split_leakage",
    "curriculum",
    "chunk_overlap",
    "incremental_gate",
    "pca_component",
    "lsh_recall",
    "wiki_extract",
    "blocklist_filter",
    "split_sentences",
    "subtitle_extract",
    "robots_gate",
    "sitemap_urls",
    "crawl_schedule",
    "page_metadata",
    "exif_extract",
    "feed_extract",
    "trustrank",
    "text_tiling",
    "corpus_drift",
    "bloom_gate",
    "curation_pipeline",
    "dedup_lines",
    "host_boilerplate",
    "wer_eval",
    "image_ahash",
    "url_canonical",
    "charclass",
    "table_checks",
    "asof_join",
    "range_join",
    "fix_mojibake",
    "pack_interleaved",
    "interval_join",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_ticks() -> tuple[int, int]:
    """(steal ticks, total ticks) from /proc/stat — the direct signal
    for the bursty CPU-steal noise this VM shows (SURVEY §10.7)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


BEST_OF = int(os.environ.get("BENCH_BEST_OF", "2"))


def _noise_snapshot() -> dict:
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    steal, total = _cpu_ticks()
    return {"steal": steal, "total": total, "load1": load1}


def _noise_block(start: dict, end: dict) -> dict:
    """Noise context stamped into the bench JSON so cross-round files
    carry their own comparability signal: a high steal_pct or loadavg
    means the suite ran in a degraded session and round-over-round
    deltas inside the ambient 20-30% band are not real."""
    dt = max(end["total"] - start["total"], 1)
    return {
        "steal_pct": round(100.0 * (end["steal"] - start["steal"]) / dt, 2),
        "load1_start": start["load1"],
        "load1_end": end["load1"],
        "best_of": BEST_OF,
    }


def main() -> None:
    import __spark_entry__ as entrymod
    from reading_the_unreadable_spark.datagen import make_corpus_df
    from reading_the_unreadable_spark.plans.pipeline import extract_nested
    from reading_the_unreadable_spark.session import get_spark
    from reading_the_unreadable_spark.sources.docs import read_docs

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=max(CPUS * 2, 16))
    queries = entrymod.queries()

    # ---- extraction corpus (generate once, reuse across bench runs)
    if not Path(DOCS_CACHE, "_SUCCESS").exists():
        make_corpus_df(spark, BENCH_DOCS, partitions=CPUS * 2).write.mode(
            "overwrite"
        ).parquet(DOCS_CACHE)
    docs = read_docs(spark, DOCS_CACHE)

    # ---- warmup (JIT/codegen/Arrow paths)
    _noop(extract_nested(read_docs(spark, DOCS_CACHE).limit(64), num_partitions=CPUS))
    _noop(queries["pricing_summary"](spark, SF_DIR))

    noise_start = _noise_snapshot()
    timings: dict[str, float] = {}

    def best_of(fn, k: int = BEST_OF) -> float:
        """Best of k timed runs — this VM shows bursty CPU-steal noise
        (single-shot timings occasionally read 10-100x high; a measured
        burst once put ngram_jaccard at 11s vs its usual 2s); noise only
        ever slows a run, so min measures capability.

        A burst can span BOTH of a query's best-of-2 runs (measured: a
        burst put minhash_lsh at 20.8s best-of-2 vs its reproducible
        4.5s, while the suite-wide steal average read only 1.7% — the
        aggregate can't localize bursts).  So retry on the DIRECT
        per-run signal: a run whose /proc/stat steal share exceeds 3%
        was contaminated; take up to 2 extra runs until one lands in a
        quiet window, and min() over everything."""

        def timed() -> tuple[float, float]:
            s0, tt0 = _cpu_ticks()
            t0 = time.monotonic()
            fn()
            wall = time.monotonic() - t0
            s1, tt1 = _cpu_ticks()
            steal = 100.0 * (s1 - s0) / max(tt1 - tt0, 1)
            return wall, steal

        runs = [timed() for _ in range(k)]
        extra = 0
        while extra < 2 and min(steal for _, steal in runs) > 3.0:
            runs.append(timed())
            extra += 1
        return min(wall for wall, _ in runs)

    # the north docs/sec metric keeps best-of-3 (it headlines BASELINE
    # comparisons); the 80+ per-query timings use BEST_OF (default 2)
    # to keep the whole suite inside a sane per-round wall time
    t_extract = best_of(
        lambda: _noop(extract_nested(docs, num_partitions=CPUS * 2)),
        k=max(BEST_OF, 3),
    )
    timings["extract_pipeline"] = round(t_extract, 3)

    for name in HEADLINE:
        timings[name] = round(
            best_of(lambda: _noop(queries[name](spark, SF_DIR))), 3
        )

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(BENCH_DOCS / t_extract, 2)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "extract_docs": BENCH_DOCS,
                "extract_docs_per_sec": docs_per_sec,
                "cpus": CPUS,
                "noise": _noise_block(noise_start, _noise_snapshot()),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
