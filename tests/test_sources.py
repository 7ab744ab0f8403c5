"""Source connectors: folder-of-txt ground truth (S9), NDJSON nested
annotations (S10), JSONL LM responses with permissive corrupt handling
(S6/S7), and the classifier-prediction join (J6)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from reading_the_unreadable_spark import synth
from reading_the_unreadable_spark.operators.geometry import docs_to_boxes
from reading_the_unreadable_spark.operators.layout import apply_predictions, layout
from reading_the_unreadable_spark.operators.metrics import cer
from reading_the_unreadable_spark.sources.annotations import read_annotations_ndjson
from reading_the_unreadable_spark.sources.docs import docs_from_rows
from reading_the_unreadable_spark.sources.ground_truth import read_ground_truth_txt
from reading_the_unreadable_spark.sources.lm_responses import read_lm_responses

TMP = Path("/tmp/test_sources")


@pytest.fixture(autouse=True)
def _clean():
    shutil.rmtree(TMP, ignore_errors=True)
    TMP.mkdir(parents=True)
    yield


def test_ground_truth_txt_scan_feeds_cer(spark):
    gt_dir = TMP / "gt"
    gt_dir.mkdir()
    (gt_dir / "page-1.txt").write_text("the quick brown fox")
    (gt_dir / "page-2.txt").write_text("jumps over the lazy dog")
    gt = read_ground_truth_txt(spark, str(gt_dir))
    rows = {r["doc_id"]: r["text"] for r in gt.collect()}
    assert rows == {
        "page-1": "the quick brown fox",
        "page-2": "jumps over the lazy dog",
    }
    # predictions: one perfect, one corrupted
    preds = spark.createDataFrame(
        [("page-1", "the quick brown fox"), ("page-2", "jumps over the hazy dog")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r["cer"] for r in cer(preds, gt).collect()}
    assert out["page-1"] == 0.0
    assert out["page-2"] > 0.0


def test_annotations_ndjson_scan(spark):
    path = TMP / "ann.ndjson"
    rec = {
        "data_row": {"external_id": "doc-7"},
        "projects": {
            "proj1": {
                "labels": [
                    {
                        "performed_by": "alice",
                        "annotations": {
                            "objects": [
                                {
                                    "name": "title",
                                    "bounding_box": {
                                        "top": 10.0,
                                        "left": 20.0,
                                        "height": 30.0,
                                        "width": 40.0,
                                    },
                                },
                                {
                                    "name": "figure",
                                    "bounding_box": {
                                        "top": 100.0,
                                        "left": 0.0,
                                        "height": 50.0,
                                        "width": 60.0,
                                    },
                                },
                            ]
                        },
                    }
                ]
            }
        },
    }
    rec2 = {
        "data_row": {"external_id": "doc-8"},
        "projects": {
            "proj1": {
                "labels": [
                    {
                        "performed_by": "bob",
                        "annotations": {
                            "objects": [
                                {
                                    "name": "text",
                                    "bounding_box": {
                                        "top": 1.0,
                                        "left": 2.0,
                                        "height": 3.0,
                                        "width": 4.0,
                                    },
                                }
                            ]
                        },
                    }
                ]
            }
        },
    }
    path.write_text(json.dumps(rec) + "\n" + json.dumps(rec2) + "\n")
    df = read_annotations_ndjson(spark, str(path))
    got = {(r["doc_id"], r["label"]): r for r in df.collect()}
    assert set(got) == {("doc-7", "title"), ("doc-7", "figure"), ("doc-8", "text")}
    t = got[("doc-7", "title")]
    assert (t["x1"], t["y1"], t["x2"], t["y2"]) == (20.0, 10.0, 60.0, 40.0)
    assert t["annotator"] == "alice"


def test_lm_responses_jsonl_permissive(spark):
    path = TMP / "responses.jsonl"
    good = {
        "custom_id": "doc-1_page_1_B1C1R1",
        "response": {
            "body": {
                "choices": [{"message": {"content": "extracted text"}}],
                "usage": {"prompt_tokens": 120, "completion_tokens": 48},
            }
        },
    }
    good2 = {
        "custom_id": "doc-1_page_1_B1C2R2",
        "response": {
            "body": {
                "choices": [{"message": {"content": "more text"}}],
                "usage": {"prompt_tokens": 80, "completion_tokens": 30},
            }
        },
    }
    path.write_text(
        json.dumps(good) + "\n" + "{this is not json\n" + json.dumps(good2) + "\n"
    )
    df = read_lm_responses(spark, str(path))
    rows = df.collect()
    assert len(rows) == 3
    ok = {r["custom_id"]: r for r in rows if not r["is_corrupt"]}
    assert ok["doc-1_page_1_B1C1R1"]["content"] == "extracted text"
    assert ok["doc-1_page_1_B1C1R1"]["prompt_tokens"] == 120
    assert ok["doc-1_page_1_B1C2R2"]["completion_tokens"] == 30
    corrupt = [r for r in rows if r["is_corrupt"]]
    assert len(corrupt) == 1 and corrupt[0]["content"] is None


def test_apply_predictions_overwrites_kind(spark):
    docs = docs_from_rows(spark, synth.make_corpus(6, seed_tag="pred"))
    ordered = layout(docs_to_boxes(docs), num_partitions=4)
    one_box = ordered.select("doc_id", "box_page_id", "kind").first()
    preds = spark.createDataFrame(
        [(one_box["doc_id"], one_box["box_page_id"], "reclassified")],
        "doc_id string, box_page_id string, predicted_kind string",
    )
    out = apply_predictions(ordered, preds)
    assert out.count() == ordered.count()
    hit = out.filter(
        (F.col("doc_id") == one_box["doc_id"])
        & (F.col("box_page_id") == one_box["box_page_id"])
    ).collect()
    assert len(hit) == 1 and hit[0]["kind"] == "reclassified"
    # everything else untouched
    assert (
        out.filter(F.col("kind") == "reclassified").count() == 1
    )


def test_snapshot_append_timetravel_incremental(spark, tmp_path):
    """Snapshot layer (Iceberg-semantics fallback): appends create
    monotonic snapshots, time travel reads AS OF any snapshot,
    incremental_read returns exactly the diff between two snapshots,
    and extraction over a diff equals extraction over those docs."""
    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources.snapshots import (
        append_snapshot,
        current_snapshot_id,
        incremental_read,
        read_snapshot,
    )

    root = str(tmp_path / "docs_tbl")
    corpus = synth.make_corpus(30)
    batches = [corpus[:10], corpus[10:18], corpus[18:]]
    sids = [append_snapshot(docs_from_rows(spark, b), root) for b in batches]
    assert sids == [1, 2, 3]
    assert current_snapshot_id(spark, root) == 3

    assert read_snapshot(spark, root).count() == 30  # latest
    assert read_snapshot(spark, root, snapshot_id=1).count() == 10  # time travel
    assert read_snapshot(spark, root, snapshot_id=2).count() == 18

    diff = incremental_read(spark, root, after=1, until=3)
    got_ids = {r["doc_id"] for r in diff.select("doc_id").collect()}
    want_ids = {d["doc_id"] for d in corpus[10:]}
    assert got_ids == want_ids

    # empty cases
    assert incremental_read(spark, root, after=3).count() == 0
    assert read_snapshot(spark, str(tmp_path / "missing")).count() == 0

    # the diff feeds the normal extraction chain unchanged
    from reading_the_unreadable_spark.plans.pipeline import extract_nested

    out = extract_nested(incremental_read(spark, root, after=2), num_partitions=4)
    assert out.count() == len(corpus[18:])


def test_read_snapshot_unknown_id_raises(spark, tmp_path):
    import pytest as _pytest

    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources.snapshots import (
        append_snapshot,
        read_snapshot,
    )

    root = str(tmp_path / "tbl")
    append_snapshot(docs_from_rows(spark, synth.make_corpus(5)), root)
    with _pytest.raises(ValueError, match="unknown snapshot id"):
        read_snapshot(spark, root, snapshot_id=7)


def test_snapshot_killed_append_does_not_wedge(spark, tmp_path):
    """A killed append (orphan data dir, no manifest) must neither block
    the next append nor become visible to readers."""
    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources.snapshots import (
        append_snapshot,
        read_snapshot,
    )

    root = str(tmp_path / "tbl")
    append_snapshot(docs_from_rows(spark, synth.make_corpus(5)), root)
    # simulate a crash AFTER data write, BEFORE manifest publish:
    # an unreferenced attempt dir for what would be snapshot 2
    docs_from_rows(spark, synth.make_corpus(3)).write.parquet(
        f"{root}/data/snap-2-deadbeef"
    )
    # table still reads as snapshot 1 only
    assert read_snapshot(spark, root).count() == 5
    # and a new append succeeds and supersedes the orphan
    sid = append_snapshot(docs_from_rows(spark, synth.make_corpus(7)), root)
    assert sid == 2
    assert read_snapshot(spark, root).count() == 12


def test_snapshot_schema_evolution(spark, tmp_path):
    """Iceberg add-column semantics: an append with an extra column
    coexists with older snapshots — latest read carries the new column
    (NULL for pre-evolution rows), time travel to an old snapshot reads
    the old schema's data."""
    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources.snapshots import (
        append_snapshot,
        read_snapshot,
    )

    root = str(tmp_path / "tbl")
    append_snapshot(docs_from_rows(spark, synth.make_corpus(4)), root)
    evolved = docs_from_rows(spark, synth.make_corpus(3, seed_tag="v2")).withColumn(
        "source_rank", F.lit(7)
    )
    append_snapshot(evolved, root)

    latest = read_snapshot(spark, root)
    assert "source_rank" in latest.columns
    assert latest.count() == 7
    assert latest.filter(F.col("source_rank").isNull()).count() == 4
    assert latest.filter(F.col("source_rank") == 7).count() == 3
    # time travel to the pre-evolution snapshot: old schema only
    old = read_snapshot(spark, root, snapshot_id=1)
    assert "source_rank" not in old.columns
    assert old.count() == 4


def test_snapshot_expire_keeps_data_drops_travel(spark, tmp_path):
    """expire_snapshots(keep_n): latest read byte-identical before and
    after, expired ids stop being time-travel targets, and only
    UNREFERENCED data dirs (orphan attempts) are deleted."""
    import os

    import pytest as _pytest

    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources.snapshots import (
        append_snapshot,
        expire_snapshots,
        read_snapshot,
    )

    root = str(tmp_path / "tbl")
    corpus = synth.make_corpus(24)
    for lo, hi in [(0, 8), (8, 14), (14, 24)]:
        append_snapshot(docs_from_rows(spark, corpus[lo:hi]), root)
    # orphan attempt dir (killed append / race loser): must be reclaimed
    docs_from_rows(spark, synth.make_corpus(5)).write.parquet(
        f"{root}/data/snap-9-orphan99"
    )
    before = {r["doc_id"] for r in read_snapshot(spark, root).collect()}

    res = expire_snapshots(spark, root, keep_n=2, orphan_grace_s=0)
    assert res["expired"] == [1]
    assert "snap-9-orphan99" in res["removed_dirs"]
    # snapshot 1's data dir was folded forward, NOT deleted
    assert not any(d.startswith("snap-1-") for d in res["removed_dirs"])

    after = {r["doc_id"] for r in read_snapshot(spark, root).collect()}
    assert after == before
    with _pytest.raises(ValueError, match="unknown snapshot id"):
        read_snapshot(spark, root, snapshot_id=1)
    # surviving time travel unchanged: snapshot 2 = first two batches
    assert read_snapshot(spark, root, snapshot_id=2).count() == 14
    # idempotent re-run removes nothing further
    res2 = expire_snapshots(spark, root, keep_n=2, orphan_grace_s=0)
    assert res2["expired"] == [] and res2["removed_dirs"] == []
    # data dirs on disk == referenced dirs exactly
    assert len(os.listdir(f"{root}/data")) == 3


def test_snapshot_concurrent_commit_single_winner(spark, tmp_path):
    """The commit race guard must hold on file:// where POSIX rename
    silently overwrites: two manifests published for the same sid →
    exactly one wins (deterministically), the loser detects the loss,
    withdraws, and raises."""
    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    append_snapshot = S.append_snapshot
    append_snapshot(docs_from_rows(spark, synth.make_corpus(4)), root)

    # simulate committer A landing sid 2 between B's plan and publish:
    # pre-publish a winning manifest (attempt "00000000" < any uuid4 with
    # probability ~1; use "0-fixed" which sorts before all plain hex)
    df_a = docs_from_rows(spark, synth.make_corpus(3, seed_tag="A"))
    data_a = f"{root}/data/snap-2-0-fixedaa"
    df_a.write.parquet(data_a)
    S._write_file(
        spark,
        f"{root}/manifests/snap-2-0-fixedaa.json",
        __import__("json").dumps(
            {
                "snapshot_id": 2,
                "parent_id": 1,
                "paths": [data_a],
                "schema": df_a.schema.jsonValue(),
            }
        ).encode(),
    )
    # B now appends: computes sid 3 (A's manifest is visible) — so to
    # force the RACE we call the internals the way append would with a
    # stale parent: B publishes its own sid-2 manifest and must lose
    df_b = docs_from_rows(spark, synth.make_corpus(2, seed_tag="B"))
    data_b = f"{root}/data/snap-2-ffffffff"
    df_b.write.parquet(data_b)
    S._write_file(
        spark,
        f"{root}/manifests/snap-2-ffffffff.json",
        __import__("json").dumps(
            {
                "snapshot_id": 2,
                "parent_id": 1,
                "paths": [data_b],
                "schema": df_b.schema.jsonValue(),
            }
        ).encode(),
    )
    wins = dict(S._winning_manifests(spark, root))
    assert wins[2] == "snap-2-0-fixedaa.json"  # deterministic winner
    # readers see the winner's rows only
    read_rows = {r["doc_id"] for r in S.read_snapshot(spark, root).collect()}
    assert read_rows
    a_ids = {r["doc_id"] for r in df_a.select("doc_id").collect()}
    b_ids = {r["doc_id"] for r in df_b.select("doc_id").collect()}
    assert a_ids <= read_rows and not (b_ids & read_rows)
    # loser's data dir is reclaimed by expire as an orphan
    res = S.expire_snapshots(spark, root, keep_n=10, orphan_grace_s=0)
    assert "snap-2-ffffffff" in res["removed_dirs"]
    assert not any(d.startswith("snap-2-0-fixedaa") for d in res["removed_dirs"])


def test_snapshot_expire_across_schema_evolution(spark, tmp_path):
    """Folding expired snapshots forward must preserve the evolved
    read: pre-evolution files folded into a post-evolution manifest are
    read with the newer schema (missing column → NULL, Iceberg's
    read-with-current-schema), so the latest view is unchanged."""
    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources.snapshots import (
        append_snapshot,
        expire_snapshots,
        read_snapshot,
    )

    root = str(tmp_path / "tbl")
    append_snapshot(docs_from_rows(spark, synth.make_corpus(6)), root)  # old schema
    evolved = docs_from_rows(spark, synth.make_corpus(4, seed_tag="v2")).withColumn(
        "source_rank", F.lit(3)
    )
    append_snapshot(evolved, root)
    append_snapshot(
        docs_from_rows(spark, synth.make_corpus(2, seed_tag="v3")).withColumn(
            "source_rank", F.lit(9)
        ),
        root,
    )
    before = {
        (r["doc_id"], r["source_rank"])
        for r in read_snapshot(spark, root).select("doc_id", "source_rank").collect()
    }
    # expire snapshot 1 (old schema) — its paths fold into snapshot 2's
    # manifest (new schema)
    res = expire_snapshots(spark, root, keep_n=2, orphan_grace_s=0)
    assert res["expired"] == [1]
    after = {
        (r["doc_id"], r["source_rank"])
        for r in read_snapshot(spark, root).select("doc_id", "source_rank").collect()
    }
    assert after == before
    assert sum(1 for _, rank in after if rank is None) == 6  # old rows NULL


def test_snapshot_merge_into_copy_on_write(spark, tmp_path):
    """merge_into = Iceberg MERGE INTO … UPDATE SET * / INSERT * under
    copy-on-write: matched rows replaced, unmatched target rows kept,
    unmatched source rows inserted — and ONLY files containing a
    matched key are rewritten (file-granular COW), so time travel to
    the pre-merge snapshot still reads the original rows."""
    import json as _json
    import os

    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    corpus = synth.make_corpus(12)
    # two appends → two data dirs; source keys come ONLY from batch 2,
    # so batch 1's files must be carried forward untouched
    S.append_snapshot(docs_from_rows(spark, corpus[:6]), root)
    S.append_snapshot(docs_from_rows(spark, corpus[6:]), root)

    upd = [dict(d, spans=[dict(s, text="MERGED") for s in d["spans"]]) for d in corpus[8:10]]
    ins = synth.make_corpus(3, seed_tag="new")
    sid = S.merge_into(docs_from_rows(spark, upd + ins), root, key_cols=["doc_id"])
    assert sid == 3

    latest = {
        r["doc_id"]: [s["text"] for s in r["spans"]]
        for r in S.read_snapshot(spark, root).collect()
    }
    assert len(latest) == 15  # 12 originals (2 updated in place) + 3 inserted
    for d in upd:
        assert latest[d["doc_id"]] == ["MERGED"] * len(d["spans"])
    for d in corpus[:8] + corpus[10:]:
        assert latest[d["doc_id"]] == [s["text"] for s in d["spans"]]
    for d in ins:
        assert latest[d["doc_id"]] == [s["text"] for s in d["spans"]]

    # COW granularity: the merge manifest rewrote only snap-2 files
    man_dir = f"{root}/manifests"
    merge_man = [n for n in os.listdir(man_dir) if n.startswith("snap-3-")]
    assert len(merge_man) == 1
    man = _json.loads(open(f"{man_dir}/{merge_man[0]}").read())
    assert man["operation"] == "merge"
    assert man["removed_files"], "expected rewritten files"
    assert all("/snap-2-" in f for f in man["removed_files"])

    # time travel: pre-merge snapshot is untouched
    pre = {
        r["doc_id"]: [s["text"] for s in r["spans"]]
        for r in S.read_snapshot(spark, root, snapshot_id=2).collect()
    }
    assert len(pre) == 12
    for d in upd:
        assert pre[d["doc_id"]] != ["MERGED"] * len(d["spans"])

    # an append-only incremental scan cannot represent the merge's row
    # changes: default mode refuses, like Iceberg's incremental scan
    with pytest.raises(ValueError, match="merge"):
        S.incremental_read(spark, root, after=2).collect()

    # opt-in redelivery: every updated + inserted doc, plus survivors
    # ONLY from the part files that were rewritten (file-granular COW —
    # unaffected part files of batch 2 are carried forward, not
    # re-emitted); at-least-once, caller dedups
    inc = {
        r["doc_id"]
        for r in S.incremental_read(
            spark, root, after=2, on_row_changes="include"
        ).collect()
    }
    assert inc >= {d["doc_id"] for d in upd + ins}
    assert inc <= {d["doc_id"] for d in corpus[6:] + ins}


def test_snapshot_delete_where(spark, tmp_path):
    """delete_where = Iceberg DELETE FROM under copy-on-write: TRUE rows
    removed, FALSE/NULL kept, no-match commits nothing, and files with
    no matching row are never rewritten."""
    from pyspark.sql import functions as FF

    from reading_the_unreadable_spark import synth
    from reading_the_unreadable_spark.sources.docs import docs_from_rows
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    corpus = synth.make_corpus(10)
    S.append_snapshot(docs_from_rows(spark, corpus[:5]), root)
    S.append_snapshot(docs_from_rows(spark, corpus[5:]), root)

    victims = {corpus[1]["doc_id"], corpus[2]["doc_id"]}  # batch-1 only
    sid = S.delete_where(
        spark, root, FF.col("doc_id").isin(*victims)
    )
    assert sid == 3
    left = {r["doc_id"] for r in S.read_snapshot(spark, root).collect()}
    assert left == {d["doc_id"] for d in corpus} - victims
    # time travel pre-delete still sees the victims
    assert {
        r["doc_id"] for r in S.read_snapshot(spark, root, snapshot_id=2).collect()
    } == {d["doc_id"] for d in corpus}
    # no-match → no new snapshot (Iceberg skips empty commits)
    assert S.delete_where(spark, root, "doc_id = 'nope'") is None
    assert S.current_snapshot_id(spark, root) == 3
    # expire everything but the latest: the post-delete view survives
    S.expire_snapshots(spark, root, keep_n=1, orphan_grace_s=0)
    assert {
        r["doc_id"] for r in S.read_snapshot(spark, root).collect()
    } == {d["doc_id"] for d in corpus} - victims


def test_snapshot_stats_pruning(spark, tmp_path):
    """append_snapshot(stat_cols=...) records per-file min/max bounds;
    read_snapshot(prune=...) drops files whose bounds cannot overlap
    the range BEFORE the scan (Iceberg file skipping) — verified via
    inputFiles() — and returns exactly the in-range rows."""
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    # three appends with disjoint doc_id ranges, several files each
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    ).repartition(3)
    for lo, hi in [(0, 100), (100, 200), (200, 300)]:
        S.append_snapshot(mk(lo, hi), root, stat_cols=["doc_id"])
    full = S.read_snapshot(spark, root)
    assert len(full.inputFiles()) == 9

    pruned = S.read_snapshot(spark, root, prune={"doc_id": (120, 180)})
    # only snapshot 2's files can contain [120, 180]
    assert 0 < len(pruned.inputFiles()) <= 3
    got = sorted(r["doc_id"] for r in pruned.collect())
    assert got == list(range(120, 181))

    # open-ended range + a col with no stats falls back to row filtering
    hi_only = S.read_snapshot(spark, root, prune={"doc_id": (None, 50), "v": (10, 20)})
    assert sorted(r["doc_id"] for r in hi_only.collect()) == [5, 6, 7, 8, 9, 10]
    # nothing overlaps → zero files planned, empty result, schema kept
    none = S.read_snapshot(spark, root, prune={"doc_id": (1000, 2000)})
    assert none.count() == 0 and none.columns == ["doc_id", "v"]

    # pruning survives expire's fold (stats carried with the entries)
    S.expire_snapshots(spark, root, keep_n=1, orphan_grace_s=0)
    pruned2 = S.read_snapshot(spark, root, prune={"doc_id": (120, 180)})
    assert 0 < len(pruned2.inputFiles()) <= 3
    assert sorted(r["doc_id"] for r in pruned2.collect()) == list(range(120, 181))


def test_snapshot_rewrite_data_files(spark, tmp_path):
    """rewrite_data_files bin-packs small live files into fewer files
    as one 'replace' snapshot: read identical before/after, file count
    drops, pre-compaction time travel still works, and fresh stats on
    the compacted files keep pruning effective."""
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    ).repartition(4)
    S.append_snapshot(mk(0, 150), root, stat_cols=["doc_id"])
    S.append_snapshot(mk(150, 300), root, stat_cols=["doc_id"])
    before = {r["doc_id"] for r in S.read_snapshot(spark, root).collect()}
    n_before = len(S.read_snapshot(spark, root).inputFiles())
    assert n_before == 8

    res = S.rewrite_data_files(spark, root, stat_cols=["doc_id"])
    assert res is not None and res["compacted"] == 8 and res["new_files"] == 1
    after_df = S.read_snapshot(spark, root)
    assert {r["doc_id"] for r in after_df.collect()} == before
    assert len(after_df.inputFiles()) == 1
    # time travel to pre-compaction still plans the original files
    assert len(S.read_snapshot(spark, root, snapshot_id=2).inputFiles()) == 8
    # fresh bounds on the compacted file: a miss range plans zero files
    assert (
        len(S.read_snapshot(spark, root, prune={"doc_id": (900, 999)}).inputFiles())
        == 0
    )
    # idempotent: a single compacted file has nothing left to pack
    assert S.rewrite_data_files(spark, root, stat_cols=["doc_id"]) is None


def test_incremental_read_skips_compaction(spark, tmp_path):
    """A maintenance compaction between two tail cycles is invisible to
    the incremental feed: 'replace' snapshots rewrite rows the consumer
    already saw, so they contribute nothing — no duplicate storm, and
    appends on either side of the compaction are each delivered exactly
    once (Iceberg's incremental APPEND scan semantics)."""
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    ).repartition(3)
    S.append_snapshot(mk(0, 60), root)      # snap 1 — consumed
    S.append_snapshot(mk(60, 120), root)    # snap 2 — pending
    assert S.rewrite_data_files(spark, root)["snapshot_id"] == 3  # replace
    S.append_snapshot(mk(120, 150), root)   # snap 4 — pending

    inc = S.incremental_read(spark, root, after=1)
    got = [r["doc_id"] for r in inc.collect()]
    assert sorted(got) == list(range(60, 150))  # exactly once, no dupes
    # and the compacted rewrite of already-consumed snap-1 rows is
    # genuinely absent, not deduped away
    assert len(got) == len(set(got))

    # a tail that starts AFTER the compaction snapshot sees only the
    # later append (the replace added no new rows past its own sid)
    assert sorted(
        r["doc_id"] for r in S.incremental_read(spark, root, after=3).collect()
    ) == list(range(120, 150))


def test_snapshot_hidden_partitioning(spark, tmp_path):
    """Iceberg hidden partitioning: the table declares transforms
    (bucket/identity/truncate), writers route rows into transform
    directories, the manifest records each file's partition tuple, and
    read_snapshot(prune=...) skips whole partitions from the predicate
    alone — the query never mentions the bucket."""
    import hashlib

    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("src"),
        (F.col("id") * 2).alias("v"),
    )
    spec = [("doc_id", "bucket", 8), ("src", "identity")]
    S.append_snapshot(df, root, partition_by=spec)
    S.append_snapshot(
        spark.range(300, 600).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("src"),
            (F.col("id") * 2).alias("v"),
        ),
        root,
        partition_by=spec,
    )

    # full read: user schema only (no _pt columns), all rows
    full = S.read_snapshot(spark, root)
    assert full.columns == ["doc_id", "src", "v"]
    assert full.count() == 600
    n_all = len(full.inputFiles())
    assert n_all >= 16  # 8 buckets x >=2 src values, x2 snapshots

    # point lookup on doc_id prunes to the one bucket per snapshot
    point = S.read_snapshot(spark, root, prune={"doc_id": (42, 42)})
    bucket42 = int(hashlib.md5(b"42").hexdigest()[:8], 16) % 8
    assert [r["doc_id"] for r in point.collect()] == [42]
    assert 0 < len(point.inputFiles()) <= n_all // 8 + 2
    # every planned file sits in bucket42's directory
    assert all(f"_pt0={bucket42}/" in f for f in point.inputFiles())

    # identity prune on src: only that value's directories are planned
    srcq = S.read_snapshot(spark, root, prune={"src": ("src1", "src1")})
    assert srcq.count() == 200
    assert all("_pt1=src1" in f for f in srcq.inputFiles())

    # a RANGE on the bucketed column cannot bucket-prune (conservative:
    # all files), but rows are still filtered correctly
    rng = S.read_snapshot(spark, root, prune={"doc_id": (10, 20)})
    assert sorted(r["doc_id"] for r in rng.collect()) == list(range(10, 21))

    # compaction preserves partition pruning: files are bin-packed
    # WITHIN a partition and the replace manifest re-records tuples
    res = S.rewrite_data_files(spark, root)
    assert res is not None
    point2 = S.read_snapshot(spark, root, prune={"doc_id": (42, 42)})
    assert [r["doc_id"] for r in point2.collect()] == [42]
    assert len(point2.inputFiles()) < len(
        S.read_snapshot(spark, root).inputFiles()
    )

    # ...and survives the expire fold
    S.expire_snapshots(spark, root, keep_n=1, orphan_grace_s=0)
    point3 = S.read_snapshot(spark, root, prune={"doc_id": (42, 42)})
    assert [r["doc_id"] for r in point3.collect()] == [42]
    assert len(point3.inputFiles()) < len(
        S.read_snapshot(spark, root).inputFiles()
    )


def test_snapshot_truncate_transform(spark, tmp_path):
    """truncate(W) partitioning: integer sources floor to W-multiples,
    string sources cut to W-char prefixes; range prunes plan only the
    overlapping truncation cells."""
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("issue-"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "name"
        ),
    )
    S.append_snapshot(
        df, root, partition_by=[("doc_id", "truncate", 100)]
    )
    rng = S.read_snapshot(spark, root, prune={"doc_id": (250, 349)})
    assert sorted(r["doc_id"] for r in rng.collect()) == list(range(250, 350))
    # only cells 200 and 300 overlap [250, 349]
    cells = {f.split("_pt0=")[1].split("/")[0] for f in rng.inputFiles()}
    assert cells == {"200", "300"}

    # string truncate
    root2 = str(tmp_path / "tbl2")
    S.append_snapshot(df, root2, partition_by=[("name", "truncate", 7)])
    one = S.read_snapshot(
        spark, root2, prune={"name": ("issue-0500", "issue-0999")}
    )
    assert one.count() == 500
    cells2 = {f.split("_pt0=")[1].split("/")[0] for f in one.inputFiles()}
    assert cells2 == {"issue-0"}

    # bad specs raise loudly
    with pytest.raises(ValueError, match="transform"):
        S.append_snapshot(df, root2, partition_by=[("name", "hash", 4)])
    with pytest.raises(ValueError, match="integer or string"):
        S.append_snapshot(
            df.withColumn("f", F.lit(1.5)), root2, partition_by=[("f", "identity")]
        )


def test_snapshot_zorder_rewrite(spark, tmp_path):
    """rewrite_data_files(zorder_by=[x, y]) re-clusters ALL live files
    along a Morton curve: a 2-D box prune that touched every file on
    the round-robin layout plans ~1 file afterwards, rows are
    byte-identical, and non-numeric / missing zorder columns raise."""
    import os

    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    # 64x64 grid; round-robin repartition scatters every file across
    # the full range of BOTH dims, so per-file bounds prune nothing
    grid = spark.range(4096).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    S.append_snapshot(grid.repartition(16), root, stat_cols=["x", "y"])
    box = {"x": (0, 7), "y": (0, 7)}
    assert len(S.read_snapshot(spark, root, prune=box).inputFiles()) == 16

    # pick target bytes so the rewrite emits ~16 clustered files
    total = sum(
        e.stat().st_size
        for e in Path(root, "data").rglob("*.parquet")
    )
    res = S.rewrite_data_files(
        spark, root, target_file_bytes=-(-total // 16), zorder_by=["x", "y"]
    )
    assert res is not None and res["compacted"] == 16

    after = S.read_snapshot(spark, root)
    assert {r["doc_id"] for r in after.collect()} == set(range(4096))
    n_files = len(after.inputFiles())
    assert n_files >= 8  # clustering kept the file count, not one blob

    # the aligned 8x8 box is 1/64 of the curve: at most a file or two
    pruned = S.read_snapshot(spark, root, prune=box)
    assert len(pruned.inputFiles()) <= 2
    assert sorted((r["x"], r["y"]) for r in pruned.collect()) == [
        (x, y) for x in range(8) for y in range(8)
    ]
    # a miss range plans zero files
    assert (
        len(S.read_snapshot(spark, root, prune={"x": (100, 200)}).inputFiles())
        == 0
    )

    # loud failures: missing column, non-numeric column
    with pytest.raises(ValueError, match="absent from live"):
        S.rewrite_data_files(spark, root, zorder_by=["nope"])
    root2 = str(tmp_path / "tbl2")
    S.append_snapshot(
        grid.withColumn("s", F.concat(F.lit("d"), F.col("doc_id"))).repartition(4),
        root2,
    )
    with pytest.raises(ValueError, match="numeric"):
        S.rewrite_data_files(spark, root2, zorder_by=["s"])


def test_snapshot_rollback(spark, tmp_path):
    """rollback_to_snapshot restores an earlier state metadata-only:
    reads equal the target snapshot byte-for-byte, intermediate
    snapshots stay time-travelable, carried-forward bounds keep
    pruning, the incremental feed refuses to cross a rollback, and
    expire after rollback keeps the re-added files alive."""
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    ).repartition(3)
    S.append_snapshot(mk(0, 100), root, stat_cols=["doc_id"])     # snap 1
    S.append_snapshot(mk(100, 200), root, stat_cols=["doc_id"])   # snap 2
    S.delete_where(spark, root, "doc_id % 5 = 0")                 # snap 3
    S.append_snapshot(mk(200, 260), root, stat_cols=["doc_id"])   # snap 4

    want = {r["doc_id"] for r in S.read_snapshot(spark, root, snapshot_id=2).collect()}
    sid = S.rollback_to_snapshot(spark, root, 2)                  # snap 5
    assert sid == 5
    got = {r["doc_id"] for r in S.read_snapshot(spark, root).collect()}
    assert got == want == set(range(200))
    # the rolled-back snapshots remain time-travel targets
    assert (
        len({r["doc_id"] for r in S.read_snapshot(spark, root, snapshot_id=4).collect()})
        == 200 - 40 + 60
    )
    # carried-forward bounds: a miss range plans zero files
    assert (
        len(S.read_snapshot(spark, root, prune={"doc_id": (900, 999)}).inputFiles())
        == 0
    )
    # rolling back to the state you are already at is a no-op
    assert S.rollback_to_snapshot(spark, root, 2) == 5
    # unknown target raises
    with pytest.raises(ValueError, match="unknown snapshot id"):
        S.rollback_to_snapshot(spark, root, 99)
    # an append-only feed cannot represent the rollback's row changes
    with pytest.raises(ValueError, match="rollback"):
        S.incremental_read(spark, root, after=4)
    # ...but appends after it flow normally
    S.append_snapshot(mk(300, 320), root)                         # snap 6
    assert sorted(
        r["doc_id"] for r in S.incremental_read(spark, root, after=5).collect()
    ) == list(range(300, 320))
    # expire down to the last 2 snapshots: the re-added files survive
    S.expire_snapshots(spark, root, keep_n=2, orphan_grace_s=0)
    got2 = {r["doc_id"] for r in S.read_snapshot(spark, root).collect()}
    assert got2 == want | set(range(300, 320))


def test_snapshot_tags(spark, tmp_path):
    """Iceberg refs: tags pin snapshots by name, read back as VERSION
    AS OF, survive expire_snapshots regardless of keep_n, and become
    expirable again once deleted; tags are immutable per name."""
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id as doc_id", "id % 7 as v"
    ).repartition(2)
    for i in range(5):
        S.append_snapshot(mk(i * 50, (i + 1) * 50), root)  # snaps 1-5

    assert S.create_tag(spark, root, "audit-q1", snapshot_id=2) == 2
    assert S.create_tag(spark, root, "latest") == 5  # default: current
    assert S.list_tags(spark, root) == {"audit-q1": 2, "latest": 5}
    assert S.create_tag(spark, root, "audit-q1", snapshot_id=2) == 2  # idempotent
    with pytest.raises(ValueError, match="immutable"):
        S.create_tag(spark, root, "audit-q1", snapshot_id=3)
    with pytest.raises(ValueError, match="unknown snapshot"):
        S.create_tag(spark, root, "nope", snapshot_id=99)

    assert S.read_snapshot(spark, root, tag="audit-q1").count() == 100
    with pytest.raises(ValueError, match="unknown tag"):
        S.read_snapshot(spark, root, tag="ghost")
    with pytest.raises(ValueError, match="not both"):
        S.read_snapshot(spark, root, snapshot_id=2, tag="latest")

    # expire keeps the tagged snapshot alive: keep_n=1 would normally
    # fold snaps 1-4, but the tag at 2 pins the fold point before it
    res = S.expire_snapshots(spark, root, keep_n=1, orphan_grace_s=0)
    assert res["expired"] == [1]
    assert S.read_snapshot(spark, root, tag="audit-q1").count() == 100
    assert S.read_snapshot(spark, root, snapshot_id=3).count() == 150
    # drop the tag: the pinned range becomes expirable again
    S.delete_tag(spark, root, "audit-q1")
    res2 = S.expire_snapshots(spark, root, keep_n=1, orphan_grace_s=0)
    assert res2["expired"] == [2, 3, 4]
    with pytest.raises(ValueError, match="unknown snapshot id"):
        S.read_snapshot(spark, root, snapshot_id=3).count()
    assert S.read_snapshot(spark, root).count() == 250


def test_snapshot_write_audit_publish(spark, tmp_path):
    """Iceberg WAP: staged rows are written for real but invisible to
    every read (latest, time travel, incremental) until published;
    the audit reads exactly the staged rows; publish is metadata-only
    and idempotent across a crash between commit and cleanup; aborted
    stages become orphans that expire reclaims — while PENDING stages
    survive orphan reclamation."""
    from reading_the_unreadable_spark.sources import snapshots as S

    root = str(tmp_path / "tbl")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id as doc_id", "id % 7 as v"
    ).repartition(2)
    S.append_snapshot(mk(0, 100), root, stat_cols=["doc_id"])  # snap 1
    name = S.stage_append(mk(100, 160), root, stat_cols=["doc_id"])

    # invisible everywhere until published
    assert S.read_snapshot(spark, root).count() == 100
    assert S.incremental_read(spark, root, after=None).count() == 100
    # ...but the audit sees exactly the staged rows
    audited = S.read_staged(spark, root, name)
    assert sorted(r["doc_id"] for r in audited.collect()) == list(range(100, 160))
    # pending staged data survives orphan reclamation
    S.expire_snapshots(spark, root, keep_n=1, orphan_grace_s=0)
    assert S.read_staged(spark, root, name).count() == 60

    sid = S.publish_staged(spark, root, name)
    assert sid == 2
    assert S.read_snapshot(spark, root).count() == 160
    # stats traveled through staging: a miss range plans zero files
    assert (
        len(S.read_snapshot(spark, root, prune={"doc_id": (900, 999)}).inputFiles())
        == 0
    )
    # idempotent: the staging file is gone, a re-publish errors loudly
    with pytest.raises(ValueError, match="unknown staging"):
        S.publish_staged(spark, root, name)

    # crash-shaped idempotence: a leftover staging manifest whose files
    # are already live is cleaned up without double-adding
    name2 = S.stage_append(mk(200, 220), root)
    import json as _json

    raw = S._read_file(spark, f"{root}/staged/{name2}")
    S.publish_staged(spark, root, name2)
    S._write_file(spark, f"{root}/staged/{name2}", raw)  # simulate crash
    before = S.read_snapshot(spark, root).count()
    assert S.publish_staged(spark, root, name2) == S.current_snapshot_id(spark, root)
    assert S.read_snapshot(spark, root).count() == before  # no double add

    # abort: rows never appear, and the data dir is reclaimed
    name3 = S.stage_append(mk(300, 330), root)
    S.abort_staged(spark, root, name3)
    with pytest.raises(ValueError, match="unknown staging"):
        S.read_staged(spark, root, name3) and None
    res = S.expire_snapshots(spark, root, keep_n=10, orphan_grace_s=0)
    assert any("staged" in d for d in res["removed_dirs"])
    assert S.read_snapshot(spark, root).count() == before


def test_orc_pushdown_and_partition_pruning(spark, tmp_path):
    """The ORC reader must receive pushed predicates and prune lang
    partitions — same scan discipline as the parquet path."""
    import pyspark.sql.functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_orc")
    src.write.mode("overwrite").partitionBy("lang").orc(path)
    back = spark.read.orc(path)
    plan = (
        back.filter((F.col("lang") == "en") & (F.col("n_chars") > 500))
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]" in plan, plan[:1500]
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:120], plan[:1500]
    # round trip is lossless
    assert back.count() == src.count()


def test_validate_table_rules(spark):
    from reading_the_unreadable_spark.sources.docs import validate_table

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "xx", 900), (2, None, None)],
        "id long, lang string, n long",
    )
    rules = [
        {"name": "id_unique", "col": "id", "check": "unique"},
        {"name": "lang_nn", "col": "lang", "check": "not_null"},
        {"name": "lang_set", "col": "lang", "check": "in_set", "values": ["en", "de"]},
        {"name": "n_range", "col": "n", "check": "range", "lo": 1, "hi": 500},
        {"name": "lang_re", "col": "lang", "check": "regex", "pattern": "^[a-z]{2}$"},
    ]
    got = {r["rule"]: r for r in validate_table(df, rules).collect()}
    assert got["_rows"]["violations"] == 3 and got["_rows"]["ok"] == 1
    assert got["id_unique"]["violations"] == 1 and got["id_unique"]["ok"] == 0
    assert got["lang_nn"]["violations"] == 1
    # null AND unknown both violate membership
    assert got["lang_set"]["violations"] == 2
    # null and out-of-range
    assert got["n_range"]["violations"] == 2
    assert got["lang_re"]["violations"] == 1  # only null ('xx' matches)
    import pytest

    with pytest.raises(ValueError):
        validate_table(df, [{"name": "b", "col": "id", "check": "nope"}])


def test_validate_table_empty_table_fails_guard(spark):
    from reading_the_unreadable_spark.sources.docs import validate_table

    df = spark.createDataFrame([], "id long")
    got = {r["rule"]: r for r in validate_table(
        df, [{"name": "id_nn", "col": "id", "check": "not_null"}]).collect()}
    assert got["_rows"]["ok"] == 0, "empty table must not pass vacuously"
    assert got["id_nn"]["violations"] == 0
