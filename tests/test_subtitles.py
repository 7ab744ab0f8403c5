"""SRT / WebVTT subtitle source: parsing, round trip, quarantine."""

import pandas as pd
import pytest

from reading_the_unreadable_spark.sources.subtitles import (
    build_srt,
    build_vtt,
    cue_plan,
    parse_subtitles,
    parse_subtitles_frame,
    subtitles_from_documents,
)


def test_srt_basic_and_sloppy_forms():
    # canonical SRT with CRLF + index lines
    srt = (
        b"1\r\n00:00:01,000 --> 00:00:02,500\r\nhello world\r\n\r\n"
        b"2\r\n00:01:00,250 --> 00:01:02,000\r\nsecond\r\ncue\r\n\r\n"
    )
    cues = parse_subtitles(srt)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == [
        (1000, 2500, "hello world"),
        (60250, 62000, "second cue"),
    ]
    assert all(c["fmt"] == "srt" for c in cues)
    # index lines omitted, LF endings, '.' millisecond separator
    sloppy = b"00:00:00.000 --> 00:00:01.000\nhi\n\n00:00:02.000 --> 00:00:03.000\nbye\n"
    assert [c["text"] for c in parse_subtitles(sloppy)] == ["hi", "bye"]
    # cues renumbered sequentially regardless of file indices
    weird = b"7\n00:00:00,000 --> 00:00:01,000\na\n\n99\n00:00:02,000 --> 00:00:03,000\nb\n"
    assert [c["cue_index"] for c in parse_subtitles(weird)] == [1, 2]


def test_vtt_metadata_blocks_identifiers_tags_and_short_timestamps():
    vtt = (
        "﻿WEBVTT - demo\n\n"
        "NOTE\nauthoring note, skipped\n\n"
        "STYLE\n::cue { color: cream }\n\n"
        "intro-cue\n"
        "00:05.000 --> 00:07.500 line:0 position:50%\n"
        "<v Narrator>watch <i>this</i> <c.loud>now</c>\n\n"
        "01:00:00.000 --> 01:00:01.000\n"
        "<00:59:59.000>karaoke stripped\n"
    ).encode("utf-8")
    cues = parse_subtitles(vtt)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == [
        (5000, 7500, "watch this now"),
        (3600000, 3601000, "karaoke stripped"),
    ]
    assert all(c["fmt"] == "vtt" for c in cues)


def test_builders_roundtrip_exactly():
    for doc_id in (0, 1, 2, 3, 6, 7, 13, 14):
        text = "key agg row scan slow fast table value part"
        cues = cue_plan(doc_id, text)
        blob = (
            build_vtt(cues, note=f"doc {doc_id}")
            if doc_id % 2 == 0
            else build_srt(cues)
        )
        parsed = parse_subtitles(blob)
        assert [
            (c["start_ms"], c["end_ms"], c["text"]) for c in parsed
        ] == cues
        # multi-line cue bodies were joined with a single space
        assert all("\n" not in c["text"] for c in parsed)


def test_error_contract_is_valueerror_only():
    with pytest.raises(ValueError):
        parse_subtitles(b"\xff\xfe not utf-8 \x80")
    with pytest.raises(ValueError):
        parse_subtitles(b"WEBVTT\n\nc1\nno timing line here\n")
    with pytest.raises(ValueError):
        parse_subtitles(b"1\n00:00:02,000 --> 00:00:01,000\nbackwards\n")
    with pytest.raises(ValueError):
        parse_subtitles(b"garbage header\nalso no timing\n")


def test_frame_parses_and_quarantines(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["alpha beta gamma delta", "one two"]}
        )
    )
    files = subtitles_from_documents(docs)
    good = parse_subtitles_frame(files).toPandas()
    assert good["parse_err"].isna().all()
    by_doc = {
        int(s.split("doc-")[1].split(".")[0]): g
        for s, g in good.groupby("source_file")
    }
    assert list(by_doc[0]["fmt"].unique()) == ["vtt"]
    assert list(by_doc[1]["fmt"].unique()) == ["srt"]
    assert list(by_doc[0]["text"]) == ["alpha beta gamma", "delta"]
    assert list(by_doc[1]["text"]) == ["one two"]

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["synth://broken.srt"],
                "content": [bytearray(b"\xff\xfe broken")],
            }
        )
    )
    q = parse_subtitles_frame(bad).toPandas()
    assert len(q) == 1 and q["parse_err"].notna().all()
    assert q["cue_index"].isna().all()
