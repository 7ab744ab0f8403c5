"""DOCX source: writer/reader round-trip, span model, quarantine."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reading_the_unreadable_spark.sources.docx import (
    build_docx,
    docx_from_documents,
    parse_docx,
    parse_docx_frame,
)


def test_roundtrip_interleaved_spans():
    blocks = [
        {"kind": "title", "text": "Issue 7"},
        {"kind": "text", "text": 'a <b> & "q"\ttabbed\nbroken line'},
        {"kind": "figure", "media_ref": "image1.png"},
        {"kind": "table", "rows": [["a", "b"], ["c", "d"]]},
        {"kind": "text", "text": "after the table"},
    ]
    spans = parse_docx(build_docx(blocks, {"image1.png": b"px"}))
    assert [s["order"] for s in spans] == [1, 2, 3, 4, 5]
    assert [s["kind"] for s in spans] == [
        "title", "text", "figure", "table", "text",
    ]
    # XML specials, TAB and LF survive the run encoding byte-exactly
    assert spans[1]["text"] == 'a <b> & "q"\ttabbed\nbroken line'
    assert spans[2]["media_ref"] == "media/image1.png"
    assert spans[2]["text"] == ""
    assert spans[3]["text"] == "a\tb\nc\td"
    assert all(s["media_ref"] is None for i, s in enumerate(spans) if i != 2)


def test_writer_deterministic_and_empty_para_skipped():
    blocks = [{"kind": "title", "text": "T"}, {"kind": "text", "text": ""}]
    a, b = build_docx(blocks), build_docx(blocks)
    assert a == b
    spans = parse_docx(a)
    assert len(spans) == 1  # empty paragraph produces no span


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown block kind"):
        build_docx([{"kind": "footnote", "text": "x"}])


def test_malformed_inputs_raise_value_error():
    with pytest.raises(ValueError):
        parse_docx(b"not a zip at all")
    # valid zip, but no word/document.xml
    from reading_the_unreadable_spark.sources.archives import build_zip

    with pytest.raises(ValueError, match="word/document.xml missing"):
        parse_docx(build_zip([("readme.txt", b"hi", "stored")]))
    # document.xml present but not well-formed XML
    with pytest.raises(ValueError, match="malformed document XML"):
        parse_docx(build_zip([("word/document.xml", b"<w:doc", "stored")]))


def test_frame_quarantines_and_explodes(spark):
    good = build_docx(
        [{"kind": "title", "text": "T"}, {"kind": "text", "text": "body"}]
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["s://good.docx", "s://bad.docx"],
                "content": [bytearray(good), bytearray(b"garbage")],
            }
        )
    )
    out = parse_docx_frame(df).orderBy("source_file", "span_order").collect()
    assert [r["kind"] for r in out if r["source_file"] == "s://good.docx"] == [
        "title", "text",
    ]
    bad = [r for r in out if r["source_file"] == "s://bad.docx"]
    assert len(bad) == 1 and bad[0]["parse_err"] and bad[0]["kind"] is None


def test_docx_from_documents_matches_closed_form(spark):
    docs = spark.createDataFrame(
        [(i, f"text of {i} <&>\twith tab") for i in range(16)],
        "doc_id long, text string",
    )
    out = (
        parse_docx_frame(docx_from_documents(docs))
        .withColumn(
            "doc_id",
            F.regexp_extract("source_file", r"doc_(\d+)\.docx", 1).cast("long"),
        )
        .orderBy("doc_id", "span_order")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(16):
        spans = by_doc[i]
        assert spans[0]["kind"] == "title" and spans[0]["text"] == f"Issue {i}"
        assert spans[1]["kind"] == "text"
        assert spans[1]["text"] == f"text of {i} <&>\twith tab"
        kinds = [s["kind"] for s in spans]
        assert ("figure" in kinds) == (i % 3 == 0)
        assert ("table" in kinds) == (i % 5 == 0)
        assert [s["span_order"] for s in spans] == list(range(1, len(spans) + 1))
        if i % 5 == 0:
            t = [s for s in spans if s["kind"] == "table"][0]
            assert t["text"] == f"r0c0:{i}\tr0c1:{i}\nr1c0:{i}\tr1c1:{i}"
