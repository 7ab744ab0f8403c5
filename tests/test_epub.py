"""EPUB source: spine-order discovery chain, quarantine, composition
with the DOM-lite html block machinery."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reading_the_unreadable_spark.sources.archives import build_zip, parse_zip
from reading_the_unreadable_spark.sources.epub import (
    build_epub,
    epub_from_documents,
    parse_epub,
    parse_epub_frame,
)

CHAPTERS = [
    ("intro.xhtml", "<html><body><h1>One</h1></body></html>"),
    ("body.xhtml", "<html><body><p>Two</p></body></html>"),
    ("end.xhtml", "<html><body><p>Three</p></body></html>"),
]


def test_spine_order_beats_zip_order():
    data = build_epub(CHAPTERS)
    # the writer stores chapters REVERSED in the zip...
    zip_names = [m["member_name"] for m in parse_zip(data)]
    assert zip_names.index("OEBPS/end.xhtml") < zip_names.index(
        "OEBPS/intro.xhtml"
    )
    # ...but the reader follows the spine
    got = parse_epub(data)
    assert [c["href"] for c in got] == [
        "OEBPS/intro.xhtml", "OEBPS/body.xhtml", "OEBPS/end.xhtml",
    ]
    assert [c["order"] for c in got] == [1, 2, 3]
    assert got[0]["html"] == CHAPTERS[0][1]
    assert data == build_epub(CHAPTERS)  # deterministic bytes


def test_discovery_chain_failures_raise():
    with pytest.raises(ValueError):
        parse_epub(b"not a zip")
    with pytest.raises(ValueError, match="container.xml missing"):
        parse_epub(build_zip([("mimetype", b"application/epub+zip", "stored")]))
    with pytest.raises(ValueError, match="mimetype member"):
        parse_epub(build_zip([("mimetype", b"text/plain", "stored")]))
    # spine references a manifest id that doesn't exist
    bad_opf = (
        '<package xmlns="http://www.idpf.org/2007/opf">'
        "<manifest/><spine><itemref idref='ghost'/></spine></package>"
    )
    container = (
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="content.opf"/></rootfiles>'
        "</container>"
    )
    with pytest.raises(ValueError, match="not in manifest"):
        parse_epub(
            build_zip(
                [
                    ("META-INF/container.xml", container.encode(), "stored"),
                    ("content.opf", bad_opf.encode(), "stored"),
                ]
            )
        )


def test_frame_quarantine_and_block_composition(spark):
    docs = spark.createDataFrame(
        [(i, f"body text {i} with <markup> & amp") for i in range(6)],
        "doc_id long, text string",
    )
    frame = epub_from_documents(docs)
    # inject one corrupt file
    bad = spark.createDataFrame(
        pd.DataFrame(
            {"source": ["s://bad.epub"], "content": [bytearray(b"zz")]}
        )
    )
    out = parse_epub_frame(frame.unionByName(bad))
    rows = out.collect()
    assert sum(r["parse_err"] is not None for r in rows) == 1
    good = [r for r in rows if r["parse_err"] is None]
    assert len(good) == 12  # 2 chapters per doc
    # spine order: intro then body, per doc
    by_src: dict[str, list] = {}
    for r in sorted(good, key=lambda r: (r["source_file"], r["chapter_order"])):
        by_src.setdefault(r["source_file"], []).append(r["href"])
    assert all(
        v == ["OEBPS/intro.xhtml", "OEBPS/body.xhtml"] for v in by_src.values()
    )
    # composition: chapter html through the existing visible-text strip
    from reading_the_unreadable_spark.operators.html import visible_text

    texts = (
        out.filter(F.col("parse_err").isNull())
        .withColumn(
            "doc_id",
            F.regexp_extract("source_file", r"doc_(\d+)\.epub", 1).cast("long"),
        )
        .filter(F.col("chapter_order") == 1)
        .select("doc_id", visible_text(F.col("html")).alias("t"))
        .collect()
    )
    for r in texts:
        assert f"Issue {r['doc_id']}" in r["t"]
        assert f"body text {r['doc_id']} with <markup> & amp" in r["t"]
