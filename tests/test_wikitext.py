"""Wikitext→prose chain unit behavior (the driver row covers the
closed-form corpus; these pin the edge rules)."""

from pyspark.sql import functions as F

from reading_the_unreadable_spark.operators.wikitext import (
    wiki_extract,
    wikitext_to_text,
)


def _strip_one(spark, s):
    df = spark.createDataFrame([(s,)], "wikitext string")
    return df.select(wikitext_to_text(F.col("wikitext")).alias("t")).first()["t"]


def test_wikitext_rules(spark):
    cases = [
        # comments go
        ("before <!-- hidden\nnote --> after", "before after"),
        # refs: paired and self-closing
        (
            'x<ref name="a">Smith 1999</ref> y<ref name="a"/> z',
            "x y z",
        ),
        # non-prose elements, body and all
        ("a <math>x^2</math> b <code>rm -rf</code> c", "a b c"),
        # tables vanish whole, incl. nested
        (
            'pre {| class="wikitable"\n|-\n| a || b\n{| inner |}\n|} post',
            "pre post",
        ),
        # templates: innermost-first nested unwind
        ("x {{Infobox|date={{date|2020|1}}|name=y}} z", "x z"),
        # media links with caption (incl. one nested link) drop whole
        ("a [[File:pic.png|thumb|see [[other]] page]] b", "a b"),
        # piped link keeps last label segment; plain keeps target
        ("[[target|label]] and [[plain page]]", "label and plain page"),
        # multi-pipe piped link keeps last segment
        ("[[a|b|c]]", "c"),
        # external links: labeled keeps label, bare drops
        (
            "see [https://x.org/a the site] or [https://y.org/b]",
            "see the site or",
        ),
        # quote runs vanish
        ("'''''b+i''''' '''bold''' ''ital''", "b+i bold ital"),
        # headings unwrap at any level
        ("== History ==\nbody\n==== Deep ====\nmore", "History body Deep more"),
        # list / indent markers strip
        ("* one\n# two\n:: indented\n; term", "one two indented term"),
        # leftover tags and entities
        ("a <br/> b &amp; c &nbsp; d &quot;e&quot;", 'a b & c d "e"'),
    ]
    for src, want in cases:
        assert _strip_one(spark, src) == want, src


def test_wiki_extract_frame_columns(spark):
    df = spark.createDataFrame(
        [(1, "'''hi''' {{x}}"), (2, None)], "doc_id long, wikitext string"
    )
    rows = {r["doc_id"]: r for r in wiki_extract(df).collect()}
    assert rows[1]["text"] == "hi"
    assert rows[1]["n_chars_in"] == 14 and rows[1]["n_chars_out"] == 2
    assert rows[1]["reduction"] == round(2 / 14, 6)
    assert rows[2]["text"] == "" and rows[2]["n_chars_in"] == 0
