"""Markdown→prose chain unit behavior (the driver row covers the
closed-form corpus; these pin the edge rules)."""

from pyspark.sql import functions as F

from reading_the_unreadable_spark.operators.markdown import (
    markdown_extract,
    markdown_to_text,
)


def _strip_one(spark, s):
    df = spark.createDataFrame([(s,)], "markdown string")
    return df.select(markdown_to_text(F.col("markdown")).alias("t")).first()["t"]


def test_markdown_rules(spark):
    cases = [
        # fenced code blocks drop body and fences; both fence styles
        ("before\n```python\nrm -rf /\n```\nafter", "before after"),
        ("a\n~~~\ncode\n~~~\nb", "a b"),
        # unterminated fence swallows the tail like real renderers
        ("keep\n```\nlost forever", "keep"),
        # comments go
        ("x <!-- hidden\nnote --> y", "x y"),
        # reference link definitions drop whole-line
        ("see [docs][d]\n[d]: https://x.org/d \"t\"\nend", "see docs end"),
        # images keep alt text; links keep labels
        ("![diagram](img.png) and [site](https://x.org)", "diagram and site"),
        ("![a][r1] plus [b][r2] plus [c][]", "a plus b plus c"),
        # autolinks vanish (URL and email forms)
        ("go <https://x.org/path> or <a@b.org> now", "go or now"),
        # inline code keeps its text
        ("run `make all` twice", "run make all twice"),
        # ATX headings unwrap, closing fences optional
        ("# Title\nbody\n### Deep ###\nmore", "Title body Deep more"),
        # setext underlines and thematic breaks are decoration
        ("Title\n====\nbody\n---\nmore\n* * *\nend", "Title body more end"),
        # tables: alignment row drops, pipes become spaces
        ("| a | b |\n|---|:--:|\n| c | d |", "a b c d"),
        # blockquotes and lists unwrap at any nesting
        ("> quoted\n> > deep\n- one\n+ two\n3. three\n4) four",
         "quoted deep one two three four"),
        # emphasis pairs unwrap; snake_case survives
        ("***x*** **b** *i* __u__ _e_ ~~s~~ snake_case_id",
         "x b i u e s snake_case_id"),
        # leftover tags and entities
        ("a <br/> b &amp; c &nbsp; d &quot;e&quot;", 'a b & c d "e"'),
    ]
    for src, want in cases:
        assert _strip_one(spark, src) == want, src


def test_markdown_extract_frame_columns(spark):
    df = spark.createDataFrame(
        [(1, "**hi** `x`"), (2, None)], "doc_id long, markdown string"
    )
    rows = {r["doc_id"]: r for r in markdown_extract(df).collect()}
    assert rows[1]["text"] == "hi x"
    assert rows[1]["n_chars_in"] == 10 and rows[1]["n_chars_out"] == 4
    assert rows[1]["reduction"] == round(4 / 10, 6)
    assert rows[2]["text"] == "" and rows[2]["n_chars_in"] == 0
