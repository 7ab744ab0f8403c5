"""LaTeX→prose chain and code-corpus filter unit behavior (the driver
row covers the closed-form corpus; these pin the edge rules)."""

from pyspark.sql import functions as F

from reading_the_unreadable_spark.operators.code import code_quality_signals
from reading_the_unreadable_spark.operators.latex import latex_strip, latex_to_text


def _strip_one(spark, s):
    df = spark.createDataFrame([(s,)], "latex string")
    return df.select(latex_to_text(F.col("latex")).alias("t")).first()["t"]


def test_latex_rules(spark):
    cases = [
        # comments go, escaped percent stays
        ("body % trailing comment\n100\\% sure", "body 100% sure"),
        # nested discardable environments unwind innermost-first
        (
            "pre \\begin{table}\\begin{tabular}{ll}a&b\\end{tabular}"
            "\\end{table} post",
            "pre post",
        ),
        # kept environment: markers vanish, body stays
        ("\\begin{abstract}kept body\\end{abstract}", "kept body"),
        # display + inline math
        ("a $$x=1$$ b \\[y=2\\] c $z$ d", "a b c d"),
        # drop-arg vs keep-arg commands, nested unwrap
        (
            "\\section{Head} \\textbf{\\emph{deep}} \\cite{k} "
            "\\includegraphics[width=2cm]{fig.png} tail",
            "Head deep tail",
        ),
        # bare commands, forced breaks, TeX escapes, stray braces
        ("\\maketitle x \\\\ y \\& z {grp}", "x y & z grp"),
    ]
    for src, want in cases:
        assert _strip_one(spark, src) == want, src


def test_latex_strip_frame_columns(spark):
    df = spark.createDataFrame(
        [(1, "\\textbf{hi} $x$"), (2, None)], "doc_id long, latex string"
    )
    rows = {r["doc_id"]: r for r in latex_strip(df).collect()}
    assert rows[1]["text"] == "hi"
    assert rows[1]["n_chars_in"] == 15 and rows[1]["n_chars_out"] == 2
    assert rows[2]["text"] == "" and rows[2]["n_chars_in"] == 0


def test_code_filter_rules(spark):
    minified = "x" * 1500
    files = [
        (1, "def a():\n    return 1"),                      # clean: kept
        (2, f"def b():\n{minified}"),                       # long line
        (3, "# AUTO-GENERATED do not edit\nreal = 1"),      # autogen head
        (4, "ok = 1\n" * 6 + "# auto-generated later"),     # marker PAST head
        (5, "1234 5678\n" * 4),                             # alpha-poor
    ]
    df = spark.createDataFrame(files, "doc_id long, code string")
    out = {r["doc_id"]: r for r in code_quality_signals(df).collect()}
    assert out[1]["kept"] == 1 and out[1]["is_autogen"] == 0
    assert out[2]["kept"] == 0 and out[2]["max_line_len"] == 1500
    assert out[3]["kept"] == 0 and out[3]["is_autogen"] == 1
    # deep markers are not provenance headers
    assert out[4]["is_autogen"] == 0
    assert out[5]["kept"] == 0 and out[5]["alpha_frac"] < 0.25
    assert out[1]["n_lines"] == 2
