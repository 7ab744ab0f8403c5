"""RSS/Atom feed source: native parse, normalization, round trip."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from reading_the_unreadable_spark.sources.feeds import (
    feeds_from_documents,
    parse_feeds,
)

RSS = """<?xml version="1.0"?><rss version="2.0"><channel><title>f</title>
<item><title><![CDATA[A & B]]></title><link>https://x/a/1</link>
<guid>g1</guid><pubDate>Mon, 04 Jan 2021 10:20:30 +0000</pubDate>
<category>one</category><category>two &amp; half</category></item>
<item><title>T&amp;2</title><link>https://x/a/2</link></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<title>f</title>
<entry><title>E1</title><link href="https://y/a/1"/><id>i1</id>
<updated>2021-01-04T10:20:30+00:00</updated>
<category term="alpha"/></entry>
</feed>"""


def _parse(spark, rows):
    df = spark.createDataFrame(rows, "feed_url string, xml string")
    return parse_feeds(df).collect()


def test_rss_fields(spark):
    rows = {r["item_index"]: r for r in _parse(spark, [("u1", RSS)])}
    r1 = rows[1]
    assert r1["fmt"] == "rss"
    assert r1["title"] == "A & B"  # CDATA unwrapped
    assert r1["link"] == "https://x/a/1"
    assert r1["item_id"] == "g1"
    assert r1["published"] == datetime.datetime(2021, 1, 4, 10, 20, 30)
    assert r1["categories"] == ["one", "two & half"]
    r2 = rows[2]
    assert r2["title"] == "T&2"  # entity unescaped
    assert r2["published"] is None and r2["item_id"] is None
    assert r2["categories"] == []


def test_atom_fields(spark):
    (r,) = _parse(spark, [("u2", ATOM)])
    assert r["fmt"] == "atom" and r["item_index"] == 1
    assert r["title"] == "E1"
    assert r["link"] == "https://y/a/1"  # href attribute form
    assert r["item_id"] == "i1"
    assert r["published"] == datetime.datetime(2021, 1, 4, 10, 20, 30)
    assert r["categories"] == ["alpha"]


def test_round_trip_every_document_once(spark):
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    parsed = parse_feeds(feeds_from_documents(docs))
    rows = parsed.collect()
    ids = sorted(int(r["link"].rsplit("/a/", 1)[1]) for r in rows)
    assert ids == list(range(30))
    by_id = {int(r["link"].rsplit("/a/", 1)[1]): r for r in rows}
    r7 = by_id[7]  # host h1 → atom; 7%4!=0 → entity title path
    assert r7["fmt"] == "atom" and r7["title"] == "T&7"
    assert r7["item_index"] == 7 // 6 + 1
    assert r7["published"] == datetime.datetime(2021, 1, 1, 0, 7)
    assert r7["categories"] == ["alpha"]  # 7 % 3 == 1
    r12 = by_id[12]  # host h0 → rss; 12%4==0 → CDATA title path
    assert r12["fmt"] == "rss" and r12["title"] == "T&12"
    assert r12["categories"] == []  # 12 % 3 == 0


def test_parse_is_jvm_only(spark):
    docs = spark.range(12).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    plan = (
        parse_feeds(feeds_from_documents(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
