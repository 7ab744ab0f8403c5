"""Sitemap-protocol source: native XML parse + index resolution."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from reading_the_unreadable_spark.sources.sitemaps import (
    parse_sitemaps,
    sitemaps_from_documents,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h9.example.com/p/1?a=1&amp;b=2</loc>
    <lastmod>2021-06-30</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h9.example.com/bare</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://h8.example.com/sitemap-a.xml</loc>
    <lastmod>2020-01-01</lastmod>
  </sitemap>
</sitemapindex>"""

CHILD = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://h8.example.com/p/2</loc><priority>1.0</priority></url>
</urlset>"""


def _parse(spark, rows):
    df = spark.createDataFrame(
        rows, "host string, sitemap_url string, xml string"
    )
    return parse_sitemaps(df).collect()


def test_urlset_fields_and_entities(spark):
    rows = _parse(spark, [("h9", "https://h9.example.com/sitemap.xml", URLSET)])
    by_loc = {r["loc"]: r for r in rows}
    full = by_loc["https://h9.example.com/p/1?a=1&b=2"]  # &amp; unescaped
    assert full["lastmod"] == datetime.date(2021, 6, 30)
    assert full["changefreq"] == "daily"
    assert full["priority"] == 0.8
    assert full["via_index"] is False
    assert full["root_sitemap"] == full["sitemap_url"]
    bare = by_loc["https://h9.example.com/bare"]
    assert bare["lastmod"] is None
    assert bare["changefreq"] is None
    assert bare["priority"] == 0.5  # protocol default


def test_index_resolution_one_join(spark):
    rows = _parse(
        spark,
        [
            ("h8", "https://h8.example.com/sitemap.xml", INDEX),
            ("h8", "https://h8.example.com/sitemap-a.xml", CHILD),
        ],
    )
    # the child urlset appears twice: once as its own root (flat read)
    # and once resolved through the index
    assert len(rows) == 2
    via = {r["via_index"]: r for r in rows}
    assert via[True]["root_sitemap"] == "https://h8.example.com/sitemap.xml"
    assert via[True]["sitemap_url"] == "https://h8.example.com/sitemap-a.xml"
    assert via[False]["root_sitemap"] == "https://h8.example.com/sitemap-a.xml"
    assert via[True]["loc"] == "https://h8.example.com/p/2"
    assert via[True]["priority"] == 1.0


def _docs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )


def test_round_trip_covers_every_document(spark):
    docs = _docs(spark)
    parsed = parse_sitemaps(sitemaps_from_documents(docs))
    # flat-host docs appear once; even-host docs appear twice (flat +
    # via-index) — restrict to the canonical frontier (via_index OR
    # flat root with no index above it → keep rows where host is odd
    # or via_index) and every doc_id appears exactly once
    frontier = parsed.where(
        F.col("via_index") | (F.substring("host", 2, 1).cast("int") % 2 == 1)
    )
    ids = sorted(
        int(r["loc"].rsplit("/p/", 1)[1].split("?")[0])
        for r in frontier.collect()
    )
    assert ids == list(range(40))


def test_round_trip_field_arithmetic(spark):
    parsed = parse_sitemaps(sitemaps_from_documents(_docs(spark)))
    r = {  # doc 12: k=5 (odd host, flat), d%6==0 → query string
        row["loc"]: row for row in parsed.collect()
    }["https://h5.example.com/p/12?a=1&b=2"]
    assert r["lastmod"] == datetime.date(2020, 1, 13)
    assert r["changefreq"] == "daily"  # 12 % 3 == 0
    assert r["priority"] == 0.5  # 12 % 4 == 0 → omitted → default
    assert r["sitemap_url"].endswith("h5.example.com/sitemap.xml")


def test_parse_is_jvm_only(spark):
    docs = _docs(spark)
    plan = (
        parse_sitemaps(sitemaps_from_documents(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan
