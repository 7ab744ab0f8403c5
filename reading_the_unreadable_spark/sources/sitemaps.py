"""Sitemap-protocol source (sitemaps.org XML), from scratch.

The discovery half of crawl-frontier curation: `operators/urls.py`
gates URLs by shape, `operators/robots.py` gates them by policy, and
this module produces them — parsing `urlset` sitemaps and one level of
`sitemapindex` files into a URL frontier with freshness metadata
(lastmod / changefreq / priority).  One level is the whole protocol:
sitemaps.org forbids an index from listing another index.

Spark-first shape — sitemap XML is line-structured enough that the
ENTIRE parse is native JVM expressions (no UDFs, no Python):

- entries lift out with ``regexp_extract_all('(?s)<url>(.*?)</url>')``
  → ``explode`` → per-field ``regexp_extract``; XML entities unescape
  with a ``replace`` chain (ampersand last).
- ``sitemapindex`` resolution is ONE equi-join of the extracted child
  locs back onto the sitemap table (child loc = the join key).  The
  sitemap table is a dimension (files ≪ URLs), so at crawl scale this
  whole stage is metadata-sized next to the fetch it feeds.

Protocol behaviors pinned by tests: optional ``<changefreq>`` → NULL,
optional ``<priority>`` → the protocol default 0.5, ``<lastmod>``
parsed as a date, entity-escaped query strings in ``<loc>`` round-trip
(``&amp;`` → ``&``), attribute-bearing ``<urlset xmlns=...>`` tags.

The builder half (:func:`sitemaps_from_documents`) exists for the
deterministic test corpus: it renders each document as one sitemap
entry and aggregates per-host files — odd hosts one flat ``urlset``,
even hosts two children plus a ``sitemapindex`` root — so the parse
output has a closed-form oracle over ``(doc_id)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XML_HEADER = '<?xml version="1.0" encoding="UTF-8"?>'
URLSET_OPEN = '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
INDEX_OPEN = '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'


def _xml_escape(c: Column) -> Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def _xml_unescape(c: Column) -> Column:
    c = F.replace(c, F.lit("&lt;"), F.lit("<"))
    c = F.replace(c, F.lit("&gt;"), F.lit(">"))
    c = F.replace(c, F.lit("&quot;"), F.lit('"'))
    c = F.replace(c, F.lit("&apos;"), F.lit("'"))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))  # ampersand LAST


def sitemaps_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic per-host sitemap corpus: ``(host, sitemap_url,
    xml)``.  Host ``h{doc_id % 7}``; odd hosts serve one flat urlset at
    ``/sitemap.xml``; even hosts split entries by doc parity into
    ``/sitemap-a.xml`` / ``/sitemap-b.xml`` under a ``sitemapindex``
    root.  Entry fields are pure arithmetic over doc_id (lastmod =
    2020-01-01 + d%365, changefreq cycles d%3 and is OMITTED when
    d%5==0, priority = (d%10+1)/10 OMITTED when d%4==0, and d%6==0
    locs carry an entity-escaped query string)."""
    d = F.col("doc_id")
    k = d % 7
    host = F.concat(F.lit("h"), k.cast("string"))
    base = F.concat(F.lit("https://"), host, F.lit(".example.com"))
    loc = F.concat(
        base,
        F.lit("/p/"),
        d.cast("string"),
        F.when(d % 6 == 0, F.lit("?a=1&b=2")).otherwise(F.lit("")),
    )
    lastmod = F.date_format(
        F.date_add(F.to_date(F.lit("2020-01-01")), (d % 365).cast("int")),
        "yyyy-MM-dd",
    )
    changefreq = (
        F.when(d % 3 == 0, F.lit("daily"))
        .when(d % 3 == 1, F.lit("weekly"))
        .otherwise(F.lit("monthly"))
    )
    priority = ((d % 10 + 1) / F.lit(10.0)).cast("string")
    entry = F.concat(
        F.lit("  <url>\n    <loc>"),
        _xml_escape(loc),
        F.lit("</loc>\n    <lastmod>"),
        lastmod,
        F.lit("</lastmod>\n"),
        F.when(d % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("    <changefreq>"), changefreq, F.lit("</changefreq>\n"))
        ),
        F.when(d % 4 == 0, F.lit("")).otherwise(
            F.concat(F.lit("    <priority>"), priority, F.lit("</priority>\n"))
        ),
        F.lit("  </url>"),
    )
    leaf = F.when(k % 2 == 1, F.lit("sitemap.xml")).otherwise(
        F.when(d % 2 == 0, F.lit("sitemap-a.xml")).otherwise(F.lit("sitemap-b.xml"))
    )
    per_doc = documents.select(
        host.alias("host"),
        F.concat(base, F.lit("/"), leaf).alias("sitemap_url"),
        F.struct(d.alias("doc_id"), entry.alias("entry")).alias("e"),
    )
    leaves = per_doc.groupBy("host", "sitemap_url").agg(
        F.concat(
            F.lit(XML_HEADER + "\n" + URLSET_OPEN + "\n"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda e: e["entry"]
                ),
                "\n",
            ),
            F.lit("\n</urlset>"),
        ).alias("xml")
    )
    hk = F.col("hk")
    even_base = F.concat(F.lit("https://h"), hk.cast("string"), F.lit(".example.com"))
    indexes = (
        documents.select((d % 7).alias("hk"))
        .where(F.col("hk") % 2 == 0)
        .distinct()
        .select(
            F.concat(F.lit("h"), hk.cast("string")).alias("host"),
            F.concat(even_base, F.lit("/sitemap.xml")).alias("sitemap_url"),
            F.concat(
                F.lit(XML_HEADER + "\n" + INDEX_OPEN + "\n"),
                F.lit("  <sitemap>\n    <loc>"),
                even_base,
                F.lit("/sitemap-a.xml</loc>\n    <lastmod>2020-01-01</lastmod>\n  </sitemap>\n"),
                F.lit("  <sitemap>\n    <loc>"),
                even_base,
                F.lit("/sitemap-b.xml</loc>\n  </sitemap>\n</sitemapindex>"),
            ).alias("xml"),
        )
    )
    return leaves.unionByName(indexes)


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """``(host, sitemap_url, xml)`` → one row per URL entry:
    ``(host, root_sitemap, sitemap_url, loc, lastmod date, changefreq,
    priority double, via_index boolean)``.

    ``sitemapindex`` files are resolved by ONE equi-join of their child
    locs onto the sitemap table (the protocol forbids nested indexes,
    so one join IS the closure).  A child listed by an index keeps the
    index as ``root_sitemap``; a flat urlset is its own root.  All
    field extraction is JVM regex — zero UDFs, zero Python."""
    is_index = F.col("xml").contains("<sitemapindex")

    roots = sitemaps.where(~is_index).select(
        "host",
        F.col("sitemap_url").alias("root_sitemap"),
        "sitemap_url",
        "xml",
        F.lit(False).alias("via_index"),
    )
    children = (
        sitemaps.where(is_index)
        .select(
            F.col("sitemap_url").alias("root_sitemap"),
            F.explode(
                F.regexp_extract_all(
                    "xml", F.lit(r"(?s)<sitemap>.*?<loc>(.*?)</loc>"), F.lit(1)
                )
            ).alias("child_loc"),
        )
        .join(
            sitemaps.select("host", "sitemap_url", "xml"),
            F.col("child_loc") == F.col("sitemap_url"),
        )
        .select(
            "host",
            "root_sitemap",
            "sitemap_url",
            "xml",
            F.lit(True).alias("via_index"),
        )
    )
    frames = roots.unionByName(children)

    entry = F.explode(
        F.regexp_extract_all("xml", F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1))
    ).alias("entry")
    e = F.col("entry")
    loc = _xml_unescape(F.regexp_extract(e, r"(?s)<loc>(.*?)</loc>", 1))
    lastmod_s = F.regexp_extract(e, r"<lastmod>([^<]*)</lastmod>", 1)
    changefreq_s = F.regexp_extract(e, r"<changefreq>([^<]*)</changefreq>", 1)
    priority_s = F.regexp_extract(e, r"<priority>([^<]*)</priority>", 1)
    return frames.select(
        "host", "root_sitemap", "sitemap_url", "via_index", entry
    ).select(
        "host",
        "root_sitemap",
        "sitemap_url",
        "via_index",
        loc.alias("loc"),
        F.when(lastmod_s == "", F.lit(None).cast("date"))
        .otherwise(F.to_date(lastmod_s))
        .alias("lastmod"),
        F.when(changefreq_s == "", F.lit(None).cast("string"))
        .otherwise(changefreq_s)
        .alias("changefreq"),
        # protocol default when the optional tag is absent
        F.when(priority_s == "", F.lit(0.5))
        .otherwise(priority_s.cast("double"))
        .alias("priority"),
    )
