"""URL parsing + filtering: structural features and filter reasons."""

from __future__ import annotations

from reading_the_unreadable_spark.operators.urls import url_features, url_filter


def _df(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def test_url_features_structure(spark):
    rows = {
        r["doc_id"]: r
        for r in url_features(
            _df(
                spark,
                [
                    "https://news.example.com/world/europe/story?a=1&b=2",
                    "HTTP://Blog.Example.ORG:8080/",
                    "https://192.168.0.1/x",
                    "https://example.io",
                ],
            )
        ).collect()
    }
    r0 = rows[0]
    assert r0["host"] == "news.example.com"
    assert r0["reg_domain"] == "example.com"
    assert r0["port"] is None
    assert r0["path_depth"] == 3
    assert r0["n_query_params"] == 2
    r1 = rows[1]
    assert r1["host"] == "blog.example.org" and r1["port"] == 8080
    assert r1["path_depth"] == 1 and r1["n_query_params"] == 0
    assert rows[2]["host_digit_frac"] > 0.6
    r3 = rows[3]
    assert r3["host"] == "example.io" and r3["path_depth"] == 0


def test_url_filter_reasons(spark):
    urls = [
        "https://good.example.com/article/1",
        "https://play.casino-spin.net/promo",
        "https://sub.bad.net/anything",
        "https://ok.example.com/p?" + "&".join(f"q{i}=1" for i in range(12)),
        "https://111222333444.com/x",
        "https://ok.example.com/" + "a" * 250,
    ]
    rows = {
        r["doc_id"]: r
        for r in url_filter(
            _df(spark, urls), blocked_domains=("bad.net",)
        ).collect()
    }
    assert rows[0]["url_keep"] and rows[0]["drop_reasons"] == ""
    assert rows[1]["drop_reasons"] == "blocked_word"
    assert rows[2]["drop_reasons"] == "blocked_domain"
    assert rows[3]["drop_reasons"] == "deep_query"
    assert rows[4]["drop_reasons"] == "digit_host"
    assert rows[5]["drop_reasons"] == "long_url"
    assert not any(rows[i]["url_keep"] for i in range(1, 6))


def test_url_filter_is_shuffle_free(spark):
    df = url_filter(_df(spark, ["https://a.example.com/x"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]


def test_canonicalize_url_rules(spark):
    from reading_the_unreadable_spark.operators.urls import canonicalize_url

    rows = [
        ("a", "HTTPS://News.Example.COM:443/a/./b/../p?utm_source=x&b=2&a=1#sec"),
        ("b", "https://news.example.com/a/p?a=1&b=2"),       # already canonical
        ("c", "http://h.org:80/x%41y/%7Euser/%2fesc?z=%3d"), # pct decode/uppercase
        ("d", "https://h.org"),                              # empty path -> /
        ("e", "not a url"),                                  # schemeless passthrough
        ("f", "https://h.org/../..//p"),                     # .. never above root
        ("g", "https://h.org/p?ref=x&fbclid=1&utm_a=2"),     # all-tracking query
    ]
    df = spark.createDataFrame(rows, "doc_id string, url string")
    got = {r["doc_id"]: r for r in canonicalize_url(df).collect()}
    assert got["a"]["canonical_url"] == "https://news.example.com/a/p?a=1&b=2"
    assert got["a"]["changed"] == 1
    assert got["b"]["changed"] == 0
    assert got["c"]["canonical_url"] == "http://h.org/xAy/~user/%2Fesc?z=%3D"
    assert got["d"]["canonical_url"] == "https://h.org/"
    assert got["e"]["canonical_url"] == "not a url" and got["e"]["changed"] == 0
    assert got["f"]["canonical_url"] == "https://h.org//p"
    assert got["g"]["canonical_url"] == "https://h.org/p"
