"""URL parsing + filtering for crawl-corpus curation.

The first gate real web pipelines apply (C4 drops bad-word hosts,
RefinedWeb's §3.1 scores URLs against the UT1 blocklist plus a
word-weight list before ever fetching text): parse the capture URI,
reduce it to a registrable domain, and flag documents whose URL alone
disqualifies them.  Everything is native column expressions —
RE2-safe regexps (the PII-module convention, shared verbatim with the
DuckDB oracles), zero UDFs, zero shuffles: at crawl scale this runs
inside the scan stage of whatever consumes it.

Heuristics (each an independent reason flag, so downstream can tune):
- ``blocked_domain``: registrable domain in the blocklist (the UT1
  role; matched on the LAST TWO labels — a subdomain of a blocked
  domain is blocked).
- ``blocked_word``: any blocklist word occurs in the lowercased URL
  (RefinedWeb's word list).
- ``digit_host``: host is mostly digits (IP-literal / DGA-ish hosts).
- ``long_url`` / ``deep_query``: length and query-spam caps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HOST_RE = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"
PORT_RE = "^[a-z][a-z0-9+.-]*://[^/:?#]+:([0-9]+)"
REG_DOMAIN_RE = "([^.]+\\.[^.]+)$"

DEFAULT_BLOCKED_WORDS = ("casino", "poker", "viagra", "xxx")


def _host(lurl: Column) -> Column:
    # strip the :port suffix after extracting the authority
    return F.regexp_replace(F.regexp_extract(lurl, HOST_RE, 1), ":[0-9]+$", "")


def url_features(
    documents: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Adds host / reg_domain / port / path_depth / n_query_params /
    url_len / host_digit_frac — the raw signals the filter thresholds.
    Pure projections over the input (column-pruned, shuffle-free).
    Structural regexps run on the lowercased URL (schemes and hosts are
    case-insensitive per RFC 3986; path case never feeds a feature)."""
    url = F.col(url_col)
    lurl = F.lower(url)
    host = _host(lurl)
    path = F.regexp_extract(lurl, "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    query = F.regexp_extract(lurl, "\\?([^#]*)", 1)
    port_s = F.regexp_extract(lurl, PORT_RE, 1)
    return documents.withColumns(
        {
            "host": host,
            "reg_domain": F.regexp_extract(host, REG_DOMAIN_RE, 1),
            # empty-match guard: ANSI mode refuses cast('' as int)
            "port": F.when(port_s == "", F.lit(None).cast("int")).otherwise(
                port_s.cast("int")
            ),
            "path_depth": F.when(path == "", 0).otherwise(
                F.size(F.split(path, "/")) - 1
            ),
            "n_query_params": F.when(query == "", 0).otherwise(
                F.size(F.split(query, "&"))
            ),
            "url_len": F.length(url),
            "host_digit_frac": F.round(
                (
                    F.length(host)
                    - F.length(F.regexp_replace(host, "[0-9]", ""))
                ).cast("double")
                / F.greatest(F.length(host), F.lit(1)),
                6,
            ),
        }
    )


def url_filter(
    documents: DataFrame,
    blocked_domains: tuple[str, ...] = (),
    blocked_words: tuple[str, ...] = DEFAULT_BLOCKED_WORDS,
    max_url_len: int = 200,
    max_query_params: int = 8,
    max_host_digit_frac: float = 0.4,
    url_col: str = "url",
) -> DataFrame:
    """Per-doc keep/drop verdict with its reasons (comma-joined, stable
    order, engine-portable).  Blocklists arrive as array LITERALS in
    the plan — they are configuration-sized (UT1 is ~4M lines; at that
    size swap the literal for a broadcast join on reg_domain, same
    semantics), so no shuffle is ever introduced."""
    feats = url_features(documents, url_col)
    url_lc = F.lower(F.col(url_col))
    dom_arr = F.array(*[F.lit(d) for d in blocked_domains]) if blocked_domains else None
    word_hits = F.filter(
        F.array(*[F.lit(w) for w in blocked_words]),
        lambda w: F.contains(url_lc, w),
    )
    reasons = F.array_compact(
        F.array(
            (
                F.when(
                    F.array_contains(dom_arr, F.col("reg_domain")),
                    F.lit("blocked_domain"),
                )
                if dom_arr is not None
                else F.lit(None).cast("string")
            ),
            F.when(F.size(word_hits) > 0, F.lit("blocked_word")),
            F.when(
                F.col("host_digit_frac") > max_host_digit_frac,
                F.lit("digit_host"),
            ),
            F.when(F.col("url_len") > max_url_len, F.lit("long_url")),
            F.when(
                F.col("n_query_params") > max_query_params,
                F.lit("deep_query"),
            ),
        )
    )
    return feats.withColumns(
        {
            "drop_reasons": F.array_join(reasons, ","),
            "url_keep": F.size(reasons) == 0,
        }
    )
