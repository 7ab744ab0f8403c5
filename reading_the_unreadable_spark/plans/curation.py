"""The end-to-end web-curation chain as a reusable plan, plus its
Structured-Streaming form.

``curate`` is the batch chain the driver row ``curation_pipeline``
runs: URL gate → HTML main-content extraction → PII scrub → Gopher
quality gate, each stage reading only the previous stage's survivors
(the gates prune BEFORE the next stage pays its cost).  The
post-extraction tail is deliberately join-free — redact_pii and
gopher_filter are projections of the survivor frame threaded through
``passthrough`` columns (the 3-frame join shape sorted the per-doc
text three times and measured ~0.70-0.75 two-level scaling at 640k
docs; this shape measured 0.848 — BENCH/BASELINE.md).

``incremental_curation`` runs the identical chain per micro-batch over
a file-source stream of raw pages — the idiomatic shape for curating a
crawl as it lands: new page files are discovered incrementally, each
batch is curated with the SAME plan, kept documents append to the
output table, and the streaming checkpoint gives exactly-once file
processing across restarts (same contract as
:func:`streaming.incremental.incremental_extract`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.html import main_text
from ..operators.quality import gopher_filter, redact_pii
from ..operators.urls import url_filter

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("html", T.StringType()),
    ]
)


def curate(
    pages: DataFrame,
    blocked_domains: tuple[str, ...] = (),
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(doc_id, url, html) → (doc_id, url_kept, gopher_kept,
    final_kept, text, n_email): both gate verdicts, the final keep,
    and the redacted extracted text for kept docs."""
    uv = url_filter(
        pages.select("doc_id", F.col(url_col).alias("url")),
        blocked_domains=blocked_domains,
    ).select("doc_id", F.col("url_keep").cast("int").alias("url_kept"))
    extracted = main_text(pages.select("doc_id", html_col), html_col=html_col)
    survivors = extracted.join(
        uv.filter(F.col("url_kept") == 1).select("doc_id"), "doc_id"
    )
    # scrub-then-gate, one chained frame (see module docstring)
    red = redact_pii(survivors)
    gq = gopher_filter(red, passthrough=("text", "n_email"))
    out = uv.join(gq, "doc_id", "left")
    g = F.coalesce(F.col("kept"), F.lit(0))
    final = (F.col("url_kept") == 1) & (g == 1)
    return out.select(
        "doc_id",
        "url_kept",
        g.alias("gopher_kept"),
        final.cast("int").alias("final_kept"),
        F.when(final, F.col("text")).otherwise(F.lit("")).alias("text"),
        F.when(final, F.col("n_email")).otherwise(F.lit(0)).alias("n_email"),
    )


def incremental_curation(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    blocked_domains: tuple[str, ...] = (),
    available_now: bool = True,
):
    """Curate a landing crawl incrementally: drain new page files, run
    :func:`curate` per micro-batch, append only the KEPT documents.
    Returns the StreamingQuery; caller awaits/stops it."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(pages_dir)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        kept = curate(batch_df, blocked_domains=blocked_domains).filter(
            F.col("final_kept") == 1
        )
        kept.write.mode("append").parquet(out_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
