"""Deduplication operators for web-scale corpora.

Scale design (the point of this module): every variant is expressed as
hash-partitioned group-bys and *bucketed* self-joins — never an O(n²)
cross join — so the same plan runs on 10^12 documents:

- exact: md5-fingerprint groupBy (one shuffle on the 16-byte key).
- MinHash+LSH: shingle→minhash→band→bucket-join; candidate pairs are
  generated only inside band buckets, then verified with true Jaccard via
  a shingle-set equi-join.  Band width tunes recall/cost.
- n-gram Jaccard: partition-bounded self-join (here by ``lang``) for
  small-bucket pair scoring.

All hashing is md5 (cross-engine identical) so DuckDB oracles replicate
results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col

N_HASHES = 8
BAND_ROWS = 2


def _spread(documents: DataFrame, n_tasks: int | None = None) -> DataFrame:
    """Round-robin repartition of the input.

    Compute-heavy per-row work (md5 folds, shingling, set intersections)
    otherwise runs inside the scan tasks — and a small table is one file,
    so one task would do everything.  On a real many-split table this is a
    cheap rebalance; on skewed file layouts it is the difference between
    1× and N× parallelism."""
    n = n_tasks or documents.sparkSession.sparkContext.defaultParallelism
    return documents.repartition(n)


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Group docs by normalized-content fingerprint; keeper = min doc_id."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "")
    return (
        documents.select(F.md5(norm).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc (doc_id, shingle)."""
    w = tokens_col(F.col("text"))
    sh = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, (i + F.lit(k)).cast("int")) for k in range(n)]
            ),
        ),
    ).otherwise(F.array(F.array_join(w, " ")))
    return documents.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, seed, minhash): min over shingles of md5(seed|shingle)."""
    return (
        sh.select(
            "doc_id",
            "shingle",
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed"),
        )
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.md5(F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle")))
            ).alias("mh")
        )
    )


def lsh_band_signatures(sig: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """Fold minhash rows into per-band signatures (doc_id, band, band_sig)."""
    banded = sig.withColumn("band", F.expr(f"seed div {band_rows}"))
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("seed", "mh"))), lambda s: s["mh"]
    )
    return banded.groupBy("doc_id", "band").agg(
        F.md5(F.array_join(ordered, ",")).alias("band_sig")
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Candidate near-dup pairs (shared ≥1 LSH band) verified with true
    shingle-set Jaccard.  Output: (doc_a, doc_b, shared_bands, jaccard)."""
    sh = shingles(_spread(documents), n).cache()
    sigs = lsh_band_signatures(minhash_signatures(sh, n_hashes), band_rows)
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared_bands"))
    )
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    s1, s2 = sh.alias("s1"), sh.alias("s2")
    inter = (
        s1.join(
            s2,
            (F.col("s1.shingle") == F.col("s2.shingle"))
            & (F.col("s1.doc_id") < F.col("s2.doc_id")),
        )
        .groupBy(F.col("s1.doc_id").alias("doc_a"), F.col("s2.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_bands",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    bucket_col: str = "lang",
    salt: int = 16,
) -> DataFrame:
    """Word-set Jaccard over pairs co-bucketed by ``bucket_col``
    (partition-bounded self-join — the scale guard: pairs are only formed
    within buckets, and the join key carries the bucket).

    Low-cardinality bucket keys (here ~5 langs) would cap join parallelism
    at the key count, so the left side is salted by hash(doc_id) and the
    right side replicated ``salt`` times — the join key becomes
    (bucket, salt), spreading each bucket across ``salt`` tasks without
    changing the pair set."""
    toks = documents.select(
        "doc_id",
        F.col(bucket_col).alias("bucket"),
        F.array_distinct(tokens_col(F.col("text"))).alias("toks"),
    )
    toks = toks.withColumn("n_toks", F.size("toks"))
    # probe side spread across tasks: the pair evaluation happens in the
    # probe task of the broadcast join, so probe parallelism IS the
    # operator's parallelism.
    a = (
        _spread(toks)
        .withColumn("salt", F.pmod(F.hash("doc_id"), F.lit(salt)))
        .alias("a")
    )
    b = toks.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    jac = inter.cast("double") / union
    # length prefilter: jaccard >= t implies min(|A|,|B|)/max(|A|,|B|) >= t,
    # so the size-ratio predicate prunes pairs before the set ops without
    # changing the result (evaluated join-side, cheap int compare).
    size_ok = (
        F.least(F.col("a.n_toks"), F.col("b.n_toks")).cast("double")
        >= F.lit(threshold) * F.greatest(F.col("a.n_toks"), F.col("b.n_toks"))
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & size_ok,
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


HIGH_NIBBLES = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash(documents: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash: bit j of a token's hash = high bit of hex nibble j
    of md5(token) (cross-engine reproducible); document bit j = majority
    vote (±1 per token, with multiplicity).

    Native expressions only — per-bit vote is a map over the token array
    + sum, no explode, no shuffle.  At production scale swap the md5
    nibble trick for ``xxhash64`` + bit ops (same plan shape, cheaper)."""
    documents = _spread(documents)
    w = tokens_col(F.col("text"))
    md5s = F.transform(w, lambda t: F.md5(t))

    def _vote_fn(j: int):
        # closure factory: Spark introspects the lambda arity, so the bit
        # index must be captured, not passed as a defaulted third arg
        return lambda acc, h: acc + F.when(
            F.substring(h, j + 1, 1).isin(*HIGH_NIBBLES), 1
        ).otherwise(-1)

    value = None
    for j in range(bits):
        vote = F.aggregate(md5s, F.lit(0), _vote_fn(j))
        term = F.when(vote > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        value = term if value is None else value + term
    return documents.select("doc_id", value.alias("simhash"))


def simhash_pairs(documents: DataFrame, bits: int = 32, bands: int = 4) -> DataFrame:
    """Hamming-LSH over SimHash: split the hash into ``bands`` bit-slices;
    docs sharing any slice are candidates (≤ bits/bands differing bits ⇒
    guaranteed candidate).  Bucket-join, never cross join; output the
    exact Hamming distance per candidate pair."""
    sh = simhash(documents, bits)
    slice_bits = bits // bands
    mask = (1 << slice_bits) - 1
    sliced = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * slice_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a, b = sliced.alias("a"), sliced.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = sum(
        F.shiftright(xor, j).bitwiseAND(F.lit(1)).cast("int") for j in range(bits)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )


def simhash_pairs_oracle_sql(bits: int = 32, bands: int = 4) -> str:
    slice_bits = bits // bands
    mask = (1 << slice_bits) - 1
    hamming = " + ".join(
        f"((xor(a.simhash, b.simhash) >> {j}) & 1)::INT" for j in range(bits)
    )
    return f"""
        WITH sh AS ({simhash_oracle_sql(bits)}),
        sliced AS (
          SELECT doc_id, simhash, band,
                 (simhash >> (band * {slice_bits})) & {mask} AS sig
          FROM sh, (SELECT unnest(generate_series(0, {bands - 1})) AS band)),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 ({hamming}) AS hamming
          FROM sliced a JOIN sliced b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, hamming FROM pairs
    """


def simhash_oracle_sql(bits: int = 32) -> str:
    """DuckDB SQL computing the identical SimHash (shared spec)."""
    nibbles = ",".join(f"'{c}'" for c in HIGH_NIBBLES)
    terms = []
    for j in range(bits):
        vote = (
            "list_sum(list_transform(string_split(text,' '), "
            f"t -> CASE WHEN substr(md5(t),{j + 1},1) IN ({nibbles}) "
            "THEN 1 ELSE -1 END))"
        )
        terms.append(f"CASE WHEN {vote} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END")
    return (
        "SELECT doc_id, (" + " + ".join(terms) + ") AS simhash FROM documents"
    )
