"""Build a 10x-scaled perf-measurement replica of /root/testdata/sf0.1.

The driver's round-end MEASUREMENT runs at a driver-generated sf1.0 the
sandbox does not ship, so this script synthesizes a statistically honest
stand-in at /root/scaled/sf1.0 for local optimization work:

- ``documents``: 50k FRESH random texts with the measured marginals of
  the sf0.1 corpus (length ~ U{10..100} words, iid words over the same
  30-word vocabulary + the rare 'dup' token, lang/source distributions
  as measured) — fresh draws, NOT copies, so distinct-token-set growth
  and pair-query fan-out scale the way a real sf1.0 would.
- fact tables (``orders``, ``lineitem``, ``events``, ``customer``,
  ``supplier``, ``part``): 10 key-offset replicas; offsets are multiples
  of 20 so the doc_id/orderkey modular selections queries use keep their
  selectivity, and dates/timestamps are kept so temporal densities scale
  10x like a real sf1.0.
- ``embeddings``: 4 jittered replicas (8k rows — matching the 4x step
  observed from sf0.01 -> sf0.1), noise 0.03 so replicas are near but
  not exact duplicates.
- dimensions (``region``, ``nation``) copied as-is.

Usage: python scripts/make_scaled_sf.py [out_dir] [scale]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/scaled/sf1.0"
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 10

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.412, 0.140, 0.149, 0.148, 0.151]


def gen_documents(n_docs: int, seed: int = 777) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB + ["dup"])
    # 'dup' measured at ~0.09% of tokens at sf0.1
    w = np.full(31, (1 - 0.0009) / 30)
    w[30] = 0.0009
    lengths = rng.integers(10, 101, size=n_docs)
    total = int(lengths.sum())
    words = vocab[rng.choice(31, size=total, p=w)]
    offs = np.concatenate([[0], np.cumsum(lengths)])
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(n_docs)]
    # the driver corpus carries ~0.16% exact-duplicate texts (sf0.1:
    # 4992 distinct of 5000) — replicate so dedup/recall operators see
    # a realistic duplicate structure (and never a 0-true-pair corpus)
    for i in rng.choice(n_docs, size=max(n_docs // 625, 1), replace=False):
        if i > 0:
            texts[i] = texts[int(rng.integers(0, i))]
    langs = np.array(LANGS)[rng.choice(5, size=n_docs, p=LANG_P)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def replicate(name: str, key_offsets: dict[str, int]) -> pa.Table:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for k in range(SCALE):
        cols = {}
        for field in t.schema:
            col = t[field.name]
            if field.name in key_offsets and k > 0:
                col = pa.compute.add(col, key_offsets[field.name] * k)
            cols[field.name] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def jittered_embeddings(copies: int = 4, seed: int = 778) -> pa.Table:
    rng = np.random.default_rng(seed)
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    parts = []
    for k in range(copies):
        e = emb if k == 0 else emb + rng.normal(0, 0.03, emb.shape).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n) + k * n, pa.int64()),
                    "embedding": pa.array(list(e), pa.list_(pa.float32())),
                    "label": t["label"],
                }
            )
        )
    return pa.concat_tables(parts)


def main() -> None:
    import os

    os.makedirs(OUT, exist_ok=True)
    n_docs = 5000 * SCALE
    pq.write_table(gen_documents(n_docs), f"{OUT}/documents.parquet")
    pq.write_table(
        replicate(
            "orders",
            {"o_orderkey": 150000 * 20, "o_custkey": 15000 * 20},
        ),
        f"{OUT}/orders.parquet",
    )
    pq.write_table(
        replicate(
            "lineitem",
            {"l_orderkey": 150000 * 20, "l_partkey": 20000 * 20,
             "l_suppkey": 1000 * 20},
        ),
        f"{OUT}/lineitem.parquet",
    )
    pq.write_table(
        replicate(
            "events",
            {"event_id": 100000 * 20, "user_id": 1500 * 20},
        ),
        f"{OUT}/events.parquet",
    )
    pq.write_table(
        replicate("customer", {"c_custkey": 15000 * 20}),
        f"{OUT}/customer.parquet",
    )
    pq.write_table(
        replicate("supplier", {"s_suppkey": 1000 * 20}),
        f"{OUT}/supplier.parquet",
    )
    pq.write_table(
        replicate("part", {"p_partkey": 20000 * 20}),
        f"{OUT}/part.parquet",
    )
    pq.write_table(jittered_embeddings(), f"{OUT}/embeddings.parquet")
    for dim in ("region", "nation"):
        pq.write_table(
            pq.read_table(f"{SRC}/{dim}.parquet"), f"{OUT}/{dim}.parquet"
        )
    open(f"{OUT}/_DONE", "w").close()
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
