"""Deterministic scale-factor data generator for scale validation.

The driver's testdata (/root/testdata/sf*) is read-only and tops out
at sf0.1; proving SCALE.md's growth exponents empirically needs a
bigger corpus. This script regenerates the SAME star schema — table
names, column names/types (parquet timestamp[us]), value domains, key
relationships, and distribution shapes all profiled from the driver's
sf0.1 — at any sf, into a directory inside the repo
(default .localdata/sf<sf>/, gitignored).

Distribution notes (profiled from /root/testdata/sf0.1):
- row counts scale linearly: lineitem 6e6·sf, orders 1.5e6·sf,
  customer 1.5e5·sf, part 2e5·sf, supplier 1e4·sf, events 1e6·sf,
  documents 5e4·sf, embeddings 2e4·sf; region(5)/nation(25) fixed.
- lineitems per order ~ Poisson(4) (observed: 2764/150000 orders
  childless, per-order counts 1..17 matching Poisson(4) mass).
- documents: 31-word vocabulary (verbatim below), 10..100 tokens
  uniform, ~0.16% exact duplicates injected by copying earlier rows.
- embeddings: 64-dim L2-normalized gaussian (labels carry no
  similarity signal in the driver data — pair density at cos ≥ 0.45
  is the random-sphere rate, which this reproduces by construction).
- events: 30 days of Jan 2024, 5 uniform event types, value ~
  Exp(mean 50) truncated, props = {"k": uniform 0..99}.

NOT driver-identical row-for-row (the driver's RNG is unknown); the
point is matching SHAPE so per-query runtime scaling is meaningful.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_W = [0.4, 0.15, 0.15, 0.15, 0.15]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "small", "dark", "light", "green"]
PNOUN = ["ring", "bolt", "screw", "cap", "case", "tube", "plate", "disk"]

_US = 1_000_000


def _ts_us(lo: str, hi: str, n: int, rng) -> np.ndarray:
    a = np.datetime64(lo).astype("datetime64[us]").astype(np.int64)
    b = np.datetime64(hi).astype("datetime64[us]").astype(np.int64)
    return rng.integers(a, b, n)


def _write(path: str, name: str, cols: dict, ts_cols=()) -> None:
    arrays, fields = [], []
    for k, v in cols.items():
        if k in ts_cols:
            arr = pa.array(v, type=pa.timestamp("us"))
        else:
            arr = pa.array(v)
        arrays.append(arr)
        fields.append(pa.field(k, arr.type))
    t = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    # 100k-row row groups: the unit Spark can split a scan on. The
    # driver's files are single-row-group (fine at sf<=0.1 where one
    # task covers the table), but measuring ENGINE scaling at sf1+
    # through an unsplittable 1M-row row group would measure file
    # layout, not the plan — a 100 TB deployment reads thousands of
    # splittable files.
    pq.write_table(t, os.path.join(path, f"{name}.parquet"),
                   row_group_size=100_000)
    print(f"  {name}: {t.num_rows} rows")


def generate(
    sf: float, out: str, seed: int = 42, clustered_emb: bool = False
) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    })
    _write(out, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    })
    _write(out, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    })
    _write(out, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    })
    _write(out, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    })
    _write(out, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", "2001-08-02", n_ord, rng)
        // (86_400 * _US) * (86_400 * _US),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)],
    }, ts_cols=("o_orderdate",))

    # lineitem: Poisson(4) children per order. The shipdate base below
    # is a FRESH date draw, NOT the o_orderdate array — deliberately.
    # ADVICE r7 flagged this as a bug ("uncorrelated with
    # o_orderdate"), but the driver's own corpus is measurably
    # uncorrelated too: at sf0.01/sf0.1 the (l_shipdate -
    # o_orderdate) lag spans -2383..+2496 DAYS with
    # `l_shipdate > o_orderdate` selectivity 0.514/0.519 — an
    # independent redraw plus a small positive lag, exactly what this
    # reproduces (regen sf0.01 measures 0.51). Making the dates
    # TPC-H-correlated (odate[l_ok] + lag) would flip every
    # shipdate>orderdate consumer from ~51% to 100% selectivity and
    # break runtime comparability against the driver's benches.
    counts = rng.poisson(4.0, n_ord)
    l_ok = np.repeat(np.arange(n_ord, dtype=np.int64), counts)
    n_li = len(l_ok)
    odate = (
        _ts_us("1995-01-01", "2001-08-02", n_ord, rng)
        // (86_400 * _US) * (86_400 * _US)
    )
    linenum = np.concatenate([np.arange(c) for c in counts]) % 7 + 1
    _write(out, "lineitem", {
        "l_orderkey": l_ok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(linenum.astype(np.int32), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": [("N", "A", "R")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("O", "F")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": odate[l_ok]
        + rng.integers(1, 95, n_li) * 86_400 * _US,
    }, ts_cols=("l_shipdate",))

    _write(out, "events", {
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": np.sort(_ts_us("2024-01-01", "2024-01-31", n_evt, rng)),
        "user_id": rng.integers(0, max(int(15_000 * sf), 1), n_evt),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_evt)],
        "value": np.round(
            np.minimum(rng.exponential(50.0, n_evt), 560.0), 2
        ),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_evt)],
    }, ts_cols=("ts",))

    # documents: 31-word vocab, 10..100 tokens, ~0.16% exact dups
    tok_counts = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), c)]) for c in tok_counts
    ]
    n_dup = max(int(n_doc * 0.0016), 1)
    dup_dst = rng.integers(n_doc // 2, n_doc, n_dup)
    dup_src = rng.integers(0, n_doc // 2, n_dup)
    for s, t in zip(dup_src, dup_dst):
        texts[t] = texts[s]
    lang_idx = rng.choice(len(LANGS), n_doc, p=LANG_W)
    _write(out, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": [LANGS[i] for i in lang_idx],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })

    if clustered_emb:
        # near-dup cluster structure (what a REAL dedup corpus looks
        # like): n/10 clusters of 10, members at cos ≈ 0.9 to their
        # center — the regime where candidate-generation routes
        # (IVF/_cosine_pairs_ivf) have something to prune on
        n_clu = max(1, n_emb // 10)
        centers = rng.standard_normal((n_clu, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        member_of = np.arange(n_emb) % n_clu
        emb = centers[member_of] + 0.042 * rng.standard_normal((n_emb, 64))
        emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(np.float32)
        labels = (member_of % 10).astype(np.int32)
    else:
        emb = rng.standard_normal((n_emb, 64))
        emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(np.float32)
        labels = rng.integers(0, 10, n_emb)
    _write(out, "embeddings", {
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--clustered-emb", action="store_true",
                    help="near-dup cluster structure in embeddings "
                    "(clusters of 10 at cos ~0.9)")
    a = ap.parse_args()
    out = a.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata",
        f"sf{a.sf:g}",
    )
    print(f"generating sf={a.sf} -> {out}")
    generate(a.sf, out, a.seed, clustered_emb=a.clustered_emb)
