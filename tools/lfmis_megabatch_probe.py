"""Drive the distributed within-batch greedy across its 100k-pair knee
(VERDICT r15 item 3).

`streaming/neardup.py` resolves a micro-batch's within-batch greedy two
ways with identical semantics: a driver walk for verified pair graphs
at or below _WB_MIS_THRESHOLD (100k pairs — the output-sized common
case) and iterated local-minima elimination (LFMIS) above it. The
distributed path is equivalence- and property-tested, but every real
batch to date stayed under the knee — this probe PLANTS a mega-batch
that crosses it and runs `neardup_batch` end-to-end, recording:

- that the >threshold branch actually executed (pair count),
- LFMIS rounds-to-convergence and wall-clock,
- equality of the full decision log against the sequential driver walk
  over the same verified pair set.

Corpus shape (deterministic, seeded ids only — no RNG):

- DENSE CLUSTERS for pair volume: `--clusters` groups of `--csize`
  identical 40-word documents; each group is a verified clique
  contributing C(csize, 2) pairs that LFMIS collapses in one round.
- CHAINS for round depth: `--chains` sliding-window word streams with
  stride 4 over 40-word docs — consecutive docs share 36 words
  (5-shingle Jaccard 32/40 = 0.8 ≥ 0.6), docs two apart share 32
  words (28/44 ≈ 0.636 ≥ 0.6), docs three apart 28 words (24/48 =
  0.5 < 0.6) — so the verified graph is an ascending-id path PLUS
  skip-one edges, a deep dependency chain for LFMIS (3 decisions per
  round per chain → ~chainlen/3 rounds; measured 33 at chainlen=100).

Defaults: 150×40 cliques (117,000 pairs) + 4×100 chains (197 pairs
each: 99 consecutive + 98 skip-one) = 117,788 verified pairs > the
100,000 knee.

Usage:
    python tools/lfmis_megabatch_probe.py [--out .localdata/lfmis_probe.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_docs(spark, n_clusters: int, csize: int, n_chains: int, chainlen: int):
    rows = []
    doc_id = 0
    for c in range(n_clusters):
        text = " ".join(f"c{c}w{k}" for k in range(40))
        for _ in range(csize):
            rows.append((doc_id, text))
            doc_id += 1
    for ch in range(n_chains):
        stream = [f"x{ch}q{k}" for k in range(4 * chainlen + 36)]
        for i in range(chainlen):
            rows.append((doc_id, " ".join(stream[4 * i : 4 * i + 40])))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string"), doc_id


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clusters", type=int, default=150)
    ap.add_argument("--csize", type=int, default=40)
    ap.add_argument("--chains", type=int, default=4)
    ap.add_argument("--chainlen", type=int, default=100)
    ap.add_argument("--out", default=".localdata/lfmis_probe.json")
    args = ap.parse_args()

    import os
    import tempfile

    from batch_processing_system_spark.engine.session import get_spark
    from batch_processing_system_spark.streaming import neardup as nd

    spark = get_spark("lfmis-megabatch-probe")
    # streaming-row house default: the LFMIS rounds are many small
    # jobs; 8 shuffle partitions keeps per-round fixed cost down
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    batch, n_docs = make_docs(
        spark, args.clusters, args.csize, args.chains, args.chainlen
    )
    batch = batch.localCheckpoint(eager=True)
    expected_pairs = (
        args.clusters * args.csize * (args.csize - 1) // 2
        + args.chains * ((args.chainlen - 1) + max(0, args.chainlen - 2))
    )
    assert expected_pairs > nd._WB_MIS_THRESHOLD, (
        f"planted corpus must cross the knee: {expected_pairs} <= "
        f"{nd._WB_MIS_THRESHOLD}"
    )

    run_dir = tempfile.mkdtemp(prefix="lfmis_probe_")
    corpus = os.path.join(run_dir, "corpus")
    bands = os.path.join(run_dir, "bands")

    # --- instrument the LFMIS loop: count rounds via isEmpty calls ---
    rounds = {"n": 0}
    orig = nd._decisions_distributed
    took_distributed = {"v": False}

    def counting(spark_, batch_, verified_df):
        took_distributed["v"] = True
        t0 = time.time()
        out = orig(spark_, batch_, verified_df)
        rounds["wall_s"] = round(time.time() - t0, 2)
        return out

    nd._decisions_distributed = counting
    try:
        t0 = time.time()
        decisions = nd.neardup_batch(spark, batch, corpus, bands)
        total_s = round(time.time() - t0, 2)
        got = {
            r["doc_id"]: (r["kept"], r["dup_of"]) for r in decisions.collect()
        }
    finally:
        nd._decisions_distributed = orig
    assert took_distributed["v"], "probe did not cross the knee!"

    # --- sequential reference: the driver walk over the SAME verified
    # pair set (recomputed here — the planted graph is exact) ---------
    kept, dup = set(), {}
    # cliques: ascending-id greedy keeps the first doc of each clique
    doc_id = 0
    neighbors: dict[int, list[int]] = {}
    for c in range(args.clusters):
        ids = list(range(doc_id, doc_id + args.csize))
        for i, d in enumerate(ids):
            neighbors[d] = ids[:i]
        doc_id += args.csize
    for ch in range(args.chains):
        ids = list(range(doc_id, doc_id + args.chainlen))
        for i, d in enumerate(ids):
            # consecutive (J=0.8) AND skip-one (J≈0.636) edges verify
            neighbors[d] = [ids[j] for j in (i - 2, i - 1) if j >= 0]
        doc_id += args.chainlen
    for d in range(n_docs):
        smaller_kept = sorted(x for x in neighbors[d] if x in kept)
        if smaller_kept:
            dup[d] = smaller_kept[0]
        else:
            kept.add(d)
    want = {d: ((d in kept), dup.get(d)) for d in range(n_docs)}
    equal = got == want
    mismatches = (
        [] if equal else [d for d in want if got.get(d) != want[d]][:10]
    )

    # expected rounds ≈ ceil(chainlen / 3): each round keeps the chain
    # head and rejects its two (consecutive + skip-one) successors
    theoretical_rounds = (args.chainlen + 2) // 3

    report = {
        "docs": n_docs,
        "verified_pairs_planted": expected_pairs,
        "knee": nd._WB_MIS_THRESHOLD,
        "distributed_path_executed": took_distributed["v"],
        "lfmis_wall_s": rounds.get("wall_s"),
        "total_wall_s": total_s,
        "lfmis_rounds_measured": nd.LAST_LFMIS_ROUNDS,
        "theoretical_rounds": theoretical_rounds,
        "round_budget": nd._MIS_MAX_ROUNDS,
        "decisions_equal_sequential_walk": equal,
        "first_mismatches": mismatches,
        "kept": sum(1 for v in got.values() if v[0]),
        "rejected": sum(1 for v in got.values() if not v[0]),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    assert equal, "distributed decisions diverge from the sequential walk"


if __name__ == "__main__":
    main()
