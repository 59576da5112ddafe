"""Per-family scale report over full-catalog bench runs at multiple SFs
(SCALE.md round-10 sweep; VERDICT r9 task 2).

Input: the .localdata/bench_r10_{sf}_v{n}.out files written by the
sweep (each ends with bench.py's compact line and carries the giant
per-query line above it). Per query, the estimator is the MINIMUM
across runs at each SF (this host swings 2-6x between idle runs —
SCALE.md "Bench host noise"). Output: markdown family table with
ratios and log10 exponents for sf0.1->sf1 (10x) and sf1->sf3 (3x),
plus the worst per-family query at the sf1->sf3 step.

Usage: python tools/scale_report.py [sf0.1twin sf1 sf3]
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

LOCAL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata")

FAMILIES: dict[str, str] = {}


def _fam(names: str, fam: str) -> None:
    for n in names.split():
        FAMILIES[n] = fam


# same groupings as the round-7 block, new rows slotted in
_fam(
    "q01 q02 q03 q04 q05 q06 q07 q08 q09 q10 q11 q12 q13 q14 q15 q16 q17 "
    "q18 q19 q20 q21 q22 q23 q24 q25 q26 q27 q28 q29 q30 q31 q32 q33 q34 "
    "q35 q36 q37 q38 q39 q40 q52_grouping_sets q55_pipeline_shape "
    "q56_rank_family q57_pivot q58_string_agg q59_exists "
    "q60_scalar_subquery q62_histogram q63_grouped_map q67_scalar_breadth "
    "q68_conditional_agg q69_window_breadth q70_map_ops q71_posexplode "
    "q72_unpivot q73_hash_sample q76_variant q82_hll_union "
    "r82_quantile_sketch "
    "q83_cogrouped_map q84_bitmap_distinct q85_chunk_udtf q95_funnel "
    "q96_retention q97_transitions r70_salted_hot_agg r71_salted_hot_join "
    "r75_skew_profile",
    "Relational (scan/filter/join/agg/window/setops)",
)
_fam(
    "q64_shipping_priority q65_region_volume q66_returned_value "
    "r30_nation_volume r31_market_share r32_disjunctive_pred "
    "r33_revenue_delta r34_priority_waiting r35_profit_by_nation "
    "r36_custdist r37_top_supplier r38_small_qty_revenue r39_large_orders "
    "r40_idle_balances r41_min_cost_supplier r42_sole_latest_supplier "
    "r63_part_value_fraction r64_share_of_total r65_ship_latency "
    "r67_bucketed_colocated",
    "TPC-H silhouettes",
)
_fam(
    "q33 q42 q45_dedup_exact q46_neardup_jaccard q51_simhash "
    "q74_neardup_components q75_curation_pipeline q87_semantic_dedup "
    "q92_best_of_cluster r17_containment r48_allpairs_jaccard "
    "r60_threshold_sweep",
    "Text dedup / near-dup",
)
_fam(
    "q43 q53_ann_lsh q54_cosine_neardup q86_ann_ivf q91_embedding_sq8 "
    "r20_label_centroids r57_kmeans r58_embedding_covariance r59_dbscan "
    "r68_neardup_ivf r69_neardup_ivf_clustered",
    "Vector / similarity / clustering",
)
_fam(
    "q41 q44 q47_quality q48_tokens q49_fingerprint q50_langid q61_tfidf "
    "q77_seq_packing q78_contamination q79_det_shuffle q80_repetition "
    "q81_domain_mix q88_bm25 q89_unigram_ppl q90_pii_scrub "
    "q93_stratified_sample q94_gram_novelty q98_html_strip q99_media_decode "
    "r08_bpe_tokens r09_bpe_corpus r15_kl_divergence r43_winnowing "
    "r45_overlap_chunks r53_negative_pairs",
    "Text analysis / tokenize / retrieval",
)
_fam(
    "r05_percentiles r11_chisq r12_ks_test r13_mannwhitney r14_mad_outliers "
    "r21_grouped_regression r44_rolling_median r46_equidepth_bins r47_anova "
    "r54_seasonal r61_autocorrelation r62_crosscorrelation",
    "Statistics",
)
_fam("r18_triangles r23_pagerank r52_bfs_hops", "Graph analytics")
_fam("r77_streaming_funnel", "Streaming replay")
_fam("r78_streaming_neardup", "Streaming replay")
_fam("r79_streaming_heavyhitters", "Streaming replay")
_fam("r80_streaming_ssjoin r81_streaming_scd2", "Streaming replay")
_fam(
    "r01_gapfill r02_fuzzy_match r03_profile r04_scd2 r06_attribution "
    "r07_bloom_semi r10_weighted_sample r16_market_basket "
    "r19_interval_merge r22_jaro_match r24_ewma r25_zorder r26_skyline "
    "r27_proration r28_histogram r29_ri_audit r49_sorted_neighborhood "
    "r50_rolling_actives r55_cohort_ltv r56_rolling_actives_hll r66_rfm "
    "r72_date_partition_prune r73_dpp_join r74_hybrid_layout "
    "r76_dpp_dim_join",
    "Wrangling / profiling / sampling",
)


def load_min(sf_label: str) -> dict[str, float]:
    mins: dict[str, float] = {}
    n_runs = 0
    # run-file prefix is per-sweep: override for a future round's files
    prefix = os.environ.get("SCALE_RUNS_PREFIX", "bench_r10")
    for v in (1, 2, 3):
        path = os.path.join(LOCAL, f"{prefix}_{sf_label}_v{v}.out")
        if not os.path.exists(path):
            continue
        n_runs += 1
        with open(path) as f:
            lines = [ln for ln in f if ln.startswith("{") and '"queries"' in ln]
        q = json.loads(lines[-1])["queries"]
        for name, sec in q.items():
            if sec < 0:
                continue
            mins[name] = min(mins.get(name, float("inf")), sec)
    if not n_runs:
        raise SystemExit(f"no runs found for {sf_label}")
    return mins


def _sf_value(label: str) -> float:
    """Numeric SF embedded in a run label (``sf0.1twin`` -> 0.1)."""
    m = re.search(r"sf(\d+(?:\.\d+)?)", label)
    if not m:
        raise SystemExit(f"cannot parse an SF value out of label {label!r}")
    return float(m.group(1))


def _row(cells: list[str]) -> str:
    return "| " + " | ".join(cells) + " |"


def main() -> None:
    labels = sys.argv[1:] or ["sf0.1twin", "sf1", "sf3"]
    if len(labels) < 2:
        raise SystemExit("need at least two SF labels to compute a step")
    runs = {lb: load_min(lb) for lb in labels}
    names = sorted(set.intersection(*(set(r) for r in runs.values())))
    unmapped = [n for n in names if n not in FAMILIES]
    if unmapped:
        print(f"UNMAPPED: {unmapped}", file=sys.stderr)

    fams: dict[str, list[str]] = {}
    for n in names:
        fams.setdefault(FAMILIES.get(n, "UNMAPPED"), []).append(n)

    # Steps and exponent bases are derived from the ACTUAL labels
    # (ADVICE r10: the old header hardcoded the 10x/3x sweep and the
    # separator row was one cell short, so the table didn't render).
    sfs = [_sf_value(lb) for lb in labels]
    steps = list(zip(labels[:-1], labels[1:]))
    bases = [sfs[i + 1] / sfs[i] for i in range(len(labels) - 1)]

    def ratios(sums: dict[str, float]) -> list[str]:
        cells: list[str] = []
        for (a, b), base in zip(steps, bases):
            # ADVICE r11: a family whose minima all round to 0.0 at the
            # smaller SF is below the timer's noise floor — emit a dash
            # instead of dividing by zero and killing the report.
            if sums[a] <= 0 or sums[b] <= 0:
                cells += ["—", "—"]
                continue
            r = sums[b] / sums[a]
            cells += [f"{r:.2f}×", f"{math.log10(r) / math.log10(base):.2f}"]
        return cells

    header = (
        ["family", "n"]
        + [f"{lb} s" for lb in labels]
        + [c for a, b in steps for c in (f"{a}→{b} ratio", "exp")]
        + [f"worst q ({steps[-1][0]}→{steps[-1][1]})"]
    )
    print(_row(header))
    print("|---" * len(header) + "|")
    tot = {lb: 0.0 for lb in labels}
    for fam in sorted(fams):
        qs = fams[fam]
        sums = {lb: sum(runs[lb][q] for q in qs) for lb in labels}
        for lb in labels:
            tot[lb] += sums[lb]
        penult, last = steps[-1]
        worst = max(
            (q for q in qs if runs[penult][q] >= 0.3),
            key=lambda q: runs[last][q] / runs[penult][q],
            default=None,
        )
        wtxt = (
            f"{worst} ({runs[last][worst] / runs[penult][worst]:.1f}×)"
            if worst
            else "—"
        )
        print(
            _row(
                [fam, str(len(qs))]
                + [f"{sums[lb]:.1f}" for lb in labels]
                + ratios(sums)
                + [wtxt]
            )
        )
    print(
        _row(
            ["**total**", str(len(names))]
            + [f"{tot[lb]:.1f}" for lb in labels]
            + ratios(tot)
            + [""]
        )
    )
    # queries at/above linear on the LAST step with non-noise absolutes
    penult, last = steps[-1]
    base = bases[-1]
    print(f"\n{penult}→{last} queries at/above exponent 1.0 ({penult} ≥ 0.5s):")
    for q in names:
        a, b = runs[penult][q], runs[last][q]
        if a >= 0.5 and b / a >= base:
            print(
                f"  {q}: {a:.2f}s → {b:.2f}s ({b / a:.1f}×, "
                f"exp {math.log10(b / a) / math.log10(base):.2f})"
            )


if __name__ == "__main__":
    main()
