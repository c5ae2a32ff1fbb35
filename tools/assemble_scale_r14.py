#!/usr/bin/env python3
"""Assemble BENCH_SCALE_r14.json: the 250k/1M exponent+memory table
on clean 64g-heap runs, PLUS the two receipts the r13 verdict asked
for — chained-vs-solo at 250k docs on the hinted tree, and the
heap-sizing A/B that explains (and retires) the 96g passes' inflated
wall clocks.

usage: assemble_scale_r14.py <out> <f50_64g> <f200_64g_a> <f200_64g_b> \
         <f50_96g> <solo_dkb> <f200_96g_cold> <f200_96g_warm>
"""
import json
import math
import sys


def main() -> None:
    (out, f50p, f200ap, f200bp, f50_96p, solop, cold96p, warm96p) = sys.argv[1:9]
    f50 = json.load(open(f50p))
    f200a = json.load(open(f200ap))
    f200b = json.load(open(f200bp))
    f50_96 = json.load(open(f50_96p))
    solo = json.load(open(solop))
    cold96 = json.load(open(cold96p))
    warm96 = json.load(open(warm96p))
    step = math.log(4)

    queries = {}
    for name in sorted(f50["queries"]):
        t_lo = f50["queries"][name]
        # hi side: min over the two single-rep 64g passes — the same
        # steady-state estimate min-of-reps gives the lo side
        cand = [(f200a["queries"][name], f200a), (f200b["queries"][name], f200b)]
        t_hi, hi_src = min(cand, key=lambda c: c[0])
        queries[name] = {
            "lo_sec": t_lo,
            "hi_sec": t_hi,
            "ratio": round(t_hi / t_lo, 2),
            "exponent": round(math.log(t_hi / t_lo) / step, 2),
            "metrics_lo": f50.get("metrics", {}).get(name),
            "metrics_hi": hi_src.get("metrics", {}).get(name),
        }

    def exp(name):
        return queries[name]["exponent"]

    artifact = {
        "note": (
            "r14 scale receipt, gen_realistic Zipf corpora on the merge-"
            "hinted tree with between-query broadcast reclamation: factor "
            "50 = 250k docs (min of 2 reps, one run), factor 200 = 1M docs "
            "(min over two single-rep runs), local[32], 64g heap (see "
            "heap_sizing_ab). Exponent = log(t200/t50)/log(4). metrics_* = "
            "min-rep shuffle-write / spill / peak-task-memory / post-"
            "release broadcast residue (MB)."
        ),
        "lo_docs": 250_000,
        "hi_docs": 1_000_000,
        "lo_total_sec": f50["value"],
        "hi_total_sec": round(sum(q["hi_sec"] for q in queries.values()), 3),
        "queries": queries,
        "canary_lo": f50.get("canary"),
        "canary_hi_runs": [f200a.get("canary"), f200b.get("canary")],
        "chained_vs_solo_250k": {
            "note": (
                "r13 verdict item 2: the chained 250k-doc headline run that "
                "measured dedup_keep_best at 692 s chained vs 26.3 s solo "
                "(r13 diagnosis: estimate-trap broadcasts + accumulated "
                "broadcast blocks), re-run on the hinted tree. Chained ~= "
                "solo; the stall is gone, and bcast_after_mb stays bounded "
                "through the whole chain (was GB-scale pinned). Solo and "
                "the first chained rerun were 96g-heap runs - at factor 50 "
                "the heap effect is secondary; the 64g chained run below "
                "is faster still."
            ),
            "solo_dedup_keep_best_sec": solo["queries"]["dedup_keep_best"],
            "chained_96g_dedup_keep_best_sec": f50_96["queries"]["dedup_keep_best"],
            "chained_64g_dedup_keep_best_sec": f50["queries"]["dedup_keep_best"],
            "chained_96g_over_solo": round(
                f50_96["queries"]["dedup_keep_best"]
                / solo["queries"]["dedup_keep_best"], 2),
            "r13_chained_over_solo": round(692.061 / 26.3, 1),
            "r13_chained_sec": {
                "dedup_keep_best": 692.061, "release_pipeline": 889.499,
                "near_dup_groups": 223.475, "merge_scan": 97.497,
                "total": 2005.741},
            "r14_chained_64g_sec": dict(sorted(f50["queries"].items())),
            "max_bcast_after_mb_in_64g_chain": round(max(
                m["bcast_after_mb"] for m in f50["metrics"].values()), 1),
        },
        "heap_sizing_ab": {
            "note": (
                "The first 1M-doc passes ran with a 96g heap on the 125 GB "
                "box; G1 expanded toward the cap, left the kernel no page-"
                "cache headroom for the multi-GB shuffles, and allocation "
                "stalls under memory reclaim inflated even light queries "
                "~10x (merge_scan 226 s with 0.5 MB shuffle; pure-CPU "
                "contention canary 6.96 s mid-chain vs ~0.1 clean) while "
                "per-task shuffle/spill/peak metrics stayed flat. Same "
                "chains at 64g: clean canaries end to end. GC log at 64g: "
                "STW pauses total ~30 s over the 996 s chain, max 3.8 s "
                "(the 38-49 s log entries are concurrent cycles, not "
                "pauses). Single-JVM-harness regime only - cluster "
                "executors run 8-16 GB heaps - and tools/bench_scale.sh "
                "now defaults to 64g."
            ),
            "chain_total_sec_1M": {
                "96g_cold_fixtures": cold96["value"],
                "96g_warm_fixtures": warm96["value"],
                "64g_warm_fixtures_run_a": f200a["value"],
                "64g_warm_fixtures_run_b": f200b["value"]},
            "chain_total_sec_250k": {
                "96g": f50_96["value"], "64g": f50["value"]},
            "merge_scan_sec_1M": {
                "96g_cold": cold96["queries"]["merge_scan"],
                "96g_warm": warm96["queries"]["merge_scan"],
                "64g": queries["merge_scan"]["hi_sec"]},
            "worst_canary_sec": {
                "96g_warm_1M": max(t for _, t in warm96["canary"]),
                "64g_1M_run_a": max(t for _, t in f200a["canary"]),
                "64g_1M_run_b": max(t for _, t in f200b["canary"]),
                "64g_250k": max(t for _, t in f50["canary"])},
        },
        "reading_the_exponents": (
            "Memory behavior is the scale story: shuffle grows ~linearly "
            "(4x docs -> 3.7-4.4x bytes), spill is 0 everywhere, peak task "
            "memory <= 528 MB, post-release broadcast residue <= 203 MB. "
            f"Wall-clock: candidate_pairs e={exp('candidate_pairs')}, "
            f"near_dup_groups e={exp('near_dup_groups')}, similar_pairs "
            f"e={exp('similar_pairs')}, dedup_keep_best "
            f"e={exp('dedup_keep_best')}, merge_scan e={exp('merge_scan')} "
            "(light catalog-bound scan, seconds absolute - driver manifest/"
            "bloom sidecar reads grow with file count), release_pipeline "
            f"e={exp('release_pipeline')} (composite write pipeline; "
            "includes snapshot commits whose file counts grow with the "
            f"corpus). containment_pairs e={exp('containment_pairs')} is "
            "the genuine superlinear case: its prefix-filter candidate set "
            "grows faster than the corpus because the corpus grows over a "
            "FIXED 10k-word vocabulary - every added doc makes the rarest "
            "trigram a doc can probe more common, so the candidate "
            "equi-join fan-out outgrows the corpus (shuffle 376 -> 2706 MB "
            "= 7.2x for 4x docs is the candidate set itself, not plan "
            "regression). Natural corpora grow vocabulary with size, "
            "keeping the rare-gram tail rare; a bounded-vocab synthetic "
            "corpus is prefix filtering's adversarial input."
        ),
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
