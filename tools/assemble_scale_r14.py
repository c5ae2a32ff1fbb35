#!/usr/bin/env python3
"""Assemble BENCH_SCALE_r14.json: the 250k/1M exponent+memory table
on clean 64g-heap runs, PLUS the receipts the r13 verdict asked for
— chained-vs-solo at 250k docs on the hinted tree, the heap-sizing
A/B that explains (and retires) the 96g passes' inflated wall
clocks — and the r14 small-files fix receipt (the scaled bin-pack
target that replaced the flat 64 KB one, discovered from this
artifact's own merge_scan exponent).

usage: assemble_scale_r14.py <out> <f50_64g> <f200_64g_a> <f200_64g_b> \
         <f50_96g> <solo_dkb> <f200_96g_cold> <f200_96g_warm> \
         [<f200_64g_c> [<f50_fix> <f200_fix>]]

f200_64g_c: optional third 1M pass (REPS=2, warm) — min-merged into
the hi side so both sides of the exponent are min-of-warm-reps.
f50_fix/f200_fix: optional merge-family reruns (merge_scan,
release_pipeline) on the scaled-file-target tree with fixtures
rebuilt; when present they REPLACE those queries' headline numbers
and the pre-fix values move into the small_files_fix receipt.
"""
import json
import math
import sys


def qmin(runs, name):
    """Min across runs of the per-query min-of-reps."""
    vals = [r["queries"][name] for r in runs if name in r.get("queries", {})]
    return min(vals) if vals else None


def qsrc(runs, name):
    v = qmin(runs, name)
    for r in runs:
        if r.get("queries", {}).get(name) == v:
            return r
    return runs[0]


def main() -> None:
    args = sys.argv[1:]
    out, f50p, f200ap, f200bp, f50_96p, solop, cold96p, warm96p = args[:8]
    f200cp = args[8] if len(args) > 8 else None
    fixp50, fixp200 = (args[9], args[10]) if len(args) > 10 else (None, None)

    f50 = json.load(open(f50p))
    hi_runs = [json.load(open(p)) for p in [f200ap, f200bp] + ([f200cp] if f200cp else [])]
    f50_96 = json.load(open(f50_96p))
    solo = json.load(open(solop))
    cold96 = json.load(open(cold96p))
    warm96 = json.load(open(warm96p))
    fix50 = json.load(open(fixp50)) if fixp50 else None
    fix200 = json.load(open(fixp200)) if fixp200 else None
    step = math.log(4)

    # lo side: 64g REPS=2 chain; hi side: min over the 64g 1M passes.
    # When the small-files-fix reruns are present, the merge-family
    # queries take their (fixtures-rebuilt) numbers on both sides.
    pre_fix = {}
    queries = {}
    for name in sorted(f50["queries"]):
        t_lo, lo_src = f50["queries"][name], f50
        t_hi, hi_src = qmin(hi_runs, name), qsrc(hi_runs, name)
        if fix50 and name in fix50.get("queries", {}):
            pre_fix[name] = {"lo_sec": t_lo, "hi_sec": t_hi,
                             "exponent": round(math.log(t_hi / t_lo) / step, 2)}
            t_lo, lo_src = fix50["queries"][name], fix50
            t_hi, hi_src = fix200["queries"][name], fix200
        queries[name] = {
            "lo_sec": t_lo,
            "hi_sec": t_hi,
            "ratio": round(t_hi / t_lo, 2),
            "exponent": round(math.log(t_hi / t_lo) / step, 2),
            "metrics_lo": lo_src.get("metrics", {}).get(name),
            "metrics_hi": hi_src.get("metrics", {}).get(name),
        }

    def exp(name):
        return queries[name]["exponent"]

    artifact = {
        "note": (
            "r14 scale receipt, gen_realistic Zipf corpora on the merge-"
            "hinted tree with between-query broadcast reclamation: factor "
            "50 = 250k docs (min of 2 reps, one run), factor 200 = 1M docs "
            f"(min over {len(hi_runs)} 64g passes), local[32], 64g heap "
            "(see heap_sizing_ab). Exponent = log(t200/t50)/log(4). "
            "metrics_* = min-rep shuffle-write / spill / peak-task-memory "
            "/ post-release broadcast residue (MB). merge_scan is "
            "measured on the scaled-bin-pack-target tree with fixtures "
            "rebuilt (see small_files_fix)."
        ),
        "lo_docs": 250_000,
        "hi_docs": 1_000_000,
        "lo_total_sec": round(sum(q["lo_sec"] for q in queries.values()), 3),
        "hi_total_sec": round(sum(q["hi_sec"] for q in queries.values()), 3),
        "queries": queries,
        "canary_lo": f50.get("canary"),
        "canary_hi_runs": [r.get("canary") for r in hi_runs],
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
                "64g_warm_fixtures_runs": [r["value"] for r in hi_runs]},
            "chain_total_sec_250k": {
                "96g": f50_96["value"], "64g": f50["value"]},
            "merge_scan_sec_1M_prefix_layout": {
                "96g_cold": cold96["queries"]["merge_scan"],
                "96g_warm": warm96["queries"]["merge_scan"],
                "64g": qmin(hi_runs, "merge_scan")},
            "worst_canary_sec": {
                "96g_warm_1M": max(t for _, t in warm96["canary"]),
                "64g_1M_runs": [max(t for _, t in r["canary"]) for r in hi_runs],
                "64g_250k": max(t for _, t in f50["canary"])},
        },
        "reading_the_exponents": (
            "Memory behavior is the scale story: shuffle grows ~linearly "
            "(4x docs -> 3.7-4.4x bytes), spill is 0 everywhere, peak task "
            "memory <= 528 MB outside containment_pairs (1.9 GB on its "
            "warm 1M rep - the per-task state of the fanned-out candidate "
            "verify, same adversarial-input story as its exponent), post-"
            "release broadcast residue <= 203 MB. "
            "Wall-clock (both sides clean-canary 64g, min of warm reps): "
            f"candidate_pairs e={exp('candidate_pairs')}, near_dup_groups "
            f"e={exp('near_dup_groups')}, similar_pairs "
            f"e={exp('similar_pairs')}, dedup_keep_best "
            f"e={exp('dedup_keep_best')}, release_pipeline "
            f"e={exp('release_pipeline')} (composite dedup+quality+split "
            f"pipeline over the full corpus), merge_scan "
            f"e={exp('merge_scan')} (light catalog-bound scan, seconds "
            "absolute - see small_files_fix). "
            f"containment_pairs e={exp('containment_pairs')} is the "
            "genuine superlinear case: its prefix-filter candidate set "
            "grows faster than the corpus because the corpus grows over a "
            "FIXED 10k-word vocabulary - every added doc makes the rarest "
            "trigram a doc can probe more common, so the candidate "
            "equi-join fan-out outgrows the corpus (shuffle 376 -> ~2450 MB "
            "= 6.5x for 4x docs is the candidate set itself, not plan "
            "regression), and the per-pair containment verify on the "
            "fanned-out candidates takes the wall ratio past the shuffle "
            "ratio. Natural corpora grow vocabulary with size, keeping "
            "the rare-gram tail rare; a bounded-vocab synthetic corpus is "
            "prefix filtering's adversarial input."
        ),
    }
    if fix50:
        artifact["small_files_fix"] = {
            "note": (
                "This artifact's own first assembly exposed a scale "
                "defect: the bin-pack target every maintenance rewrite "
                "sizes itself by was a FLAT 64 KB (sized so oracle-sf "
                "fixtures stay multi-file), so the 1M-doc chain's base "
                "compaction produced 3,117 files for 237 MB and every "
                "read paid ~50x the per-file catalog/footer/scheduling "
                "cost - merge_scan alone went e=1.62 on file count, and "
                "at 100 TB the flat target would mean 1.6 BILLION files. "
                "Fixed: targetFileBytes(totalBytes) = totalBytes/64 "
                "clamped to [64 KB, 128 MB] - the floor keeps every "
                "oracle-sf layout byte-identical (all testdata tables "
                "are <= 584 KB, under the 4 MB knee), the cap is the "
                "production file size. The merge-family queries below "
                "were re-run with fixtures rebuilt under the scaled "
                "target; pre-fix numbers retained here."
            ),
            "pre_fix": pre_fix,
            "post_fix": {n: {k: queries[n][k] for k in
                             ("lo_sec", "hi_sec", "exponent")}
                         for n in pre_fix},
            "base_compaction_files_1M": {"pre": 3117, "post": 65},
        }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
