#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r17 per-key checklist table (markdown) from a
BENCH_FULL-style json: per family, key | med | min | verdict/note.
Verdicts come from the VERDICTS map below (curated this round); keys not
named inherit the family default. Usage: mk_checklist.py BENCH_FULL.json
"""
import json, sys, collections

j = json.load(open(sys.argv[1]))
q, mn = j["queries"], j["min"]

# Curated per-key verdicts (round 17). Family defaults at the bottom.
VERDICTS = {
    # --- touched this round ---
    "q_sim_ann_lsh_tables": "r17: fan-out pin on the hashing pass (measured -2.5 s full-suite A/B)",
    "q_dedup_pagerank": "r17: deg carried through round checkpoints (final deg join-back gone)",
    "q_dedup_pagerank_day2": "r17: same pagerankLoop restructure via day-chain refresh",
    "q_dedup_clusters": "r17: pair pipeline materialized once (CC double-compute fix)",
    "q_dedup_clusters_sig": "r17: CC fix; declared full-recompute witness (stored twin 50x cheaper)",
    "q_dedup_clusters_day2": "r17: CC fix via chained label folds",
    "q_dedup_clusters_incr": "r17: CC fix via incremental path",
    "q_dedup_clusters_stored": "reads stored labels; fast",
    "q_dedup_minhash_lsh": "r17: (band,key) fan-out pin; sigs localCheckpointed once",
    "q_dedup_minhash_verify": "r17: (a,b) fan-out pin before 64-long compare",
    "q_dedup_minhash_capped": "r17: fan-out pin in capped enumerator",
    "q_sim_ann_pq": "r17: pqCodebook means = one keyed agg/round (2 Exchange -> 1, codegen kept)",
    "q_sim_ann_pq_rerank": "r17: pq means; rerank join unchanged",
    "q_sim_ann_pq_sampled": "r17: pq means over sampled training",
    "q_sim_ann_ivfpq": "witness: 2 in-query trainings by declaration; stored twin ~1 s",
    "q_sim_ann_ivfpq_residual": "witness: 2 in-query trainings + residual ADC; stored twin ~1.2 s",
    "q_sim_ann_ivf": "witness: 3 in-query Lloyd rounds; sampled/stored twins cheaper",
    "q_sim_ann_ivf_sampled": "production build (sampled Lloyd); search unchanged",
    "q_sim_kmeans": "witness: Lloyd + full assignment output",
    "q_dedup_semantic": "count-prunable consumer of the trained codebook; left",
    "q_embed_pq": "count-prunable PQ coder; left",
    "q_dedup_incremental": "batch x corpus band join; r17 pins upstream",
    "q_dedup_ngram": "size-banded mask join; df-bounded candidates; no structural waste found",
    "q_dedup_containment": "rare-gram inverted index, df-capped pair stream; left",
    "q_dedup_near": "banded recall + signature verify chain; left",
    "q_text_bpe": "bounded-round merge chain witness; segmenter twin is the production path",
    "q_text_bpe_lm": "longest-match segmenter over trained vocab (mid-build r17)",
    "q_pack_sequences_bpe": "two-level prefix-sum packing in trained-BPE units",
    "q_pipeline_curate": "composition of q_dedup_exact/quality/langid; cost = sum of parts",
    "q_pipeline_curate_rank": "composition via stored pagerank keepers",
    "q_multimodal_audio": "JDK WAV decode per row; CPU-bound, bytes never shuffle",
    # --- declared witnesses / production twins ---
    "q_sim_ann_ivfpq_stored": "production: stored index + partition-pruned scan",
    "q_sim_ann_ivfpq_residual_stored": "production: stored residual index",
    "q_sim_ann_ivfpq_rerank": "production: stored + exact rerank",
    "q_sim_ann_ivfpq_residual_rerank": "production: stored residual + rerank",
    "q_sim_ann_pq_stored": "production: stored codes",
    "q_sim_ann_pq_day2": "store chain generation; cost shape is the point",
    "q_sim_ann_ivfsq8": "stored SQ8 index; integer ADC",
    "q_sim_ann_ivfsq8_rerank": "stored SQ8 + rerank",
    "q_sim_ann_ivfsq8_day2": "SQ8 store chain generation",
    "q_sim_ann_ivfpq_split": "hot-cell split generation over stored index",
    "q_dedup_incremental_stored": "stored-signature twin",
}

FAMILY_DEFAULT = {
    "scan": "pushdown/pruning verified (PLANS.md); overhead-bound",
    "agg": "partial agg + single exchange; overhead-bound",
    "join": "broadcast/strategy audited (PLANS.md); overhead-bound",
    "window": "single partition-keyed exchange; overhead-bound",
    "cdc": "keyed windows over ops stream; overhead-bound",
    "stream": "foreachBatch/window twins; overhead-bound",
    "events": "sessionized windows; overhead-bound",
    "text": "tokenize + keyed aggs; examined, no structural waste",
    "dedup": "bucketed/banded pipeline; examined",
    "sim": "examined; map-side + two-level rank",
    "multimodal": "JDK codec CPU; bytes never shuffle",
    "pack": "two-level prefix-sum packing",
    "sample": "hash/stratified selectors; map-side",
    "split": "hash split; map-side",
    "pipeline": "composition of declared operators",
}

fams = collections.defaultdict(list)
for k in sorted(q):
    fams[k.split("_")[1]].append(k)

order = sorted(fams, key=lambda f: -sum(q[k] for k in fams[f]))
for fam in order:
    tot = sum(q[k] for k in fams[fam])
    print(f"\n### {fam} ({len(fams[fam])} keys, {tot:.1f} s)\n")
    print("| key | med s | min s | verdict |")
    print("| --- | --- | --- | --- |")
    for k in sorted(fams[fam], key=lambda k: -q[k]):
        v = VERDICTS.get(k)
        if v is None:
            v = ("fast; " + FAMILY_DEFAULT.get(fam, "overhead-bound")) if q[k] <= 0.5 \
                else FAMILY_DEFAULT.get(fam, "examined")
        print(f"| {k} | {q[k]:.2f} | {mn.get(k,-1):.2f} | {v} |")
