#!/usr/bin/env python
"""Empirical scaling curves for the headline operator families.

The correctness gate runs at small SFs; this tool answers the 100 TB
question directly: replicate the sf0.1 tables ×2 and ×4 (key-offset
copies, so ids stay unique and key-derived distributions keep their
shape), run the representative queries UNCHANGED against the scaled
directories, and report wall-time growth. A plan that is linear in the
input shows ratios ≈ the scale factor; an accidental all-pairs or
re-scan shows super-linear growth immediately.

Usage: python tools/scalecheck.py [scales ...] [--only q1,q2,...]
(default scales: 1 2 4). Prints one JSON line:
{"query": {"1": s, "2": s, "4": s}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_scratch")

# id column to offset per table (keeps keys unique across replicas; the
# offset is far above any real key so modular/LCG-derived attributes keep
# their distribution shape)
TABLES = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
    "supplier": None,  # catalog side: deliberately NOT scaled (broadcast dim)
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "region": None,
    "nation": None,
    "part": None,
}

QUERIES = [
    "pricing_summary",
    "text_quality",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard_capped",
    "dedup_embedding_cosine_capped",
    "ann_cosine_topk",
    "crossmatch_sky",
    "doc_chunks",
    "group_features",
    # round-3 sixth wave: sketch / LM / PQ families
    "bloom_prune_join",
    "sketch_quantiles",
    "heavy_hitters",
    "lm_quality_buckets",
    "pq_compression",
    "pq_adc_topk",
    # round-3 eighth wave: prefix-filter join, span profile, phash, semdedup
    "dedup_jaccard_ppjoin",
    "dup_span_profile",
    "image_phash_dedup",
    "semantic_dedup",
    # round-3 ninth wave: selection / analytics / profiling families
    "dsir_select",
    "funnel_steps",
    "retention_cohorts",
    "rolling_range_window",
    "table_profile",
    "event_transitions",
    "contingency_chi2",
    "triangle_count",
    # round-3 wave 12: affinity / rolling-reach / attribution / smoothing
    "part_affinity",
    "sliding_distinct_users",
    "last_touch_attribution",
    "ewma_user_value",
    "robust_outliers",
    "phrase_match",
    # round-3 wave 13: overlap / diversity (skyline's `part` input is a
    # deliberately-unscaled dim table, so it has no curve here)
    "segment_overlap",
    "mmr_diverse_topk",
    "containment_pairs",
    "winsorized_stats",
    "session_paths",
    # round-4: reconciliation cogroup (verdict r3 item 8 named it for ×8)
    "cogroup_reconcile",
    # round-4 waves 14-15 (fuzzy_match_names is omitted: its input is
    # the deliberately-unscaled `part` dim table, so it has no curve)
    "bm25_topk",
    "rrf_fusion",
    "stratified_sample",
    "length_bucket_batches",
    "snapshot_diff",
    "acf_lags",
    "ab_welch_ttest",
    "calibration_bins",
    "gap_islands",
    # round-5 wave 16: decision-support decorrelation suite (all driven by
    # the scaled fact tables; dims deliberately unscaled stay broadcast)
    "min_cost_supplier",
    "market_share",
    "product_profit",
    "important_parts",
    "custorder_distribution",
    "top_supplier",
    "supplier_part_counts",
    "small_qty_revenue",
    "large_volume_customers",
    "disjunctive_revenue",
    "sole_late_supplier",
    "dormant_customers",
    # round-5 wave 17: scale-ops planners (documents/lineitem driven)
    "partition_skew_report",
    "zipf_skew_fit",
    "compaction_plan",
    "balanced_ranges",
    # round-5 wave 18: multimodal sequence analysis (documents-driven)
    "video_scene_cuts",
    "audio_silence_map",
    # round-6: applyInPandasWithState stateful streaming family — state
    # size is the scaling hazard (×4 parallel-absorbs it; ×64 does not)
    "stream_heavy_hitters",
    "stream_sequence_packing",
    "stream_dedup_lsh",
    # round-7: REAL-model kernels (state-free map work over per-user
    # aggregates; event_id-offset replication grows CURVE LENGTH per
    # user — the feature-extraction axis — while the scored population
    # stays constant, so expect ≈linear agg cost + constant kernel cost)
    "snn_ia_real",
    "mulens_real",
    "mulens_real_lia",
    "orphan_real",
    "kn_rf_real",
    "anomaly_real",
    "anomaly_real_lc",
    "superluminous_real",
    "kn_legacy_real",
    "cats_real",
]

OFFSET = 1 << 40


def scaled_dir(spark, scale: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"scalecheck_x{scale}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for table, key in TABLES.items():
        src = os.path.join(BASE, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if key is None or scale == 1:
            rep = df
        else:
            parts = [df]
            for k in range(1, scale):
                parts.append(df.withColumn(key, F.col(key) + k * OFFSET))
            rep = parts[0]
            for p in parts[1:]:
                rep = rep.unionByName(p)
        rep.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    open(marker, "w").close()
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fink_science_spark.session import get_session

    import __spark_entry__ as entrymod

    argv = sys.argv[1:]
    only: list[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        if i + 1 >= len(argv):
            sys.exit("usage: scalecheck.py [scales ...] --only q1,q2,...")
        only = argv[i + 1].split(",")
        unknown = sorted(set(only) - set(QUERIES))
        if unknown:
            sys.exit(f"--only names not in QUERIES: {unknown}")
        argv = argv[:i] + argv[i + 2 :]
    scales = [int(x) for x in argv] or [1, 2, 4]
    run_list = [q for q in QUERIES if only is None or q in only]
    spark = get_session(app_name="scalecheck")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    dirs = {s: scaled_dir(spark, s) for s in scales}
    # warm-up at the base scale
    for name in run_list:
        queries[name](spark, dirs[scales[0]]).write.format("noop").mode(
            "overwrite"
        ).save()

    results: dict[str, dict[str, float]] = {}
    for name in run_list:
        results[name] = {}
        for s in scales:
            samples = []
            for _ in range(2):
                # see bench.py: without this the second sample reuses the
                # first sample's intra-query persisted tables (Spark's
                # cache manager matches semantically-equal plans) and the
                # reported min times only the post-cache tail
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                queries[name](spark, dirs[s]).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            results[name][str(s)] = round(min(samples), 3)
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    print(json.dumps(results, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
