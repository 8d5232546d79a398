#!/usr/bin/env python
"""Generate PLANS.md: formatted physical plans of the flagship queries at
sf0.001 with scale commentary, so plan quality is reviewable as a
checked-in artifact (regenerate after plan-shape changes:
`python tools/gen_plans_doc.py`)."""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

COMMENTARY = {
    "pricing_summary": (
        "Scan-side filter (PushedFilters) + 7-column pruned ReadSchema + "
        "partial HashAggregate before the single exchange. At 100 TB the "
        "scan is the cost; everything above it is map-side."
    ),
    "region_revenue": (
        "Three dimension joins, all BroadcastHashJoin — the orders fact "
        "table is scanned once and never shuffled for the dims."
    ),
    "crossmatch_sky": (
        "The 2-D crossmatch: left side exploded to its 3×3 neighbor grid "
        "cells, catalog side broadcast, haversine refine as a plain "
        "filter, arg-min window on the left key. No cartesian node; the "
        "only wide operation is the final per-left-row window."
    ),
    "dedup_minhash_lsh": (
        "exact-duplicate collapse first (one array-keyed groupBy — "
        "byte-equal docs never reach the band join), then explode → "
        "codegen'd MIN-aggregate signatures (map-side partials) → "
        "posexplode of band keys → broadcast band-key self-join on the "
        "persisted signature table → id-only pair dedup → verify "
        "join-back → combinatorial member expansion of clone groups."
    ),
    "user_history_stats": (
        "The history materialization: exactly ONE exchange "
        "(groupBy + sorted collect_list); per-field array projections are "
        "free narrow transforms above it."
    ),
    "asof_click_before_purchase": (
        "As-of join as union-and-scan: both sides shuffle once on the key "
        "(one exchange for the union), then a single ordered window scan "
        "carries the right payload forward. No range join, no per-row probe."
    ),
    "bucketed_join": (
        "Both sides pre-bucketed by the join key at write time: the join "
        "itself needs no exchange (the only one in the plan feeds the "
        "final aggregation)."
    ),
    "partitioned_scan": (
        "Hive-layout partition pruning: PartitionFilters restricts the "
        "scan to the one matching directory before any I/O."
    ),
    "orphan_score": (
        "Single-pass feature extraction: ONE scan, one (user, band) "
        "exchange shared by all three window specs (lag rates, cumulative "
        "positive-rate rank, per-band positive count), then one user-keyed "
        "aggregation that also carries the argmin-peak via min(struct). "
        "No joins — the two-branch+join-back form cost 3 scans."
    ),
    "snn_ia_score": (
        "Recurrent forward pass as a chain of named projections above one "
        "groupBy exchange — each hidden state evaluated once per row, "
        "whole plan stays native (no Python stage). CollapseProject "
        "leaves the chain alone because merging would duplicate non-cheap "
        "expressions (the nested form grows 3^K and breaks codegen)."
    ),
    "ann_rerank": (
        "Two-stage retrieval: the corpus-side block kernel is the only "
        "Python stage; the candidate set (queries x k rows) broadcasts "
        "back against the embedding table twice for metadata, and the "
        "rerank MLP evaluates natively inside codegen."
    ),
    "host_pagerank": (
        "The document table appears NOWHERE in the iteration plan: it is "
        "reduced to a checkpointed host-scale edge list first, and every "
        "power-iteration round is a broadcast join + re-aggregate on that "
        "small graph."
    ),
    "doc_chunks": (
        "Sliding-window chunking is a scan-shaped narrow pass: tokenize → "
        "Generate over chunk starts → slice + fingerprint projection. No "
        "Exchange, no Python — at 100 TB this costs exactly one read of "
        "the document table."
    ),
    "dedup_embedding_cosine_capped": (
        "ONE shuffle (groupBy LSH bucket) feeding the per-bucket Arrow "
        "matmul kernel; the max_bucket skew guard drops oversized cells "
        "inside the same stage, so a hot bucket costs nothing downstream."
    ),
    "avro_scan": (
        "The jar-free Avro source plans one partition per container "
        "block (planner walks the block index seek+skip); decode is "
        "embarrassingly parallel below the single aggregation exchange."
    ),
    "bloom_prune_join": (
        "The Bloom bitset probe is a flat codegen conjunction of "
        "element_at checks sitting directly on the fact scan — "
        "non-matching rows die before any join machinery. The bitset is "
        "ONE ArrayType Literal (np.int64 path), not a CreateArray tree."
    ),
    "sketch_quantiles": (
        "Bounds pass + partial-aggregated (group, bucket) counts: the "
        "exchange carries at most groups × 256 rows regardless of data "
        "size; the window/quantile extraction runs on that summary."
    ),
    "heavy_hitters": (
        "Arrow candidate pass (bounded output per partition) feeds a "
        "native isin filter BELOW the counting exchange — the "
        "vocabulary-sized shuffle of the naive groupBy never happens."
    ),
    "lm_quality_buckets": (
        "The per-doc NLL table is localCheckpoint-materialized (it feeds "
        "the cutpoint sketch AND the final projection), so the displayed "
        "plan truncates to the checkpointed RDD. Upstream of it: LM "
        "tables broadcast back onto the exploded bigram stream, one "
        "per-doc hash aggregation, tercile cutpoints from the histogram "
        "sketch (1-row broadcast) instead of a single-partition ntile."
    ),
    "pq_adc_topk": (
        "Codes join a broadcast LUT — full vectors never appear in the "
        "scoring join; the per-query ranking window runs on 4-term "
        "exact-dyadic sums."
    ),
    "dedup_jaccard_ppjoin": (
        "Exact-duplicate collapse first (byte-equal token sets become one "
        "representative — a k-clone group would otherwise emit "
        "C(k,2)·prefix_len un-dedupable candidate rows), then prefix "
        "filtering: the candidate self-join reads only each rep's "
        "frequency-ranked prefix tokens (explode of a slice), so stop-"
        "shingle skew never reaches the join; the persisted collapsed "
        "table is shared by prefix emission, both exact-verify sides, "
        "and the member expansion; clone pairs are reconstructed "
        "combinatorially at output."
    ),
    "image_phash_dedup": (
        "Arrow decode emits (id, 8-byte signature) — pixel blobs never "
        "reach an exchange; the Hamming join is the shared pigeonhole "
        "(chunk, value) equi-join with a ReusedExchange self-join."
    ),
    "semantic_dedup": (
        "Cell assignment is a pure-map Arrow kernel against the broadcast "
        "IVF codebook; vectors shuffle exactly once (to their cell) for "
        "the per-cell prune kernel. No join, no second scan."
    ),
    "funnel_steps": (
        "Strict-order 3-step funnel: ONE event shuffle (user_id window), "
        "both step qualifications as chained running-mins on the same "
        "window spec, per-user flag rollup reusing the partitioning — no "
        "multi-countDistinct Expand tripling the row flow."
    ),
    "dsir_select": (
        "DSIR selection: the token stream feeds two map-combinable hash "
        "aggregates; the B-row log-ratio weight table comes back as a "
        "BroadcastHashJoin; scores are exact int64 lane sums. The corpus "
        "never joins by shuffle."
    ),
    "skyline_frontier": (
        "Distributed SKYLINE: two MapInPandas stages of the same "
        "vectorized dominance kernel — per-partition local frontier "
        "(no exchange touches the scan), then an anti-chain-sized "
        "SinglePartition exact refine. The only exchanges are the tiny "
        "refine gather and the presentation sort."
    ),
    "segment_overlap": (
        "Audience overlap: ONE hashpartitioning(user_id) exchange with "
        "partial_bit_or map combine; the mask histogram (≤ 2^types "
        "rows) broadcasts into the pair matrix as conditional sums — "
        "the pairwise distinct self-join never exists."
    ),
    "bm25_topk": (
        "BM25 with NO Generate node: tf per query term is a per-row HOF "
        "count, so the corpus never explodes and never shuffles; the "
        "single stats row re-enters as BroadcastNestedLoopJoin; the "
        "top-k is TakeOrderedAndProject (partial per-partition top-k, "
        "no global sort)."
    ),
    "rrf_fusion": (
        "Hybrid-retrieval fusion: both rankers share ONE scored corpus "
        "pass; each top-C list is TakeOrderedAndProject; exact ranks "
        "and the full-outer fusion run on ≤C-row relations. Ranking "
        "the full match set in a window would be a single-partition "
        "corpus sort — the plan pins the TakeOrdered shape instead."
    ),
    "fuzzy_match_names": (
        "Blocked entity matching: candidates come from an EQUI-join on "
        "the corruption-invariant blocking key (never a nested-loop or "
        "cartesian); levenshtein verify is a plain filter above the "
        "join; the argmin resolve window re-uses the dirty-key "
        "partitioning."
    ),
    "gap_islands": (
        "Gaps-and-islands: the (user, day) dedup, the dense_rank "
        "window, the island aggregation, and the per-user argmax all "
        "hash-partition on user_id — AQE plans ONE exchange for the "
        "whole chain; no global window exists."
    ),
    "snapshot_diff": (
        "Versioned-table diff: one full-outer SortMergeJoin on the "
        "snapshot key (both derived snapshots prune their filters into "
        "the same parquet scan), then a partial-agg 4-class conditional "
        "count — the classification never re-scans."
    ),
    "min_cost_supplier": (
        "Correlated-MIN decorrelation (Q2 shape): the supply relation "
        "aggregates once on (partkey, suppkey); the per-part minimum is "
        "a second hash agg on the SUBSET of those keys, so it rides the "
        "same partitioning; the join-back on (partkey, cost) keeps every "
        "minimizer. Part and regional-supplier dims are "
        "BroadcastHashJoin — the fact never shuffles for a dimension."
    ),
    "sole_late_supplier": (
        "EXISTS + NOT-EXISTS double correlation (Q21 shape) decorrelated "
        "to ONE per-order hash aggregate whose late-supplier set both "
        "counts the correlation and carries the answer (|set| == 1 ⇒ "
        "its element is the sole late supplier) — no join-back, no "
        "window. The fact join is SHUFFLE-HASH by hint: nothing "
        "downstream needs sort order, and SMJ's fact sort measured 98 s "
        "vs 22 s at ×64 replicas; the per-supplier count is a tiny "
        "second exchange; top-50 is TakeOrderedAndProject."
    ),
    "disjunctive_revenue": (
        "OR-of-ANDs join predicate (Q19 shape): Catalyst does not derive "
        "cross-branch implied predicates, so the per-side superset "
        "conjuncts are written explicitly — PushedFilters shows the "
        "brand/size IN-range on the part scan and the quantity range on "
        "the lineitem scan; the residual OR evaluates above the "
        "BroadcastHashJoin."
    ),
    "custorder_distribution": (
        "Zero-preserving distribution (Q13 shape): orders pre-aggregate "
        "to one row per custkey BEFORE the customer join, shrinking the "
        "probe side from |orders| to |active customers|; the zero bucket "
        "survives via left join + coalesce; the final histogram agg is "
        "map-combinable on ~tens of distinct counts."
    ),
    "partition_skew_report": (
        "Scale-ops planner: per candidate shuffle key, ONE map-combined "
        "count aggregate over a single-column pruned scan (ReadSchema "
        "shows exactly one field), then a 1-row reduction of the "
        "bounded per-key table — heaviest key via max(struct), no "
        "argmax window, no second fact pass. Three reports union into "
        "a 3-row frame."
    ),
    "balanced_ranges": (
        "Exact range-partitioner boundaries: the fact contributes one "
        "map-combined count; the cumulative window and bucket rollup "
        "run on the key-cardinality-bounded histogram (documented "
        "single-reducer, the acf_lags argument); assignment is integer "
        "K*cum DIV total — no float boundary wobble, keys never split."
    ),
    "video_scene_cuts": (
        "Multimodal sequence shape: pixel bytes are consumed inside "
        "ONE MapInPandas kernel that emits a scalar luma per frame — "
        "binary never shuffles; the lag window and cut aggregation "
        "ride a single doc_id exchange over a 6-rows-per-doc relation "
        "(schema constant, not data volume)."
    ),
    "audio_silence_map": (
        "Multimodal sequence shape, islands variant: sample bytes feed "
        "ONE window_mad kernel; silence classify, the gaps-and-islands "
        "group id, and both run aggregates share the doc_id "
        "partitioning. n_windows is the schema constant taken from the "
        "documents scan — re-counting the kernel relation would run "
        "the md5 generation and the kernel twice (no AQE reuse across "
        "the filtered/unfiltered branches; caught in review)."
    ),
    "snn_ia_real": (
        "REAL-model shape: one groupBy builds the per-user sequence, "
        "then the 35,970-param bi-LSTM runs in ONE MapInPandas stage — "
        "weights are a ~145 KB executor-memoized artifact, scoring is "
        "per-row map work, nothing model-shaped ever shuffles or "
        "collects. At 100 TB this is scan + one keyed exchange + "
        "embarrassingly parallel Arrow batches."
    ),
    "anomaly_real": (
        "Two 150k-node ONNX forests evaluate inside ONE Arrow kernel "
        "stage behind the native per-band aggregation; the TwoBandModel "
        "min/mask combine is pure column algebra above it. Checkpoints "
        "load once per executor (ExecutorRegistry); the full-outer band "
        "join is key-bounded (users), never data-bounded."
    ),
    "anomaly_real_lc": (
        "The real forests behind REAL features: the 27-column band "
        "extractor is the band_features shape (one groupBy + sorted "
        "collect_list + a scalar Arrow kernel over array columns), the "
        "per-band frames re-join on user_id, and both ONNX forests "
        "evaluate in ONE MapInPandas stage. Every exchange is keyed on "
        "user_id; AQE coalesces the small band frames. Curve length is "
        "the only data-bounded axis (x64 replica curve in SCALING.md)."
    ),
    "mulens_real_lia": (
        "47 LIA statistics per (user, band) from ONE shuffle (sorted "
        "collect_list -> scalar Arrow kernel), the 1000-tree forest in "
        "ONE MapInPandas stage per the kernel's executor-memoized "
        "checkpoint. The oracle walks a single MATERIALIZED node table "
        "per band (recursive CTE) instead of 8,000 nested-CASE trees. "
        "The universe aggregate and both band joins share the user_id "
        "key; gates are pure column algebra above the kernel."
    ),
    "superluminous_real": (
        "Veto cascade + real XGBoost head: one window pass (per-user "
        "mean + lagged slope, single user_id partitioning) feeds one "
        "hash aggregation producing all 27 features natively; the "
        "100-tree booster evaluates in ONE MapInPandas stage. Vetoed "
        "rows short-circuit to the -1.0 sentinel in column algebra — "
        "the kernel scores everything it receives, the mask applies "
        "above (same rows both engines)."
    ),
}


def main() -> None:
    from fink_science_spark.session import get_session

    import __spark_entry__ as entrymod

    spark = get_session(app_name="gen_plans_doc")
    queries = entrymod.queries()

    out = [
        "# PLANS — physical plans of the flagship queries",
        "",
        "Generated by `tools/gen_plans_doc.py` at sf0.001 (plan shape is",
        "data-size-independent; AQE may further coalesce at runtime).",
        "Plan properties asserted in CI: `tests/test_plans.py`.",
        "",
    ]
    for name, comment in COMMENTARY.items():
        fn = queries[name]
        df = fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the tree section + scan details; drop verbose node details
        tree, _, details = plan.partition("\n\n")
        scan_lines = [
            ln
            for ln in details.splitlines()
            if any(
                k in ln
                for k in ("PushedFilters", "PartitionFilters", "ReadSchema")
            )
        ]
        out += [
            f"## {name}",
            "",
            comment,
            "",
            "```",
            tree.strip(),
            *(["", *[ln.strip()[:200] for ln in scan_lines]] if scan_lines else []),
            "```",
            "",
        ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
