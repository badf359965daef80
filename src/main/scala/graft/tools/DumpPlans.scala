package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Regenerates PLANS.md: the formatted physical plans of the headline
  * queries, the evidence behind SCALE.md's claims (pushed filters,
  * pruned read schemas, broadcast joins, partial+final aggregation).
  * PlanQualitySpec asserts the same properties; this file is for
  * reading. Usage: `sbt "runMain graft.tools.DumpPlans [sfDir] [out]"`.
  */
object DumpPlans {

  private val headline = Seq(
    "q01_scan_filter_project" -> "filters pushed to parquet; 5 of 16 lineitem columns read",
    "q02_agg_pricing_summary" -> "partial+final hash aggregation (map-side combine)",
    "q10_join_dims" -> "both dim joins broadcast; fact side never shuffled",
    "q28_profile_summary" -> "full profile: one scan, one explode, fused verdict kernels",
    "q36_embed_cosine_topk" -> "query set broadcast; fused int64 dot product",
    "q45_skew_twophase_agg" -> "salted partial agg, tiny re-merge without the salt",
    "q47_ann_ivf" -> "IVF: broadcast centroids/probes, corpus never sort-merged",
    "q48_cube_pricing" -> "whole grouping-set lattice expanded in one pass",
    "q05_row_number" -> "global rank: ONE materialized range partition (InMemoryRelation — both branches read the same physical partitions, r16 cached-plan fix) + broadcast offsets, no single-partition window over data",
    "q20_phone_validate" -> "when-tree validator with With-hoisted shared subexpressions (stacked _common_expr projections, codegen-sized)",
    "q53_simhash_pairs" -> "banded hamming LSH: bucket group-by (no self-join), capped fan-out",
    "q54_csv_profile" -> "CSV scan with inferred schema through the validator projection",
    "q59_interval_join" -> "binned interval join: equality hash join on the bin, BETWEEN residual map-side, no nested loop",
    "q60_cosine_pairs_lsh" -> "all-pairs near-dup: fused integer bucket, group-by + in-group combos (no self-join), verify map-side",
    "q61_ngram_jaccard" -> "prefix-filtered similarity join: freq dim, ranked prefixes, in-group candidates, exact verify",
    "q62_multi_distinct" -> "per-column two-phase distinct aggs joined on the keys — no Expand",
    "q63_heavy_hitters" -> "Misra-Gries candidates (mapPartitions) broadcast into the exact recount",
    "q68_skew_salted_join" -> "salted fact-dim join: dim replicated x buckets, hot key spread over (key, salt) reducers",
    "q76_fuzzy_join" -> "SymSpell blocking: deletion-signature equi-join, exact levenshtein on candidates only",
    "q77_resample_ffill" -> "lead+explode gap-fill: forward-fill falls out of the generator, no grid join",
    "q78_bucketed_fact_join" -> "bucketed layout (Bucketed: true scans); broadcast at this tiny SF — with broadcast off the join is a no-Exchange no-Sort SMJ (BucketingSpec gate)",
    "q79_bucketed_asof" -> "bucketed events: per-user as-of window with no Exchange before it",
    "q80_contamination_wide" -> "8-gram audit on fused xxhash64 shingles: benchmark side broadcast, corpus never shuffled pre-agg",
    "q84_contamination_flags" -> "state-free flags: count_in_sorted binary search against the 1-row broadcast benchmark set — per-row cost independent of its size",
    "q85_bm25" -> "tf/df/stats all read the checkpointed tf frame — ONE corpus scan; corpus stats ride a 1-row broadcast",
    "q87_stratified_sample" -> "deterministic sample: pure projection + filter, zero shuffle before the output sort",
    "q111_priority_sample" -> "weighted top-k sample: 2-column pruned scan, zero-shuffle priority projection, TakeOrderedAndProject",
    "q88_pack_sequences" -> "sequence packing: one per-stratum cumulative window, no global sort",
    "q93_split_leakage" -> "leakage audit: shingle-hash equi-join, left join keeps clean docs",
    "q95_partition_pruning" -> "lang=en read prunes directories (PartitionFilters), no row-level lang filter",
    "q101_contamination_13g" -> "13-gram audit over flattened per-window token arrays (tokenize once); hashed shingles broadcast",
    "q102_ivf_pq_residual" -> "IVFADC: broadcast centroids/codebook/probes/dtables; corpus scanned for assign+encode and score, never shuffled pre-top-k",
    "q104_pooled_ann" -> "pooled-vector ANN: integer lsh_bucket_long, query side broadcast, corpus never sort-merged",
    "q105_late_data_audit" -> "two-pass running max over arrival order: range partition + broadcast per-partition maxima, no single-partition window over events",
    "q123_repetition_signals" -> "per-doc n-gram stats by sorted fold INSIDE the row: staged projections (gram build / fold / extract), no explode, no Exchange before the output sort",
    "q124_semantic_dedup" -> "SemDeDup: nList-row centroid broadcast, argmax assignment, cluster-keyed pair JOIN (no collect_list buffer), decimal threshold",
    "q128_bm25_search" -> "BM25 search: term-keyed shuffle join of query terms vs the checkpointed weight table; q_id-partitioned top-k window",
    "q130_balanced_shards" -> "balanced shards: GlobalRank two-pass (per-partition counts + broadcast offsets) + mod-S projection — no single-partition window",
    "q132_span_corrupt" -> "span corruption: tokens/zip/fold staged as attributes (per-element lambda capture avoided); zero shuffle before the output sort",
    "q154_c4_line_filter" -> "C4 line rules: every rule a HOF fold inside the row — zero shuffle before the output sort",
    "q155_line_dedup" -> "corpus line dedup: md5-keyed count->filter two-pass; the shuffle carries (32-hex, doc_id), never line text",
    "q159_knn_graph" -> "mutual k-NN graph: bucket-keyed shuffle-hash join both sides (query side forced off-broadcast), edge-set self-join for mutualization",
    "q161_substring_dedup" -> "substring dedup: positional hash explode, dup-window dim joins back keyed, coverage+rebuild in-row (count_in_sorted binary search)",
    "q163_budget_cut" -> "budget cut: GlobalCumSum two-pass — range partition, pid-local running-sum window, broadcast offsets; no single-partition window over data",
    "q172_knn_graph_deduped" -> "dedup-collapsed k-NN graph: md5-key collapse agg, reps-only bucket join, member degree inheritance — distinct-vector bucket occupancy",
    "q175_vocab_prune" -> "vocab prune: 1-row sorted-hash vocab broadcast, per-token binary search in-row — zero-shuffle corpus rewrite",
    "q178_pagerank" -> "PageRank round: edge-keyed join + dst-keyed sum over the checkpointed edge+outdeg frame; per-edge floored contributions",
    "q181_kmv_sketch" -> "KMV: source-keyed rank window keeps k rows per source; the distinct set never collects",
    "q192_entity_resolution" -> "entity resolution: deletion-signature equi-join blocking, exact verify, label-propagation components, canonical rollup",
    "q195_rag_chunks" -> "RAG chunking: scan + explode only — zero joins, zero windows before the output sort; the embarrassingly-parallel preprocessing shape",
    "q206_weighted_median" -> "weighted median: corpus pre-aggregated to the (source, len) dimension BEFORE any window; the ordered pass runs over ~100 rows per source",
    "q210_late_arrival" -> "late-arrival audit: two-pass global running max — block maxima + tiny prefix-max dim broadcast + block-keyed window; no single-partition window over events",
    "q217_join_cardinality" -> "join stats: exact size from two degree aggs (no join executed on the fact side), histogram estimate on 8-row frames",
    "q231_countmin_freq" -> "Count-Min: fixed 4x16 cell frame from one keyed agg over the (tok, count) dim; probe is a dimension join, estimate a min-agg",
    "q239_mad_outliers" -> "median/MAD: corpus to the (type, cents) value dim, both median passes type-partitioned windows ON the dim, deviation dim joined back keyed",
    "q241_basket_rules" -> "basket rules: order-keyed self-join (fan-out bounded by basket size), pair-dim aggs, 1-row n_orders broadcast",
    "q242_rfm_segments" -> "RFM: three GlobalCumSum breakpoint scans (pid-local windows + broadcast offsets), 3-row breakpoint dims broadcast back, 64-cell census",
    "q247_auc_probe" -> "AUC: 64-row probe dim broadcast into the score projection; rank-sum over GlobalCumSum prefix totals — no corpus sort, no rank funnel",
    "q250_ks_drift" -> "KS: merged value dim with two chained GlobalCumSum passes; D = integer cross-product gap, argmax as dim top-1",
    "q253_revenue_pareto" -> "Lorenz deciles: two-pass desc rank via GlobalCumSum, 10-row decile dim carries shares",
    "q381_multimodal_pipeline" -> "multimodal manifest: five chained per-media-bounded stages; each gate feeds the next via checkpointed survivor frames, the manifest assembles by keyed left joins",
    "q382_release_health" -> "release health: two corpus scans to per-source bounded dims (256 buckets / 513 length cells / 16 mix cells / 64 dims); verdict frame is broadcast joins at source grain",
    "q383_maxsim_ivf_rerank" -> "IVF-routed MaxSim: 64-row centroid dim broadcast into slice assignment; candidates via cluster-keyed join; rerank + brute-force ground truth share the checkpointed normed frame",
    "q387_detector_disagreement" -> "detector audit: both LSH chains bucket-group-emit (no self-joins), full-outer pair join, evidence joined back keyed",
    "q391_pareto_skyline" -> "skyline: grid-census prune via broadcast anti-join on the cell dim + exact per-cell local skylines (windowed, r15); pairwise check bounded by output anti-chain size",
    "q394_detector_disagreement_cells" -> "disagreement cells: exact collapse first, both capped LSH chains at rep grain, one verify pass, map-side-combined cell aggregation — output is the calibration surface, not pairs",
    "q395_stream_release_gate" -> "streaming release gate: foreachBatch over digest/mass/manifest state; per batch one scored projection + one digest join, waterfill and roots at bounded dim grain",
    "q397_ngram_decontaminate" -> "n-gram decontam: benchmark gram dim BROADCAST into the positional-shingle projection; islands pass on hit positions only",
    "q399_lsh_scurve" -> "LSH S-curve: panel x bounded counter-draw pairs, exact shingle Jaccard per pair, caught computed IN the pair row (zip_with band keys) — no band join",
    "q400_shuffle_quality_audit" -> "shuffle audit: two GlobalRank two-pass rankings, (shard x source) dim censuses, TV at grid grain",
    "q401_embedding_dispersion" -> "dispersion census: closed-form moments — one dim-explode to the (source x 64) grid + in-row norm folds; zero pairwise work",
    "q403_split_neardup_leakage" -> "split leakage: capped MinHash chain with train x train candidates dropped BEFORE the exact verify; census rides sentinels",
    "q408_dedup_ladder" -> "dedup ladder: ONE corpus scan computing 4 digests (rungs 2/3 via the fused PunctWs byte kernel), x4 multi-distinct expand on digests, no join",
    "q416_tokenizer_migration" -> "tokenizer migration: both BPE vocabularies snapshotted from ONE train, segment frames BROADCAST onto the (source, word) census",
    "q429_semantic_outliers" -> "semantic outliers: centroid sums via one posexplode to the (source x 64) grid, 20-row broadcast dim, one integer-dot pass per doc — zero pairwise work",
    "q433_source_xentropy_map" -> "source xentropy map: the 20x20 matrix from ONE type-grain inner join (add-1 log decomposition — absent words cost nothing)",
    "q449_sft_release_gate" -> "composed SFT gate: one corpus scan feeds the spine, lazily-persisted slim stage frames, prompt-partitioned dedup-rank window only, trigram explode on stage-5 survivors",
    "q453_preference_release_gate" -> "composed DPO gate: pair-grain chain; source/judge conviction censuses rejoin as BROADCAST dims, pool-rank window prompt-partitioned, trigram explode on cap survivors",
    "q455_census_replan" -> "census->ladder->re-census: ONE checkpointed bucket frame feeds candidate emission and BOTH occupancy censuses; collapse is an anti-join on verified b_ids",
    "q456_pretraining_release_gate" -> "composed corpus gate: doc-grain chain over one persisted spine; near-dup over exact-collapsed reps only, eval gram set BROADCAST (fixed-size however big the corpus), gram explodes feed cached stage frames",
    "q459_takedown_propagation" -> "takedown: one digest group-by + keyed join back; packing window source-partitioned over REPS only; manifest is id-grain unions",
    "q460_eval_refresh_delta" -> "eval refresh: both gram probes broadcast semi-joins (old-set replay + new-gram delta); corpus scanned, never shuffled pre-agg")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans of the headline queries\n\n"
    sb ++= s"Generated by `graft.tools.DumpPlans` on `$sfDir`. These are the\n"
    sb ++= "plans PlanQualitySpec asserts properties of; regenerate after any\n"
    sb ++= "query change: `sbt \"runMain graft.tools.DumpPlans\"`.\n"
    for ((name, why) <- headline) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb ++= s"\n## $name\n\n$why.\n\n```\n"
      sb ++= df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
      sb ++= "\n```\n"
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
