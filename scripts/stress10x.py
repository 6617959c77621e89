"""10× scale stress: materialize 10× copies of the sf0.1 documents /
events fixtures (id-shifted, so dedup density rises 10×) as real
parquet, run the heaviest operators, and report wall-clock + key
plan properties. The point is trend evidence for the 100 TB design
claims: linear-or-better runtime growth and NO plan degradation
(same broadcasts, same bucketed joins, no cartesian fallback).

Usage: python scripts/stress10x.py [sf_dir] [out_dir] [op ...]
(op names default to the full OPS tuple)
Prints one JSON line per operator and a trailing summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mapreducepy_spark.io import load, load_spread
from mapreducepy_spark.registry import load_catalog
from mapreducepy_spark.session import get_spark

COPIES = 10
# the heaviest shingle/index operators plus narrow-map controls
OPS = (
    "dedup_near",
    "dedup_near_verified",
    "text_contamination_ngram",
    "text_repetition",
    "text_oov_rate",
    "events_dau_rolling",
    "events_anomaly",
    # round 4: the composed pipeline + the char-level LM +
    # session/entropy rollups + the provenance matrix
    "pipeline_clean_corpus",
    # round 8: the drop-decision audit (same ledger as clean_corpus,
    # dedup window replaced by an orderBy-free MIN frame)
    "pipeline_drop_explain",
    "text_charlm",
    "events_session_stats",
    "events_entropy",
    "dedup_cross_source",
    "dedup_survivors_verified",
    "events_cooccurrence",
    # round 5: LSH tuning gauge, corpus card, mixture planner,
    # coverage curve, prefix dedup
    "lsh_band_stats",
    "docs_source_profile",
    "corpus_mixture_plan",
    "text_vocab_coverage",
    "dedup_prefix",
    "embed_bucket_purity",
    # second round-5 session: mixture executor, containment pairs,
    # corpus card, per-dim embedding stats, ANN recall audit,
    # Q13 histogram, RFM, key-skew gauge
    "corpus_mixture_apply",
    "dedup_containment",
    "docs_corpus_card",
    "embed_dim_stats",
    "sim_ann_recall",
    "agg_count_histogram",
    "events_rfm",
    "agg_key_skew",
    # the Q17 decorrelated subquery + the clean->mixture->select
    # composed flagship
    "agg_correlated_scalar",
    "pipeline_mixture_manifest",
    # round 6: the five subquery/decorrelation shapes, BPE pair
    # counts (vocabulary-sized expansion claim), the mapInPandas
    # covariance partials (shuffle must stay O(partitions×d²))
    "join_groupagg_in",
    "join_disjunctive",
    "agg_global_share",
    "join_anti_scalar",
    "join_exists_chain",
    "text_bpe_pairs",
    "embed_covariance",
    # round 7: the iterated-MR graph family (edge-linear pagerank;
    # degree-bounded knn triangles — wedge volume must stay linear
    # in nodes), Q15/Q20 shapes, chunker (fan-out-linear), int8
    # quantization card (pure projection), threshold sweep (funnel
    # cost envelope)
    "graph_pagerank",
    "graph_knn_triangles",
    "agg_top_revenue",
    "join_nested_semi",
    "text_chunk_overlap",
    "embed_quantize_error",
    "dedup_threshold_sweep",
    "events_ohlc",
    # round 9: JSONL quarantine census (parse cost must stay
    # line-linear, shuffle a few rows) and the binary-payload md5
    # pass (narrow Arrow pipeline, zero exchange at any size)
    "jsonl_quarantine",
    "multimodal_payload_stats",
    # round 10: failure-class censuses (JSONL shapes + CSV partial
    # parse — both must stay line-linear with constant-row
    # shuffles), the two REAL codec legs (BMP + WAV: narrow Arrow
    # kernels, zero exchange), the frame index (bounded 1→N
    # fan-out), and the sampled recall audit (cost must scale with
    # the SAMPLE, not the corpus — the whole point of the key)
    "jsonl_quarantine_shapes",
    "csv_quarantine",
    "multimodal_decode_stats",
    "multimodal_audio_stats",
    "multimodal_frame_index",
    "sim_ann_recall_sampled",
    "multimodal_resize_plan",
    "join_volume_shipping",
    # round-7 growth block: the as-of pair's forward leg (union
    # timeline must stay join-free at 10×), the CDC family (MERGE =
    # one union-window shuffle; SCD2 = one window), the reshape melt
    # (narrow Expand, fan-out-linear), the graph structure card
    # (edge-linear), the hash reservoir (topk-per-group shape), the
    # covariance power iteration (corpus pass must stay
    # O(partitions×d²), iteration constant), the frame-clause window,
    # bitwise projection (narrow map), Q2 min-cost (filter-below-agg
    # broadcast semi must survive AQE at 10×), null-safe join
    # round-11 (driver r8): the stdlib-Avro census — decode cost must
    # stay byte-linear with a constant-row shuffle; at 10x the part
    # files grow 10x but the per-file decode is a single pass, and
    # parallelism stays per-file (the binaryFile unit, documented)
    "avro_census",
    # round-11 growth: multi-table LSH (2x bucket GEMMs — must stay
    # sub-quadratic like its single-table sibling), the per-dim
    # outlier gate (two corpus passes, both narrow), the drift grid
    # (vocab x sources bounded), the weighted sampler (pure map)
    "sim_ann_multitable",
    "embed_outlier_census",
    "text_source_drift",
    "sample_weighted_hash",
    # the PIT probe (union-timeline, must stay join-free and
    # event-linear at 10x) and the HLL accuracy audit (one scan)
    "join_point_in_time",
    "agg_approx_distinct_bound",
    "events_burst_detect",
    "events_funnel_timing",
    "join_asof_forward",
    "merge_upsert",
    "scd2_intervals",
    "unpivot_long",
    "graph_degree_stats",
    "sample_group_reservoir",
    "embed_top_eigen",
    "win_first_last",
    "fn_bitwise",
    "join_min_cost_supplier",
    "join_null_safe",
    "join_lateral_topk",
    "text_pii_census",
    "events_peak_concurrency",
    "multimodal_payload_dedup",
    "fn_url",
    "graph_reachability",
    # TPC-H report shapes: the lineitem-orders fact-fact joins must
    # hold under AQE at 10x (Q3/Q5/Q8/Q10), the Q6 fast path must
    # stay one codegen stage, Q14's broadcast must not flip
    "join_shipping_priority",
    "join_local_supplier",
    "join_market_share",
    "join_returned_items",
    "agg_forecast_revenue",
    "agg_promo_share",
    # TPC-H completion variants (Q12/Q9/Q16) + the interval-overlap
    # join (bin occupancy, never pair space), the continuous
    # quantile (one shuffle + per-group sort, same envelope as the
    # discrete twin), and the ORC cross-writer census (scan-linear,
    # constant-row shuffle)
    "join_late_shipments",
    "agg_nation_profit",
    "join_supplier_part_count",
    "agg_quantile_cont",
    "join_interval_overlap",
    "orc_census",
    # MRL truncation card: narrow per-row folds + |Ks|-row aggregate
    # — must stay scan-linear with a constant-size shuffle
    "embed_mrl_error",
    # nearest as-of (union timeline: must stay join-free, one user
    # exchange at 10×) and the partition-pruned census (pruned scan
    # cost tracks ONE partition, census shuffle constant)
    "join_asof_nearest",
    "scan_partition_prune",
    # calendar densification: left-edge explode, fan-out bounded by
    # span days — must stay join-free with one user exchange at 10×
    "events_gap_fill",
    # bounded-frame rolling median (O(frame) state per row) and the
    # first-occurrence cumulative distinct (both single-exchange)
    "win_rolling_median",
    "win_cum_distinct",
    # PQ assignment: broadcast codebook, M·K·len integer folds per
    # vector — must stay scan-linear with the two small exchanges
    "embed_pq_codes",
    # round-12 (driver r9) growth: the LSH recall audit (true-pair
    # side is the documented intrinsic pair-space gauge — expected
    # super-linear on pair space, never quadratic in docs), the
    # cluster-size ledger (rides the cached pairs + hybrid CC), the
    # per-label centroid drift (ONE explode into an integer
    # aggregate, labels×d rows after), the per-source JS divergence
    # (perplexity's broadcast shape), the Markov entropy rollup
    # (transition-matrix-sized after one window)
    "dedup_minhash_recall",
    "dedup_cluster_histogram",
    "embed_centroid_drift",
    "text_js_divergence",
    "events_markov_entropy",
    # bucketed fact-fact join: the zero-exchange SMJ claim must hold
    # at 10x (the bucketed write is the paid-once shuffle); the
    # staleness-bounded as-of must stay join-free/event-linear; the
    # quantile-sketch audit is one group sort next to one sketch pass
    "join_bucketed",
    "join_asof_tolerance",
    "agg_approx_quantile_bound",
    # round-10 session growth: the absence monitor (one user-keyed
    # window, alert-rate output — must stay event-linear at 10x),
    # the stream-interval twin (equi-carried pair space bounded by
    # the horizon; pair fan-out grows with per-user density, the
    # documented interval-join envelope), the reshape round-trip
    # (two-phase pivot agg + Expand, group-count-sized after the
    # first shuffle)
    "events_absence_monitor",
    "join_stream_interval",
    "pivot_roundtrip",
    # the MG heavy-hitters audit: per-shard state is CAP counters by
    # construction; cost must stay token-linear with a
    # shards x capacity shuffle
    "text_heavy_hitters_bound",
    # round-11 session growth: the leakage-safe split (rides the
    # cached pairs + CC — marginal cost must stay at one join + one
    # md5 map over docs), the compaction planner (census window —
    # metadata-sized at any corpus), and the unconverted-views anti
    # join (user-keyed equi shuffle; drop-at-first-match, so output
    # and state stay BELOW the inner twin's pair fan-out)
    "split_by_cluster",
    "compaction_plan",
    "events_views_unconverted",
    # the incremental (delta-vs-corpus) probe: work must scale with
    # the DELTA's band collisions, not the corpus pair space
    "dedup_incremental",
    # the range-partition planner: one histogram pass over the fact
    # table + a histogram-sized window — must stay key-linear
    "range_partition_plan",
    # delta-merge maintenance: three group-sized frames off one scan;
    # cost must track the scan, the merge stays group-sized
    "agg_delta_maintenance",
    # round-12 session growth: the stored-band-index delta probe
    # (index write is amortized — the timed run pays only the probe;
    # cost must track the delta like its session-cached twin) and the
    # shuffle-free PII scrub (pure narrow map: must scale with bytes)
    "dedup_incremental_indexed",
    "text_redact",
    # the greedy token-budget prefix: two-level distributed cumsum
    # over the per-doc frame — must stay doc-linear
    "corpus_token_budget",
    # IVF+PQ ADC audit: quantizer-frame broadcasts + cell-equi probe —
    # work must track Σ|Q_cell|x|cell|, never corpus²
    "sim_ann_adc_agreement",
    # round-13 session growth: multi-probe IVF — query side fans out
    # p=3 rows through the ONE cell-equi shuffle; work must track
    # Σ p·|Q_cell|×|cell| (≈3× single-probe), never corpus²
    "sim_ann_ivf_multiprobe",
    # the nprobe tuning ledger: composes multiprobe + the exact
    # brute-force ground truth — cost must track those two plans, the
    # ledger itself is 3 rows over K-per-query joins
    "sim_ann_ivf_recall",
    # the quantizer load-balance card: one broadcast GEMM + one
    # 16-group census — must stay scan-linear, output quantizer-sized
    "sim_ann_ivf_balance",
    # cross-modal coverage census: one id-keyed join of two
    # corpus-sized stores + a sources-sized census — must stay
    # join-linear with constant-row output
    "docs_embedding_coverage",
)


def materialize(spark, sf_dir: str, out_dir: str) -> None:
    docs = load_spread(spark, sf_dir, "documents")
    # crossJoin against a literal copy index replicates WITHOUT
    # reading the source 10 times
    copies = spark.range(COPIES).select(F.col("id").alias("__copy"))
    big_docs = (
        docs.crossJoin(F.broadcast(copies))
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000) * F.col("__copy"))
        .drop("__copy")
    )
    big_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    ev = load(spark, sf_dir, "events")
    big_ev = (
        ev.crossJoin(F.broadcast(copies))
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000) * F.col("__copy"))
        .withColumn("user_id", F.col("user_id") + F.lit(1_000_000) * F.col("__copy"))
        .drop("__copy")
    )
    big_ev.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    emb = load(spark, sf_dir, "embeddings")
    big_emb = (
        emb.crossJoin(F.broadcast(copies))
        .withColumn("vec_id", F.col("vec_id") + F.lit(10_000_000) * F.col("__copy"))
        .drop("__copy")
    )
    big_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    # orders + customer for the Q13 histogram and the key-skew gauge:
    # both keys shift per copy, so the join structure and the per-key
    # frequency profile replicate intact (10× keys, same skew shape)
    orders = load(spark, sf_dir, "orders")
    big_orders = (
        orders.crossJoin(F.broadcast(copies))
        .withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000) * F.col("__copy")
        )
        .withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(1_000_000) * F.col("__copy")
        )
        .drop("__copy")
    )
    big_orders.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    cust = load(spark, sf_dir, "customer")
    big_cust = (
        cust.crossJoin(F.broadcast(copies))
        .withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(1_000_000) * F.col("__copy")
        )
        .drop("__copy")
    )
    big_cust.write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")

    # lineitem + part for the Q17 correlated-subquery shape: partkey
    # shifts per copy so the per-part threshold structure replicates
    li = load(spark, sf_dir, "lineitem")
    big_li = (
        li.crossJoin(F.broadcast(copies))
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(10_000_000) * F.col("__copy")
        )
        .withColumn(
            "l_partkey", F.col("l_partkey") + F.lit(1_000_000) * F.col("__copy")
        )
        .drop("__copy")
    )
    big_li.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    part = load(spark, sf_dir, "part")
    big_part = (
        part.crossJoin(F.broadcast(copies))
        .withColumn(
            "p_partkey", F.col("p_partkey") + F.lit(1_000_000) * F.col("__copy")
        )
        .drop("__copy")
    )
    big_part.write.mode("overwrite").parquet(f"{out_dir}/part.parquet")

    # supplier is deliberately NOT key-shifted: l_suppkey doesn't
    # shift either, so each of the 100 suppliers simply owns 10× the
    # lineitems — the Q21 per-supplier fan-in grows while the
    # per-order self-join structure replicates copy-local
    load(spark, sf_dir, "supplier").write.mode("overwrite").parquet(
        f"{out_dir}/supplier.parquet"
    )
    # nation/region: pure dimensions, copied as-is (suppkey doesn't
    # shift, so s_nationkey→n_nationkey stays valid). Without these
    # the Q7 nation-grid and Q2 min-cost keys CRASH on the 10× dir —
    # a missing-table abort, observed, that previously cut the run
    # short at whichever op first read them.
    for dim in ("nation", "region"):
        load(spark, sf_dir, dim).write.mode("overwrite").parquet(
            f"{out_dir}/{dim}.parquet"
        )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ""
    # an empty/blank out_dir must fall back to a tempdir — f"{''}/x"
    # resolves to the FILESYSTEM ROOT (observed: one run littered /
    # with 10× fixture dirs before this guard)
    if not out_dir.strip():
        out_dir = tempfile.mkdtemp(prefix="stress10x_")
    ops = tuple(sys.argv[3:]) or OPS
    spark = get_spark(app_name="stress10x")
    catalog = load_catalog()

    t0 = time.time()
    materialize(spark, sf_dir, out_dir)
    print(json.dumps({"step": "materialize", "sec": round(time.time() - t0, 2)}))

    results = {}
    for name in ops:
        q = catalog[name]
        # baseline at sf0.1, then 10×; count() forces full execution
        tb = time.time()
        n_base = q.builder(spark, sf_dir).count()
        base_s = time.time() - tb
        tx = time.time()
        n_big = q.builder(spark, out_dir).count()
        big_s = time.time() - tx
        results[name] = {
            "base_rows": n_base,
            "base_sec": round(base_s, 2),
            "x10_rows": n_big,
            "x10_sec": round(big_s, 2),
            "growth": round(big_s / base_s, 1) if base_s > 0 else None,
        }
        print(json.dumps({name: results[name]}))

    print(
        json.dumps(
            {
                "summary": {
                    k: f"{v['x10_sec']}s @10x ({v['growth']}x time)"
                    for k, v in results.items()
                }
            }
        )
    )
    if out_dir.startswith(tempfile.gettempdir()):
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
