"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``supplier_performance_data_pipeline_spark``;
this file is a thin view over its query registry.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from supplier_performance_data_pipeline_spark.plans.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _last_checked_round() -> dict[str, int]:
    """Map query name -> latest round with a CORRECTNESS_r{N}.json row.

    Queries absent from every round file have never been driver-checked.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            continue
        for name in rows:
            last[name] = max(last.get(name, 0), rnd)
    return last


# Queries already registered before round 4. Within the never-checked
# tier these sort AHEAD of newer registrations: the round-3 board showed
# that a purely alphabetical tier lets a batch of new names push queries
# that already missed the driver's per-round sample cap (alphabetically
# late names like vocab_top_terms missed it two rounds running) past the
# cap again indefinitely. Seniority-first makes the wait bounded: a
# query can only be deferred by queries registered before it.
_PRE_R4 = frozenset({
    "ann_cosine_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_recall_at_10",
    "bigram_collocations", "bm25_top_terms", "bottom5_on_time",
    "brand_revenue_share", "brand_size_quantity_revenue",
    "chunk_dedup_stats", "corpus_curation_stats", "corpus_full_curation",
    "customer_order_distribution", "customer_returns_ranking",
    "customer_running_totals", "decontamination_report",
    "dedup_cluster_size_histogram", "dedup_components", "dedup_exact",
    "dedup_normalized", "discount_revenue_forecast", "distinct_countries",
    "distinct_users_per_type_salted", "doc_length_histogram",
    "document_chunks", "documents_hash_sample",
    "documents_stratified_sample", "dormant_high_value_customers",
    "embedding_centroid_confusion", "embedding_dim_stats",
    "embedding_label_centroids", "embedding_near_dup_pairs",
    "embedding_quantize_int8", "errors_recent_purchase_count",
    "events_asof_purchase_view", "events_cohort_retention",
    "events_hourly_anomalies", "events_hourly_rollup",
    "events_json_props", "events_partitioned_write_scan",
    "events_resample_ffill", "events_rolling_wau", "events_sessionize",
    "events_user_count_approx", "events_user_sketch_rollup",
    "events_view_purchase_funnel", "kmeans_cluster_sizes",
    "knn_join_top5", "kpi_tiles_filtered", "large_order_customers",
    "late_orders_by_priority", "lineitem_quality_report",
    "lineitem_range_layout_scan", "lineitem_scd2_point_in_time",
    "lineitem_table_fingerprint", "lsh_estimator_error",
    "lsh_near_dup_pairs", "minhash_signatures", "monthly_revenue_growth",
    "multimodal_byte_entropy", "multimodal_features",
    "multimodal_frame_sample", "nation_pair_trade_volume",
    "nation_revenue_share", "nation_set_ops", "near_dup_source_matrix",
    "ngram_jaccard_pairs", "ngram_novelty_scores", "npos_bounds",
    "order_delay_blame", "order_status_priority_pivot",
    "orders_grouping_sets", "orders_incremental_rollup_merge",
    "orders_lineitem_bucketed_join", "orders_priority_rollup",
    "orders_status_priority_cube", "orphan_checks", "packing_stats",
    "part_pair_affinity", "pii_scrub", "preview_suppliers",
    "pricing_summary", "priority_distinct_customers",
    "product_type_revenue_by_nation", "quality_weighted_sample",
    "quantity_kll_sketch_rollup", "quantity_percentiles_approx",
    "quantity_percentiles_by_flag", "repetition_metrics",
    "revenue_decile_shares", "risk_band_summary",
    "scalar_function_surface", "semdedup_cluster_prune",
    "shipping_priority", "simhash_hamming_pairs", "simhash_signatures",
    "small_order_revenue", "source_mixture_weights",
    "streaming_batch_equivalence", "streaming_dedup_equivalence",
    "supplier_bfs_reach", "supplier_csv_roundtrip", "supplier_kpis",
    "supplier_kpis_unpivot", "supplier_name_fuzzy_matches",
    "supplier_pagerank", "supplier_risk_display",
    "supplier_risk_summary", "supplier_scd2_history",
    "supplier_snapshot_upsert", "text_fingerprints", "text_profile",
    "tfidf_top_terms", "tokenizer_fertility_by_lang",
    "top10_risk_suppliers", "top3_suppliers_per_nation",
    "top_revenue_suppliers", "unigram_surprisal_scores",
    "vocab_top_terms", "weighted_reservoir_sample",
    "window_function_surface", "winsorized_price_stats",
})


def _rotation_order(names: list[str]) -> list[str]:
    """Least-recently-driver-checked first (never-checked lead, then by
    ascending last-checked round; within a tier, senior registrations
    before round-4+ additions, alphabetical last).

    The driver samples a bounded number of queries per round in
    ``queries()`` iteration order; this rotation guarantees every query
    gets a CORRECTNESS row within a couple of rounds instead of leaving
    a fixed tail permanently unsampled.
    """
    last = _last_checked_round()
    return sorted(
        names, key=lambda n: (last.get(n, -1), n not in _PRE_R4, n)
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core query — supplier KPIs from the 3-way join
    (reference: src/compute_kpis.py:24-74) — over the TPC-H→domain
    adapter.
    """
    specs = load_all()
    return specs["supplier_kpis"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    least-recently-driver-checked first (see ``_rotation_order``)."""
    specs = load_all()
    return {name: specs[name].build for name in _rotation_order(list(specs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only),
    in the same rotation order as ``queries()``."""
    specs = load_all()
    return {
        name: specs[name].oracle
        for name in _rotation_order(list(specs))
        if specs[name].oracle is not None
    }
