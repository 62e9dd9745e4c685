"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — name → (spark, sf_dir) -> DataFrame, one per implemented
operator from SURVEY.md §2.
``oracle_sql()`` — name → DuckDB-runnable ANSI SQL equivalent (omitted
for non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ecommerce_realtime_pipeline_spark.plans import dq, gen, kpi, llm, temporal
from ecommerce_realtime_pipeline_spark.plans.dq import DQ_ORACLES
from ecommerce_realtime_pipeline_spark.plans.gen import GEN_ORACLES
from ecommerce_realtime_pipeline_spark.plans.llm import LLM_ORACLES
from ecommerce_realtime_pipeline_spark.plans.oracles import KPI_ORACLES
from ecommerce_realtime_pipeline_spark.plans.sqlhints import materialize_all
from ecommerce_realtime_pipeline_spark.plans.temporal import TEMPORAL_ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top products by revenue
    (lineitem ⋈ broadcast(part) → partial-agg → top-k)."""
    return kpi.top_products_by_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    REGISTRATION ORDER IS THE DRIVER'S SAMPLING ORDER: the external
    harness checks the FIRST 50 registered queries per round, so the
    dict is ordered by verification need, not by topic —

    1. positions 1-50 (the round-8 window): the NEW settings-surface
       corruption sweep, then ALL 36 queries whose latest driver
       evidence is round 4 (the oldest in the repo), then 11 round-5
       rows chosen because round 7/8 touched their code paths (BM25
       index layout, IVF persistence, semdedup tie-break, dedup
       streams' journal stamp) plus the oldest docs/text block, the
       NEW ``docs_bm25_index_compacted`` row (build -> merge ->
       compact -> serve through the r8 manifest layout), and
       the ``emb_knn_ivf`` warmer re-registered BEFORE the persisted/
       PQ/semdedup dependents so the session artifact memo makes them
       cheap. After a green round 8, no query's driver evidence is
       older than round 5. Cheap analytics first; the streaming
       fixtures close the window so a wall-budget cut costs the
       fewest rows;
    2. positions 51+: driver-green rounds 5-7, ordered OLDEST
       EVIDENCE FIRST (remaining r5 block, then the r6 window, then
       the r7 window) so any future rotation can slice from the top.
    """
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # ---- positions 1-50: THE ROUND-8 CHECK WINDOW ----
        # NEW (r8): env->Settings->corrupt_batch at forced 1.0, analytic oracle
        "gen_corrupt_rates_sweep": gen.gen_corrupt_rates_sweep,
        # r4-era re-checks: cheap KPI aggregates first
        "top_customers_by_spend": kpi.top_customers_by_spend,
        "revenue_trend_daily": kpi.revenue_trend_daily,
        "revenue_trend_hourly_by_type": kpi.revenue_trend_hourly_by_type,
        "orders_per_minute": kpi.orders_per_minute,
        "order_status_distribution": kpi.order_status_distribution,
        "orders_status_pivot": kpi.orders_status_pivot,
        "revenue_rollup_region_nation": kpi.revenue_rollup_region_nation,
        "throughput_per_topic": kpi.throughput_per_topic,
        "customer_history": kpi.customer_history,
        "customer_running_totals": kpi.customer_running_totals,
        "order_value_percentiles": kpi.order_value_percentiles,
        "events_metrics_unpivot": kpi.events_metrics_unpivot,
        # r4-era funnels / sessions / cohorts
        "funnel_stage_counts": kpi.funnel_stage_counts,
        "funnel_conversion": kpi.funnel_conversion,
        "sessionization": kpi.sessionization,
        "sessionization_session_window": kpi.sessionization_session_window,
        "cohort_retention": kpi.cohort_retention,
        "repurchase_intervals": kpi.repurchase_intervals,
        # r4-era events family
        "events_sliding_window": kpi.events_sliding_window,
        "events_by_segment_salted": kpi.events_by_segment_salted,
        "events_type_transitions": kpi.events_type_transitions,
        "events_volume_anomalies": kpi.events_volume_anomalies,
        "events_value_outliers_per_type": kpi.events_value_outliers_per_type,
        "events_decayed_engagement": kpi.events_decayed_engagement,
        "events_asof_attribution": temporal.events_asof_attribution,
        "events_range_attribution": temporal.events_range_attribution,
        "events_bloom_semijoin": kpi.events_bloom_semijoin,
        # r4-era sketches
        "events_hll_users": kpi.events_hll_users,
        "events_cms_user_counts": kpi.events_cms_user_counts,
        "events_value_quantile_sketch": kpi.events_value_quantile_sketch,
        "events_heavy_hitters_mg": kpi.events_heavy_hitters_mg,
        # r4-era layout / top-k / graph
        "events_zorder_roundtrip": kpi.events_zorder_roundtrip,
        "top_products_per_nation": kpi.top_products_per_nation,
        "top_products_per_nation_heap": kpi.top_products_per_nation_heap,
        "market_basket_pairs": kpi.market_basket_pairs,
        "parts_copurchase_pagerank": kpi.parts_copurchase_pagerank,
        # oldest-r5 docs/text re-checks
        "docs_winnow_overlap": llm.docs_winnow_overlap,
        "docs_neardup_editdist": llm.docs_neardup_editdist,
        "docs_neardup_clusters_lss": llm.docs_neardup_clusters_lss,
        "docs_cluster_representatives": llm.docs_cluster_representatives,
        # r5 rows whose index layout changed in r8 (manifest segments)
        "docs_bm25_search": llm.docs_bm25_search,
        "docs_bm25_from_index": llm.docs_bm25_from_index,
        # NEW (r8): build -> merge -> compact -> serve, hash-gated
        "docs_bm25_index_compacted": llm.docs_bm25_index_compacted,
        # ANN: warmer populates the cell memo, then r8-touched dependents
        "emb_knn_ivf": llm.emb_knn_ivf,
        "emb_knn_ivf_persisted": llm.emb_knn_ivf_persisted,
        "emb_knn_ivfpq": llm.emb_knn_ivfpq,
        "emb_semdedup": llm.emb_semdedup,
        # streaming fixtures close the window (r8 journal-stamp change)
        "streaming_neardup_dedup": gen.streaming_neardup_dedup,
        "streaming_embdedup": gen.streaming_embdedup,
        # ---- positions 51+: driver-green r5-r7, oldest evidence first ----
        # NEW (r8, tail — rotate into the r9 window): tombstone-delete
        # serving with the documented stale-idf semantics, judge-sweep
        # gated this round
        "docs_bm25_index_deleted": llm.docs_bm25_index_deleted,
        # NEW (r8, tail — rotate into the r9 window): BM25 + cosine
        # reciprocal-rank fusion (hybrid retrieval)
        "docs_hybrid_search_rrf": llm.docs_hybrid_search_rrf,
        # latest driver evidence: round 5
        "docs_quality_lr": llm.docs_quality_lr,
        "docs_cluster_size_distribution": llm.docs_cluster_size_distribution,
        "docs_leakage_safe_split": llm.docs_leakage_safe_split,
        "docs_unigram_surprisal": llm.docs_unigram_surprisal,
        "docs_bigram_surprisal": llm.docs_bigram_surprisal,
        "docs_collocations": llm.docs_collocations,
        "docs_bpe_merges": llm.docs_bpe_merges,
        "docs_bpe_encode": llm.docs_bpe_encode,
        "docs_duplicate_spans": llm.docs_duplicate_spans,
        "vocab_top_terms": llm.vocab_top_terms,
        "docs_pii_redact": llm.docs_pii_redact,
        "docs_stratified_sample": llm.docs_stratified_sample,
        "docs_stratified_exact_k": llm.docs_stratified_exact_k,
        "docs_mixture_weights": llm.docs_mixture_weights,
        "docs_chunk_overlap": llm.docs_chunk_overlap,
        "docs_weighted_sample": llm.docs_weighted_sample,
        "docs_training_order": llm.docs_training_order,
        "customers_segment_drift": dq.customers_segment_drift,
        "revenue_cube": dq.revenue_cube,
        "emb_pq_codes": llm.emb_pq_codes,
        "emb_knn_pq": llm.emb_knn_pq,
        "emb_knn_ivf_refined": llm.emb_knn_ivf_refined,
        "emb_decontaminate": llm.emb_decontaminate,
        "emb_label_drift": llm.emb_label_drift,
        "emb_dim_reduce": llm.emb_dim_reduce,
        "mm_decode_image_stats": llm.mm_decode_image_stats,
        "mm_frame_stats": llm.mm_frame_stats,
        "mm_resize_stats": llm.mm_resize_stats,
        "mm_audio_stats": llm.mm_audio_stats,
        "mm_audio_decimate_stats": llm.mm_audio_decimate_stats,
        "streaming_windowed_kpi": gen.streaming_windowed_kpi,
        "streaming_attribution_join": gen.streaming_attribution_join,
        "streaming_funnel_cep": gen.streaming_funnel_cep,
        "streaming_continuous_agg": gen.streaming_continuous_agg,
        "streaming_hll_users": gen.streaming_hll_users,
        "streaming_cms_user_counts": gen.streaming_cms_user_counts,
        "monitoring_stats": gen.monitoring_stats,
        "pipeline_end_to_end": gen.pipeline_end_to_end,
        # latest driver evidence: round 6
        "shipping_priority": kpi.shipping_priority,
        "returned_items_report": kpi.returned_items_report,
        "promo_revenue_share": kpi.promo_revenue_share,
        "nation_market_share": kpi.nation_market_share,
        "order_priority_fulfillment": kpi.order_priority_fulfillment,
        "customer_rfm_segments": kpi.customer_rfm_segments,
        "customer_order_distribution": kpi.customer_order_distribution,
        "large_order_customers": kpi.large_order_customers,
        "dormant_customer_balance": kpi.dormant_customer_balance,
        "nation_supplier_hhi": kpi.nation_supplier_hhi,
        "nation_trade_flows": kpi.nation_trade_flows,
        "top_supplier_quarter": kpi.top_supplier_quarter,
        "discount_revenue_impact": kpi.discount_revenue_impact,
        "nation_yoy_growth": kpi.nation_yoy_growth,
        "events_view_to_purchase_asof": temporal.events_view_to_purchase_asof,
        "docs_distinctive_terms": llm.docs_distinctive_terms,
        "docs_source_overlap_matrix": llm.docs_source_overlap_matrix,
        "docs_curriculum_order": llm.docs_curriculum_order,
        "vocab_coverage": llm.vocab_coverage,
        "docs_zipf_fit": llm.docs_zipf_fit,
        "docs_exact_dedup": llm.docs_exact_dedup,
        "docs_dedup_yield_curve": llm.docs_dedup_yield_curve,
        "docs_neardup_minhash": llm.docs_neardup_minhash,
        "docs_bm25_index_merge": llm.docs_bm25_index_merge,
        "customer_value_deciles": kpi.customer_value_deciles,
        "orders_exact_quantiles_twopass": kpi.orders_exact_quantiles_twopass,
        "customers_snapshot_diff": dq.customers_snapshot_diff,
        "customers_incremental_agg": dq.customers_incremental_agg,
        "dedup_lineitem_latest": dq.dedup_lineitem_latest,
        "dq_metrics": dq.dq_metrics,
        "emb_label_outliers": llm.emb_label_outliers,
        "emb_knn_bruteforce": llm.emb_knn_bruteforce,
        "emb_knn_lsh": llm.emb_knn_lsh,
        "emb_ann_recall": llm.emb_ann_recall,
        "emb_hard_negatives": llm.emb_hard_negatives,
        "emb_recall_vs_probes": llm.emb_recall_vs_probes,
        "emb_knn_ivf_merged": llm.emb_knn_ivf_merged,
        "emb_cluster_quality": llm.emb_cluster_quality,
        "emb_quantize_int8": llm.emb_quantize_int8,
        "gen_batch_shape": gen.gen_batch_shape,
        "gen_corrupt_validate_metrics": gen.gen_corrupt_validate_metrics,
        "produce_envelopes_shape": gen.produce_envelopes_shape,
        "filesrc_quarantine_shape": gen.filesrc_quarantine_shape,
        "silver_compaction_report": gen.silver_compaction_report,
        "cdc_bucket_refresh": gen.cdc_bucket_refresh,
        "streaming_ingest_roundtrip": gen.streaming_ingest_roundtrip,
        "streaming_session_windows": gen.streaming_session_windows,
        "streaming_outer_attribution": gen.streaming_outer_attribution,
        "streaming_late_drop_stats": gen.streaming_late_drop_stats,
        # latest driver evidence: round 7
        "cheapest_supplier_per_part": kpi.cheapest_supplier_per_part,
        "product_profit_by_nation_year": kpi.product_profit_by_nation_year,
        "small_quantity_revenue": kpi.small_quantity_revenue,
        "disjunctive_promo_revenue": kpi.disjunctive_promo_revenue,
        "excess_volume_suppliers": kpi.excess_volume_suppliers,
        "waiting_orders_suppliers": kpi.waiting_orders_suppliers,
        "supplier_part_diversity": kpi.supplier_part_diversity,
        "shipping_delay_priority_split": kpi.shipping_delay_priority_split,
        "revenue_seasonality": kpi.revenue_seasonality,
        "events_key_skew_report": kpi.events_key_skew_report,
        "session_path_mining": kpi.session_path_mining,
        "parts_copurchase_triangles": kpi.parts_copurchase_triangles,
        "parts_dense_community": kpi.parts_dense_community,
        "events_markov_attribution": kpi.events_markov_attribution,
        "market_basket_rules": kpi.market_basket_rules,
        "docs_token_budget": llm.docs_token_budget,
        "docs_heldout_perplexity": llm.docs_heldout_perplexity,
        "mm_image_ahash_neardup": llm.mm_image_ahash_neardup,
        "emb_top_component": llm.emb_top_component,
        "emb_kmeans_refine": llm.emb_kmeans_refine,
        "emb_knn_graph_beam": llm.emb_knn_graph_beam,
        "emb_knn_same_label": llm.emb_knn_same_label,
        "docs_text_stats": llm.docs_text_stats,
        "docs_quality": llm.docs_quality,
        "docs_lang_id": llm.docs_lang_id,
        "docs_fingerprint_minhash": llm.docs_fingerprint_minhash,
        "docs_neardup_jaccard": llm.docs_neardup_jaccard,
        "docs_neardup_jaccard_cutoff": llm.docs_neardup_jaccard_cutoff,
        "docs_neardup_simhash": llm.docs_neardup_simhash,
        "docs_neardup_clusters": llm.docs_neardup_clusters,
        "docs_train_split": llm.docs_train_split,
        "docs_quality_filter": llm.docs_quality_filter,
        "docs_decontaminate": llm.docs_decontaminate,
        "docs_repetition": llm.docs_repetition,
        "docs_pack_sequences": llm.docs_pack_sequences,
        "mm_feature_summary": llm.mm_feature_summary,
        "revenue_grouping_sets": dq.revenue_grouping_sets,
        "set_ops_actors": dq.set_ops_actors,
        "emb_cosine_neardup": llm.emb_cosine_neardup,
        "emb_label_centroids": llm.emb_label_centroids,
        "top_products_by_revenue": kpi.top_products_by_revenue,
        "pricing_summary": kpi.pricing_summary,
        "revenue_by_nation": kpi.revenue_by_nation,
        "jsonb_adhoc": kpi.jsonb_adhoc,
        "dq_fk_orphans": dq.dq_fk_orphans,
        "dq_duplicate_keys": dq.dq_duplicate_keys,
        "dq_constraint_violations": dq.dq_constraint_violations,
        "order_total_reagg": dq.order_total_reagg,
        "streaming_dim_enrichment": gen.streaming_dim_enrichment,
    }
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (same column names/types/values) —
    one for EVERY queries() entry. Three oracle classes, each named at
    its definition: computed replicas (the ANN pipelines with LSH
    planes/quantizers inlined, the multimodal decode round-trip, the
    iterative algorithms as recursive/chained CTEs, the sketches whose
    ESTIMATES match bit-for-bit, the streaming HLL whose oracle
    re-derives the registers from first principles), analytic contract
    oracles (streaming fixtures whose outputs are paper-derivable
    constants), and two FROZEN-CONTRACT (golden) oracles for the
    seed-deterministic generator outputs (gen_corrupt_validate_metrics,
    streaming_ingest_roundtrip) — weaker than computed oracles but
    still a full value-hash gate, and double-pinned by pytest.
    """
    # AS MATERIALIZED on every non-recursive CTE: identical results,
    # but stops DuckDB re-inlining shared CTEs (the shingle self-joins)
    # and re-running them per RECURSIVE iteration (the CC oracles went
    # 12-14 s → <2 s; suite oracle time 77 s → ~25 s). See sqlhints.py.
    return materialize_all(
        {
            **KPI_ORACLES,
            **DQ_ORACLES,
            **LLM_ORACLES,
            **GEN_ORACLES,
            **TEMPORAL_ORACLES,
        }
    )
