"""Query registry — the engine's verified operator surface.

Every operator from SURVEY.md §2 (plus the large-scale-pipeline
extensions) registers here as a named query: a PySpark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, an
equivalent ANSI-SQL oracle string runnable by DuckDB on the same
parquet tables.  The driver hash-compares the two at sf=0.01.

Determinism contract (critical for the oracle hash match):
- All money/measure arithmetic goes through exact DECIMAL types, never
  floating-point aggregation (double summation order differs between
  Spark partial aggregates and the oracle → differing low bits).
- Averages are computed as integer/decimal division with explicit
  final casts so both engines round identically (no halfway cases).
- Any LIMIT/top-k orders by a unique tiebreaker.
- Columns are aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable:
    """Register a query; ``oracle`` is the DuckDB-SQL twin (or None
    for non-SQL-expressible ops → driver runs a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _tune_shuffle_width(spark: SparkSession) -> None:
    """Resize the session shuffle width to the machine, ONLY if the
    user never set it.

    The JVM SQLConf ``settings()`` map holds *explicitly set* entries
    only (defaults are absent), so a user who deliberately chose 200
    is distinguishable from the untouched default — their setting is
    respected.  The untouched 200 default is pure scheduling overhead
    at test scale (AQE coalesces reads but still materializes 200 map
    outputs, and streaming state stores get no AQE at all)."""
    import os as _os

    key = "spark.sql.shuffle.partitions"
    try:
        user_set = (
            spark._jsparkSession.sessionState().conf().settings().containsKey(key)
        )
    except Exception:  # non-JVM backends: fall back to value compare
        user_set = spark.conf.get(key, "200") != "200"
    if not user_set:
        spark.conf.set(key, str(min(_os.cpu_count() or 8, 64)))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the driver-provided parquet tables.

    ``events.ts`` is TIMESTAMP(MICROS) in the current testdata vintage
    (reads natively as ``timestamp_ntz``); older vintages stored
    TIMESTAMP(NANOS), which Spark reads as epoch-nanos BIGINT under
    ``spark.sql.legacy.parquet.nanosAsLong`` — normalize that case to
    TIMESTAMP_NTZ (µs) so downstream queries see one schema.
    """
    # The caller may hand us a vanilla session (e.g. the driver's
    # harness): this is the one hook every query passes through.
    _tune_shuffle_width(spark)
    if name == "events":
        # nanosAsLong is runtime-settable; harmless on µs-vintage data.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def _register_all() -> None:
    # Import side-effect populates QUERIES/ORACLES.
    from . import sketches  # noqa: F401
    from . import streaming_gate  # noqa: F401
    from . import advanced  # noqa: F401
    from . import analytics  # noqa: F401
    from . import framework_semantics  # noqa: F401
    from . import graph_scalar  # noqa: F401
    from . import pipeline_ops  # noqa: F401
    from . import tpch_extra  # noqa: F401
    from . import tpch_full  # noqa: F401
    from . import curation  # noqa: F401

# The external correctness gate checks at most the FIRST 50 registered
# queries per round, so iteration order is a verification budget,
# rotated STALEST-FIRST each round.  Round 14 head: (1) the one
# brand-new never-checked gate — pipeline_funnel_bpe, the BPE half of
# the config-driven tokenizer-family switch; (2) the gates whose CODE
# changed this round — both funnel gates (silver_vocab /
# silver_tokenized re-branched on var('tokenizer') + the new
# n_unsegmented column), the streaming admission gate (control plane
# factored into _adm_batch_artifacts/_adm_stream_admitted for the
# stream-slice scaling sweep), and the three unigram gates (the serve
# oracle's OOV LEFT JOIN fix + the _ulm_estep try/finally unpersist);
# (3) everything else ordered by LAST-DRIVER-CHECKED ROUND ascending,
# computed from the committed CORRECTNESS_r{1..13}.json ledger (ties
# alphabetical) — the whole list below is machine-generated from that
# ledger: the 6 remaining r8 names then the r9 block fill the window
# (37 of the 46 r9 names fit; the rest + the r10 block head
# round 15).  Everything past position 50 stays honest through the
# local full-registry PARITY sweep (tests/test_oracle_parity.py +
# committed PARITY_r{N}.json).  Names absent from the registry are
# ignored; registered names absent from this list keep registration
# order.
_PRIORITY: list[str] = [
    # (1) new in round 14 — never driver-checked
    "pipeline_funnel_bpe",
    # (2) code changed in round 14 (both funnel gates run the
    #     re-branched silver_vocab/silver_tokenized models +
    #     n_unsegmented; the admission gate was refactored into
    #     _adm_batch_artifacts/_adm_stream_admitted for the
    #     stream-slice sweep; the unigram serve ORACLE gained
    #     the OOV LEFT JOIN and _ulm_estep the try/finally
    #     unpersist — all three unigram gates re-gated)
    "pipeline_curation_funnel",
    "pipeline_funnel_incremental",
    "q_stream_funnel_admission",
    "text_unigram_lm_train",
    "text_unigram_tokenize",
    "q_stream_unigram_serve",
    # (3) stalest-first: last driver-checked in round 8
    "text_bpe_tokenize",
    "text_lm_backoff",
    "text_phrase_search",
    "text_phrase_serve",
    "text_pii_scrub",
    "text_vocab_growth",
    # (3) stalest-first: last driver-checked in round 9
    "dedup_exact",
    "dedup_simhash",
    "multimodal_avi_meta",
    "multimodal_bmp_meta",
    "multimodal_codec_psnr",
    "multimodal_h264ac8_meta",
    "multimodal_h264c_meta",
    "multimodal_h264cac8_meta",
    "multimodal_h264dc_meta",
    "multimodal_h264p8_meta",
    "multimodal_h264p_meta",
    "multimodal_h264part_meta",
    "multimodal_h264pr_meta",
    "multimodal_h264q_meta",
    "multimodal_h264sub_meta",
    "multimodal_wav_meta",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q_above_nation_average",
    "q_customers_without_orders",
    "q_dq_tests",
    "q_except_customers",
    "q_gold_aggregate",
    "q_intersect_custkeys",
    "q_lag_lead",
    "q_monthly_revenue",
    "q_quantiles",
    "q_range_frame_trailing",
    "q_region_rollup",
    "q_rollup_returnflag",
    "q_running_total",
    "q_salted_join",
    "q_scalar_functions",
    "q_status_matrix",
    "q_string_agg",
    "q_top_customers",
    "q_union_nations",
    "q_var_substitution",
    "q_window_rank",
    "text_phrase3_search",
    "text_phrase3_serve",
    "text_tfidf_topterms",
    # (3) stalest-first: last driver-checked in round 10
    "curation_domain_stats",
    "curation_pipeline_filter",
    "decontam_ngram",
    "dedup_cc_twophase",
    "dedup_connected_components",
    "dedup_incremental_batch",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_pipeline_survivors",
    "dedup_repeated_spans",
    "dedup_simhash_pairs",
    "dedup_span_dup_stats",
    "multimodal_avi_frames",
    "multimodal_bmp_resize",
    "multimodal_gif_meta",
    "multimodal_jpeg_meta",
    "multimodal_png_meta",
    "q_approx_distinct",
    "q_approx_percentile",
    "q_cdc_merge",
    "q_cdc_retirement",
    "q_cube_grouping",
    "q_event_funnel",
    "q_global_percentile_exact",
    "q_grouping_sets",
    "q_incremental_watermark",
    "q_profile_orders",
    "q_range_join_binned",
    "q_retention_cohorts",
    "q_silver_clean",
    "q_skew_profile",
    "q_stream_dedup_watermark",
    "sim_cosine_topk",
    "sim_ivf_kmeans_topk",
    "sim_ivf_topk",
    "sim_kmeans_blas",
    "sim_lsh_buckets",
    "text_gopher_quality",
    "text_quality_filter",
    "text_repetition_stats",
    # (3) stalest-first: last driver-checked in round 11
    "dedup_semantic_clusters",
    "dedup_winnow_candidates",
    "multimodal_adpcm_meta",
    "multimodal_features",
    "multimodal_mjpeg_meta",
    "multimodal_mp4_meta",
    "multimodal_mpeg_meta",
    "multimodal_ppm_meta",
    "q02_min_cost_supplier",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q11_important_parts",
    "q_snapshot_scd2",
    "q_source_csv_roundtrip",
    "q_source_freshness",
    "q_source_json_roundtrip",
    "q_source_orc_roundtrip",
    "q_stream_dedup_index",
    "q_stream_dsir",
    "q_stream_foreachbatch_upsert",
    "q_stream_html_extract",
    "q_stream_html_extract_dirty",
    "q_stream_knn_classifier",
    "q_stream_lr_serve",
    "q_stream_stream_join",
    "q_value_histogram",
    "q_winsorize_values",
    "samp_dsir",
    "samp_shuffle_order",
    "samp_temperature",
    "sim_kmeans_converged",
    "sim_knn_classify_auto",
    "sim_pq_adc_topk",
    "sim_pq_codes",
    "sim_pq_codes_blas",
    "text_chunk_windows",
    "text_html_extract",
    "text_html_extract_dirty",
    "text_knn_classifier",
    "text_lr_train",
    "text_lr_train_gopher",
    "text_quality_classifier",
    # (3) stalest-first: last driver-checked in round 12
    "multimodal_h264b_meta",
    "multimodal_h264bd_meta",
    "multimodal_h264ms_meta",
    "multimodal_h264msb_meta",
    "multimodal_h264td_meta",
    "multimodal_h264wb_meta",
    "multimodal_h264wi_meta",
    "multimodal_h264wp_meta",
    "q12_late_shipping",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_rich_no_orders",
    "q_asof_join",
    "q_json_metadata",
    "q_pivot_status",
    "q_sessionize_batch",
    "q_stream_countmin_merge",
    "q_stream_dedup",
    "q_stream_sessionize",
    "q_stream_static_join",
    "q_stream_windowed_counts",
    "q_unpivot_measures",
    "samp_stratified",
    "samp_weighted",
    "sim_centroid_sums",
    "sim_embedding_neardup",
    "sim_ivfpq_topk",
    "sim_kmeans",
    "sim_random_projection",
    "sketch_bloom_decontam",
    "sketch_countmin_tokens",
    "text_bpe_tokens",
    "text_fingerprint",
    "text_language_id",
    "text_rolling_fingerprint",
    # (3) stalest-first: last driver-checked in round 13
    "dedup_editdist_verify",
    "dedup_leakage_split",
    "dedup_span_extract",
    "dedup_span_trim",
    "graph_pagerank_tokens",
    "multimodal_audio_neardup",
    "multimodal_binaryfile_ingest",
    "multimodal_bmp_equalize",
    "multimodal_dhash_neardup",
    "multimodal_h264b8_meta",
    "multimodal_h264b8d_meta",
    "multimodal_h264b8s_meta",
    "multimodal_image_dedup_cc",
    "multimodal_scene_cuts",
    "multimodal_video_neardup",
    "multimodal_wav_frames",
    "pack_sequences",
    "q_cusum_changepoint",
    "q_incremental_aggregate",
    "q_mad_outliers",
    "q_stream_ann_route",
    "q_stream_bm25_serve",
    "q_stream_cusum",
    "q_stream_hdr_merge",
    "q_stream_hll_merge",
    "q_stream_image_dedup",
    "q_stream_mg_merge",
    "q_stream_pq_serve",
    "samp_reservoir",
    "samp_token_quota",
    "sim_bq_hamming_topk",
    "sim_sq8_topk",
    "sketch_bloom_join",
    "sketch_hdr_grouped",
    "sketch_hdr_quantiles",
    "sketch_hll_distinct",
    "sketch_kmv_overlap",
    "sketch_mg_heavyhitters",
    "text_bm25_serve",
    "text_bm25_topk",
    "text_bpe_learn",
    "text_token_freq",
    "text_token_stats",
    "text_tokenizer_compare",
]


def _reorder() -> None:
    global QUERIES, ORACLES
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    QUERIES = {n: QUERIES[n] for n in ordered}
    ORACLES = {n: ORACLES[n] for n in ordered if n in ORACLES}


_registered = False


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    global _registered
    if not _registered:
        _register_all()
        _reorder()
        _registered = True
    return QUERIES


def all_oracles() -> dict[str, str]:
    all_queries()
    return ORACLES
