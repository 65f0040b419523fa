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
# rotated STALEST-FIRST each round.  Round 9 head: (1) the eleven
# brand-new never-checked gates — the five H.264 rungs (inter
# residuals, fractional-pel, 16x8/8x16 partitions, P_8x8, the
# 8x4/4x8/4x4 sub-split ladder), DSIR batch + streaming, the kNN-vote
# classifier batch + streaming twins, the trigram phrase scan/serve
# pair; (2) the gates whose CODE
# or ORACLE changed this round — the PSNR gate (now 9 codecs × 48
# constants) and the whole H.264 family, since the shared decoder
# gained the inter-residual branches and the stats census a p16r key;
# (3) the STALEST entries, per the round-8 audit: multimodal_wav_meta
# and text_tfidf_topterms last driver-checked in round 4, then the
# r5-era names (dedup_exact, dedup_simhash, the frozen TPC-H shapes
# q01/q03/q04/q05/q06/q10, multimodal_avi_meta, multimodal_bmp_meta)
# and the r5 SQL/window/set-op/DQ tail that has sat past position 50
# since round 7.  The round-8 window (bm25/phrase serving, the
# cross-modal near-dup family, sketches, streaming twins) moves
# behind them — all just driver-checked, all still green in the local
# full-registry PARITY sweep, which is what keeps everything past
# position 50 honest (tests/test_oracle_parity.py + committed
# PARITY_r{N}.json).  Names absent from the registry are ignored;
# registered names absent from this list keep registration order.
_PRIORITY: list[str] = [
    # (1) new in round 9 — never driver-checked
    "multimodal_h264pr_meta",
    "multimodal_h264q_meta",
    "multimodal_h264part_meta",
    "multimodal_h264p8_meta",
    "multimodal_h264sub_meta",
    "samp_dsir",
    "q_stream_dsir",
    "text_knn_classifier",
    "q_stream_knn_classifier",
    "text_phrase3_search",
    "text_phrase3_serve",
    # (2) code/oracle changed in round 9 (shared H.264 decoder)
    "multimodal_codec_psnr",
    "multimodal_h264p_meta",
    "multimodal_h264ac8_meta",
    "multimodal_h264cac8_meta",
    "multimodal_h264c_meta",
    "multimodal_h264dc_meta",
    # (3) stalest: r4-era
    "multimodal_wav_meta",
    "text_tfidf_topterms",
    # r5-era
    "dedup_exact",
    "dedup_simhash",
    "multimodal_avi_meta",
    "multimodal_bmp_meta",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    # r5 SQL/window/set-op/DQ tail (past position 50 since round 7)
    "q_quantiles",
    "q_lag_lead",
    "q_salted_join",
    "q_range_frame_trailing",
    "q_monthly_revenue",
    "q_top_customers",
    "q_window_rank",
    "q_running_total",
    "q_rollup_returnflag",
    "q_union_nations",
    "q_intersect_custkeys",
    "q_except_customers",
    "q_customers_without_orders",
    "q_region_rollup",
    "q_above_nation_average",
    "q_status_matrix",
    "q_dq_tests",
    "q_gold_aggregate",
    "q_var_substitution",
    "q_string_agg",
    "q_scalar_functions",
    "text_quality_filter",
    "text_repetition_stats",
    "text_gopher_quality",
    "sim_lsh_buckets",
    "sim_cosine_topk",
    "q_stream_dedup_watermark",
    "q_silver_clean",
    "q_cdc_merge",
    "q_cdc_retirement",
    "q_incremental_watermark",
    "sim_ivf_topk",
    "sim_ivf_kmeans_topk",
    "sim_kmeans_blas",
    # round-8 window (just checked) and later: keep prior order
    "text_bm25_topk",
    "text_bm25_serve",
    "q_stream_bm25_serve",
    "text_phrase_search",
    "text_phrase_serve",
    "multimodal_dhash_neardup",
    "dedup_span_trim",
    "multimodal_image_dedup_cc",
    "multimodal_audio_neardup",
    "multimodal_video_neardup",
    "multimodal_binaryfile_ingest",
    "q_stream_image_dedup",
    "q_incremental_aggregate",
    "dedup_leakage_split",
    "sketch_bloom_join",
    "graph_pagerank_tokens",
    "multimodal_scene_cuts",
    "multimodal_bmp_equalize",
    "q_mad_outliers",
    "q_cusum_changepoint",
    "q_stream_cusum",
    "dedup_span_extract",
    "text_lm_backoff",
    "text_vocab_growth",
    "sketch_hdr_quantiles",
    "sketch_hdr_grouped",
    "q_stream_hdr_merge",
    "text_bpe_tokenize",
    "multimodal_wav_frames",
    "sketch_hll_distinct",
    "q_stream_hll_merge",
    "sketch_kmv_overlap",
    "sketch_mg_heavyhitters",
    "sim_sq8_topk",
    "text_bpe_learn",
    "q_stream_mg_merge",
    "sim_bq_hamming_topk",
    "dedup_editdist_verify",
    "q_stream_ann_route",
    "q_stream_pq_serve",
    "samp_reservoir",
    "pack_sequences",
    "text_pii_scrub",
    "samp_token_quota",
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
