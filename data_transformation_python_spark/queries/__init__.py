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
# rotated STALEST-FIRST each round.  Round 7: the seven NEW gates
# (inter-frame video, pinned-PSNR codec gate, H.264-in-MP4, IMA-ADPCM
# audio, IVF-PQ serving, Bloom decontamination, weighted sampling),
# then every gate
# whose code changed this round (the CMS left-join fix, the SemDeDup
# centroid fallback, the PPM tokenizer + MJPEG strf fixes), then the
# 41 stalest r4-era names no window has re-checked since round 4 —
# many sit on paths rewritten in r5/r6 (shingle rewrite, BLAS
# banding).  Six r4-era names (samp_reservoir, pack_sequences, text_pii_scrub, samp_token_quota,
# text_tfidf_topterms, multimodal_wav_meta — all pytest- and local-
# parity-pinned) overflow the 50-window this round and lead the r8
# rotation.  Everything past position 50 stays
# honest via the local DuckDB parity suite
# (tests/test_oracle_parity.py) and the committed PARITY_r{N}.json
# full-registry sweep.  Names absent from the registry are ignored;
# registered names absent from this list keep registration order.
_PRIORITY: list[str] = [
    # --- new gates this round ---
    "multimodal_mpeg_meta",
    "multimodal_codec_psnr",
    "multimodal_mp4_meta",
    "multimodal_adpcm_meta",
    "sim_ivfpq_topk",
    "sketch_bloom_decontam",
    "samp_weighted",
    # --- code changed this round (CMS estimate, SemDeDup, PPM, MJPEG) ---
    "sketch_countmin_tokens",
    "q_stream_countmin_merge",
    "dedup_semantic_clusters",
    "multimodal_ppm_meta",
    "multimodal_mjpeg_meta",
    # --- stalest: last driver-checked in the round-4 window ---
    "q_stream_windowed_counts",
    "q_stream_sessionize",
    "q_stream_dedup",
    "q_stream_static_join",
    "q_asof_join",
    "q_sessionize_batch",
    "sim_random_projection",
    "sim_kmeans",
    "sim_embedding_neardup",
    "text_token_stats",
    "text_language_id",
    "text_fingerprint",
    "text_token_freq",
    "multimodal_features",
    "text_bpe_tokens",
    "text_rolling_fingerprint",
    "dedup_winnow_candidates",
    "sim_centroid_sums",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q12_late_shipping",
    "q19_disjunctive_revenue",
    "q22_rich_no_orders",
    "q_pivot_status",
    "q_unpivot_measures",
    "q_json_metadata",
    "q02_min_cost_supplier",
    "q11_important_parts",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "samp_stratified",
    # overflow (position 51+): first in line for the r8 window
    "samp_reservoir",
    "pack_sequences",
    "text_pii_scrub",
    "samp_token_quota",
    "text_tfidf_topterms",
    "multimodal_wav_meta",
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
