"""Query registry: the t2 contract surface.

Every operator from SURVEY.md §2B is exposed as a named :class:`Query`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, a DuckDB oracle SQL string. ``__spark_entry__.py`` simply
re-exports this registry; tests iterate it differentially against DuckDB.

Determinism rules enforced by convention here (FIXTURES.md harness rules):
- alias every computed/aggregate column identically in Spark and SQL;
- round float outputs to 6 decimals on both engines (``helpers.r6``);
- large money sums go through exact decimal accumulation on both engines
  (``helpers`` money discipline) so the round-trip is bit-identical;
- pin sort ties with unique keys.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from lagom_kinesis_spark.session import tune

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    module: str = ""  # defining queries/* module (family), for sweep ordering


_REGISTRY: dict[str, Query] = {}

#: Queries executed since the last driver-side JVM GC nudge (see wrapped()).
_calls_since_gc = 0
_last_gc_at = 0.0


def _periodic_gc(spark: SparkSession, every: int = 16, min_interval_s: float = 45.0) -> None:
    """Nudge the JVM GC every ``every`` queries in a long single-session
    sweep. Spark's ContextCleaner only reclaims dead broadcasts / shuffle
    files / accumulators after a driver GC discovers the dead references —
    with a large heap and mostly-small queries, organic GCs are rare and
    JVM-side state accumulates across a 100+ query run (the round-1
    mid-suite degradation). Cost: ~0.1-0.3 s per nudge, amortized — the
    ``min_interval_s`` floor keeps fast back-to-back sweeps (the bench's
    best-of-2 loop) from paying it when nothing has had time to accumulate."""
    global _calls_since_gc, _last_gc_at
    import os as _os
    import time as _time

    # bench.py opts out: the nudge otherwise lands INSIDE a timed region on
    # whichever query hits the interval, polluting that query's number; the
    # bench performs the same nudge itself between queries, untimed.
    if _os.environ.get("SPARK_GRAFT_GC_NUDGE") == "0":
        return

    _calls_since_gc += 1
    now = _time.monotonic()
    if _calls_since_gc >= every and now - _last_gc_at >= min_interval_s:
        _calls_since_gc = 0
        _last_gc_at = now
        try:
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        except Exception:
            pass


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            # Operators may persist() intermediates (LSH shingles/buckets);
            # drop leftovers from earlier queries so sequential runs don't
            # accumulate executor-memory pressure.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            _periodic_gc(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(
            name,
            wrapped,
            oracle,
            tuple(tags),
            doc or (fn.__doc__ or ""),
            fn.__module__.rsplit(".", 1)[-1],
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return them."""
    import lagom_kinesis_spark.queries  # noqa: F401  (registers everything)

    return dict(_REGISTRY)


# --- Driver-sweep ordering -------------------------------------------------
#
# The driver gate verifies the FIRST ~50 queries of queries() per round, so
# iteration order is the verification scoreboard. Priority:
#   1. _NEEDS_REROW: queries whose latest driver row is a failure that has
#      since been fixed locally (r1 array-canon fixes; r2 events-ts fixes) —
#      a green re-row is the proof the fix landed.
#   2. Never-driver-sampled queries, round-robin across defining modules so
#      every remaining family (windows/relational/analytics/timeseries/
#      behavior/graph/streaming/...) gets rows even in a truncated sweep.
#   3. Queries already driver-green (r1 ∪ r2), lowest value to re-check.

#: Queries whose driver evidence is stale or newly upgraded, so a fresh
#: driver row is the proof (r4): the three events-scalar queries whose only
#: green rows are r1 — before the round-2 events.ts µs fixture swap — and
#: sim_ann_ivf, whose check was upgraded this round from rows-only to an
#: exact SQL oracle over a deterministic recall summary.
_NEEDS_REROW: tuple[str, ...] = (
    "fn_datetime_extended",
    "fn_json",
    "fn_json_variant",
    "sim_ann_ivf",
)

#: Every query with a driver row in CORRECTNESS_r01 ∪ r02 ∪ r03 (133 names).
_DRIVER_SAMPLED: frozenset[str] = frozenset(
    _NEEDS_REROW
    + (
        # r3 sweep (CORRECTNESS_r03.json): 50 rows, all green.
        "agg_collect_sorted", "agg_hll_intersection", "agg_hll_sketch_union",
        "agg_linear_regression", "agg_mode_deterministic",
        "behavior_anomaly_zscore", "behavior_cohort_retention",
        "behavior_funnel_conversion", "decontaminate_bloom_prefilter",
        "fn_array", "fn_array_gen", "fn_explode_outer", "fn_map",
        "fn_try_safe", "fn_url_parse",
        "flagship_revenue_by_nation", "graph_degree_stats", "graph_pagerank",
        "join_salted_skew", "pii_mask_digits", "proj_computed",
        "q_forecast_revenue", "q_order_priority", "q_volume_shipping",
        "sample_bernoulli", "scan_parquet_pushdown", "sql_lateral_topn",
        "stream_hll_distinct_users", "stream_hll_windowed_distinct",
        "stream_session_window", "stream_sliding_window",
        "stream_stream_join", "stream_tumbling_window",
        "stream_watermark_dedup", "text_cms_heavy_hitters", "ts_gapfill_locf",
        "ts_ohlc_resample", "udf_grouped_map", "udf_pandas_scalar",
        "udf_pandas_udaf", "win_lag_lead", "win_ntile_dist",
        "win_rank_family",
        # r1 ∪ r2 rows.
        "agg_approx_count_distinct", "agg_bool", "agg_conditional",
        "agg_count_distinct_multi", "agg_cube", "agg_global",
        "agg_grouping_sets", "agg_having", "agg_min_by_max_by",
        "agg_percentile", "agg_percentile_approx", "agg_pivot",
        "agg_pricing_summary", "agg_rollup", "agg_salted_skew",
        "agg_stats_moments", "agg_unpivot", "decontaminate_ngram_overlap",
        "dedup_clusters", "dedup_embedding_cosine", "dedup_exact",
        "dedup_fingerprint", "dedup_jaccard_pairs", "dedup_minhash_lsh",
        "dedup_passage_chunks", "dedup_prefix_filter_join", "dedup_simhash",
        "emb_centroid_distance", "emb_power_iteration_pc1",
        "emb_quantize_int8", "fn_bitwise", "fn_cast", "fn_conditional",
        "fn_datetime", "fn_datetime_extended", "fn_hash", "fn_json",
        "fn_json_variant", "fn_math", "fn_string", "fn_string_distance",
        "fn_struct", "join_broadcast_dims", "join_cross", "join_full_outer",
        "join_inner", "join_left_anti", "join_left_outer", "join_left_semi",
        "join_multiway", "join_right_outer", "join_self_pairs",
        "join_theta_band", "join_theta_pure", "mix_source_quota",
        "mix_temperature_sample", "multimodal_decode_features",
        "multimodal_frame_sample", "multimodal_meta",
        "multimodal_resize_plan", "pack_context_windows",
        "pipeline_corpus_filter", "pipeline_pretrain_corpus",
        "q_returned_items", "q_shipping_priority", "sample_stratified_hash",
        "sample_weighted_threshold", "sim_ann_ivf", "sim_ann_lsh",
        "sim_range_search", "sim_topk_cosine", "sql_correlated_subquery",
        "sql_cte_chain", "text_bigrams", "text_feature_hashing",
        "text_lang_share", "text_langid", "text_length_outliers",
        "text_quality", "text_repetition_ratio", "text_tfidf",
        "text_token_count_regex", "text_top_tokens", "text_unigram_logprob",
        "text_winnow_fingerprint", "text_word_entropy", "udf_map_in_arrow",
        "udf_pandas_iter", "udf_python_scalar", "udtf_split_tokens",
    )
)


#: Queries added mid-round-4, AFTER the round's ~50-slot sweep plan was
#: locked against the 66 then-never-sampled names: they queue behind that
#: backlog (still ahead of already-green rows) so a new registration can't
#: displace a planned verification slot within the same round.
_DEFER_NEW: tuple[str, ...] = (
    "graph_triangle_count",
    "dedup_source_overlap_matrix",
    "stream_histogram_quantile",
    "dedup_cdc_chunks",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "ts_ewma_trailing",
    "text_bigram_logprob",
    "join_asof_tolerance",
)


def driver_order(registry: dict[str, Query]) -> list[str]:
    """Sweep order per the priority above (stable within each tier)."""
    rerow = [n for n in _NEEDS_REROW if n in registry]
    fresh = [
        n for n in registry
        if n not in _DRIVER_SAMPLED
        and n not in _NEEDS_REROW
        and n not in _DEFER_NEW
    ]
    # Round-robin the fresh tier across modules for family coverage.
    by_module: dict[str, list[str]] = {}
    for n in fresh:
        by_module.setdefault(registry[n].module, []).append(n)
    interleaved: list[str] = []
    lanes = list(by_module.values())
    i = 0
    while lanes:
        lane = lanes[i % len(lanes)]
        interleaved.append(lane.pop(0))
        if not lane:
            lanes.remove(lane)
        else:
            i += 1
    deferred = [n for n in _DEFER_NEW if n in registry]
    green = [n for n in registry if n in _DRIVER_SAMPLED and n not in _NEEDS_REROW]
    return rerow + interleaved + deferred + green


def queries_dict() -> dict[str, QueryFn]:
    qs = all_queries()
    return {name: qs[name].fn for name in driver_order(qs)}


def oracle_dict() -> dict[str, str]:
    qs = all_queries()
    return {
        name: qs[name].oracle
        for name in driver_order(qs)
        if qs[name].oracle is not None
    }
