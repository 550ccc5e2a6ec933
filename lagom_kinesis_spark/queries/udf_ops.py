"""UDF / UDAF / UDTF surface (SURVEY.md §2B last table).

These exist to prove the extension surface, with the standing warning
(mandate: "UDFs are the slow path"): row-at-a-time Python UDFs serialize per
row; pandas UDFs move Arrow batches (~10-100× faster); pure Column
expressions beat both. Each UDF's logic is deliberately SQL-expressible so
the DuckDB oracle can mirror it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import events_cte, r6
from lagom_kinesis_spark.registry import register


@register(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           round(CASE WHEN o_totalprice > 250000 THEN o_totalprice * 0.1
                      ELSE o_totalprice * 0.05 END, 6) AS fee
    FROM orders
    """,
    tags=("udf",),
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the documented slow path — kept off hot
    paths; here only to prove the surface)."""

    @F.udf(DoubleType())
    def fee(price: float) -> float:
        return round(price * (0.1 if price > 250000 else 0.05), 6)

    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", fee("o_totalprice").alias("fee"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id,
           round(sign(value) * ln(1 + abs(value)), 6) AS signed_log
    FROM events
    """,
    tags=("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow-batched signed log1p)."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def signed_log(v: pd.Series) -> pd.Series:
        return (np.sign(v) * np.log1p(np.abs(v))).round(6)

    e = load(spark, sf_dir, "events")
    return e.select("event_id", signed_log("value").alias("signed_log"))


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           round((value - AVG(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS zscore
    FROM events
    """,
    tags=("udf",),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user z-score normalization (oracle:
    the equivalent window SQL)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "zscore": ((pdf["value"] - mean) / sd).round(6),
            }
        )

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return e.groupBy("user_id").applyInPandas(
        normalize, "event_id long, user_id long, zscore double"
    )


@register(
    "udf_pandas_udaf",
    oracle="""
    SELECT event_type,
           round(SUM(value * (epoch_us(make_timestamp(epoch_ns(ts)//1000))//1000000 % 100 + 1))
                 / SUM(epoch_us(make_timestamp(epoch_ns(ts)//1000))//1000000 % 100 + 1), 6)
             AS weighted_avg
    FROM main.events GROUP BY event_type
    """,
    tags=("udf",),
)
def udf_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF via one-row-per-group applyInPandas: weighted average
    with a deterministic weight derived from the timestamp."""

    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["w"]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "weighted_avg": [round((pdf["value"] * w).sum() / w.sum(), 6)],
            }
        )

    e = load(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.unix_timestamp("ts") % 100 + 1).alias("w"),
    )
    return e.groupBy("event_type").applyInPandas(
        weighted, "event_type string, weighted_avg double"
    )


@register(
    "udtf_split_tokens",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_slice(string_split(lower(text), ' '), 1, 20) AS w
      FROM documents WHERE doc_id % 100 = 0
    )
    SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, w[u.i] AS token
    FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) u
    """,
    tags=("udf", "udtf"),
)
def udtf_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥3.5): table function exploding a document into
    (token, position) rows. Oracle: LATERAL unnest over the same first-20
    lowercased space-split tokens (DuckDB list_slice ≡ the [:20] cap)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, token string")
    class SplitTokens:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.lower().split(" ")[:20]):
                yield doc_id, i, tok

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 100 == 0)
    spark.udtf.register("split_tokens", SplitTokens)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT t.* FROM udtf_docs, LATERAL split_tokens(doc_id, text) t"
    )


@register(
    "udf_map_in_arrow",
    oracle="SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes FROM documents",
    tags=("udf", "arrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy sibling of mapInPandas — the Python
    function sees raw ``pyarrow.RecordBatch``es (no pandas conversion at
    all), the right interchange for columnar-native Python libraries
    (tokenizers, vectorized scorers) at scale. Computes UTF-8 byte
    lengths with Arrow compute kernels, never materializing Python
    objects per row."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def lengths(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(
                        pc.binary_length(
                            pc.cast(batch.column("text"), pa.binary())
                        ),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_bytes"],
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(lengths, "doc_id long, n_bytes long")


@register(
    "udf_pandas_iter",
    oracle="""
    SELECT doc_id, n_chars * 2 AS double_chars FROM documents
    """,
    tags=("udf", "pandas"),
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER): the variant for
    expensive per-worker initialization (model load, tokenizer build) —
    setup runs once per PARTITION, then streams Arrow batches through
    the same process, instead of paying init per batch like plain
    SCALAR. The fixture 'model' is a trivial doubler; the contract under
    test is the iterator batching shape."""
    @F.pandas_udf("long")
    def double_it(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        factor = 2  # expensive init would happen here, once per partition
        for s in batches:
            yield s * factor

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", double_it(F.col("n_chars")).alias("double_chars"))


@register(
    "udf_cogrouped_map",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
             event_type
      FROM events
    )
    SELECT p.user_id, p.event_id AS purchase_id,
           CAST((SELECT COUNT(*) FROM ev c
                 WHERE c.event_type = 'click' AND c.user_id = p.user_id
                   AND c.ts <= p.ts) AS BIGINT) AS clicks_before
    FROM ev p WHERE p.event_type = 'purchase'
    """,
    tags=("udf", "pandas", "streaming-adjacent"),
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped map (``groupBy().cogroup().applyInPandas``): TWO
    relations grouped on the same key arrive as a pandas-frame PAIR per
    key — the attribution pattern (purchases scored against each user's
    click history) that a plain grouped-map cannot express without a
    pre-join blowup. Per user: every purchase gets its count of
    clicks at-or-before it (numpy searchsorted over the sorted click
    times — vectorized, no per-row python).

    Scale: one shuffle per side on user_id (the cogroup key), Arrow
    transfer, per-key work linear in that key's rows; the oracle is the
    correlated-count phrasing Catalyst would de-correlate to the same
    per-user plan."""
    import numpy as np

    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )

    def attribute(cl: pd.DataFrame, pu: pd.DataFrame) -> pd.DataFrame:
        if pu.empty:
            return pd.DataFrame(
                {"user_id": [], "purchase_id": [], "clicks_before": []}
            ).astype({"user_id": "int64", "purchase_id": "int64",
                      "clicks_before": "int64"})
        ct = np.sort(cl["ts"].values) if len(cl) else np.array(
            [], dtype="datetime64[us]"
        )
        n_before = np.searchsorted(ct, pu["ts"].values, side="right")
        return pd.DataFrame(
            {
                "user_id": pu["user_id"].values,
                "purchase_id": pu["event_id"].values,
                "clicks_before": n_before.astype("int64"),
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            attribute, "user_id long, purchase_id long, clicks_before long"
        )
    )


@register(
    "udtf_polymorphic_prefix",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS tok0,
           string_split(text, ' ')[2] AS tok1,
           string_split(text, ' ')[3] AS tok2
    FROM documents
    """,
    tags=("udf", "udtf", "sql"),
)
def udtf_polymorphic_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC UDTF (Spark 4 ``analyze``): the output SCHEMA is
    computed at plan time from a constant argument — here the prefix
    width n decides how many token columns exist. This is the
    table-function contract static UDTFs (udtf_split_tokens) can't
    express: one function, schema per call site, fully resolved before
    execution so Catalyst prunes/pushes through it like any relation.
    The oracle spells out the n=3 instance with split-array indexing
    (out-of-range → NULL on both engines)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class PrefixTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"tok{i}", "string")
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(
                (toks[i] if i < len(toks) else None) for i in range(n)
            )

    spark.udtf.register("lks_prefix_tokens", PrefixTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok0, t.tok1, t.tok2
        FROM __udtf_docs d, LATERAL lks_prefix_tokens(d.text, 3) t
        """
    )


@register(
    "udf_arrow_optimized",
    oracle="""
    SELECT o_orderkey,
           concat(o_orderpriority, ':',
                  CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR))
             AS tagged
    FROM orders
    """,
    tags=("udf",),
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``, Spark 4): same
    row-at-a-time author experience as udf_python_scalar but the
    batch transport is Arrow (plans as ArrowEvalPython, not
    BatchEvalPython) — the zero-rewrite upgrade path for legacy pickle
    UDFs, sitting between them and fully vectorized pandas UDFs. Logic
    (floor, not round) is chosen to be rounding-mode-unambiguous across
    engines."""
    import math

    @F.udf("string", useArrow=True)
    def tag(prio: str, price: float) -> str:
        return f"{prio}:{math.floor(price)}"

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", tag("o_orderpriority", "o_totalprice").alias("tagged")
    )


@register(
    "udf_pandas_window_agg",
    oracle=events_cte(
        """
    SELECT event_id,
           round(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 6) AS pmean3
    FROM events
    """
    ),
    tags=("udf", "window"),
)
def udf_pandas_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF evaluated OVER A WINDOW (`pandas_udf(...).over(w)` with
    a bounded rows frame) — the remaining UDF placement after scalar /
    iter / grouped-map / cogrouped / UDAF / mapInArrow / UDTF: Spark
    ships each frame's slice to the Python worker as an Arrow batch
    (WindowInPandas). The function body is a plain float mean, so the
    oracle is the built-in AVG over the identical frame; the point under
    test is the placement, not the math.

    Scale: same exchange/sort as any user-keyed window; the Python cost
    is per-frame Arrow batches — bounded frames keep slices small. For a
    builtin-expressible body prefer AVG (JVM, codegen); this placement
    exists for logic builtins can't express."""
    import pandas as pd

    @F.pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return e.select(
        "event_id", r6(pmean(F.col("value")).over(w)).alias("pmean3")
    )
