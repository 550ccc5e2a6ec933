"""Scalar function families (SURVEY.md §2B "Scalar functions") — one
representative query per family, every expression JVM-side (whole-stage
codegen; no Python in the hot path).

Cross-engine notes baked into the oracles:
- DuckDB has no ``initcap`` → emulated for single-word inputs.
- DuckDB ``regexp_replace`` is first-match by default → 'g' flag.
- DuckDB ``dayofweek`` is 0=Sunday vs Spark 1=Sunday → +1.
- DuckDB ``epoch()`` is DOUBLE → ``epoch_us(...)//1000000`` for exact longs.
- DuckDB ``map[k]`` yields a 1-element list → ``[1]`` extract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import events_cte, r6
from lagom_kinesis_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_brand) AS lo,
           trim(concat('  ', p_brand, '  ')) AS trimmed,
           substring(p_name, 1, 5) AS sub5,
           concat_ws('|', p_brand, p_type) AS joined,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           split_part(p_name, ' ', 1) AS first_tok,
           regexp_extract(p_name, '^(\\w+)', 1) AS rex_tok,
           regexp_replace(p_name, 'widget', 'gadget', 'g') AS replaced,
           upper(substring(lower(p_type), 1, 1)) || substring(lower(p_type), 2)
             AS type_initcap
    FROM part
    """,
    tags=("scalar", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/trim/substring/concat_ws/length/lpad/
    split/regexp_extract/regexp_replace/initcap."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.concat_ws("|", "p_brand", "p_type").alias("joined"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.split("p_name", " ").getItem(0).alias("first_tok"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("rex_tok"),
        F.regexp_replace("p_name", "widget", "gadget").alias("replaced"),
        F.initcap("p_type").alias("type_initcap"),
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(epoch_us(o_orderdate)//1000000 AS BIGINT) AS unix_sec,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS as_date
    FROM orders WHERE o_orderkey <= 5000
    """,
    tags=("scalar", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: year/month/dayofweek/date_trunc/datediff/date_add/
    last_day/unix_timestamp/to_date."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff("o_orderdate", F.lit("1995-01-01")).alias("days_since"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.last_day("o_orderdate").alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("as_date"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 7, 2) AS div_round,
           abs(l_discount - l_tax) AS abs_diff,
           CAST(ceil(l_quantity / 3) AS BIGINT) AS ceil3,
           CAST(floor(l_quantity / 3) AS BIGINT) AS floor3,
           pow(l_quantity, 2) AS qty_sq,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           CAST(l_orderkey % 7 AS BIGINT) AS pmod7,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS qty_sign
    FROM lineitem WHERE l_orderkey <= 5000
    """,
    tags=("scalar", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/ceil/floor/pow/sqrt/ln/log10/pmod/sign."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 5000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 2).alias("div_round"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 3).alias("ceil3"),
        F.floor(F.col("l_quantity") / 3).alias("floor3"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        r6(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        r6(F.log("l_extendedprice")).alias("price_ln"),
        r6(F.log10("l_extendedprice")).alias("price_log10"),
        F.pmod("l_orderkey", F.lit(7)).cast("bigint").alias("pmod7"),
        F.signum(F.col("l_quantity") - 25).alias("qty_sign"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'big'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_pending,
           NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio_or_null,
           least(o_totalprice, 50000.0) AS capped,
           greatest(o_totalprice, 100000.0) AS floored
    FROM orders
    """,
    tags=("scalar", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: when/otherwise, coalesce, nullif, least, greatest."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "big")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_or_pending"
        ),
        F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")).alias("prio_or_null"),
        F.least("o_totalprice", F.lit(50000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floored"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_2dec,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(o_custkey AS DOUBLE) AS cust_dbl,
           CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS ts_roundtrip,
           CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num
    FROM orders
    """,
    tags=("scalar", "cast"),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family: double↔decimal, int↔string, string↔timestamp."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price_2dec"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_custkey").cast("double").alias("cust_dbl"),
        F.col("o_orderdate").cast("string").cast("timestamp").alias("ts_roundtrip"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           coalesce(array_to_string(list_transform(list_slice(embedding, 1, 4),
             x -> CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) AS VARCHAR)),
             ','), '') AS head4,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)
             AS total,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           len(list_distinct(embedding)) AS n_distinct,
           coalesce(array_to_string(
             list_transform(list_slice(list_sort(embedding), 1, 3),
             x -> CAST(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) AS VARCHAR)),
             ','), '') AS smallest3
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order transform/filter/aggregate — all
    JVM-side lambda expressions, no UDF.

    Array-valued outputs are serialized to comma-joined DECIMAL(18,6)
    strings on both engines (harness canon cannot hash ndarray cells;
    fixed-scale decimal rendering is identical on both — no scientific
    notation drift)."""
    e = load(spark, sf_dir, "embeddings")
    dbl = lambda x: x.cast("double")  # noqa: E731
    d6s = lambda x: F.round(dbl(x), 6).cast("decimal(18,6)").cast("string")  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_join(F.transform(F.slice("embedding", 1, 4), d6s), ",").alias("head4"),
        r6(dbl(F.array_max("embedding"))).alias("max_val"),
        r6(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + dbl(x)
            )
        ).alias("total"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.size(F.array_distinct("embedding")).alias("n_distinct"),
        F.array_join(F.transform(F.slice(F.sort_array("embedding"), 1, 3), d6s), ",")
        .alias("smallest3"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT c_custkey,
           coalesce(array_to_string(
             map_keys(MAP {'seg': c_mktsegment, 'name': c_name}), ','), '') AS ks,
           MAP {'seg': c_mktsegment, 'name': c_name}['seg'][1] AS seg_val,
           MAP {'bal': c_acctbal}['bal'][1] AS bal_val
    FROM customer
    """,
    tags=("scalar", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: create_map / map_keys / element_at. The key list is
    serialized to a comma-joined string on both engines (harness canon
    cannot hash ndarray cells)."""
    c = load(spark, sf_dir, "customer")
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"), F.lit("name"), F.col("c_name")
    )
    return c.select(
        "c_custkey",
        F.array_join(F.map_keys(m), ",").alias("ks"),
        F.element_at(m, "seg").alias("seg_val"),
        F.element_at(F.create_map(F.lit("bal"), F.col("c_acctbal")), "bal").alias(
            "bal_val"
        ),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT s_suppkey,
           (struct_pack(k := s_suppkey, nat := s_nationkey)).k AS sk,
           (struct_pack(k := s_suppkey, nat := s_nationkey)).nat + 100 AS nat_plus
    FROM supplier
    """,
    tags=("scalar", "struct"),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: pack + dot access (fields extracted for comparison —
    raw structs are never output, engines disagree on row shape)."""
    s = load(spark, sf_dir, "supplier")
    packed = F.struct(F.col("s_suppkey").alias("k"), F.col("s_nationkey").alias("nat"))
    return s.select(
        "s_suppkey",
        packed.getField("k").alias("sk"),
        (packed.getField("nat") + 100).alias("nat_plus"),
    )


@register(
    "fn_json",
    oracle=events_cte(
        """
    SELECT event_id,
           CAST(props->>'k' AS INT) AS k_get,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_extract
    FROM events
    """
    ),
    tags=("scalar", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: get_json_object + from_json on events.props."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_get"),
        parsed.getField("k").alias("k_extract"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha2-256 (cross-checkable); xxhash64 is used
    engine-internally for shuffle-free fingerprints but has no DuckDB
    counterpart (tests/test_operators.py covers it rows-only)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
    )


@register(
    "fn_array_gen",
    oracle="""
    SELECT s_suppkey,
           coalesce(array_to_string(range(1, s_nationkey + 2), ','), '')
             AS seq_to_nation,
           len(flatten([[s_suppkey], [s_nationkey, s_suppkey]])) AS flat_len,
           [s_suppkey, NULL][2] AS null_elem
    FROM supplier
    """,
    tags=("scalar", "array"),
)
def fn_array_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array generation family: sequence, flatten, explicit-null elements
    (DuckDB range(a,b) is end-exclusive; Spark sequence(a,b) inclusive —
    bounds adjusted so both emit 1..s_nationkey+1). The generated sequence
    is serialized to a comma-joined string on both engines (harness canon
    cannot hash ndarray cells)."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.col("s_nationkey") + 1),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("seq_to_nation"),
        F.size(
            F.flatten(
                F.array(
                    F.array(F.col("s_suppkey")),
                    F.array(F.col("s_nationkey").cast("long"), F.col("s_suppkey")),
                )
            )
        ).alias("flat_len"),
        F.element_at(F.array(F.col("s_suppkey"), F.lit(None).cast("long")), 2).alias(
            "null_elem"
        ),
    )


@register(
    "fn_json_variant",
    oracle=events_cte(
        """
    SELECT event_id, CAST(props->>'k' AS INT) AS k_variant
    FROM events WHERE CAST(props->>'k' AS INT) > 50
    """
    ),
    tags=("scalar", "json", "variant"),
)
def fn_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType JSON path: parse_json → variant_get — the
    shredding-friendly successor to string-typed JSON columns (binary
    variant encoding, no per-access re-parse at scale)."""
    e = load(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id", F.variant_get("v", "$.k", "int").alias("k_variant")
    ).filter(F.col("k_variant") > 50)


@register(
    "fn_datetime_extended",
    oracle=events_cte(
        """
    SELECT event_id,
           CAST(week(ts) AS INT) AS iso_week,
           CAST(quarter(ts) AS INT) AS qtr,
           CAST(ts + INTERVAL 3 MONTH AS DATE) AS plus3mo,
           CAST(hour(ts) AS INT) AS hh,
           CAST(minute(ts) AS INT) AS mi,
           CAST(second(ts) AS INT) AS ss
    FROM events
    """
    ),
    tags=("scalar", "datetime"),
)
def fn_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date/time family: ISO week, quarter, add_months (both
    engines clamp month-end identically), hour/minute/second extraction."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.weekofyear("ts").alias("iso_week"),
        F.quarter("ts").alias("qtr"),
        F.add_months("ts", 3).alias("plus3mo"),
        F.hour("ts").alias("hh"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("ss"),
    )


@register(
    "fn_string_distance",
    oracle="""
    WITH pairs AS (
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             a.p_name AS name_a, b.p_name AS name_b
      FROM part a JOIN part b
        ON a.p_partkey < b.p_partkey
       AND a.p_brand = b.p_brand AND a.p_partkey % 7 = 0 AND b.p_partkey % 7 = 0
    )
    SELECT key_a, key_b, levenshtein(name_a, name_b) AS edit_dist
    FROM pairs WHERE levenshtein(name_a, name_b) <= 6
    """,
    tags=("scalar", "string", "dedup"),
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match pairs (levenshtein ≤ 6) within brand blocks —
    the string-distance verify step of entity-resolution pipelines; the
    brand equi-key keeps the pairing blocked, never all-pairs."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"),
    )
    return (
        a.join(b, ["brand"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 6)
        .select("key_a", "key_b", "edit_dist")
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS keys_xor,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS popcount,
           CAST(o_custkey << 3 AS BIGINT) AS shifted_up,
           CAST(o_orderkey >> 4 AS BIGINT) AS shifted_down
    FROM orders
    """,
    tags=("scalar", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR, popcount, shifts — the primitives behind
    the engine's SimHash banding and bucket keys."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("o_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("o_orderkey").bitwiseXOR(F.col("o_custkey")).alias("keys_xor"),
        F.bit_count("o_orderkey").alias("popcount"),
        F.shiftleft("o_custkey", 3).alias("shifted_up"),
        F.shiftright("o_orderkey", 4).alias("shifted_down"),
    )


@register(
    "fn_explode_outer",
    oracle="""
    WITH hits AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), t -> t = 'spark') AS toks
      FROM documents
    )
    SELECT doc_id, unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END)
             AS tok
    FROM hits
    """,
    tags=("scalar", "array", "generator"),
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer`` null-preserving generator semantics: documents with
    no matching token still emit one row with a NULL token (inner
    ``explode`` would drop them — the LEFT JOIN LATERAL contract). The
    oracle states the same semantics explicitly: an empty list becomes
    ``[NULL]`` before unnest."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t == "spark")
    return d.select("doc_id", F.explode_outer(toks).alias("tok"))


@register(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/', lang, '/',
                    CAST(doc_id AS VARCHAR), '?id=', CAST(doc_id AS VARCHAR),
                    '&page=2') AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1) AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]id=([^&]*)', 1) AS query_id,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol
    FROM u
    """,
    tags=("scalar", "string"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: ``parse_url`` HOST / PATH / QUERY-param /
    PROTOCOL over a URL synthesized from document metadata (the fixture
    carries no URL column). JVM-side expression, no UDF; the oracle
    re-derives each part with anchored regexes."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?id="),
        F.col("doc_id").cast("string"),
        F.lit("&page=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("query_id"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "fn_try_safe",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                         THEN CAST(o_totalprice AS VARCHAR)
                         ELSE o_orderpriority END AS DOUBLE) AS maybe_price,
           round(o_totalprice / nullif(o_orderkey % 5, 0), 6) AS per_bucket,
           TRY_CAST(CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-date'
                         ELSE '2024-03-01 12:00:00' END AS TIMESTAMP) AS maybe_ts
    FROM orders
    """,
    tags=("functions", "safety"),
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_-family error-safe evaluation — the dirty-data discipline every
    large-scale ingest needs (a single malformed cell must NULL out, not
    kill a 1000-executor stage): try_cast over mixed numeric/garbage
    strings, try_divide with embedded zeros, try_to_timestamp over
    malformed literals. All JVM-side expressions; ANSI-safe on both
    engines (DuckDB TRY_CAST / nullif mirror)."""
    o = load(spark, sf_dir, "orders")
    mixed = F.when(
        F.col("o_orderkey") % 3 == 0, F.col("o_totalprice").cast("string")
    ).otherwise(F.col("o_orderpriority"))
    ts_str = F.when(F.col("o_orderkey") % 7 == 0, F.lit("not-a-date")).otherwise(
        F.lit("2024-03-01 12:00:00")
    )
    return o.select(
        "o_orderkey",
        F.expr(
            "try_cast(CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_totalprice AS string) "
            "ELSE o_orderpriority END AS double)"
        ).alias("maybe_price"),
        r6(F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5)).alias(
            "per_bucket"
        ),
        F.expr(
            "try_to_timestamp(CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-date' "
            "ELSE '2024-03-01 12:00:00' END)"
        ).alias("maybe_ts"),
    )


@register(
    "fn_regexp_extended",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[aeiou]{2,}')) AS n_vowel_runs,
           nullif(regexp_extract(lower(text), '[aeiou]{3,}'), '') AS first_triple,
           len(regexp_extract_all(text, '[A-Z][a-z]+')) AS n_capitalized
    FROM documents
    """,
    tags=("functions", "regexp"),
)
def fn_regexp_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended regexp family beyond LIKE/RLIKE: regexp_extract_all +
    regexp_count (JVM regex, codegen'd) and regexp_substr with its
    no-match→NULL contract (DuckDB's '' sentinel is nullif-normalized to
    the same semantics). Patterns are engine-portable (no lookarounds,
    no anchors) so Java regex and RE2 agree."""
    d = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit("[aeiou]{2,}"), 0)).alias(
            "n_vowel_runs"
        ),
        F.regexp_substr(low, F.lit("[aeiou]{3,}")).alias("first_triple"),
        F.regexp_count(F.col("text"), F.lit("[A-Z][a-z]+")).alias("n_capitalized"),
    )


@register(
    "fn_printf_format",
    oracle="""
    SELECT s_suppkey,
           printf('SUP-%05d', s_suppkey) AS sup_code,
           printf('%s/%d', s_name, s_nationkey) AS name_nation,
           lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded
    FROM supplier
    """,
    tags=("functions", "string"),
)
def fn_printf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting (format_string) + lpad — the key/code
    synthesis idiom for surrogate identifiers. Integer/string conversions
    only (no locale-dependent float formatting, which diverges across
    engines)."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string("SUP-%05d", "s_suppkey").alias("sup_code"),
        F.format_string("%s/%d", "s_name", "s_nationkey").alias("name_nation"),
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded"),
    )


@register(
    "fn_xml",
    oracle="""
    SELECT o_orderkey AS k, o_orderpriority AS p, o_orderdate AS d
    FROM orders WHERE o_orderkey % 20 = 0
    """,
    tags=("functions", "xml"),
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML functions (Spark 4 ``from_xml``): serialize rows to XML text,
    parse back with a typed schema, emit the typed fields — the roundtrip
    identity is the oracle (DuckDB reads the originals directly; no XML
    engine needed oracle-side). Long / string / TIMESTAMP all survive the
    text hop losslessly (midnight-precision order dates); the priority
    strings carry no XML-special characters by fixture construction."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"), F.col("o_orderpriority"),
        F.lit("</p><d>"), F.col("o_orderdate").cast("string"),
        F.lit("</d></o>"),
    )
    parsed = F.from_xml(xml, "k BIGINT, p STRING, d TIMESTAMP")
    return o.select(
        parsed.getField("k").alias("k"),
        parsed.getField("p").alias("p"),
        parsed.getField("d").alias("d"),
    )


@register(
    "fn_str_to_map",
    oracle="""
    SELECT c_custkey,
           c_mktsegment AS seg,
           CAST(c_custkey AS VARCHAR) AS key_str,
           2 AS n_entries
    FROM customer WHERE c_custkey % 10 = 0
    """,
    tags=("functions", "map"),
)
def fn_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``str_to_map``: parse delimited key:value text into a MAP column —
    the classic log-attribute ingestion path — then read entries back out.
    Roundtrip identity oracle (segments/keys contain neither delimiter by
    fixture construction)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    payload = F.concat(
        F.lit("seg:"), F.col("c_mktsegment"),
        F.lit(",key:"), F.col("c_custkey").cast("string"),
    )
    m = F.str_to_map(payload, F.lit(","), F.lit(":"))
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg"),
        F.element_at(m, "key").alias("key_str"),
        F.size(m).alias("n_entries"),
    )


@register(
    "fn_aes_roundtrip",
    oracle="""
    SELECT p_partkey,
           p_name AS roundtrip,
           ((length(p_name) // 16) + 1) * 16 AS cipher_len
    FROM part WHERE p_partkey % 10 = 0
    """,
    tags=("functions", "crypto"),
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``aes_encrypt``/``aes_decrypt`` surface proof via a decrypt∘encrypt
    identity (ECB mode — deterministic, so the PKCS7 ciphertext length is
    checkable too: 16·(⌊n/16⌋+1) bytes for an n-byte ASCII input). GCM is
    the production mode but salts a random IV per call; the identity and
    length contracts are the mode-independent behavior worth pinning.
    JVM-side codegen expressions — no Python in the path."""
    key = F.lit("0123456789abcdef")
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    cipher = F.aes_encrypt(F.col("p_name").cast("binary"), key, F.lit("ECB"))
    return p.select(
        "p_partkey",
        F.aes_decrypt(cipher, key, F.lit("ECB")).cast("string").alias("roundtrip"),
        F.length(cipher).alias("cipher_len"),
    )


@register(
    "fn_collation_ci",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                  ELSE c_mktsegment END AS seg
      FROM customer
    )
    SELECT min(lower(seg)) AS segment, COUNT(*) AS n_rows,
           COUNT(*) FILTER (WHERE lower(seg) = 'building') AS n_building
    FROM t GROUP BY lower(seg)
    """,
    tags=("fn", "collation"),
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 ``COLLATE UTF8_LCASE``):
    grouping and equality under a case-insensitive collation, the engine
    feature that replaces scattering ``lower()`` at every comparison
    site. Half the rows are case-mangled; the collated groupBy folds
    'BUILDING' and 'building' into one group, and the collated equality
    matches the lowercase literal against both spellings. The emitted key
    is canonicalized through ``lower()`` (the collated group keeps an
    arbitrary representative spelling) and aggregates carry no collated
    type, so the output schema stays plain UTF8. Oracle: the classic
    lower()-normalized phrasing — same groups, same counts."""
    c = load(spark, sf_dir, "customer")
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
    ).otherwise(F.col("c_mktsegment"))
    ci = F.collate(seg, "UTF8_LCASE")
    return (
        c.select(seg.alias("seg"), ci.alias("seg_ci"))
        .groupBy("seg_ci")
        .agg(
            F.min(F.lower("seg")).alias("segment"),
            F.count("*").alias("n_rows"),
            F.count_if(F.col("seg_ci") == F.lit("building")).alias(
                "n_building"
            ),
        )
        .select("segment", "n_rows", "n_building")
    )


@register(
    "fn_luhn_check",
    oracle="""
    WITH nums AS (
      SELECT lpad(CAST(o_orderkey % 100000000 AS VARCHAR), 12, '7') AS s
      FROM orders
    ), d AS (
      SELECT s,
             list_transform(range(1, 13),
                            i -> CAST(substr(s, 13 - i, 1) AS INT)) AS ds
      FROM nums
    ), v AS (
      SELECT s,
             list_sum(list_transform(range(1, 13),
               i -> CASE WHEN i % 2 = 0
                         THEN CASE WHEN ds[i] * 2 > 9 THEN ds[i] * 2 - 9
                              ELSE ds[i] * 2 END
                         ELSE ds[i] END)) % 10 = 0 AS is_valid
      FROM d
    )
    SELECT is_valid, COUNT(*) AS n FROM v GROUP BY is_valid
    """,
    tags=("fn", "string", "privacy"),
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``luhn_check`` (Spark 3.5+ builtin): the mod-10 checksum that
    validates credit-card-shaped digit strings — the precision half of a
    PII card-number detector (a 12-16 digit regex alone false-positives
    on order ids and phone numbers; Luhn validity cuts those ~10×).
    Synthesized digit strings from order keys exercise both outcomes; the
    oracle implements the double-every-second-from-the-right rule
    explicitly in SQL, so the builtin is checked against the spec, not
    against itself."""
    o = load(spark, sf_dir, "orders")
    s = F.lpad((F.col("o_orderkey") % 100000000).cast("string"), 12, "7")
    return (
        o.select(s.alias("s"))
        .select(F.expr("luhn_check(s)").alias("is_valid"))
        .groupBy("is_valid")
        .agg(F.count("*").alias("n"))
    )


@register(
    "fn_mask_builtin",
    oracle="""
    SELECT o_orderkey,
           regexp_replace(regexp_replace(regexp_replace(
             o_orderpriority, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g') AS masked,
           regexp_replace(regexp_replace(regexp_replace(
             o_orderpriority, '[0-9]', '#', 'g'), '[A-Z]', 'U', 'g'),
             '[a-z]', 'U', 'g') AS masked_custom
    FROM orders WHERE o_orderkey <= 500
    """,
    tags=("fn", "string", "privacy"),
)
def fn_mask_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mask()`` builtin (Spark 3.4+): character-class redaction —
    uppercase→X, lowercase→x, digit→n by default, with per-class
    override characters — the data-masking primitive for showing
    FORMATS (does this column look like a card/phone/id?) without
    showing values, complementing pii_mask_digits' regexp approach.
    The oracle reimplements the class mapping with regexp chains
    (digit-class first in the custom variant: its replacement 'U'
    would otherwise be re-masked by the uppercase pass)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.expr("mask(o_orderpriority)").alias("masked"),
        F.expr("mask(o_orderpriority, 'U', 'U', '#')").alias("masked_custom"),
    )
