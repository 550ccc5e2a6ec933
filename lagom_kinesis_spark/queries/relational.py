"""Scans, projection, filter/predicates, distinct, sorts/limits, set ops.

SURVEY.md §2B "Scans / sources / sinks", "Projection / filter / predicates",
and "Sorts / limits / set ops" rows. All pure DataFrame API: filters and
projections reach the parquet scan as PushedFilters/ReadSchema (verified in
tests/test_plans.py), so at 100 TB these are IO-bound columnar scans, not
full-table reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lagom_kinesis_spark.operators import sketches as _sketches
from lagom_kinesis_spark.catalog import io_scratch, load, stable_tag
from lagom_kinesis_spark.functions import (
    dec,
    hash_build,
    money_sum_units,
    r6,
    revenue_sql,
    revenue_units,
    units,
)
from lagom_kinesis_spark.registry import register

# ---------------------------------------------------------------------------
# Flagship: scan + filter + 5-way join (2 broadcast dims) + exact-decimal agg
# + sort. The reference has no relational surface (SURVEY.md §2A) — this is
# the engine-defined headline exercising the whole relational stack at once.
# Scale: lineitem⋈orders is the only big shuffle; nation/region broadcast.
# ---------------------------------------------------------------------------


def _customer_nation_asia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's dimension chain collapsed: (c_custkey, n_name) for
    ASIA customers only. Joining ORDERS to this broadcast BEFORE the fact
    join pushes the region filter's 1/5 selectivity into the shuffle
    build side — a semijoin reduction Catalyst can't derive without
    stats. The collapsed dim is customer-sized (a dim by fixture
    contract); at a scale where customer outgrows broadcast, the
    bucketed/co-partitioned path is the answer, not the probe chain."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )



@register(
    "flagship_revenue_by_nation",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    tags=("flagship", "join", "agg"),
)
def flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per ASIA nation, 1996-1998 orders. One fact shuffle: the
    build side is orders reduced by BOTH pushed filters — the date range
    at the scan, the region membership via the collapsed customer
    broadcast — so the hash table carries only (o_orderkey, n_name) for
    qualifying orders (~1/10 of the table) and the lineitem probe side
    never shuffles at all. Measured r8 at sf10: 3.88 → 2.75 s vs the
    probe-chain form."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01")
    )
    ca = _customer_nation_asia(spark, sf_dir)
    orders_asia = orders.join(
        F.broadcast(ca), orders.o_custkey == ca.c_custkey
    ).select("o_orderkey", "n_name")
    return (
        li.join(hash_build(orders_asia), li.l_orderkey == orders_asia.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum_units(revenue_units(), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


# ---------------------------------------------------------------------------
# Scans
# ---------------------------------------------------------------------------


@register(
    "scan_parquet_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
    tags=("scan",),
)
def scan_parquet_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter pushed to the parquet scan (2-col ReadSchema)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < "1996-01-01")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "scan_parquet_bloom_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part WHERE p_partkey IN (42, 1337)
    """,
    tags=("scan", "bloom"),
)
def scan_parquet_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup over a parquet layout written WITH a column bloom
    filter — the needle-in-haystack pattern at 100 TB. The layout is
    hash-repartitioned on the key, so every file's (min, max) spans the
    whole key domain and row-group STATS can prune nothing; the writer
    option ``parquet.bloom.filter.enabled#p_partkey`` embeds an SBBF per
    row group, which the reader consults before decoding — row groups
    that provably lack the needle are skipped entirely. That is the only
    sub-linear access path for an equality probe on a high-cardinality
    column you don't sort/Z-order by. Layout written once per process;
    results are layout-independent (the oracle reads the original
    table)."""
    import os

    # Fingerprint-keyed (source=): a regenerated fixture must rebuild the
    # bloom layout, not be served the stale copy.
    tmp = io_scratch("part_bloom", sf_dir, source="part")
    if not os.path.exists(os.path.join(tmp, "_SUCCESS")):
        (
            load(spark, sf_dir, "part")
            .select("p_partkey", "p_name", "p_brand", "p_retailprice")
            # hash layout: min/max stats are useless, blooms are not
            .repartition(8, "p_name")
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#p_partkey", "true")
            .option("parquet.bloom.filter.expected.ndv#p_partkey", "200000")
            .parquet(tmp)
        )
    return spark.read.parquet(tmp).filter(
        F.col("p_partkey").isin(42, 1337)
    )


# ---------------------------------------------------------------------------
# Projection / computed columns
# ---------------------------------------------------------------------------


@register(
    "proj_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS gross,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem
    """,
    tags=("project",),
)
def proj_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic projection (identical IEEE ops on both engines)."""
    li = load(spark, sf_dir, "lineitem")
    gross = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r6(gross).alias("gross"),
        r6(gross * (F.lit(1) + F.col("l_tax"))).alias("charged"),
    )


# ---------------------------------------------------------------------------
# Filters / predicates
# ---------------------------------------------------------------------------


@register(
    "filter_bool_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE (l_quantity >= 30 AND l_discount > 0.02) OR NOT (l_returnflag = 'N')
    """,
    tags=("filter",),
)
def filter_bool_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + AND/OR/NOT."""
    li = load(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") >= 30) & (F.col("l_discount") > 0.02)) | (
        ~(F.col("l_returnflag") == "N")
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "filter_in_between",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus NOT IN ('P')
      AND o_totalprice BETWEEN 10000 AND 200000
    """,
    tags=("filter",),
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN / BETWEEN."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~F.col("o_orderstatus").isin("P")
        & F.col("o_totalprice").between(10000, 200000)
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%widget%' OR regexp_matches(p_name, '^(small|large)')
    """,
    tags=("filter",),
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / RLIKE."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%") | F.col("p_name").rlike("^(small|large)")
    ).select("p_partkey", "p_name")


@register(
    "filter_null_semantics",
    oracle="""
    SELECT c_custkey,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           (NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'MACHINERY') AS nsafe_eq,
           (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS seg_is_null
    FROM customer
    WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
       OR NULLIF(c_mktsegment, 'BUILDING') = 'MACHINERY'
    """,
    tags=("filter", "null"),
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + null-safe equality (<=>), nulls synthesized via NULLIF."""
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        c.select(
            "c_custkey",
            seg.alias("seg_or_null"),
            seg.eqNullSafe("MACHINERY").alias("nsafe_eq"),
            seg.isNull().alias("seg_is_null"),
        )
        .filter(F.col("seg_or_null").isNull() | (F.col("seg_or_null") == "MACHINERY"))
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.distinct() — partial-aggregate dedup before shuffle at scale."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "drop_rename",
    oracle="""
    SELECT c_custkey, c_name AS customer_name, c_mktsegment FROM customer
    """,
    tags=("project",),
)
def drop_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop + withColumnRenamed."""
    return (
        load(spark, sf_dir, "customer")
        .withColumnRenamed("c_name", "customer_name")
        .drop("c_acctbal", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# Sorts / limits
# ---------------------------------------------------------------------------


@register(
    "sort_multikey_rownum",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, o_totalprice, o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC)
               AS rn
      FROM orders
    ) WHERE rn <= 100
    """,
    tags=("sort",),
)
def sort_multikey_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, verified through the order-insensitive hash by
    materializing row_number over the full ordering (ties pinned by key).
    Scale note: the rn materialization is a verification device (single
    reduce); the production sort itself is a distributed range-sort."""
    o = load(spark, sf_dir, "orders")
    w = W.orderBy(
        F.col("o_orderpriority").asc_nulls_last(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    )
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
    )


@register(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    tags=("sort", "limit"),
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy + limit: Spark plans TakeOrderedAndProject (per-partition
    top-k then merge — no global sort, scale-safe). Ties pinned by key."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20 OFFSET 30
    """,
    tags=("sort", "limit"),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: ``offset()`` (Spark 3.4+ DataFrame API) + limit over a
    TOTAL order (unique-key tiebreak — OFFSET under a partial order is
    nondeterministic on any engine, the trap this row pins). Page 2 and
    beyond of a ranked listing — the API-server access pattern.

    Scale: Spark executes offset+limit over a sort as a single
    TakeOrdered-style top-(offset+limit) merge + driver-side skip — the
    scan never materializes a global sort; cost grows with page DEPTH
    (offset+limit rows buffered), which is the same bound every engine
    (and every real pagination design) carries — deep pagination wants a
    keyset/seek predicate instead, which is `filter + topk_limit` here."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(30)
        .limit(20)
    )


@register(
    "sort_keyset_seek",
    oracle="""
    WITH cursor AS (
      SELECT o_totalprice AS cur_price, o_orderkey AS cur_key FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1 OFFSET 49
    )
    SELECT o_orderkey, o_totalprice FROM orders, cursor
    WHERE o_totalprice < cur_price
       OR (o_totalprice = cur_price AND o_orderkey > cur_key)
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
    tags=("sort", "limit"),
)
def sort_keyset_seek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — the deep-page twin `sort_limit_offset`'s
    docstring promises: instead of buffering offset+limit rows, the client
    passes back the LAST-SEEN (o_totalprice, o_orderkey) cursor and the
    next page is a PREDICATE + top-k under the same total order:

        (price < cur) OR (price = cur AND key > cur_key), LIMIT 20

    Here the cursor is derived in-plan for determinism (the last row of
    page 2-of-20, i.e. rank 50 — so this page equals OFFSET 50 LIMIT 20),
    via a 1-row TakeOrdered + collect: the bounded, documented stand-in
    for the literal a real API request carries. The page query itself
    embeds the cursor as LITERALS, so the seek predicate reaches the
    parquet scan as PushedFilters and the merge is
    TakeOrderedAndProject(limit=20) with NO offset — cost is independent
    of page depth, the property offset pagination structurally lacks
    (plan-pinned in tests/test_plans.py)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    total_order = (F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    # Bounded collect (exactly 1 row): the cursor a production caller
    # would supply. offset(49).limit(1) is itself a top-50 TakeOrdered.
    cur_rows = o.orderBy(*total_order).offset(49).limit(1).collect()
    if not cur_rows:
        # Fixture shorter than the cursor depth: the oracle's correlated
        # cursor CTE yields an empty page, so return the same empty
        # 2-column shape instead of crashing on [0] (ADVICE r11).
        return o.filter(F.lit(False))
    cur = cur_rows[0]
    seek = (F.col("o_totalprice") < F.lit(cur["o_totalprice"])) | (
        (F.col("o_totalprice") == F.lit(cur["o_totalprice"]))
        & (F.col("o_orderkey") > F.lit(cur["o_orderkey"]))
    )
    return o.filter(seek).orderBy(*total_order).limit(20)


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "union_all_keys",
    oracle="""
    SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_custkey <= 200
    UNION ALL
    SELECT o_custkey AS key, 'orders' AS src FROM orders WHERE o_custkey <= 200
    """,
    tags=("setop",),
)
def union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName (bag semantics)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(F.col("c_custkey").alias("key"), F.lit("customer").alias("src"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(F.col("o_custkey").alias("key"), F.lit("orders").alias("src"))
    )
    return c.unionByName(o)


@register(
    "union_distinct_keys",
    oracle="""
    SELECT c_custkey AS key FROM customer WHERE c_custkey <= 200
    UNION
    SELECT o_custkey AS key FROM orders WHERE o_custkey <= 200
    """,
    tags=("setop",),
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union().distinct() = SQL UNION."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(F.col("c_custkey").alias("key"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(F.col("o_custkey").alias("key"))
    )
    return c.union(o).distinct()


@register(
    "intersect_except",
    oracle="""
    SELECT key, 'both' AS tag FROM (
      SELECT c_custkey AS key FROM customer
      INTERSECT
      SELECT o_custkey AS key FROM orders
    )
    UNION ALL
    SELECT key, 'only_customer' AS tag FROM (
      SELECT c_custkey AS key FROM customer
      EXCEPT
      SELECT o_custkey AS key FROM orders
    )
    """,
    tags=("setop",),
)
def intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect + subtract (set semantics), tagged and unioned."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    both = c.intersect(o).withColumn("tag", F.lit("both"))
    only_c = c.subtract(o).withColumn("tag", F.lit("only_customer"))
    return both.unionByName(only_c)


@register(
    "intersect_all_except_all",
    oracle="""
    SELECT key, 'int_all' AS tag FROM (
      SELECT l_suppkey AS key FROM lineitem WHERE l_linenumber = 1
      INTERSECT ALL
      SELECT l_suppkey AS key FROM lineitem WHERE l_linenumber = 2
    )
    UNION ALL
    SELECT key, 'exc_all' AS tag FROM (
      SELECT l_suppkey AS key FROM lineitem WHERE l_linenumber = 1
      EXCEPT ALL
      SELECT l_suppkey AS key FROM lineitem WHERE l_linenumber = 2
    )
    """,
    tags=("setop",),
)
def intersect_all_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll / exceptAll (bag semantics)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select(F.col("l_suppkey").alias("key"))
    b = li.filter(F.col("l_linenumber") == 2).select(F.col("l_suppkey").alias("key"))
    ia = a.intersectAll(b).withColumn("tag", F.lit("int_all"))
    ea = a.exceptAll(b).withColumn("tag", F.lit("exc_all"))
    return ia.unionByName(ea)


# ---------------------------------------------------------------------------
# File-format round-trips (csv/json scans, partitioned parquet sink)
# ---------------------------------------------------------------------------


@register(
    "scan_text_roundtrip",
    oracle="SELECT n_nationkey, n_name FROM nation",
    tags=("scan", "sink", "text"),
)
def scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text sink + ``format("text")`` scan — the rawest
    ingestion format a corpus pipeline meets (one record per line, all
    parsing user-side). Writes nation as delimited lines, reads back as a
    single ``value`` column, re-parses with JVM split/cast; the oracle is
    the roundtrip identity. Scale: text scans split by line like any file
    source; the explicit parse projection keeps schema derivation out of
    the reader (no inference pass)."""
    tmp = io_scratch("nation_txt", sf_dir, source="nation")
    load(spark, sf_dir, "nation").select(
        F.concat_ws("|", F.col("n_nationkey"), F.col("n_name")).alias("value")
    ).write.mode("overwrite").text(tmp)
    parts = F.split(F.col("value"), "\\|")
    return spark.read.text(tmp).select(
        F.element_at(parts, 1).cast("int").alias("n_nationkey"),
        F.element_at(parts, 2).alias("n_name"),
    )


@register(
    "scan_text_wholefile",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_files,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id % 25 = 0 AND doc_id < 50000 GROUP BY lang
    """,
    tags=("scan", "text"),
)
def scan_text_wholefile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``wholetext`` ingestion: one FILE = one record, newlines preserved —
    the document-per-file corpus layout (crawl dumps exploded to files,
    books, transcripts) where line-oriented text() would shred every
    document. File identity rides the path: lang is encoded in the
    filename and recovered with input_file_name(), the standard pattern
    for metadata-in-layout corpora. Fixture prep materializes a bounded
    1-in-25 document sample as real files (driver-side, ≤n_docs/25
    writes, cached on the fixture fingerprint via io_scratch); the read
    side is the distributed part. Scale caveat pinned by the pattern
    itself: wholetext makes a file the split unit, so the layout must be
    many files — exactly what doc-per-file is. The sample is capped at
    2000 files (doc_id < 50000) so the prep collect is BOUNDED at every
    scale, not merely proportional."""
    import os

    d = load(spark, sf_dir, "documents")
    tmp = io_scratch("documents_wholefile", sf_dir, source="documents")
    marker = os.path.join(tmp, "_DOCS_DONE")
    if not os.path.exists(marker):
        os.makedirs(tmp, exist_ok=True)
        # bounded sample (doc_id % 25) written as one file per document;
        # newline content survives wholetext where text() would split it
        rows = (
            d.filter((F.col("doc_id") % 25 == 0) & (F.col("doc_id") < 50000))
            .select("doc_id", "lang", "text")
            .collect()
        )  # ≤2000 rows by the doc_id cap — bounded fixture prep
        for r in rows:
            with open(
                os.path.join(tmp, f"{r['lang']}__{r['doc_id']}.txt"),
                "w",
                encoding="utf-8",
            ) as f:
                f.write(r["text"])
        with open(marker, "w") as f:
            f.write(str(len(rows)))
    back = (
        spark.read.option("wholetext", True)
        .text(os.path.join(tmp, "*.txt"))
        .select(
            # Split the basename on the literal '__' delimiter the writer
            # used (not a [a-z]+ regex): a lang like 'zh_CN' or 'en-US'
            # round-trips exactly instead of silently extracting ''
            # (ADVICE r9). element_at(.., 1) is total here — the writer
            # always emits 'lang__docid.txt', so the split has ≥2 parts.
            F.element_at(
                F.split(
                    F.element_at(F.split(F.input_file_name(), "/"), -1),
                    "__",
                ),
                1,
            ).alias("lang"),
            F.length("value").alias("n_chars"),
        )
    )
    return back.groupBy("lang").agg(
        F.count("*").alias("n_files"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "scan_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan", "csv"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema'd CSV scan (no inferSchema — explicit schema is the
    only scale-safe option: inference re-reads the data)."""
    tmp = io_scratch("nation_csv", sf_dir, source="nation")
    load(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(tmp)
    return spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", True
    ).csv(tmp)


@register(
    "scan_json_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    tags=("scan", "json"),
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON lines sink + schema'd JSON scan."""
    tmp = io_scratch("supplier_json", sf_dir, source="supplier")
    load(spark, sf_dir, "supplier").write.mode("overwrite").json(tmp)
    return spark.read.schema(
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).json(tmp)


@register(
    "scan_json_gzip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    tags=("scan", "json", "compression"),
)
def scan_json_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzipped JSONL ingestion — the dominant at-rest format of public web
    corpora (Common-Crawl-derived dumps ship as .json.gz). gzip is NOT a
    splittable codec: one .gz file = one input split = one task, so the
    100 TB posture is MANY moderate files (the writer here emits one
    gzip member per input partition — exactly what a distributed producer
    does), never one giant archive; the read side then parallelizes
    file-per-task. Spark decompresses transparently by extension. The
    aggregate proves the decompressed roundtrip character-exactly against
    the source table: total_chars is length(text) computed AFTER the
    JSON-escape → gzip → decompress → unescape cycle."""
    tmp = io_scratch("documents_json_gz", sf_dir, source="documents")
    src = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    src.write.mode("overwrite").option("compression", "gzip").json(tmp)
    back = spark.read.schema("doc_id long, lang string, text string").json(tmp)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )


@register(
    "scan_csv_dropmalformed",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n,
           round(SUM(s_acctbal), 6) AS total_acctbal
    FROM supplier GROUP BY s_nationkey
    """,
    tags=("scan", "csv"),
)
def scan_csv_dropmalformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV DROPMALFORMED mode: rows that fail type parsing are silently
    dropped at the scan — the third parse posture next to PERMISSIVE
    (+corrupt-record column, `scan_csv_permissive_corrupt`) and the
    default FAILFAST-on-demand. The fixture prep plants a file of
    garbage lines alongside the valid export; the aggregate must equal
    the clean source exactly — the garbage must vanish WITHOUT failing
    the scan. At 100 TB this is the 'ingest the feed, quarantine
    nothing, count what parsed' posture; PERMISSIVE+corrupt-column is
    the auditable one.

    Caveat this query pins deliberately: with CSV column pruning (the
    default) malformed detection applies to the PARSED columns only —
    a wrong-arity line or a type error in an unprojected column sails
    through as nulls. The planted rows therefore carry type failures in
    the projected columns themselves (the semantics a user actually
    gets); rows relying on arity checks would need
    spark.sql.csv.parser.columnPruning.enabled=false."""
    import os

    tmp = io_scratch("supplier_csv_malformed", sf_dir, source="supplier")
    marker = os.path.join(tmp, "zz_bad.csv")
    if not os.path.exists(marker):
        load(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
        ).write.mode("overwrite").csv(tmp)
        # malformed rows: type failures in the projected (parsed)
        # columns — written AFTER the csv job so the dir carries both
        with open(marker, "w") as f:
            f.write("10000001,Bad One,xx,12.5\n")
            f.write("10000002,Bad Two,5,notadouble\n")
            f.write("10000003,Bad Three,yy,zz\n")
    back = (
        spark.read.schema(
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
        )
        .option("mode", "DROPMALFORMED")
        .csv(tmp)
    )
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        r6(F.sum("s_acctbal")).alias("total_acctbal"),
    )


@register(
    "sink_parquet_max_records_per_file",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("sink", "parquet"),
)
def sink_parquet_max_records_per_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-size governance on write: ``maxRecordsPerFile`` caps every
    output file, turning a skewed task's giant part-file into several
    bounded ones — the writer-side half of the small/large-files problem
    (the reader-side half is maxPartitionBytes). At 100 TB unbounded
    part-files break downstream readers' parallelism and retries; this
    is the knob that bounds them without an extra repartition job. The
    file-count contract is pinned in tests/test_operators.py; the query
    verifies the roundtrip content exactly."""
    tmp = io_scratch("orders_maxrec", sf_dir, source="orders")
    load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).write.mode("overwrite").option("maxRecordsPerFile", 1000).parquet(tmp)
    back = spark.read.parquet(tmp)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@register(
    "sink_parquet_partitioned",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("sink", "parquet"),
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partitionBy parquet sink + partition-pruned re-read: the at-rest
    topic layout (SURVEY.md §1.1) — partition values become directories,
    enabling partition pruning on read."""
    tmp = io_scratch("orders_part", sf_dir, source="orders")
    load(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(tmp)
    back = spark.read.parquet(tmp)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), money_sum_units(units("o_totalprice"), 2).alias("total")
    )


@register(
    "join_dynamic_partition_pruning",
    oracle="""
    SELECT n_name AS nation,
           COUNT(*) AS n_customers,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("join", "scan", "pruning", "scale"),
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is laid out
    ``partitionBy(c_nationkey)`` on disk and joined to a dimension whose
    filter is DATA-DEPENDENT (nation ⋈ region WHERE r_name='ASIA' — the
    nationkey set only exists at runtime, so static pushdown can't see
    it). Spark injects a ``dynamicpruningexpression`` into the fact scan's
    PartitionFilters from the broadcast dim's build side, so only the 5
    ASIA partition directories are read — at 100 TB, THE mechanism that
    turns a star-schema full scan into a selective one
    (tests/test_plans.py asserts the dynamicpruning subquery; a
    constant-foldable dim filter would degrade to static IN pruning and
    prove nothing). Oracle: same join over the unpartitioned source."""
    tmp = io_scratch("cust_nat", sf_dir, source="customer")
    load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    ).write.mode("overwrite").partitionBy("c_nationkey").parquet(tmp)
    fact = spark.read.parquet(tmp)
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        fact.join(
            F.broadcast(dim),
            fact.c_nationkey == dim.n_nationkey.cast(
                fact.schema["c_nationkey"].dataType
            ),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            money_sum_units(units("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, concat('UPDATED_', c_name) AS c_name, c_nationkey,
             round(c_acctbal + 1000, 6) AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT -1 AS c_custkey, 'NEW_CUSTOMER' AS c_name, 0 AS c_nationkey,
             0.0 AS c_acctbal, 'BUILDING' AS c_mktsegment
    )
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 6) AS c_acctbal,
           c_mktsegment
    FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 6) AS c_acctbal,
           c_mktsegment
    FROM updates
    """,
    tags=("merge",),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (operators/merge.py): updated rows replace
    matches, new keys insert — anti-join + union, updates broadcast."""
    from lagom_kinesis_spark.operators.merge import upsert

    cust = load(spark, sf_dir, "customer")
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.concat(F.lit("UPDATED_"), F.col("c_name")).alias("c_name"),
            "c_nationkey",
            (F.col("c_acctbal") + 1000).alias("c_acctbal"),
            "c_mktsegment",
        )
        .unionByName(
            spark.createDataFrame(
                [(-1, "NEW_CUSTOMER", 0, 0.0, "BUILDING")],
                "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
            )
        )
    )
    merged = upsert(cust, updates, keys=["c_custkey"])
    return merged.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        r6(F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
    )


@register(
    "sample_bernoulli",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE substr(md5(l_orderkey || '|' || l_linenumber), 1, 4) < '1999'
    """,
    tags=("scan", "sample"),
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed Bernoulli sampling at rate 0x1999/0x10000 ~ 10%: keep
    a row iff the md5 of its natural key falls under the threshold. A pure
    function of the row — identical across engines, retries, partitionings,
    and cluster sizes (Spark's seeded ``sample()`` is partition-dependent
    and can never hash-match an oracle; it stays covered in
    tests/test_pipeline_ops.py). Map-only at any scale, and the sample
    is STABLE under appends — rows never flip in or out as data grows,
    which is what makes it usable for longitudinal experiment holdouts."""
    li = load(spark, sf_dir, "lineitem")
    key = F.md5(F.concat_ws("|", F.col("l_orderkey"), F.col("l_linenumber")))
    return li.filter(F.substring(key, 1, 4) < "1999").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "scan_orc_roundtrip",
    oracle="SELECT p_partkey, p_name, p_brand, p_retailprice FROM part",
    tags=("scan", "orc"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan (Spark's second built-in columnar format — same
    pushdown/pruning machinery as parquet). The oracle reads the original
    parquet: a lossless roundtrip through ORC must reproduce it."""
    tmp = io_scratch("part_orc", sf_dir, source="part")
    load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    ).write.mode("overwrite").orc(tmp)
    return spark.read.orc(tmp)


def _ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    src: str,
    cols: list,
    key: str,
    n_buckets: int,
) -> str:
    """Make ``table`` — ``src``'s ``cols`` bucketed+sorted by ``key`` — exist
    in this session's catalog, reusing a layout a sibling process already
    wrote. Returns the spec-versioned table name callers must read.

    The warehouse directory is SHARED across processes (stable_tag paths)
    while the session catalog is per-process, so a fresh process must not
    rmtree files a sibling may be scanning (pytest + gate racing produced a
    mid-scan FileNotFound). The ensure-phase is flock-serialized per table;
    a completed layout (``_SUCCESS`` present) is ADOPTED by registering an
    external bucketed table over it (plans identically: Bucketed scan, no
    Exchange); only a partial/corrupt directory is rebuilt.

    The bucket count is baked into the table/path name: adoption trusts
    on-disk files, and declaring N buckets over a layout written with a
    different count would silently pair bucket i with the wrong (or an
    empty) bucket on the other side — rows dropped, no error. A spec
    change therefore lands at a NEW path instead of reinterpreting the
    old one (the bucket-count formula changed exactly this way mid-r6).
    Superseded spec versions are GC'd when the new one is ensured —
    concurrent processes derive the same count from the same fixture, so
    a different-suffix sibling dir is always a dead layout."""
    from lagom_kinesis_spark.catalog import fixture_fingerprint

    base_name = table
    # Spec-versioned name: bucket count AND the source fixture's
    # mtime/size fingerprint. Without the fingerprint, a fixture
    # regenerated at the same sf_dir would hit the session-catalog
    # shortcut (or cross-process _SUCCESS adoption) and serve a layout
    # built from the OLD rows while the oracle reads the fresh parquet —
    # the staleness class load()/io_scratch(source=...) already defend
    # against everywhere else.
    table = f"{table}_b{n_buckets}_f{fixture_fingerprint(sf_dir, src)}"
    if spark.catalog.tableExists(table):
        return table
    import fcntl
    import os
    import re
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    os.makedirs(wh, exist_ok=True)
    spec_re = re.compile(rf"^{re.escape(base_name)}_b\d+(_f[0-9a-f]{{8}})?$")
    with open(os.path.join(wh, f".lock_{table}"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        for entry in os.listdir(wh):
            stale = entry.removeprefix(".lock_")
            dead_version = spec_re.match(stale) and stale != table
            if dead_version or stale == base_name:  # or pre-versioning name
                target = os.path.join(wh, entry)
                try:
                    (shutil.rmtree if os.path.isdir(target) else os.remove)(
                        target
                    )
                except OSError:
                    pass  # shared /tmp: a sibling may have swept it first
        path = os.path.join(wh, table)
        sel = load(spark, sf_dir, src).select(*cols)

        def _one_file_per_bucket() -> bool:
            # The session trusts SORTED BY metadata on read
            # (spark.sql.legacy.bucketedTableScan.outputOrdering,
            # session.py): that is only sound when no bucket is split
            # across files — a split bucket's concatenated read order is
            # NOT sorted and a merge join would silently drop matches.
            # Our writer (repartition on the bucket key, one task per
            # bucket) produces exactly one file per non-empty bucket;
            # verify the on-disk truth before adopting or returning.
            import re
            from collections import Counter

            # Spark's bucketed part files embed the bucket id as a fixed
            # 5-digit suffix before the extension (`..._00003.snappy.parquet`
            # / `..._00003.parquet`). Any part- file NOT matching that
            # pattern is not a bucketed file at all (e.g. a plain part file
            # left by a non-bucketed writer), so the directory fails the
            # invariant outright instead of the stray file being invisible
            # to the count.
            bucket_id = re.compile(r"_(\d{5})\.")
            seen: Counter = Counter()
            for f in os.listdir(path):
                if not f.startswith("part-"):
                    continue
                m = bucket_id.search(f)
                if m is None:
                    return False
                seen[m.group(1)] += 1
            return bool(seen) and max(seen.values()) == 1

        if os.path.exists(os.path.join(path, "_SUCCESS")) and _one_file_per_bucket():
            col_ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in sel.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {table} ({col_ddl}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
            )
            return table
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(path, ignore_errors=True)
        sel.repartition(n_buckets, key).write.bucketBy(n_buckets, key).sortBy(
            key
        ).saveAsTable(table)
        assert _one_file_per_bucket(), (
            f"bucketed layout {path} has a bucket split across files — "
            "sorted-scan ordering would be unsound"
        )
    return table


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "bucketed"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: both fact tables are written
    ``bucketBy`` the join key into the warehouse, so the big⋈big join (and
    the groupBy that follows a bucket-key join) plans with NO Exchange on
    the bucketed sides — the one-time write-side shuffle is amortized over
    every later join, the canonical repeated-fact-join strategy at 100 TB
    (tests/test_bucketing.py asserts the Exchange-free plan).

    A ``merge`` join hint pins the big⋈big SortMergeJoin path that
    bucketing de-shuffles (a broadcast would mask the point at test
    scale; at 100 TB neither fact side fits a broadcast anyway)."""
    tag = stable_tag(sf_dir)
    bo = _ensure_bucketed(
        spark, sf_dir, f"bq_orders_{tag}", "orders",
        ["o_orderkey", "o_orderpriority"], "o_orderkey", 8,
    )
    bl = _ensure_bucketed(
        spark, sf_dir, f"bq_lineitem_{tag}", "lineitem",
        ["l_orderkey", "l_quantity"], "l_orderkey", 8,
    )
    li, o = spark.table(bl), spark.table(bo)
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            money_sum_units(units("l_quantity"), 2).alias("total_qty"),
        )
    )


#: Shared oracle CTEs for the SCD2 CDC scenario (merge_scd2 and
#: join_temporal_scd2_lookup must stay in lockstep): base version
#: effective 1992-01-01 — at or before the first o_orderdate, so the
#: version timeline covers EVERY fact and the temporal lookup's
#: "each fact matches exactly once" contract holds — every 10th
#: customer re-segmented effective 1997-06-01, plus one new key.
_SCD2_CDC_SQL = """cur AS (
      SELECT c_custkey, c_mktsegment,
             TIMESTAMP '1992-01-01' AS valid_from
      FROM customer
    ), upd AS (
      SELECT c_custkey, concat('SEG2_', c_mktsegment) AS c_mktsegment,
             TIMESTAMP '1997-06-01' AS eff
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT -1 AS c_custkey, 'NEW_SEGMENT' AS c_mktsegment,
             TIMESTAMP '1997-06-01' AS eff
    )"""


def _scd2_cdc_frames(spark: SparkSession, sf_dir: str):
    """(target, updates) DataFrames mirroring :data:`_SCD2_CDC_SQL` —
    the single Python construction of the CDC scenario both SCD2
    queries feed through operators/merge.scd2_apply."""
    cust = load(spark, sf_dir, "customer")
    target = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit("1992-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.concat(F.lit("SEG2_"), F.col("c_mktsegment")).alias(
                "c_mktsegment"
            ),
            F.lit("1997-06-01 00:00:00").cast("timestamp").alias("eff"),
        )
        .unionByName(
            spark.sql(
                "SELECT -1L AS c_custkey, 'NEW_SEGMENT' AS c_mktsegment, "
                "TIMESTAMP '1997-06-01' AS eff"
            )
        )
    )
    return target, updates


@register(
    "merge_scd2",
    oracle=f"""
    WITH {_SCD2_CDC_SQL}
    SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
           u.eff AS valid_to, FALSE AS is_current
    FROM cur c JOIN upd u USING (c_custkey)
    WHERE u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
    UNION ALL
    SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM cur c LEFT JOIN upd u USING (c_custkey)
    WHERE u.eff IS NULL OR u.c_mktsegment IS NOT DISTINCT FROM c.c_mktsegment
    UNION ALL
    SELECT u.c_custkey, u.c_mktsegment, u.eff AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM upd u LEFT JOIN cur c USING (c_custkey)
    WHERE c.c_custkey IS NULL
       OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
    """,
    # "cross" acknowledges a bounded constant-folding NLJ: the scenario's
    # one literal insert row (OneRowRelation) anti-joins a LocalLimit-1
    # broadcast after the optimizer propagates its constant key — 1x1 by
    # construction. The scd2_apply plan proper is all BroadcastHashJoin,
    # zero dimension shuffles (asserted in tests/test_plans.py).
    tags=("merge", "cross"),
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension MERGE (operators/merge.scd2_apply —
    the SCD2 variant VERDICT r4/r5 scoped behind the upsert): a CDC batch
    re-segments every 10th customer effective 1997-06-01 and adds one new
    key; changed rows close (valid_to = effective ts) and re-insert as the
    new current version, new keys insert, everything else passes through.
    Updates broadcast — two map-side joins, zero dimension shuffles."""
    from lagom_kinesis_spark.operators.merge import scd2_apply

    target, updates = _scd2_cdc_frames(spark, sf_dir)
    return scd2_apply(
        target, updates, keys=["c_custkey"], attrs=["c_mktsegment"]
    )


@register(
    "join_temporal_scd2_lookup",
    oracle=f"""
    WITH {_SCD2_CDC_SQL}, dim AS (
      SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
             u.eff AS valid_to
      FROM cur c JOIN upd u USING (c_custkey)
      WHERE u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
      UNION ALL
      SELECT c.c_custkey, c.c_mktsegment, c.valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM cur c LEFT JOIN upd u USING (c_custkey)
      WHERE u.eff IS NULL OR u.c_mktsegment IS NOT DISTINCT FROM c.c_mktsegment
      UNION ALL
      SELECT u.c_custkey, u.c_mktsegment, u.eff AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM upd u LEFT JOIN cur c USING (c_custkey)
      WHERE c.c_custkey IS NULL
         OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment
    )
    SELECT d.c_mktsegment AS segment_at_order_time,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN dim d ON o.o_custkey = d.c_custkey
             AND o.o_orderdate >= d.valid_from
             AND o.o_orderdate < coalesce(d.valid_to, TIMESTAMP '9999-12-31')
    GROUP BY d.c_mktsegment
    """,
    # "cross": same bounded constant-folding NLJ as merge_scd2 (the dim is
    # scd2_apply's output over the same scenario) — 1x1 by construction.
    tags=("join", "merge", "temporal", "cross"),
)
def join_temporal_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup over an SCD2 history — THE warehouse
    pattern the SCD2 MERGE exists to serve: each fact joins the dimension
    VERSION that was valid at the fact's own timestamp
    (``valid_from ≤ ts < valid_to``), so a 1996 order sees the customer's
    pre-change segment and a 1998 order the re-segmented one. The
    versioned dim is merge_scd2's own output (operators/merge.scd2_apply,
    same CDC scenario), closing the loop: maintain history with the
    MERGE, query it with this join.

    Scale: the join is equi on the dimension key plus a validity band;
    versions partition each key's timeline, so every fact matches exactly
    once and per-key fan-out equals the (small) version count. Dim
    broadcast here; at warehouse scale the same plan shuffles on custkey
    once (the base version is effective 1992-01-01, at or before the
    first o_orderdate, so the timeline covers the whole fact range)."""
    from lagom_kinesis_spark.operators.merge import scd2_apply

    target, updates = _scd2_cdc_frames(spark, sf_dir)
    dim = scd2_apply(
        target, updates, keys=["c_custkey"], attrs=["c_mktsegment"]
    )
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    return (
        o.join(
            F.broadcast(dim),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= F.col("valid_from"))
            & (
                F.col("o_orderdate")
                < F.coalesce(
                    F.col("valid_to"),
                    F.lit("9999-12-31 00:00:00").cast("timestamp"),
                )
            ),
        )
        .groupBy(F.col("c_mktsegment").alias("segment_at_order_time"))
        .agg(F.count("*").alias("n_orders"))
    )


def fact_bucketed_layout(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """The SHARED wide bucketed fact layout: (orders, lineitem) table names,
    both bucketBy(orderkey) + sortBy into the warehouse, carrying the union
    of columns every orderkey-join query needs. This is how a real lake
    amortizes the layout: ONE write-side shuffle per fact table, reused by
    every subsequent orderkey join (flagship, the 5-table multiway join,
    the Q3 shape); parquet column pruning keeps each query's scan exactly
    as narrow as a per-query layout would be, so sharing costs nothing.

    Bucket count scales with the fact data (~64 MB of source parquet per
    bucket, clamped [8, 64]): 8 buckets = 8 join tasks, which
    underparallelizes a 32-core sf10 tier 2x (measured 3.4 s vs 1.6 s at
    32 buckets); a real table would size buckets once at layout time
    exactly this way. Deterministic in sf_dir, so every process derives
    the same layout and can adopt another's files."""
    import os

    def _fixture_bytes(path: str) -> int:
        # A fixture may be one file or a directory of part files
        # (catalog.fixture_fingerprint supports both); getsize on a
        # directory returns the ~4 KB inode size, which would silently
        # clamp every large directory fixture to 8 buckets — the exact
        # 2x underparallelization this formula exists to prevent.
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(path)
                for f in files
            )
        return os.path.getsize(path)

    n_buckets = max(
        8,
        min(64, _fixture_bytes(f"{sf_dir}/lineitem.parquet") >> 26),
    )
    tag = stable_tag(sf_dir)
    bo = _ensure_bucketed(
        spark, sf_dir, f"bq_fact_orders_{tag}", "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        "o_orderkey", n_buckets,
    )
    bl = _ensure_bucketed(
        spark, sf_dir, f"bq_fact_lineitem_{tag}", "lineitem",
        [
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
        "l_orderkey", n_buckets,
    )
    return bo, bl


@register(
    "flagship_bucketed",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(CAST(SUM({revenue_sql}) AS VARCHAR) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    tags=("flagship", "join", "agg", "scale"),
)
def flagship_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query over the SHARED bucketed fact layout — identical
    results, exchange-free fact join. Both fact tables are
    bucketBy(orderkey) + sortBy into the warehouse (one-time write-side
    shuffle), so the lineitem⋈orders SortMergeJoin plans with NO Exchange
    and NO runtime Sort on either side — the canonical repeated-fact-join
    layout at 100 TB. Measured at sf10 (BENCH_NOTES.md): 0.90 s vs the
    shuffle plan's 3.7 s (4×) once the sorted-scan ordering is honored —
    see the round-7 note: without it Spark silently re-sorted both
    60M-row sides under the SMJ and the layout LOST to the shuffle plan.
    Layout cost ~21 s amortized over every subsequent orderkey join
    (join_multiway_bucketed and q_shipping_priority_bucketed reuse the
    very same files)."""
    bo, bl = fact_bucketed_layout(spark, sf_dir)
    li, orders = spark.table(bl), spark.table(bo).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1999-01-01")
    )
    # The same semijoin reduction as the unbucketed flagship, applied
    # BELOW the merge join: a BroadcastHashJoin preserves the streamed
    # (bucketed) side's partitioning and sort order, so reducing orders
    # by the ASIA customer set first keeps the SMJ exchange-free AND
    # sort-free while shrinking its build leg 5x (plan-pinned in
    # tests/test_bucketing.py).
    ca = _customer_nation_asia(spark, sf_dir)
    orders_asia = orders.join(
        F.broadcast(ca), orders.o_custkey == ca.c_custkey
    ).select("o_orderkey", "n_name")
    return (
        li.join(orders_asia.hint("merge"), li.l_orderkey == orders_asia.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum_units(revenue_units(), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


@register(
    "scan_binaryfile_roundtrip",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS doc_key,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text) AS content_md5
    FROM documents WHERE doc_id % 25 = 0
    """,
    tags=("scan", "binary", "multimodal"),
)
def scan_binaryfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source scan — the ingestion path for opaque
    image/audio/document blobs (operators/multimodal.py consumes the
    same (path, length, content) shape): every 25th document written as
    a raw file, read back distributed, keyed by filename with byte
    length and content digest.

    Both halves are fully distributed: fixture prep writes the blob
    files from the EXECUTORS via ``foreachPartition`` (each task writes
    its own partition's files — no driver materialization at any size;
    on a multi-node cluster the target would be shared storage), and the
    ``binaryFile`` scan reads them back one task per file group, content
    never touching the driver. A real pipeline's blobs arrive as files
    already.
    """
    import os
    import shutil

    tmp = io_scratch("docs_bin", sf_dir, source="documents")
    done = os.path.join(tmp, "_BLOBS_DONE")
    if not os.path.exists(done):
        # Adopt a completed blob layout like the sibling fixtures
        # (bloom/recursive-lookup): without the marker every invocation —
        # each bench best-of-N iteration — re-ran the distributed write
        # job. The path is fingerprint-keyed (source=), so a regenerated
        # fixture still rebuilds at a fresh path.
        sub = (
            load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 25 == 0)
            .select("doc_id", "text")
        )
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)

        def _write_files(rows) -> None:
            for row in rows:
                with open(os.path.join(tmp, f"{row.doc_id}.txt"), "wb") as f:
                    f.write(row.text.encode("utf-8"))

        sub.foreachPartition(_write_files)
        with open(done, "w") as f:
            f.write("")
    bf = spark.read.format("binaryFile").load(tmp)
    return bf.select(
        F.regexp_extract("path", r"(\d+)\.txt$", 1).alias("doc_key"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


@register(
    "sink_clustered_sorted",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_returnflag
    """,
    tags=("sink", "layout", "parquet"),
)
def sink_clustered_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered, sorted parquet layout + pushdown re-read — the
    z-order-lite data-layout discipline for time-filtered scans at
    scale: ``repartitionByRange(l_shipdate)`` puts each date range in
    few files, ``sortWithinPartitions`` makes row-group min/max stats
    tight, so a date-band re-read skips most row groups via the pushed
    filter instead of scanning the table. The correctness oracle is the
    same aggregate over the unclustered source — layout must never
    change results.
    """
    tmp = io_scratch("lineitem_clustered", sf_dir, source="lineitem")
    li = load(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    (
        li.repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate", "l_orderkey")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    back = spark.read.parquet(tmp).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        money_sum_units(units("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "scan_partition_pruned",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
    tags=("scan", "layout", "parquet"),
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning: orders written ``partitionBy`` the
    filter column, re-read with an equality predicate that must resolve
    at PLANNING time (PartitionFilters, zero data files from other
    partitions touched) — the directory-level analogue of row-group
    skipping, and the layout every at-rest topic store uses
    (SURVEY.md §1.1)."""
    tmp = io_scratch("orders_pruned", sf_dir, source="orders")
    load(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
        "o_orderpriority"
    ).parquet(tmp)
    back = spark.read.parquet(tmp).filter(F.col("o_orderpriority") == "1-URGENT")
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        money_sum_units(units("o_totalprice"), 2).alias("total"),
    )


@register(
    "scan_merge_schema",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
    FROM documents
    """,
    tags=("scan", "schema-evolution", "parquet"),
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet generations in one
    directory — an old batch (doc_id, lang) and a new batch that added
    n_chars — read back with ``mergeSchema`` so old rows surface NULL
    for the added column. The append-only topic-at-rest layout
    (SURVEY.md §1.1) evolves exactly this way; readers must never
    require a rewrite of historical files."""
    tmp = io_scratch("docs_evolve", sf_dir, source="documents")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    d = load(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "append"
    ).parquet(tmp)
    d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars").write.mode(
        "append"
    ).parquet(tmp)
    return spark.read.option("mergeSchema", True).parquet(tmp).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "dq_constraint_report",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
      CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS null_custkey,
      CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS nonpositive_price,
      CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
           AS BIGINT) AS bad_status,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey)) AS orphan_custkeys
    FROM orders
    """,
    tags=("quality", "agg", "join", "scalar"),
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report (the Deequ-style ingest gate a
    100 TB pipeline runs before promoting a batch): row count, primary-key
    uniqueness, null rate, value-range and domain violations in ONE
    aggregate pass, plus referential orphans as a broadcast anti-join —
    no per-constraint rescans."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey")
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphan_custkeys"))
    )
    report = o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("dup_keys"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive_price"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("bad_status"),
    )
    return report.crossJoin(F.broadcast(orphans))


@register(
    "dq_table_diff",
    oracle="""
    WITH target AS (
      SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
    ), source AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 10 = 0
                  THEN concat('SEG2_', c_mktsegment)
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 97 <> 3
      UNION ALL
      SELECT -1, 'NEW_CUSTOMER', 0, 'BUILDING'
    ), j AS (
      SELECT t.c_custkey AS tk, s.c_custkey AS sk,
             md5(concat_ws(chr(2),
                 coalesce(CAST(t.c_name AS VARCHAR), chr(1)),
                 coalesce(CAST(t.c_nationkey AS VARCHAR), chr(1)),
                 coalesce(CAST(t.c_mktsegment AS VARCHAR), chr(1)))) AS th,
             md5(concat_ws(chr(2),
                 coalesce(CAST(s.c_name AS VARCHAR), chr(1)),
                 coalesce(CAST(s.c_nationkey AS VARCHAR), chr(1)),
                 coalesce(CAST(s.c_mktsegment AS VARCHAR), chr(1)))) AS sh
      FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
    )
    SELECT status, COUNT(*) AS n FROM (
      SELECT CASE WHEN tk IS NULL THEN 'added'
                  WHEN sk IS NULL THEN 'removed'
                  WHEN th <> sh THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM j
    ) GROUP BY status
    """,
    tags=("dq", "join"),
)
def dq_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table reconciliation (anti-entropy diff): classify every key of
    old-vs-new relation as added / removed / changed / unchanged via ONE
    key-partitioned full outer join comparing md5 row fingerprints — the
    migration-validation and replica-consistency primitive (how you prove
    a backfill or a MERGE produced exactly the intended delta; here the
    'new' side is a deterministic mutation of customer: every 10th
    segment rewritten, one key inserted, every 97th≡3 key deleted).

    Scale: rows hash to fixed-width fingerprints at the scan (map-only),
    the diff is one shuffle on the key, and the report aggregates to
    |statuses| rows — no row data ever moves except the key + 32-byte
    hash, which is why this works on billion-row tables."""
    c = load(spark, sf_dir, "customer")
    target = c.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    source = (
        c.filter(F.col("c_custkey") % 97 != 3)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.when(
                F.col("c_custkey") % 10 == 0,
                F.concat(F.lit("SEG2_"), F.col("c_mktsegment")),
            )
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            spark.sql(
                "SELECT -1L AS c_custkey, 'NEW_CUSTOMER' AS c_name, "
                "0 AS c_nationkey, 'BUILDING' AS c_mktsegment"
            )
        )
    )

    def fp(df, key, hname):
        # NULL-unambiguous fingerprint: concat_ws SKIPS null arguments, so
        # (NULL,'a') and ('a',NULL) — or values shifted across columns by
        # an embedded delimiter — would collide under a bare '|' join and
        # misreport a changed row as 'unchanged'. Each field therefore
        # gets an explicit NULL sentinel (\x01) and a control-char field
        # separator (\x02) that cannot appear in this data. Mirrored
        # chr(1)/chr(2) in the oracle.
        cells = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
            for c in ("c_name", "c_nationkey", "c_mktsegment")
        ]
        return df.select(
            F.col("c_custkey").alias(key),
            F.md5(F.concat_ws("\x02", *cells).cast("binary")).alias(hname),
        )

    j = fp(target, "tk", "th").join(
        fp(source, "sk", "sh"), F.col("tk") == F.col("sk"), "full_outer"
    )
    status = (
        F.when(F.col("tk").isNull(), "added")
        .when(F.col("sk").isNull(), "removed")
        .when(F.col("th") != F.col("sh"), "changed")
        .otherwise("unchanged")
    )
    return j.select(status.alias("status")).groupBy("status").agg(
        F.count("*").alias("n")
    )


@register(
    "scan_parquet_codec_zstd",
    oracle="SELECT p_partkey, p_name, round(p_retailprice, 6) AS p_retailprice FROM part",
    tags=("scan", "parquet", "codec"),
)
def scan_parquet_codec_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-controlled parquet roundtrip (zstd): at 100 TB the
    storage/CPU codec tradeoff is a first-class knob — zstd typically
    halves footprint vs snappy for ~equal scan speed; correctness must
    be codec-invariant, which the identity oracle checks."""
    tmp = io_scratch("part_zstd", sf_dir, source="part")
    load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice"
    ).write.mode("overwrite").option("compression", "zstd").parquet(tmp)
    back = spark.read.parquet(tmp)
    return back.select(
        "p_partkey", "p_name", F.round("p_retailprice", 6).alias("p_retailprice")
    )


@register(
    "observe_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS gross,
           COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
    FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
    """,
    tags=("dq", "observe"),
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.observe`` (named Observation): pipeline metrics
    accumulated ON THE SAME PASS as the real action — zero extra scans,
    the production pattern for row-count / money-total / quality-rate
    telemetry on every batch (vs dq_constraint_report, which is a
    dedicated audit query). The observed frame is driven by a noop-sink
    write (metrics arrive via QueryExecution listeners, not a second
    job); the returned 1-row frame is the metric record, and the oracle
    recomputes the same aggregates directly."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1996-01-01"
    )
    obs = Observation("lks_batch_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        money_sum_units(units("l_extendedprice"), 2).alias("gross"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["gross"], m["n_discounted"])],
        "n_rows bigint, gross double, n_discounted bigint",
    )


@register(
    "sink_zorder_clustered",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_qty
    FROM lineitem
    WHERE l_partkey BETWEEN 50 AND 80 AND l_suppkey BETWEEN 2 AND 5
    GROUP BY l_returnflag
    """,
    tags=("scan", "sink", "scale"),
)
def sink_zorder_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton space-filling-curve) clustering: interleave the
    bits of TWO filter dimensions (l_partkey, l_suppkey) into one sort
    key, range-partition + sort the layout by it, and re-read with a
    two-dimensional band filter. Unlike single-key clustering
    (sink_clustered_sorted), points close in the 2-D key space land in
    the same row groups, so min/max stats prune a 2-D predicate — the
    vanilla-Spark form of Delta/Iceberg Z-ORDER table maintenance. The
    interleave is a pure codegen bit expression; the oracle is the same
    aggregate over the unclustered source (layout must never change
    results)."""
    tmp = io_scratch("lineitem_zorder", sf_dir, source="lineitem")
    # 25-bit × 2 Morton interleave: bit i of partkey -> bit 2i, bit i of
    # suppkey -> bit 2i+1; 50-bit key, fits BIGINT. The width must cover
    # the KEY DOMAIN, not just the test fixture: TPC-H l_partkey reaches
    # 200k·SF (18 bits at sf1, 25 bits at sf100) — a 16-bit interleave
    # aliases high keys onto low z-values from ~sf0.4, silently collapsing
    # the 2-D locality the clustering exists for (results stay correct;
    # the pruning doesn't). One SQL string (one py4j call), pure codegen.
    z = " + ".join(
        f"(((l_partkey >> {i}) & 1) << {2 * i}) + "
        f"(((l_suppkey >> {i}) & 1) << {2 * i + 1})"
        for i in range(25)
    )
    li = load(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey", "l_suppkey", "l_returnflag", "l_quantity",
        f"({z}) AS __zkey",
    )
    (
        li.repartitionByRange(8, "__zkey")
        .sortWithinPartitions("__zkey")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    back = spark.read.parquet(tmp).filter(
        F.col("l_partkey").between(50, 80) & F.col("l_suppkey").between(2, 5)
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        money_sum_units(units("l_quantity"), 2).alias("total_qty"),
    )


@register(
    "dq_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 100) AS BIGINT) AS acctbal_band,
           COUNT(*) AS group_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < 10
    """,
    tags=("dq", "privacy"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=10) over the quasi-identifier triple
    (nation, market segment, account-balance band): every QI combination
    shared by fewer than k individuals is a re-identification risk and
    must be generalized or suppressed before the table leaves the
    privacy boundary — the standard pre-release check on training data
    containing person-level rows. Output is the violating groups with
    their sizes (the suppression worklist), not the individuals. The
    width-100 balance band is the numeric quasi-identifier that makes
    the audit bite at EVERY fixture scale (a 2-column QI saturates to
    all-groups-safe by sf1, which would make the scaled differential
    check vacuous — the 0-row-oracle trap).

    Scale: one shuffle on the QI key with map-side partial counts;
    output is bounded by QI-combination cardinality, never row count."""
    c = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 100).cast("long")
    return (
        c.groupBy(
            "c_nationkey", "c_mktsegment", band.alias("acctbal_band")
        )
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < 10)
    )


@register(
    "dq_profile_columns",
    oracle="""
    SELECT 'l_quantity' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_null,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v,
           round(SUM(l_quantity) / COUNT(l_quantity), 6) AS mean_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
           COUNT(DISTINCT l_extendedprice),
           MIN(l_extendedprice), MAX(l_extendedprice),
           round(SUM(l_extendedprice) / COUNT(l_extendedprice), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           MIN(l_discount), MAX(l_discount),
           round(SUM(l_discount) / COUNT(l_discount), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax),
           MIN(l_tax), MAX(l_tax),
           round(SUM(l_tax) / COUNT(l_tax), 6)
    FROM lineitem
    """,
    tags=("dq",),
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling pass (ANALYZE TABLE / data-catalog statistics):
    per numeric column, row count, null count, exact distinct count,
    min/max, and mean — the statistics a catalog publishes and a CBO or
    data-quality monitor consumes. Computed in ONE scan: all per-column
    aggregates evaluate in a single global agg, then unpivot to the
    (column, stats) long form driver-side-free via stack().

    Determinism: the mean divides the double sum by the non-null count
    on both engines (round-6 absorbs summation-order ulps); min/max and
    exact distinct counts are value-exact on identical doubles.
    Scale: one pass, no shuffle beyond the 1-row global agg; distinct
    counts are the only memory-bearing state (per-column hash sets in
    partial aggregation, spillable; swap for approx_count_distinct when
    exactness is not contractual)."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n_rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.min(c).alias(f"{c}__min_v"),
            F.max(c).alias(f"{c}__max_v"),
            F.round(F.sum(c) / F.count(c), 6).alias(f"{c}__mean_v"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_null, {c}__n_distinct, "
        f"{c}__min_v, {c}__max_v, {c}__mean_v"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col, n_rows, n_null, n_distinct, min_v, max_v, mean_v)"
    )


@register(
    "scan_csv_permissive_corrupt",
    oracle="""
    SELECT (c_custkey % 97 = 0) AS is_corrupt,
           COUNT(*) AS n,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key,
           CAST(CAST(SUM(CASE WHEN c_custkey % 97 = 0 THEN NULL
                         ELSE CAST(c_acctbal AS DECIMAL(18,2)) END)
                AS VARCHAR) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY 1
    """,
    tags=("scan", "csv", "dq"),
)
def scan_csv_permissive_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling on ingest: a CSV feed with a
    deterministically corrupted numeric field (every custkey % 97 == 0
    row carries a non-numeric balance) read back in PERMISSIVE mode with
    a corrupt-record column — the production posture where one bad row
    must quarantine, not kill the job (DROPMALFORMED silently loses
    data; FAILFAST turns one upstream typo into an outage). Spark's
    field-level semantics: the malformed column parses to NULL, the raw
    line lands in the corrupt column, intact fields still parse — the
    output proves it by keying on custkey (parsed on BOTH sides of the
    split) and summing only clean balances.

    Scale: the quarantine flag is map-side; one 2-key rollup. The
    corrupt-line column is the reprocessing queue a real pipeline writes
    to a dead-letter sink."""
    tmp = io_scratch("customer_csvbad", sf_dir, source="customer")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    bal = F.when(
        F.col("c_custkey") % 97 == 0, F.lit("oops")
    ).otherwise(F.col("c_acctbal").cast("string"))
    c.select(
        F.concat_ws(",", F.col("c_custkey"), bal).alias("value")
    ).write.mode("overwrite").text(tmp)
    back = (
        spark.read.schema("c_custkey long, c_acctbal double, _corrupt string")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(tmp)
    )
    return (
        back.groupBy(F.col("_corrupt").isNotNull().alias("is_corrupt"))
        .agg(
            F.count("*").alias("n"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
            money_sum_units(units("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@register(
    "dq_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders
    ), agged AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    )
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_expected
    FROM agged
    """,
    tags=("dq", "profiling"),
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen (fraud/anomaly profiling staple):
    distribution of the leading significant digit of o_totalprice vs the
    log10(1+1/d) expectation. The digit comes from the INTEGER part's
    string form — never floating log10 of the value, whose last-ulp libm
    differences across engines could flip floor() at decade boundaries.
    One hash aggregate over 9 groups + a single-row window for the share;
    map-side combine makes this a scan-dominated plan at any scale."""
    o = load(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    agged = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    return agged.select(
        "digit",
        "n",
        r6(F.col("n").cast("double") / F.sum("n").over(W.partitionBy())).alias(
            "share"
        ),
        r6(F.log10(1.0 + 1.0 / F.col("digit"))).alias("benford_expected"),
    )


@register(
    "union_by_name_missing",
    oracle="""
    SELECT c_custkey AS key, 'customer' AS src, CAST(NULL AS DOUBLE) AS total
    FROM customer WHERE c_custkey <= 200
    UNION ALL
    SELECT o_custkey AS key, 'orders' AS src, o_totalprice AS total
    FROM orders WHERE o_custkey <= 200
    """,
    tags=("setop",),
)
def union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unionByName(allowMissingColumns=True)``: schema-evolving union —
    the narrower side is padded with typed NULLs for columns only the
    other side carries, matched BY NAME (not position). The everyday
    shape when unioning a v1 and a v2 extract of the same feed; positional
    union would silently misalign. Oracle: explicit NULL-padded UNION ALL."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 200)
        .select(F.col("c_custkey").alias("key"), F.lit("customer").alias("src"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(
            F.col("o_custkey").alias("key"),
            F.lit("orders").alias("src"),
            F.col("o_totalprice").alias("total"),
        )
    )
    return c.unionByName(o, allowMissingColumns=True)


@register(
    "dq_l_diversity",
    oracle="""
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 100) AS BIGINT) AS acctbal_band,
           COUNT(*) AS group_size,
           COUNT(DISTINCT c_mktsegment) AS l_distinct
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT c_mktsegment) < 3
    """,
    tags=("dq", "privacy"),
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) — k-anonymity's complement: a QI group can
    be large (k-safe) yet still leak if nearly everyone in it shares the
    SENSITIVE value (here the market segment stands in for one). Groups
    whose sensitive attribute takes fewer than l distinct values are the
    homogeneity-attack worklist. Scale: one shuffle on the QI key; the
    distinct count is per-group (map-side partials on (QI, sensitive)),
    output bounded by QI cardinality."""
    c = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 100).cast("long")
    return (
        c.groupBy("c_nationkey", band.alias("acctbal_band"))
        .agg(
            F.count("*").alias("group_size"),
            F.countDistinct("c_mktsegment").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < 3)
    )


@register(
    "scan_xml_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("scan", "xml"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + schema'd XML scan via Spark 4's NATIVE xml format
    (spark-xml graduated into the engine, SPARK-44265) — the remaining
    feed format next to csv/json/text for enterprise-integration inputs.
    rowTag framing on both sides; explicit schema on read (inference
    re-reads the data, same rule as the CSV scan)."""
    tmp = io_scratch("region_xml", sf_dir, source="region")
    load(spark, sf_dir, "region").select("r_regionkey", "r_name").write.mode(
        "overwrite"
    ).format("xml").option("rowTag", "region").save(tmp)
    return (
        spark.read.schema("r_regionkey int, r_name string")
        .format("xml")
        .option("rowTag", "region")
        .load(tmp)
    )


@register(
    "dq_table_checksum",
    oracle=f"""
    WITH fp AS (
      SELECT {_sketches.portable_hash_sql("row_str")} AS h FROM (
        SELECT concat_ws(chr(2),
                 CAST(o_orderkey AS VARCHAR),
                 coalesce(CAST(o_custkey AS VARCHAR), chr(1)),
                 coalesce(o_orderstatus, chr(1)),
                 coalesce(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), chr(1)),
                 coalesce(CAST(epoch_us(o_orderdate)//1000000 AS VARCHAR), chr(1)),
                 coalesce(o_orderpriority, chr(1))) AS row_str
        FROM orders
      )
    )
    SELECT COUNT(*) AS n_rows, bit_xor(h) AS checksum FROM fp
    """,
    tags=("dq", "agg", "scalar"),
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum: one (n_rows, xor-of-row-hashes)
    pair — the cheap cross-cluster integrity check when the OTHER copy is
    on a different system (dq_table_diff needs both tables in one engine;
    a checksum travels as 16 bytes). XOR over per-row 60-bit portable
    hashes is partition-order- and row-order-invariant by construction,
    so any engine computing the same canonical row rendering agrees
    exactly. Row rendering is the NULL-unambiguous chr(2)/chr(1) form
    shared with dq_table_diff, with doubles canonicalized through
    DECIMAL(18,2) and timestamps through epoch seconds (engine-native
    float/timestamp → string renderings differ; integers don't).

    Scale: map-only hash + a single partial-combining global agg."""
    from lagom_kinesis_spark.operators.similarity import portable_token_hash

    o = load(spark, sf_dir, "orders")
    nul = F.lit("\x01")
    row_str = F.concat_ws(
        "\x02",
        F.col("o_orderkey").cast("string"),
        F.coalesce(F.col("o_custkey").cast("string"), nul),
        F.coalesce(F.col("o_orderstatus"), nul),
        F.coalesce(dec("o_totalprice").cast("string"), nul),
        F.coalesce(
            F.floor(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / 1_000_000
            ).cast("string"),
            nul,
        ),
        F.coalesce(F.col("o_orderpriority"), nul),
    )
    return o.select(portable_token_hash(row_str).alias("h")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(h)").alias("checksum"),
    )


@register(
    "scan_json_multiline",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan", "json"),
)
def scan_json_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multiLine JSON scan: one pretty-printed JSON ARRAY per file (the
    API-response / config-dump shape) instead of line-delimited records —
    needs ``multiLine=true`` because a record spans lines, which also
    means a FILE is the split unit (no intra-file parallelism): fine for
    the many-small-files ingest this mode exists for, wrong for a single
    giant array — the docstring of record, since jsonl stays the at-rest
    format (scan_json_roundtrip). Fixture prep renders the 25-row nation
    dim driver-side (bounded); the scan back is distributed."""
    import json as _json
    import os

    from lagom_kinesis_spark.catalog import io_scratch

    tmp = io_scratch("nation_mljson", sf_dir, source="nation")
    os.makedirs(tmp, exist_ok=True)
    rows = (
        load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect()
    )  # 25-row dimension — bounded driver materialization
    with open(os.path.join(tmp, "nation.json"), "w") as fh:
        _json.dump([r.asDict() for r in rows], fh, indent=2)
    return (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("multiLine", True)
        .json(tmp)
    )


@register(
    "scan_recursive_file_lookup",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("scan", "parquet"),
)
def scan_recursive_file_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``recursiveFileLookup=true``: ingest a NESTED directory tree as
    plain files, ignoring partition-directory semantics — the posture for
    lakes organized by arbitrary convention (team/date/batch trees that
    are NOT key=value partitions). The fixture lays orders out under
    nested non-partition dirs via partitionBy + rename; the recursive
    scan must find every file and, because partition semantics are OFF,
    the partition column must come from the data, not the path — hence
    the layout keeps the column in the files (no partitionBy pruning
    here; scan_partition_pruned covers that contract)."""
    import glob
    import os
    import shutil

    tmp = io_scratch("orders_tree", sf_dir, source="orders")
    marker = os.path.join(tmp, "_TREE_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(tmp, ignore_errors=True)
        flat = f"{tmp}_flat"
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).repartition(4).write.mode("overwrite").parquet(flat)
        # nest the files two levels deep under non-key=value names
        for i, f in enumerate(sorted(glob.glob(f"{flat}/part-*.parquet"))):
            sub = os.path.join(tmp, f"team{i % 2}", f"batch{i}")
            os.makedirs(sub, exist_ok=True)
            os.rename(f, os.path.join(sub, os.path.basename(f)))
        shutil.rmtree(flat, ignore_errors=True)
        open(marker, "w").close()
    return (
        spark.read.option("recursiveFileLookup", True)
        .schema("o_orderkey long, o_orderpriority string")
        .parquet(tmp)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "scan_csv_dialect",
    oracle="SELECT s_suppkey, s_name, s_acctbal FROM supplier",
    tags=("scan", "csv"),
)
def scan_csv_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-default CSV dialect roundtrip: semicolon separator,
    single-quote quoting, backslash escape — the European-export /
    legacy-feed shape where assuming comma/double-quote silently
    misparses every row that contains the real delimiter. Writer and
    reader pin the SAME dialect options; explicit schema as always."""
    tmp = io_scratch("supplier_dialect", sf_dir, source="supplier")
    load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    ).write.mode("overwrite").options(
        sep=";", quote="'", escape="\\", header=True
    ).csv(tmp)
    return (
        spark.read.schema("s_suppkey long, s_name string, s_acctbal double")
        .options(sep=";", quote="'", escape="\\", header=True)
        .csv(tmp)
    )
