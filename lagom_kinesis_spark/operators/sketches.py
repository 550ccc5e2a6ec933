"""Portable probabilistic sketches over the md5 portable hash — HyperLogLog
(distinct counts + set algebra), Count-Min (point frequencies), and a
sectioned Bloom filter (membership prefilter) — every one of whose outputs
is bit-for-bit reproducible by a SQL oracle.

Engine-private sketch binaries (Spark's HLL++ `approx_count_distinct`,
DataSketches `hll_sketch_agg`) can only ever be tolerance-checked across
engines. This module rebuilds the classic structures on the same
cross-engine hash discipline as operators/similarity.portable_token_hash,
keeping every internal quantity exact int64 so no floating-point summation
order can perturb a result. The HLL (Flajolet et al. 2007) layout:

- hash  = first 15 hex chars of md5(key-as-string) as a positive int64
          (60 bits; identical in Spark, DuckDB, and Python — pinned by
          tests/test_properties.py::test_portable_token_hash_cross_engine)
- idx   = top 12 bits  -> 4096 registers
- rho   = leading-zero rank of the remaining 48-bit suffix (1..49),
          computed with INTEGER STRING ops (length of bin() sans leading
          zeros) — never log2(), whose libm rounding differs across engines
- union = per-register max (commutative + associative -> merge-order-free,
          which is what makes the value deterministic under ANY partitioning)
- sum   = harmonic term accumulated as exact int64: each register
          contributes 2^(49-rho), so the total is <= 4096 * 2^49 < 2^63 —
          NO floating-point summation anywhere, hence no ordering sensitivity
- est   = alpha * m^2 * 2^49 / sum (one double divide of identical ints),
          with the standard small-range linear-counting correction

At 100 TB the shape is the same as native HLL: map-side partial max per
(group, register), a shuffle of at most |groups| x 4096 tiny rows, and a
register-wise max to union any rollup without re-scanning. The md5 cost is
per-row-scan only; native approx_count_distinct remains the raw-throughput
choice and stays tolerance-tested in tests/test_operators.py.

Reference parity: the reference has no sketches (transport only); this
backs SURVEY.md §2B's approx-distinct rows with a driver-checkable oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^P registers.
HLL_P = 12
HLL_M = 1 << HLL_P
#: Bits of hash suffix feeding rho (60-bit portable hash minus P index bits).
HLL_W_BITS = 48
#: Bias constant alpha_m for m >= 128. Computed with the EXACT float-op
#: sequence the oracle SQL repeats (0.7213 / (1 + 1.079 / m)) so both
#: engines hold the identical double.
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def portable_key_hash(col: Column) -> Column:
    """60-bit md5 portable hash of any key, via its canonical string form.
    Integer-to-string rendering is identical across engines for integral
    types; pass strings through unchanged. Delegates to
    similarity.portable_token_hash — ONE definition of the load-bearing
    cross-engine hash, so the two can never desync from the oracle
    renderings (portable_hash_sql)."""
    from lagom_kinesis_spark.operators.similarity import portable_token_hash

    return portable_token_hash(col.cast("string"))


def hll_registers(
    df: DataFrame, key: Column, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Per-group HLL registers: one row per (group, idx) with the max rho.
    This IS the sketch — 4096 tiny rows per group, mergeable by
    register-wise max. Partial aggregation applies (max is commutative),
    so the shuffle carries at most |groups| x 4096 rows regardless of
    input size."""
    h = portable_key_hash(key)
    rho = F.when(F.col("__hll_w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.expr("ltrim('0', bin(__hll_w))"))
    )
    # NULL keys are not values: like COUNT(DISTINCT), they must not mint
    # a register (md5(NULL)=NULL would survive as a bogus NULL-idx row
    # that skews the estimate). Unreachable on the NOT NULL fixture keys,
    # so oracle parity is unaffected.
    df = df.filter(key.isNotNull())
    hashed = df.select(
        *group_cols,
        F.shiftright(h, HLL_W_BITS).alias("__hll_idx"),
        h.bitwiseAND(F.lit((1 << HLL_W_BITS) - 1)).alias("__hll_w"),
    ).select(*group_cols, "__hll_idx", rho.alias("__hll_rho"))
    return hashed.groupBy(*group_cols, "__hll_idx").agg(
        F.max("__hll_rho").alias("__hll_rho")
    )


def hll_union(registers: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Union sketches by register-wise max — the cheap rollup that never
    re-scans data. Drop group columns from `group_cols` to merge across
    them (e.g. per-day sketches -> one global sketch)."""
    return registers.groupBy(*group_cols, "__hll_idx").agg(
        F.max("__hll_rho").alias("__hll_rho")
    )


def hll_estimate(
    registers: DataFrame, group_cols: Sequence[str] = (), alias: str = "est"
) -> DataFrame:
    """Distinct-count estimate from registers, rounded to 6 places.

    The harmonic sum is EXACT int64 (sum of 2^(49-rho) over present
    registers plus 2^49 per absent register); the only float ops are one
    multiply-chain/divide on identical operands — deterministic IEEE — and
    ln() in the small-range branch (libm; its >=1e-12 relative agreement is
    far inside the 1e-6 rounding)."""
    two49 = 1 << (HLL_W_BITS + 1)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1L, {HLL_W_BITS + 1} - __hll_rho)")).alias("__sp"),
        F.count("*").alias("__present"),
    )
    s_int = F.col("__sp") + (F.lit(HLL_M) - F.col("__present")) * F.lit(two49)
    raw = (
        F.lit(HLL_ALPHA)
        * F.lit(HLL_M)
        * F.lit(HLL_M)
        * F.lit(float(two49))
        / s_int.cast("double")
    )
    zeros = F.lit(HLL_M) - F.col("__present")
    est = F.when(
        (zeros > 0) & (raw <= 2.5 * HLL_M),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias(alias))


def portable_hash_sql(expr: str) -> str:
    """DuckDB rendering of portable_key_hash(expr): hex-digit fold of the
    first 15 md5 chars into a positive int64.

    CAUTION: the rendering wraps ``expr`` inside a ``list_transform``
    lambda that binds ``i`` — a caller column named ``i`` referenced in
    ``expr`` is silently shadowed (constant hash per row). Name row
    variables in embedding SQL something else (see dedup_cdc_chunks's
    ``p``)."""
    return (
        "list_sum(list_transform(range(1, 16), i -> "
        f"(strpos('0123456789abcdef', substr(md5(CAST(({expr}) AS VARCHAR)), i, 1)) - 1)::BIGINT"
        " << (4 * (15 - i))))::BIGINT"
    )


# ---------------------------------------------------------------------------
# Portable Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

#: d rows x 2^CMS_W_BITS counters. Row positions are the d disjoint 10-bit
#: slices of the 60-bit portable hash (bit-slicing in lieu of d independent
#: hash functions — sound while d * CMS_W_BITS <= hash width).
CMS_D = 4
CMS_W_BITS = 10
CMS_W = 1 << CMS_W_BITS


def cms_position(h: Column, j: int) -> Column:
    """Row-j counter index: the j-th CMS_W_BITS-bit slice of the hash."""
    return F.shiftright(h, CMS_W_BITS * j).bitwiseAND(F.lit(CMS_W - 1))


def _cms_cells(key: Column) -> Column:
    h = portable_key_hash(key)
    return F.array(
        *[
            F.struct(F.lit(j).alias("j"), cms_position(h, j).alias("pos"))
            for j in range(CMS_D)
        ]
    )


def cms_counters(occurrences: DataFrame, key: Column) -> DataFrame:
    """d x w counter table from an occurrence relation (one row per
    occurrence): explode each occurrence into its d (j, pos) cells and
    count per cell. Counts are EXACT integers, so the whole sketch — and
    any min-over-rows estimate read from it — is bit-reproducible by a SQL
    oracle. Partial aggregation collapses cells map-side; the shuffle
    carries at most d*w (=4096) rows per map partition regardless of input
    size, and the finished table is broadcast-sized for estimate joins.
    Merging sketches of two corpora = cell-wise SUM (counts are additive),
    the same rollup-without-rescan shape as hll_union."""
    cells = occurrences.select(F.explode(_cms_cells(key)).alias("c"))
    return cells.groupBy(
        F.col("c.j").alias("j"), F.col("c.pos").alias("pos")
    ).agg(F.count("*").alias("c"))


def cms_estimate(queries: DataFrame, key: Column, counters: DataFrame) -> DataFrame:
    """Point-frequency estimates for `queries` rows: min over the d
    counters the key hashes to (always >= the true count). Broadcast
    hash-join against the 4096-row counter table — map-only at any scale.

    Precondition (same as bloom_maybe_contains): `queries` rows must be
    DISTINCT — the final groupBy over the probe columns collapses
    duplicate probe rows into one output row — and must not already carry
    columns named ``j``/``pos``/``__c`` (internal join keys)."""
    qcells = queries.select(
        "*", F.explode(_cms_cells(key)).alias("__c")
    ).select("*", F.col("__c.j").alias("j"), F.col("__c.pos").alias("pos"))
    # LEFT join + zero-fill: a counter cell with count 0 has no row in
    # cms_counters' output, and an inner join would (a) drop an absent
    # key entirely instead of answering 0 and (b) take the min over only
    # its NON-zero cells, overestimating where the canonical sketch
    # proves absence. Unreachable for present-key probes (every cell a
    # present key touches counts at least itself), so oracle parity for
    # the heavy-hitter query is unaffected.
    return (
        qcells.join(F.broadcast(counters), ["j", "pos"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .groupBy(*queries.columns)
        .agg(F.min("c").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter (Bloom 1970), k-sectioned
# ---------------------------------------------------------------------------

#: k sections of 2^BLOOM_POS_BITS bits each; positions are the k disjoint
#: 15-bit slices of the 60-bit portable hash (so k * BLOOM_POS_BITS uses the
#: hash exactly). Sectioned ("partitioned") Bloom keeps the k probes
#: independent by construction.
BLOOM_K = 4
BLOOM_POS_BITS = 15
BLOOM_SECTION = 1 << BLOOM_POS_BITS


def _bloom_cells(key: Column) -> Column:
    h = portable_key_hash(key)
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.shiftright(h, BLOOM_POS_BITS * j)
                .bitwiseAND(F.lit(BLOOM_SECTION - 1))
                .alias("pos"),
            )
            for j in range(BLOOM_K)
        ]
    )


def bloom_bits(keys: DataFrame, key: Column) -> DataFrame:
    """The Bloom bit SET as a relation: distinct (section, position) rows
    lit by any key — at most k * 2^15 tiny rows however many keys went in,
    i.e. always broadcast-sized. Represented relationally (not as a packed
    binary) so the set is engine-neutral and a SQL oracle can rebuild it
    bit-for-bit; union of two filters = UNION DISTINCT of their rows."""
    return (
        keys.select(F.explode(_bloom_cells(key)).alias("c"))
        .select(F.col("c.j").alias("j"), F.col("c.pos").alias("pos"))
        .distinct()
    )


def bloom_maybe_contains(
    probes: DataFrame, key: Column, bits: DataFrame
) -> DataFrame:
    """Rows of `probes` the filter MIGHT contain (all k probe positions
    lit — no false negatives, small controlled false-positive rate).
    Broadcast hash-join against the bit relation, then an all-k count
    check: map-only over the probe side at any scale. `probes` rows must
    be distinct (the hit count is per row-value)."""
    cells = probes.select(
        "*", F.explode(_bloom_cells(key)).alias("__c")
    ).select("*", F.col("__c.j").alias("j"), F.col("__c.pos").alias("pos"))
    return (
        cells.join(F.broadcast(bits), ["j", "pos"])
        .groupBy(*probes.columns)
        .agg(F.count("*").alias("__k_hit"))
        .filter(F.col("__k_hit") == BLOOM_K)
        .drop("__k_hit")
    )


# ---------------------------------------------------------------------------
# Portable KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta et al. 2016)
# ---------------------------------------------------------------------------

#: Retained minimum hash values per sketch. 64 keeps the sketch broadcast-
#: sized and, at the sf0.01 gate (150 distinct users per event_type),
#: saturates so the ESTIMATION path — not the exact-set fallback — is what
#: the oracle checks.
THETA_K = 64
#: The portable hash is uniform on [0, 2^60); theta lives in that domain.
THETA_DOMAIN = 1 << 60


def kmv_sketch(
    df: DataFrame, key: Column, group_cols: Sequence[str] = (), k: int = THETA_K
) -> DataFrame:
    """Per-group KMV (theta) sketch: the k smallest DISTINCT portable
    hashes, one row each — (group_cols..., __kmv_h). Unlike HLL this
    sketch supports DIRECT intersection / difference estimates (theta set
    algebra): the retained values below a common theta are a uniform
    coordinated sample of the union, so any boolean set expression is just
    set ops on the retained rows.

    Scale shape: dropDuplicates partial-aggregates map-side (the shuffle
    carries distinct (group, hash) pairs, not occurrences); the ranked
    window is a spillable per-group sort emitting at most k rows per
    group. Merge law (exploited by the oracle and proved in
    tests/test_operators.py): k-smallest-of(union of per-segment k-smallest
    sets) == k-smallest-of(union of the raw sets), because any value in the
    union's true bottom-k is necessarily in its own segment's bottom-k —
    so per-day/per-segment sketches roll up without re-scanning, the same
    architecture as hll_union. At extreme per-group skew, pre-filter
    h < k * DOMAIN / lower_bound(n_distinct) before the sort."""
    from pyspark.sql.window import Window

    h = portable_key_hash(key)
    distinct = df.select(
        *group_cols, h.alias("__kmv_h")
    ).dropDuplicates([*group_cols, "__kmv_h"])
    if not group_cols:
        # Global sketch: an empty partitionBy would move EVERY distinct
        # hash into one window task. orderBy+limit plans as TakeOrdered
        # (per-partition heaps + driver merge) — same bottom-k, no
        # single-task sort.
        return distinct.orderBy("__kmv_h").limit(k)
    w = Window.partitionBy(*group_cols).orderBy("__kmv_h")
    return (
        distinct.withColumn("__kmv_rn", F.row_number().over(w))
        .filter(F.col("__kmv_rn") <= k)
        .drop("__kmv_rn")
    )


def kmv_theta(
    sketch: DataFrame, group_cols: Sequence[str] = (), k: int = THETA_K
) -> DataFrame:
    """Per-group theta: the k-th smallest hash when the sketch saturated,
    else THETA_DOMAIN (the sketch IS the exact distinct-hash set). Exact
    int64 both ways — the only float op downstream is the final estimate
    divide on identical operands."""
    return (
        sketch.groupBy(*group_cols)
        .agg(F.max("__kmv_h").alias("__kmv_max"), F.count("*").alias("__kmv_n"))
        .select(
            *group_cols,
            F.when(F.col("__kmv_n") >= k, F.col("__kmv_max"))
            .otherwise(F.lit(THETA_DOMAIN))
            .alias("__kmv_theta"),
            F.col("__kmv_n"),
        )
    )


def kmv_estimate_expr(n_col: Column, theta_col: Column) -> Column:
    """Distinct-count estimate from (sample size below theta, theta):
    n * DOMAIN / theta, rounded to 6 places. When theta == DOMAIN the
    sample is the whole set and the expression reduces to exactly n
    (n * 2^60 is an exact double for n < 2^53-60). The int64 → double
    casts are IEEE round-to-nearest on both engines, so the estimate is
    bit-reproducible by the SQL oracle."""
    return F.round(
        n_col.cast("double") * F.lit(float(THETA_DOMAIN)) / theta_col.cast("double"),
        6,
    )


def kmv_sketch_sql(
    source_sql: str, key_sql: str, group_cols: Sequence[str] = (), k: int = THETA_K
) -> str:
    """DuckDB SQL reproducing kmv_sketch bit-for-bit: distinct portable
    hashes per group, ranked, bottom-k. Yields (group_cols..., h)."""
    g = ", ".join(group_cols)
    g_pre = f"{g}, " if g else ""
    part = f"PARTITION BY {g} " if g else ""
    return f"""(
      SELECT {g_pre}h FROM (
        SELECT {g_pre}h,
               row_number() OVER ({part}ORDER BY h) AS rn
        FROM (
          SELECT DISTINCT {g_pre}{portable_hash_sql(key_sql)} AS h
          FROM {source_sql}
        )
      ) WHERE rn <= {k}
    )"""


def hll_oracle_sql(
    source_sql: str, key_sql: str, group_cols: Sequence[str] = (), alias: str = "est"
) -> str:
    """DuckDB SQL reproducing hll_registers -> hll_estimate bit-for-bit.
    `source_sql` is a relation expression (table name or subquery),
    `key_sql` the key expression rendered AS VARCHAR by the caller when
    non-integral."""
    g = ", ".join(group_cols)
    g_pre = f"{g}, " if g else ""
    g_by = f"GROUP BY {g}" if g else ""
    two49 = 1 << (HLL_W_BITS + 1)
    mask = (1 << HLL_W_BITS) - 1
    return f"""
    WITH __h AS (
      SELECT {g_pre}{portable_hash_sql(key_sql)} AS h
      FROM {source_sql}
    ), __r AS (
      SELECT {g_pre}h >> {HLL_W_BITS} AS idx,
             MAX(CASE WHEN h & {mask} = 0 THEN {HLL_W_BITS + 1}
                      ELSE {HLL_W_BITS + 1} - length(ltrim(bin(h & {mask}), '0'))
                 END) AS rho
      FROM __h GROUP BY {g_pre}idx
    ), __s AS (
      SELECT {g_pre}SUM(1::BIGINT << ({HLL_W_BITS + 1} - rho))::BIGINT
             + ({HLL_M} - COUNT(*)) * {two49}::BIGINT AS s_int,
             {HLL_M} - COUNT(*) AS zeros
      FROM __r {g_by}
    )
    SELECT {g_pre}round(
      CASE WHEN zeros > 0
            AND (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {HLL_M})
                 * {HLL_M} * {HLL_M} * {two49}::DOUBLE / s_int::DOUBLE) <= 2.5 * {HLL_M}
           THEN {HLL_M}::DOUBLE * ln({HLL_M}::DOUBLE / zeros::DOUBLE)
           ELSE 0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {HLL_M})
                * {HLL_M} * {HLL_M} * {two49}::DOUBLE / s_int::DOUBLE
      END, 6) AS {alias}
    FROM __s
    """
