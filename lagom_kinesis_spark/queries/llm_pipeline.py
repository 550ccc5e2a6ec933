"""Training-data curation pipeline operators (driver mandate, LLM block):
deterministic sampling & source mixing, benchmark decontamination,
repetition filtering, PII masking, embedding quantization & centroids.

These extend ``llm_ops.py``'s dedup/similarity/text family with the
*pipeline-assembly* steps a 100 TB pretraining corpus build needs between
dedup and tokenization. Every operator is engine-deterministic by
construction (md5-prefix bucketing instead of rand(); exact integer /
canonical-string outputs) so each carries a full DuckDB oracle.

Scale notes:
- sampling/mixing are map-only or per-source-partitioned windows — no
  global ordering anywhere;
- decontamination joins the corpus against a *broadcast* distinct n-gram
  set of the (always comparatively tiny) benchmark suite;
- embedding ops posexplode to (vec, dim) rows — 64× row inflation with
  partial aggregation, which distributes evenly; no vector ever needs to
  see another vector except through the (label, dim)-keyed centroid join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from lagom_kinesis_spark.catalog import load
from lagom_kinesis_spark.functions import events_cte, fan_out, r6
from lagom_kinesis_spark.operators import sketches
from lagom_kinesis_spark.registry import register


def _md5_prefix(col: F.Column, n: int) -> F.Column:
    """First ``n`` hex chars of md5(value-as-string) — an engine-agnostic
    uniform hash bucket (DuckDB: ``substr(md5(CAST(x AS VARCHAR)), 1, n)``).
    rand()/xxhash64 are engine- or seed-specific; md5 of the UTF-8 string
    is bit-identical everywhere."""
    return F.substring(F.md5(col.cast("string").cast("binary")), 1, n)


def _eight_grams(d: DataFrame) -> DataFrame:
    """(doc_id, g): distinct space-joined 8-grams per document — the ONE
    definition of the decontamination contract (gram width 8, short-doc
    guard, array_distinct), shared by the n-gram overlap, the Bloom
    prefilter, and the composed audit so they can never disagree on what
    a contaminated gram is. Spark's sequence() DESCENDS when end < start
    (unlike DuckDB's empty generate_series), hence the explicit guard."""
    w = F.split(F.lower("text"), " ")
    grams_expr = F.when(
        F.size(w) >= 8,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 7),
                lambda i: F.array_join(F.slice(w, i, 8), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", F.explode(grams_expr).alias("g"))


@register(
    "sample_stratified_hash",
    oracle="""
    WITH buckets AS (
      SELECT lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE b < CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
             AS n_kept,
           round(COUNT(*) FILTER (WHERE b < CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS kept_share
    FROM buckets GROUP BY lang
    """,
    tags=("llm", "pipeline", "sample"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for training-mix construction:
    keep a doc iff its md5(doc_id) prefix falls under the stratum's rate
    (en: 0x40/0x100 = 25%, others 50%). Unlike ``sample()``/rand(), the
    decision is a pure function of the row — reproducible across engines,
    retries, and cluster sizes, and map-only at any scale."""
    d = load(spark, sf_dir, "documents")
    b = _md5_prefix(F.col("doc_id"), 2)
    thresh = F.when(F.col("lang") == "en", F.lit("40")).otherwise(F.lit("80"))
    kept = F.when(b < thresh, 1).otherwise(0)
    return (
        d.select("lang", kept.alias("k"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("k").alias("n_kept"),
            r6(F.sum("k") / F.count("*").cast("double")).alias("kept_share"),
        )
    )


@register(
    "mix_source_quota",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source, rn FROM ranked WHERE rn <= 12
    """,
    tags=("llm", "pipeline", "sample"),
)
def mix_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota mixing: each source contributes its top-12 docs
    under a deterministic hash order — the data-mixing step that caps any
    one crawl/source's share of the corpus. The window partitions by
    source, so work distributes across sources; the hash order means the
    sample is stable under re-runs and insertion order."""
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(_md5_prefix(F.col("doc_id"), 8), "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 12)
    )


@register(
    "decontaminate_ngram_overlap",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(generate_series(1, len(w) - 7),
                              i -> array_to_string(w[i:i+7], ' ')))) AS g
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    )
    SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_shared_ngrams
    FROM grams c
    JOIN (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0) b ON c.g = b.g
    WHERE c.doc_id % 50 <> 0
    GROUP BY c.doc_id
    """,
    tags=("llm", "pipeline", "decontaminate"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any 8-gram with
    the held-out set (here: doc_id % 50 == 0 stands in for the benchmark
    suite). The benchmark's distinct 8-grams BROADCAST — eval suites are
    MBs while the corpus is TBs — so the corpus side stays map-only:
    shingle, hash-join against the broadcast set, partial-agg the count.
    Spark's sequence() descends when end < start (unlike DuckDB's empty
    generate_series), hence the explicit short-doc guard."""
    d = load(spark, sf_dir, "documents")
    grams = _eight_grams(d)
    bench = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    corpus = grams.filter(F.col("doc_id") % 50 != 0)
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared_ngrams"))
    )


@register(
    "decontaminate_bloom_prefilter",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 7),
                                     i -> array_to_string(w[i:i+7], ' '))) AS g
        FROM w
      )
    ), js AS (
      SELECT unnest(range(4)) AS j
    ), bench AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
    ), bits AS (
      SELECT DISTINCT j, (h >> (15 * j)) & 32767 AS pos
      FROM (SELECT {{hash}} AS h FROM bench) CROSS JOIN js
    ), corpus AS (
      SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0
    ), cpos AS (
      SELECT doc_id, g, j, (h >> (15 * j)) & 32767 AS pos
      FROM (SELECT doc_id, g, {{hash}} AS h FROM corpus) CROSS JOIN js
    ), hits AS (
      SELECT doc_id, g FROM cpos JOIN bits USING (j, pos)
      GROUP BY doc_id, g HAVING COUNT(*) = 4
    ), bloom AS (
      SELECT doc_id, COUNT(*) AS n_bloom_grams FROM hits GROUP BY doc_id
    ), exact AS (
      SELECT c.doc_id, COUNT(*) AS n FROM corpus c JOIN bench b USING (g)
      GROUP BY c.doc_id
    )
    SELECT bloom.doc_id, n_bloom_grams,
           COALESCE(exact.n, 0) AS n_exact_grams
    FROM bloom LEFT JOIN exact ON bloom.doc_id = exact.doc_id
    """.replace("{hash}", "list_sum(list_transform(range(1, 16), i2 -> "
                "(strpos('0123456789abcdef', substr(md5(g), i2, 1)) - 1)::BIGINT"
                " << (4 * (15 - i2))))::BIGINT"),
    tags=("llm", "pipeline", "decontaminate", "sketch"),
)
def decontaminate_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination — the two-stage shape for a 100 TB
    corpus vs a large benchmark union: stage 1 probes every corpus 8-gram
    against a fixed-size broadcast Bloom bit relation (operators/
    sketches.py: k=4 sectioned probes over the portable hash; ~16 KB
    however many benchmark grams went in, vs broadcasting the grams
    themselves), stage 2 runs the exact string join ONLY for bloom-flagged
    docs. No false negatives (every exactly-contaminated doc is flagged);
    per-doc output exposes the false-positive surplus
    (n_bloom_grams >= n_exact_grams, asserted in tests/test_pipeline_ops.py).
    The bit relation is engine-neutral, so the oracle rebuilds the filter
    bit-for-bit — an exactly-checked approximate data structure."""
    d = load(spark, sf_dir, "documents")
    grams = _eight_grams(d)
    bench = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    corpus = grams.filter(F.col("doc_id") % 50 != 0)
    bits = sketches.bloom_bits(bench, F.col("g"))
    flagged = sketches.bloom_maybe_contains(corpus, F.col("g"), bits)
    bloom_counts = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_bloom_grams")
    )
    exact_counts = (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_exact_grams"))
    )
    return bloom_counts.join(exact_counts, "doc_id", "left").select(
        "doc_id",
        "n_bloom_grams",
        F.coalesce("n_exact_grams", F.lit(0)).alias("n_exact_grams"),
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH wc AS (
      SELECT doc_id, w, COUNT(*) AS n
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           round(MAX(n) / CAST(SUM(n) AS DOUBLE), 6) AS top_word_share,
           CASE WHEN MAX(n) / CAST(SUM(n) AS DOUBLE) > 0.08 THEN 1 ELSE 0 END
             AS is_repetitive
    FROM wc GROUP BY doc_id
    """,
    tags=("llm", "pipeline", "quality"),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: share of the document owned by its
    most frequent word; docs above 8% get flagged. Two partial-combining
    aggregations ((doc, word) then doc) — never a per-doc Python loop, and
    the (doc_id, word) key is high-cardinality so it spreads evenly."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("n"))
    )
    share = F.max("n") / F.sum("n").cast("double")
    return wc.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        r6(share).alias("top_word_share"),
        F.when(share > 0.08, 1).otherwise(0).alias("is_repetitive"),
    )


@register(
    "pii_mask_digits",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(length(props)
                    - length(regexp_replace(props, '[0-9]+', '', 'g'))) AS BIGINT)
             AS n_masked_chars,
           COUNT(DISTINCT regexp_replace(props, '[0-9]+', '<NUM>', 'g'))
             AS n_templates
    FROM events GROUP BY event_type
    """,
    tags=("llm", "pipeline", "pii"),
)
def pii_mask_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking over the semi-structured props payload: replace
    digit runs with a placeholder, count masked characters and surviving
    distinct templates per event type. Map-only scan + one aggregation;
    regexp stays JVM-side (no Python in the hot path)."""
    e = load(spark, sf_dir, "events")
    masked_empty = F.regexp_replace("props", "[0-9]+", "")
    template = F.regexp_replace("props", "[0-9]+", "<NUM>")
    return (
        e.select(
            "event_type",
            (F.length("props") - F.length(masked_empty)).alias("m"),
            template.alias("tpl"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("m").cast("bigint").alias("n_masked_chars"),
            F.countDistinct("tpl").alias("n_templates"),
        )
    )


@register(
    "text_word_entropy",
    oracle="""
    WITH wc AS (
      SELECT doc_id, w, COUNT(*) AS n
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      GROUP BY doc_id, w
    )
    SELECT doc_id,
           round(ln(CAST(SUM(n) AS DOUBLE))
                 - SUM(n * ln(CAST(n AS DOUBLE))) / CAST(SUM(n) AS DOUBLE), 6)
             AS word_entropy
    FROM wc GROUP BY doc_id
    """,
    tags=("llm", "pipeline", "quality"),
)
def text_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram entropy per document (perplexity-proxy quality signal; low
    entropy ⇒ repetitive/templated text). Uses the H = ln N − Σ n·ln n / N
    identity so ONE partial-combining aggregation pass computes it — no
    per-doc normalization join."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("n"))
    )
    n_d = F.col("n").cast("double")
    return wc.groupBy("doc_id").agg(
        r6(
            F.log(F.sum("n").cast("double"))
            - F.sum(n_d * F.log(n_d)) / F.sum("n").cast("double")
        ).alias("word_entropy")
    )


@register(
    "text_length_outliers",
    oracle="""
    WITH p AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY lang
    )
    SELECT d.lang,
           COUNT(*) FILTER (WHERE n_chars < p05 OR n_chars > p95) AS n_outliers,
           COUNT(*) AS n_docs
    FROM documents d JOIN p ON d.lang = p.lang
    GROUP BY d.lang
    """,
    tags=("llm", "pipeline", "quality"),
)
def text_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-percentile outlier filter per language: docs outside their
    language's exact [p05, p95] n_chars band (the truncation/boilerplate
    heuristic). The per-lang percentile table is |langs| rows — broadcast
    back; at scale the exact percentile would swap for percentile_approx
    with the identical plan shape."""
    d = load(spark, sf_dir, "documents")
    p = d.groupBy(F.col("lang").alias("p_lang")).agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p05"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    out = F.when((F.col("n_chars") < F.col("p05")) | (F.col("n_chars") > F.col("p95")), 1).otherwise(0)
    return (
        d.join(F.broadcast(p), d.lang == F.col("p_lang"))
        .groupBy("lang")
        .agg(F.sum(out).alias("n_outliers"), F.count("*").alias("n_docs"))
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH scaled AS (
      SELECT vec_id,
             coalesce(CAST(127 AS DOUBLE)
               / nullif(CAST(list_max(list_transform(embedding, x -> abs(x)))
                             AS DOUBLE), 0), 0) AS scale,
             embedding
      FROM embeddings
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           to_json(list_transform(embedding,
                                  x -> CAST(floor(x * scale + 0.5) AS INT)))
             AS q_json
    FROM scaled
    """,
    tags=("llm", "pipeline", "embedding"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (the storage /
    ANN-memory compression step): per-vector scale = 127/max|x|, elements
    rounded half-up. Map-only, JVM-side array ops; the quantized vector is
    emitted as canonical JSON so the gate hash-compares it as a string.
    float32→double promotion is exact on both engines, so floor(x*scale+.5)
    is bit-identical."""
    e = load(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    # An all-zero vector has max|x| = 0: 127/0 diverges across engines
    # (Spark Infinity → NaN → NULL ints; DuckDB errors on CAST(NaN AS
    # INT)). scale = 0 quantizes it to all zeros, identically on both.
    scale = F.when(mx == 0, F.lit(0.0)).otherwise(F.lit(127.0) / mx)
    q = F.transform("embedding", lambda x: F.floor(x * F.col("scale") + 0.5).cast("int"))
    return (
        e.select("vec_id", scale.alias("scale"), "embedding")
        .select("vec_id", r6(F.col("scale")).alias("scale"), F.to_json(q).alias("q_json"))
    )


@register(
    "emb_centroid_distance",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), cent AS (
      SELECT label, pos, AVG(v) AS c FROM ex GROUP BY label, pos
    )
    SELECT ex.vec_id,
           round(sqrt(SUM((ex.v - cent.c) * (ex.v - cent.c))), 6) AS l2_to_centroid
    FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
    GROUP BY ex.vec_id
    """,
    tags=("llm", "pipeline", "embedding"),
)
def emb_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid and each vector's L2 distance to it — the inner
    step of k-means/IVF training and the standard embedding-drift check.
    posexplode to (vec, dim) rows so the centroid is a plain partial-
    combining AVG keyed by (label, dim); vectors re-join the
    |labels|×64-row centroid table by broadcast. No pairwise anything."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    cent = ex.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    diff = F.col("v") - F.col("c")
    return (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id")
        .agg(r6(F.sqrt(F.sum(diff * diff))).alias("l2_to_centroid"))
    )


def _kmeans_assign_sql(cent: str, alias: str) -> str:
    """One Lloyd assignment step in DuckDB SQL: per-vector argmin of the
    round-6 squared L2 distance against ``cent`` (cid, cv), ties to the
    lowest cid — mirroring the Spark side's row_number over (d, cid)."""
    return f"""
    {alias} AS (
      SELECT vec_id, v, cid AS cluster, d FROM (
        SELECT c.vec_id, c.v, t.cid,
               round(list_sum(list_transform(range(1, 65),
                 i -> (c.v[i] - t.cv[i]) * (c.v[i] - t.cv[i]))), 6) AS d,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, 65),
                   i -> (c.v[i] - t.cv[i]) * (c.v[i] - t.cv[i]))), 6) ASC,
                   t.cid) AS rn
        FROM corpus c CROSS JOIN {cent} t
      ) WHERE rn = 1
    )"""


@register(
    "cluster_kmeans_lloyd",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cent0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) AS INT) - 1 AS cid,
             v AS cv
      FROM (SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h, v
            FROM corpus ORDER BY h, vec_id LIMIT 4)
    ),{_kmeans_assign_sql("cent0", "a1")},
    ex1 AS (SELECT cluster, i, v[i] AS val FROM a1, range(1, 65) r(i)),
    m1 AS (SELECT cluster, i, AVG(val) AS c FROM ex1 GROUP BY cluster, i),
    cent1 AS (
      SELECT cluster AS cid, list(c ORDER BY i) AS cv FROM m1 GROUP BY cluster
    ),{_kmeans_assign_sql("cent1", "a2")}
    SELECT cluster, COUNT(*) AS n_vectors,
           CAST(CAST(SUM(CAST(d AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             AS inertia
    FROM a2 GROUP BY cluster
    """,
    tags=("llm", "pipeline", "embedding", "iterative", "scale", "cross"),
)
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (k=4, one full Lloyd iteration, unrolled):
    md5-sampled seeds → round-6 argmin assignment → per-(cluster, dim)
    AVG centroid update (posexplode + partial-combining agg, the
    emb_centroid_distance step) → reassignment; output per-cluster size +
    inertia. This trains the coarse quantizer IN the engine — the
    complement to operators/similarity.train_pq_codebooks' driver-side
    model-sized training, for when even the training sample should not
    leave the cluster. Everything is in-plan: seeds come from a LIMIT-4
    subquery (no driver collect), centroids re-enter each unrolled
    iteration as a broadcast k×1-row table.

    Scale shape: assignment is a k-row broadcast cross join (map-only);
    the update is one (cluster, dim)-keyed shuffle with map-side
    combine; iterations unroll like graph_pagerank — no driver loop.
    Determinism: distances round to 6 before the argmin (ties to lowest
    cid, the IVF discipline) so the assignment survives AVG's
    accumulation-order ulps; inertia decimal-accumulates round-6 per-row
    distances and finalizes with the correctly-rounded VARCHAR-hop cast
    (helpers.money discipline)."""
    k = 4
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = (
        e.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(k)
    )
    cent = seeds.select(
        (
            F.row_number().over(W.orderBy("h", "vec_id")) - 1
        ).cast("int").alias("cid"),
        F.col("v").alias("cv"),
    )

    def l2sq(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def assign(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
        j = corpus.crossJoin(F.broadcast(centroids)).withColumn(
            "d", r6(l2sq(F.col("v"), F.col("cv")))
        )
        w = W.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cid").asc())
        return (
            j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", F.col("cid").alias("cluster"), "d")
        )

    a1 = assign(e, cent)
    m1 = (
        a1.select("cluster", F.posexplode("v").alias("i", "val"))
        .groupBy("cluster", "i")
        .agg(F.avg("val").alias("c"))
    )
    cent1 = m1.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s["c"]
        ).alias("cv")
    ).select(F.col("cluster").alias("cid"), "cv")
    a2 = assign(e, cent1)
    return a2.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.sum(F.col("d").cast("decimal(18,6)"))
        .cast("double")
        .alias("inertia"),
    )


def _bpe_pair_ranks(seqdf: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-symbol pair counts over (word, freq, seq),
    ranked desc with lexicographic ties — one BPE statistics round (shared
    by train and encode). The guard on 1-symbol words matters: Spark's
    ``sequence(1, 0)`` DESCENDS instead of returning empty."""
    t = F.split("seq", " ")
    prs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("a"),
                F.element_at(t, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    counts = (
        seqdf.select("freq", F.explode(prs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_count"))
    )
    w = W.orderBy(F.col("pair_count").desc(), "a", "b")
    return counts.withColumn("rn", F.row_number().over(w))


def _bpe_apply_merge(seqdf: DataFrame, ranks: DataFrame) -> DataFrame:
    """Apply the argmax merge from ``ranks`` to every symbol sequence:
    broadcast the 1-row merge, then a SYMBOL-BOUNDARY-SAFE left-to-right
    replace. A bare ``replace(seq, 'a b', 'ab')`` matches SUBSTRINGS of
    multi-char symbols — with merges ('t','h') then ('h','e'), the word
    'the' is 'th e' after round 1, and 'h e' matches inside it even
    though the symbol pair is ('th','e'): true BPE gives 2 tokens, the
    naive replace gives 1. The fix is the doubled-separator trick:
    double every internal space (each boundary then owns TWO spaces, so
    consecutive matches never fight over one), pad the ends, match the
    fully-anchored ``' a  b '``, then collapse and trim. Same
    non-overlapping left-to-right semantics in both engines; exhaustive
    within the pass ('l l l' under ('l','l') → 'll l', like BPE)."""
    m = ranks.filter(F.col("rn") == 1).select(
        F.col("a").alias("ma"), F.col("b").alias("mb")
    )
    doubled = F.concat(
        F.lit(" "), F.replace(F.col("seq"), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    merged = F.replace(
        doubled,
        F.concat(F.lit(" "), F.col("ma"), F.lit("  "), F.col("mb"), F.lit(" ")),
        F.concat(F.lit(" "), F.col("ma"), F.col("mb"), F.lit(" ")),
    )
    return seqdf.crossJoin(F.broadcast(m)).select(
        "word",
        "freq",
        F.trim(F.replace(merged, F.lit("  "), F.lit(" "))).alias("seq"),
    )


def _bpe_merge_sql(seq: str, a: str, b: str) -> str:
    """The same boundary-safe merge application in DuckDB SQL (see
    _bpe_apply_merge): doubled separators + anchored match + collapse."""
    doubled = f"' ' || replace({seq}, ' ', '  ') || ' '"
    pat = f"' ' || {a} || '  ' || {b} || ' '"
    rep = f"' ' || {a} || {b} || ' '"
    return f"trim(replace(replace({doubled}, {pat}, {rep}), '  ', ' '))"


def _bpe_char_seq(words: DataFrame) -> DataFrame:
    """(word, freq, seq): the char-spaced symbol sequence every BPE round
    starts from — ONE definition shared by train and encode, so the two
    halves of the tokenizer can never derive different vocabularies."""
    return words.select(
        "word",
        "freq",
        F.rtrim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"),
    )


def _bpe_pairs_sql(src: str, alias: str) -> str:
    """Adjacent-symbol pair counts (freq-weighted) over ``src`` (word,
    freq, seq) in DuckDB SQL — one BPE statistics round."""
    return f"""
    {alias} AS (
      SELECT p.a AS a, p.b AS b, CAST(SUM(freq) AS BIGINT) AS pair_count
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(t)),
                 i -> {{'a': t[i], 'b': t[i+1]}})) AS p
        FROM (SELECT freq, string_split(seq, ' ') AS t FROM {src})
      ) GROUP BY 1, 2
    ), {alias}_r AS (
      SELECT a, b, pair_count,
             CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, a, b) AS INT)
               AS rn
      FROM {alias}
    )"""


@register(
    "text_bpe_train_merges",
    oracle=f"""
    WITH words AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ), seq0 AS (
      SELECT word, freq,
             rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
      FROM words
    ),{_bpe_pairs_sql("seq0", "p1")},
    m1 AS (SELECT a, b FROM p1_r WHERE rn = 1),
    seq1 AS (
      SELECT word, freq, {_bpe_merge_sql("seq", "m1.a", "m1.b")} AS seq
      FROM seq0 CROSS JOIN m1
    ),{_bpe_pairs_sql("seq1", "p2")}
    SELECT 1 AS round, a, b, pair_count, rn FROM p1_r WHERE rn <= 5
    UNION ALL
    SELECT 2 AS round, a, b, pair_count, rn FROM p2_r WHERE rn <= 5
    """,
    tags=("llm", "pipeline", "text", "iterative", "cross"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, the distributed core: two merge rounds
    over the corpus word-frequency dictionary (exactly how
    HuggingFace/SentencePiece train, re-expressed as engine plans). Words
    → (word, freq) dict (the one corpus-sized shuffle; the dict is
    vocabulary-bounded from here on) → char-spaced symbol sequences →
    freq-weighted adjacent-pair counts → the argmax pair becomes merge 1
    (ties lexicographic) → single-pass left-to-right `replace` applies it
    to every word — identical non-overlapping semantics in both engines —
    → recount → merge 2. Output: top-5 pairs per round with ranks (rn=1
    rows ARE the learned merges).

    Scale shape: pair counting is a map-side-combining agg keyed by a
    symbol pair; the merge pick is a window over the pair table
    (symbol-vocabulary-sized, not corpus-sized); merge application is a
    broadcast 1-row cross join + map-only string replace. Each further
    merge unrolls the same three steps — no driver loop. The guard on
    1-symbol words matters: Spark's ``sequence(1, 0)`` DESCENDS instead
    of returning empty (oracle-gotchas)."""
    d = fan_out(load(spark, sf_dir, "documents"))
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    seq0 = _bpe_char_seq(words)

    p1 = _bpe_pair_ranks(seq0)
    seq1 = _bpe_apply_merge(seq0, p1)
    p2 = _bpe_pair_ranks(seq1)
    out1 = p1.filter(F.col("rn") <= 5).select(
        F.lit(1).alias("round"), "a", "b", "pair_count", "rn"
    )
    out2 = p2.filter(F.col("rn") <= 5).select(
        F.lit(2).alias("round"), "a", "b", "pair_count", "rn"
    )
    return out1.unionByName(out2)


@register(
    "text_chunk_sliding",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ), sized AS (
      SELECT doc_id, t, len(t) AS n,
             1 + (greatest(len(t) - 32, 0) + 23) // 24 AS n_chunks
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(k AS INT) AS chunk_idx,
           CAST(len(list_slice(t, k * 24 + 1, k * 24 + 32)) AS INT)
             AS n_tokens,
           md5(array_to_string(list_slice(t, k * 24 + 1, k * 24 + 32), ' '))
             AS chunk_md5
    FROM (SELECT doc_id, t, unnest(range(0, n_chunks)) AS k FROM sized)
    """,
    tags=("llm", "pipeline", "text"),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (size 32 tokens, stride 24 —
    the embedding-index / RAG ingestion standard): every document becomes
    ⌈(n−32)/24⌉+1 chunks, consecutive chunks sharing 8 tokens so no
    semantic boundary is ever lost to a hard cut; the final chunk clamps
    to the document end. Output carries the chunk's token count and an
    md5 content key — exactly what downstream embedding + near-dup
    stages join on. Map-only at any scale: chunk starts come from a
    per-row integer sequence (always ascending — n_chunks ≥ 1), the
    explode fans out ~n/24 rows per document, and no chunk ever crosses
    a row boundary, so there is no shuffle at all.

    The per-chunk struct (idx, size, md5) is computed ARRAY-SIDE in one
    ``transform`` and only the small structs are exploded: exploding the
    chunk INDEX and slicing afterwards would project a copy of the full
    token array into every chunk row — O(n²/stride) materialized tokens
    per long document (the trap dedup_cdc_chunks documents)."""
    d = fan_out(load(spark, sf_dir, "documents"))
    t = F.split(F.lower("text"), " ")
    base = d.select("doc_id", t.alias("t")).filter(F.size("t") > 0)
    n_chunks = 1 + F.floor(
        (F.greatest(F.size("t") - 32, F.lit(0)) + 23) / 24
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.cast("int").alias("chunk_idx"),
            F.size(F.slice(F.col("t"), k * 24 + 1, 32)).alias("n_tokens"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("t"), k * 24 + 1, 32)).cast("binary")
            ).alias("chunk_md5"),
        ),
    )
    return base.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_md5"
    )


@register(
    "dedup_passage_chunks",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunked AS (
      SELECT doc_id,
             md5(unnest(list_transform(
               range(0, CAST(floor(len(t) / 8) AS INT)),
               i -> array_to_string(t[i*8+1 : i*8+8], ' ')))) AS h
      FROM toks
    ),
    chunk_docs AS (
      SELECT h, COUNT(*) AS n_docs
      FROM (SELECT DISTINCT doc_id, h FROM chunked) GROUP BY h
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           round(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS shared_share
    FROM chunked c JOIN chunk_docs d ON c.h = d.h
    GROUP BY c.doc_id
    """,
    tags=("llm", "pipeline", "dedup"),
)
def dedup_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (sub-document) duplication audit — the
    RefinedWeb/CCNet-style step between document dedup and tokenization:
    split each doc into fixed 8-token passages, hash them, and score each
    doc by the share of its passages that also appear in *another* doc.

    Plan: explode to (doc, passage-hash), one distinct + hash aggregate
    keyed on the passage hash (partial combine), then an equi-join back on
    that same hash key — both sides arrive partitioned by ``h`` so the
    join co-locates; nothing is ever pairwise. Docs shorter than one
    passage drop out identically on both engines (empty explode)."""
    d = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n_chunks = F.floor(F.size(t) / 8).cast("int")
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.md5(F.array_join(F.slice(t, i * 8 + 1, F.lit(8)), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    chunked = d.select("doc_id", F.explode(chunks).alias("h"))
    chunk_docs = (
        chunked.distinct().groupBy("h").agg(F.count("*").alias("n_docs"))
    )
    shared = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return (
        chunked.join(chunk_docs, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(shared).cast("bigint").alias("n_shared_chunks"),
            r6(F.sum(shared) / F.count("*").cast("double")).alias("shared_share"),
        )
    )


@register(
    "text_feature_hashing",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    b AS (
      SELECT doc_id,
             strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1 AS bucket,
             COUNT(*) AS cnt
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    m AS (
      SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             map_from_entries(list((bucket, cnt))) AS mp
      FROM b GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           array_to_string(list_transform(range(0, 16),
             i -> CAST(coalesce(mp[i][1], 0) AS VARCHAR)), ',') AS fvec
    FROM m
    """,
    tags=("llm", "pipeline", "text"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorizer (hashing trick): each token hashes into
    one of 16 buckets via its md5 first hex digit — an engine-agnostic
    stand-in for murmur-mod-d — and each doc emits its dense count vector
    as a canonical comma-joined string (driver-gate hashable).

    Plan: explode → (doc, bucket) hash aggregate with partial combine →
    per-doc map assembly. The vector dimension is a constant (16), so the
    densify step is a map lookup over a literal ``sequence`` — map-only
    after the aggregate; no pivot, no per-row Python. At 100 TB this is
    the exact shape of a d=2^20 hashed bag-of-words featurizer."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    bucket = F.expr("instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1")
    b = toks.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("cnt")
    )
    m = b.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "cnt"))
        ).alias("mp"),
    )
    fvec = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: F.coalesce(
                F.element_at("mp", i), F.lit(0).cast("bigint")
            ).cast("string"),
        ),
        ",",
    )
    return m.select("doc_id", "n_tokens", fvec.alias("fvec"))


#: 4-hex-char → uint16, written so BOTH engines use pure integer/string
#: ops (DuckDB has no hex→int conversion; a strpos digit table is exact).
_HEXPOS = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"


def _u16_sql(h: str) -> str:
    """DuckDB: first 4 hex chars of ``h`` as an integer in [0, 65535]."""
    return " + ".join(
        f"({_HEXPOS.format(h=h, i=i + 1)}) * {16 ** (3 - i)}" for i in range(4)
    )


def _u16_col(col: F.Column) -> F.Column:
    """Spark twin of :func:`_u16_sql`: md5's first 4 hex chars as a long in
    [0, 65535]. ONE definition (it was copy-pasted at three sampling call
    sites) so the hash width/cast can never desync from the oracle side."""
    return F.conv(_md5_prefix(col, 4), 16, 10).cast("long")


@register(
    "sample_weighted_threshold",
    oracle=f"""
    WITH u AS (
      SELECT lang, n_chars,
             ({_u16_sql("md5(CAST(doc_id AS VARCHAR))")}) AS u16
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE u16 < n_chars * 100) AS n_kept,
           round(AVG(n_chars), 6) AS avg_len_all,
           round(AVG(n_chars) FILTER (WHERE u16 < n_chars * 100), 6) AS avg_len_kept
    FROM u GROUP BY lang
    """,
    tags=("llm", "pipeline", "sample"),
)
def sample_weighted_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling (inclusion probability ∝ n_chars,
    the token-budget-aware variant of stratified sampling): keep a doc
    iff its md5(doc_id)-derived uint16 falls under ``n_chars * 100``.

    The decision is PURE INTEGER arithmetic on a cross-engine hash — no
    rand(), no float pow/log (libm results differ across engines), so
    the sample is bit-reproducible everywhere, map-only at any scale,
    and longer documents are proportionally favored (the summary shows
    kept-mean length > corpus-mean length per stratum)."""
    d = load(spark, sf_dir, "documents")
    u16 = _u16_col(F.col("doc_id"))
    kept = (u16 < F.col("n_chars") * 100).cast("int")
    nc = F.col("n_chars")
    return (
        d.select("lang", "n_chars", kept.alias("k"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("k").cast("long").alias("n_kept"),
            r6(F.avg(nc)).alias("avg_len_all"),
            r6(F.avg(F.when(F.col("k") == 1, nc))).alias("avg_len_kept"),
        )
    )


@register(
    "pack_context_windows",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
      FROM documents
    ),
    c AS (
      SELECT *, CAST(SUM(tok) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM t
    )
    SELECT source, CAST((cum - tok) // 512 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS bin_tokens
    FROM c GROUP BY 1, 2
    """,
    tags=("llm", "pipeline", "pack"),
)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed-capacity (512-token)
    training context windows by running token count, in a deterministic
    hash order — the step that turns a filtered corpus into dense
    pretraining batches (short docs share a context; fill factor is the
    efficiency metric).

    Bin id = (tokens-before-this-doc) div 512 within the source
    partition: a pure window cumsum, no driver loop, no bin-packing
    state. The per-source window distributes across sources; hash
    ordering makes the packing reproducible under re-runs and insertion
    order (and is the standard shuffle-before-pack). Boundary-straddling
    docs overflow their bin — real packers split those at the token
    level, which is the tokenizer's half of the job, not the planner's.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("tok"),
        _md5_prefix(F.col("doc_id"), 8).alias("h"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = t.withColumn("cum", F.sum("tok").over(w))
    return c.groupBy(
        "source", F.expr("(cum - tok) div 512").alias("bin_id")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("bin_tokens"),
    )


@register(
    "mix_temperature_sample",
    oracle=f"""
    WITH s AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(ns) AS BIGINT) AS n FROM s),
    thr AS (
      SELECT source,
             CAST(floor(65536 * sqrt(CAST(ns AS DOUBLE) / CAST(n AS DOUBLE)))
                  AS BIGINT) AS t16
      FROM s, tot
    ),
    u AS (
      SELECT doc_id, source,
             ({_u16_sql("md5(CAST(doc_id AS VARCHAR))")}) AS u16
      FROM documents
    )
    SELECT u.source, COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE u16 < t16) AS n_kept
    FROM u JOIN thr ON u.source = thr.source
    GROUP BY u.source
    """,
    tags=("llm", "pipeline", "sample", "scalar"),
)
def mix_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (T=2): per-source keep rate
    ∝ sqrt(source share) — the multilingual-LM rebalancing that
    upweights rare sources relative to proportional sampling.

    Cross-engine determinism without rand(): the only transcendental is
    IEEE-754 ``sqrt`` (correctly rounded by spec, unlike pow/log), its
    input is an identical double on both engines, and the result is
    floored to an integer threshold compared against the doc's md5
    uint16 — so the kept set is bit-identical everywhere. Plan: tiny
    per-source stats agg, broadcast threshold join back, map-side
    filter, final agg — one fact-table shuffle total.
    """
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("ns"))
    tot = s.agg(F.sum("ns").alias("n"))
    thr = s.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(
            65536
            * F.sqrt(F.col("ns").cast("double") / F.col("n").cast("double"))
        )
        .cast("long")
        .alias("t16"),
    )
    u16 = _u16_col(F.col("doc_id"))
    u = d.select("doc_id", "source", u16.alias("u16"))
    return (
        u.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(F.col("u16") < F.col("t16"), 1)).alias("n_kept"),
        )
    )


def _pi_oracle_iters(k: int) -> str:
    """Unrolled power-iteration CTE chain v0 → v{k} (DuckDB)."""
    out = []
    for i in range(1, k + 1):
        out.append(
            f"""
    d{i} AS (
      SELECT vec_id, SUM(val * vv) AS dot
      FROM vecs JOIN v{i-1} USING (dim) GROUP BY vec_id
    ),
    u{i} AS (
      SELECT dim, SUM(val * dot) AS u
      FROM vecs JOIN d{i} USING (vec_id) GROUP BY dim
    ),
    n{i} AS (SELECT sqrt(SUM(u * u)) AS nrm FROM u{i}),
    v{i} AS (SELECT dim, u / nrm AS vv FROM u{i}, n{i})"""
        )
    return ",".join(out)


@register(
    "emb_power_iteration_pc1",
    oracle=f"""
    WITH vecs AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ),
    v0 AS (
      SELECT CAST(unnest(generate_series(0, 63)) AS INT) AS dim,
             CAST(0.125 AS DOUBLE) AS vv
    ),
    {_pi_oracle_iters(3)},
    s AS (
      SELECT CASE WHEN vv >= 0 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
               AS sgn
      FROM v3 WHERE dim = 0
    )
    SELECT dim, round(vv * sgn, 6) AS pc1 FROM v3, s
    """,
    tags=("llm", "embedding", "iterative", "scalar"),
)
def emb_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding matrix by THREE unrolled
    matrix-free power iterations — the scalable spectral primitive
    (v ← normalize(Xᵀ(Xv))): no covariance matrix is ever materialized,
    only (vec,dim,val) triples joined against a d-row vector.

    Each iteration is two partial-agg shuffles (dot per vec, projection
    per dim) + one 1-row norm broadcast — at 100 TB the triples shuffle
    partitions by vec_id/dim exactly like every other agg here, and d
    stays executor-resident. Sign is pinned to dim 0 so the eigenvector
    sign ambiguity can't flip the comparison. Determinism: double sums
    rounded to 6 only at the end; sqrt is correctly rounded by IEEE on
    both engines (the pow/log trap does not apply).
    """
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", "dim", F.col("v").cast("double").alias("val"))
    v = spark.range(64).select(
        F.col("id").cast("int").alias("dim"), F.lit(0.125).alias("vv")
    )
    for _ in range(3):
        dots = (
            vecs.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("val") * F.col("vv")).alias("dot"))
        )
        u = (
            vecs.join(dots, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("dot")).alias("u"))
        )
        nrm = u.agg(F.sqrt(F.sum(F.col("u") * F.col("u"))).alias("nrm"))
        v = u.crossJoin(F.broadcast(nrm)).select(
            "dim", (F.col("u") / F.col("nrm")).alias("vv")
        )
    sgn = v.filter(F.col("dim") == 0).select(
        F.when(F.col("vv") >= 0, F.lit(1.0)).otherwise(F.lit(-1.0)).alias("sgn")
    )
    return v.crossJoin(F.broadcast(sgn)).select(
        "dim", r6(F.col("vv") * F.col("sgn")).alias("pc1")
    )


@register(
    "pipeline_pretrain_corpus",
    oracle=f"""
    WITH deduped AS (
      SELECT min(doc_id) AS doc_id
      FROM documents GROUP BY md5(text)
    ),
    kept AS (
      SELECT d.doc_id, d.source,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok,
             substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS h
      FROM documents d JOIN deduped k ON d.doc_id = k.doc_id
      WHERE d.n_chars >= 100
        AND len(string_split(d.text, ' ')) >= 20
        AND ({_u16_sql("md5(CAST(d.doc_id AS VARCHAR))")}) < d.n_chars * 100
    ),
    packed AS (
      SELECT source, tok,
             CAST((CAST(SUM(tok) OVER (
                PARTITION BY source ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - tok) // 512 AS BIGINT) AS bin_id
      FROM kept
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT bin_id) AS n_bins,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           round(CAST(SUM(tok) AS DOUBLE)
                 / (COUNT(DISTINCT bin_id) * 512), 6) AS fill_ratio
    FROM packed GROUP BY source
    """,
    tags=("llm", "pipeline", "scalar"),
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled pretraining-corpus build as ONE declarative plan:
    exact dedup (md5 hash-groupBy, canonical = min doc_id) → quality
    gate (length + token floor) → weight-proportional sampling
    (integer-hash threshold) → sequence packing into 512-token contexts
    → per-source fill report.

    Every stage reuses a proven standalone operator's shape
    (dedup_exact, text_quality, sample_weighted_threshold,
    pack_context_windows); composing them in one DataFrame expression
    lets Catalyst pipeline the dedup join, filters and sampling into the
    SAME pass over the corpus — no intermediate materialization between
    stages, which is the point of a declarative 100 TB pipeline.
    """
    d = load(spark, sf_dir, "documents")
    # Keep-first dedup as a window-min over the content hash — the
    # agg+self-join form scans the corpus twice (BENCH_NOTES.md round-7,
    # same finding as pipeline_corpus_filter: −37 % at sf10 there).
    dedup_w = W.partitionBy(F.md5(F.col("text").cast("binary")))
    tokc = F.size(F.split("text", " ")).cast("long")
    u16 = _u16_col(F.col("doc_id"))
    kept = (
        d.withColumn("mn", F.min("doc_id").over(dedup_w))
        .filter(F.col("doc_id") == F.col("mn"))
        .filter(
            (F.col("n_chars") >= 100) & (tokc >= 20) & (u16 < F.col("n_chars") * 100)
        )
        .select(
            "doc_id",
            "source",
            tokc.alias("tok"),
            _md5_prefix(F.col("doc_id"), 8).alias("h"),
        )
    )
    w = (
        W.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = kept.withColumn("cum", F.sum("tok").over(w)).withColumn(
        "bin_id", F.expr("(cum - tok) div 512")
    )
    return packed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.sum("tok").alias("n_tokens"),
        r6(
            F.sum("tok").cast("double")
            / (F.countDistinct("bin_id") * 512)
        ).alias("fill_ratio"),
    )


@register(
    "dedup_cdc_chunks",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pos AS (
      -- position var is named p, NOT i: portable_hash_sql's list_transform
      -- lambda binds i, which would shadow a row column of the same name.
      SELECT doc_id, unnest(range(1, len(t) + 1)) AS p, t
      FROM toks
    ),
    flagged AS (
      SELECT doc_id, p, t[p] AS token,
             CASE WHEN p >= 3
                  AND ({sketches.portable_hash_sql("array_to_string(t[p-2:p], ' ')")}) % 8 = 0
                  THEN 1 ELSE 0 END AS b
      FROM pos
    ),
    numbered AS (
      SELECT doc_id, p, token,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
      FROM flagged
    ),
    chunks AS (
      SELECT doc_id, chunk,
             md5(string_agg(token, ' ' ORDER BY p)) AS h
      FROM numbered GROUP BY doc_id, chunk
    ),
    chunk_docs AS (
      SELECT h, COUNT(*) AS n_docs
      FROM (SELECT DISTINCT doc_id, h FROM chunks) GROUP BY h
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           round(SUM(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS shared_share
    FROM chunks c JOIN chunk_docs d ON c.h = d.h
    GROUP BY c.doc_id
    """,
    tags=("llm", "pipeline", "dedup"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup audit: chunk boundaries fall where
    the rolling trigram hash ≡ 0 (mod 8), so boundaries move WITH the
    content — insert one token early in a document and fixed-width
    passages (dedup_passage_chunks) all shift and stop matching, while
    CDC chunks re-synchronize at the next content-defined cut (the
    rsync/LBFS/storage-dedup trick, applied to corpus text).

    Plan shape: boundary flags are computed array-side (one transform per
    doc, linear — the token array is never carried through the explode),
    then one posexplode to (doc, i, token, flag), a per-doc prefix-sum
    window to number chunks, a (doc, chunk) hash-agg to build chunk
    hashes, and the same co-located hash-keyed audit join as
    dedup_passage_chunks. Per-doc windows distribute by doc_id; nothing
    is pairwise. Expected chunk length is the modulus (8 tokens).
    Determinism: the boundary decision is the portable 60-bit md5 hash
    (operators/sketches.py) mod a power of two — identical integers on
    both engines.
    """
    d = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    flags = F.transform(
        F.sequence(F.lit(1), F.size(t)),
        lambda i: F.when(
            (i >= 3)
            & (
                sketches.portable_key_hash(
                    F.array_join(F.slice(t, i - 2, F.lit(3)), " ")
                )
                % 8
                == 0
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    pos = d.select(
        "doc_id", F.posexplode(F.arrays_zip(t, flags)).alias("i0", "z")
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        F.col("z").getField("0").alias("token"),
        F.col("z").getField("1").alias("b"),
    )
    prior = W.partitionBy("doc_id").orderBy("i").rowsBetween(
        W.unboundedPreceding, -1
    )
    numbered = pos.select(
        "doc_id",
        "i",
        "token",
        F.coalesce(F.sum("b").over(prior), F.lit(0)).alias("chunk"),
    )
    chunks = numbered.groupBy("doc_id", "chunk").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "token"))),
                    lambda s: s.getField("token"),
                ),
                " ",
            ).cast("binary")
        ).alias("h")
    )
    chunk_docs = (
        chunks.select("doc_id", "h").distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
    )
    shared = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return (
        chunks.join(chunk_docs, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(shared).cast("long").alias("n_shared_chunks"),
            r6(F.sum(shared) / F.count("*")).alias("shared_share"),
        )
    )


@register(
    "pipeline_decontamination_audit",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(
                 string_split(lower(text), ' '))), ' ')) AS h
      FROM documents
    ), shared AS (
      SELECT h FROM (
        SELECT h, COUNT(DISTINCT source) AS ns
        FROM (SELECT DISTINCT source, h FROM fp) GROUP BY h
      ) WHERE ns >= 2
    ), crossdup AS (
      SELECT source, COUNT(DISTINCT doc_id) AS n_crossdup_docs
      FROM fp JOIN shared USING (h) GROUP BY source
    ), w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w) - 7),
                                     i -> array_to_string(w[i:i+7], ' '))) AS g
        FROM w
      )
    ), bench AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
    ), contam AS (
      SELECT DISTINCT doc_id FROM grams JOIN bench USING (g)
      WHERE doc_id % 50 <> 0
    ), contam_src AS (
      SELECT d.source, COUNT(DISTINCT d.doc_id) AS n_contaminated_docs
      FROM documents d JOIN contam USING (doc_id) GROUP BY d.source
    ), base AS (
      SELECT source, COUNT(DISTINCT doc_id) AS n_docs
      FROM documents GROUP BY source
    )
    SELECT b.source, b.n_docs,
           COALESCE(c.n_crossdup_docs, 0) AS n_crossdup_docs,
           COALESCE(s.n_contaminated_docs, 0) AS n_contaminated_docs
    FROM base b
    LEFT JOIN crossdup c ON b.source = c.source
    LEFT JOIN contam_src s ON b.source = s.source
    """,
    tags=("llm", "pipeline", "decontaminate", "dedup", "sketch"),
)
def pipeline_decontamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run decontamination AUDIT (VERDICT r4 stretch #8b): the
    curation ops composing in one report. Per source:

    - ``n_crossdup_docs`` — docs whose fingerprint (sorted distinct token
      set, the dedup_source_overlap_matrix identity) also appears in
      ANOTHER source: the inter-source duplication pressure that decides
      dedup order;
    - ``n_contaminated_docs`` — corpus docs sharing at least one 8-gram
      with the benchmark slice (doc_id % 50 == 0, as in
      decontaminate_bloom_prefilter), computed through the SAME two-stage
      shape: Bloom-bit prefilter (broadcast ~16 KB bit relation) first,
      the exact string join confined to bloom-flagged docs. Bloom has no
      false negatives, so the two-stage result equals the oracle's direct
      exact join — the audit stays exactly checkable while exercising the
      production prefilter path.

    Scale: fingerprint sharing is one distinct + one hash-keyed agg
    (per-hash fan-out bounded by |sources|); the shared-hash relation is
    duplicate-cardinality (NOT broadcast-hinted — AQE decides, the
    graph.py discipline); the gram stage is the proven prefilter plan.
    """
    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split(F.lower("text"), " ")))
            ).cast("binary")
        ).alias("h"),
    )
    shared = (
        fp.select("source", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count_distinct("source").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("h")
    )
    crossdup = (
        fp.join(shared, "h")
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("n_crossdup_docs"))
    )
    grams = _eight_grams(d)
    bench = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    corpus = grams.filter(F.col("doc_id") % 50 != 0)
    bits = sketches.bloom_bits(bench, F.col("g"))
    flagged_docs = (
        sketches.bloom_maybe_contains(corpus, F.col("g"), bits)
        .select("doc_id")
        .distinct()
    )
    contam = (
        corpus.join(flagged_docs, "doc_id")
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    contam_src = (
        d.join(contam, "doc_id")
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("n_contaminated_docs"))
    )
    base = d.groupBy("source").agg(F.count_distinct("doc_id").alias("n_docs"))
    return (
        base.join(crossdup, "source", "left")
        .join(contam_src, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_crossdup_docs", F.lit(0)).alias("n_crossdup_docs"),
            F.coalesce("n_contaminated_docs", F.lit(0)).alias(
                "n_contaminated_docs"
            ),
        )
    )


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), weighted AS (
      SELECT doc_id, source,
             ({sketches.portable_hash_sql("tok")} % 2001) - 1000 AS w
      FROM toks
    ), scored AS (
      SELECT doc_id, source,
             SUM(w) AS s_int,
             COUNT(*) AS n_tok
      FROM weighted GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN s_int > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
           round(AVG(s_int / (1000.0 * n_tok)), 6) AS avg_score
    FROM scored GROUP BY source
    """,
    tags=("llm", "pipeline", "text", "scalar"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the linear-classifier shape of
    production corpus curation (fasttext / fineweb-edu style): each token
    maps through the portable 60-bit hash to an INTEGER weight in
    [-1000, 1000] (a stand-in for trained feature weights; a real model's
    weights broadcast into the same expression), docs score by the weight
    sum, and the keep-decision is ``Σw > 0`` on EXACT int64 arithmetic —
    classification can never flip on float summation order, the same
    integer-decision discipline as sample_weighted_threshold. Per-source
    report: doc count, pass count, mean normalized score (round-6 of a
    small-magnitude average — the float discipline). Scale: explode →
    one hash per token instance → two-level agg; map-side partials carry
    one (doc, sum, count) row; no model service in the loop."""
    from lagom_kinesis_spark.operators.similarity import portable_token_hash

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    w = (portable_token_hash(F.col("tok")) % 2001 - 1000).cast("long")
    scored = tok.select("doc_id", "source", w.alias("w")).groupBy(
        "doc_id", "source"
    ).agg(F.sum("w").alias("s_int"), F.count("*").alias("n_tok"))
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("s_int") > 0).cast("long")).alias("n_pass"),
        r6(F.avg(F.col("s_int") / (1000.0 * F.col("n_tok")))).alias("avg_score"),
    )


@register(
    "split_train_val_test",
    oracle="""
    WITH assigned AS (
      SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b, lang, n_chars
      FROM documents
    )
    SELECT CASE WHEN b < 'cc' THEN 'train'
                WHEN b < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS avg_chars
    FROM assigned GROUP BY 1
    """,
    tags=("llm", "pipeline", "sample"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10 by md5(doc_id)
    prefix: <0xcc train, <0xe6 val, else test) with per-split corpus
    stats. The assignment is a pure function of the row — stable across
    engines, reruns, repartitions, and incremental appends (a new doc
    never moves an old one between splits), which rand()-based splits
    cannot guarantee. The stats (doc count, char volume, language
    coverage) are the split-balance report a training run signs off on.

    Scale: map-only assignment; one 3-key shuffle with map-side partial
    aggregation; count-distinct lang is a two-level expand on a
    low-cardinality column."""
    d = load(spark, sf_dir, "documents")
    b = _md5_prefix(F.col("doc_id"), 2)
    split = (
        F.when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            r6(F.sum("n_chars").cast("double") / F.count("*")).alias(
                "avg_chars"
            ),
        )
    )


@register(
    "pipeline_filter_funnel",
    oracle="""
    WITH feats AS (
      SELECT doc_id, md5(text) AS h,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_distinct(string_split(lower(text), ' ')))
               / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS ttr,
             CASE WHEN len(list_intersect(string_split(lower(text), ' '),
                          ['the','and','of'])) > 0 THEN 'en'
                  ELSE 'other' END AS lang_guess
      FROM documents
    ), ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rk
      FROM feats
      WHERE n_tokens >= 20 AND ttr >= 0.2 AND lang_guess = 'en'
    ), staged AS (
      SELECT CASE WHEN f.n_tokens < 20 THEN '1_too_short'
                  WHEN f.ttr < 0.2 THEN '2_low_ttr'
                  WHEN f.lang_guess <> 'en' THEN '3_non_english'
                  WHEN r.rk > 1 THEN '4_duplicate'
                  ELSE '5_kept' END AS stage
      FROM feats f LEFT JOIN ranked r ON f.doc_id = r.doc_id
    )
    SELECT stage, COUNT(*) AS n_docs,
           round(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS corpus_share
    FROM staged GROUP BY stage
    """,
    tags=("llm", "pipeline"),
)
def pipeline_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-funnel attribution: every document is charged to the FIRST
    curation stage that kills it (length gate → type-token-ratio gate →
    language gate → exact dedup) or to '5_kept'. This is the report that
    tells you WHERE the corpus dies — whether a mix change should relax
    the quality gate or fix the dedup key — and shares must sum to 1 by
    construction (each doc counted exactly once, unlike running each
    filter independently).

    Scale: features are map-side; the dedup rank is one shuffle over
    stage-3 survivors only; the stage rollup is a 5-key agg and the
    share window runs on 5 rows. Adding a stage = one more WHEN branch,
    same plan shape."""
    from lagom_kinesis_spark.operators.text import tokens

    d = fan_out(load(spark, sf_dir, "documents"))
    toks = tokens("text")
    en = F.array([F.lit(m) for m in ["the", "and", "of"]])
    feats = d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks).cast("double")).alias(
            "ttr"
        ),
        F.when(F.arrays_overlap(toks, en), "en").otherwise("other").alias(
            "lang_guess"
        ),
    )
    surv = feats.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("ttr") >= 0.2)
        & (F.col("lang_guess") == "en")
    )
    ranked = surv.select(
        "doc_id",
        F.row_number()
        .over(W.partitionBy("h").orderBy("doc_id"))
        .alias("rk"),
    )
    stage = (
        F.when(F.col("n_tokens") < 20, "1_too_short")
        .when(F.col("ttr") < 0.2, "2_low_ttr")
        .when(F.col("lang_guess") != "en", "3_non_english")
        .when(F.col("rk") > 1, "4_duplicate")
        .otherwise("5_kept")
    )
    staged = feats.join(ranked, "doc_id", "left").select(stage.alias("stage"))
    counts = staged.groupBy("stage").agg(F.count("*").alias("n_docs"))
    return counts.select(
        "stage",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(W.partitionBy()).cast("double"),
            6,
        ).alias("corpus_share"),
    )


@register(
    "text_gopher_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks) AS mwl,
             len(list_filter(toks,
                 x -> list_contains(['the','and','of','a','in','to'], x)))
               AS sw_hits,
             CAST(len(list_filter(toks, x -> regexp_full_match(x, '[0-9]+')))
                  AS DOUBLE) / len(toks) AS digit_ratio
      FROM t
    )
    SELECT doc_id, n_words, round(mwl, 6) AS mean_word_len, sw_hits,
           round(digit_ratio, 6) AS digit_ratio,
           (n_words BETWEEN 5 AND 100000
            AND mwl BETWEEN 2 AND 12
            AND sw_hits >= 2
            AND digit_ratio <= 0.3) AS keep
    FROM m
    """,
    tags=("llm", "text", "quality"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1, the
    standard pre-filter in pretraining curation): word-count bounds, mean
    word length in [2, 12], ≥2 stopword hits, and a numeric-token ratio
    cap, composed into one keep decision.

    All four signals derive from integer counts over the token array, so
    every ratio is the same two-integer division on both engines and even
    the boolean is deterministic (no float-accumulation order anywhere).
    Map-only array expressions in codegen — no shuffle, no UDF; at 100 TB
    this is a pure scan-side filter that fuses with downstream stages."""
    from lagom_kinesis_spark.operators.text import STOPWORDS, tokens

    d = load(spark, sf_dir, "documents")
    sw = F.array([F.lit(s) for s in STOPWORDS])
    toks = tokens("text")
    m = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        (
            F.aggregate(
                F.transform(toks, F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size(toks)
        ).alias("mwl"),
        F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).alias("sw_hits"),
        (
            F.size(F.filter(toks, lambda x: x.rlike("^[0-9]+$"))).cast("double")
            / F.size(toks)
        ).alias("digit_ratio"),
    )
    return m.select(
        "doc_id",
        "n_words",
        r6(F.col("mwl")).alias("mean_word_len"),
        "sw_hits",
        r6(F.col("digit_ratio")).alias("digit_ratio"),
        (
            F.col("n_words").between(5, 100000)
            & F.col("mwl").between(2, 12)
            & (F.col("sw_hits") >= 2)
            & (F.col("digit_ratio") <= 0.3)
        ).alias("keep"),
    )


@register(
    "mix_epoch_upsample",
    oracle="""
    SELECT doc_id, source, n_chars, CAST(epoch_idx AS BIGINT) AS epoch_idx
    FROM documents,
         LATERAL unnest(generate_series(1,
           CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 3
                WHEN source IN ('src5','src6','src7','src8','src9') THEN 2
                ELSE 1 END)) AS t(epoch_idx)
    """,
    tags=("llm", "mixing"),
)
def mix_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-based source upsampling (the mixing knob next to quota and
    temperature sampling: high-quality sources repeat for N epochs in the
    training stream — cf. Llama/Gopher data recipes). Each doc explodes
    into `epochs(source)` tagged copies via sequence+explode — map-only
    row generation, no shuffle, no join; the epoch map is a literal CASE,
    so at 100 TB the expansion happens executor-local at scan time and
    fan-out is bounded by max epochs, never data size."""
    d = load(spark, sf_dir, "documents")
    epochs = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3", "src4"), 3)
        .when(F.col("source").isin("src5", "src6", "src7", "src8", "src9"), 2)
        .otherwise(1)
    )
    return d.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(1), epochs)).alias("ei"),
    ).select(
        "doc_id", "source", "n_chars", F.col("ei").cast("long").alias("epoch_idx")
    )


@register(
    "mix_dsir_importance",
    oracle=f"""
    WITH t2 AS (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), toks AS (
      SELECT doc_id, lang, ({sketches.portable_hash_sql("tok")}) % 256 AS b
      FROM t2 WHERE tok <> ''
    ), docb AS (
      SELECT doc_id, b, COUNT(*) AS c FROM toks GROUP BY 1, 2
    ), stats AS (
      SELECT b, COUNT(*) AS r_c,
             COUNT(*) FILTER (WHERE lang = 'en') AS t_c
      FROM toks GROUP BY b
    ), tot AS (
      SELECT CAST(SUM(r_c) AS BIGINT) AS r_n, CAST(SUM(t_c) AS BIGINT) AS t_n
      FROM stats
    )
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
           round(SUM(c * (ln((t_c + 1) / CAST(t_n + 256 AS DOUBLE))
                        - ln((r_c + 1) / CAST(r_n + 256 AS DOUBLE)))), 6)
             AS log_weight
    FROM docb JOIN stats USING (b) CROSS JOIN tot
    GROUP BY doc_id
    """,
    # "scalar": the only NLJ is the broadcast 1-row corpus-totals row.
    tags=("llm", "pipeline", "mix", "scalar"),
)
def mix_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, 'Data Selection
    for Language Models via Importance Resampling'): score every raw doc
    by its log likelihood ratio between a TARGET distribution (here the
    English subset stands in for the curated target) and the RAW corpus,
    both modeled as bag-of-hashed-unigrams over 256 buckets with add-1
    smoothing. Resampling by these weights tilts a 100 TB crawl toward
    the target domain without a model in the loop.

    Plan: explode-once → bucket by the portable 64-bit hash (a FIXED
    256-row feature space, so the model is a broadcast join however big
    the corpus) → per-(doc,bucket) counts → one doc-keyed agg. Two
    shuffles total, independent of corpus size; no vocabulary-sized state
    anywhere — that is the point of hashed features at scale. ln() on
    identical doubles both engines, summed over ≤256 terms per doc, far
    inside the round-6 quantum."""
    from lagom_kinesis_spark.operators.similarity import portable_token_hash

    d = fan_out(load(spark, sf_dir, "documents"))
    toks = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "lang",
            F.pmod(portable_token_hash(F.col("tok")), F.lit(256)).alias("b"),
        )
    )
    docb = toks.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    stats = toks.groupBy("b").agg(
        F.count("*").alias("r_c"),
        F.count_if(F.col("lang") == "en").alias("t_c"),
    )
    tot = stats.agg(
        F.sum("r_c").alias("r_n"), F.sum("t_c").alias("t_n")
    )
    lr = F.log((F.col("t_c") + 1) / (F.col("t_n") + 256).cast("double")) - F.log(
        (F.col("r_c") + 1) / (F.col("r_n") + 256).cast("double")
    )
    return (
        docb.join(F.broadcast(stats), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            r6(F.sum(F.col("c") * lr)).alias("log_weight"),
        )
    )


@register(
    "text_bpe_encode",
    oracle=f"""
    WITH words AS (
      SELECT w AS word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ), seq0 AS (
      SELECT word, freq,
             rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
      FROM words
    ),{_bpe_pairs_sql("seq0", "e1")},
    mm1 AS (SELECT a, b FROM e1_r WHERE rn = 1),
    seq1 AS (
      SELECT word, freq, {_bpe_merge_sql("seq", "mm1.a", "mm1.b")} AS seq
      FROM seq0 CROSS JOIN mm1
    ),{_bpe_pairs_sql("seq1", "e2")},
    mm2 AS (SELECT a, b FROM e2_r WHERE rn = 1),
    enc AS (
      SELECT word,
             CAST(len(string_split(
               {_bpe_merge_sql("seq", "mm2.a", "mm2.b")}, ' '))
               AS BIGINT) AS n_sym
      FROM seq1 CROSS JOIN mm2
    ), inst AS (
      SELECT doc_id, w AS word
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      WHERE w <> ''
    )
    SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
           round(SUM(n_sym) / CAST(COUNT(*) AS DOUBLE), 6) AS fertility
    FROM inst JOIN enc USING (word)
    GROUP BY doc_id
    """,
    tags=("llm", "pipeline", "text", "iterative", "cross"),
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION at corpus scale — the other half of
    text_bpe_train_merges: derive the first two merges in-plan, encode the
    VOCABULARY once (apply merge 1 then merge 2 to each distinct word's
    symbol sequence), then join token INSTANCES to the encoded dictionary
    — per doc: word count, BPE token count, and fertility (BPE tokens per
    word), the tokenizer-efficiency audit every model team runs per
    corpus slice.

    The dictionary-encode trick IS the scale design: encoding work is
    O(vocabulary), never O(corpus); the corpus pays only an equi-join of
    instances to the (vocabulary-sized, typically broadcastable) encode
    table — the same two-shuffle shape as tfidf, however many merges the
    tokenizer has. Merge application is a broadcast 1-row cross join +
    map-only left-to-right ``replace`` (identical non-overlapping
    semantics in both engines)."""
    d = fan_out(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    words = toks.groupBy("word").agg(F.count("*").alias("freq"))
    seq0 = _bpe_char_seq(words)
    seq1 = _bpe_apply_merge(seq0, _bpe_pair_ranks(seq0))
    seq2 = _bpe_apply_merge(seq1, _bpe_pair_ranks(seq1))
    enc = seq2.select(
        "word", F.size(F.split("seq", " ")).cast("long").alias("n_sym")
    )
    return (
        toks.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
            r6(F.sum("n_sym") / F.count("*")).alias("fertility"),
        )
    )


@register(
    "emb_matryoshka_audit",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, v AS qv FROM corpus WHERE vec_id < 5
    ), fullr AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC,
                          e.vec_id) AS rn
        FROM q CROSS JOIN corpus e
      ) WHERE rn <= 10
    ), truncr AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.q_id
                 ORDER BY round(list_cosine_similarity(q.qv[1:16], e.v[1:16]), 6)
                          DESC, e.vec_id) AS rn
        FROM q CROSS JOIN corpus e
      ) WHERE rn <= 10
    )
    SELECT f.q_id, COUNT(t.vec_id) AS n_hits,
           round(COUNT(t.vec_id) / 10.0, 6) AS recall_at_10
    FROM fullr f
    LEFT JOIN truncr t ON f.q_id = t.q_id AND f.vec_id = t.vec_id
    GROUP BY f.q_id
    """,
    tags=("llm", "similarity", "embedding"),
)
def emb_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation audit (Kusupati et al. 2022): recall@10 of
    retrieval over only the FIRST 16 of 64 embedding dimensions against
    the full-dimension ranking, in one plan — the measurement that decides
    whether an MRL-trained model's cheap prefix is good enough to shrink
    the index 4x (storage and matmul both scale with the kept prefix).

    Both arms are the bounded-anchor brute-force pass (broadcast query
    panel, Arrow-batched matmul, per-batch partial top-k); the truncated
    arm scans 16-wide slices, which at 100 TB is the actual saving being
    measured. Audit join is |queries|x10 rows. Oracle: the all-pairs
    phrasing with DuckDB list slicing."""
    from lagom_kinesis_spark.operators.similarity import (
        batch_topk_cosine,
        embedding_query_panel,
    )

    e = load(spark, sf_dir, "embeddings")
    # |Q| = 5 — bounded panel, driver-side footer read (no Spark job; r9)
    q_ids, _, q_full = embedding_query_panel(sf_dir, 5)
    corpus16 = e.select(
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )

    def top10(scored: DataFrame) -> DataFrame:
        w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), "vec_id")
        return (
            scored.select(
                "q_id", "vec_id", r6(F.col("cos_sim")).alias("cos_sim")
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("q_id", "vec_id")
        )

    full = top10(batch_topk_cosine(e, "vec_id", "embedding", q_ids, q_full, k=15))
    trunc = top10(
        batch_topk_cosine(
            corpus16, "vec_id", "embedding", q_ids, q_full[:, :16], k=15
        )
    ).select("q_id", "vec_id", F.lit(1).alias("hit"))
    return (
        full.join(F.broadcast(trunc), ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / 10.0, 6).alias("recall_at_10"),
        )
    )


@register(
    "sample_reservoir_per_group",
    oracle=events_cte(
        """
    , r AS (
      SELECT event_type, event_id, user_id,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)),
                                         event_id) AS rn
      FROM events
    )
    SELECT event_type, event_id, user_id, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 5
    """
    ),
    tags=("llm", "pipeline", "sample"),
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group 'reservoir': a fixed-size uniform-looking
    sample of k=5 rows per event type, ordered by md5(id) — the
    debugging/eval-panel sample every pipeline stage wants ('show me 5
    random examples per stratum') made replayable: the same rows come
    back on every run and on both engines, unlike rand()-reservoirs.

    Plan: rank window per group — at scale the md5 rank with a group-limit
    pushes to per-partition top-k before the exchange (WindowGroupLimit),
    so the shuffle carries k·partitions rows, not the corpus."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string").cast("binary")), "event_id"
    )
    return (
        e.select(
            "event_type",
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "pack_length_bucketed_batching",
    oracle="""
    WITH lens AS (
      SELECT len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS n
      FROM documents
    ), b AS (
      SELECT n,
             CASE WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
                  WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
                  WHEN n <= 512 THEN 512 ELSE 1024 END AS bucket_len
      FROM lens WHERE n > 0
    )
    SELECT bucket_len, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS real_tokens,
           CAST(SUM(bucket_len - n) AS BIGINT) AS pad_tokens,
           round(SUM(bucket_len - n)
                 / CAST(SUM(bucket_len) AS DOUBLE), 6) AS waste_share
    FROM b GROUP BY bucket_len
    """,
    tags=("llm", "pipeline", "pack"),
)
def pack_length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching plan — the inference/training-serving
    counterpart of pack_context_windows: documents are grouped into
    power-of-two length buckets (32..1024) and the report prices each
    bucket's PADDING WASTE (pad tokens as a share of billed tokens) —
    the number that decides bucket boundaries for batch inference, where
    every sequence in a batch pays the longest sequence's length. All
    integer arithmetic (bucket edges by CASE ladder, no float log2), so
    even the shares are exact-input r6.

    Scale: map-only length + bucket classification fused into the scan,
    one bucket-keyed agg (≤6 groups) — one pass at any corpus size."""
    d = load(spark, sf_dir, "documents")
    n = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    )
    bucket = (
        F.when(n <= 32, 32)
        .when(n <= 64, 64)
        .when(n <= 128, 128)
        .when(n <= 256, 256)
        .when(n <= 512, 512)
        .otherwise(1024)
    )
    b = d.select(n.alias("n"), bucket.alias("bucket_len")).filter(
        F.col("n") > 0
    )
    pad = F.col("bucket_len") - F.col("n")
    return b.groupBy("bucket_len").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("real_tokens"),
        F.sum(pad).alias("pad_tokens"),
        r6(F.sum(pad) / F.sum("bucket_len").cast("double")).alias(
            "waste_share"
        ),
    )


@register(
    "pipeline_source_blocklist",
    oracle="""
    WITH stats AS (
      SELECT source, round(AVG(n_chars), 6) AS avg_chars
      FROM documents GROUP BY source
    ),
    global_avg AS (SELECT round(AVG(n_chars), 6) AS g FROM documents),
    blocked AS (
      SELECT source FROM stats CROSS JOIN global_avg WHERE avg_chars < g
    )
    SELECT d.lang,
           COUNT(*) AS n_kept,
           CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
    FROM documents d
    WHERE d.source NOT IN (SELECT source FROM blocked)
    GROUP BY d.lang
    """,
    # "cross" acknowledges the deliberate 1-row broadcast of the corpus
    # mean (the same bounded pattern as text_tfidf's N; audit_plans
    # exemption).
    tags=("llm", "pipeline", "filter", "cross"),
)
def pipeline_source_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/domain blocklist filtering — the curation step every web
    corpus applies before quality scoring (UT1-style blocklists, spam
    domain kill-lists). The blocklist here is DERIVED in-plan (sources
    whose mean document length falls below the corpus mean — a
    scale-stable, share-relative rule that stays non-empty at every sf)
    rather than read from a file, so the oracle states it exactly; a
    production run swaps the derivation for a curated table and the plan
    shape is unchanged.

    Scale shape: the blocklist side is post-aggregation (|sources| rows)
    → broadcast LEFT ANTI join against the corpus scan, zero corpus
    shuffles before the final per-lang aggregate. The corpus is scanned
    twice (once to derive the list, once to filter) — at 100 TB the
    derivation scan reads only (source, n_chars), column-pruned; a
    file-based blocklist drops it entirely. Threshold comparison happens
    on round-6 values on BOTH engines so a float ulp can never flip a
    source's membership."""
    d = load(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(r6(F.avg("n_chars")).alias("avg_chars"))
    g = d.agg(r6(F.avg("n_chars")).alias("g"))
    blocked = stats.crossJoin(F.broadcast(g)).filter(
        F.col("avg_chars") < F.col("g")
    ).select("source")
    kept = d.join(F.broadcast(blocked), "source", "left_anti")
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )


@register(
    "sample_temporal_split",
    oracle=events_cte(
        """
    , bounds AS (
      SELECT MIN(epoch_us(ts)) AS lo,
             MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) * 4 // 5
               AS cutoff
      FROM events
    )
    SELECT CASE WHEN epoch_us(ts) < cutoff THEN 'train' ELSE 'eval' END AS split,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events CROSS JOIN bounds
    GROUP BY split
    """
    ),
    # "cross" = the deliberate 1-row bounds broadcast (audit exemption).
    tags=("llm", "pipeline", "sample", "cross"),
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split — the leakage-safe alternative to hash
    splitting for time-dependent data (forecasting, recommendation,
    behavior models): everything before the cutoff trains, everything
    after evaluates, so the model never sees the future. The cutoff is
    the 80% point of the observed time span, computed IN-PLAN as exact
    integer microseconds (a 1-row broadcast aggregate — no driver
    round-trip, no float quantile whose rounding could flip a boundary
    row between engines). The per-split distinct-user count is the
    overlap report that tells you whether user-level leakage needs a
    second split dimension.

    Scale: one column-pruned bounds scan + one map-side classification
    fused into the main scan + a 2-group aggregate — two passes, no
    wide shuffle (the distinct rides a (split, user) partial)."""
    from lagom_kinesis_spark.catalog import normalize_event_ts

    e = normalize_event_ts(load(spark, sf_dir, "events"))
    us = F.unix_micros(F.col("ts"))
    # Integer `div`, not float `/`: the span is non-negative so long div
    # equals DuckDB's floor-div `// 5` at ANY magnitude — the previous
    # double division only matched because epoch_us < 2^53 (ADVICE r9).
    bounds = e.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).select(
        (F.col("lo") + F.expr("((hi - lo) * 4L) div 5")).alias("cutoff")
    )
    split = F.when(us < F.col("cutoff"), "train").otherwise("eval")
    return (
        e.crossJoin(F.broadcast(bounds))
        .select(split.alias("split"), "user_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "mix_token_budget_allocation",
    oracle="""
    WITH stats AS (
      SELECT source,
             CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t FROM stats),
    alloc AS (
      SELECT source, tokens,
             CAST((CAST(t AS HUGEINT) // 2) * tokens // t AS BIGINT) AS base,
             ((CAST(t AS HUGEINT) // 2) * tokens) % t AS rem,
             t
      FROM stats CROSS JOIN tot
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
             (t // 2) - SUM(base) OVER () AS leftover
      FROM alloc
    )
    SELECT source, tokens,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS quota
    FROM ranked
    """,
    # "cross" = the 1-row corpus-total broadcast (audit exemption).
    tags=("llm", "pipeline", "mix", "cross"),
)
def mix_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources by the LARGEST-REMAINDER
    method — the planning step that turns 'train on 50% of the corpus,
    proportionally by source' into per-source integer quotas that sum to
    the budget EXACTLY. Naive floor(B·t_s/T) under-allocates by up to
    |sources|−1 tokens and float rounding can over-allocate; largest
    remainder distributes the shortfall to the sources with the biggest
    truncated fraction, all in exact WIDE-integer arithmetic: the product
    B·t_s overflows int64 once T·t_s ≥ 2^63 (~9.2e18 tokens² — reachable
    at corpus scale), so the base/remainder math runs in DECIMAL(38,0) on
    the Spark side and HUGEINT in the oracle (the same wide-integer
    pattern as behavior_attribution_first_touch; exact up to B·t_s <
    1e38, i.e. any corpus whose token count fits int64). Remainders are
    compared as (B·t_s) mod T — no float ever enters, so no engine can
    disagree at a boundary.

    Scale: one token-count aggregate over the corpus (map-side partial),
    then all window work happens on the |sources|-row stats relation —
    the global rank window is over the mixture table, never the data."""
    d = load(spark, sf_dir, "documents")
    tok = F.size(F.split(F.lower("text"), " "))
    stats = d.groupBy("source").agg(
        F.sum(tok).cast("long").alias("tokens")
    )
    tot = stats.agg(F.sum("tokens").cast("long").alias("t"))
    # DECIMAL(38,0) product: (t div 2) * tokens < 1e38 for any int64 token
    # total, where the int64 product overflows at ~2^63. rem = prod % t is
    # exact (BigDecimal remainder); base = (prod - rem) / t divides evenly,
    # so the scale-6 decimal quotient is an exact integer — no rounded
    # division ever feeds a comparison.
    prod = F.expr(
        "CAST(t div 2 AS DECIMAL(38,0)) * CAST(tokens AS DECIMAL(38,0))"
    )
    remd = prod % F.col("t").cast("decimal(38,0)")
    alloc = stats.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        ((prod - remd) / F.col("t").cast("decimal(38,0)"))
        .cast("long")
        .alias("base"),
        remd.alias("rem"),
        "t",
    )
    w_all = W.orderBy(F.col("rem").desc(), "source")
    ranked = alloc.select(
        "source",
        "tokens",
        "base",
        F.row_number().over(w_all).alias("rk"),
        (
            F.expr("t div 2") - F.sum("base").over(W.partitionBy())
        ).alias("leftover"),
    )
    return ranked.select(
        "source",
        "tokens",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("quota"),
    )
