"""Semantic property tests for the training-data curation operators
(queries/llm_pipeline.py) — invariants the differential oracle can't
express: determinism across reruns, quantization error bounds, true
containment of decontamination hits, quota caps, mask completeness.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from lagom_kinesis_spark.registry import all_queries
from tests.conftest import SF_DIR

QS = all_queries()


def test_stratified_sample_deterministic_and_stratified(spark):
    """The kept-set is a pure function of the rows: two runs agree exactly,
    and the 'en' stratum keeps at roughly half the rate of the others."""
    a = {tuple(r) for r in QS["sample_stratified_hash"].fn(spark, SF_DIR).collect()}
    b = {tuple(r) for r in QS["sample_stratified_hash"].fn(spark, SF_DIR).collect()}
    assert a == b
    by_lang = {r[0]: r for r in a}
    en = by_lang["en"]
    others = [r for lang, r in by_lang.items() if lang != "en"]
    # en rate ≈ 64/256, others ≈ 128/256; sampled counts are small, so just
    # assert the ordering and sane bounds.
    assert 0.05 < en[3] < 0.45
    for o in others:
        assert o[3] > en[3] * 0.9


def test_mix_source_quota_caps_every_source(spark):
    rows = QS["mix_source_quota"].fn(spark, SF_DIR).collect()
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
        assert 1 <= r["rn"] <= 12
    assert per_source and all(n <= 12 for n in per_source.values())
    again = QS["mix_source_quota"].fn(spark, SF_DIR).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}


def test_decontaminate_hits_truly_share_an_8gram(spark):
    """Every flagged doc must share a verbatim 8-gram with some benchmark
    doc — recomputed here in plain Python, independently of the Spark
    n-gram construction."""
    flagged = QS["decontaminate_ngram_overlap"].fn(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }

    def grams(text: str) -> set[str]:
        w = text.lower().split(" ")
        return {" ".join(w[i : i + 8]) for i in range(len(w) - 7)}

    bench = set()
    for doc_id, text in docs.items():
        if doc_id % 50 == 0:
            bench |= grams(text)
    for r in flagged:
        assert r["doc_id"] % 50 != 0
        shared = grams(docs[r["doc_id"]]) & bench
        assert len(shared) == r["n_shared_ngrams"] > 0


def test_quantization_roundtrip_error_bound(spark):
    """Dequantized values must sit within half a quantization step of the
    original: |x - q/scale| <= 0.5/scale (+float slack)."""
    out = {r["vec_id"]: r for r in QS["emb_quantize_int8"].fn(spark, SF_DIR).collect()}
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50).collect()
    for row in src:
        q = json.loads(out[row["vec_id"]]["q_json"])
        scale = out[row["vec_id"]]["scale"]
        assert len(q) == len(row["embedding"])
        assert all(-127 <= v <= 127 for v in q)
        for x, v in zip(row["embedding"], q):
            assert abs(x - v / scale) <= 0.5 / scale + 1e-6


def test_pii_mask_leaves_no_digits(spark):
    """The masking template must contain no digits for any event row."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    survivors = (
        e.select(F.regexp_replace("props", "[0-9]+", "<NUM>").alias("tpl"))
        .filter(F.col("tpl").rlike("[0-9]"))
        .count()
    )
    assert survivors == 0


def test_repetition_flag_consistent_with_share(spark):
    rows = QS["text_repetition_ratio"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert (r["is_repetitive"] == 1) == (r["top_word_share"] > 0.08)
        assert 0 < r["top_word_share"] <= 1.0


def test_centroid_distance_nonnegative_and_zero_for_singletons(spark):
    """L2-to-centroid is >= 0 everywhere; any label with exactly one vector
    has distance ~0 to its own centroid."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    singleton_labels = {
        r["label"]
        for r in e.groupBy("label").count().filter(F.col("count") == 1).collect()
    }
    dists = QS["emb_centroid_distance"].fn(spark, SF_DIR).collect()
    by_vec = {r["vec_id"]: r["l2_to_centroid"] for r in dists}
    labels = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    assert all(d >= 0 for d in by_vec.values())
    for vec_id, lab in labels.items():
        if lab in singleton_labels:
            assert by_vec[vec_id] < 1e-6
