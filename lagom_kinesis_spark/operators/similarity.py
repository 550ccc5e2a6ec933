"""Similarity / near-duplicate operators: cosine, MinHash-LSH, SimHash, LSH-ANN.

Design for 100 TB (SURVEY.md §7 M5): never a global cartesian product.
Exact all-pairs variants exist only as correctness oracles over small
subsets; the scale paths are *blocked*: candidate pairs come from hash
buckets (MinHash bands / SimHash bands / random-hyperplane buckets), each
bucket is tiny, and the quadratic step happens per-bucket — an equi-join
Catalyst shuffles on the bucket key like any other join.

Everything below is pure DataFrame ops: hashing via ``xxhash64`` (JVM),
dot products via higher-order array functions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Cosine similarity (exact) — higher-order functions, Catalyst-visible
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# MinHash + banded LSH over shingle arrays
# ---------------------------------------------------------------------------


def minhash_signature(sh: Column, num_hashes: int = 16) -> list[Column]:
    """MinHash signature: per seed i, min over shingles of xxhash64(s, i).

    Standard one-permutation-per-seed MinHash (Broder 1997): the probability
    two docs share a min-hash equals their Jaccard similarity."""
    return [
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i)))).alias(
            f"mh{i}"
        )
        for i in range(num_hashes)
    ]


def lsh_candidate_pairs(
    docs: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash-LSH.

    bands=4 × rows=4 over 16 hashes → P(candidate) = 1-(1-j^4)^4: ~0.97 at
    j=0.8, ~0.04 at j=0.3 — the classic S-curve. Each band is an equi-join
    on the band key; bucket sizes stay small so the per-bucket pairing is
    bounded. Returns distinct (id_a, id_b).
    """
    rows_per_band = num_hashes // bands
    sigs = docs.select(
        F.col(id_col), *minhash_signature(F.col(shingle_col), num_hashes)
    )
    band_frames = []
    for b in range(bands):
        cols = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_frames.append(
            sigs.select(
                F.col(id_col),
                F.xxhash64(F.lit(b), *cols).alias("bucket"),
            )
        )
    buckets = band_frames[0]
    for bf in band_frames[1:]:
        buckets = buckets.unionByName(bf)
    a = buckets.select(F.col(id_col).alias("id_a"), "bucket")
    b_ = buckets.select(F.col(id_col).alias("id_b"), "bucket")
    return (
        a.join(b_, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash (Charikar 2002) over token arrays
# ---------------------------------------------------------------------------


def simhash64(toks: Column) -> Column:
    """64-bit SimHash: bit j = sign of sum over tokens of ±1 where the sign
    is bit j of xxhash64(token). Near-duplicate docs land within small
    Hamming distance."""
    bit_cols = []
    for j in range(64):
        contrib = F.transform(
            toks,
            lambda t: F.when(
                F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )
        s = F.aggregate(contrib, F.lit(0), lambda acc, x: acc + x)
        bit_cols.append(F.when(s > 0, F.lit(1).cast("long") << j).otherwise(F.lit(0).cast("long")))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out.bitwiseOR(c)
    return out


# ---------------------------------------------------------------------------
# Random-hyperplane LSH for embedding ANN
# ---------------------------------------------------------------------------


def hyperplane_bucket(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """Sign-random-projection bucket id (Charikar SRP-LSH): bit j = sign of
    <v, h_j> where h_j has deterministic ±1 components derived from
    xxhash64(j, i). Collision probability = 1 - θ/π per bit.

    Expressed as nested higher-order functions — no shuffle, no UDF; at
    100 TB this is a map-only projection each executor computes locally."""
    bits = []
    for j in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x.cast("double")
                * F.when(F.xxhash64(F.lit(j), i) % 2 == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit(1).cast("long") << j).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for c in bits[1:]:
        out = out.bitwiseOR(c)
    return out
