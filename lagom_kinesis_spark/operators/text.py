"""Text-analysis building blocks: tokenization, shingling, fingerprints.

All pure Column expressions (JVM-side, codegen'd) so they run inside
whole-stage codegen over 100 TB of documents without touching Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny function-word lists for the deterministic lang-id heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "nicht"],
    "es": ["el", "la", "que"],
    "fr": ["le", "et", "les"],
}

STOPWORDS = ["the", "and", "of", "a", "in", "to"]


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def bigrams(text: Column | str) -> Column:
    """Adjacent-token bigram array (space-joined pairs), with the
    short-doc guard Spark's descending ``sequence(0, -1)`` requires and
    the ``let`` binding that keeps tokenization O(n), not O(n²) (Catalyst
    inlines column expressions at every reference site). ONE definition —
    it was copy-pasted in text_bigrams and quality_repetition_filter."""
    from lagom_kinesis_spark.functions.helpers import let

    return let(
        tokens(text),
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, (i + 1).cast("int")),
                    F.element_at(t, (i + 2).cast("int")),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles (space-joined token windows).

    Empty when the document has fewer than ``n`` tokens. The token array is
    let-bound (helpers.let) so it is evaluated once per row, not once per
    element reference — without this the split() inlines into every
    element_at and the expression is O(tokens²) per row.
    """
    from lagom_kinesis_spark.functions.helpers import let

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(t) - n)
        grams = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
        # Guard: Spark's sequence(0, negative) counts DOWN — short docs
        # must yield an empty shingle set, not bogus reversed windows.
        return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    return let(toks, build)


def fingerprint(text: Column | str) -> Column:
    """Canonical fingerprint: md5 of the sorted distinct token set.

    The classic 'fingerprint' clustering key — robust to token order and
    duplication, cheap to group on at scale."""
    t = tokens(text)
    return F.md5(
        F.concat_ws(" ", F.sort_array(F.array_distinct(t))).cast("binary")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two arrays (set semantics; any element
    type — the shingle paths pass xxhash64 longs, see shingle_hash_proxy)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def shingle_hash_proxy(sh: Column) -> Column:
    """xxhash64 proxy for a shingle-string array: 8-byte longs instead of
    ~25-byte strings through every downstream exchange, sort and compare
    (guide §2.3 "narrower types"). THE one definition — the r12 verify-join
    cut inlined the transform at each site; this names the contract.

    Safe wherever downstream logic depends only on shingle IDENTITY (set
    sizes, equality): any injective-on-corpus map preserves |a∩b| and
    |a∪b|, and therefore every exact-Jaccard value and verified pair set.
    Injectivity is asserted corpus-wide against the live fixture by
    tests/test_operators.py::test_shingle_hash_proxy_is_injective_on_fixture;
    per-pair collision odds are birthday-on-2^64 over one pair's shingle
    union (~10^3 elements), ~3e-14 — at 10^12 candidate pairs the expected
    collision count is still ≪1, but not structurally zero. ESCAPE HATCH
    if a fixture regeneration (or a real corpus) ever collides: bump the
    seed HERE — xxhash64 accepts a seed argument, so swap in
    ``F.xxhash64(s, F.lit(1))`` (one site, every consumer follows); any
    injective-on-fixture map works and the oracle hashes re-verify the
    outcome.

    NOT for the MinHash SIGNATURE path (lsh_candidate_pairs): its hash
    family determines the candidate set that the LSH oracles' exactness
    argument pins — signatures must keep hashing the shingle STRINGS."""
    return F.transform(sh, lambda s: F.xxhash64(s))


#: Rabin–Karp polynomial base/modulus for rolling-hash fingerprints.
#: codepoint·B^(k-1)·k fits comfortably in int64 for k=8 and B=31, so the
#: polynomial is exact integer math — bit-identical on any engine (no
#: engine-specific hash function needed for the cross-check).
RK_BASE = 31
RK_MOD = 2_147_483_647  # 2^31 - 1


def winnow_fingerprints(text: Column | str, k: int = 8, w: int = 4) -> Column:
    """Winnowed rolling-hash fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS algorithm): Rabin–Karp hash every k-char window of the
    lowercased text — h = (Σ_j code_j · B^(k-1-j)) mod M — then keep the
    minimum hash of each w-long hash window, distinct.

    Entirely JVM higher-order expressions (map-only at any scale): the
    codepoint array is let-bound and computed once, window hashes index
    into it, winnowing is a min over slices. Documents shorter than
    ``k + w - 1`` chars yield an empty fingerprint set."""
    from lagom_kinesis_spark.functions.helpers import let

    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    weights = [RK_BASE ** (k - 1 - j) for j in range(k)]

    def build_codes(s: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda p: F.ascii(F.substring(s, p.cast("int"), 1)).cast("long"),
        )

    def build_fps(codes: Column) -> Column:
        n = F.size(codes)
        hashes = F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: (
                sum(
                    (
                        F.element_at(codes, (i + j + 1).cast("int")) * F.lit(wt)
                        for j, wt in enumerate(weights)
                    ),
                    F.lit(0).cast("long"),
                )
                % RK_MOD
            ),
        )
        winnowed = let(
            hashes,
            lambda h: F.transform(
                F.sequence(F.lit(1), F.size(h) - (w - 1)),
                lambda i: F.array_min(F.slice(h, i.cast("int"), w)),
            ),
        )
        return F.when(
            n >= k + w - 1, F.array_distinct(winnowed)
        ).otherwise(F.array().cast("array<long>"))

    return let(lowered, lambda s: let(build_codes(s), build_fps))


def lang_guess_expr(toks: Column) -> Column:
    """Marker-word language guess over a token array — the ONE definition
    of the classifier fold (first matching language in LANG_MARKERS
    order, else 'und'). Shared by text_langid, pipeline_corpus_filter,
    and text_lang_confusion so the confusion matrix always grades the
    same classifier that gates the corpus."""
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        markers = F.array([F.lit(m) for m in LANG_MARKERS[lang]])
        expr = F.when(F.arrays_overlap(toks, markers), lang).otherwise(expr)
    return expr
