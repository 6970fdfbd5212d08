"""Deterministic hashing primitives for dedup/fingerprinting.

Everything is built from ``md5`` prefixes so the DuckDB oracle can
compute bit-identical values (`conv(substr(md5(x),1,8),16,10)` ==
duckdb `('0x'||substr(md5(x),1,8))::bigint`). Spark's native
``xxhash64``/``hash`` would be faster but engine-private; md5 keeps the
whole dedup surface differentially testable. All expressions are
JVM-side higher-order functions — no Python in the hot path.

Scale: signatures are computed in one narrow map stage (no shuffle);
the LSH band join is the only shuffle and its key (band hash) is
uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# prime > 2^32 for the universal-hash family
MINHASH_PRIME = 4294967311


def md5_int32(c: Column) -> Column:
    """First 8 hex chars of md5 as a non-negative long (32-bit range)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_int60(c: Column) -> Column:
    """First 15 hex chars of md5 as a long (60-bit, positive)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def char_shingles(c: Column, k: int = 5) -> Column:
    """All length-k character shingles (short texts yield their prefix)."""
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, F.lit(k)))


def word_ngrams(c: Column, n: int = 3) -> Column:
    """Whitespace-token n-grams re-joined with single spaces."""
    tokens = F.split(F.trim(c), r"\s+")
    cnt = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )


def minhash_signature(hashes: Column, num_perm: int = 12) -> Column:
    """MinHash signature via the universal hash family
    h_p(x) = ((2p+1)·x + 7919p + 13) mod PRIME, p = 0..num_perm-1."""
    def perm(p: int):
        a, b = 2 * p + 1, 7919 * p + 13
        # closure (not lambda defaults): PySpark infers HOF arity from the
        # lambda signature, so extra default args break resolution
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)

    sigs = [F.array_min(F.transform(hashes, perm(p))) for p in range(num_perm)]
    return F.array(*sigs)


def band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH banding: array of `bands` STRUCT keys, one per band, each
    carrying the band index plus its `rows` consecutive signature
    slots as integer fields.

    A struct key is an injective function of the slot tuple (exactly
    like the former '_'-joined string key), so the candidate set — and
    therefore every verified output and its DuckDB oracle, which bands
    with its own string representation — is unchanged. What changes is
    the physical bill: codegen integer struct hash/equality in the
    band self-join instead of per-row string building, and no
    interpreted higher-order transform() pass in the signature path
    (measured ~10% end-to-end on dedup_minhash at sf0.1 AND at
    synthetic sf1, where the 7.7M-candidate join makes key compare
    cost visible). Note for persisted ``minhash_signature_table``
    state: ``_bands`` is now array<struct<b,s0..>> — stored tables
    written before this change must be regenerated (the existing
    'parameters must match between stored table and batch runs'
    contract already forbids mixing layouts)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                *[
                    F.element_at(sig, 1 + b * rows + j).alias(f"s{j}")
                    for j in range(rows)
                ],
            )
            for b in range(bands)
        ]
    )


def simhash64(tokens: Column, bits: int = 60) -> Column:
    """SimHash over whitespace tokens (convenience wrapper). Prefer
    materializing the hash array once (``F.transform(tokens, md5_int60)``
    in its own projection) and calling ``simhash64_from_hashes`` so the
    md5s aren't re-derived per bit."""
    return simhash64_from_hashes(F.transform(tokens, md5_int60), bits)


def simhash64_from_hashes(hashes: Column, bits: int = 60) -> Column:
    """SimHash over pre-computed token hashes: bit b of the fingerprint
    is 1 iff the sum over tokens of ±1 (sign of the token-hash's bit b)
    is positive.

    ONE fold over the token array carrying a ``bits``-wide vote vector
    (each token expands to its ±1 bit-vector, summed elementwise) —
    ~25% faster than the per-bit-fold formulation at equal results, and
    still a narrow, shuffle-free expression."""
    def bitvec(x: Column) -> Column:
        return F.array(*[
            F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
            for b in range(bits)
        ])

    votes = F.aggregate(
        F.transform(hashes, bitvec),
        F.array_repeat(F.lit(0), bits),
        lambda a, v: F.zip_with(a, v, lambda p, q: p + q),
    )
    weights = F.array(*[F.lit(2 ** b).cast("long") for b in range(bits)])
    return F.aggregate(
        F.zip_with(votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


def jaccard_with_sizes(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Jaccard via inclusion-exclusion: |A∩B| / (|A|+|B|-|A∩B|).

    For the verify stage the set sizes are known per document before
    pairing, so carrying them through the join and computing ONLY the
    intersection halves the per-pair array work vs intersect+union
    (each builds a hash set over both arrays)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (na.cast("double") + nb.cast("double") - inter)
