"""Cross-engine deterministic hashing/constants — single source of
truth for every differential oracle pair.

Each helper here has a DuckDB twin the oracles interpolate; keeping ONE
copy per formula is what guarantees the Spark expression and the SQL
replica can never drift apart independently (a review found five
inline copies of the md5-int32 expression — any future edit to one
would silently desynchronize the rest and their oracles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DuckDB twin of md5_int32 (l2c-verified): interpolate with .format(x=expr)
MD5_INT32_SQL = (
    "CAST(list_sum(list_transform(range(1, 9), j -> "
    "(strpos('0123456789abcdef', substr(md5({x}), j, 1)) - 1) * 16.0 ** (8 - j))) "
    "AS BIGINT)"
)


def md5_int32(col: Column | str) -> Column:
    """First 8 hex chars of md5 as a non-negative int64 — the hash both
    engines compute bit-identically (Spark conv(hex,16,10); DuckDB
    positional hex expansion, MD5_INT32_SQL)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def seeded_int_matrix(
    seed: int, n: int, dim: int, component_range: int
) -> list[list[int]]:
    """Deterministic n x dim integer matrix from a seeded PRNG — the
    shared generator behind lsh_projection_vectors (similarity.py) and
    ivf_fixed_centroids (ann.py), exposed so a differential oracle can
    interpolate the SAME constants into its SQL."""
    import random  # noqa: PLC0415

    rng = random.Random(seed)
    return [
        [rng.randint(-component_range, component_range) for _ in range(dim)]
        for _ in range(n)
    ]


def md5_int_matrix(
    tag: str, n: int, dim: int, component_range: int
) -> list[list[int]]:
    """Deterministic n x dim integer matrix whose components are pure
    md5 functions of (tag, row, col) — unlike seeded_int_matrix (a
    Python PRNG an oracle can only receive as interpolated constants),
    every component here is computable in ANY engine with md5, so a
    differential oracle can DERIVE the whole matrix at runtime. This is
    what lets l23b size its codebook from COUNT(*) inside the SQL
    itself. SQL twin: MD5_INT32_SQL over '{tag}:' || row || ':' || col,
    then % (2*component_range+1) - component_range (verified
    bit-identical to this function in
    tests/test_similarity.py::test_md5_int_matrix_matches_duckdb)."""
    import hashlib  # noqa: PLC0415

    span = 2 * component_range + 1
    return [
        [
            int(hashlib.md5(f"{tag}:{r}:{c}".encode()).hexdigest()[:8], 16)
            % span
            - component_range
            for c in range(dim)
        ]
        for r in range(n)
    ]


# --- hashing-trick embedder (single source of truth) -----------------------
# Token hash h (md5_int32, non-negative) contributes to exactly one of 16
# dimensions (h % 16) a signed integer weight ((h >> 4) % 2001 - 1000).
# Used by BOTH the l22 chunk embedder and the jh4 employer feature mart;
# their DuckDB oracles interpolate HASH_EMB_TERM_SQL, so the Spark
# expression and both SQL replicas can never drift independently (the
# same discipline as MD5_INT32_SQL above).

HASH_EMB_DIMS = 16

# interpolate with .format(h=<hash expr>, d=<dimension expr or literal>)
HASH_EMB_TERM_SQL = (
    "CASE WHEN {h} % 16 = {d} THEN ({h} >> 4) % 2001 - 1000 ELSE 0 END"
)


def hash_embed_term(h: Column, d) -> Column:
    """Spark twin of HASH_EMB_TERM_SQL: the signed contribution of token
    hash ``h`` to dimension ``d`` (an int literal or a Column — both
    occur: jh4 unrolls dimensions, l22 ranges over them)."""
    return F.when(
        F.pmod(h, F.lit(HASH_EMB_DIMS)) == d,
        F.pmod(F.shiftright(h, 4), F.lit(2001)) - 1000,
    ).otherwise(F.lit(0))
