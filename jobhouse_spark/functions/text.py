"""Text-analysis column expressions (SURVEY §2.B L4/L6).

Language-ID, quality scoring, token counting, fingerprinting — all as
JVM-side expressions over the `documents` table. The reference's Silver
"cleaning/standardization" stage (docs/Pipeline Architecture.mermaid:18-23)
generalized to LLM-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

# tiny per-language marker sets for the n-gram/stopword lang-id heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with", "for", "that", "this"),
    "de": ("der", "die", "das", "und", "ist", "mit", "für", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "avec", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "con", "para", "que"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split keeps no trailing empties for our
    clean corpus; BPE-ish regex splitting lives in udf_surface X6)."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-style pre-tokenization: runs of letters, runs of digits, and
    runs of punctuation become separate tokens, each absorbing one
    leading space (the GPT-2 pre-tokenizer shape, ASCII classes so the
    regex semantics are engine-portable). JVM-side regexp_extract_all —
    no Python in the path."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


def rolling_min_fingerprint(col_name: str, k: int = 8, base: int = 31) -> Column:
    """Rolling-hash document fingerprint: polynomial hash of every
    character k-gram, fingerprint = the minimum (min-sampling, the
    winnowing idea collapsed to one value per document). Pure integer
    arithmetic in JVM higher-order functions — deterministic on any
    engine, no hash-library dependence. NULL for texts shorter than k.

    Takes the column NAME (the expression is built as SQL text for the
    lambda-scoped HOF variables)."""
    powers = ", ".join(f"{base**j}L" for j in range(k))
    gram_hash = (
        f"aggregate(sequence(0, {k - 1}), 0L, (acc, j) -> "
        f"acc + ascii(substring({col_name}, i + j, 1)) * "
        f"element_at(array({powers}), j + 1))"
    )
    expr = (
        f"array_min(transform(sequence(1, char_length({col_name}) - {k} + 1), "
        f"i -> {gram_hash}))"
    )
    return F.when(F.char_length(F.col(col_name)) >= k, F.expr(expr)).otherwise(
        F.lit(None).cast("long")
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space.
    greatest(len, 1): an empty string scores 0 instead of raising
    DIVIDE_BY_ZERO under ANSI mode — at corpus scale empty docs exist."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite heuristic quality gate score in [0, 1]: length band +
    low punctuation + sane stopword density (C4/Gopher-style rules)."""
    len_ok = (n_chars >= 100) & (n_chars <= 20000)
    punct_ok = punct_ratio(text) < 0.3
    stop_ok = stopword_ratio(text).between(0.0, 0.6)
    return (
        len_ok.cast("int") + punct_ok.cast("int") + stop_ok.cast("int")
    ) / F.lit(3.0)


def simhash16(text: Column, token_hash: str = "xxhash64") -> Column:
    """16-bit SimHash document fingerprint from whitespace tokens.

    Per token, 16 hash bits come from hashing the token; each bit votes
    ±1; the sign of each bit-position sum forms the fingerprint. Near-
    duplicate docs differ in few bits (compared via bit_count(xor)).
    Pure column expressions — no UDF.

    ``token_hash``: "xxhash64" (default — fastest JVM hash, not
    reproducible outside Spark) or "md5" (first 8 hex chars as an int —
    bit-identical in any engine with md5; the differential-oracle knob,
    see l4b2_simhash_checked — the l2c feature-hash pattern).
    """
    toks = tokens(F.lower(text))
    if token_hash == "md5":
        from jobhouse_spark.functions.hashing import md5_int32  # noqa: PLC0415

        def _th(t):
            return md5_int32(t)
    else:
        def _th(t):
            return F.xxhash64(t)

    def vote_fn(b: int):
        # two-arg lambda (F.aggregate infers arity from the signature)
        return lambda acc, t: acc + F.when(
            F.shiftright(_th(t), b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for b in range(16):
        vote = F.aggregate(toks, F.lit(0), vote_fn(b))
        bit_cols.append(F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def detect_language(text: Column) -> Column:
    """Heuristic language ID: score each language by marker-word hits
    over lowercase tokens; CJK detection by codepoint range; ties and
    no-hits resolve to 'unknown'. Pure column expressions — at 100 TB
    this is a scan-rate classifier, no model service in the hot path.
    """
    toks = tokens(F.lower(text))
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0

    def score(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [(lang, score(m)) for lang, m in LANG_MARKERS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    # first language reaching the max score wins (stable order)
    result = F.lit("unknown")
    for lang, s in reversed(scores):
        result = F.when(s == best_score, F.lit(lang)).otherwise(result)
    result = F.when(best_score == 0, F.lit("unknown")).otherwise(result)
    return F.when(has_cjk, F.lit("zh")).otherwise(result)
