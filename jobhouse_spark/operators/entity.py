"""Entity resolution — canonicalize dirty surface forms of the same
real-world entity (employer names, brand strings, author fields).

This is the reference's dedup feedback loop
(`/root/reference/docs/Pipeline Architecture.mermaid:33`) applied at
ENTITY grain rather than posting grain: the first real Silver problem
of any job-market feed is that "Yandex", "Yandex LLC" and "Yandeks"
must count as one employer before any per-employer mart is meaningful.

Pipeline (all deterministic, so a SQL oracle can replay it exactly):

1. NORMALIZE: lowercase, trim, collapse whitespace, strip a trailing
   legal suffix (llc/ltd/inc/group). Catches the bulk of variation for
   free — no pairwise work at all.
2. BLOCK: q-gram inverted index over the distinct normalized names
   (j14's discipline, queries/joins.py:365) — candidate pairs only for
   names sharing a 4-gram, stop-grams above a document-frequency cap
   dropped, |length delta| <= max_dist Levenshtein lower-bound
   prefilter. Never a cross product.
3. VERIFY: exact ``levenshtein() <= max_dist`` on the surviving pairs.
4. CLUSTER: transitive closure of the verified pair graph via
   min-label propagation (operators/graph.connected_components) —
   string labels; the canonical form is the lexicographic minimum
   normalized name of each component, an exact deterministic election.

Scale shape at 100 TB: everything downstream of step 1 runs on the
DISTINCT normalized names — entity cardinality (millions), not corpus
cardinality (billions of rows). The gram join shuffles on the gram
key, the closure converges in O(component diameter) rounds (near-dup
name clusters are almost always stars around one true name, so 2-3
rounds), and the final name->canonical map is small enough to
broadcast back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobhouse_spark.operators.graph import connected_components

LEGAL_SUFFIX_RE = r" (llc|ltd|inc|group)$"


def normalize_entity_name(col: Column) -> Column:
    """Lowercase, trim, collapse internal whitespace, strip one
    trailing legal suffix. Same regex semantics in DuckDB (RE2) and
    Spark (java.util.regex) for this pattern class."""
    n = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.regexp_replace(n, LEGAL_SUFFIX_RE, "")


def _grams(name_col: str, gram_len: int) -> F.Column:
    # sequence(1, L-gram_len+1) ascending only when L >= gram_len;
    # Spark's sequence DESCENDS when start > stop, so short names must
    # yield an empty array (the j14 guard, queries/joins.py:394).
    return F.when(
        F.length(name_col) >= gram_len,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, length({name_col}) - {gram_len - 1}), "
                f"i -> substring({name_col}, i, {gram_len}))"
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def resolve_entities(
    names: DataFrame,
    name_col: str = "name",
    gram_len: int = 4,
    max_dist: int = 2,
    df_cap: int = 100,
    max_iterations: int = 20,
) -> DataFrame:
    """Return ``(name, canonical)`` — one row per DISTINCT input name,
    already normalized; ``canonical`` is the lexicographic minimum
    normalized name of the connected component under the
    "levenshtein <= max_dist" pair rule with q-gram blocking.

    ``names`` may contain duplicates and raw (un-normalized) strings;
    callers join the result back on ``normalize_entity_name(raw)``.
    """
    nodes = (
        names.select(normalize_entity_name(F.col(name_col)).alias("name"))
        .filter(F.col("name") != "")
        .distinct()
    )
    ng = nodes.select("name", F.explode(_grams("name", gram_len)).alias("gram"))
    keep = (
        ng.groupBy("gram").agg(F.count("*").alias("n")).filter(F.col("n") <= df_cap)
    )
    a = ng.alias("a")
    b = ng.alias("b")
    cand = (
        a.join(keep.select("gram"), "gram")
        .join(b, "gram")
        .filter(F.col("a.name") < F.col("b.name"))
        .filter(
            F.abs(F.length(F.col("a.name")) - F.length(F.col("b.name"))) <= max_dist
        )
        .select(F.col("a.name").alias("src"), F.col("b.name").alias("dst"))
        .distinct()
    )
    edges = cand.filter(F.levenshtein("src", "dst") <= max_dist)
    comp = connected_components(
        nodes, edges, node_col="name", max_iterations=max_iterations
    )
    # connected_components normalizes its output columns to (node, component)
    return comp.select(
        F.col("node").alias("name"), F.col("component").alias("canonical")
    )
