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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jobhouse_spark.operators.graph import connected_components

LEGAL_SUFFIX_RE = r" (llc|ltd|inc|group)$"


def normalize_entity_name(col: Column) -> Column:
    """Lowercase, trim, collapse internal whitespace, strip one
    trailing legal suffix. Same regex semantics in DuckDB (RE2) and
    Spark (java.util.regex) for this pattern class."""
    n = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.regexp_replace(n, LEGAL_SUFFIX_RE, "")


def apply_entity_map(
    df: DataFrame,
    mapping: DataFrame,
    df_key: str = "norm_name",
    map_key: str = "name",
    max_broadcast_entities: int = 2_000_000,
    entity_count: int | None = None,
) -> DataFrame:
    """Map-back join of a ``name -> canonical`` mapping onto a corpus,
    with an adaptive join strategy: BROADCAST when the entity domain
    is small enough (the common case — millions of short strings, a
    few tens of MB), plain shuffle join past ``max_broadcast_entities``
    so the operator stays safe for arbitrary entity domains instead of
    risking a driver/executor OOM on an unconditional broadcast.

    ``entity_count``: pass the known mapping cardinality to skip the
    probe; otherwise a LIMIT-bounded count decides — it never counts
    past threshold+1 rows, so the probe cost is capped by the
    threshold, not the domain.

    Both paths produce an identical mart — pinned by
    tests/test_silver_gold.py::test_apply_entity_map_paths_identical.
    """
    if entity_count is None:
        entity_count = mapping.limit(max_broadcast_entities + 1).count()
    side = F.broadcast(mapping) if entity_count <= max_broadcast_entities else mapping
    return df.join(side, df[df_key] == mapping[map_key])


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


def _deletion_keys(name_col: str, max_dist: int) -> Column:
    """SymSpell deletion neighborhood: every string reachable from the
    name by deleting up to ``max_dist`` characters, built with nested
    JVM-side array transforms (no Python row functions). Exactness:
    ed(a, b) <= t  =>  del_t(a) INTERSECT del_t(b) != empty."""
    cur = f"array({name_col})"
    for _ in range(max_dist):
        one_del = (
            "transform(sequence(1, length(s)), "
            "j -> concat(substring(s, 1, j - 1), substring(s, j + 1)))"
        )
        cur = (
            f"array_distinct(concat({cur}, "
            f"flatten(transform({cur}, s -> {one_del}))))"
        )
    return F.expr(cur)


def resolve_entities(
    names: DataFrame,
    name_col: str = "name",
    gram_len: int = 4,
    max_dist: int = 2,
    max_iterations: int = 20,
    stats_out: dict | None = None,
) -> DataFrame:
    """Return ``(name, canonical)`` — one row per DISTINCT input name,
    already normalized; ``canonical`` is the lexicographic minimum
    normalized name of the connected component under the
    "levenshtein <= max_dist" pair rule. The pair generation is EXACT
    (no blocking false negatives), by two strata:

    - LONG names (>= gram_len * (max_dist+1) chars, where the q-gram
      count-filtering bound holds): ED-Join-style PREFIX FILTERING.
      Grams are globally ordered by (document frequency asc, gram asc)
      and each name indexes only its ``gram_len * max_dist + 1``
      rarest grams; any pair within edit distance ``max_dist`` shares
      >= (gram count - gram_len*max_dist) grams, so their prefixes
      must intersect (the AllPairs prefix theorem). This is what a
      plain df-cap CANNOT do at scale: common word endings put every
      shared gram of some true pairs over the cap and silently split
      entities (measured: 56 of 10k entities at 30k names, round 11) —
      prefix filtering keeps exactly the discriminative grams instead,
      and heavy grams stay out of prefixes by construction, which is
      also what bounds the per-gram bucket join.
    - SHORT names (below the bound, where edit operations can destroy
      EVERY shared gram — 'abcd' vs 'axcd' share no 4-gram at ed 1):
      SymSpell deletion-neighborhood keys (delete <= max_dist chars;
      two names within ed t always share a deletion variant). The
      ~C(L,2) key expansion is confined to the short stratum, which is
      alphabet-bounded and tiny in real entity data.

    Both strata verify with exact ``levenshtein() <= max_dist`` before
    the min-label transitive closure. ``names`` may contain duplicates
    and raw (un-normalized) strings; callers join the result back on
    ``normalize_entity_name(raw)``.

    Scale: every stage runs on DISTINCT normalized names; the prefix
    join shuffles on the gram key with bucket sizes bounded by prefix
    membership; exactness at cardinality is asserted by
    tools/entity_scale_bench.py (E entities -> exactly E clusters).

    ``stats_out``: pass a dict to receive per-stage volume counters
    (nodes, strata sizes, candidate pairs per stratum, verified edges,
    prefix-bucket size max/p99). Counting forces extra jobs — bench
    instrumentation only, leave None in production pipelines.
    """
    short_bound = gram_len * (max_dist + 1)  # gram guarantee needs len >= this
    prefix_len = gram_len * max_dist + 1

    nodes = (
        names.select(normalize_entity_name(F.col(name_col)).alias("name"))
        .filter(F.col("name") != "")
        .distinct()
    )

    long_names = nodes.filter(F.length("name") >= short_bound)
    ng = long_names.select(
        "name", F.explode(_grams("name", gram_len)).alias("gram")
    )
    gram_df = ng.groupBy("gram").agg(F.count("*").alias("df"))
    w = Window.partitionBy("name").orderBy(F.asc("df"), F.asc("gram"))
    prefix = (
        ng.join(gram_df, "gram")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("name", "gram")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand_long = (
        a.join(b, "gram")
        .filter(F.col("a.name") < F.col("b.name"))
        .filter(
            F.abs(F.length(F.col("a.name")) - F.length(F.col("b.name"))) <= max_dist
        )
        .select(F.col("a.name").alias("src"), F.col("b.name").alias("dst"))
        .distinct()
    )

    # the short stratum extends max_dist past the bound so a pair that
    # STRADDLES the boundary (|len delta| <= max_dist) is generated by
    # the deletion keys; straddle-band pairs may also appear from the
    # prefix join — connected_components dedupes edges
    short_names = nodes.filter(F.length("name") < short_bound + max_dist)
    sk = short_names.select(
        "name", F.explode(_deletion_keys("name", max_dist)).alias("k")
    )
    sa = sk.alias("a")
    sb = sk.alias("b")
    cand_short = (
        sa.join(sb, "k")
        .filter(F.col("a.name") < F.col("b.name"))
        .select(F.col("a.name").alias("src"), F.col("b.name").alias("dst"))
        .distinct()
    )

    if stats_out is not None:
        nodes = nodes.persist()
        cand_long = cand_long.persist()
        cand_short = cand_short.persist()
        bucket = (
            prefix.groupBy("gram").agg(F.count("*").alias("n"))
            .agg(
                F.max("n").alias("mx"),
                F.expr("percentile_approx(n, 0.99)").alias("p99"),
            )
            .first()
        )
        stats_out.update(
            nodes=nodes.count(),
            long_names=long_names.count(),
            short_names=short_names.count(),
            cand_long=cand_long.count(),
            cand_short=cand_short.count(),
            prefix_bucket_max=int(bucket.mx) if bucket.mx is not None else 0,
            prefix_bucket_p99=int(bucket.p99) if bucket.p99 is not None else 0,
        )

    edges = cand_long.unionAll(cand_short).filter(
        F.levenshtein("src", "dst") <= max_dist
    )
    if stats_out is not None:
        edges = edges.persist()
        stats_out["edges"] = edges.count()
    try:
        comp = connected_components(
            nodes, edges, node_col="name", max_iterations=max_iterations
        )
    finally:
        # stats-mode caches released here: connected_components'
        # output is localCheckpoint-truncated (graph.py:77), so the
        # returned mapping no longer references these lineages —
        # without the release, every stats-instrumented run leaked
        # four cached relations for the life of the session
        # (round-12 verdict persist-sweep).
        if stats_out is not None:
            for cached in (nodes, cand_long, cand_short, edges):
                cached.unpersist()
    # connected_components normalizes its output columns to (node, component)
    return comp.select(
        F.col("node").alias("name"), F.col("component").alias("canonical")
    )


# ---------------------------------------------------------------------------
# Persisted-mapping lifecycle (round-12 verdict hygiene item)
# ---------------------------------------------------------------------------

# name->canonical mappings handed out by persist_entity_mapping. The
# mart queries (jh8/jh9, queries/jobhouse_gold.py) must cache the
# mapping — the adaptive-broadcast size probe and the map-back join
# both consume it, and without a cache the whole iterative resolution
# runs twice — but a registry query has no lifecycle hook to unpersist
# at, so a bare .persist() accumulated one cached relation per mart
# build in long-lived sessions. Same discipline as
# operators/similarity._PERSISTED_INPUTS (round-11 review).
_PERSISTED_MAPPINGS: list[DataFrame] = []


def persist_entity_mapping(mapping: DataFrame) -> DataFrame:
    """Persist a resolution mapping and track the handle. Callers that
    build marts repeatedly in one session call
    ``release_persisted_entity_maps()`` between builds (the jh8/jh9
    queries do it themselves on entry, so repeated mart builds hold at
    most ONE live mapping cache regardless of build count)."""
    out = mapping.persist()
    _PERSISTED_MAPPINGS.append(out)
    return out


def release_persisted_entity_maps() -> int:
    """Unpersist every tracked mapping. Safe to call anytime —
    ``unpersist()`` on a persisted (not checkpointed) frame is a hint:
    a consumer that still needs the mapping recomputes it from lineage
    and stays correct. Returns the count released."""
    n = 0
    while _PERSISTED_MAPPINGS:
        _PERSISTED_MAPPINGS.pop().unpersist()
        n += 1
    return n


# ---------------------------------------------------------------------------
# Incremental resolution against a stored mapping (round 13)
# ---------------------------------------------------------------------------


def _incremental_candidate_edges(
    new_nodes: DataFrame,
    union_nodes: DataFrame,
    gram_len: int,
    max_dist: int,
) -> DataFrame:
    """Verified batch-adjacent edges for incremental resolution:
    one-sided prefix filter (long stratum) + deletion keys (short
    stratum), levenshtein-verified. Extracted as a module-level helper
    so tools/explain_audit.py can assert the STRUCTURAL batch-sizedness
    property on the exact plan the resolver executes (the closure's
    eager localCheckpoint truncates this lineage out of the final
    mapping's plan): exactly one prefix-rank Window (only the NEW side
    is prefix-filtered — a second window or a windowed self-join would
    mean domain-wide prefix work), no CartesianProduct/BNLJ, no Python
    eval. Called only by resolve_entities_incremental."""
    short_bound = gram_len * (max_dist + 1)
    prefix_len = gram_len * max_dist + 1

    # ---- long stratum: one-sided prefix filter ----
    union_long_grams = (
        union_nodes.filter(F.length("name") >= short_bound)
        .select("name", F.explode(_grams("name", gram_len)).alias("gram"))
    )
    gram_df = union_long_grams.groupBy("gram").agg(F.count("*").alias("df"))
    w = Window.partitionBy("name").orderBy(F.asc("df"), F.asc("gram"))
    new_prefix = (
        new_nodes.filter(F.length("name") >= short_bound)
        .select("name", F.explode(_grams("name", gram_len)).alias("gram"))
        .join(gram_df, "gram")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select("name", "gram")
    )
    a = new_prefix.alias("a")
    b = union_long_grams.alias("b")
    cand_long = (
        a.join(b, "gram")
        .filter(F.col("a.name") != F.col("b.name"))
        .filter(
            F.abs(F.length(F.col("a.name")) - F.length(F.col("b.name"))) <= max_dist
        )
        .select(
            F.least(F.col("a.name"), F.col("b.name")).alias("src"),
            F.greatest(F.col("a.name"), F.col("b.name")).alias("dst"),
        )
        .distinct()
    )

    # ---- short stratum: deletion keys, batch side vs union side ----
    shortish = F.length("name") < short_bound + max_dist
    new_sk = new_nodes.filter(shortish).select(
        "name", F.explode(_deletion_keys("name", max_dist)).alias("k")
    )
    union_sk = union_nodes.filter(shortish).select(
        "name", F.explode(_deletion_keys("name", max_dist)).alias("k")
    )
    sa = new_sk.alias("a")
    sb = union_sk.alias("b")
    cand_short = (
        sa.join(sb, "k")
        .filter(F.col("a.name") != F.col("b.name"))
        .select(
            F.least(F.col("a.name"), F.col("b.name")).alias("src"),
            F.greatest(F.col("a.name"), F.col("b.name")).alias("dst"),
        )
        .distinct()
    )

    return cand_long.unionAll(cand_short).filter(
        F.levenshtein("src", "dst") <= max_dist
    )


def resolve_entities_incremental(
    batch_names: DataFrame,
    stored_mapping: DataFrame,
    name_col: str = "name",
    gram_len: int = 4,
    max_dist: int = 2,
    max_iterations: int = 20,
    stats_out: dict | None = None,
) -> DataFrame:
    """Resolve a batch of new dirty names AGAINST a stored canonical
    mapping (the production daily-ingest shape) and return the UPDATED
    full mapping. EXACT equivalence contract:

        resolve_entities_incremental(batch, resolve_entities(old))
            == resolve_entities(old UNION batch)

    including the hard case where one new name BRIDGES two existing
    clusters: both clusters (and all their stored members) collapse to
    one canonical, re-elected as the lexicographic minimum over the
    merged membership. Pinned by tests/test_silver_gold.py (planted
    bridge) and tests/test_property.py (randomized split-vs-full).

    Why this is exact without re-resolving the domain:

    - ONE-SIDED prefix filtering. The AllPairs prefix theorem is
      usually applied with both sides' prefixes drawn from one global
      gram ordering — which an incremental run cannot have, since the
      stored side's ordering predates the batch. But the theorem holds
      one-sided: if ed(a,b) <= t then a and b mismatch on <= q*t
      grams, so the q*t+1 grams of ANY prefix of a cannot all be
      missing from b's FULL gram set. Joining prefix(new) against the
      full gram postings of (old UNION new) therefore generates every
      true pair involving a new name, for ANY prefix ordering — the
      ordering is only a bucket-size knob (df-ascending over the union
      keeps heavy grams out of prefixes, same as the batch resolver).
    - OLD-OLD pairs need not be considered: the stored mapping is
      exact, so two old names in different clusters are > max_dist
      apart — no new old-old edge can exist, and old-old edges inside
      a cluster are already closed. The union closure thus equals the
      closure of (stored cluster relation UNION new edges).
    - CLUSTER CONTRACTION: each old endpoint of a new edge is replaced
      by its stored canonical, and connected components run over the
      TOUCHED subgraph only (new names + touched canonicals). The
      component minimum over {new names, old canonicals} equals the
      minimum over the full merged membership, because each stored
      canonical IS the minimum of its cluster — so canonical election
      matches the full re-resolve exactly.

    Marginal cost: one map pass over the stored names (gram postings /
    deletion keys — no pairwise work), a gram-df aggregation, and a
    join whose left side is batch-sized; verify + closure touch only
    batch-adjacent pairs. The full rebuild's domain-wide candidate
    join, verify, and iterative closure are all avoided
    (tools/entity_scale_bench.py --incremental measures the ratio).

    ``stored_mapping``: (name, canonical) as produced by
    ``resolve_entities`` — names already normalized. ``batch_names``
    may be raw (they are normalized here) and may repeat stored names
    (dropped — already resolved).

    Chained (day-after-day) application: truncate the returned
    mapping's lineage between applications (write it to a table, or
    ``localCheckpoint``) — this function references ``stored_mapping``
    four times, so feeding day k's un-truncated output in as day k+1's
    stored map grows the analyzed logical plan ~4x per day and
    plan-analysis time comes to dominate (measured: per-step walls
    rose 56.6->98.7 s over 5 chained days at 1M entities while batch
    sizes SHRANK; flat once checkpointed — ENTITY_INC.json). In
    production the stored map lives in a parquet table between days,
    which truncates lineage for free.
    """
    old_nodes = stored_mapping.select(F.col("name"))
    new_nodes = (
        batch_names.select(normalize_entity_name(F.col(name_col)).alias("name"))
        .filter(F.col("name") != "")
        .distinct()
        .join(old_nodes, "name", "left_anti")
    )
    union_nodes = old_nodes.unionByName(new_nodes)
    edges_new = _incremental_candidate_edges(
        new_nodes, union_nodes, gram_len, max_dist
    )

    # ---- contract old endpoints to their stored canonical ----
    msrc = stored_mapping.select(
        F.col("name").alias("src"), F.col("canonical").alias("src_canon")
    )
    mdst = stored_mapping.select(
        F.col("name").alias("dst"), F.col("canonical").alias("dst_canon")
    )
    edges_c = (
        edges_new.join(msrc, "src", "left")
        .join(mdst, "dst", "left")
        .select(
            F.coalesce("src_canon", "src").alias("src"),
            F.coalesce("dst_canon", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    if stats_out is not None:
        edges_c = edges_c.persist()
        new_nodes = new_nodes.persist()
        stats_out.update(
            new_nodes=new_nodes.count(), contracted_edges=edges_c.count()
        )

    touched = (
        edges_c.select(F.col("src").alias("node"))
        .unionAll(edges_c.select(F.col("dst").alias("node")))
        .distinct()
    )
    nodes_c = new_nodes.select(F.col("name").alias("node")).unionByName(
        touched
    ).distinct()

    try:
        comp = connected_components(
            nodes_c,
            edges_c.select("src", "dst"),
            node_col="node",
            max_iterations=max_iterations,
        )
    finally:
        if stats_out is not None:
            edges_c.unpersist()
            new_nodes.unpersist()

    # new names -> their component label
    new_rows = comp.join(
        new_nodes.select(F.col("name")), comp["node"] == F.col("name")
    ).select(F.col("name"), F.col("component").alias("canonical"))
    # touched old clusters whose label changed -> relabel every member
    relabel = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("old_canonical"),
        F.col("component").alias("new_canonical"),
    )
    updated_old = (
        stored_mapping.join(
            relabel, stored_mapping["canonical"] == relabel["old_canonical"], "left"
        )
        .select(
            F.col("name"),
            F.coalesce("new_canonical", "canonical").alias("canonical"),
        )
    )
    return updated_old.unionByName(new_rows)
