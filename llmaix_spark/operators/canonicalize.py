"""Canonicalization — connected components over match edges (second wide
stage).

The reference's canonicalization is order-preserving dedup, first surface
wins (OrderedDict.fromkeys, webapp/llm_processing/utils.py:61) — a
single-machine notion of "first". The distributed recast picks the
lexicographically *smallest* normalized surface per component: a total
order every executor agrees on with zero coordination.

Algorithm: iterative min-label propagation over undirected edges —
    label(x) ← min(label(x), min_{(x,y)∈E} label(y))
until a round changes nothing. Each round is one join + one
map-side-combinable groupBy.min; `localCheckpoint()` truncates the plan
lineage every round (SURVEY §4.2 rule 3 — an un-checkpointed iterative
self-join grows the plan exponentially and dies at scale). Hot-entity
skew: min-aggregation does partial combine on the map side, and the
label join runs under AQE skew-join; an explicit salt is unnecessary
*here* because the reduce is an algebraic min — the salted two-phase
pattern lives in `salted_count` (used for mention frequencies, where the
skewed key reaches a non-combinable sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key: str, salt_buckets: int = 32
) -> DataFrame:
    """Two-phase salted aggregation for power-law keys (north-rule
    requirement): phase 1 counts per (key, salt) — spreading one hot key
    over `salt_buckets` reducers — phase 2 sums the partials.

    Equivalent to groupBy(key).count() but immune to single-reducer
    hot-key stalls when partial aggregation is defeated (e.g. after an
    explode that interleaves millions of identical keys per partition).
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(key).agg(F.sum("_partial").alias("n"))


def _driver_cc_from_rows(spark, rows) -> DataFrame:
    """Small-graph fast path: union-find on the driver.

    The iterative DataFrame CC costs ~10 scheduler round-trips regardless
    of data size — pure serial overhead (Amdahl) when the match graph is
    tiny relative to the corpus, which is the common case (distinct
    fuzzy-linked surface pairs ≪ mentions). Below the threshold we
    collect the edge list (two strings per row), union-find in
    microseconds, and parallelize the assignment back."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    out = [(n, find(n)) for n in list(parent)]
    return spark.createDataFrame(
        out or [], "norm string, component string"
    )


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    checkpoint_every: int = 1,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """edges(norm_a, norm_b) → assignments(norm, component).

    component = min normalized surface reachable in the match graph.
    Nodes with no edges keep themselves as component (handled by the
    caller joining assignments back with a coalesce, or by unioning
    isolated nodes in — `canonical_assignments` does the latter).

    Size-adaptive: edge sets under `driver_threshold` take a driver-side
    union-find (ONE action: collect limit threshold+1, fall back if it
    overflows — the graph of *fuzzy-linked distinct surfaces* is orders
    of magnitude smaller than the corpus); larger graphs run the
    distributed min-label-propagation loop below.
    """
    if driver_threshold:
        head = (
            edges.select("norm_a", "norm_b")
            .limit(driver_threshold + 1)
            .collect()
        )
        if len(head) <= driver_threshold:
            # the hint travels with the returned plan: a ≤200k-row table
            # joined against the (huge) mention table must be map-side.
            # (isLocal() is False for createDataFrame output, so hinting
            # at the caller based on it never fired.)
            return F.broadcast(_driver_cc_from_rows(edges.sparkSession, head))
    sym = edges.select(
        F.col("norm_a").alias("src"), F.col("norm_b").alias("dst")
    ).union(
        edges.select(
            F.col("norm_b").alias("src"), F.col("norm_a").alias("dst")
        )
    )
    # SALTED join key (north-rule hot-entity handling): a hub node has
    # millions of adjacency rows under ONE src key — a plain label join
    # lands them on one reducer. Edges get salt = hash(dst) % k; the
    # (tiny, one-row-per-norm) label side is replicated k times, and the
    # join runs on (src, salt) so every hub spreads over k partitions.
    # The follow-up groupBy(dst).min is algebraic — map-side combine
    # absorbs the same hub on the aggregation side.
    k = 8
    sym = sym.withColumn(
        "salt", F.pmod(F.hash(F.col("dst")), F.lit(k)).cast("int")
    ).localCheckpoint()

    labels = (
        sym.select(F.col("src").alias("norm"))
        .distinct()
        .withColumn("component", F.col("norm"))
        .localCheckpoint()
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(k - 1))
    ).alias("salt")

    changed = 0
    for i in range(max_iterations):
        replicated = labels.select(
            F.col("norm").alias("src"), "component", salts
        )
        # candidate labels arriving over edges
        neighbor_min = (
            sym.join(replicated, ["src", "salt"])
            .groupBy(F.col("dst").alias("norm"))
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(neighbor_min, "norm", "left").select(
            "norm",
            F.col("component").alias("_prev"),
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # pointer doubling: component ← label(component). 1-hop min-label
        # propagation alone needs `diameter` rounds — a long near-dup
        # chain deeper than max_iterations would silently return split
        # components; the shortcut join halves remaining path lengths
        # every round (O(log d) total). Safe: label(y) ≤ y and is
        # reachable from y, so monotonicity and reachability both hold.
        cmap = propagated.select(
            F.col("norm").alias("component"), F.col("component").alias("_cc")
        )
        updated = propagated.join(cmap, "component", "left").select(
            "norm",
            F.coalesce("_cc", "component").alias("component"),
            (F.coalesce("_cc", "component") != F.col("_prev")).alias(
                "_changed"
            ),
        )
        if (i + 1) % checkpoint_every == 0:
            updated = updated.localCheckpoint()
        changed = updated.filter("_changed").limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    if changed != 0:
        import warnings

        warnings.warn(
            f"connected_components did not converge within {max_iterations} "
            "iterations — components may be split; raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def canonical_assignments(
    mentions: DataFrame, edges: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """mentions(surface, norm, n_refs) + match edges →
    assignments(surface, norm, entity_id, canonical_name).

    entity_id is a content hash of the canonical name — stable across
    runs, partitionings and cluster sizes (a monotonically_increasing_id
    would not be).

    Callers should persist mentions/edges first (the pipeline does):
    both are consumed by multiple downstream actions (CC + two joins +
    the stage write) and their lineage is the expensive LSH linking DAG —
    without a persist the whole linking plan re-executes ~5×.

    The CC table (fuzzy-linked norms only) is far smaller than mentions;
    the driver fast path returns it broadcast-hinted, so the assignment
    join is map-side — no shuffle of the mention table."""
    cc = connected_components(edges, max_iterations)
    assigned = mentions.join(cc, "norm", "left").withColumn(
        "component", F.coalesce(F.col("component"), F.col("norm"))
    )
    out = assigned.select(
        "surface",
        "norm",
        "n_refs",
        F.col("component").alias("canonical_name"),
        F.sha2(F.col("component"), 256).substr(1, 16).alias("entity_id"),
    )
    return out
