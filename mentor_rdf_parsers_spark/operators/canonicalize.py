"""owl:sameAs canonicalization: iterative connected components.

The reference has no linking/canonicalization stage (it is a
single-document parser library); semantics come from the north_rule:
"canonicalization collapses owl:sameAs-style aliases with an iterative
connected-components (hash-min label propagation) pass over the edge
DataFrame".

Algorithm: hash-min label propagation **with pointer doubling**.  Plain
hash-min needs O(diameter) joins — a 1M-node alias chain would need 1M
shuffles.  Each round here does

  1. neighbor-min:  comp[v] ← min(comp[v], min over neighbors u of comp[u])
  2. pointer jump:  comp[v] ← comp[comp[v]]   (label-of-label join)

which converges in O(log diameter) rounds.  Every round cuts lineage via
``localCheckpoint`` (or a persistent ``checkpoint_dir`` for the
north_rule's resumability) — without this the plan doubles per iteration
and the driver OOMs long before 100 TB.

Scale notes:
* all joins are equi-joins on a long key → sort-merge/shuffle-hash under
  AQE; the label table is (node, comp) longs only, so even 10^11 nodes
  is ~1.6 TB shuffled — partition count should scale with input (caller
  sets ``spark.sql.shuffle.partitions``).
* hub entities (a node with millions of sameAs edges) contribute each
  neighbor once (edges deduplicated first), and the star operations
  bound neighborhood growth by construction; residual skew is handled
  explicitly by salting (materialize.with_salt). AQE for the rounds is
  auto-resolved from input size (r4, iterutil.resolve_adaptive):
  re-planning a fixed-shape round every iteration is serial latency on
  work-dominated inputs (0.73→0.52 in 2→8-core scaling efficiency),
  while partition coalescing wins 3× on tiny rounds at many cores.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterutil import fixed_plan, resolve_adaptive

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def sameas_edges(triples: DataFrame) -> DataFrame:
    """Extract owl:sameAs edges from a triples DataFrame as stable long
    ids (xxhash64 of the term), keeping the id→term mapping implicit in
    the output of :func:`canonicalize_triples`."""
    e = triples.where(
        (F.col("p") == OWL_SAMEAS) & F.col("o_kind").isin("iri", "bnode")
    )
    return e.select(
        F.xxhash64("s").alias("src"), F.xxhash64("o").alias("dst")
    )


def _cut(df: DataFrame, checkpoint_dir: Optional[str]) -> DataFrame:
    return df.checkpoint(eager=True) if checkpoint_dir else df.localCheckpoint(eager=True)


def _large_star(sym: DataFrame) -> DataFrame:
    """Kiveris large-star: every neighbor v > u re-attaches to
    m(u) = min(N(u) ∪ {u})."""
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", F.col("u")).alias("m"))
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """Kiveris small-star over the ≤-neighborhood: for each u, all
    neighbors v ≤ u (and u itself) attach to m = min(N≤(u) ∪ {u})."""
    le = sym.where(F.col("v") < F.col("u"))
    m = le.groupBy("u").agg(F.min("v").alias("m"))
    attach_nbrs = (
        le.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    attach_self = m.select(F.col("u"), F.col("m").alias("v"))
    return attach_nbrs.union(attach_self).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: Optional[str] = None,
    adaptive_exec: Optional[bool] = None,
) -> DataFrame:
    """(src:long, dst:long) undirected edges → (node:long, comp:long)
    where comp = min node id of the component.

    AQE for the rounds is auto-resolved from the input size
    (``adaptive_exec``: None = auto, True/False = force): on
    work-dominated inputs runtime re-planning is repeated serial
    latency (measured 2→8-core scaling efficiency 0.73 off vs 0.52 on,
    4M edges), on tiny inputs at many cores AQE's coalescing wins 3×
    (5k edges, local[32]: 6.6–8.7 s vs 20–27 s) — see
    operators/iterutil.py for both measurements.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): converges in O(log n) rounds
    for ANY id distribution — naive hash-min label propagation is
    O(diameter), which on a 10^6-long alias chain with hashed (randomly
    ordered) ids means 10^6 shuffle rounds; this needs ~20.  Each round
    is one groupBy + one equi-join per phase, lineage cut per round
    (``checkpoint_dir`` switches to reliable checkpoints for the
    north_rule's resumability; default is session-local).

    Deterministic; returns one row per distinct node of the edge set.
    """
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    # one-shot prep under the session's settings; the count on the
    # checkpointed edge set is ~free and drives the auto AQE decision
    sym = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = _cut(sym, checkpoint_dir)
    all_nodes = _cut(sym.select(F.col("u").alias("node")).distinct(), checkpoint_dir)

    with fixed_plan(spark, resolve_adaptive(spark, adaptive_exec, sym.count())):
        star = sym
        prev_sig = None
        for _ in range(max_iter):
            # large-star needs the symmetric view; small-star the directed one
            ls = _large_star(star.union(star.select(F.col("v").alias("u"), F.col("u").alias("v"))))
            ls = _cut(ls, checkpoint_dir)
            ss = _small_star(ls.union(ls.select(F.col("v").alias("u"), F.col("u").alias("v"))))
            star = _cut(ss, checkpoint_dir)
            # convergence: edge set stable — order-insensitive signature via
            # count + decimal hash-sum (long sums overflow under ANSI mode)
            sig = star.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            sig = (sig["n"], sig["h"])
            if sig == prev_sig:
                break
            prev_sig = sig

    # star edges now point every non-min node at its component min
    comp = star.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    return (
        all_nodes.join(comp, "node", "left")
        .select("node", F.coalesce("comp", "node").alias("comp"))
    )


def canonicalize_triples(
    triples: DataFrame, components: Optional[DataFrame] = None,
    max_iter: int = 50, checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Rewrite s/o of every triple to its component-canonical
    representative (the lexicographically-min term of each owl:sameAs
    component), dropping the sameAs edges themselves and deduplicating.

    Two-phase: (1) CC over xxhash64 node ids, (2) pick min *term string*
    per component as the representative (deterministic and
    human-meaningful, unlike the hash), (3) broadcast-or-shuffle map-side
    rewrite of s and o.
    """
    edges = sameas_edges(triples)
    comps = components if components is not None else connected_components(
        edges, max_iter=max_iter, checkpoint_dir=checkpoint_dir
    )

    # node-id → representative term string
    terms = (
        triples.select(F.col("s").alias("term"))
        .union(triples.where(F.col("o_kind").isin("iri", "bnode")).select(F.col("o").alias("term")))
        .distinct()
        .withColumn("node", F.xxhash64("term"))
    )
    rep = (
        terms.join(comps, "node")
        .groupBy("comp")
        .agg(F.min("term").alias("rep"))
    )
    mapping = (
        terms.join(comps, "node")
        .join(rep, "comp")
        .where(F.col("term") != F.col("rep"))
        .select("term", "rep")
    )

    out = triples.where(F.col("p") != OWL_SAMEAS)
    m_s = mapping.select(F.col("term").alias("s"), F.col("rep").alias("s_rep"))
    m_o = mapping.select(F.col("term").alias("o"), F.col("rep").alias("o_rep"))
    out = (
        out.join(m_s, "s", "left")
        .join(m_o, "o", "left")
        .select(
            "doc_id",
            "s_kind",
            F.coalesce("s_rep", "s").alias("s"),
            "p_kind",
            "p",
            "o_kind",
            F.when(
                F.col("o_kind").isin("iri", "bnode"), F.coalesce("o_rep", "o")
            ).otherwise(F.col("o")).alias("o"),
            "o_lang",
            "o_dt",
            "g_kind",
            "g",
            "s_off",
            "p_off",
            "o_off",
        )
    )
    return out.dropDuplicates(["s", "p", "o", "o_lang", "o_dt", "g"])
