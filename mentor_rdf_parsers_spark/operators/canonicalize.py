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
* hub entities (a node with millions of sameAs edges) are exactly the
  AQE skew-join case; ``spark.sql.adaptive.skewJoin.enabled`` is on in
  our session defaults, and edges are deduplicated first so a hub
  contributes each neighbor once.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """(src:long, dst:long) undirected edges → (node:long, comp:long)
    where comp = min node id of the component.

    Deterministic; returns one row per distinct node.  ``checkpoint_dir``
    switches from ``localCheckpoint`` (fast, session-scoped) to reliable
    checkpoints so a killed job can resume from the last materialized
    label table (north_rule resumability).
    """
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # 1. neighbor-min: for each dst, min comp over its neighbors' labels
        nbr_min = (
            sym.join(labels, sym.src == labels.node)
            .groupBy(sym.dst.alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
        )
        # 2. pointer jump: comp ← comp[comp]
        l2 = stepped.select(
            F.col("node").alias("pnode"), F.col("comp").alias("pcomp")
        )
        jumped = (
            stepped.join(l2, stepped.comp == l2.pnode, "left")
            .select(
                "node", F.coalesce("pcomp", "comp").alias("comp")
            )
        )
        if checkpoint_dir:
            jumped = jumped.checkpoint(eager=True)
        else:
            jumped = jumped.localCheckpoint(eager=True)

        changed = (
            jumped.alias("a")
            .join(labels.alias("b"), "node")
            .where(F.col("a.comp") != F.col("b.comp"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


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
