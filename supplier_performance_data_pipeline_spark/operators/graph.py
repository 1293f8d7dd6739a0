"""Connected components over near-duplicate pair graphs.

The missing last stage of a dedup pipeline: LSH emits PAIRS (a~b, b~c)
but retention decisions need CLUSTERS ({a,b,c} -> keep one). A cluster
is a connected component of the pair graph; each document's cluster id
is the minimum doc_id reachable from it, which doubles as the canonical
survivor (the same min-id convention as ``exact_dedup_groups``).

Algorithm: iterative min-label propagation with pointer jumping —
  half(v)  = min label over v's neighborhood (self-loops make the
             neighborhood include v, so this is ONE inner-join + agg);
  label(v) = half(half(v))   (the jump: adopt your label's label).
Propagation alone needs O(diameter) rounds; the jump shortcuts chains so
O(log diameter) rounds suffice. Near-dup clusters are shallow (a few
hops), so CC_ITERS = 4 covers diameters well past 2^4; tests assert the
fixed point. Production alternatives at extreme scale are
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC '14) — same join-per-round skeleton.

Determinism: all-integer (mins over bigint vertex ids) — bit-identical
across engines at ANY iteration count, so the DuckDB oracle unrolls the
same rounds and matches even independent of convergence.

Scale: each round is one vertex-keyed join+agg (map-side partial min)
plus one self-join of the per-vertex label table — no data-size joins
after edge construction. Iterative DataFrame algorithms MUST truncate
lineage each round: the jump references the round's table twice, so the
logical plan otherwise branches 2^iters ways back to the (expensive)
pair-generation plan and Catalyst analysis time explodes before any
task runs. We eager-``localCheckpoint`` the edge table and each round's
labels (16 bytes/vertex — executor memory+disk holds billions of
vertices); on a real cluster prefer reliable ``checkpoint`` to HDFS/S3
so rounds survive executor loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_ITERS = 4


def symmetrized_edges(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """(src, dst) with both directions AND self-loops, deduplicated.

    Self-loops fold the "keep your own label" term into the neighborhood
    min, so each propagation round is a single inner join + agg instead
    of join + left-join + coalesce."""
    a, b = F.col(a_col), F.col(b_col)
    return (
        pairs.select(a.alias("src"), b.alias("dst"))
        .union(pairs.select(b.alias("src"), a.alias("dst")))
        .union(pairs.select(a.alias("src"), a.alias("dst")))
        .union(pairs.select(b.alias("src"), b.alias("dst")))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iters: int = CC_ITERS,
) -> DataFrame:
    """(``id``, ``component``) for every vertex appearing in ``pairs``.

    Materializes each round eagerly (localCheckpoint) — see module
    docstring for why iterative plans must cut lineage per round."""
    edges = symmetrized_edges(pairs, a_col, b_col).localCheckpoint()
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    for _ in range(iters):
        half = (
            edges.join(
                labels.select(F.col("id").alias("dst"), "label"), "dst"
            )
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .select(F.col("src").alias("id"), "label")
        )
        # Pointer jump: label <- label(label). half's labels are always
        # vertex ids (inductively: mins over ids), so the inner join is
        # total. Checkpoint first — the jump references half twice.
        half = half.localCheckpoint()
        labels = (
            half.select("id", F.col("label").alias("mid"))
            .join(
                half.select(
                    F.col("id").alias("mid"), F.col("label").alias("label")
                ),
                "mid",
            )
            .select("id", "label")
        )
    return labels.select("id", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iters: int = CC_ITERS,
) -> DataFrame:
    """Cluster roll-up: (component, n_members) — component is the min
    doc_id and therefore the canonical survivor; n_members - 1 documents
    per cluster are dropped by a retention pass."""
    cc = connected_components(pairs, a_col, b_col, iters)
    return cc.groupBy("component").agg(F.count("*").alias("n_members"))
