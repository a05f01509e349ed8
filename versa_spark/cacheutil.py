"""Block-storage hygiene for iterative DataFrame algorithms.

``df.unpersist()`` only covers cache-manager entries created by
``df.persist()``.  An **eager localCheckpoint** pins its RDD blocks
outside the cache manager, and they stay pinned until the JVM garbage-
collects the plan — so a k-round iterative algorithm that checkpoints
its label/frontier table every round (connected components, transitive
closure) would hold k copies of that table for the rest of the session.
``release_checkpoint`` frees a checkpoint's blocks explicitly: a
checkpointed frame's analyzed plan is exactly one LogicalRDD leaf, so
unpersisting that leaf's RDD releases precisely its own storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_checkpoint(df: DataFrame) -> None:
    """Free the block storage behind a localCheckpoint-ed DataFrame.

    Safe to call on any frame: only LogicalRDD leaves (the product of a
    checkpoint) are touched, and only the frame's OWN blocks — a
    checkpoint truncates lineage to a single LogicalRDD, so its plan
    cannot reference another frame's checkpoint.  Best-effort: on any
    reflection failure the blocks are simply left for the JVM GC /
    ContextCleaner (the pre-existing behavior)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        leaves = plan.collectLeaves()
        it = leaves.iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:
        pass
