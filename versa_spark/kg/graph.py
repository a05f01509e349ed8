"""Shared graph assembly: turns → linked mentions → triple table.

The union of link families consumes ``turns`` twice and ``linked`` twice;
without materialization Spark re-executes the whole extraction lineage
(window rank + pandas UDF) once per branch.  ``build_graph`` persists the
two shared frames (MEMORY_AND_DISK) for the duration of the action — the
in-session equivalent of the KGJob's per-stage Parquet checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from versa_spark.kg import canonicalize, extract, linking


def build_graph(spark: SparkSession, turns: DataFrame,
                persist: bool = True) -> dict[str, DataFrame]:
    """ordered turns → {turns, linked, graph, edges} DataFrames.

    The fat ``text`` column is consumed exactly once (by the mention UDF)
    and NEVER persisted — only the slim turn projection and the narrow
    linked-mention rows are cached.  At 10^12 turns the text column IS the
    table; caching it would evict everything else."""
    linked = linking.link_entities(extract.turn_mentions(turns),
                                   linking.canonical_dictionary(spark))
    # The graph link families consume only these four columns; turn_iri is
    # a pure function of (conv_id, turn_idx) reconstructed map-side, and
    # surface/linked/score exist for callers that ask for them (kg.job
    # checkpoints the full frame) — keeping the cached rows narrow is what
    # lets the persist fit at bench scale without evicting anything.
    linked = linked.select("conv_id", "turn_idx", "canonical", "entity_iri")
    # None of the graph link families consume turn_rank, so dropping it
    # here lets Catalyst prune the window sort out of the triple-build
    # plan entirely (the ranked view stays available via ordered_turns
    # where rank IS consumed — per-turn invariant checks, sequence ops).
    turns_slim = turns.drop("text", "turn_rank")
    if persist:
        linked = linked.persist()
        turns_slim = turns_slim.persist()
    graph = (extract.conversation_links(turns_slim)
             .unionByName(canonicalize.mention_links(linked))
             .unionByName(canonicalize.entity_links(linked)))
    return {"turns": turns_slim, "linked": linked, "graph": graph,
            "edges": canonicalize.adjacency_edges(graph)}
