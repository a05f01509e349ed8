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
    """ordered turns → {turns, linked, graph, edges} DataFrames."""
    if persist:
        turns = turns.persist()
    linked = linking.link_entities(extract.turn_mentions(turns),
                                   linking.canonical_dictionary(spark))
    if persist:
        linked = linked.persist()
    graph = (extract.conversation_links(turns)
             .unionByName(canonicalize.mention_links(linked))
             .unionByName(canonicalize.entity_links(linked)))
    return {"turns": turns, "linked": linked, "graph": graph,
            "edges": canonicalize.adjacency_edges(graph)}
