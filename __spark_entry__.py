"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every query derives a deterministic Versa link-quad model from the
parquet tables (versa_spark.testdata), applies one operator from
SURVEY.md §2 (versa_spark.ops / pipeline), and projects aliased columns
matching the DuckDB oracle exactly.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

BASE = "http://example.org/"
TYPE_REL = "http://bibfra.me/purl/versa/type"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the transcript → knowledge-graph construction pipeline
    (north rule) on sf0.001 — stable turn ordering, pandas-UDF mention
    extraction, broadcast entity linking, graph triple materialization."""
    return _q_kg_graph_triples(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_match_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match(None, rel=hasName, None) over the nation+region quad model
    (reference driver/memory.py:85-116)."""
    from versa_spark import ops
    from versa_spark.testdata import nation_links
    links = nation_links(spark, sf_dir)
    return (ops.match(links, rel=BASE + "hasName")
            .select("origin", F.col("target").alias("name")))


def _q_multimatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimatch with target-set OR semantics (memory.py:119-150)."""
    from versa_spark import ops
    from versa_spark.testdata import nation_links
    links = nation_links(spark, sf_dir)
    return (ops.multimatch(links, rel={BASE + "hasName"},
                           target={"NATION_0", "NATION_7", "ASIA"})
            .select("origin", F.col("target").alias("name")))


def _q_all_origins_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """all_origins(only_types={segment/BUILDING}) (util.py:56-75)."""
    from versa_spark import ops
    from versa_spark.testdata import customer_links
    links = customer_links(spark, sf_dir)
    return ops.all_origins(
        links, only_types={BASE + "segment/BUILDING"}).select("origin")


def _q_follow_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """follow(inNation, inRegion, hasName): customer → region name
    (other_actions.py:295-329) as chained equi-joins."""
    from versa_spark import ops
    from versa_spark.testdata import (customer_links, nation_links,
                                      with_quad_defaults)
    links = with_quad_defaults(customer_links(spark, sf_dir).unionByName(
        nation_links(spark, sf_dir)))
    start = links.select(F.col("origin").alias("node")).distinct().filter(
        F.col("node").startswith(BASE + "customer/"))
    hops = ops.follow_hops(links, start,
                           [BASE + "inNation", BASE + "inRegion",
                            BASE + "hasName"])
    return hops.select(F.col("node").alias("customer"),
                       F.col("target").alias("region_name"))


def _q_static_index_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """static_index(m, inNation) rollup sizes by origin (util.py:107-141),
    projected to counts so the oracle is order-insensitive."""
    from versa_spark import ops
    from versa_spark.testdata import customer_links, with_quad_defaults
    links = with_quad_defaults(customer_links(spark, sf_dir))
    idx = ops.static_index(links, BASE + "inNation")
    return idx.select("origin", F.size("vals").alias("n_vals"))


def _q_resourcetypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resourcetypes(m, rid=None) — full (origin, typ) relation
    (util.py:91-96)."""
    from versa_spark import ops
    from versa_spark.testdata import customer_links
    return ops.resourcetypes(customer_links(spark, sf_dir))


# ---------------------------------------------------------------------------
# KG-construction queries (the north-rule pipeline; transcripts derive from
# the documents table so DuckDB can reproduce the derivation in SQL)
# ---------------------------------------------------------------------------

def _q_kg_turn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable turn ordering: window rank over (conv_id, turn_idx) on the
    shuffled transcript table (north-rule per-turn invariant)."""
    from versa_spark.kg.transcripts import (ordered_turns,
                                            transcripts_from_documents)
    turns = ordered_turns(transcripts_from_documents(spark, sf_dir))
    return turns.select("conv_id", "turn_idx", "turn_rank", "role")


def _q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized mention detection + broadcast entity linking
    (kg.extract + kg.linking)."""
    from versa_spark.kg import extract, linking
    from versa_spark.kg.transcripts import (ordered_turns,
                                            transcripts_from_documents)
    turns = ordered_turns(transcripts_from_documents(spark, sf_dir))
    linked = linking.link_entities(extract.turn_mentions(turns),
                                   linking.canonical_dictionary(spark))
    return linked.select("conv_id", "turn_idx", "surface", "entity_iri")


def _q_kg_entity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-key canonicalization rollup (kg.canonicalize)."""
    from versa_spark.kg import canonicalize, extract, linking
    from versa_spark.kg.transcripts import (ordered_turns,
                                            transcripts_from_documents)
    turns = ordered_turns(transcripts_from_documents(spark, sf_dir))
    linked = linking.link_entities(extract.turn_mentions(turns),
                                   linking.canonical_dictionary(spark))
    stats = canonicalize.entity_mention_counts(linked, salted=True)
    return stats.select("entity_iri", "canonical",
                        F.col("n_mentions").cast("long").alias("n_mentions"),
                        F.col("n_convs").cast("long").alias("n_convs"))


def _q_kg_graph_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full KG triple table (structural + mention + entity links)."""
    from versa_spark.kg.graph import build_graph
    from versa_spark.kg.transcripts import (ordered_turns,
                                            transcripts_from_documents)
    turns = ordered_turns(transcripts_from_documents(spark, sf_dir))
    graph = build_graph(spark, turns)["graph"]
    return graph.select("origin", "rel", "target").distinct()


def _q_kg_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacency edge list (IRI→IRI edges only, kg.canonicalize)."""
    from versa_spark.kg.graph import build_graph
    from versa_spark.kg.transcripts import (ordered_turns,
                                            transcripts_from_documents)
    turns = ordered_turns(transcripts_from_documents(spark, sf_dir))
    edges = build_graph(spark, turns)["edges"]
    return edges.select("src", "rel", "dst").distinct()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "match_rel": _q_match_rel,
        "multimatch": _q_multimatch,
        "all_origins_typed": _q_all_origins_typed,
        "follow_hops": _q_follow_hops,
        "static_index_count": _q_static_index_count,
        "resourcetypes": _q_resourcetypes,
        "kg_turn_order": _q_kg_turn_order,
        "kg_mentions": _q_kg_mentions,
        "kg_entity_stats": _q_kg_entity_stats,
        "kg_graph_triples": _q_kg_graph_triples,
        "kg_adjacency": _q_kg_adjacency,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (same derivation, straight SQL)
# ---------------------------------------------------------------------------

def _kg_ctes() -> str:
    """Shared CTEs: the transcript derivation (mirror of
    versa_spark.kg.transcripts.transcripts_from_documents) and the
    canonical lexicon (mirror of kg.extract.LEXICON)."""
    from versa_spark.kg.extract import LEXICON
    lex_values = ", ".join(f"('{s}', '{c}')" for s, c in sorted(LEXICON.items()))
    return f"""
    WITH tx AS (
        SELECT 'conv-' || (doc_id % 100) AS conv_id,
               CAST(doc_id // 100 AS INT) AS turn_idx,
               CASE CAST(doc_id % 4 AS INT)
                    WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                    WHEN 2 THEN 'system' ELSE 'tool' END AS role,
               text,
               CASE WHEN doc_id % 4 = 3 THEN
                    CASE CAST(doc_id % 3 AS INT)
                         WHEN 0 THEN 'search' WHEN 1 THEN 'calculator'
                         ELSE 'browser' END END AS tool
        FROM documents),
    lex(surface, canonical) AS (VALUES {lex_values}),
    turns AS (
        SELECT tx.*,
               'http://example.org/transcript/' || conv_id AS conv_iri,
               'http://example.org/transcript/' || conv_id || '/' || turn_idx
                   AS turn_iri,
               ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
                   AS turn_rank
        FROM tx),
    mentions AS (
        SELECT conv_id, turn_idx, turn_iri, surface, canonical,
               'http://example.org/entity/' || canonical AS entity_iri
        FROM turns JOIN lex
          ON (' ' || text || ' ') LIKE ('% ' || surface || ' %'))
    """


def oracle_sql() -> dict[str, str]:
    B = BASE
    TYPE = TYPE_REL
    LABEL = "http://bibfra.me/purl/versa/label"
    kg = _kg_ctes()
    kg_sql = {
        "kg_turn_order": kg + """
            SELECT conv_id, turn_idx, CAST(turn_rank AS INT) AS turn_rank,
                   role
            FROM turns
        """,
        "kg_mentions": kg + """
            SELECT conv_id, turn_idx, surface, entity_iri FROM mentions
        """,
        "kg_entity_stats": kg + """
            SELECT entity_iri, canonical,
                   COUNT(*) AS n_mentions,
                   COUNT(DISTINCT conv_id) AS n_convs
            FROM mentions GROUP BY entity_iri, canonical
        """,
        "kg_graph_triples": kg + f"""
            SELECT DISTINCT conv_iri AS origin, '{TYPE}' AS rel,
                   '{B}v/Conversation' AS target FROM turns
            UNION
            SELECT conv_iri, '{B}v/hasTurn', turn_iri FROM turns
            UNION
            SELECT turn_iri, '{TYPE}', '{B}v/Turn' FROM turns
            UNION
            SELECT turn_iri, '{B}v/role', role FROM turns
            UNION
            SELECT turn_iri, '{B}v/turnIndex', CAST(turn_idx AS VARCHAR)
            FROM turns
            UNION
            SELECT turn_iri, '{B}v/usedTool', '{B}tool/' || tool
            FROM turns WHERE tool IS NOT NULL
            UNION
            SELECT turn_iri, '{B}v/mentions', entity_iri FROM mentions
            UNION
            SELECT DISTINCT entity_iri, '{TYPE}', '{B}v/Concept'
            FROM mentions
            UNION
            SELECT DISTINCT entity_iri, '{LABEL}', canonical FROM mentions
        """,
        "kg_adjacency": kg + f"""
            SELECT DISTINCT conv_iri AS src, '{TYPE}' AS rel,
                   '{B}v/Conversation' AS dst FROM turns
            UNION
            SELECT conv_iri, '{B}v/hasTurn', turn_iri FROM turns
            UNION
            SELECT turn_iri, '{TYPE}', '{B}v/Turn' FROM turns
            UNION
            SELECT turn_iri, '{B}v/usedTool', '{B}tool/' || tool
            FROM turns WHERE tool IS NOT NULL
            UNION
            SELECT turn_iri, '{B}v/mentions', entity_iri FROM mentions
            UNION
            SELECT DISTINCT entity_iri, '{TYPE}', '{B}v/Concept'
            FROM mentions
        """,
    }
    return {**kg_sql, **{
        "match_rel": f"""
            SELECT '{B}nation/' || n_nationkey AS origin, n_name AS name
            FROM nation
            UNION ALL
            SELECT '{B}region/' || r_regionkey AS origin, r_name AS name
            FROM region
        """,
        "multimatch": f"""
            SELECT '{B}nation/' || n_nationkey AS origin, n_name AS name
            FROM nation WHERE n_name IN ('NATION_0', 'NATION_7', 'ASIA')
            UNION ALL
            SELECT '{B}region/' || r_regionkey AS origin, r_name AS name
            FROM region WHERE r_name IN ('NATION_0', 'NATION_7', 'ASIA')
        """,
        "all_origins_typed": f"""
            SELECT DISTINCT '{B}customer/' || c_custkey AS origin
            FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "follow_hops": f"""
            SELECT '{B}customer/' || c_custkey AS customer,
                   r_name AS region_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "static_index_count": f"""
            SELECT '{B}customer/' || c_custkey AS origin,
                   CAST(1 AS INT) AS n_vals
            FROM customer
        """,
        "resourcetypes": f"""
            SELECT DISTINCT '{B}customer/' || c_custkey AS origin,
                   '{B}segment/' || c_mktsegment AS typ
            FROM customer
        """,
    }}
