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
    """Flagship: 2-hop follow (customer → nation → region) over the quad
    model derived from sf0.001 — the reference's `follow` traversal
    (other_actions.py:295-329) as chained equi-joins."""
    return _q_follow_hops(spark, "/root/testdata/sf0.001")


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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "match_rel": _q_match_rel,
        "multimatch": _q_multimatch,
        "all_origins_typed": _q_all_origins_typed,
        "follow_hops": _q_follow_hops,
        "static_index_count": _q_static_index_count,
        "resourcetypes": _q_resourcetypes,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (same derivation, straight SQL)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    B = BASE
    return {
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
    }
