"""Bridges from the driver-provided parquet tables to Versa link models.

The correctness harness (driver: __spark_entry__.py) compares our Spark
operators against DuckDB SQL on the same parquet files.  Versa operators
work over link quads, so each query first derives a deterministic quad
model from a relational table — pure column expressions (no UDFs), so the
derivation is trivially expressible in both engines and Catalyst still
sees pushable filters underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

BASE = "http://example.org/"
TYPE_REL = "http://bibfra.me/purl/versa/type"

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")




def _link_sql(origin_sql: str, rel: str, target_sql: str,
              t_iri: bool = False) -> str:
    return (f"struct({origin_sql} AS origin, '{rel}' AS rel,"
            f" cast({target_sql} as string) AS target,"
            f" {'true' if t_iri else 'false'} AS t_iri)")


def nation_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation + region rows → quads:
    (nation_iri, v:type, Nation) / (nation_iri, hasName, n_name) /
    (nation_iri, inRegion, region_iri) / (region_iri, hasName, r_name).

    Single-selectExpr construction (one py4j round trip per projection
    instead of dozens of builder calls — the r07 2nd-pass profile showed
    plan construction owning a third of the small-model query laps)."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    n_iri = f"concat('{BASE}nation/', n_nationkey)"
    r_iri = f"concat('{BASE}region/', r_regionkey)"
    n_links = nation.selectExpr("explode(array(" + ",".join((
        _link_sql(n_iri, TYPE_REL, f"'{BASE}Nation'", True),
        _link_sql(n_iri, BASE + "hasName", "n_name"),
        _link_sql(n_iri, BASE + "inRegion",
                  f"concat('{BASE}region/', n_regionkey)", True),
    )) + ")) AS l").select("l.*")
    r_links = region.selectExpr("explode(array(" + ",".join((
        _link_sql(r_iri, TYPE_REL, f"'{BASE}Region'", True),
        _link_sql(r_iri, BASE + "hasName", "r_name"),
    )) + ")) AS l").select("l.*")
    return n_links.unionByName(r_links)


def customer_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer rows → quads with type from mktsegment + nation edge."""
    customer = load(spark, sf_dir, "customer")
    c_iri = f"concat('{BASE}customer/', c_custkey)"
    return customer.selectExpr("explode(array(" + ",".join((
        _link_sql(c_iri, TYPE_REL,
                  f"concat('{BASE}segment/', c_mktsegment)", True),
        _link_sql(c_iri, BASE + "hasName", "c_name"),
        _link_sql(c_iri, BASE + "inNation",
                  f"concat('{BASE}nation/', c_nationkey)", True),
    )) + ")) AS l").select("l.*")


def with_quad_defaults(df: DataFrame) -> DataFrame:
    """Add empty attrs + null link_ix so derived quads satisfy
    LINK_SCHEMA."""
    return df.selectExpr(
        "origin", "rel", "target", "t_iri",
        "cast(array() as array<struct<k:string,v:string>>) AS attrs",
        "cast(null as bigint) AS link_ix")
