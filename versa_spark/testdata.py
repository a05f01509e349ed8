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


def _link(origin_col, rel: str, target_col, t_iri: bool = False):
    return F.struct(
        origin_col.alias("origin"), F.lit(rel).alias("rel"),
        target_col.cast("string").alias("target"),
        F.lit(t_iri).alias("t_iri"))


def nation_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation + region rows → quads:
    (nation_iri, v:type, Nation) / (nation_iri, hasName, n_name) /
    (nation_iri, inRegion, region_iri) / (region_iri, hasName, r_name)."""
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    n_iri = F.concat(F.lit(BASE + "nation/"), F.col("n_nationkey"))
    r_iri = F.concat(F.lit(BASE + "region/"), F.col("r_regionkey"))
    n_links = nation.select(F.explode(F.array(
        _link(n_iri, TYPE_REL, F.lit(BASE + "Nation"), True),
        _link(n_iri, BASE + "hasName", F.col("n_name")),
        _link(n_iri, BASE + "inRegion",
              F.concat(F.lit(BASE + "region/"), F.col("n_regionkey")), True),
    )).alias("l")).select("l.*")
    r_links = region.select(F.explode(F.array(
        _link(r_iri, TYPE_REL, F.lit(BASE + "Region"), True),
        _link(r_iri, BASE + "hasName", F.col("r_name")),
    )).alias("l")).select("l.*")
    return n_links.unionByName(r_links)


def customer_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer rows → quads with type from mktsegment + nation edge."""
    customer = load(spark, sf_dir, "customer")
    c_iri = F.concat(F.lit(BASE + "customer/"), F.col("c_custkey"))
    return customer.select(F.explode(F.array(
        _link(c_iri, TYPE_REL,
              F.concat(F.lit(BASE + "segment/"), F.col("c_mktsegment")),
              True),
        _link(c_iri, BASE + "hasName", F.col("c_name")),
        _link(c_iri, BASE + "inNation",
              F.concat(F.lit(BASE + "nation/"), F.col("c_nationkey")), True),
    )).alias("l")).select("l.*")


def with_quad_defaults(df: DataFrame) -> DataFrame:
    """Add empty attrs + null link_ix so derived quads satisfy
    LINK_SCHEMA."""
    return df.select(
        "origin", "rel", "target", "t_iri",
        F.array().cast(
            "array<struct<k:string,v:string>>").alias("attrs"),
        F.lit(None).cast("long").alias("link_ix"))
