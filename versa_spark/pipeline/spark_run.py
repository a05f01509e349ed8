"""Distributed pipeline execution: rule application fanned out per subgraph.

The reference walks one global model in a single Python thread
(/root/reference/tools/py/pipeline/main.py:254-288).  At 10^12-turn scale
the input factorizes into billions of independent subgraphs (one per
conversation/document), so the Spark plan is:

    links DataFrame (+ group_key column)
      → groupBy(group_key).applyInPandas(run pipeline on LocalModel)
      → global dedup_links()

Rule evaluation inside a group is the exact reference semantics
(versa_spark.pipeline.core/actions — parity-tested); resource IDs are
deterministic fingerprint hashes, so identical entities materialized in
different groups collapse to identical quads and the global dedup
reproduces the reference's add-refuses-duplicates behavior
(memory.py:179-181) without any cross-partition coordination.

Scale properties:
 * one shuffle (the groupBy); group sizes are bounded by document size, so
   no hot keys — skew lives in *entity* space and is handled downstream in
   canonicalization (versa_spark.kg), not here;
 * Arrow-batched transfer in/out of Python (applyInPandas), no per-row
   Python in the Spark plan;
 * output is a plain link DataFrame — writable as partitioned Parquet and
   queryable by every operator in versa_spark.ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType, StructField, StructType,
)

from versa_spark.local import LocalModel, model_to_rows, rows_to_model
from versa_spark.model import LINK_COLS, dedup_links
from versa_spark.pipeline.core import DUMMY_CONTEXT, context

GROUPED_LINK_SCHEMA = StructType([
    StructField("group_key", StringType(), False),
    StructField("origin", StringType(), False),
    StructField("rel", StringType(), False),
    StructField("target", StringType(), True),
    StructField("t_iri", BooleanType(), False),
    StructField("attrs", ArrayType(StructType([
        StructField("k", StringType(), False),
        StructField("v", StringType(), True),
    ])), False),
    StructField("link_ix", LongType(), True),
])


def run_pipeline_grouped(links_df: DataFrame, pipeline_factory,
                         group_col: str = "group_key",
                         keep_group_col: bool = True) -> DataFrame:
    """Run a Versa pipeline over every subgraph of *links_df* in parallel.

    links_df         - link rows (LINK_SCHEMA) plus a *group_col* column
                       assigning each link to an independent subgraph
    pipeline_factory - zero-arg callable returning a fresh pipeline
                       ``definition`` (e.g. a ``generic_pipeline``); called
                       once per group on the executors, so rules must be
                       picklable (plain closures are — cloudpickle)
    Returns the output model as a link DataFrame (deduplicated globally).
    """
    from versa_spark.shipping import ensure_shipped
    ensure_shipped(links_df.sparkSession)

    def _run_group(pdf):
        import pandas as pd
        gkey = pdf[group_col].iloc[0]
        rows = list(zip(pdf["origin"], pdf["rel"], pdf["target"],
                        pdf["t_iri"], pdf["attrs"], pdf["link_ix"]))
        modin = rows_to_model(rows)
        ppl = pipeline_factory()
        # Deterministic provenance for any empty-fingerprint materialize
        root = getattr(ppl, "_root_ctx", DUMMY_CONTEXT)
        if isinstance(root, context):
            root.provenance[0] = str(gkey)
            root.provenance[1] = 0
        modout = ppl.run(input_model=modin)
        out = model_to_rows(modout)
        return pd.DataFrame(
            [(gkey, o, r, t, ti,
              [{"k": k, "v": v} for (k, v) in a], ix)
             for (o, r, t, ti, a, ix) in out],
            columns=["group_key", "origin", "rel", "target", "t_iri",
                     "attrs", "link_ix"])

    grouped = (links_df
               .withColumnRenamed(group_col, "group_key")
               .groupBy("group_key")
               .applyInPandas(_run_group, GROUPED_LINK_SCHEMA))
    if keep_group_col:
        # Within-group dedup already happened in the LocalModel
        return grouped.select("group_key", *LINK_COLS)
    # Union-model view: global dedup collapses identical quads produced by
    # different groups (deterministic IDs make them byte-identical)
    return dedup_links(grouped.select(*LINK_COLS))
