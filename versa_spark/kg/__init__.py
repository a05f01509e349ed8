"""versa_spark.kg — transcript → knowledge-graph construction at scale.

The flagship job mandated by BASELINE.json's north rule: read transcript
tables (conv_id, turn_idx, role, text, tool, ts), reconstruct stable turn
ordering, detect mentions / extract triples with vectorized pandas UDFs,
link entities against a broadcast canonical dictionary, canonicalize over
salted keys, and materialize partitioned graph tables + adjacency edge
lists, checkpointed per stage with lineage + counters.
"""
