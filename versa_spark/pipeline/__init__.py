"""versa_spark.pipeline — the fingerprint → transform → labelize engine.

Public surface mirrors ``versa.pipeline`` in the reference
(/root/reference/tools/py/pipeline/__init__.py): context, stage/definition/
generic_pipeline, materialize/link/COPY and the action helpers.  Rule
application over one subgraph is pure Python on a LocalModel; the Spark
fan-out lives in ``versa_spark.pipeline.spark_run``.
"""

from versa_spark.pipeline.core import (
    ATTRIBUTES, DUMMY_CONTEXT, ORIGIN, RELATIONSHIP, TARGET,
    context, create_resource, definition, generic_pipeline,
    is_pipeline_action, materialize_entity, pipeline_action, stage,
)
from versa_spark.pipeline.actions import (
    COPY, SKIP, action_template, attr, compose, contains, extra, follow,
    foreach, if_, ifexists, ignore, link, lookup, materialize, origin,
    regex_match_modify, rel, replace_from, target, toiri, values, var,
)
from versa_spark import (
    I, VERSA_BASEIRI, VTYPE_REL, VLABEL_REL, VFPRINT_REL,
)

__all__ = [
    "ATTRIBUTES", "DUMMY_CONTEXT", "ORIGIN", "RELATIONSHIP", "TARGET",
    "context", "create_resource", "definition", "generic_pipeline",
    "is_pipeline_action", "materialize_entity", "pipeline_action", "stage",
    "COPY", "SKIP", "action_template", "attr", "compose", "contains",
    "extra", "follow", "foreach", "if_", "ifexists", "ignore", "link",
    "lookup", "materialize", "origin", "regex_match_modify", "rel",
    "replace_from", "target", "toiri", "values", "var",
    "I", "VERSA_BASEIRI", "VTYPE_REL", "VLABEL_REL", "VFPRINT_REL",
]
