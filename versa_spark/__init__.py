"""versa_spark — a PySpark-native engine for the Versa link-quad data model.

Re-implements the semantics of the reference engine (uogbuji/versa at
/root/reference) on Spark DataFrames: the link quad (origin, relationship,
target, attributes), match/query, the fingerprint→transform→labelize
pipeline, serializers, and a transcript→knowledge-graph construction job.

Positional constants mirror /root/reference/tools/py/__init__.py:10-13;
vocabulary constants mirror lines 47-53 there and
/root/reference/tools/py/terms.py:9-14.
"""

from versa_spark.iriref import I, iriref

ORIGIN = RESOURCE = SUBJECT = 0
RELATIONSHIP = 1
TARGET = VALUE = 2
ATTRIBUTES = 3

VERSA_BASEIRI = I("http://bibfra.me/purl/versa/")
VTYPE_REL = VERSA_BASEIRI("type")
VLABEL_REL = VERSA_BASEIRI("label")
VFPRINT_REL = VERSA_BASEIRI("fingerprint")
VERSA_NULL = VERSA_BASEIRI("null")

__version__ = "0.1.0"

__all__ = [
    "I", "iriref",
    "ORIGIN", "RESOURCE", "SUBJECT", "RELATIONSHIP", "TARGET", "VALUE",
    "ATTRIBUTES",
    "VERSA_BASEIRI", "VTYPE_REL", "VLABEL_REL", "VFPRINT_REL", "VERSA_NULL",
]
