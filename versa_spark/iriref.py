"""IRI reference type: a ``str`` subclass that marks a value as an IRI.

Semantics follow the reference's ``versa.iriref.iriref`` (alias ``I``) at
/root/reference/tools/py/iriref.py:15-49 — the IRI/literal distinction is a
Python *type* distinction; ``I('x') == 'x'`` as strings, but serializers and
the model branch on ``isinstance(v, I)``.  In the Spark quad schema this
distinction is carried as the explicit ``t_iri`` boolean column.
"""

from __future__ import annotations

from versa_spark.iri import absolutize, matches_uri_ref_syntax


class iriref(str):
    """A validated IRI reference string."""

    __slots__ = ()

    def __new__(cls, value):
        s = str(value)
        if not matches_uri_ref_syntax(s):
            raise ValueError(f"Invalid IRI reference: {s!r}")
        return super().__new__(cls, s)

    def __repr__(self):
        return f"I({str(self)})"

    def __call__(self, suffix: str) -> "iriref":
        """Concatenate/resolve a suffix: ``I('http://x/')('y')`` →
        ``I('http://x/y')`` (reference: iriref.py:40-49)."""
        return iriref(str(self) + str(suffix))


I = iriref
