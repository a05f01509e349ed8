"""The Versa mini query language on DataFrames.

Surface grammar (reference /root/reference/tools/py/query/miniparser.py:19-183):

    query      := clause (('and' | 'or') clause)*
    clause     := '?(' arg ',' arg ',' arg [',' attrs] ')'
    arg        := '$name' | '*' | "'string'" | NAME | NAME "'string'"

Semantics follow the reference's *tested* behavior (test_miniquery.py:11-28;
the full parser.py/ast.py pair is abandoned/broken — SURVEY.md §2.10):

* each ``?(o, r, t)`` clause runs a multimatch; ``$var`` captures the
  values at its position; ``*`` and unbound vars are wildcards;
* ``and`` threads the left clause's bindings into the right clause
  (miniast.py:39) — a variable bound on the left constrains the right
  match — and intersects sets per shared variable (miniast.py:46-53; the
  reference's intersection is a no-op bug — `.intersection` result
  discarded — the documented intent is implemented here);
* ``or`` unions binding sets per variable (miniast.py:21-27);
* ``and not`` subtracts the negated clause's bindings per shared variable
  (the reference's negation node, miniast.py:87-92 — its PLY grammar has
  the ``not`` token stubbed out (miniparser.py:15-17), so the surface
  syntax here follows the documented intent: ``… and not ?(o, r, t)`` ≡
  NOT IN over each variable both sides bind; standalone or ``or not``
  negation has no set to subtract from and raises);
* ``NAME 'string'`` concatenates a constant from the variables dict with
  a literal (IRI building, miniparser.py:167-172).

Spark mapping: a clause is a filter over the link DataFrame; a bound
variable is a left-semi join against the prior clause's binding DataFrame
(no collect in the middle); per-variable results stay DataFrames until the
``execute`` API edge collects them into the reference's {var: set} shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_TOKEN_PAT = re.compile(r"""
    (?P<ws>\s+)
  | (?P<qopen>\?\()
  | (?P<comma>,)
  | (?P<close>\))
  | (?P<star>\*)
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_\-]*)
  | (?P<string>'[^']*')
  | (?P<name>[A-Za-z_][A-Za-z0-9_\-]*)
""", re.VERBOSE)

_POS_COL = {0: "origin", 1: "rel", 2: "target"}


class Var:
    def __init__(self, name):
        self.name = name


class Const:
    def __init__(self, name):
        self.name = name


class StringSeq:
    def __init__(self, items):
        self.items = items


class Clause:
    def __init__(self, args):
        self.args = args


class BoolOp:
    def __init__(self, op, left, right):
        self.op = op
        self.left = left
        self.right = right


class Negation:
    """Negated clause (reference miniast.py:87-92); only meaningful as the
    right side of ``and`` (set difference per shared variable)."""

    def __init__(self, clause):
        self.clause = clause


def tokenize(q: str):
    pos = 0
    out = []
    while pos < len(q):
        m = _TOKEN_PAT.match(q, pos)
        if not m:
            raise ValueError(f"query syntax error at {q[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    return out


def parse(q: str):
    """Query text → AST."""
    toks = tokenize(q)
    ix = 0

    def peek():
        return toks[ix] if ix < len(toks) else (None, None)

    def take(kind):
        nonlocal ix
        k, v = peek()
        if k != kind:
            raise ValueError(f"expected {kind}, got {k} {v!r}")
        ix += 1
        return v

    def parse_arg():
        nonlocal ix
        k, v = peek()
        if k == "var":
            ix += 1
            return Var(v[1:])
        if k == "star":
            ix += 1
            return "*"
        if k == "string":
            ix += 1
            return v[1:-1]
        if k == "name":
            ix += 1
            k2, v2 = peek()
            if k2 == "string":
                ix += 1
                return StringSeq([Const(v), v2[1:-1]])
            return Const(v)
        raise ValueError(f"bad clause argument {v!r}")

    def parse_clause():
        take("qopen")
        args = [parse_arg()]
        while peek()[0] == "comma":
            take("comma")
            args.append(parse_arg())
        take("close")
        if len(args) < 3:
            raise ValueError("match clause needs (origin, rel, target)")
        if len(args) > 3:
            # the reference grammar forwards a 4th positional straight
            # into multimatch's attrs parameter, but the mini grammar
            # has no dict-literal syntax to express a usable value —
            # refuse loudly instead of silently dropping the constraint
            raise ValueError(
                "attr-constrained clauses (a 4th argument) are not "
                "supported; filter attributes with ops.multimatch "
                "directly")
        return Clause(args)

    def parse_and():
        # 'and' binds tighter than 'or' (reference miniparser.py:79-82
        # precedence: OR listed first = lower), so an and-chain is one
        # unit inside the or-level loop below
        node = parse_clause()
        while peek() == ("name", "and"):
            take("name")
            if peek() == ("name", "not"):
                take("name")
                node = BoolOp("and", node, Negation(parse_clause()))
            else:
                node = BoolOp("and", node, parse_clause())
        return node

    def parse_query():
        nonlocal ix
        if peek() == ("name", "not"):
            raise ValueError("negation needs a positive clause on its "
                             "left ('… and not ?(…)')")
        node = parse_and()
        while peek() == ("name", "or"):
            take("name")
            if peek() == ("name", "not"):
                raise ValueError(
                    "'or not' has no set to subtract from; negation "
                    "is only supported as 'and not'")
            node = BoolOp("or", node, parse_and())
        return node

    node = parse_query()
    if ix != len(toks):
        raise ValueError("trailing tokens in query")
    return node


def _const_value(node, variables):
    if isinstance(node, Const):
        return str(variables[node.name])
    if isinstance(node, StringSeq):
        return "".join(_const_value(i, variables) if not isinstance(i, str)
                       else i for i in node.items)
    return node


def _eval_clause(df: DataFrame, clause: Clause, variables,
                 bindings: dict[str, DataFrame]) -> dict[str, DataFrame]:
    filtered = df
    for pos, arg in enumerate(clause.args):
        col = _POS_COL[pos]
        if arg == "*":
            continue
        if isinstance(arg, Var):
            prior = bindings.get(arg.name)
            if prior is not None:
                # bound variable: constrain by the prior binding set
                filtered = filtered.join(
                    F.broadcast(prior.withColumnRenamed("value", col)
                                .dropDuplicates([col])),
                    col, "left_semi")
            continue
        filtered = filtered.filter(
            F.col(col) == _const_value(arg, variables))
    out = {}
    for pos, arg in enumerate(clause.args):
        if isinstance(arg, Var):
            # a variable repeated within one clause UNIONS its
            # positions' values (reference miniast.py:107-113 —
            # setdefault().add() per position; there is no row-wise
            # equality constraint in the reference either)
            vals = filtered.select(F.col(_POS_COL[pos]).alias("value"))
            out[arg.name] = (out[arg.name].unionByName(vals).distinct()
                             if arg.name in out else vals.distinct())
    return out


def _eval(df: DataFrame, node, variables,
          bindings: dict[str, DataFrame]) -> dict[str, DataFrame]:
    if isinstance(node, Clause):
        return _eval_clause(df, node, variables, bindings)
    if isinstance(node, BoolOp):
        left = _eval(df, node.left, variables, bindings)
        if node.op == "and" and isinstance(node.right, Negation):
            # negation: subtract the negated clause's bindings per shared
            # variable (NOT IN).  Threading left's bindings into the
            # negated match is safe — only values present on the left can
            # be subtracted — and keeps the negated match narrow.
            right = _eval(df, node.right.clause, variables,
                          {**bindings, **left})
            out = dict(left)
            for k, v in right.items():
                if k in out:
                    out[k] = out[k].subtract(v)
            return out
        if node.op == "and":
            # thread left's bindings into the right clause (miniast.py:39)
            right = _eval(df, node.right, variables, {**bindings, **left})
            out = dict(left)
            for k, v in right.items():
                out[k] = out[k].intersect(v) if k in out else v
            return out
        # 'or': per-variable union (miniast.py:21-27)
        right = _eval(df, node.right, variables, bindings)
        out = dict(left)
        for k, v in right.items():
            out[k] = out[k].union(v).distinct() if k in out else v
        return out
    raise TypeError(node)


def execute_df(model: DataFrame, q: str,
               variables: dict | None = None) -> dict[str, DataFrame]:
    """Evaluate; bindings stay DataFrames (for composition at scale)."""
    return _eval(model, parse(q), variables or {}, {})


def execute(model: DataFrame, q: str,
            variables: dict | None = None) -> dict[str, set]:
    """Reference-shaped result: {var: set of values}
    (query/__init__.py:7-30)."""
    return {k: {r["value"] for r in v.collect()}
            for k, v in execute_df(model, q, variables).items()}
