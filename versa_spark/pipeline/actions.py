"""The pipeline action algebra.

Each function is an action *generator*: it returns a closure over a rule
context (``versa_spark.pipeline.core.context``).  Semantics mirror the
reference actions — ``link``/``materialize``/``COPY``
(/root/reference/tools/py/pipeline/link_materialize_actions.py:20-380) and
the helpers (/root/reference/tools/py/pipeline/other_actions.py:25-510) —
with two deliberate divergences (SURVEY.md §7 risks):

* ``if_`` accepts only callables/actions for the test — the reference's
  string-``eval`` path (other_actions.py:238) is a code-injection hazard
  and can't be distributed safely;
* empty fingerprints draw deterministic provenance IDs, never the
  reference's process-local random counter (main.py:129-131).
"""

from __future__ import annotations

import re

from versa_spark import VTYPE_REL, VFPRINT_REL
from versa_spark.iri import absolutize, is_absolute, percent_encode
from versa_spark.iriref import I
from versa_spark.pipeline.core import (
    ATTRIBUTES, ORIGIN, RELATIONSHIP, TARGET,
    context, is_pipeline_action, materialize_entity, pipeline_action,
)

__all__ = [
    "link", "materialize", "COPY", "var", "extra", "attr", "origin", "rel",
    "target", "values", "ifexists", "if_", "foreach", "follow", "toiri",
    "lookup", "regex_match_modify", "compose", "ignore", "replace_from",
    "action_template", "contains", "SKIP",
]

SKIP = object()
_DEFAULT = object()


def _ev(x, ctx):
    """Evaluate x against ctx when it is an action, else pass through."""
    return x(ctx) if is_pipeline_action(x) else x


def _listify(x):
    return x if isinstance(x, list) else [x]


def _absolutize_or_self(ref, base):
    try:
        return I(absolutize(ref, base)) if base else I(ref)
    except Exception:
        return ref


def _fold_attrs(pairs) -> dict:
    """Attribute pair sequence → dict, repeated keys folded into lists
    (reference link_materialize_actions.py:94-100)."""
    d = {}
    for k, v in pairs:
        if k in d:
            d[k] = (d[k] if isinstance(d[k], list) else [d[k]]) + [v]
        else:
            d[k] = v
    return d


# ---------------------------------------------------------------------------
# link (reference link_materialize_actions.py:20-77)
# ---------------------------------------------------------------------------

def link(origin=None, rel=None, target=None, value=None, attributes=None,
         source=None):
    """Emit the cartesian product origin×rel×target into the output model,
    components defaulting from the context's current link."""
    o_spec = _DEFAULT if origin is None else origin
    r_spec = _DEFAULT if rel is None else rel
    t_spec = (value or _DEFAULT) if target is None else target
    attributes = attributes or {}

    @pipeline_action
    def _link(ctx: context):
        if source:
            if not is_pipeline_action(source):
                raise ValueError("link source must be a pattern action")
            for subctx in source(ctx):
                cl = subctx.current_link
                subctx.output_model.add(cl[ORIGIN], cl[RELATIONSHIP],
                                        cl[TARGET], attributes)
            return
        (co, cr, ct, _ca) = ctx.current_link
        _o = _ev(o_spec, ctx)
        _r = _ev(r_spec, ctx)
        _t = _ev(t_spec, ctx)
        _a = _ev(attributes, ctx)
        o_list = [co] if _o is _DEFAULT else _listify(_o)
        r_list = [cr] if _r is _DEFAULT else _listify(_r)
        t_list = [ct] if _t is _DEFAULT else _listify(_t)
        for o in o_list:
            for r in r_list:
                for t in t_list:
                    if None in (o, r, t):
                        continue
                    ctx.output_model.add(o, r, t, _a)
    return _link


# ---------------------------------------------------------------------------
# materialize (reference link_materialize_actions.py:106-358)
# ---------------------------------------------------------------------------

class COPY:
    """Signal to materialize: clone the context origin resource from input
    to output (same ID; selected rels or all)
    (reference link_materialize_actions.py:361-380)."""

    def __init__(self, rels=None):
        self.rels = rels
        self.id = None
        self.links = []


def materialize(typ, rel=None, origin=None, unique=None, fprint=None,
                links=None, split=None, attributes=None, attach=True,
                preserve_fprint=False, vars=None, debug=None):
    """Create an output resource: fingerprint → canonical ID → type link →
    attachment link(s) → static links, with vein contexts and the ``@stem``
    variable for embedded actions."""
    links = links or []
    if unique and not fprint:
        fprint = unique

    @pipeline_action
    def _materialize(ctx: context):
        # vars= mappings become context variables for derived contexts
        if vars:
            ctx = ctx.copy(variables=dict(ctx.variables))
            for k, v in vars.items():
                if k is None or v is None:
                    continue
                v_ = _ev(v, ctx)
                if v_:
                    ctx.variables[k] = v_

        (o, r, t, a) = ctx.current_link
        if typ is None:
            raise ValueError("materialize typ cannot be None")
        object_copy = None
        if isinstance(typ, COPY):
            object_copy = typ
            object_copy.id = o
            object_copy.links = [
                (stmt[RELATIONSHIP], stmt[TARGET])
                for stmt in ctx.input_model.match(o)
                if object_copy.rels is None or stmt[RELATIONSHIP] in object_copy.rels]
            _typ = next(iter(
                tt for (_o2, _r2, tt, _a2)
                in ctx.input_model.match(o, VTYPE_REL)), None)
        else:
            _typ = _ev(typ, ctx)
        _fprint = _ev(fprint, ctx) if is_pipeline_action(fprint) else fprint

        targets = ([sub.strip() for sub in t.split(split) if sub.strip()]
                   if split else [t])
        # rel=None on both the arg and the prototype link signals
        # fingerprint-stage: create, don't attach
        attach_ = False if (rel is None and r is None) else attach
        rels = rel if isinstance(rel, list) else ([rel] if rel else [r])

        objids = []
        for tgt in targets:
            ctx_stem = ctx.copy(current_link=(o, r, tgt, a))
            stem_o = o
            if origin:
                stem_o = _ev(origin, ctx_stem)
            if not stem_o:
                continue

            first_type = _typ[0] if isinstance(_typ, list) else _typ
            rtypes = set(_typ if isinstance(_typ, list) else [_typ])
            computed_fprint = set()
            for k, v in (_fprint or []):
                if k is None or v is None:
                    continue
                for sub in _listify(v):
                    subval = _ev(sub, ctx_stem)
                    if subval:
                        subvals = _listify(subval)
                        if k == VTYPE_REL:
                            rtypes.update(subvals)
                        computed_fprint.update((k, s) for s in subvals)
            for extra_t in rtypes:
                if extra_t != first_type:
                    computed_fprint.add((VTYPE_REL, extra_t))

            if object_copy:
                objid = object_copy.id
            else:
                objid = materialize_entity(ctx_stem, first_type,
                                           fprint=sorted(computed_fprint))
            objids.append(objid)

            for rel_spec in rels:
                for curr_rel in _listify(_ev(rel_spec, ctx_stem)):
                    if not curr_rel:
                        continue
                    if curr_rel.isdigit():
                        curr_rel = "_" + curr_rel
                    if attach_:
                        ctx_stem.output_model.add(
                            I(stem_o),
                            _absolutize_or_self(curr_rel, ctx_stem.base),
                            I(objid))

            if objid in ctx_stem.existing_ids:
                continue
            # First visit to this output resource: type link, optional
            # fingerprint preservation, then static links
            if first_type:
                ctx_stem.output_model.add(
                    I(objid), VTYPE_REL,
                    _absolutize_or_self(first_type, ctx_stem.base))
            if preserve_fprint:
                non_type = [(k, v) for (k, v) in computed_fprint
                            if k != VTYPE_REL]
                attrs = _fold_attrs(
                    sorted(non_type) + [(VTYPE_REL, rt) for rt in sorted(rtypes)])
                ctx_stem.output_model.add(I(objid), VFPRINT_REL, first_type,
                                          attrs)
            all_links = (object_copy.links + links) if object_copy else links
            for item in all_links:
                if len(item) == 2:
                    lo, (lr, lt) = I(objid), item
                else:
                    lo, lr, lt = item
                vein_vars = dict(ctx_stem.variables)
                vein_vars["@stem"] = ctx_stem.current_link[ORIGIN]
                ctx_vein = ctx_stem.copy(
                    current_link=(objid, ctx_stem.current_link[RELATIONSHIP],
                                  ctx_stem.current_link[TARGET],
                                  ctx_stem.current_link[ATTRIBUTES]),
                    variables=vein_vars)
                lo = lo or ctx_vein.current_link[ORIGIN]
                lr = lr or ctx_vein.current_link[RELATIONSHIP]
                lt = lt or ctx_vein.current_link[TARGET]
                lo = _listify(_ev(lo, ctx_vein))
                lr = _ev(lr, ctx_vein)
                ctx_vein = ctx_stem.copy(
                    current_link=(ctx_vein.current_link[ORIGIN], lr,
                                  ctx_vein.current_link[TARGET],
                                  ctx_stem.current_link[ATTRIBUTES]),
                    variables=vein_vars)
                # An action-valued rel may return contexts: run the target
                # action per context (dynamic link generation)
                if isinstance(lr, list):
                    if lr and isinstance(lr[0], context):
                        for newctx in lr:
                            lt(newctx)
                    continue
                if not lr:
                    continue
                lt = _ev(lt, ctx_vein)
                if lt is None:
                    continue
                if lr.isdigit():
                    lr = "_" + lr
                lr_abs = _absolutize_or_self(lr, ctx_vein.base)
                for t_item in (lt if isinstance(lt, list) else [lt]):
                    if t_item is None:
                        continue
                    for lo_item in lo:
                        ctx_vein.output_model.add(lo_item, lr_abs, t_item)
            ctx_stem.existing_ids.add(objid)
            hooks = ctx.extras.get("@new-entity-hook") or []
            for hook in (hooks if isinstance(hooks, list) else [hooks]):
                hook(objid)
        return objids
    return _materialize


# ---------------------------------------------------------------------------
# context readers (reference other_actions.py:25-156)
# ---------------------------------------------------------------------------

def var(name):
    """Read a context variable."""
    @pipeline_action
    def _var(ctx):
        return ctx.variables.get(_ev(name, ctx))
    return _var


def extra(key, default=None):
    """Read a context extras value."""
    @pipeline_action
    def _extra(ctx):
        return ctx.extras.get(_ev(key, ctx), _ev(default, ctx))
    return _extra


def attr(aid):
    """Read an attribute of the current link."""
    @pipeline_action
    def _attr(ctx):
        return ctx.current_link[ATTRIBUTES].get(_ev(aid, ctx))
    return _attr


def origin(fprint=None):
    """Current link's origin; with fprint=, re-materialize an ID — the
    first pair's key must be the Versa type rel (other_actions.py:75-120)."""
    @pipeline_action
    def _origin(ctx):
        if is_pipeline_action(fprint):
            return fprint(ctx)
        if not fprint:
            return ctx.current_link[ORIGIN]
        typ = None
        computed = []
        for k, v in fprint:
            if typ is None:
                if k != VTYPE_REL:
                    raise ValueError(
                        "first fprint pair key must be the Versa type rel")
                typ = v
            if k is None or v is None:
                continue
            for sub in _listify(v):
                subval = _ev(sub, ctx)
                if subval:
                    computed.extend((k, s) for s in _listify(subval))
        return materialize_entity(ctx, typ, fprint=computed)
    return _origin


def rel():
    """Current link's relationship."""
    @pipeline_action
    def _rel(ctx):
        return ctx.current_link[RELATIONSHIP]
    return _rel


def target():
    """Current link's target."""
    @pipeline_action
    def _target(ctx):
        return ctx.current_link[TARGET]
    return _target


def values(*rels):
    """Flatten a list of (possibly computed) values
    (other_actions.py:159-186)."""
    @pipeline_action
    def _values(ctx):
        out = []
        for r in rels:
            r_ = _ev(r, ctx)
            out.extend(r_) if isinstance(r_, list) else out.append(r_)
        return out
    return _values


def contains(l, val):
    """Membership test (other_actions.py:59-72)."""
    @pipeline_action
    def _contains(ctx):
        l_ = _ev(l, ctx)
        return any(v in l_ for v in _listify(val))
    return _contains


# ---------------------------------------------------------------------------
# control flow (reference other_actions.py:189-292)
# ---------------------------------------------------------------------------

def ifexists(test, value, alt=None):
    """Ternary on truthiness of *test*."""
    @pipeline_action
    def _ifexists(ctx):
        return _ev(value, ctx) if _ev(test, ctx) else _ev(alt, ctx)
    return _ifexists


def if_(test, iftrue, iffalse=None, vars_=None):
    """Fuller ternary. The reference evals string tests
    (other_actions.py:238) — refused here: tests must be callables/actions."""
    if isinstance(test, str):
        raise TypeError(
            "string-eval tests are not supported (security); pass an action")

    @pipeline_action
    def _if(ctx):
        if _ev(test, ctx):
            return _ev(iftrue, ctx)
        if iffalse is not None:
            return _ev(iffalse, ctx)
    return _if


def foreach(origin=None, rel=None, target=None, attributes=None, action=None):
    """Cartesian product of component lists → subcontexts, optionally
    running *action* per subcontext (other_actions.py:253-292)."""
    @pipeline_action
    def _foreach(ctx):
        (co, cr, ct, ca) = ctx.current_link
        # the None check applies to the EVALUATED value, not the spec
        # (other_actions.py:265-274): an action that evaluates to None —
        # e.g. var() on an unset variable — falls back to the context
        # link's component, exactly as an omitted argument does
        _o, _r = _ev(origin, ctx), _ev(rel, ctx)
        _t, _a = _ev(target, ctx), _ev(attributes, ctx)
        o_ = [co] if _o is None else _listify(_o)
        r_ = [cr] if _r is None else _listify(_r)
        t_ = [ct] if _t is None else _listify(_t)
        a_ = [ca] if _a is None else _listify(_a)
        subctxs = [ctx.copy(current_link=(o, r, t, a))
                   for o in o_ for r in r_ for t in t_ for a in a_ if o]
        if action:
            if not is_pipeline_action(action):
                raise TypeError("foreach() action arg must be an action")
            for sub in subctxs:
                action(sub)
            return None
        return subctxs
    return _foreach


def follow(*rels, origin=None, action=None):
    """Multi-hop traversal over the input model from the current origin
    (or *origin*), following each rel in turn; returns landing targets, or
    applies *action* per landing (other_actions.py:295-329)."""
    @pipeline_action
    def _follow(ctx):
        assert ctx.input_model is not None
        (o, in_rel, _t, a) = ctx.current_link
        start = _ev(origin, ctx) if origin is not None else None
        node = o if start is None else start
        frontier = [(node, a)]
        for r in rels:
            r_ = _ev(r, ctx)
            nxt = []
            for n, _na in frontier:
                for (_o2, _r2, t2, a2) in ctx.input_model.match(n, r_):
                    nxt.append((t2, a2))
            frontier = nxt
        if action:
            if not is_pipeline_action(action):
                raise TypeError("follow() action arg must be an action")
            results = []
            for t2, a2 in frontier:
                res = action(ctx.copy(current_link=(node, in_rel, t2, a2)))
                if res is not None:
                    results.extend(_listify(res))
            return results
        return [t2 for (t2, _a2) in frontier]
    return _follow


# ---------------------------------------------------------------------------
# value transforms (reference other_actions.py:332-510)
# ---------------------------------------------------------------------------

def toiri(arg, base=None, ignore_refs=True):
    """Coerce to IRI(s), percent-encoding on failure
    (other_actions.py:332-363)."""
    @pipeline_action
    def _toiri(ctx):
        out = []
        for u in _listify(_ev(arg, ctx)):
            iu = u
            if not (ignore_refs and not is_absolute(iu)):
                try:
                    iu = I(iu)
                except ValueError:
                    try:
                        iu = I(percent_encode(iu))
                    except ValueError:
                        pass
                if base is not None and isinstance(iu, I):
                    iu = I(absolutize(iu, base))
            out.append(iu)
        return out
    return _toiri


def lookup(mapping, key=None, onmiss=None):
    """Look a value up in an inline or context-provided mapping — the
    reference's entity-linking primitive (other_actions.py:366-404).
    At scale the same semantics run as a broadcast join
    (versa_spark.kg.linking)."""
    @pipeline_action
    def _lookup(ctx):
        (_o, _r, t, _a) = ctx.current_link
        k = _ev(key, ctx) if key is not None else t
        if isinstance(mapping, str):
            m = (ctx.extras["lookups"][mapping]
                 if "lookups" in ctx.extras else ctx.extras[mapping])
        else:
            m = mapping
        miss = key if onmiss is None else (None if onmiss is SKIP else onmiss)
        if isinstance(k, list):
            k = next(iter(k), None)
        return m.get(k, miss)
    return _lookup


def regex_match_modify(pattern, group_or_func, value=None):
    """Regex match → named group or function of the match
    (other_actions.py:407-433)."""
    @pipeline_action
    def _regex(ctx):
        pat = re.compile(pattern) if isinstance(pattern, str) else pattern
        v = _ev(value, ctx) if value is not None else ctx.current_link[TARGET]
        m = pat.match(v)
        if not m:
            return v
        if callable(group_or_func) and not isinstance(group_or_func, str):
            return group_or_func(m)
        return m.groupdict().get(group_or_func, "")
    return _regex


def replace_from(patterns, old_text):
    """First-match regex substitution over a value or list
    (other_actions.py:462-495)."""
    @pipeline_action
    def _replace(ctx):
        old = _ev(old_text, ctx)
        was_list = isinstance(old, list)
        texts = old if was_list else [old] if old is not None else []
        # order-preserving dedup: the reference collects through a set
        # (other_actions.py:483-493) whose list order varies with the
        # process hash seed — first-occurrence order has the same
        # CONTENTS but is deterministic across executors, which an
        # order-bearing distributed output requires
        seen = {}
        for text in texts:
            new = text
            for pat, repl in patterns:
                if pat.match(text):
                    new = pat.sub(repl, text)
            seen.setdefault(new, None)
        vals = list(seen)
        return vals if was_list else (vals[0] if vals else None)
    return _replace


def compose(*funcs):
    """Right-to-left composition: compose(a,b,c)(ctx) = a(b(c(ctx)))
    (other_actions.py:436-448)."""
    @pipeline_action
    def _compose(ctx):
        result = funcs[-1](ctx)
        for f in reversed(funcs[:-1]):
            result = f(result)
        return result
    return _compose


def ignore():
    """No-op rule (other_actions.py:451-459)."""
    @pipeline_action
    def _ignore(ctx):
        return None
    return _ignore


def action_template(proto):
    """Parametrized reusable action: binds keyword terms as variables then
    delegates to *proto* (other_actions.py:498-510)."""
    def _prep(**terms):
        @pipeline_action
        def _wrapper(ctx):
            for term, val in terms.items():
                ctx.variables[term] = _ev(val, ctx)
            return proto(ctx)
        return _wrapper
    return _prep
