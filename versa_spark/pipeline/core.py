"""Pipeline core: rule context, staged definition, fingerprint →
transform → labelize helpers.

Semantics mirror the reference pipeline driver
(/root/reference/tools/py/pipeline/main.py): ``context`` (main.py:49-90),
``resource_id``/``materialize_entity`` (main.py:93-155), ``stage`` +
``definition`` (main.py:216-288), the three helpers (main.py:290-433) and
``generic_pipeline`` (main.py:436-470).

Execution model difference (deliberate, documented): the reference walks one
global in-memory model single-threaded.  Here a pipeline runs over a
LocalModel — one independent subgraph (a conversation, a record) — and the
Spark driver (``versa_spark.pipeline.spark_run``) fans these out per group
with ``applyInPandas``, unioning + deduplicating outputs globally.  Because
resource IDs are deterministic fingerprint hashes, cross-group duplicates
collapse to identical quads and the global dedup reproduces the reference's
add-refuses-duplicates semantics.

The reference's random-ID path (empty fingerprint → counter-driven hash,
main.py:129-131) is non-deterministic and partition-order dependent; this
engine instead derives a deterministic provenance key (SURVEY.md §7 risks).
"""

from __future__ import annotations

import json
from operator import itemgetter

from versa_spark import VLABEL_REL, VTYPE_REL
from versa_spark.iriref import I
from versa_spark.ids import fingerprint_plaintext, simple_hashstring
from versa_spark.local import LocalModel, all_origins, resourcetypes

ORIGIN, RELATIONSHIP, TARGET, ATTRIBUTES = 0, 1, 2, 3


def is_pipeline_action(f) -> bool:
    """Marker test (reference main.py:135-136)."""
    return callable(f) and getattr(f, "is_pipeline_action", False)


def pipeline_action(f):
    """Decorator marking a closure as a pipeline action."""
    f.is_pipeline_action = True
    return f


class context:
    """Rule-evaluation context (reference main.py:49-90): the prototype
    link, the input/output models, base IRI, variables, extras and the
    dedup ledger ``existing_ids``."""

    __slots__ = ("current_link", "input_model", "output_model", "base",
                 "variables", "extras", "existing_ids", "provenance")

    def __init__(self, current_link, input_model, output_model=None,
                 base=None, variables=None, extras=None, existing_ids=None,
                 provenance=None):
        self.current_link = current_link
        self.input_model = input_model
        self.output_model = LocalModel() if output_model is None else output_model
        self.base = base
        # Falsy containers become fresh objects — so copies derived from a
        # context with EMPTY variables/extras/existing_ids get their own
        # (the reference's exact behavior, main.py:63-70 + 72-90: an empty
        # ``existing_ids`` is per-rule-application, a non-empty one is
        # shared by reference)
        self.variables = variables or {}
        self.extras = extras or {}
        self.existing_ids = existing_ids or set()
        # Deterministic stand-in for the reference's random idgen counter:
        # a stable key for the unit of work (e.g. conv_id) + a serial.
        self.provenance = provenance or ["", 0]

    def copy(self, current_link=None, input_model=None, output_model=None,
             base=None, variables=None, extras=None, existing_ids=None):
        return context(
            current_link=current_link if current_link else self.current_link,
            input_model=self.input_model if input_model is None else input_model,
            output_model=self.output_model if output_model is None else output_model,
            base=base if base else self.base,
            variables=variables if variables else self.variables,
            extras=extras if extras else self.extras,
            existing_ids=existing_ids if existing_ids else self.existing_ids,
            provenance=self.provenance)

    def next_provenance_id(self, etype) -> str:
        """Deterministic replacement for reference main.py:129-131."""
        self.provenance[1] += 1
        plaintext = json.dumps(
            [[str(VTYPE_REL), str(etype)],
             ["@versa-spark/provenance",
              f"{self.provenance[0]}#{self.provenance[1]}"]],
            separators=(",", ":"))
        return simple_hashstring(plaintext)


DUMMY_CONTEXT = context((None, I("https://example.org/"), None, {}), None)


def materialize_entity(ctx: context, etype, fprint=None) -> I:
    """Compute the canonical resource ID for a type + fingerprint pairs
    (reference main.py:139-155 → resource_id main.py:93-132). Values that
    are actions get evaluated against *ctx* first."""
    pairs = []
    for k, v in fprint or []:
        pairs.append((k, v(ctx) if is_pipeline_action(v) else v))
    pairs = [(k, v) for (k, v) in pairs if k is not None and v is not None]
    vocabbase = ctx.base
    if pairs:
        return I(simple_hashstring(
            fingerprint_plaintext(etype, pairs, vocabbase=vocabbase)))
    return I(ctx.next_provenance_id(etype))


def create_resource(output_model: LocalModel, rtypes, fprint, links,
                    existing_ids=None, preserve_fprint=False, base=None,
                    provenance=None):
    """Standalone resource creation (reference main.py:158-198)."""
    from versa_spark import VFPRINT_REL
    rtypes = rtypes if isinstance(rtypes, list) else [rtypes]
    rtype, *moretypes = rtypes
    links = list(links)
    for t in moretypes:
        links.append([VTYPE_REL, t])
    ctx = context(None, None, output_model, base=base,
                  existing_ids=existing_ids, provenance=provenance)
    rid = I(materialize_entity(ctx, rtype, fprint=fprint))
    if existing_ids is not None:
        if rid in existing_ids:
            return (False, rid)
        existing_ids.add(rid)
    output_model.add(rid, VTYPE_REL, rtype)
    if preserve_fprint:
        attrs = {k: v for (k, v) in fprint}
        attrs[VTYPE_REL] = rtypes
        output_model.add(rid, VFPRINT_REL, rtype, attrs)
    for r, t in links:
        output_model.add(rid, r, t)
    return (True, rid)


def stage(sortkey):
    """Stage decorator with explicit ordering (reference main.py:216-222)."""
    if callable(sortkey):
        raise RuntimeError("use @stage(N), not @stage")

    def _deco(func):
        func.pipeline_sort_key = sortkey
        return func
    return _deco


class definition:
    """A staged model→model transform (reference main.py:231-288).

    Stages are methods decorated with ``@stage(n)``, run in sort-key order;
    a stage returning False aborts the run (e.g. nothing fingerprinted)."""

    def _ordered_stages(self):
        stages = [getattr(self, k) for k in dir(self)
                  if hasattr(getattr(self, k), "pipeline_sort_key")]
        return sorted(((s.pipeline_sort_key, s) for s in stages),
                      key=itemgetter(0))

    def run(self, input_model=None, raw_source=None, output_model=None,
            **kwargs):
        self.input_model = LocalModel() if input_model is None else input_model
        self.output_model = LocalModel() if output_model is None else output_model
        self._raw_source = raw_source
        self.fingerprints = {}
        for _, st in self._ordered_stages():
            if st(**kwargs) is False:
                break
        return self.output_model

    # -- the three canonical helpers ----------------------------------

    def fingerprint_helper(self, rules, root_context=DUMMY_CONTEXT):
        """Scan input resources by type; matching rules decide output
        resource IDs (reference main.py:290-337).  The prototype link has
        rel=None so materialize won't attach (main.py:321-325)."""
        new_rids = set()
        for rid in all_origins(self.input_model):
            for typ in resourcetypes(self.input_model, rid):
                rule_spec = rules.get(typ)
                if rule_spec is None:
                    continue
                for rule in (rule_spec if isinstance(rule_spec, (list, tuple))
                             else (rule_spec,)):
                    hook_rids = set()
                    link = (rid, None, typ, {})
                    ctx = root_context.copy(
                        current_link=link, input_model=self.input_model,
                        output_model=self.output_model)
                    prior = ctx.extras.get("@new-entity-hook")
                    hooks = (list(prior) if isinstance(prior, list)
                             else ([prior] if prior else []))
                    hooks.append(hook_rids.add)
                    ctx.extras["@new-entity-hook"] = hooks
                    mains_out = rule(ctx)
                    mains_out = (set(mains_out) if isinstance(mains_out, list)
                                 else {mains_out})
                    mains, others = self.fingerprints.setdefault(
                        rid, (set(), set()))
                    mains.update(mains_out)
                    others.update(hook_rids)
                    others -= mains
                    new_rids.update(hook_rids)
        return new_rids

    def transform_by_rel_helper(self, rules, origins=None, handle_misses=None,
                                root_context=DUMMY_CONTEXT):
        """Apply rel-keyed rules to each link of each fingerprinted
        resource (reference main.py:339-402).  Scalar keys match mains on
        rel; tuple keys ``(rel, T1, T2…)`` match mains or others whose
        output types intersect."""
        origins = origins or self.fingerprints
        applied = 0
        types_cache = {}

        def _out_types(out_rid):
            if out_rid not in types_cache:
                types_cache[out_rid] = frozenset(
                    resourcetypes(self.output_model, out_rid))
            return types_cache[out_rid]

        resource_map = {k: list(m) for (k, (m, o)) in self.fingerprints.items()}

        for rid, (mains, others) in origins.items():
            for (o, r, t, attribs) in self.input_model.match(rid):
                match_sets = set()
                for out_rid in list(mains) + list(others):
                    for rspec, rule in rules.items():
                        if out_rid in mains and rspec == r:
                            match_sets.add((rule, out_rid))
                        elif isinstance(rspec, tuple) and rspec[0] == r:
                            if any(typ in _out_types(out_rid)
                                   for typ in rspec[1:]):
                                match_sets.add((rule, out_rid))
                if not match_sets:
                    if handle_misses:
                        handle_misses((rid, r, t, attribs))
                    continue
                for rule, out_rid in match_sets:
                    # The prototype link: origin swapped to the output
                    # resource (main.py:387-390)
                    link = (out_rid, r, t, attribs)
                    variables = dict(root_context.variables)
                    variables["input-resource"] = rid
                    extras = dict(root_context.extras)
                    extras["@resource"] = resource_map
                    ctx = root_context.copy(
                        current_link=link, input_model=self.input_model,
                        output_model=self.output_model, variables=variables,
                        extras=extras)
                    rule(ctx)
                    applied += 1
        return applied

    def labelize_helper(self, rules, label_rel=VLABEL_REL, origins=None,
                        handle_misses=None, root_context=DUMMY_CONTEXT):
        """Compute labels for typed output resources (reference
        main.py:404-433). Reads and writes the output model."""
        new_labels = {}
        for out_rid in all_origins(self.output_model, of_types="*"):
            for typ in resourcetypes(self.output_model, out_rid):
                rule = rules.get(typ)
                if rule is None:
                    continue
                link = (out_rid, VTYPE_REL, typ, {})
                ctx = root_context.copy(
                    current_link=link, input_model=self.output_model,
                    output_model=self.output_model)
                out_labels = rule(ctx)
                if not out_labels:
                    continue
                for label in out_labels:
                    if not label or not str(label).strip():
                        if handle_misses:
                            handle_misses(out_rid, typ)
                    label = str(label).strip()
                    new_labels[out_rid] = label
                    self.output_model.add(out_rid, label_rel, label)
        return new_labels


class generic_pipeline(definition):
    """The canonical 3-stage pipeline (reference main.py:436-470)."""

    def __init__(self, fingerprint_rules, transform_rules, labelize_rules,
                 root_ctx=DUMMY_CONTEXT):
        self.fingerprint_rules = fingerprint_rules
        self.transform_rules = transform_rules
        self.labelize_rules = labelize_rules
        self._root_ctx = root_ctx

    @stage(1)
    def fingerprint(self):
        return bool(self.fingerprint_helper(
            self.fingerprint_rules, root_context=self._root_ctx))

    @stage(2)
    def main_transform(self):
        self.transform_by_rel_helper(
            self.transform_rules, root_context=self._root_ctx)
        return True

    @stage(3)
    def labelize(self):
        self.labelize_helper(
            self.labelize_rules, root_context=self._root_ctx)
        return True
