"""ShExC frontend: schema text → constraint IR (SURVEY §2.7).

Covers the ShExC subset the reference exercises (its example schema at
``docs/api-usage/streaming.md:92`` plus the shexs entry point contract at
``SchemaValidate.scala:97-108``): PREFIX/BASE, shape declarations, triple
constraints with datatype / node kind / numeric & string facets / shape
references, value sets incl. IRI/literal/language stems (``~``), language
members (``@en``), wildcard (``.``) and exclusions (``- m``), OR/AND/NOT
value expressions, OneOf (``|``) alternatives, repeated-property EachOf,
cardinalities ``? * + {m} {m,n} {m,}``, CLOSED and EXTRA modifiers,
recursion (greatest fixpoint) with stratified negation, ``a`` keyword,
comments.

Shape-reference algebra (all compiled to conformant-set joins in
plans/validate.py):

* value-level ``@<Ref>``, ``@<A> OR @<B>`` (per-disjunct ref columns),
  ``NOT @<Ref>`` (incl. inside OR), ``@<A> AND @<B>`` (parse-time
  rewrite to a synthetic ``urn:shex:and:N`` conjunct shape);
* shape-level ``@<Base> AND { … }`` mixins and ``@<Base>`` aliases
  (``Shape.conjunct_refs``), ``@<A> OR @<B>`` ShapeOr
  (``Shape.disjunct_refs``);
* bare node-constraint shapes (``ex:T IRI``) inline into referencing
  constraints — including through OR disjuncts; ``IRI AND { … }`` gates
  the focus term;
* nested disjunctions: shape-level ORs mixing refs with value
  constraints (``ex:T @ex:A OR IRI``) wrap each value disjunct in a
  synthetic ``urn:shex:or:N`` shape, and OR-valued bare-shape
  references in disjunct position splice flat (OR associativity) — so
  refs any number of OR-levels deep normalize to one level.

* parenthesized value expressions (ShExC ``shapeAtom ::= '('
  shapeExpression ')'``): pure groups lower to disjunct lists,
  ``NOT ( … OR … )`` to a negated disjunction (refs inside are
  first-class — the evaluator negates the OR of per-disjunct
  conformance columns), and a group conjoined with other primitives
  distributes to DNF (``X AND (A OR B)`` → ``(X∧A) OR (X∧B)``) with
  facet tightening and unsatisfiable-conjunct elimination.

Semantic actions (``%ext{…%}``) and annotations (``// pred value``) are
parsed and dropped — the spec's no-op treatment for validators without
the extension.  Out of subset (rejected with a clear error, SURVEY §7.3):
negated references inside a reference cycle (non-stratifiable; applies
at disjunct level too), shape/class refs nested under a SECOND
disjunction level that cannot splice (a negated group in disjunct
position — the evaluator's per-disjunct conformance columns are one
level deep), negated groups conjoined with other primitives (would
need per-primitive polarity), negated shape-level refs, IMPORT.
NOT over an OR of value constraints and shape references is supported
(the disjunction stays nested and the evaluator compiles the negated
OR over value predicates and ref-conformance columns).
Known grammar deviation: AND/OR at one nesting level associate left
(``@A OR @B AND { … }`` reads as ``(A OR B) AND { … }``), whereas the
ShEx grammar binds AND tighter.
``start = @<Shape>`` is supported; shapemaps may use ``node@start``.
"""

from __future__ import annotations

import re

from rdfshape_api_spark.model import RDF_TYPE
from rdfshape_api_spark.plans.ir import CompiledSchema, Shape, TripleConstraint

_TOK = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<string>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<atref>@(?:[A-Za-z0-9_][\w.-]*)?:[\w.%-]*|@<[^<>\s]*>)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<regexp>/(?:[^/\\\n]|\\.)+/[a-z]*)
    | (?P<semact>%[A-Za-z_][\w.:-]*\{(?:[^%]|%(?!\}))*%\}|%[A-Za-z_][\w.:-]*%)
    | (?P<annot>//)
    | (?P<punct>[{}\[\]();,.?*+|~^=-])
    | (?P<pname>[A-Za-z0-9_][\w.-]*?:[\w.%-]*|:[\w.%-]*|[A-Za-z0-9_][\w.-]*:)
    | (?P<kw>[A-Za-z][A-Za-z0-9_-]*)
    """,
    re.VERBOSE,
)

_FACET_KWS = {
    "MININCLUSIVE": "min_inclusive",
    "MAXINCLUSIVE": "max_inclusive",
    "MINEXCLUSIVE": "min_exclusive",
    "MAXEXCLUSIVE": "max_exclusive",
    "MINLENGTH": "min_length",
    "MAXLENGTH": "max_length",
}
_NODEKIND_KWS = {"IRI": "iri", "BNODE": "bnode", "LITERAL": "literal", "NONLITERAL": "nonliteral"}


class _UnsatConjunct(Exception):
    """A DNF conjunct that can match no RDF term (dropped by lowering)."""


def _tokenize(text: str):
    toks, pos = [], 0
    while pos < len(text):
        m = _TOK.match(text, pos)
        if not m:
            raise ValueError(f"ShExC: unexpected character at offset {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup in ("ws", "comment", "semact"):
            # semantic actions (%ext{ code %} / %ext%) carry extension code
            # the validator doesn't execute — the ShEx spec lets a validator
            # without the extension treat them as no-ops, like the
            # reference's shexs pass-through (SchemaValidate.scala:97-108)
            continue
        toks.append((m.lastgroup, m.group()))
    return toks


class _ShexParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.start: str | None = None
        self.shapes: dict[str, Shape] = {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise ValueError("ShExC: unexpected end of input")
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ValueError(f"ShExC: expected {val!r}, got {v!r}")

    def expand(self, pname: str) -> str:
        pref, _, local = pname.partition(":")
        if pref not in self.prefixes:
            raise ValueError(f"ShExC: undefined prefix {pref!r}")
        return self.prefixes[pref] + local

    def iri_or_pname(self) -> str:
        k, v = self.next()
        if k == "iri":
            return self.base + v[1:-1] if self.base and "://" not in v else v[1:-1]
        if k == "pname":
            return self.expand(v)
        raise ValueError(f"ShExC: expected IRI or prefixed name, got {v!r}")

    def parse(self) -> CompiledSchema:
        while self.peek()[0] is not None:
            k, v = self.peek()
            if k == "kw" and v.upper() == "PREFIX":
                self.next()
                _, pname = self.next()
                if not pname.endswith(":"):
                    raise ValueError(f"ShExC: bad PREFIX declaration near {pname!r}")
                _, iri = self.next()
                self.prefixes[pname[:-1]] = iri[1:-1]
                continue
            if k == "kw" and v.upper() == "BASE":
                self.next()
                _, iri = self.next()
                self.base = iri[1:-1]
                continue
            if k == "kw" and v.upper() == "START":
                # start = @<Shape> — the schema's default shape; shapemaps
                # reference it as `@start`
                self.next()
                self.expect("=")
                rk, rv = self.next()
                if rk != "atref":
                    raise ValueError(f"ShExC: start requires a shape reference, got {rv!r}")
                ref = rv[1:]
                self.start = ref[1:-1] if ref.startswith("<") else self.expand(ref)
                continue
            if k == "kw" and v.upper() == "IMPORT":
                raise ValueError(f"ShExC: {v} not supported in this subset")
            self.parse_shape()
        _inline_node_constraint_refs(self.shapes)
        return CompiledSchema(
            engine="shex",
            shapes=self.shapes,
            prefixes=dict(self.prefixes),
            start=self.start,
        )

    def parse_shape(self):
        label = self.iri_or_pname()
        shape = Shape(shape_id=label)
        k, v = self.peek()
        # shape-level node constraint: `ex:T IRI`, `ex:T xsd:date MAXLENGTH
        # 5`, `ex:T [ ex:a ex:b~ ]`, optionally ANDed with a braced body
        # (`ex:S IRI AND { … }`).  shape_level mode stops before a bare
        # iri/pname once a primitive is consumed, so the NEXT shape's label
        # is never mistaken for a datatype.
        if not (
            (k == "kw" and v.upper() in ("CLOSED", "EXTRA"))
            or (k == "punct" and v == "{")
        ):
            nc = TripleConstraint(pred="")
            self.parse_value_expr_or(nc, shape_level=True)
            if not _has_any_value_field(nc):
                raise ValueError(
                    f"ShExC: expected node constraint or '{{' after shape {label!r}"
                )
            # shape-level shape reference (`ex:S @ex:Base AND { … }` /
            # alias `ex:T @ex:Base`): a conjunct over the focus node's
            # conformance in the referenced shape — lifted out of the node
            # constraint into Shape.conjunct_refs (the node-constraint gate
            # is a pure Column expression and can't carry a set membership)
            if nc.ref_shape is not None:
                if nc.negated:
                    raise ValueError(
                        "ShExC: negated shape-level shape reference "
                        "(`NOT @<ref> AND { … }`) is unsupported"
                    )
                shape.conjunct_refs.append(nc.ref_shape)
                nc.ref_shape = None
            if nc.disjuncts and any(d.ref_shape is not None for d in nc.disjuncts):
                # shape-level ShapeOr involving refs (`ex:T @ex:A OR @ex:B`,
                # `ex:T @ex:A OR IRI`) lifts into Shape.disjunct_refs
                # (at-least-one set membership).  A VALUE disjunct in a
                # mixed OR wraps into a synthetic bare node-constraint
                # shape (`urn:shex:or:N`) so the whole disjunction is
                # uniformly refs — the same synthetic-shape trick as
                # `@A AND @B` conjunctions.
                if nc.negated:
                    raise ValueError(
                        "ShExC: negated shape-level OR of shape references "
                        "is unsupported"
                    )
                refs: list[str] = []
                for d in nc.disjuncts:
                    if d.ref_shape is not None:
                        if d.negated or any(
                            f != "ref_shape" and getattr(d, f) not in (None, False)
                            for f in _VALUE_FIELDS
                        ):
                            raise ValueError(
                                "ShExC: a negated or value-qualified shape "
                                "reference inside a shape-level OR is "
                                "unsupported"
                            )
                        refs.append(d.ref_shape)
                    else:
                        sid = f"urn:shex:or:{len(self.shapes)}"
                        self.shapes[sid] = Shape(
                            shape_id=sid, node_constraint=tc_value_copy(d)
                        )
                        refs.append(sid)
                shape.disjunct_refs = refs
                nc.disjuncts = None
            if _has_any_value_field(nc):
                shape.node_constraint = nc
            k, v = self.peek()
        if (
            shape.node_constraint is not None
            or shape.conjunct_refs
            or shape.disjunct_refs
        ) and not (
            (k == "kw" and v.upper() in ("CLOSED", "EXTRA"))
            or (k == "punct" and v == "{")
        ):
            # bare node-constraint shape (no braced body): references to it
            # are inlined by the post-pass in parse()
            self.shapes[label] = shape
            return
        if k == "kw" and v.upper() == "CLOSED":
            self.next()
            shape.closed = True
            k, v = self.peek()
        extra_preds: set[str] = set()
        if k == "kw" and v.upper() == "EXTRA":
            self.next()
            while self.peek()[0] in ("iri", "pname") or self.peek()[1] == "a":
                if self.peek()[1] == "a":
                    self.next()
                    extra_preds.add(RDF_TYPE)
                else:
                    extra_preds.add(self.iri_or_pname())
        self.expect("{")
        groups: list[list[TripleConstraint]] = [[]]
        while self.peek()[1] != "}":
            tc = self.parse_constraint()
            tc.extra = tc.pred in extra_preds
            groups[-1].append(tc)
            if self.peek()[1] == ";":
                self.next()
            elif self.peek()[1] == "|":
                # OneOf: '|' binds looser than ';' — start a new alternative
                self.next()
                groups.append([])
        self.expect("}")
        for g in groups:
            # EachOf with a repeated property uses triple-partitioning
            # semantics (each triple matched by exactly one constraint) —
            # evaluated via transportation-feasibility over satisfaction
            # profiles in plans/validate.py; cap the group fan-out so the
            # 2^k profile aggregation stays codegen-friendly
            preds = [(tc.pred, tc.inverse) for tc in g]
            for p in set(preds):
                if preds.count(p) > 4:
                    raise ValueError(
                        f"ShExC: property <{p[0]}> repeated more than 4 times "
                        "in one EachOf group (profile blow-up; unsupported)"
                    )
        if len(groups) == 1:
            shape.constraints = groups[0]
        else:
            if any(not g for g in groups):
                raise ValueError("ShExC: empty OneOf alternative")
            shape.alternatives = groups
        self.shapes[label] = shape

    def parse_constraint(self) -> TripleConstraint:
        k, v = self.peek()
        inverse = False
        if k == "punct" and v == "^":
            # inverse triple constraint `^ex:p …` (ShExC senseFlags): the
            # constraint ranges over triples whose OBJECT is the focus
            # node; values are the pointing subjects (evaluated over the
            # inverse neighbourhood, plans/validate.py inv_nbr)
            self.next()
            inverse = True
            k, v = self.peek()
        if k == "kw" and v == "a":
            self.next()
            pred = RDF_TYPE
        else:
            pred = self.iri_or_pname()
        tc = TripleConstraint(pred=pred, inverse=inverse)
        self.parse_value_expr_or(tc)
        self.parse_cardinality(tc)
        # annotations (`// pred value`): metadata with no validation
        # semantics — parsed and dropped
        while self.peek() == ("annot", "//"):
            self.next()
            if self.peek() == ("kw", "a"):
                self.next()
            else:
                self.iri_or_pname()
            ok, ov = self.next()  # the annotation object term
            if ok == "string":
                if self.peek()[0] == "langtag":
                    self.next()
                elif self.peek() == ("punct", "^"):
                    self.expect("^")
                    self.expect("^")
                    self.iri_or_pname()
        return tc

    def parse_value_expr_or(self, tc: TripleConstraint, shape_level: bool = False):
        """valueExpr := [NOT] atom (OR [NOT] atom)* — AND between primitives
        inside an atom is the implicit conjunction the atom parser already
        accumulates; an explicit AND keyword between primitives is consumed
        as a no-op separator of the same conjunction."""
        if self.peek() == ("kw", "NOT"):
            self.next()
            tc.negated = True
        self.parse_value_expr(tc, shape_level=shape_level)
        if self.peek()[0] == "kw" and self.peek()[1].upper() == "OR":
            disjuncts = [tc_value_copy(tc)]
            tc.negated = False
            _clear_value_fields(tc)
            while self.peek()[0] == "kw" and self.peek()[1].upper() == "OR":
                self.next()
                d = TripleConstraint(pred=tc.pred)
                if self.peek() == ("kw", "NOT"):
                    self.next()
                    d.negated = True
                self.parse_value_expr(d, shape_level=shape_level)
                disjuncts.append(d)
            # shape references inside OR (`@<A> OR @<B>`, `[ "x" ] OR @<A>`)
            # are first-class: the evaluator threads one conformance column
            # per disjunct (validate._ref_reqs / disjunct_ref_cols).
            # Reference parity: shexs ShapeOr over ShapeRefs behind
            # SchemaValidate.scala:97-99
            # A pure parenthesized disjunction in disjunct position splices
            # flat (OR associativity: `(A OR B) OR C` ≡ `A OR B OR C`), so
            # nesting only survives where it is semantic (negated groups).
            spliced: list[TripleConstraint] = []
            for d in disjuncts:
                if d.disjuncts and not d.negated and not _has_non_disjunct_fields(d):
                    spliced.extend(d.disjuncts)
                else:
                    spliced.append(d)
            tc.disjuncts = spliced

    def parse_value_expr(self, tc: TripleConstraint, shape_level: bool = False):
        groups: list[TripleConstraint] = []
        while True:
            if self.peek()[0] == "kw" and self.peek()[1].upper() == "AND":
                self.next()  # explicit AND — same conjunction
                continue
            k, v = self.peek()
            if k == "kw" and v.upper() == "NOT":
                # NOT in conjunct position: only a parenthesized group can
                # carry a per-atom negation mid-conjunction (`xsd:string
                # AND NOT ("bad" OR "worse")` → mixed-polarity conjuncts
                # carrier via _lower_value_groups).  A bare negated atom
                # here would need the atom parser to stop after one
                # primitive — clean reject with guidance instead.
                self.next()
                if self.peek() != ("punct", "("):
                    raise ValueError(
                        "ShExC: NOT inside a conjunction must negate a "
                        "parenthesized group — write `… AND NOT ( atom )`"
                    )
                self.next()
                grp = TripleConstraint(pred=tc.pred)
                self.parse_value_expr_or(grp)
                self.expect(")")
                grp.negated = not grp.negated
                groups.append(grp)
                continue
            if k == "punct" and v == "(":
                # parenthesized shape expression (ShExC shapeAtom ::=
                # '(' shapeExpression ')'): parse the inner [NOT] atom
                # (OR …)* into a fresh value carrier, lower below (pure OR
                # groups → disjuncts; NOT-group → negated disjunction;
                # conjunction with other primitives → DNF distribution)
                self.next()
                grp = TripleConstraint(pred=tc.pred)
                self.parse_value_expr_or(grp)
                self.expect(")")
                groups.append(grp)
                continue
            if k == "punct" and v == ".":
                self.next()  # wildcard — no value constraint
                continue
            if k == "atref":
                self.next()
                ref = v[1:]
                target = ref[1:-1] if ref.startswith("<") else self.expand(ref)
                self._conjoin_ref_target(tc, target)
                continue
            if k == "punct" and v == "[":
                # value set: members, stems (`member~`), wildcard (`.`),
                # and exclusions (`- member[~]`, set-wide semantics)
                self.next()
                vs: list[tuple[str, str]] = []
                excl: list[tuple[str, str]] = []
                wild = False
                while self.peek()[1] != "]":
                    neg_member = self.peek() == ("punct", "-")
                    if neg_member:
                        self.next()
                    ik, iv = self.next()
                    if ik == "punct" and iv == ".":
                        if neg_member:
                            raise ValueError("ShExC: `- .` is not a valid exclusion")
                        wild = True
                        continue

                    if ik == "string":
                        kind, val = "literal", _unquote(iv)
                    elif ik == "iri":
                        kind, val = "iri", iv[1:-1]
                    elif ik == "pname":
                        kind, val = "iri", self.expand(iv)
                    elif ik == "num":
                        kind, val = "literal", iv
                    elif ik == "langtag":
                        # language member `@en`: any literal with that tag
                        kind, val = "lang", iv[1:].lower()
                    else:
                        raise ValueError(f"ShExC: bad value-set member {iv!r}")
                    if self.peek() == ("punct", "~"):
                        self.next()
                        kind = {
                            "literal": "literal_stem",
                            "lang": "lang_stem",
                        }.get(kind, "iri_stem")
                    (excl if neg_member else vs).append((kind, val))
                self.expect("]")
                tc.value_set = vs
                tc.value_set_has_wildcard = wild
                tc.value_set_excl = excl or None
                continue
            if k == "kw" and v.upper() in _NODEKIND_KWS:
                self.next()
                tc.node_kind = _NODEKIND_KWS[v.upper()]
                continue
            if k == "kw" and v.upper() in _FACET_KWS:
                self.next()
                nk, nv = self.next()
                if nk != "num":
                    raise ValueError(f"ShExC: facet {v} needs a number, got {nv!r}")
                field = _FACET_KWS[v.upper()]
                setattr(tc, field, int(nv) if field.endswith("length") else float(nv))
                continue
            if k == "kw" and v.upper() == "PATTERN":
                self.next()
                _, s = self.next()
                tc.pattern = _unquote(s)
                continue
            if k == "regexp":
                # spec-standard regex form `/re/` (xsFacet ::= stringFacet;
                # stringFacet ::= REGEXP): body is the regex source with
                # only `\/` unescaped; flags are out of subset
                self.next()
                body, _, flags = v[1:].rpartition("/")
                if flags:
                    raise ValueError(f"ShExC: regex flags {flags!r} are unsupported")
                tc.pattern = body.replace("\\/", "/")
                continue
            if k in ("iri", "pname"):
                if shape_level and (_has_any_value_field(tc) or groups):
                    # shape-level boundary: once a primitive is consumed, a
                    # bare iri/pname is the NEXT shape's label, not a datatype
                    break
                tc.datatype = self.iri_or_pname()
                continue
            break
        self._lower_value_groups(tc, groups)

    def _conjoin_ref_target(self, tc: TripleConstraint, target: str) -> None:
        """Conjoin a shape reference into a value carrier.  A second ref
        (`@<A> AND @<B>`) rewrites to one reference to a synthetic conjunct
        shape (empty body + shape-level conjunct_refs = [A, B]) — the
        evaluator's shape-level conjunction machinery does the set
        intersection."""
        if tc.ref_shape is not None:
            cur = self.shapes.get(tc.ref_shape)
            if cur is not None and cur.shape_id.startswith("urn:shex:and:"):
                cur.conjunct_refs.append(target)
            else:
                sid = f"urn:shex:and:{len(self.shapes)}"
                self.shapes[sid] = Shape(
                    shape_id=sid, conjunct_refs=[tc.ref_shape, target]
                )
                tc.ref_shape = sid
            return
        tc.ref_shape = target

    def _lower_value_groups(
        self, tc: TripleConstraint, groups: list[TripleConstraint]
    ) -> None:
        """Fold parenthesized groups into the IR.  ``tc`` carries the
        directly-written primitives of this conjunction (and, when the
        caller consumed a prefix NOT, the negation bit); each group is an
        already-parsed inner expression.  Lowering:

        - lone group, nothing direct: copy wholesale (handles `( … )` and,
          with the caller's NOT bit, `NOT ( … OR … )` → negated disjunction
          — the evaluator compiles ~(d1 | d2 | …) with per-disjunct ref
          conformance columns, so refs inside are first-class);
        - positive groups conjoined with primitives/each other: DNF
          distribution `X AND (A OR B)` → `(X AND A) OR (X AND B)` with
          per-conjunct field merging (tighter numeric facets win; genuine
          conflicts and negated members raise — clean subset boundary).
        """
        if not groups:
            return
        direct = _has_non_disjunct_fields(tc)
        if len(groups) == 1 and not direct:
            grp = groups[0]
            neg = tc.negated != grp.negated
            for f in _VALUE_FIELDS:
                setattr(tc, f, getattr(grp, f))
            tc.disjuncts = grp.disjuncts
            tc.xone = grp.xone
            tc.conjuncts = grp.conjuncts
            tc.negated = neg
            return
        if tc.negated:
            raise ValueError(
                "ShExC: NOT over a conjunction mixing (...) groups with "
                "other value constraints is unsupported — distribute the "
                "negation or name the group as a shape"
            )
        if any(
            grp.negated or any(m.negated for m in grp.disjuncts or [])
            for grp in groups
        ):
            # mixed-polarity conjunction, e.g. `xsd:string AND NOT ("bad"
            # OR "worse")` or `(NOT IRI OR xsd:string) AND MINLENGTH 2`:
            # no DNF — lower to a value-level `conjuncts` carrier the
            # evaluator ANDs recursively (_value_ok).  Shape refs inside
            # (e.g. `IRI AND NOT (@ex:Bad OR "x")`) are first-class: the
            # evaluator attaches a conformance column per ref-carrying
            # node of the tree (validate._walk_value_nodes colmap), and
            # NOT over a ref compiles to the conformance-set complement.
            members_: list[TripleConstraint] = []
            if direct:
                members_.append(tc_value_copy(tc))
            members_.extend(tc_value_copy(g) for g in groups)
            _clear_value_fields(tc)
            tc.conjuncts = members_
            return
        result = [tc_value_copy(tc)]
        for grp in groups:
            members = grp.disjuncts if grp.disjuncts else [grp]
            nxt: list[TripleConstraint] = []
            for c in result:
                for m in members:
                    try:
                        nxt.append(self._conjoin(c, m))
                    except _UnsatConjunct:
                        # e.g. `IRI AND BNODE`: the conjunct can match no
                        # value — drop it from the DNF (false ∨ x ≡ x)
                        pass
            if not nxt:
                raise ValueError(
                    "ShExC: the AND conjunction of these value constraints "
                    "is unsatisfiable (matches no value)"
                )
            result = nxt
        # re-splice: distribution may leave pure nested disjunctions
        flat: list[TripleConstraint] = []
        for d in result:
            if d.disjuncts and not d.negated and not _has_non_disjunct_fields(d):
                flat.extend(d.disjuncts)
            else:
                flat.append(d)
        _clear_value_fields(tc)
        if len(flat) == 1:
            one = flat[0]
            for f in _VALUE_FIELDS:
                setattr(tc, f, getattr(one, f))
            tc.disjuncts = one.disjuncts
            tc.xone = one.xone
        else:
            tc.disjuncts = flat

    def _conjoin(
        self, c: TripleConstraint, m: TripleConstraint
    ) -> TripleConstraint:
        """One DNF conjunct: merge two positive value atoms into a single
        carrier.  Numeric/length facets tighten; same-valued scalars are
        idempotent; two refs intersect via a synthetic conjunct shape;
        anything else that would need per-primitive polarity or set
        intersection raises a clean error."""
        if c.negated or m.negated:
            raise ValueError(
                "ShExC: a negated member inside a distributed conjunction "
                "is unsupported"
            )
        if c.disjuncts or m.disjuncts:
            raise ValueError(
                "ShExC: nested (...) disjunctions on both sides of AND are "
                "unsupported — flatten one side"
            )
        out = tc_value_copy(c)
        if m.ref_shape is not None:
            self._conjoin_ref_target(out, m.ref_shape)
        for f in _VALUE_FIELDS:
            if f in ("negated", "ref_shape"):
                continue
            mv, cv = getattr(m, f), getattr(out, f)
            if mv in (None, False):
                continue
            if cv in (None, False):
                setattr(out, f, mv)
                continue
            if cv == mv:
                continue
            if f in ("min_inclusive", "min_exclusive", "min_length"):
                setattr(out, f, max(cv, mv))
            elif f in ("max_inclusive", "max_exclusive", "max_length"):
                setattr(out, f, min(cv, mv))
            elif f in ("node_kind", "datatype"):
                # two different node kinds / datatypes conjoined: no term
                # satisfies both — the conjunct is unsatisfiable
                raise _UnsatConjunct(f)
            else:
                raise ValueError(
                    f"ShExC: conflicting `{f}` constraints in a "
                    "distributed AND conjunction are unsupported"
                )
        return out

    def parse_cardinality(self, tc: TripleConstraint):
        k, v = self.peek()
        if k == "punct" and v == "?":
            self.next()
            tc.min_count, tc.max_count = 0, 1
        elif k == "punct" and v == "+":
            self.next()
            tc.min_count, tc.max_count = 1, None
        elif k == "punct" and v == "*":
            self.next()
            tc.min_count, tc.max_count = 0, None
        elif k == "punct" and v == "{":
            self.next()
            _, m = self.next()
            tc.min_count = int(m)
            if self.peek()[1] == ",":
                self.next()
                nk, nv = self.next()
                tc.max_count = None if nv == "*" else int(nv)
            else:
                tc.max_count = tc.min_count
            self.expect("}")
        # default: exactly one (min=max=1), already the dataclass default


_VALUE_FIELDS = (
    "datatype", "node_kind", "value_set", "value_set_has_wildcard",
    "value_set_excl", "min_inclusive", "max_inclusive",
    "min_exclusive", "max_exclusive", "pattern", "min_length", "max_length",
    "ref_shape", "negated",
)


def _has_non_disjunct_fields(tc: TripleConstraint) -> bool:
    """Any value primitive set besides a nested disjunction / negation?"""
    return any(
        getattr(tc, f) not in (None, False)
        for f in _VALUE_FIELDS
        if f != "negated"
    )


def _has_any_value_field(tc: TripleConstraint) -> bool:
    return any(getattr(tc, f) not in (None, False) for f in _VALUE_FIELDS) or bool(
        tc.disjuncts
    )


def _inline_node_constraint_refs(shapes: dict[str, Shape]) -> None:
    """References to bare node-constraint shapes (`ex:v @ex:T` where
    ``ex:T IRI`` has no braced body) are semantically the inlined
    constraint — rewrite them at parse time so the evaluator never needs
    literal-valued conformance sets."""
    bare = {
        sid
        for sid, sh in shapes.items()
        if sh.node_constraint is not None and not sh.constraints and not sh.alternatives
    }

    def _tcs(sh: Shape):
        yield from sh.constraints
        for grp in sh.alternatives or []:
            yield from grp

    def _inline_into(d: TripleConstraint) -> None:
        nc = shapes[d.ref_shape].node_constraint
        others = [
            f
            for f in _VALUE_FIELDS
            if f not in ("ref_shape", "negated")
            and getattr(d, f) not in (None, False)
        ]
        if others or d.disjuncts:
            raise ValueError(
                "ShExC: a node-constraint shape reference combined with "
                "other value constraints on one disjunct is unsupported"
            )
        neg = d.negated != nc.negated
        for f in _VALUE_FIELDS:
            setattr(d, f, getattr(nc, f))
        d.disjuncts = [tc_value_copy(x) for x in nc.disjuncts] if nc.disjuncts else None
        d.negated = neg

    for sh in shapes.values():
        for tc in _tcs(sh):
            # disjunct-level refs to bare node-constraint shapes inline the
            # same way the top-level ones below do (`ex:v @ex:T OR IRI`
            # where ex:T is `xsd:integer` — literal values can never sit in
            # a shape's conformance set, so the constraint must be inlined).
            # When the bare shape is ITSELF an OR (`ex:T [ "x" ] OR
            # xsd:integer`), its disjuncts SPLICE into the referring
            # disjunct list — OR associativity, so refs never end up two
            # OR-levels deep (shexs parity: arbitrary nesting behind
            # SchemaValidate.scala:97-99)
            if tc.disjuncts:
                spliced: list[TripleConstraint] = []
                for d in tc.disjuncts:
                    if d.ref_shape in bare:
                        nc = shapes[d.ref_shape].node_constraint
                        if nc.disjuncts and not nc.negated:
                            if d.negated:
                                # NOT @T where T = c1 OR c2: keep the
                                # disjunction NESTED on this disjunct with
                                # the negation bit — validate._value_ok
                                # recurses and compiles ~(c1 | c2) directly
                                # (De Morgan done by the Column algebra,
                                # not the parser).  Refs inside T evaluate
                                # via per-node conformance columns, so the
                                # complement is the column's negation.
                                _inline_into(d)
                                spliced.append(d)
                                continue
                            others = [
                                f
                                for f in _VALUE_FIELDS
                                if f not in ("ref_shape", "negated")
                                and getattr(d, f) not in (None, False)
                            ]
                            if others:
                                raise ValueError(
                                    "ShExC: a node-constraint shape reference "
                                    "combined with other value constraints on "
                                    "one disjunct is unsupported"
                                )
                            spliced.extend(tc_value_copy(x) for x in nc.disjuncts)
                            continue
                        _inline_into(d)
                    spliced.append(d)
                tc.disjuncts = spliced
            if tc.ref_shape not in bare:
                continue
            nc = shapes[tc.ref_shape].node_constraint
            others = [
                f
                for f in _VALUE_FIELDS
                if f not in ("ref_shape", "negated")
                and getattr(tc, f) not in (None, False)
            ]
            if others or tc.disjuncts:
                raise ValueError(
                    "ShExC: a node-constraint shape reference combined with "
                    "other value constraints on one triple constraint is unsupported"
                )
            neg = tc.negated != nc.negated  # NOT @T over a NOT-constraint composes
            for f in _VALUE_FIELDS:
                setattr(tc, f, getattr(nc, f))
            tc.disjuncts = [tc_value_copy(d) for d in nc.disjuncts] if nc.disjuncts else None
            tc.negated = neg


def tc_value_copy(tc: TripleConstraint) -> TripleConstraint:
    d = TripleConstraint(pred=tc.pred)
    for f in _VALUE_FIELDS:
        setattr(d, f, getattr(tc, f))
    if tc.disjuncts:
        # nested disjunction (parenthesized group) travels with the value
        # expression — deep copy so later mutation never aliases
        d.disjuncts = [tc_value_copy(x) for x in tc.disjuncts]
        d.xone = tc.xone
    if tc.conjuncts:
        d.conjuncts = [tc_value_copy(x) for x in tc.conjuncts]
    return d


def _clear_value_fields(tc: TripleConstraint) -> None:
    for f in _VALUE_FIELDS:
        setattr(tc, f, False if f in ("negated", "value_set_has_wildcard") else None)
    tc.disjuncts = None
    tc.xone = False
    tc.conjuncts = None


def _unquote(s: str) -> str:
    from rdfshape_api_spark.sources.parsers import unescape

    return unescape(s[1:-1])


def parse_shexc(text: str) -> CompiledSchema:
    """Parse a ShExC schema into the shared constraint IR."""
    return _ShexParser(text).parse()
