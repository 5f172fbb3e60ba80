"""ShExJ frontend: the JSON syntax for ShEx schemas (SURVEY §2.7).

Reference parity: the reference accepts schemas in BOTH ShEx syntaxes —
``ShExFormat.availableFormats = List(ShExC, ShExJ)``
(``ShExFormat.scala:21-26``, mime ``text/shexj``); shexs deserializes the
ShExJ JSON-LD AST directly.  This engine keeps ONE lowering pipeline: the
ShExJ AST is printed to ShExC text and fed through
:func:`rdfshape_api_spark.plans.shex.parse_shexc`, so every lowering rule
(synthetic conjunct/disjunct shapes, bare node-constraint inlining, DNF
distribution, stratified-negation checks) applies identically to both
syntaxes — a schema means the same thing regardless of which syntax it
arrived in, by construction.

Structures covered (ShEx 2.0/2.1 JSON, shex.io/shex-semantics):

* ``Schema`` with ``shapes`` (2.1 ``ShapeDecl`` wrappers or 2.0 inline
  ``id``), ``start`` (reference or inline expression — the latter becomes
  a synthetic ``urn:shexj:start`` declaration);
* shape expressions: ``NodeConstraint`` (nodeKind, datatype, string /
  numeric facets, value sets), ``Shape`` (``expression``, ``closed``,
  ``extra``), ``ShapeAnd`` / ``ShapeOr`` / ``ShapeNot``, shapeExprRef
  strings; anonymous inline ``Shape`` in value position is hoisted to a
  synthetic ``urn:shexj:inline:N`` declaration (ShExC has no anonymous
  braced value shapes in this engine's subset);
* triple expressions: ``TripleConstraint`` (``predicate``, ``valueExpr``,
  ``min``/``max`` with ``-1`` = unbounded, ``inverse``), ``EachOf``
  (nested EachOfs splice by associativity), ``OneOf`` (at shape-body top
  level — the ``|`` grammar position);
* value-set members: IRIs, plain ``ObjectLiteral``, ``Language``,
  ``IriStem`` / ``LiteralStem`` / ``LanguageStem`` and their ``*Range``
  forms incl. ``Wildcard`` stems — per-member stem-range exclusions land
  in the engine's set-wide exclusion list (documented ShExC-parser
  deviation, same semantics wherever exclusions don't overlap another
  positive member);
* ``semActs`` / ``annotations`` are dropped (the spec's no-op treatment,
  same as the ShExC frontend).

Out of subset (clean reject, the ShExC-frontend convention): labeled
triple expressions and tripleExprRefs, ``import``, pattern ``flags``,
``totaldigits`` / ``fractiondigits``, typed / language-tagged value-set
literals (the ShExC value-set grammar here has no ``"v"^^dt`` members).
"""

from __future__ import annotations

import json
from typing import Any

from rdfshape_api_spark.plans.ir import CompiledSchema
from rdfshape_api_spark.plans.shex import parse_shexc

_FACET_PRINT = {
    "mininclusive": "MININCLUSIVE",
    "maxinclusive": "MAXINCLUSIVE",
    "minexclusive": "MINEXCLUSIVE",
    "maxexclusive": "MAXEXCLUSIVE",
    "minlength": "MINLENGTH",
    "maxlength": "MAXLENGTH",
}

_NODEKIND_PRINT = {
    "iri": "IRI",
    "bnode": "BNODE",
    "literal": "LITERAL",
    "nonliteral": "NONLITERAL",
}


def _esc(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def _iri(i: Any) -> str:
    if not isinstance(i, str) or not i:
        raise ValueError(f"ShExJ: expected an IRI string, got {i!r}")
    return f"<{i}>"


def _num(v: Any) -> str:
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise ValueError(f"ShExJ: numeric facet value must be a number, got {v!r}")
    return repr(v)


def _card(te: dict) -> str:
    mn = te.get("min", 1)
    mx = te.get("max", 1)
    if (mn, mx) == (1, 1):
        return ""
    if (mn, mx) == (0, 1):
        return " ?"
    if (mn, mx) == (0, -1):
        return " *"
    if (mn, mx) == (1, -1):
        return " +"
    if mx == -1:
        return f" {{{mn},}}"
    return f" {{{mn},{mx}}}"


class _Printer:
    """One ShExJ document → ShExC text.  Inline anonymous value shapes and
    an inline ``start`` expression hoist into synthetic declarations
    appended after the explicit ones."""

    def __init__(self) -> None:
        self.synthetic: list[str] = []

    # ---- value-set members -------------------------------------------

    def _member(self, m: Any, out: list[str], excl: list[str]) -> None:
        if isinstance(m, str):
            out.append(_iri(m))
            return
        if not isinstance(m, dict):
            raise ValueError(f"ShExJ: bad value-set member {m!r}")
        if "value" in m:  # ObjectLiteral (its "type" field is the datatype)
            if m.get("language") or m.get("type") not in (None, "ObjectLiteral"):
                raise ValueError(
                    "ShExJ: typed/language-tagged value-set literals are "
                    "outside the ShExC value-set subset"
                )
            out.append(f'"{_esc(m["value"])}"')
            return
        t = m.get("type")
        if t == "Language":
            out.append("@" + m["languageTag"])
        elif t == "LanguageStem":
            out.append("@" + m["stem"] + "~")
        elif t == "IriStem":
            out.append(_iri(m["stem"]) + "~")
        elif t == "LiteralStem":
            out.append(f'"{_esc(m["stem"])}"~')
        elif t in ("IriStemRange", "LiteralStemRange", "LanguageStemRange"):
            stem = m.get("stem")
            if isinstance(stem, dict):  # {"type": "Wildcard"}
                out.append(".")
            elif t == "IriStemRange":
                out.append(_iri(stem) + "~")
            elif t == "LiteralStemRange":
                out.append(f'"{_esc(stem)}"~')
            else:
                out.append("@" + stem + "~")
            for x in m.get("exclusions", []):
                if isinstance(x, str):
                    excl.append(
                        "- @" + x if t == "LanguageStemRange" else "- " + _iri(x)
                    )
                elif x.get("type") == "IriStem":
                    excl.append("- " + _iri(x["stem"]) + "~")
                elif x.get("type") == "LiteralStem":
                    excl.append(f'- "{_esc(x["stem"])}"~')
                elif x.get("type") == "LanguageStem":
                    excl.append("- @" + x["stem"] + "~")
                else:
                    raise ValueError(f"ShExJ: bad stem-range exclusion {x!r}")
        else:
            raise ValueError(f"ShExJ: unsupported value-set member type {t!r}")

    # ---- shape expressions -------------------------------------------

    def node_constraint(self, e: dict) -> str:
        parts: list[str] = []
        if "nodeKind" in e:
            nk = _NODEKIND_PRINT.get(e["nodeKind"])
            if nk is None:
                raise ValueError(f"ShExJ: bad nodeKind {e['nodeKind']!r}")
            parts.append(nk)
        if "datatype" in e:
            parts.append(_iri(e["datatype"]))
        for facet in ("totaldigits", "fractiondigits"):
            if facet in e:
                raise ValueError(f"ShExJ: facet {facet} unsupported in this subset")
        if "length" in e:
            parts.append(f"MINLENGTH {_num(e['length'])} MAXLENGTH {_num(e['length'])}")
        for facet, kw in _FACET_PRINT.items():
            if facet in e:
                parts.append(f"{kw} {_num(e[facet])}")
        if "pattern" in e:
            if e.get("flags"):
                raise ValueError("ShExJ: pattern flags are unsupported")
            parts.append(f'PATTERN "{_esc(e["pattern"])}"')
        if "values" in e:
            mem: list[str] = []
            excl: list[str] = []
            for m in e["values"]:
                self._member(m, mem, excl)
            parts.append("[ " + " ".join(mem + excl) + " ]")
        if not parts:
            parts.append(".")
        return " ".join(parts)

    def value_expr(self, e: Any) -> str:
        """A shapeExpr in valueExpr / operand position."""
        if e is None:
            return "."
        if isinstance(e, str):
            return f"@{_iri(e)}"
        t = e.get("type")
        if t == "NodeConstraint":
            return self.node_constraint(e)
        if t == "ShapeOr":
            return " OR ".join(self.value_expr(x) for x in e["shapeExprs"])
        if t == "ShapeAnd":
            out = []
            for x in e["shapeExprs"]:
                if isinstance(x, dict) and x.get("type") == "ShapeNot":
                    # NOT mid-conjunction must negate a parenthesized group
                    out.append(f"NOT ({self.value_expr(x['shapeExpr'])})")
                else:
                    out.append(self.value_expr(x))
            return " AND ".join(out)
        if t == "ShapeNot":
            inner = e["shapeExpr"]
            txt = self.value_expr(inner)
            if isinstance(inner, dict) and inner.get("type") in ("ShapeOr", "ShapeAnd"):
                return f"NOT ({txt})"
            return f"NOT {txt}"
        if t == "Shape":
            # anonymous inline shape: hoist to a synthetic declaration and
            # reference it — ShExC braced bodies are declaration-level here
            sid = f"urn:shexj:inline:{len(self.synthetic)}"
            self.synthetic.append(f"<{sid}> {self.shape_body(e)}")
            return f"@<{sid}>"
        raise ValueError(f"ShExJ: unsupported shape expression type {t!r}")

    def triple_constraint(self, te: dict) -> str:
        if te.get("id") is not None:
            raise ValueError("ShExJ: labeled triple expressions are unsupported")
        head = ("^" if te.get("inverse") else "") + _iri(te["predicate"])
        ve = te.get("valueExpr")
        return f"{head} {self.value_expr(ve)}{_card(te)}"

    def _each_of(self, te: Any) -> list[str]:
        """One EachOf-position tripleExpr → list of constraint strings
        (nested EachOfs splice flat by associativity)."""
        if isinstance(te, str):
            raise ValueError("ShExJ: tripleExprRef is unsupported")
        t = te.get("type")
        if t == "TripleConstraint":
            return [self.triple_constraint(te)]
        if t == "EachOf":
            if te.get("id") is not None:
                raise ValueError("ShExJ: labeled triple expressions are unsupported")
            if te.get("min", 1) != 1 or te.get("max", 1) != 1:
                raise ValueError("ShExJ: cardinality on EachOf groups is unsupported")
            out: list[str] = []
            for x in te["expressions"]:
                out.extend(self._each_of(x))
            return out
        if t == "OneOf":
            raise ValueError(
                "ShExJ: OneOf nested inside EachOf is unsupported "
                "(OneOf must be the whole shape body — the ShExC `|` position)"
            )
        raise ValueError(f"ShExJ: unsupported triple expression type {t!r}")

    def shape_body(self, e: dict) -> str:
        mods = ""
        if e.get("closed"):
            mods += "CLOSED "
        if e.get("extra"):
            mods += "EXTRA " + " ".join(_iri(p) for p in e["extra"]) + " "
        expr = e.get("expression")
        if expr is None:
            return mods + "{ }"
        if isinstance(expr, dict) and expr.get("type") == "OneOf":
            if expr.get("id") is not None:
                raise ValueError("ShExJ: labeled triple expressions are unsupported")
            if expr.get("min", 1) != 1 or expr.get("max", 1) != 1:
                raise ValueError("ShExJ: cardinality on OneOf groups is unsupported")
            alts = [" ; ".join(self._each_of(x)) for x in expr["expressions"]]
            return mods + "{ " + " | ".join(alts) + " }"
        return mods + "{ " + " ; ".join(self._each_of(expr)) + " }"

    def declaration(self, sid: str, e: Any) -> str:
        """One top-level shape declaration."""
        if isinstance(e, str):
            return f"{_iri(sid)} @{_iri(e)}"  # pure alias
        t = e.get("type")
        if t == "Shape":
            return f"{_iri(sid)} {self.shape_body(e)}"
        if t == "ShapeAnd":
            parts = []
            for x in e["shapeExprs"]:
                if isinstance(x, dict) and x.get("type") == "Shape":
                    parts.append(self.shape_body(x))
                else:
                    parts.append(self.value_expr(x))
            return f"{_iri(sid)} " + " AND ".join(parts)
        # NodeConstraint / ShapeOr / ShapeNot print exactly as in value
        # position (bare node-constraint shape, shape-level OR, …)
        return f"{_iri(sid)} {self.value_expr(e)}"


def shexj_to_shexc(doc: dict | str) -> str:
    """Convert a ShExJ document (JSON text or parsed object) to ShExC text
    targeting this engine's ShExC subset.  Raises ``ValueError`` on
    malformed or out-of-subset input."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    if not isinstance(doc, dict) or doc.get("type") != "Schema":
        raise ValueError('ShExJ: top-level object must have "type": "Schema"')
    if doc.get("imports"):
        raise ValueError("ShExJ: import is not supported in this subset")
    p = _Printer()
    lines: list[str] = []
    start = doc.get("start")
    if isinstance(start, str):
        lines.append(f"start = @{_iri(start)}")
    elif isinstance(start, dict):
        lines.append("start = @<urn:shexj:start>")
        lines.append(p.declaration("urn:shexj:start", start))
    for decl in doc.get("shapes", []):
        if decl.get("type") == "ShapeDecl":  # ShEx 2.1 wrapper
            sid, expr = decl["id"], decl["shapeExpr"]
        else:  # ShEx 2.0: the expression carries its own id
            decl = dict(decl)
            sid = decl.pop("id")
            expr = decl
        if sid is None:
            raise ValueError("ShExJ: every top-level shape needs an id")
        lines.append(p.declaration(sid, expr))
    lines.extend(p.synthetic)
    return "\n".join(lines) + "\n"


def parse_shexj(text: str | dict) -> CompiledSchema:
    """Parse a ShExJ schema into the shared constraint IR (via the ShExC
    printer, so both syntaxes share one lowering pipeline)."""
    return parse_shexc(shexj_to_shexc(text))
