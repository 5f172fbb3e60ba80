"""Schema conversion + info (SURVEY §2.2 K3, §2.4 A4).

Reference: ``SchemaConvert.schemaConvert`` (same-engine format conversion,
``modules/server/.../schema/logic/operations/SchemaConvert.scala:69-105``),
SHACL→ShEx via ``Shacl2ShEx.shacl2ShEx`` (:203-232), and ShEx→SHACL
explicitly **not implemented** in the reference (:183-186) — this engine
EXCEEDS the reference there: the shared IR makes the reverse direction an
engine flip + renderable-subset guard (see :func:`shex_to_shacl`).  ``SchemaInfo`` extracts shape list + prefix map
(``SchemaInfo.scala:33-46``); ``ShapeMapInfo`` counts associations
(``ShapeMapInfo.scala:34-56``).

Because both frontends compile to one constraint-record IR
(``plans/ir.py``), engine conversion is a relabel + re-render: the IR *is*
the normalized schema.  Everything here is driver-side (schemas are
KB-sized, never data-sized).
"""

from __future__ import annotations

from rdfshape_api_spark.plans.ir import CompiledSchema, Shape, TripleConstraint

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
SH = "http://www.w3.org/ns/shacl#"


def shacl_to_shex(schema: CompiledSchema) -> CompiledSchema:
    """SHACL → ShEx on the IR (Shacl2ShEx.shacl2ShEx call contract,
    SchemaConvert.scala:203-232).  Target declarations have no ShEx
    equivalent — they move to the validation trigger (shapemap side), so
    conversion drops them; constraint records carry over unchanged."""
    if schema.engine != "shacl":
        raise ValueError(f"expected a shacl schema, got {schema.engine!r}")
    shapes = {
        sid: Shape(shape_id=sid, constraints=list(sh.constraints), closed=sh.closed)
        for sid, sh in schema.shapes.items()
    }
    return CompiledSchema(engine="shex", shapes=shapes, prefixes=dict(schema.prefixes))


def shex_to_shacl(schema: CompiledSchema) -> CompiledSchema:
    """ShEx → SHACL on the shared IR — an engine EXTENSION beyond the
    reference, which refuses this direction ('conversion from ShEx to
    SHACL is not implemented', SchemaConvert.scala:183-186).

    The two engines share one constraint IR here, so the conversion is an
    engine flip plus a renderable-subset guard: the result must survive
    ``to_shacl_turtle`` → ``parse_shacl`` with identical verdicts.
    Mappings:

    * triple constraints → sh:property (datatype / nodeKind / sh:in /
      numeric facets / pattern / length / languageIn / sh:node carry over
      verbatim — same IR fields);
    * cardinality → sh:minCount / sh:maxCount;
    * ``EXTRA p`` → sh:qualifiedValueShape + qualifiedMin/MaxCount (both
      compile to the same count-only verdict, validate.py: the
      ``tc.extra or tc.qualified`` branch);
    * CLOSED → sh:closed;
    * value-level OR / NOT / AND trees → sh:or / sh:not / sh:and (the
      SHACL frontend reads them back recursively).

    Out of the renderable subset (clean rejects): OneOf alternatives and
    repeated-predicate EachOf groups (SHACL property shapes conjoin — no
    partition matching), shape-level node constraints / conjunct / disjunct
    refs (no SHACL core counterpart read by this frontend), value-set
    stems / exclusions / wildcards / language members (sh:in is an
    enumerated list).
    """
    if schema.engine != "shex":
        raise ValueError(f"expected a shex schema, got {schema.engine!r}")

    def _check_node(n: TripleConstraint, where: str) -> None:
        if (n.disjuncts or n.conjuncts) and any(
            getattr(n, f) not in (None, False)
            for f in (
                "datatype", "node_kind", "value_set", "min_inclusive",
                "max_inclusive", "min_exclusive", "max_exclusive",
                "pattern", "min_length", "max_length", "language_in",
                "ref_shape", "class_iri",
            )
        ):
            # the renderer emits sh:or/sh:and ALONE for structural nodes;
            # direct fields alongside would be silently dropped — the ShEx
            # frontend never produces this shape (fields distribute into
            # disjuncts at parse time), so reject defensively
            raise ValueError(
                f"ShEx->SHACL: direct value fields alongside a nested "
                f"disjunction/conjunction on {where} do not render"
            )
        if n.value_set_has_wildcard or n.value_set_excl:
            raise ValueError(
                f"ShEx->SHACL: value-set wildcard/exclusions on {where} "
                "have no sh:in equivalent"
            )
        for kind, _ in n.value_set or []:
            if kind not in ("iri", "literal"):
                raise ValueError(
                    f"ShEx->SHACL: value-set {kind} member on {where} has "
                    "no sh:in equivalent"
                )
        for d in n.disjuncts or []:
            _check_node(d, where)
        for m in n.conjuncts or []:
            _check_node(m, where)

    shapes: dict[str, Shape] = {}
    for sid, sh in schema.shapes.items():
        if sh.alternatives is not None:
            raise ValueError(
                "ShEx->SHACL: OneOf alternatives have no SHACL core "
                f"counterpart (shape {sid})"
            )
        if sh.node_constraint is not None or sh.conjunct_refs or sh.disjunct_refs:
            raise ValueError(
                "ShEx->SHACL: shape-level node constraints / shape-ref "
                f"algebra have no SHACL core counterpart (shape {sid})"
            )
        preds = [tc.pred for tc in sh.constraints]
        if len(set(preds)) != len(preds):
            raise ValueError(
                "ShEx->SHACL: repeated-predicate EachOf groups use "
                "partition matching — SHACL property shapes conjoin "
                f"(shape {sid})"
            )
        out_tcs: list[TripleConstraint] = []
        for tc in sh.constraints:
            _check_node(tc, f"{sid} / {tc.pred}")
            c = _tc_deep_copy(tc)
            if c.extra:
                c.extra = False
                c.qualified = True
            out_tcs.append(c)
        shapes[sid] = Shape(
            shape_id=sid, constraints=out_tcs, closed=sh.closed,
            ignored=list(sh.ignored),
        )
    return CompiledSchema(engine="shacl", shapes=shapes, prefixes=dict(schema.prefixes))


def _tc_deep_copy(tc: TripleConstraint) -> TripleConstraint:
    import copy as _copy

    return _copy.deepcopy(tc)


def _pname(iri: str, prefixes: dict[str, str]) -> str:
    for p, ns in sorted(prefixes.items(), key=lambda kv: -len(kv[1])):
        if iri.startswith(ns) and "/" not in iri[len(ns):] and "#" not in iri[len(ns):]:
            return f"{p}:{iri[len(ns):]}"
    return f"<{iri}>"


def _card(tc: TripleConstraint) -> str:
    mn, mx = tc.min_count, tc.max_count
    if (mn, mx) == (1, 1):
        return ""
    if (mn, mx) == (0, 1):
        return " ?"
    if mn == 0 and mx is None:
        return " *"
    if mn == 1 and mx is None:
        return " +"
    if mx is None:
        return f" {{{mn},}}"
    return f" {{{mn},{mx}}}"


def _value_expr(tc: TripleConstraint, prefixes: dict[str, str]) -> str:
    if tc.conjuncts:
        neg = "NOT " if tc.negated else ""
        return neg + " AND ".join(
            f"({_value_expr(m, prefixes)})" for m in tc.conjuncts
        )
    if tc.disjuncts:
        body = " OR ".join(_value_expr(d, prefixes) for d in tc.disjuncts)
        return f"NOT ({body})" if tc.negated else body
    neg = "NOT " if tc.negated else ""
    parts: list[str] = []
    if tc.value_set is not None:
        def _member(k: str, v: str) -> str:
            if k == "literal":
                return f'"{v}"'
            if k == "literal_stem":
                return f'"{v}"~'
            if k == "iri_stem":
                return f"{_pname(v, prefixes)}~"
            if k == "lang":
                return f"@{v}"
            if k == "lang_stem":
                return f"@{v}~"
            return _pname(v, prefixes)
        toks = (["."] if tc.value_set_has_wildcard else []) + [
            _member(k, v) for k, v in tc.value_set
        ] + [f"- {_member(k, v)}" for k, v in (tc.value_set_excl or [])]
        parts.append(f"[ {' '.join(toks)} ]")
    # independent appends, NOT an elif chain: one carrier can conjoin a
    # datatype/nodeKind/value set with a shape reference (`xsd:string AND
    # @ex:A`) — an exclusive chain silently dropped the reference
    if tc.datatype:
        parts.append(_pname(tc.datatype, prefixes))
    if tc.node_kind:
        parts.append(tc.node_kind.upper() if tc.node_kind != "nonliteral" else "NONLITERAL")
    if tc.ref_shape:
        parts.append(f"@{_pname(tc.ref_shape, prefixes)}")
    if not parts:
        parts.append(".")
    for attr, kw in (
        ("min_inclusive", "MININCLUSIVE"),
        ("max_inclusive", "MAXINCLUSIVE"),
        ("min_exclusive", "MINEXCLUSIVE"),
        ("max_exclusive", "MAXEXCLUSIVE"),
        ("min_length", "MINLENGTH"),
        ("max_length", "MAXLENGTH"),
    ):
        v = getattr(tc, attr)
        if v is not None:
            parts.append(f"{kw} {int(v) if float(v).is_integer() else v}")
    if tc.pattern:
        # spec REGEXP form with `/` escaped — self-round-trips through the
        # tokenizer's regexp token
        parts.append(f"/{tc.pattern.replace('/', chr(92) + '/')}/")
    return neg + " ".join(parts)


def to_shexc(schema: CompiledSchema) -> str:
    """Render a compiled schema (either engine's IR) to ShExC text — the
    reference's default conversion target (ShExFormat.scala:26)."""
    lines = [f"PREFIX {p}: <{ns}>" for p, ns in sorted(schema.prefixes.items())]
    if lines:
        lines.append("")
    if schema.start is not None:
        lines.append(f"start = @{_pname(schema.start, schema.prefixes)}")
        lines.append("")
    def _ref_name(r: str) -> str:
        return "@" + (_pname(r, schema.prefixes) if r.startswith("http") else f"<{r}>")

    for sid in sorted(schema.shapes):
        sh = schema.shapes[sid]
        head = _pname(sid, schema.prefixes) if sid.startswith("http") else f"<{sid}>"
        mods = []
        if any(tc.extra for tc in sh.constraints):
            mods.append("EXTRA " + " ".join(
                _pname(tc.pred, schema.prefixes) for tc in sh.constraints if tc.extra
            ))
        if sh.closed:
            mods.append("CLOSED")
        # shape-level prefix: node constraint, conjunct refs (`@Base AND`),
        # ShapeOr of refs — ANDed before the braced body (semantics-
        # preserving; a multi-ref conjunction re-parses through a synthetic
        # conjunct shape, structurally different but equivalent)
        pre_parts = []
        if sh.node_constraint is not None:
            nc_txt = _value_expr(sh.node_constraint, schema.prefixes).strip()
            if nc_txt and nc_txt != ".":
                pre_parts.append(nc_txt)
        pre_parts += [_ref_name(r) for r in sh.conjunct_refs]
        if sh.disjunct_refs:
            if sh.disjunct_refs_xone:
                raise ValueError(
                    "SHACL->ShEx: node-shape-level sh:xone over shape "
                    f"members has no ShExC counterpart (shape {sid})"
                )
            pre_parts.append(" OR ".join(_ref_name(r) for r in sh.disjunct_refs))
        if sh.conjunct_classes or sh.negated_refs or sh.negated_classes:
            raise ValueError(
                "SHACL->ShEx: node-shape-level sh:class / negated shape "
                f"members have no ShExC counterpart (shape {sid})"
            )
        pre = " AND ".join(pre_parts)
        if not (sh.constraints or sh.alternatives is not None or mods) and pre:
            # bodyless shape (bare node constraint / alias / ShapeOr)
            lines.append(f"{head} {pre}")
            lines.append("")
            continue
        lines.append(
            f"{head} {pre + ' AND ' if pre else ''}"
            f"{' '.join(mods) + ' ' if mods else ''}{{"
        )

        def _group(tcs) -> str:
            return " ;\n".join(
                f"  {'^' if tc.inverse else ''}"
                f"{'a' if tc.pred == RDF_TYPE else _pname(tc.pred, schema.prefixes)} "
                f"{_value_expr(tc, schema.prefixes)}{_card(tc)}"
                for tc in tcs
            )

        if sh.alternatives is not None:
            lines.append(" |\n".join(_group(g) for g in sh.alternatives))
        else:
            lines.append(_group(sh.constraints))
        lines.append("}")
        lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def _shacl_components(tc: TripleConstraint, pm: dict[str, str], indent: int) -> list[str]:
    """Value-level SHACL component lines for one node of the value tree,
    recursive through sh:or / sh:xone / sh:and / sh:not — mirrors exactly
    what the SHACL frontend reads back (``_read_value_constraints``), so
    render → parse round-trips."""
    ind = " " * indent

    def _nested(n: TripleConstraint) -> str:
        body = _shacl_components(n, pm, indent + 4)
        return "[ " + " ; ".join(x.strip() for x in body) + " ]" if body else "[ ]"

    out: list[str] = []
    inner = tc
    if tc.negated:
        # NOT wraps the node's whole value expression: sh:not [ … ]
        import copy as _copy

        inner = _copy.copy(tc)
        inner.negated = False
        return [f"{ind}sh:not {_nested(inner)}"]
    if tc.conjuncts:
        members = " ".join(_nested(m) for m in tc.conjuncts)
        return [f"{ind}sh:and ( {members} )"]
    if tc.disjuncts:
        comp = "sh:xone" if tc.xone else "sh:or"
        members = " ".join(_nested(d) for d in tc.disjuncts)
        return [f"{ind}{comp} ( {members} )"]
    if tc.datatype:
        out.append(f"{ind}sh:datatype {_pname(tc.datatype, pm)}")
    if tc.node_kind:
        nk = {"iri": "sh:IRI", "bnode": "sh:BlankNode", "literal": "sh:Literal",
              "nonliteral": "sh:BlankNodeOrIRI"}[tc.node_kind]
        out.append(f"{ind}sh:nodeKind {nk}")
    if tc.value_set is not None:
        vals = " ".join(
            (f'"{v}"' if k == "literal" else _pname(v, pm)) for k, v in tc.value_set
        )
        out.append(f"{ind}sh:in ( {vals} )")
    if tc.min_inclusive is not None:
        out.append(f"{ind}sh:minInclusive {_numlex(tc.min_inclusive)}")
    if tc.max_inclusive is not None:
        out.append(f"{ind}sh:maxInclusive {_numlex(tc.max_inclusive)}")
    if tc.min_exclusive is not None:
        out.append(f"{ind}sh:minExclusive {_numlex(tc.min_exclusive)}")
    if tc.max_exclusive is not None:
        out.append(f"{ind}sh:maxExclusive {_numlex(tc.max_exclusive)}")
    if tc.pattern:
        out.append(f'{ind}sh:pattern "{tc.pattern}"')
    if tc.min_length is not None:
        out.append(f"{ind}sh:minLength {tc.min_length}")
    if tc.max_length is not None:
        out.append(f"{ind}sh:maxLength {tc.max_length}")
    if tc.language_in is not None:
        tags = " ".join(f'"{t}"' for t in tc.language_in)
        out.append(f"{ind}sh:languageIn ( {tags} )")
    if tc.ref_shape:
        out.append(f"{ind}sh:node {_pname(tc.ref_shape, pm)}")
    if tc.class_iri:
        out.append(f"{ind}sh:class {_pname(tc.class_iri, pm)}")
    return out


def to_shacl_turtle(schema: CompiledSchema) -> str:
    """Render the IR to SHACL Turtle (same-engine format conversion path,
    SchemaConvert.scala:69-105)."""
    pm = dict(schema.prefixes)
    pm.setdefault("sh", SH)
    pm.setdefault("xsd", XSD)
    lines = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(pm.items())]
    lines.append("")
    for sid in sorted(schema.shapes):
        sh = schema.shapes[sid]
        head = _pname(sid, pm)
        props = ["  a sh:NodeShape"]
        for cls in sh.target_class:
            props.append(f"  sh:targetClass {_pname(cls, pm)}")
        for n in sh.target_node:
            props.append(f"  sh:targetNode {_pname(n, pm)}")
        for p_ in sh.target_subjects_of:
            props.append(f"  sh:targetSubjectsOf {_pname(p_, pm)}")
        for p_ in sh.target_objects_of:
            props.append(f"  sh:targetObjectsOf {_pname(p_, pm)}")
        if sh.closed:
            props.append("  sh:closed true")
        for tc in sh.constraints:
            path = (
                f"[ sh:inversePath {_pname(tc.pred, pm)} ]"
                if tc.inverse
                else _pname(tc.pred, pm)
            )
            c = [f"    sh:path {path}"]
            if tc.qualified:
                body = _shacl_components(tc, pm, indent=6)
                c.append(
                    "    sh:qualifiedValueShape [\n"
                    + " ;\n".join(body)
                    + " ;\n    ]"
                )
                if tc.min_count:
                    c.append(f"    sh:qualifiedMinCount {tc.min_count}")
                if tc.max_count is not None:
                    c.append(f"    sh:qualifiedMaxCount {tc.max_count}")
            else:
                c.extend(_shacl_components(tc, pm, indent=4))
                if tc.min_count:
                    c.append(f"    sh:minCount {tc.min_count}")
                if tc.max_count is not None:
                    c.append(f"    sh:maxCount {tc.max_count}")
            props.append("  sh:property [\n" + " ;\n".join(c) + " ;\n  ]")
        lines.append(f"{head}\n" + " ;\n".join(props) + " .")
        lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def _numlex(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else str(v)


def schema_info(schema: CompiledSchema) -> dict:
    """SchemaInfo result model (SchemaInfo.scala:33-46): shape list +
    prefix map."""
    return {
        "engine": schema.engine,
        "shapes": sorted(schema.shapes),
        "n_shapes": len(schema.shapes),
        "prefix_map": dict(schema.prefixes),
    }


def shapemap_info(shapemap_text: str, prefixes: dict[str, str]) -> dict:
    """ShapeMapInfo result model (ShapeMapInfo.scala:34-56): association
    count + the parsed associations."""
    from rdfshape_api_spark.plans.shapemap import parse_shapemap

    assocs = parse_shapemap(shapemap_text, prefixes)
    return {
        "n_associations": len(assocs),
        "associations": [
            {
                "selector_kind": a.kind,
                "node": a.node,
                "query_pred": a.query_pred,
                "query_obj": a.query_obj,
                "shape": a.shape,
            }
            for a in assocs
        ],
    }


def schema_to_uml(schema: CompiledSchema) -> dict:
    """Schema→UML conversion (SchemaConvert.scala:246,286-299: the
    reference lifts either engine's schema through ``Schema2UML.schema2UML``
    to a UML model it then renders as SVG/PNG).  This is the UML *model* —
    one class per shape, attribute entries per non-reference triple
    constraint, and association links per shape reference — as plain JSON;
    rendering is :func:`uml_to_dot` (Graphviz raster stays out of scope,
    same boundary as the data→DOT path).

    Driver-side by design: a schema is KB-sized request metadata, never
    distributed data.
    """
    classes = []
    for sid in sorted(schema.shapes):
        sh = schema.shapes[sid]
        entries: list[dict] = []
        links: list[dict] = []

        def _tc_card(tc: TripleConstraint) -> str:
            c = _card(tc).strip()
            return c if c else "{1}"

        tcs = list(sh.constraints)
        for alt in sh.alternatives or []:
            tcs.extend(alt)
        for tc in tcs:
            refs = [d.ref_shape for d in (tc.disjuncts or []) if d.ref_shape]
            if tc.ref_shape:
                refs.append(tc.ref_shape)
            for ref in refs:
                links.append(
                    {
                        "name": _pname(tc.pred, schema.prefixes),
                        "target": ref,
                        "card": _tc_card(tc),
                    }
                )
            if not refs:
                entries.append(
                    {
                        "name": _pname(tc.pred, schema.prefixes),
                        "type": _value_expr(tc, schema.prefixes),
                        "card": _tc_card(tc),
                    }
                )
        for ref in sh.conjunct_refs or []:
            links.append({"name": "extends", "target": ref, "card": "{1}"})
        for ref in sh.disjunct_refs or []:
            links.append(
                {
                    "name": "xone" if sh.disjunct_refs_xone else "or",
                    "target": ref,
                    "card": "{1}",
                }
            )
        for ref in sh.negated_refs or []:
            links.append({"name": "not", "target": ref, "card": "{1}"})
        for cls in sh.conjunct_classes or []:
            links.append({"name": "class", "target": cls, "card": "{1}"})
        for cls in sh.negated_classes or []:
            links.append({"name": "not-class", "target": cls, "card": "{1}"})
        classes.append(
            {
                "id": sid,
                "label": _pname(sid, schema.prefixes),
                "closed": sh.closed,
                "entries": entries,
                "links": links,
            }
        )
    return {"engine": schema.engine, "classes": classes}


def uml_to_dot(uml: dict) -> str:
    """Render a :func:`schema_to_uml` model as DOT text: record-shaped
    class nodes (label | field rows) and labeled association edges — the
    textual equivalent of the reference's UML SVG output."""

    def _esc(s: str) -> str:
        for ch in ('\\', '"', "{", "}", "|", "<", ">"):
            s = s.replace(ch, "\\" + ch)
        return s

    ids = {c["id"]: f"C{i}" for i, c in enumerate(uml["classes"])}
    out = ["digraph uml {", "  node [shape=record];"]
    for c in uml["classes"]:
        rows = [_esc(c["label"]) + (" (closed)" if c["closed"] else "")]
        rows += [
            _esc(f"{e['name']} : {e['type']} {e['card']}") for e in c["entries"]
        ]
        out.append(f'  {ids[c["id"]]} [label="{{{"|".join(rows)}}}"];')
    for c in uml["classes"]:
        for l in c["links"]:
            tgt = ids.get(l["target"])
            if tgt is None:  # dangling ref — rendered as its own node name
                tgt = f'"{_esc(l["target"])}"'
            out.append(
                f'  {ids[c["id"]]} -> {tgt} [label="{_esc(l["name"] + " " + l["card"])}"];'
            )
    out.append("}")
    return "\n".join(out)
