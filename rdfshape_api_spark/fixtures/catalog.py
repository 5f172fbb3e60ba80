"""Third golden fixture family: the *catalog* domain.

Exercises ShEx **EachOf with repeated properties** (partition-matching
semantics — each triple matched by exactly one constraint of the group;
reference semantics behind the shexs engine, SchemaValidate.scala:97-99)
under construction-time goldens + the driver's DuckDB oracle gate:

* ``ex:label`` appears twice with OVERLAPPING value exprs (MINLENGTH 3
  vs PATTERN "^sku:") and different cardinalities — a greedy count
  mis-assigns; only transportation feasibility gets these right;
* a plain single-constraint predicate (``ex:code xsd:integer``) next to
  the repeated group.

Golden verdicts mirror the engine's Hoffman feasibility conditions in
plain Python.  Deterministic (seed=11); same docs-table schema as the
sensor/social families.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from rdfshape_api_spark.fixtures.generator import FIXTURES_ROOT

SEED = 11
EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
CATALOG_VERSION = "v2"

SF_DOCS = {"sf0.001": 250, "sf0.01": 2_500, "sf0.1": 25_000}

SHEX_ITEM = f"""\
PREFIX ex: <{EX}>
PREFIX xsd: <{XSD}>

ex:ItemShape {{
  ex:label MINLENGTH 3 ;
  ex:label PATTERN "^sku:" ? ;
  ex:code xsd:integer
}}
"""

SHAPEMAP_ITEM = "{FOCUS a ex:Item}@ex:ItemShape"

_WORDS = ["ab", "nut", "bolt", "widget", "flange", "x", "gear", "spring"]


class _Item:
    __slots__ = ("node", "labels", "codes")

    def __init__(self, node: str):
        self.node = node
        self.labels: list[str] = []
        self.codes: list[tuple[str, bool]] = []  # (lexical, is_integer_typed)


def _feasible_labels(labels: list[str]) -> bool:
    """Python mirror of the engine's transportation feasibility for the
    2-constraint label group: A = MINLENGTH 3 {1,1}, B = ^sku: {0,1}."""
    n11 = n10 = n01 = n00 = 0
    for v in labels:
        a, b = len(v) >= 3, v.startswith("sku:")
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    if n00:
        return False
    for x in range(n11 + 1):  # 'both' values assigned to A
        t1, t2 = n10 + x, n01 + (n11 - x)
        if t1 == 1 and t2 <= 1:
            return True
    return False


def _conformant(item: _Item) -> bool:
    # RDF graphs are SETS of triples: duplicate label/code values in the
    # serialized doc collapse on extraction, so the golden rule works on
    # the deduplicated value sets
    codes = list(dict.fromkeys(item.codes))
    codes_ok = len(codes) == 1 and codes[0][1]
    return codes_ok and _feasible_labels(list(dict.fromkeys(item.labels)))


def _gen_doc(j: int) -> list[_Item]:
    rng = random.Random(SEED * 7_777_777 + j)
    items = []
    for k in range(2 + j % 3):
        it = _Item(f"{EX}item{j}_{k}")
        for _ in range(rng.randrange(4)):
            w = rng.choice(_WORDS)
            it.labels.append(f"sku:{w}" if rng.random() < 0.45 else w)
        n_codes = rng.choices([0, 1, 2], weights=[1, 7, 1])[0]
        for c in range(n_codes):
            if rng.random() < 0.85:
                it.codes.append((str(1000 * j + k + c), True))
            else:
                it.codes.append((f"C-{j}-{k}", False))  # string code → fail
        items.append(it)
    return items


def _render_ntriples(items: list[_Item]) -> str:
    out = []
    for it in items:
        s = f"<{it.node}>"
        out.append(f"{s} <{RDF_TYPE}> <{EX}Item> .")
        for v in it.labels:
            out.append(f'{s} <{EX}label> "{v}" .')
        for lex, typed in it.codes:
            if typed:
                out.append(f'{s} <{EX}code> "{lex}"^^<{XSD}integer> .')
            else:
                out.append(f'{s} <{EX}code> "{lex}" .')
    return "\n".join(out) + "\n"


def _render_turtle(items: list[_Item]) -> str:
    lines = [f"@prefix ex: <{EX}> .", f"@prefix xsd: <{XSD}> ."]
    for it in items:
        props = ["a ex:Item"]
        for v in it.labels:
            props.append(f'ex:label "{v}"')
        for lex, typed in it.codes:
            props.append(f'ex:code "{lex}"^^xsd:integer' if typed else f'ex:code "{lex}"')
        lines.append(f"ex:{it.node[len(EX):]} " + " ;\n    ".join(props) + " .")
    return "\n".join(lines) + "\n"


def _golden(items: list[_Item], doc_sha: str):
    triples, verdicts = [], []
    for it in items:
        s = it.node
        triples.append((doc_sha, s, RDF_TYPE, "iri", EX + "Item", None, None))
        for v in dict.fromkeys(it.labels):
            triples.append((doc_sha, s, EX + "label", "literal", v, None, None))
        for lex, typed in dict.fromkeys(it.codes):
            triples.append(
                (doc_sha, s, EX + "code", "literal", lex, None,
                 XSD + "integer" if typed else None)
            )
        verdicts.append(
            (doc_sha, s, "shex_item",
             "conformant" if _conformant(it) else "nonconformant")
        )
    return triples, verdicts


def generate_catalog(sf_tag: str, out_dir: str) -> dict[str, str]:
    n_docs = SF_DOCS[sf_tag]
    marker = os.path.join(out_dir, f".complete-{CATALOG_VERSION}-{n_docs}")
    paths = {
        "docs": os.path.join(out_dir, "catalog_documents.parquet"),
        "triples": os.path.join(out_dir, "catalog_expected_triples.parquet"),
        "verdicts": os.path.join(out_dir, "catalog_expected_verdicts.parquet"),
    }
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    doc_cols = {k: [] for k in ("repo", "path", "commit", "lang", "content", "content_sha256")}
    triple_rows: list[tuple] = []
    verdict_rows: list[tuple] = []
    for j in range(n_docs):
        rng = random.Random(SEED * 37 + j)
        items = _gen_doc(j)
        if rng.random() < 0.5:
            lang, ext, content = "turtle", "ttl", _render_turtle(items)
        else:
            lang, ext, content = "ntriples", "nt", _render_ntriples(items)
        doc_sha = hashlib.sha256(content.encode()).hexdigest()
        doc_cols["repo"].append(f"catalog/shop{j % 11}")
        doc_cols["path"].append(f"items/{j:05d}.{ext}")
        doc_cols["commit"].append(hashlib.sha1(f"{SEED}:{j}".encode()).hexdigest())
        doc_cols["lang"].append(lang)
        doc_cols["content"].append(content)
        doc_cols["content_sha256"].append(doc_sha)
        t, v = _golden(items, doc_sha)
        triple_rows.extend(t)
        verdict_rows.extend(v)

    pq.write_table(pa.table(doc_cols), paths["docs"], row_group_size=4096)
    t_cols = ["doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"]
    pq.write_table(
        pa.table({c: [r[i] for r in triple_rows] for i, c in enumerate(t_cols)},
                 schema=pa.schema([(c, pa.string()) for c in t_cols])),
        paths["triples"],
    )
    v_cols = ["doc_sha256", "node", "shape_id", "status"]
    pq.write_table(
        pa.table({c: [r[i] for r in verdict_rows] for i, c in enumerate(v_cols)},
                 schema=pa.schema([(c, pa.string()) for c in v_cols])),
        paths["verdicts"],
    )
    with open(os.path.join(out_dir, "shex_item.shex"), "w") as f:
        f.write(SHEX_ITEM)
    with open(marker, "w") as f:
        f.write("ok\n")
    return paths


def ensure_catalog(sf: str) -> dict[str, str]:
    tag = sf if sf in SF_DOCS else None
    if tag is None:
        base = os.path.basename(os.path.normpath(sf))
        tag = base if base in SF_DOCS else "sf0.01"
    return generate_catalog(tag, os.path.join(FIXTURES_ROOT, f"catalog_{tag}"))
