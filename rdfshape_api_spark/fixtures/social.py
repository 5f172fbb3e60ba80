"""Second golden fixture family: the *social* domain.

Exercises, under construction-time goldens + the driver's DuckDB oracle
gate, the features the sensor domain doesn't reach:

* **ShEx OneOf** — contact alternatives (email+verified | phone+country);
* **recursive shape references** — ``ex:knows @ex:PersonShape *`` with
  in-document cycles (golden verdicts via the same greatest-fixpoint rule);
* **N-Quads and TriG** inputs (graph labels dropped on extraction) next to
  Turtle/N-Triples;
* blank-node persons inside recursion (skolem IDs feed the @ref join).

Deterministic (seed=7); same docs-table schema as the sensor family.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from rdfshape_api_spark.fixtures.generator import FIXTURES_ROOT, skolem

SEED = 7
EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SOCIAL_VERSION = "v1"

SF_DOCS = {"sf0.001": 300, "sf0.01": 3_000, "sf0.1": 30_000}

# OneOf + recursion — the advanced-feature schema (common part duplicated
# per alternative: '|' splits the whole shape body)
SHEX_PERSON = f"""\
PREFIX ex: <{EX}>

ex:PersonShape {{
  ex:name . ;
  ex:knows @ex:PersonShape * ;
  ex:email . ;
  ex:verified [ "true" ] |
  ex:name . ;
  ex:knows @ex:PersonShape * ;
  ex:phone . ;
  ex:country .
}}
"""

SHAPEMAP_PERSON = "{FOCUS a ex:Person}@ex:PersonShape"


class _Person:
    __slots__ = ("node", "is_bnode", "name", "email", "verified", "phone", "country", "knows")

    def __init__(self, node, is_bnode):
        self.node = node
        self.is_bnode = is_bnode
        self.name = None
        self.email = None
        self.verified = None  # "true"/"false"
        self.phone = None
        self.country = None
        self.knows: list[int] = []  # indices into the doc's person list

    def base_ok(self) -> bool:
        if self.name is None:
            return False
        alt1 = self.email is not None and self.verified == "true"
        alt2 = self.phone is not None and self.country is not None
        return alt1 or alt2


def _gen_doc(j: int) -> list[_Person]:
    rng = random.Random(SEED * 9_999_991 + j)
    n = 3 + j % 4
    persons = []
    for k in range(n):
        if rng.random() < 0.12:
            p = _Person(f"_:p{k}", True)  # labels collide across docs
        else:
            p = _Person(f"{EX}person{j}_{k}", False)
        if rng.random() < 0.9:
            p.name = f"Person {j}-{k}"
        branch = rng.random()
        if branch < 0.45:  # email branch
            p.email = f"p{j}_{k}@example.org"
            p.verified = "true" if rng.random() < 0.7 else "false"
        elif branch < 0.8:  # phone branch
            p.phone = f"+32-{j}-{k}"
            if rng.random() < 0.85:
                p.country = "BE"
        # else: no contact info → nonconformant
        persons.append(p)
    # knows edges, including deliberate cycles
    for k, p in enumerate(persons):
        for _ in range(rng.randrange(3)):
            t = rng.randrange(n)
            if t != k and t not in p.knows:
                p.knows.append(t)
    if n >= 2 and rng.random() < 0.5:  # explicit 2-cycle
        if 1 not in persons[0].knows:
            persons[0].knows.append(1)
        if 0 not in persons[1].knows:
            persons[1].knows.append(0)
    return persons


def _conformant_set(persons: list[_Person]) -> set[int]:
    """Greatest fixpoint: conf(p) = base_ok(p) ∧ ∀q∈knows(p): conf(q)."""
    conf = {k for k, p in enumerate(persons) if p.base_ok()}
    while True:
        nxt = {k for k in conf if all(t in conf for t in persons[k].knows)}
        if nxt == conf:
            return conf
        conf = nxt


def _term(p: _Person) -> str:
    return p.node if p.is_bnode else f"<{p.node}>"


def _render_ntriples(persons: list[_Person]) -> list[str]:
    out = []
    for p in persons:
        s = _term(p)
        out.append(f"{s} <{RDF_TYPE}> <{EX}Person> .")
        if p.name is not None:
            out.append(f'{s} <{EX}name> "{p.name}" .')
        if p.email is not None:
            out.append(f'{s} <{EX}email> "{p.email}" .')
        if p.verified is not None:
            out.append(f'{s} <{EX}verified> "{p.verified}" .')
        if p.phone is not None:
            out.append(f'{s} <{EX}phone> "{p.phone}" .')
        if p.country is not None:
            out.append(f'{s} <{EX}country> "{p.country}" .')
        for t in p.knows:
            out.append(f"{s} <{EX}knows> {_term(persons[t])} .")
    return out


def _render_turtle(persons: list[_Person]) -> str:
    lines = [f"@prefix ex: <{EX}> ."]
    for p in persons:
        s = p.node if p.is_bnode else f"ex:{p.node[len(EX):]}"
        props = ["a ex:Person"]
        if p.name is not None:
            props.append(f'ex:name "{p.name}"')
        if p.email is not None:
            props.append(f'ex:email "{p.email}"')
        if p.verified is not None:
            props.append(f'ex:verified "{p.verified}"')
        if p.phone is not None:
            props.append(f'ex:phone "{p.phone}"')
        if p.country is not None:
            props.append(f'ex:country "{p.country}"')
        for t in p.knows:
            tp = persons[t]
            props.append(f"ex:knows {tp.node if tp.is_bnode else 'ex:' + tp.node[len(EX):]}")
        lines.append(s + " " + " ;\n    ".join(props) + " .")
    return "\n".join(lines) + "\n"


def _render_nquads(persons: list[_Person], j: int) -> str:
    g = f"<{EX}g/{j}>"
    return "\n".join(
        line[:-1].rstrip() + f" {g} ." for line in _render_ntriples(persons)
    ) + "\n"


def _render_trig(persons: list[_Person], j: int) -> str:
    body = _render_turtle(persons)
    prefix_line, rest = body.split("\n", 1)
    return f"{prefix_line}\nex:g{j} {{\n{rest}}}\n"


def _golden(persons: list[_Person], doc_sha: str):
    triples, verdicts = [], []
    conf = _conformant_set(persons)

    def node_of(p: _Person) -> str:
        return skolem(doc_sha, p.node) if p.is_bnode else p.node

    for k, p in enumerate(persons):
        s = node_of(p)
        triples.append((doc_sha, s, RDF_TYPE, "iri", EX + "Person", None, None))
        for pred, val in (
            ("name", p.name), ("email", p.email), ("verified", p.verified),
            ("phone", p.phone), ("country", p.country),
        ):
            if val is not None:
                triples.append((doc_sha, s, EX + pred, "literal", val, None, None))
        for t in p.knows:
            tp = persons[t]
            triples.append(
                (doc_sha, s, EX + "knows", "bnode" if tp.is_bnode else "iri",
                 node_of(tp), None, None)
            )
        verdicts.append(
            (doc_sha, s, "shex_person",
             "conformant" if k in conf else "nonconformant")
        )
    return triples, verdicts


def generate_social(sf_tag: str, out_dir: str) -> dict[str, str]:
    n_docs = SF_DOCS[sf_tag]
    marker = os.path.join(out_dir, f".complete-{SOCIAL_VERSION}-{n_docs}")
    paths = {
        "docs": os.path.join(out_dir, "social_documents.parquet"),
        "triples": os.path.join(out_dir, "social_expected_triples.parquet"),
        "verdicts": os.path.join(out_dir, "social_expected_verdicts.parquet"),
    }
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    doc_cols = {k: [] for k in ("repo", "path", "commit", "lang", "content", "content_sha256")}
    triple_rows: list[tuple] = []
    verdict_rows: list[tuple] = []
    for j in range(n_docs):
        rng = random.Random(SEED * 31 + j)
        persons = _gen_doc(j)
        roll = rng.random()
        if roll < 0.4:
            lang, ext, content = "turtle", "ttl", _render_turtle(persons)
        elif roll < 0.7:
            lang, ext, content = "ntriples", "nt", "\n".join(_render_ntriples(persons)) + "\n"
        elif roll < 0.85:
            lang, ext, content = "nquads", "nq", _render_nquads(persons, j)
        else:
            lang, ext, content = "trig", "trig", _render_trig(persons, j)
        doc_sha = hashlib.sha256(content.encode()).hexdigest()
        repo = f"social/org{j % 13}"
        doc_cols["repo"].append(repo)
        doc_cols["path"].append(f"people/{j:05d}.{ext}")
        doc_cols["commit"].append(hashlib.sha1(f"{SEED}:{j}".encode()).hexdigest())
        doc_cols["lang"].append(lang)
        doc_cols["content"].append(content)
        doc_cols["content_sha256"].append(doc_sha)
        t, v = _golden(persons, doc_sha)
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
    with open(os.path.join(out_dir, "shex_person.shex"), "w") as f:
        f.write(SHEX_PERSON)
    with open(marker, "w") as f:
        f.write("ok\n")
    return paths


def ensure_social(sf: str) -> dict[str, str]:
    tag = sf if sf in SF_DOCS else "sf0.01"
    if sf not in SF_DOCS:
        base = os.path.basename(os.path.normpath(sf))
        tag = base if base in SF_DOCS else "sf0.01"
    return generate_social(tag, os.path.join(FIXTURES_ROOT, f"social_{tag}"))
