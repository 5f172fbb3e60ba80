"""Fourth golden fixture family: HTML pages (RDFa-lite 1.1 + Microdata).

Covers SURVEY §2.1 S2 (reference: Any23-backed ``HtmlToRdf.scala:50-122``,
format surface ``HtmlFormat.scala:17-31``) under construction-time goldens:
each page's expected triples are computed alongside the rendered HTML, so
the driver's DuckDB oracle checks the extractor end-to-end including
blank-node skolemization (nested nodes use ``_:hN`` in extraction order —
mirrored by the generator's own counter).

Deterministic (seed=13); same docs-table schema as the other families.
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from rdfshape_api_spark.fixtures.generator import FIXTURES_ROOT, skolem

SEED = 13
SCHEMA_ORG = "http://schema.org/"
EX = "http://example.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
WEBDOCS_VERSION = "v2"  # v2: multi-term typeof/property lists (RDFa Core 1.1 §5)

SF_DOCS = {"sf0.001": 200, "sf0.01": 2_000, "sf0.1": 20_000}

_CITIES = ["Ghent", "Oviedo", "Leiden", "Porto", "Bergen"]
_NAMES = ["Alice", "Bob", "Carol", "Dan", "Eve", "Frank"]


def _rdfa_page(j: int, rng: random.Random):
    """A person page; returns (html, triples_fn(doc_sha) -> rows)."""
    person = f"{EX}person/{j}"
    name = f"{rng.choice(_NAMES)} {j}"
    city = rng.choice(_CITIES)
    with_address = rng.random() < 0.6
    with_url = rng.random() < 0.5
    multi_type = rng.random() < 0.3  # typeof is a whitespace-separated list
    multi_prop = rng.random() < 0.3  # so is property
    typeof = "Person Agent" if multi_type else "Person"
    name_prop = "name alternateName" if multi_prop else "name"
    parts = [
        '<html><body vocab="http://schema.org/">',
        f'  <div about="{person}" typeof="{typeof}">',
        f'    <span property="{name_prop}">{name}</span>',
    ]
    if with_url:
        parts.append(f'    <a property="url" href="{EX}home/{j}">home</a>')
    if with_address:
        parts.append('    <div property="address" typeof="PostalAddress">')
        parts.append(f'      <span property="addressLocality">{city}</span>')
        parts.append("    </div>")
    parts.append(f'    <meta property="memberOf" content="team-{j % 7}">')
    parts.append("  </div>\n</body></html>")
    html = "\n".join(parts)

    def golden(doc_sha: str):
        rows = [
            (doc_sha, person, RDF_TYPE, "iri", SCHEMA_ORG + "Person", None, None),
            (doc_sha, person, SCHEMA_ORG + "name", "literal", name, None, None),
        ]
        if multi_type:
            rows.append((doc_sha, person, RDF_TYPE, "iri", SCHEMA_ORG + "Agent", None, None))
        if multi_prop:
            rows.append(
                (doc_sha, person, SCHEMA_ORG + "alternateName", "literal", name, None, None)
            )
        if with_url:
            rows.append((doc_sha, person, SCHEMA_ORG + "url", "iri", f"{EX}home/{j}", None, None))
        if with_address:
            b = skolem(doc_sha, "_:h1")  # first (only) nested node → _:h1
            rows.append((doc_sha, person, SCHEMA_ORG + "address", "bnode", b, None, None))
            rows.append((doc_sha, b, RDF_TYPE, "iri", SCHEMA_ORG + "PostalAddress", None, None))
            rows.append((doc_sha, b, SCHEMA_ORG + "addressLocality", "literal", city, None, None))
        rows.append((doc_sha, person, SCHEMA_ORG + "memberOf", "literal", f"team-{j % 7}", None, None))
        return rows

    return html, golden


def _microdata_page(j: int, rng: random.Random):
    product = f"{EX}product/{j}"
    pname = f"Widget {j}"
    price = f"{(j % 90) + 10}.99"
    with_offer = rng.random() < 0.7
    with_image = rng.random() < 0.5
    parts = [
        f'<div itemscope itemtype="http://schema.org/Product" itemid="{product}">',
        f'  <span itemprop="name">{pname}</span>',
    ]
    if with_image:
        parts.append(f'  <img itemprop="image" src="{EX}img/{j}.png">')
    if with_offer:
        parts.append('  <div itemprop="offers" itemscope itemtype="http://schema.org/Offer">')
        parts.append(f'    <meta itemprop="price" content="{price}">')
        parts.append("  </div>")
    parts.append("</div>")
    html = "\n".join(parts)

    def golden(doc_sha: str):
        rows = [
            (doc_sha, product, RDF_TYPE, "iri", SCHEMA_ORG + "Product", None, None),
            (doc_sha, product, SCHEMA_ORG + "name", "literal", pname, None, None),
        ]
        if with_image:
            rows.append((doc_sha, product, SCHEMA_ORG + "image", "iri", f"{EX}img/{j}.png", None, None))
        if with_offer:
            b = skolem(doc_sha, "_:h1")
            rows.append((doc_sha, product, SCHEMA_ORG + "offers", "bnode", b, None, None))
            rows.append((doc_sha, b, RDF_TYPE, "iri", SCHEMA_ORG + "Offer", None, None))
            rows.append((doc_sha, b, SCHEMA_ORG + "price", "literal", price, None, None))
        return rows

    return html, golden


def generate_webdocs(sf_tag: str, out_dir: str) -> dict[str, str]:
    n_docs = SF_DOCS[sf_tag]
    marker = os.path.join(out_dir, f".complete-{WEBDOCS_VERSION}-{n_docs}")
    paths = {
        "docs": os.path.join(out_dir, "web_documents.parquet"),
        "triples": os.path.join(out_dir, "web_expected_triples.parquet"),
    }
    if os.path.exists(marker):
        return paths
    os.makedirs(out_dir, exist_ok=True)

    doc_cols = {k: [] for k in ("repo", "path", "commit", "lang", "content", "content_sha256")}
    triple_rows: list[tuple] = []
    for j in range(n_docs):
        rng = random.Random(SEED * 101 + j)
        if j % 2 == 0:
            lang = "html-rdfa11"
            html, golden = _rdfa_page(j, rng)
        else:
            lang = "html-microdata"
            html, golden = _microdata_page(j, rng)
        doc_sha = hashlib.sha256(html.encode()).hexdigest()
        doc_cols["repo"].append(f"web/site{j % 9}")
        doc_cols["path"].append(f"pages/{j:05d}.html")
        doc_cols["commit"].append(hashlib.sha1(f"{SEED}:{j}".encode()).hexdigest())
        doc_cols["lang"].append(lang)
        doc_cols["content"].append(html)
        doc_cols["content_sha256"].append(doc_sha)
        triple_rows.extend(golden(doc_sha))

    pq.write_table(pa.table(doc_cols), paths["docs"], row_group_size=4096)
    t_cols = ["doc_sha256", "subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"]
    pq.write_table(
        pa.table({c: [r[i] for r in triple_rows] for i, c in enumerate(t_cols)},
                 schema=pa.schema([(c, pa.string()) for c in t_cols])),
        paths["triples"],
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return paths


def ensure_webdocs(sf: str) -> dict[str, str]:
    tag = sf if sf in SF_DOCS else None
    if tag is None:
        base = os.path.basename(os.path.normpath(sf))
        tag = base if base in SF_DOCS else "sf0.01"
    return generate_webdocs(tag, os.path.join(FIXTURES_ROOT, f"web_{tag}"))
