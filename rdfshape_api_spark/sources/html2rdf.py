"""HTML→RDF extraction: RDFa-lite 1.1 + Microdata (SURVEY §2.1 S2).

Reference: ``HtmlToRdf.extractFromString`` delegates to Any23
(``modules/server/.../html2rdf/HtmlToRdf.scala:50-122``; formats surfaced
at ``HtmlFormat.scala:17-31``).  This module implements the subset the
fixtures exercise in pure Python — it runs batch-wise inside the same
Arrow ``mapInPandas`` stage as every other non-columnar format (no
per-row Spark UDFs), so swapping in a heavier extractor later changes
only this kernel.

Subset:

* **RDFa-lite 1.1** — ``vocab``, ``prefix``, ``about``, ``resource``,
  ``typeof``, ``property`` (+ ``href``/``src``/``content`` object
  attributes, nested nodes, text-content literals).
* **Microdata** — ``itemscope``, ``itemtype``, ``itemid``, ``itemprop``
  (+ ``href``/``src``/``content`` values, nested items).

Triple tuple shape matches parsers.py: ``(subj, pred, obj_kind,
obj_value, obj_lang, obj_dt)`` with ``_:bN`` blank nodes (skolemized
downstream).
"""

from __future__ import annotations

import re

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}

_TAG_RE = re.compile(r"<(/?)([A-Za-z][A-Za-z0-9-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)(/?)>")
_ATTR_RE = re.compile(r"([A-Za-z_:][-A-Za-z0-9_:.]*)\s*(?:=\s*(\"[^\"]*\"|'[^']*'|[^\s>]*))?")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DECL_RE = re.compile(r"<![^>]*>")


class _El:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _El | str

    def text(self) -> str:
        parts = []
        for c in self.children:
            parts.append(c if isinstance(c, str) else c.text())
        return "".join(parts)


def _parse_attrs(raw: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            attrs[name] = ""
        else:
            if val[:1] in "\"'" and val[:1] == val[-1:]:
                val = val[1:-1]
            attrs[name] = val
    return attrs


def parse_dom(content: str) -> _El:
    """Tag-soup tolerant DOM-lite parser: builds an element tree, closing
    unclosed tags implicitly when an enclosing tag closes."""
    content = _DECL_RE.sub("", _COMMENT_RE.sub("", content))
    root = _El("#root", {})
    stack = [root]
    pos = 0
    for m in _TAG_RE.finditer(content):
        if m.start() > pos:
            text = content[pos : m.start()]
            if text.strip():
                stack[-1].children.append(text)
        pos = m.end()
        closing, tag, raw_attrs, self_close = m.groups()
        tag = tag.lower()
        if closing:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        el = _El(tag, _parse_attrs(raw_attrs))
        stack[-1].children.append(el)
        if not self_close and tag not in _VOID_TAGS:
            stack.append(el)
    if pos < len(content) and content[pos:].strip():
        stack[-1].children.append(content[pos:])
    return root


class _BnodeGen:
    def __init__(self):
        self.n = 0

    def __call__(self) -> str:
        self.n += 1
        return f"_:h{self.n}"


def _norm_ws(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


# ---------------------------------------------------------------------------
# RDFa-lite 1.1
# ---------------------------------------------------------------------------

def _rdfa_expand(term: str, vocab: str, prefixes: dict[str, str]) -> str | None:
    if not term:
        return None
    if "://" in term:
        return term
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in prefixes:
            return prefixes[pfx] + local
        return term  # unknown CURIE left verbatim (Any23 behaviour)
    return vocab + term if vocab else None


def _rdfa_expand_list(value: str, vocab: str, prefixes: dict[str, str]) -> list[str]:
    """RDFa ``typeof``/``property`` values are whitespace-separated term
    lists (RDFa Core 1.1 §5): expand each term separately — one triple per
    term, never a single bogus IRI containing a space."""
    out = []
    for term in (value or "").split():
        iri = _rdfa_expand(term, vocab, prefixes)
        if iri is not None:
            out.append(iri)
    return out


def extract_rdfa(content: str) -> list[tuple]:
    triples: list[tuple] = []
    bnode = _BnodeGen()

    def walk(el: _El, subject: str | None, vocab: str, prefixes: dict[str, str]):
        a = el.attrs if isinstance(el, _El) else {}
        if "vocab" in a:
            vocab = a["vocab"]
        if "prefix" in a:
            prefixes = dict(prefixes)
            toks = a["prefix"].split()
            for i in range(0, len(toks) - 1, 2):
                if toks[i].endswith(":"):
                    prefixes[toks[i][:-1]] = toks[i + 1]

        new_subject = None
        if "about" in a:
            new_subject = a["about"]
        elif "resource" in a and "property" not in a:
            new_subject = a["resource"]
        elif "typeof" in a and "property" not in a:
            new_subject = bnode()

        prop = a.get("property")
        if prop is not None:
            preds = _rdfa_expand_list(prop, vocab, prefixes)
            if preds and subject is not None:
                if "resource" in a or "href" in a or "src" in a:
                    obj = a.get("resource") or a.get("href") or a.get("src")
                    for pred in preds:
                        triples.append((subject, pred, "iri", obj, None, None))
                    if "typeof" in a:
                        for t in _rdfa_expand_list(a["typeof"], vocab, prefixes):
                            triples.append((obj, RDF_TYPE, "iri", t, None, None))
                        new_subject = obj
                elif "typeof" in a:
                    # nested node: this element starts a new subject that is
                    # the object of (subject, pred, ·)
                    nested = bnode()
                    for pred in preds:
                        triples.append((subject, pred, "bnode", nested, None, None))
                    new_subject = nested
                elif "content" in a:
                    for pred in preds:
                        triples.append((subject, pred, "literal", a["content"], None, None))
                else:
                    lit = _norm_ws(el.text())
                    for pred in preds:
                        triples.append((subject, pred, "literal", lit, None, None))

        cur = new_subject if new_subject is not None else subject
        if "typeof" in a and new_subject is not None:
            # type object is always an IRI (class term); one triple per term
            for t in _rdfa_expand_list(a["typeof"], vocab, prefixes):
                triples.append((new_subject, RDF_TYPE, "iri", t, None, None))
        for c in el.children:
            if isinstance(c, _El):
                walk(c, cur, vocab, prefixes)

    root = parse_dom(content)
    for c in root.children:
        if isinstance(c, _El):
            walk(c, None, "", {})
    # typeof subjects that are bnodes: fix the subj kind marker (subjects
    # carry kind implicitly via the '_:' prefix — nothing to do; dedupe)
    return list(dict.fromkeys(triples))


# ---------------------------------------------------------------------------
# Microdata
# ---------------------------------------------------------------------------

def extract_microdata(content: str) -> list[tuple]:
    triples: list[tuple] = []
    bnode = _BnodeGen()

    def item_subject(el: _El) -> str:
        return el.attrs.get("itemid") or bnode()

    def value_of(el: _El) -> tuple[str, str]:
        """(kind, value) for an itemprop element without nested itemscope."""
        a = el.attrs
        if el.tag in ("a", "area", "link") and "href" in a:
            return "iri", a["href"]
        if el.tag in ("img", "audio", "video", "source", "embed", "iframe") and "src" in a:
            return "iri", a["src"]
        if "content" in a:
            return "literal", a["content"]
        return "literal", _norm_ws(el.text())

    def prop_iri(name: str, itype: str | None) -> str:
        if "://" in name:
            return name
        if itype:
            base = itype.rsplit("/", 1)[0] + "/"
            return base + name
        return name

    def walk(el: _El, subject: str | None, itype: str | None):
        a = el.attrs
        if "itemscope" in a and "itemprop" not in a:
            s = item_subject(el)
            t = a.get("itemtype")
            if t:
                triples.append((s, RDF_TYPE, "iri", t, None, None))
            for c in el.children:
                if isinstance(c, _El):
                    walk(c, s, t or itype)
            return
        if "itemprop" in a and subject is not None:
            pred = prop_iri(a["itemprop"], itype)
            if "itemscope" in a:
                s = item_subject(el)
                t = a.get("itemtype")
                kind = "bnode" if s.startswith("_:") else "iri"
                triples.append((subject, pred, kind, s, None, None))
                if t:
                    triples.append((s, RDF_TYPE, "iri", t, None, None))
                for c in el.children:
                    if isinstance(c, _El):
                        walk(c, s, t or itype)
                return
            kind, val = value_of(el)
            triples.append((subject, pred, kind, val, None, None))
        for c in el.children:
            if isinstance(c, _El):
                walk(c, subject, itype)

    root = parse_dom(content)
    for c in root.children:
        if isinstance(c, _El):
            walk(c, None, None)
    return list(dict.fromkeys(triples))
