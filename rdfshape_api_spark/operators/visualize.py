"""DOT → SVG rendering without Graphviz (GraphicFormat parity, subset).

The reference rasterizes its DOT visual graphs to SVG/PNG/PS through
Graphviz (``GraphicFormat.scala:22``; DataConvert pipes sgraph.toDot into
``dot -Tsvg``).  Graphviz is absent from this container, but SVG is a text
format — this module renders the engine's own machine-generated DOT
statements (:func:`operators.serialize.to_dot`, ``Schema2UML``'s record
nodes) into standalone SVG with a deterministic layered layout
(Sugiyama-style: longest-path layering + one barycenter ordering pass).

Scope and cost model: presentation-only, driver-side, per document — the
same KB-sized collect as :func:`operators.serialize.assemble_dot` (the
reference renders per HTTP request; the distributed artifact is the DOT
statement table).  PNG is rendered too (r5): the same layout rasterized
into an RGB buffer with a 5x7 bitmap font and encoded with a stdlib
zlib PNG writer — the inverse of the subset
``functions/multimodal.decode_png`` reads, which the tests use to verify
the bytes.  PS stays out of scope.

The parser reads the fixed grammar this package emits — quoted node ids
with ``[shape=…, label="…"]`` attribute lists and quoted ``->`` edges —
not arbitrary DOT.  Unknown statements raise (clean reject, never a
silent drop).
"""

from __future__ import annotations

import html
import re
from dataclasses import dataclass

__all__ = [
    "parse_dot", "layout_layers", "dot_to_svg", "render_svg",
    "dot_to_png", "render_png",
]


@dataclass
class _Node:
    node_id: str
    shape: str
    label: str


# the two statement forms to_dot / uml_to_dot emit (serialize.py:472,509)
_NODE_RE = re.compile(
    r'^\s*"(?P<id>(?:[^"\\]|\\.)*)"\s*\[shape=(?P<shape>\w+),\s*'
    r'label="(?P<label>(?:[^"\\]|\\.)*)"\s*\]\s*;?\s*$'
)
_EDGE_RE = re.compile(
    r'^\s*"(?P<src>(?:[^"\\]|\\.)*)"\s*->\s*"(?P<dst>(?:[^"\\]|\\.)*)"\s*'
    r'(?:\[label="(?P<label>(?:[^"\\]|\\.)*)"\s*\])?\s*;?\s*$'
)
_WRAPPER_RE = re.compile(r'^\s*(digraph\b.*\{|\}|//.*)?\s*$')


def _unescape(s: str) -> str:
    """Invert serialize._dot_escape (\\\\, \\", \\n, \\r)."""
    return (
        s.replace("\\n", "\n").replace("\\r", "\r")
        .replace('\\"', '"').replace("\\\\", "\\")
    )


def parse_dot(text: str) -> tuple[list[_Node], list[tuple[str, str, str]]]:
    """Parse this package's DOT statements → (nodes, edges).

    ``text`` may be a full ``digraph … { … }`` document or bare statement
    lines.  Node redefinitions keep the first occurrence (statements are
    set-semantics rows).  An edge endpoint with no node statement gets an
    implicit ellipse node labeled by its id (DOT's own default behavior).
    """
    nodes: dict[str, _Node] = {}
    edges: list[tuple[str, str, str]] = []
    for line in text.splitlines():
        if m := _NODE_RE.match(line):
            nid = _unescape(m["id"])
            nodes.setdefault(
                nid, _Node(nid, m["shape"], _unescape(m["label"]))
            )
        elif m := _EDGE_RE.match(line):
            edges.append(
                (
                    _unescape(m["src"]),
                    _unescape(m["dst"]),
                    _unescape(m["label"] or ""),
                )
            )
        elif not _WRAPPER_RE.match(line):
            raise ValueError(f"unsupported DOT statement: {line!r}")
    for src, dst, _ in edges:
        for endpoint in (src, dst):
            nodes.setdefault(endpoint, _Node(endpoint, "ellipse", endpoint))
    return list(nodes.values()), edges


def layout_layers(
    nodes: list[_Node], edges: list[tuple[str, str, str]]
) -> dict[str, tuple[int, int]]:
    """Deterministic layered layout: ``node_id → (layer, index)``.

    Layering is longest-path from the source set (nodes with no incoming
    edge; for a cycle with no source, the lexicographically-smallest
    member seeds its component).  Within a layer, one barycenter pass
    orders nodes by the mean index of their upper neighbours, ties broken
    by label then id — fully deterministic, no randomness.
    """
    ids = [n.node_id for n in nodes]
    by_id = {n.node_id: n for n in nodes}
    out: dict[str, set[str]] = {i: set() for i in ids}
    indeg: dict[str, int] = {i: 0 for i in ids}
    for src, dst, _ in edges:
        if src != dst and dst not in out[src]:
            out[src].add(dst)
            indeg[dst] += 1

    # longest-path layering via Kahn order; cycles resolved by seeding the
    # smallest unvisited node at the current frontier depth
    layer: dict[str, int] = {}
    remaining = dict(indeg)
    queue = sorted(i for i in ids if remaining[i] == 0)
    for i in queue:
        layer[i] = 0
    while len(layer) < len(ids):
        if not queue:  # cycle: seed deterministically
            seed = min(i for i in ids if i not in layer)
            layer[seed] = 0
            queue = [seed]
        nxt: list[str] = []
        for i in queue:
            for j in sorted(out[i]):
                layer[j] = max(layer.get(j, 0), layer[i] + 1)
                remaining[j] -= 1
                if remaining[j] == 0:
                    nxt.append(j)
        queue = sorted(set(nxt))
        if not queue and len(layer) < len(ids):
            queue = []  # fall through to cycle seeding

    layers: dict[int, list[str]] = {}
    for i in ids:
        layers.setdefault(layer[i], []).append(i)
    # initial order: label, id
    for members in layers.values():
        members.sort(key=lambda i: (by_id[i].label, i))
    # one barycenter pass, top-down
    pos: dict[str, int] = {}
    parents: dict[str, list[str]] = {i: [] for i in ids}
    for src, dst, _ in edges:
        if src != dst:
            parents[dst].append(src)
    for depth in sorted(layers):
        members = layers[depth]
        if depth > 0:
            def bary(i: str) -> float:
                ups = [pos[p] for p in parents[i] if layer.get(p, -1) < depth and p in pos]
                return sum(ups) / len(ups) if ups else float(len(members))

            members.sort(key=lambda i: (bary(i), by_id[i].label, i))
        for idx, i in enumerate(members):
            pos[i] = idx
    return {i: (layer[i], pos[i]) for i in ids}


_CHAR_W = 7.2  # monospace-ish estimate at font-size 12
_NODE_H = 36
_LAYER_GAP = 84
_X_GAP = 28
_PAD = 24


def _node_width(label: str) -> float:
    longest = max((len(line) for line in label.split("\n")), default=1)
    return max(60.0, longest * _CHAR_W + 24)


def _pixel_coords(
    nodes: list[_Node], edges: list[tuple[str, str, str]]
) -> tuple[dict[str, tuple[float, float]], float, float]:
    """Layered layout → pixel center per node + canvas (width, height).
    Shared by the SVG and PNG renderers so both draw the same picture."""
    coords = layout_layers(nodes, edges)
    by_id = {n.node_id: n for n in nodes}

    # per-layer x placement with per-node widths, layers centered
    layers: dict[int, list[str]] = {}
    for nid, (ly, _ix) in coords.items():
        layers.setdefault(ly, []).append(nid)
    centers: dict[str, tuple[float, float]] = {}
    row_widths: dict[int, float] = {}
    for ly, members in layers.items():
        members.sort(key=lambda i: coords[i][1])
        x = 0.0
        for nid in members:
            w = _node_width(by_id[nid].label)
            centers[nid] = (x + w / 2, 0.0)
            x += w + _X_GAP
        row_widths[ly] = x - _X_GAP if members else 0.0
    total_w = max(row_widths.values(), default=0.0)
    for ly, members in layers.items():
        shift = (total_w - row_widths[ly]) / 2 + _PAD
        y = _PAD + _NODE_H / 2 + ly * _LAYER_GAP
        for nid in members:
            cx, _ = centers[nid]
            centers[nid] = (cx + shift, y)
    height = _PAD * 2 + _NODE_H + (max(layers, default=0)) * _LAYER_GAP
    width = total_w + 2 * _PAD
    return centers, width, height


def dot_to_svg(text: str, title: str = "rdf") -> str:
    """Render DOT statements (or a full digraph document) to standalone
    SVG: one ``<ellipse>``/``<circle>``/``<rect>`` + ``<text>`` per node,
    arrow-marked ``<line>`` + optional mid-point label per edge."""
    nodes, edges = parse_dot(text)
    by_id = {n.node_id: n for n in nodes}
    centers, width, height = _pixel_coords(nodes, edges)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width:.0f}" '
        f'height="{height:.0f}" viewBox="0 0 {width:.0f} {height:.0f}">',
        f"<title>{html.escape(title)}</title>",
        '<defs><marker id="arrow" viewBox="0 0 10 10" refX="10" refY="5" '
        'markerWidth="7" markerHeight="7" orient="auto-start-reverse">'
        '<path d="M 0 0 L 10 5 L 0 10 z" fill="#333"/></marker></defs>',
        '<g font-family="monospace" font-size="12">',
    ]
    for src, dst, label in edges:
        (x1, y1), (x2, y2) = centers[src], centers[dst]
        # trim the line at the node boundary so the arrowhead is visible
        dy = y2 - y1
        if dy:
            sign = 1 if dy > 0 else -1
            y1 += sign * _NODE_H / 2
            y2 -= sign * _NODE_H / 2
        parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            'stroke="#333" marker-end="url(#arrow)"/>'
        )
        if label:
            mx, my = (x1 + x2) / 2, (y1 + y2) / 2 - 4
            parts.append(
                f'<text x="{mx:.1f}" y="{my:.1f}" text-anchor="middle" '
                f'fill="#555">{html.escape(label)}</text>'
            )
    for n in nodes:
        cx, cy = centers[n.node_id]
        w = _node_width(n.label)
        if n.shape in ("ellipse", "circle"):
            rx = w / 2 if n.shape == "ellipse" else _NODE_H / 2
            parts.append(
                f'<ellipse cx="{cx:.1f}" cy="{cy:.1f}" rx="{rx:.1f}" '
                f'ry="{_NODE_H / 2:.1f}" fill="#eef" stroke="#336"/>'
            )
        else:  # record / box
            parts.append(
                f'<rect x="{cx - w / 2:.1f}" y="{cy - _NODE_H / 2:.1f}" '
                f'width="{w:.1f}" height="{_NODE_H}" fill="#ffe" stroke="#663"/>'
            )
        for k, line in enumerate(n.label.split("\n")):
            ty = cy + 4 + (k - (n.label.count("\n")) / 2) * 14
            parts.append(
                f'<text x="{cx:.1f}" y="{ty:.1f}" '
                f'text-anchor="middle">{html.escape(line)}</text>'
            )
    parts.append("</g></svg>")
    return "\n".join(parts)


def render_svg(lines_df, doc_sha256: str, name: str = "rdf") -> str:
    """SVG for ONE document's visual graph from the distributed DOT
    statement table (:func:`operators.serialize.to_dot` output) — the
    per-request presentation step, same collect cost as
    :func:`assemble_dot`."""
    from rdfshape_api_spark.operators.serialize import assemble_dot

    return dot_to_svg(assemble_dot(lines_df, doc_sha256, name), title=name)


# ---------------------------------------------------------------------------
# DOT → PNG rasterization (GraphicFormat parity: the reference pipes DOT
# through `dot -Tpng`, DataConvert.scala:83-120).  Pure stdlib: the layout
# is _pixel_coords (identical picture to the SVG), drawing is numpy, and
# the encoder writes IHDR/IDAT/IEND with zlib — the exact inverse of the
# subset functions/multimodal.decode_png reads, which the tests use to
# verify the bytes round-trip.

# 5x7 bitmap font, column-major LSB-top — the classic public-domain LCD
# glyph set for the characters RDF labels actually contain; anything else
# renders as a hollow box (deterministic, never raises).
_FONT_5X7 = {
    " ": "0000000000", "!": "00005f0000", '"': "0007000700", "#": "147f147f14",
    "'": "0005030000", "(": "001c224100", ")": "0041221c00", "*": "2a1c7f1c2a",
    "+": "08083e0808", ",": "0050300000", "-": "0808080808", ".": "0060600000",
    "/": "2010080402", "0": "3e51494536", "1": "00427f4000", "2": "4261514946",
    "3": "2141454b31", "4": "1814127f10", "5": "2745454539", "6": "3c4a494930",
    "7": "0171090503", "8": "3649494936", "9": "064949291e", ":": "0036360000",
    ";": "0056360000", "<": "0814224100", "=": "1414141414", ">": "0041221408",
    "?": "0201510906", "@": "324979413e", "A": "7e1111117e", "B": "7f49494936",
    "C": "3e41414122", "D": "7f4141221c", "E": "7f49494941", "F": "7f09090901",
    "G": "3e41495a68", "H": "7f0808087f", "I": "00417f4100", "J": "2040413f01",
    "K": "7f08142241", "L": "7f40404040", "M": "7f020c027f", "N": "7f0408107f",
    "O": "3e4141413e", "P": "7f09090906", "Q": "3e4151215e", "R": "7f09192946",
    "S": "4649494931", "T": "01017f0101", "U": "3f4040403f", "V": "1f2040201f",
    "W": "3f4038403f", "X": "6314081463", "Y": "0708700807", "Z": "6151494543",
    "[": "007f414100", "\\": "0204081020", "]": "0041417f00", "^": "0402010204",
    "_": "4040404040", "a": "2054545478", "b": "7f48444438", "c": "3844444420",
    "d": "384444487f", "e": "3854545418", "f": "087e090102", "g": "0c5252523e",
    "h": "7f08040478", "i": "00447d4000", "j": "2040443d00", "k": "7f10284400",
    "l": "00417f4000", "m": "7c04180478", "n": "7c08040478", "o": "3844444438",
    "p": "7c14141408", "q": "081414187c", "r": "7c08040408", "s": "4854545420",
    "t": "043f444020", "u": "3c4040207c", "v": "1c2040201c", "w": "3c4030403c",
    "x": "4428102844", "y": "0c5050503c", "z": "4464544c44", "{": "0008364100",
    "|": "00007f0000", "}": "0041360800", "~": "0804080408",
}


def _draw_text(img, x0: int, y0: int, s: str, color) -> None:
    """Blit a string at (x0, y0) top-left, 6 px advance per character."""
    import numpy as np

    h, w, _ = img.shape
    for k, ch in enumerate(s):
        cols = _FONT_5X7.get(ch)
        if cols is None:
            cols = "7f41414141"  # hollow box for any unmapped character
        for cx in range(5):
            bits = int(cols[cx * 2 : cx * 2 + 2], 16)
            for cy in range(7):
                if bits >> cy & 1:
                    px, py = x0 + k * 6 + cx, y0 + cy
                    if 0 <= px < w and 0 <= py < h:
                        img[py, px] = color


def _draw_line(img, x1: float, y1: float, x2: float, y2: float, color) -> None:
    import numpy as np

    n = max(2, int(max(abs(x2 - x1), abs(y2 - y1))) + 1)
    xs = np.clip(np.linspace(x1, x2, n).round().astype(int), 0, img.shape[1] - 1)
    ys = np.clip(np.linspace(y1, y2, n).round().astype(int), 0, img.shape[0] - 1)
    img[ys, xs] = color


def _png_encode(img) -> bytes:
    """Minimal PNG writer: 8-bit RGB, no filtering (type 0 rows) — the
    subset decode_png round-trips byte-exactly."""
    import struct
    import zlib

    h, w, _ = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def dot_to_png(text: str) -> bytes:
    """Rasterize DOT statements to PNG bytes — the same layered layout as
    :func:`dot_to_svg` drawn into an RGB buffer (white background, filled
    node shapes with outlines, straight edges, 5x7 bitmap labels).
    Deterministic byte output; decodable by
    :func:`functions.multimodal.decode_png` (tested round-trip)."""
    import numpy as np

    nodes, edges = parse_dot(text)
    centers, width, height = _pixel_coords(nodes, edges)
    W, H = max(int(width), 16), max(int(height), 16)
    img = np.full((H, W, 3), 255, dtype=np.uint8)
    ink = np.array([51, 51, 51], dtype=np.uint8)
    for src, dst, label in edges:
        (x1, y1), (x2, y2) = centers[src], centers[dst]
        dy = y2 - y1
        if dy:
            sign = 1 if dy > 0 else -1
            y1 += sign * _NODE_H / 2
            y2 -= sign * _NODE_H / 2
        _draw_line(img, x1, y1, x2, y2, ink)
        # arrowhead: two short strokes back from the tip
        import math

        ang = math.atan2(y2 - y1, x2 - x1)
        for da in (math.radians(25), -math.radians(25)):
            _draw_line(
                img, x2, y2,
                x2 - 8 * math.cos(ang + da), y2 - 8 * math.sin(ang + da), ink,
            )
        if label:
            mx, my = (x1 + x2) / 2, (y1 + y2) / 2 - 10
            _draw_text(img, int(mx - len(label) * 3), int(my), label,
                       np.array([85, 85, 85], dtype=np.uint8))
    for n in nodes:
        cx, cy = centers[n.node_id]
        w = _node_width(n.label)
        x0, x1 = int(cx - w / 2), int(cx + w / 2)
        y0, y1 = int(cy - _NODE_H / 2), int(cy + _NODE_H / 2)
        x0c, x1c = max(x0, 0), min(x1, W - 1)
        y0c, y1c = max(y0, 0), min(y1, H - 1)
        if n.shape in ("ellipse", "circle"):
            fill = np.array([238, 238, 255], dtype=np.uint8)
            border = np.array([51, 51, 102], dtype=np.uint8)
            rx = w / 2 if n.shape == "ellipse" else _NODE_H / 2
            ry = _NODE_H / 2
            ys, xs = np.mgrid[y0c : y1c + 1, x0c : x1c + 1]
            d = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2
            img[y0c : y1c + 1, x0c : x1c + 1][d <= 1.0] = fill
            img[y0c : y1c + 1, x0c : x1c + 1][(d <= 1.0) & (d >= 0.82)] = border
        else:  # record / box
            fill = np.array([255, 255, 238], dtype=np.uint8)
            border = np.array([102, 102, 51], dtype=np.uint8)
            img[y0c : y1c + 1, x0c : x1c + 1] = fill
            img[y0c, x0c : x1c + 1] = border
            img[y1c, x0c : x1c + 1] = border
            img[y0c : y1c + 1, x0c] = border
            img[y0c : y1c + 1, x1c] = border
        lines = n.label.split("\n")
        for k, line in enumerate(lines):
            ty = int(cy - 3 + (k - (len(lines) - 1) / 2) * 10)
            _draw_text(img, int(cx - len(line) * 3), ty, line, ink)
    return _png_encode(img)


def render_png(lines_df, doc_sha256: str, name: str = "rdf") -> bytes:
    """PNG for ONE document's visual graph from the distributed DOT
    statement table — same collect contract as :func:`render_svg`."""
    from rdfshape_api_spark.operators.serialize import assemble_dot

    return dot_to_png(assemble_dot(lines_df, doc_sha256, name))
