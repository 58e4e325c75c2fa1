"""GraphViz dot export of extraction graphs (DotWriter port).

The reference's ``util/DotWriter.java:29-90`` serializes a JUNG graph to
dot text: graph-type header, the fixed size/font preamble, one
``id[label="..."];`` line per labeled vertex, one
``a->b[label="..."];`` line per edge, closing brace.  This port keeps
the exact output shape (including the preamble strings) over plain
(vertices, edges) data, plus a convenience that renders a document's
resolved KB neighborhood — the debugging surface the reference used it
for.  Deterministic ordering (the reference iterates JUNG hash sets).
"""

from __future__ import annotations

from ..kb.bundle import KBIndex


def write_dot(
    vertices: list[tuple[str, str | None]],
    edges: list[tuple[str, str, str]],
    directed: bool = True,
) -> str:
    """(vertex_id, label|None) + (src, dst, edge_label) -> dot text
    matching DotWriter.save (util/DotWriter.java:38-90)."""
    out = []
    out.append("digraph {" if directed else "graph {")
    out.append('size="70,70";')
    out.append('graph [fontsize=8, ssize = "70,140"];')
    for vid, label in vertices:
        if label is not None:
            out.append('%s[label="%s"];' % (vid, label))
    arrow = "->" if directed else "--"
    for src, dst, label in edges:
        out.append('%s%s%s[label="%s"];' % (src, arrow, dst, label))
    out.append("}")
    return "\n".join(out) + "\n"


def _local_name(uri: str) -> str:
    for sep in ("#", "/"):
        if sep in uri:
            uri = uri.rsplit(sep, 1)[1]
    return uri


def document_graph_dot(kb: KBIndex, resolved_subjects: list[int]) -> str:
    """Dot text of a document's resolved entities and the KB edges among
    them — the per-document debug view the reference drove DotWriter
    with.  Vertex ids are KB indexes (valid dot ids), labels are URI
    local names."""
    subjects = sorted(set(resolved_subjects))
    in_doc = set(subjects)
    vertices = [(str(s), _local_name(kb.uri(s))) for s in subjects]
    edges = []
    for s in subjects:
        preds, objs = kb.outgoing_nontype(s)
        for p, o in sorted(zip(preds.tolist(), objs.tolist())):
            if o in in_doc:
                edges.append((str(s), str(o), _local_name(kb.uri(p))))
    return write_dot(vertices, edges)
