"""Pure-Python SVG rendering for DotGraph (no graphviz binary).

Parity surface: the reference renders its DOT graphs through the
graphviz binary for notebook display (yargy/dot.py:18-26 shells
``dot -Tsvg``; ``Graph._repr_svg_``).  No graphviz exists in this
environment, so this module lays the graph out itself — a layered
(Sugiyama-lite) drawing good enough for the debug graphs the DSL
produces (parse trees and rule DAGs are shallow and narrow):

  * layer = longest-path depth from the roots (parents above
    children, like ``dot``),
  * leaves take DFS (document-order) slots, parents center over
    their children — shared DAG nodes keep their first position,
  * solid edges draw with an arrowhead; ``style=dashed`` edges
    (relation pairs) draw dashed, undirected, with their label.

Everything is derived from the DotGraph's own insertion order, so
the output is deterministic byte-for-byte; ``DotGraph._repr_svg_``
(attached in kernel/dot.py) gives the same notebook affordance the
reference gets from graphviz.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

CHAR_W = 7          # sans ~10px: generous per-char estimate
LINE_H = 13
PAD_X, PAD_Y = 8, 5
GAP_X, GAP_Y = 18, 40


def _node_box(lines):
    width = max((len(line) for line in lines), default=1) * CHAR_W \
        + 2 * PAD_X
    height = max(len(lines), 1) * LINE_H + 2 * PAD_Y
    return width, height


def render_svg(graph) -> str:
    """DotGraph -> standalone ``<svg>`` text."""
    nodes = []
    for item, style in graph.nodes:
        attrs = style.attributes if style else {}
        nid = graph.id(item)
        label = str(attrs.get('label', nid))
        nodes.append((nid, label.split('\n'),
                      str(attrs.get('fillcolor', '#eeeeee'))))
    if not nodes:
        return ('<svg xmlns="http://www.w3.org/2000/svg" '
                'width="10" height="10"/>')
    solid, dashed = [], []
    for s, t, style in graph.edges:
        attrs = style.attributes if style else {}
        pair = (graph.id(s), graph.id(t),
                str(attrs.get('label', '')))
        (dashed if attrs.get('style') == 'dashed'
         else solid).append(pair)

    ids = [nid for nid, _, _ in nodes]
    known = set(ids)
    children = {nid: [] for nid in ids}
    indeg = {nid: 0 for nid in ids}
    for s, t, _ in solid:
        if s in known and t in known:
            children[s].append(t)
            indeg[t] += 1

    # layer = longest path from any root (graphs are small debug
    # artifacts; fixpoint iteration is fine and cycle-safe)
    depth = {nid: 0 for nid in ids}
    for _ in range(len(ids)):
        changed = False
        for s in ids:
            for t in children[s]:
                if depth[t] < depth[s] + 1:
                    depth[t] = depth[s] + 1
                    changed = True
        if not changed:
            break

    # x slots: DFS from the roots in insertion order; a leaf claims
    # the next free slot, a parent centers over its children; shared
    # (DAG) nodes keep their first-assigned position.  ITERATIVE with
    # an in-progress set: recursive grammars (forward()-defined
    # rules) put cycles in this graph — a back-edge child simply
    # doesn't contribute to its ancestor's position — and parse
    # trees can be deeper than Python's recursion limit.
    boxes = {nid: _node_box(lines) for nid, lines, _ in nodes}
    slot_w = max(w for w, _ in boxes.values()) + GAP_X
    xpos = {}
    next_slot = [0]
    visiting = set()

    def place(root):
        stack = [root]
        while stack:
            n = stack[-1]
            if n in xpos:
                stack.pop()
                continue
            visiting.add(n)
            pending = [k for k in children[n]
                       if k != n and k not in xpos
                       and k not in visiting]
            if pending:
                stack.extend(reversed(pending))
                continue
            kx = [xpos[k] for k in children[n] if k in xpos]
            if kx:
                xpos[n] = sum(kx) / len(kx)
            else:
                xpos[n] = (next_slot[0] + 0.5) * slot_w
                next_slot[0] += 1
            stack.pop()

    roots = [nid for nid in ids if indeg[nid] == 0] or [ids[0]]
    for r in roots:
        place(r)
    for nid in ids:            # disconnected leftovers (incl. cycles
        place(nid)             # unreachable from any root)

    row_h = max(h for _, h in boxes.values()) + GAP_Y
    ypos = {nid: depth[nid] * row_h + GAP_Y / 2 for nid in ids}
    width = int(max(xpos[n] + boxes[n][0] / 2 for n in ids) + GAP_X)
    height = int(max(ypos[n] + boxes[n][1] for n in ids) + GAP_Y / 2)

    out = [
        '<svg xmlns="http://www.w3.org/2000/svg" width="%d" '
        'height="%d" viewBox="0 0 %d %d">' % (width, height,
                                              width, height),
        '<defs><marker id="arrow" viewBox="0 0 8 8" refX="7" '
        'refY="4" markerWidth="6" markerHeight="6" orient="auto">'
        '<path d="M0,0 L8,4 L0,8 z" fill="gray"/></marker></defs>',
    ]
    for s, t, _ in solid:
        if s not in known or t not in known:
            continue
        x1, y1 = xpos[s], ypos[s] + boxes[s][1]
        x2, y2 = xpos[t], ypos[t]
        out.append('<line x1="%.1f" y1="%.1f" x2="%.1f" y2="%.1f" '
                   'stroke="gray" stroke-width="1" '
                   'marker-end="url(#arrow)"/>' % (x1, y1, x2, y2))
    for s, t, label in dashed:
        if s not in known or t not in known:
            continue
        x1 = xpos[s]
        y1 = ypos[s] + boxes[s][1] / 2
        x2, y2 = xpos[t], ypos[t] + boxes[t][1] / 2
        out.append('<line x1="%.1f" y1="%.1f" x2="%.1f" y2="%.1f" '
                   'stroke="gray" stroke-width="1" '
                   'stroke-dasharray="4,3"/>' % (x1, y1, x2, y2))
        if label:
            out.append('<text x="%.1f" y="%.1f" font-family="sans-serif" '
                       'font-size="8" fill="gray" text-anchor="middle">'
                       '%s</text>' % ((x1 + x2) / 2,
                                      (y1 + y2) / 2 - 2,
                                      escape(label)))
    for nid, lines, fill in nodes:
        w, h = boxes[nid]
        x, y = xpos[nid] - w / 2, ypos[nid]
        out.append('<rect x="%.1f" y="%.1f" width="%d" height="%d" '
                   'rx="2" fill="%s"/>' % (x, y, w, h, escape(fill)))
        for j, line in enumerate(lines):
            out.append('<text x="%.1f" y="%.1f" '
                       'font-family="sans-serif" font-size="10" '
                       'text-anchor="middle">%s</text>'
                       % (xpos[nid],
                          y + PAD_Y + (j + 1) * LINE_H - 3,
                          escape(line)))
    out.append('</svg>')
    return '\n'.join(out)
