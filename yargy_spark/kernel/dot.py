"""Graphviz DOT dumps for rules and parse trees (debug sink).

Parity surface: the reference exposes ``rule.as_dot`` /
``match.tree.as_dot`` graphs rendered through graphviz
(yargy/dot.py:18-170, tree/transformators.py:129-169,
rule/constructors.py:119-122).  This module reproduces the digraph
SOURCE (node/edge/styling conventions) as pure text — no graphviz
binary is needed (or available) here; ``dot -Tsvg`` renders it
anywhere.

Node coloring follows the reference: interpretation nodes green,
plain rule nodes blue, leaves silver; relation edges dashed.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

BLUE = '#aec7e8'
GREEN = '#dbdb8d'
SILVER = '#eeeeee'
GRAY = 'gray'


def _quote(value) -> str:
    value = str(value)
    for a, b in (('"', r'\"'), ('\n', r'\n'), ('\r', r'\r')):
        value = value.replace(a, b)
    return '"%s"' % value


class Style:
    def __init__(self, **attributes):
        self.attributes = attributes

    def __str__(self):
        return ', '.join('%s=%s' % (k, _quote(v))
                         for k, v in self.attributes.items())


GRAPH_STYLE = Style(margin=0, nodesep=0, ranksep=0, splines='splines')
NODE_STYLE = Style(shape='box', height=0, width=0, fontname='sans',
                   fontsize=10, color='none', style='filled',
                   fillcolor=SILVER)
EDGE_STYLE = Style(fontname='sans', fontsize=8, fontcolor=GRAY,
                   arrowsize=0.3, color=GRAY)


class DotGraph:
    """Accumulated nodes/edges; ``source`` yields DOT text
    (dot.py:73-170 conventions)."""

    def __init__(self):
        self.nodes: List[Tuple[object, Optional[Style]]] = []
        self.edges: List[Tuple[object, object, Optional[Style]]] = []
        self._ids = {}

    def add_node(self, item, style: Optional[Style] = None):
        self.nodes.append((item, style))

    def add_edge(self, source, target, style: Optional[Style] = None):
        self.edges.append((source, target, style))

    def id(self, item) -> int:
        key = id(item)
        if key not in self._ids:
            self._ids[key] = len(self._ids)
        return self._ids[key]

    @property
    def svg(self) -> str:
        """Rendered SVG — pure-Python layout, no graphviz binary
        (reference parity: yargy/dot.py:18-26 shells ``dot -Tsvg``
        for the same affordance; see kernel/dot_svg.py)."""
        from .dot_svg import render_svg
        return render_svg(self)

    def _repr_svg_(self) -> str:
        """Jupyter inline rendering, like the reference's graphviz
        ``Graph._repr_svg_``."""
        return self.svg

    @property
    def source(self) -> str:
        out = ['digraph G {',
               'graph [%s];' % GRAPH_STYLE,
               'node [%s];' % NODE_STYLE,
               'edge [%s];' % EDGE_STYLE]
        for item, style in self.nodes:
            out.append('%d [%s];' % (self.id(item), style)
                       if style else '%d' % self.id(item))
        for source, target, style in self.edges:
            s, t = self.id(source), self.id(target)
            out.append('%d -> %d [%s];' % (s, t, style)
                       if style else '%d -> %d;' % (s, t))
        out.append('}')
        return '\n'.join(out)


# ------------------------------------------------------------- rules

def _rule_label(item) -> Tuple[str, str]:
    """(label, fillcolor) for a rule-DAG node (reference
    DotRuleTransformator label conventions)."""
    from . import grammar as g
    if isinstance(item, g.Named):
        return item.name, BLUE
    if isinstance(item, g.Interp):
        return 'Interpretation(%s)' % getattr(
            item.interpretator, 'label', repr(item.interpretator)), GREEN
    if isinstance(item, g.Rel):
        return 'Relation(%s)' % getattr(item.relation, 'label',
                                        repr(item.relation)), BLUE
    if isinstance(item, g.Opt):
        return 'Optional', BLUE
    if isinstance(item, (g.Rep, g.RepOpt)):
        return 'Repeatable', BLUE
    if isinstance(item, g.MinRep):
        return 'Repeatable(min=%d)' % item.min, BLUE
    if isinstance(item, g.MaxRep):
        return 'Repeatable(max=%d)' % item.max, BLUE
    if isinstance(item, g.MinMaxRep):
        return 'Repeatable(min=%d, max=%d)' % (item.min, item.max), BLUE
    if isinstance(item, g.Alt):
        return 'Or', BLUE
    if isinstance(item, g.Plain):
        return 'Rule', BLUE
    if isinstance(item, g.Prod):
        return 'Production', BLUE
    if isinstance(item, g.Fwd):
        return 'Forward', BLUE
    if isinstance(item, g.Eps):
        return 'Empty', BLUE
    if isinstance(item, g.Gaz):
        return 'Pipeline', BLUE
    # terminal predicate: every predicate carries a readable label
    label = getattr(item, 'label', None)
    return (label if isinstance(label, str) else repr(item)), SILVER


def rule_dot(rule) -> DotGraph:
    """Rule DAG -> DotGraph (``rule.as_dot`` parity,
    rule/transformators.py DotRuleTransformator)."""
    from collections import deque
    graph = DotGraph()
    seen = set()
    queue = deque([rule])
    while queue:
        item = queue.popleft()
        if id(item) in seen:
            continue
        seen.add(id(item))
        label, color = _rule_label(item)
        graph.add_node(item, Style(label=label, fillcolor=color))
        getter = getattr(item, 'children', None)
        children: Iterable = getter() if getter is not None else ()
        for child in children:
            graph.add_edge(item, child)
            queue.append(child)
    return graph


# ------------------------------------------------------------- trees

def tree_dot(tree) -> DotGraph:
    """Parse tree -> DotGraph (``match.tree.as_dot`` parity,
    tree/transformators.py:129-169): interpretation nodes green,
    token leaves silver, relation pairs joined by dashed edges."""
    from .earley import TreeLeaf
    graph = DotGraph()
    relation_groups = {}
    stack = [tree.root]
    while stack:
        node = stack.pop()
        if isinstance(node, TreeLeaf):
            graph.add_node(node, Style(label=node.token.value))
            continue
        name = getattr(node.rule, 'name', None) or 'Rule'
        interp = getattr(node.rule, 'interpretator', None)
        label = name
        if interp is not None:
            label = '%s\n%s' % (name, getattr(interp, 'label',
                                              repr(interp)))
        graph.add_node(node, Style(
            label=label, fillcolor=GREEN if interp else BLUE))
        rel = getattr(node.rule, 'relation', None)
        if rel is not None:
            relation_groups.setdefault(id(rel), (rel, []))[1].append(
                node)
        for child in node.children:
            graph.add_edge(node, child)
        # reversed: a plain stack visits siblings right-to-left; the
        # reference dfs walks document order (tree/constructors.py
        # queue.extend(reversed(children)))
        stack.extend(reversed(node.children))
    # insertion order IS traversal order (deterministic DFS) — no
    # sort: sorting by id(rel) would be address-dependent, and
    # calling graph.id() here would mint node ids before the render
    # walk and scramble the numbering
    from itertools import combinations
    for rel, members in relation_groups.values():
        # ALL pairs, not just consecutive members: the reference's
        # RelationsGraph.edges yields combinations(items, 2)
        # (relations/graph.py), so a 3-node relation draws 3 edges
        for a, b in combinations(members, 2):
            graph.add_edge(a, b, Style(
                label=getattr(rel, 'label', 'rel'),
                dir='none', style='dashed'))
    return graph
