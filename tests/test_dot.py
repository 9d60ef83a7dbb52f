"""DOT sink goldens: rule DAG and parse-tree dumps (reference
dot.py:18-170, tree/transformators.py:129-169,
rule/constructors.py:119-122)."""


def test_rule_as_dot_person():
    from yargy_spark.extractors import build_person
    src = build_person().as_dot.source
    assert src.startswith('digraph G {')
    assert src.rstrip().endswith('}')
    assert 'Interpretation(Person)' in src
    assert 'fillcolor="#dbdb8d"' in src      # interp nodes green
    assert 'label="Pipeline"' in src         # position gazetteer
    assert 'Relation(gnc)' in src
    assert '->' in src
    # deterministic output
    assert src == build_person().as_dot.source


def test_rule_as_dot_quantifiers():
    from yargy_spark import rule
    r = rule('a').repeatable(min=2, max=3)
    src = r.as_dot.source
    assert 'Repeatable(min=2, max=3)' in src
    opt = rule('b').optional()
    assert 'label="Optional"' in opt.as_dot.source


def test_chart_introspection():
    """Chart debug dump (reference parser.py Chart.source): per-column
    dotted states in '[start:stop] NAME -> a $ b' form."""
    from yargy_spark import Parser, rule
    from yargy_spark.predicates import gram
    p = Parser(rule(gram('Name'), gram('Surn')).named('NAME'))
    chart = p.chart('пришел Иван Ульянов')
    src = list(chart.source)
    assert "[1:1] NAME -> $ gram('Name') gram('Surn')" in src
    assert "[1:3] NAME -> gram('Name') gram('Surn') $" in src
    assert len(list(chart.matches(p.rule))) == 1
    assert chart.last_column.index == 3
    assert chart[0].token is None


def test_tree_as_dot_person():
    from yargy_spark import Parser
    from yargy_spark.extractors import build_person
    p = Parser(build_person())
    match = list(p.findall('управляющий директор Иван Ульянов'))[0]
    src = match.tree.as_dot.source
    # leaves carry token values
    for word in ('Иван', 'Ульянов', 'директор', 'управляющий'):
        assert 'label="%s"' % word in src
    # interpretation nodes green with slot labels
    assert 'Person.position' in src
    assert 'Name.first' in src
    # agreement relations render as dashed undirected edges — ALL
    # member pairs (reference RelationsGraph.edges = combinations):
    # the gnc relation spans 3 nodes here -> C(3,2) = 3 edges
    assert src.count('style="dashed"') == 3
    assert 'label="gnc"' in src
    assert src == list(Parser(build_person()).findall(
        'управляющий директор Иван Ульянов'))[0].tree.as_dot.source


def test_svg_rendering():
    """Pure-Python SVG affordance (reference: graphviz _repr_svg_):
    valid XML, one rect+label per node, one line per edge, dashed
    relation edges, deterministic bytes, no graphviz needed."""
    import xml.etree.ElementTree as ET
    from yargy_spark.extractors import build_person

    graph = build_person().as_dot
    svg = graph.svg
    assert svg == graph._repr_svg_() == build_person().as_dot.svg
    root = ET.fromstring(svg)
    ns = '{http://www.w3.org/2000/svg}'
    rects = root.findall('%srect' % ns)
    lines = root.findall('%sline' % ns)
    texts = root.findall('%stext' % ns)
    assert len(rects) == len(graph.nodes)
    assert len(lines) >= len(graph.edges)   # + dashed labels are text
    labels = ' '.join(t.text or '' for t in texts)
    assert 'Interpretation(Person)' in labels
    # interp nodes keep their green fill
    assert any(r.get('fill') == '#dbdb8d' for r in rects)

    # parse-tree SVG: dashed relation edges present
    from yargy_spark import Parser
    p = Parser(build_person())
    m = next(iter(p.findall('управляющий директор Иван Ульянов')),
             None)
    assert m is not None
    tsvg = m.tree.as_dot.svg
    troot = ET.fromstring(tsvg)
    dash = [ln for ln in troot.findall('%sline' % ns)
            if ln.get('stroke-dasharray')]
    assert dash, 'relation pairs render dashed'
    tlabels = ' '.join(t.text or ''
                       for t in troot.findall('%stext' % ns))
    assert 'Иван' in tlabels and 'Ульянов' in tlabels


def test_svg_recursive_grammar():
    """Review regression: a forward()-defined recursive grammar must
    render SVG (the x-placement walk is iterative with back-edge
    skipping — RecursionError before the fix)."""
    import xml.etree.ElementTree as ET
    from yargy_spark import forward, or_, rule
    from yargy_spark.kernel.dot import rule_dot
    R = forward()
    R.define(or_(rule('b', R), rule('a')))
    g = rule_dot(R)
    svg = g.svg
    ET.fromstring(svg)
    assert svg == rule_dot(R).svg          # deterministic
    assert svg.count('<rect') == len(g.nodes)
