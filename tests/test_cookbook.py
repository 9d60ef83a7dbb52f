"""Cookbook behavior specs — reference docs/cookbook.ipynb."""

import pytest

from yargy_spark import Parser, rule, or_, not_, Tagger
from yargy_spark.interpretation import fact
from yargy_spark.predicates import caseless, eq, tag
from yargy_spark.pipelines import morph_pipeline
from yargy_spark.tokenizer import MorphTokenizer


def test_recursive_grammar_bnf():
    """cell 3: A -> a | a a; B -> A+ normalizes to the two-rule BNF."""
    A = or_(rule('a'), rule('a', 'a'))
    B = A.repeatable()
    assert list(B.normalized.as_bnf.source) == [
        'R0 -> R1 R0 | R1', "R1 -> 'a' | 'a' 'a'"]
    parser = Parser(B)
    full = [m for m in parser.extract('a a a')
            if len(m.tokens) == 3]
    assert len(full) == 3   # (a)(a)(a), (a)(a a), (a a)(a)


def test_or_order_preference():
    """cells 10-12: leftmost derivation follows or_ argument order."""
    def first_group(branch_order):
        A = or_(*branch_order)
        match = Parser(A.repeatable()).match('a a a')
        # R0 -> R1 R0 | R1: the first child is the leading A-group;
        # its leaf count tells whether the parse starts (a) or (a a)
        first_r1 = match.tree.root.children[0]
        return len(first_r1.children)

    assert first_group([rule('a'), rule('a', 'a')]) == 1   # (a)(a)(a)
    assert first_group([rule('a', 'a'), rule('a')]) == 2   # (a a)(a)


def test_proxy_fact_for_or():
    """cells 19-23: or_ of two interpreted rules needs a proxy root."""
    F = fact('F', ['a'])
    G = fact('G', ['b'])
    A = rule('a').interpretation(F.a).interpretation(F)
    B = rule('b').interpretation(G.b).interpretation(G)

    match = Parser(or_(A, B)).match('a')
    with pytest.raises(ValueError):
        match.fact

    Proxy = fact('Proxy', ['value'])
    C = or_(A, B).interpretation(Proxy.value).interpretation(Proxy)
    match = Parser(C).match('a')
    assert match.fact.value == F(a='a')


def test_mixed_or_types_raise():
    """cells 26-28."""
    A = rule('a')
    B = caseless('b')
    with pytest.raises(TypeError):
        or_(A, B)
    or_(A, rule(B))  # wrapping fixes it


def test_bio_tagger_extraction():
    """cells 31-33: external BIO tags drive extraction."""
    text = '15 апреля в Симферополе Леонид Рожков ...'
    tags = 'B I O B B I O'.split()

    class BioTagger(Tagger):
        tags = {'B', 'I', 'O'}

        def __call__(self, tokens):
            for token, t in zip(tokens, tags):
                yield token.tagged(t)

    RULE = rule(tag('B'), tag('I').repeatable().optional())
    parser = Parser(RULE, tagger=BioTagger())
    got = [[t.value for t in m.tokens] for m in parser.findall(text)]
    assert got == [['15', 'апреля'], ['Симферополе'],
                   ['Леонид', 'Рожков']]


def test_two_pass_with_shared_tokens():
    """cells 14-16, 36: tokenize once, parse twice (the tokens= API
    replaces the reference's IdTokenizer wrapper)."""
    tokenizer = MorphTokenizer().remove_types('EOL')
    text = 'взыскать пени и неустойку'
    tokens = list(tokenizer(text))

    PAYMENT = morph_pipeline(['пени', 'неустойка'])
    parser = Parser(PAYMENT, tokenizer=tokenizer)
    spans = [m.span for m in parser.findall(text, tokens=tokens)]
    assert spans == [(9, 13), (16, 25)]

    kept = [t for t in tokens
            if any(s <= t.start and t.stop <= e for s, e in spans)]
    parser2 = Parser(PAYMENT.repeatable(), tokenizer=tokenizer)
    match = parser2.match('', tokens=kept)
    assert match is not None
    assert [t.value for t in match.tokens] == ['пени', 'неустойку']


def test_generated_bounded_rules():
    """cell 39: rules as Python-generated values."""
    def bounded(start, stop):
        return rule(eq(start), not_(eq(stop)).repeatable(), eq(stop))

    BOUNDED = or_(bounded('[', ']'), bounded('«', '»'))
    got = [[t.value for t in m.tokens]
           for m in Parser(BOUNDED).findall('[a b] {c d} «e f»')]
    assert got == [['[', 'a', 'b', ']'], ['«', 'e', 'f', '»']]
