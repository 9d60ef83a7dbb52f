"""Ambiguity-order, forest growth and parse budget — reference
docs/cookbook.ipynb cells 3-13 and the span DP."""

import pytest

from yargy_spark import rule, or_, Parser, ParseBudgetExceeded
from yargy_spark.kernel.spans import pick_max_coverage


def test_forest_growth():
    """cookbook cell 4: A -> a | a a; B -> A+ gives 89 full parses of
    'a '*10 (combinatorial ambiguity)."""
    A = or_(rule('a'), rule('a', 'a'))
    B = A.repeatable()
    parser = Parser(B)
    text = ('a ' * 10).strip()
    matches = [m for m in parser.extract(text)
               if m.span == (0, len(text))]
    assert len(matches) == 89


def test_parse_budget():
    """cookbook cells 5-7: the capped parser aborts blowups."""
    A = or_(rule('a'), rule('a', 'a'))
    parser = Parser(A.repeatable(), cap=100)
    with pytest.raises(ParseBudgetExceeded):
        parser.match('a ' * 20)


def test_or_rank_preference():
    """cookbook cells 8-13: earlier or_ branch wins on equal spans."""
    RULE = or_(rule('a', 'b'), rule('a'), rule('b'))
    parser = Parser(RULE)
    match = parser.match('a b')
    assert [t.value for t in match.tokens] == ['a', 'b']

    # reversed preference: single-token branches listed first still
    # lose to the full-span parse in match() (whole-text mode), but in
    # findall the max-coverage DP keeps the longest combination
    got = [[t.value for t in m.tokens] for m in parser.findall('a b')]
    assert got == [['a', 'b']]


def test_find_and_grammar_source():
    RULE = or_(rule('a', 'b'), rule('b'))
    parser = Parser(RULE)
    match = parser.find('x x a b y')
    assert match is not None and match.span == (4, 7)
    assert parser.find('x y z') is None
    assert parser.grammar_source == ["R0 -> 'a' 'b' | 'b'"]


def test_phone_email_rules():
    from yargy_spark.tokenizer import Tokenizer, EMAIL_RULE, PHONE_RULE
    tk = Tokenizer().add_rules(EMAIL_RULE, PHONE_RULE)
    values = tk.split('email: ab@mail.ru call: 8 915 132 54 76')
    assert values == ['email', ':', 'ab@mail.ru', 'call', ':',
                      ' 8 915 132 54 76']


def test_max_coverage_dp():
    spans = [(0, 5), (2, 13), (6, 13)]
    assert list(pick_max_coverage(spans)) == [(0, 5), (6, 13)]
    assert list(pick_max_coverage([])) == []
    assert list(pick_max_coverage([(0, 2)])) == [(0, 2)]
