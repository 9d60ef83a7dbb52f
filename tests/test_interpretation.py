"""Interpretation goldens — reference tests/test_interpretation.py
(all 25 cases)."""

import pytest

from yargy_spark import rule, Parser
from yargy_spark.predicates import eq
from yargy_spark.interpretation import (fact, attribute, normalized,
                                        inflected, const, custom)


def test_predicate_attribute():
    F = fact('F', ['a'])
    parser = Parser(rule(eq('a').interpretation(F.a)).interpretation(F))
    record = parser.match('a').fact
    assert record == F(a='a')
    assert record.spans == [(0, 1)]
    assert dict(record.as_json) == {'a': 'a'}


def test_merge_facts():
    F = fact('F', ['a', 'b'])
    A = rule(eq('a').interpretation(F.a)).interpretation(F)
    B = rule(eq('b').interpretation(F.b)).interpretation(F)
    record = Parser(rule(A, B).interpretation(F)).match('a b').fact
    assert record == F(a='a', b='b')
    assert record.spans == [(0, 1), (2, 3)]
    assert dict(record.as_json) == {'a': 'a', 'b': 'b'}


def test_rule_attribute():
    F = fact('F', ['a'])
    parser = Parser(rule('a', 'A').interpretation(F.a).interpretation(F))
    record = parser.match('a   A').fact
    assert record == F(a='a A')
    assert record.spans == [(0, 5)]
    assert dict(record.as_json) == {'a': 'a A'}


def test_attr_under_attr_disappears():
    F = fact('F', ['a', 'b'])
    parser = Parser(rule(eq('a').interpretation(F.a))
                    .interpretation(F.b).interpretation(F))
    record = parser.match('a').fact
    assert record == F(a=None, b='a')
    assert dict(record.as_json) == {'b': 'a'}


def test_nested_facts():
    F = fact('F', ['a'])
    G = fact('G', ['b'])
    parser = Parser(rule(eq('a').interpretation(F.a))
                    .interpretation(F).interpretation(G.b)
                    .interpretation(G))
    record = parser.match('a').fact
    assert record == G(b=F(a='a'))
    assert record.spans == [(0, 1)]
    assert dict(record.as_json) == {'b': {'a': 'a'}}


def test_custom_chains():
    F = fact('F', ['a'])
    parser = Parser(rule('1').interpretation(custom(int))
                    .interpretation(F.a).interpretation(F))
    assert parser.match('1').fact == F(a=1)

    parser = Parser(rule('1').interpretation(F.a)
                    .interpretation(custom(int)))
    assert parser.match('1').fact == 1

    parser = Parser(rule('3', '.', '14').interpretation(custom(float)))
    assert parser.match('3.14').fact == 3.14

    MAPPING = {'a': 1}
    parser = Parser(rule('A').interpretation(
        custom(str.lower).custom(MAPPING.get)))
    assert parser.match('A').fact == 1


def test_normalized_inflected_const():
    assert Parser(rule('московским').interpretation(normalized())) \
        .match('московским').fact == 'московский'
    assert Parser(rule('московским').interpretation(
        inflected({'nomn', 'femn'}))).match('московским').fact == \
        'московская'
    assert Parser(rule('a').interpretation(const(1))).match('a').fact == 1


def test_bare_attribute():
    F = fact('F', 'a')
    assert Parser(rule('a').interpretation(F.a)).match('a').fact == 'a'


def test_month_normalizers():
    MONTHS = {'январь': 1}
    F = fact('F', ['a'])
    assert Parser(rule('январе').interpretation(
        normalized().custom(MONTHS.get))).match('январе').fact == 1
    assert Parser(rule('январе').interpretation(
        F.a.inflected({'nomn', 'sing'}).custom(MONTHS.get))
        .interpretation(F)).match('январе').fact == F(a=1)
    assert Parser(rule('январе').interpretation(
        F.a.normalized().custom(MONTHS.get))
        .interpretation(F)).match('январе').fact == F(a=1)
    assert Parser(rule('январе').interpretation(
        inflected({'nomn', 'sing'}).custom(MONTHS.get))) \
        .match('январе').fact == 1


def test_attribute_custom():
    F = fact('F', 'a')
    record = Parser(rule('1').interpretation(F.a.custom(int))
                    .interpretation(F)).match('1').fact
    assert record == F(a=1)
    assert record.spans == [(0, 1)]
    assert dict(record.as_json) == {'a': 1}

    MAPPING = {'a': 1}
    record = Parser(rule('A').interpretation(
        F.a.custom(str.lower).custom(MAPPING.get))
        .interpretation(F)).match('A').fact
    assert record == F(a=1)


def test_attribute_normalized():
    F = fact('F', 'a')
    record = Parser(rule('январе').interpretation(F.a.normalized())
                    .interpretation(F)).match('январе').fact
    assert record == F(a='январь')
    assert record.spans == [(0, 6)]
    assert dict(record.as_json) == {'a': 'январь'}


def test_attribute_const():
    F = fact('F', 'a')
    assert Parser(rule('январь').interpretation(F.a.const(1))) \
        .match('январь').fact == 1


def test_attribute_inflected():
    F = fact('F', 'a')
    record = Parser(rule('январе').interpretation(
        F.a.inflected({'nomn', 'plur'})).interpretation(F)) \
        .match('январе').fact
    assert record == F(a='январи')
    assert dict(record.as_json) == {'a': 'январи'}


def test_repeatable():
    F = fact('F', [attribute('a').repeatable()])
    parser = Parser(rule(eq('a').interpretation(F.a),
                         eq('b').interpretation(F.a)).interpretation(F))
    record = parser.match('a b').fact
    assert record == F(a=['a', 'b'])
    assert record.spans == [(0, 1), (2, 3)]
    assert dict(record.as_json) == {'a': ['a', 'b']}


def test_type_errors():
    F = fact('F', ['a'])
    parser = Parser(rule('a', eq('1').interpretation(custom(int)))
                    .interpretation(F.a))
    match = parser.match('a 1')
    with pytest.raises(TypeError):
        match.fact

    parser = Parser(rule('a', eq('1').interpretation(custom(int)))
                    .interpretation(custom(str)))
    match = parser.match('a 1')
    with pytest.raises(TypeError):
        match.fact


def test_pipeline_key():
    from yargy_spark.pipelines import morph_pipeline

    pipe = morph_pipeline(['закрытое общество', 'завод'])
    F = fact('F', ['a'])

    parser = Parser(pipe.interpretation(F.a.normalized())
                    .interpretation(F))
    assert parser.match('закрытом обществе').fact == \
        F(a='закрытое общество')

    parser = Parser(pipe.interpretation(normalized()))
    assert parser.match('заводе').fact == 'завод'


def test_const_over_structured_children_has_no_span():
    """Regression: const() whose children are all structured results
    must not crash span extraction; it contributes no span."""
    from yargy_spark import Parser, rule
    from yargy_spark.interpretation import fact
    F_ = fact('F', ['a', 'b'])
    RULE = rule(rule('y').interpretation(F_.a)).interpretation(
        F_.b.const('FLAG')).interpretation(F_)
    m = Parser(RULE).match('y')
    # attr-under-attr: the inner attribute disappears
    # (interpretator.py:167-168), so only the const survives — and a
    # const carries no surface span
    assert m.fact == F_(a=None, b='FLAG')
    assert list(m.fact.spans) == []
