"""Predicate bank truth tables — reference tests/test_predicate.py and
the doctest mini-goldens in predicates/bank.py:81-507."""

import pytest

from yargy_spark import and_, or_, not_, Context
from yargy_spark.tokenizer import MorphTokenizer
from yargy_spark.predicates import (
    true, is_lower, is_upper, is_title, is_capitalized,
    eq, caseless, in_, in_caseless, length_eq, gte, lte,
    normalized, dictionary, gram, is_single, custom, type_)


TOKENIZER = MorphTokenizer()
CONTEXT = Context(TOKENIZER)


def toks(text):
    return list(TOKENIZER(text))


def active(pred):
    return pred.activate(CONTEXT)


def table(pred, text):
    return [pred(t) for t in toks(text)]


def test_simple_bank():
    assert table(true(), 'x') == [True]
    assert table(is_lower(), 'xxx Xxx') == [True, False]
    assert table(is_upper(), 'XXX xxx') == [True, False]
    assert table(is_title(), 'XXX Xxx') == [False, True]
    assert table(is_capitalized(), 'Xxx XXX xxX') == [True, True, False]
    assert table(eq('1'), '1') == [True]
    assert table(length_eq(3), 'XXX 123') == [True, True]
    assert table(gte(4), '3 5 C') == [False, True, False]
    assert table(lte(4), '3 5 C') == [True, False, False]
    assert table(caseless('Рано'), 'РАНО') == [True]
    assert table(in_({'S', 'M', 'L'}), 'S 1') == [True, False]
    assert table(in_caseless({'S', 'M', 'L'}), 'S m') == [True, True]


def test_morph_bank():
    assert table(active(normalized('сталь')), 'стали') == [True]
    assert table(active(normalized('стать')), 'стали') == [True]
    assert table(active(dictionary({'учитель', 'врач'})),
                 'учителя врачи') == [True, True]
    assert table(active(gram('NOUN')), 'стали') == [True]
    assert table(active(gram('VERB')), 'стали') == [True]
    assert table(is_single(), 'слово') == [True]


def test_type_and_custom():
    assert table(active(type_('INT')), '3 раза') == [True, False]
    from math import log
    f = lambda x: int(log(int(x), 10)) == 2  # noqa: E731
    assert table(active(custom(f, types='INT')), '12 123') == [False, True]


def test_composition():
    pred = or_(normalized('московским'),
               and_(gram('NOUN'), not_(gram('femn'))))
    pred = pred.activate(CONTEXT)
    assert table(pred, 'московский зоопарк') == [True, True]
    assert table(pred, 'московская погода') == [True, False]


def test_activation_checks():
    with pytest.raises(ValueError):
        active(gram('UNK'))
    with pytest.raises(ValueError):
        active(custom(lambda _: True, types='UNK'))


def test_gram_constrains_readings():
    pred = active(gram('VERB'))
    tok, = toks('стали')
    narrowed = pred.constrain(tok)
    assert [f.lemma for f in narrowed.forms] == ['стать']
