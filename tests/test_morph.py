"""Morphology goldens — reference tests/test_morph.py."""

import pytest

from yargy_spark.morph import default_morphology


@pytest.fixture(scope='module')
def morph():
    return default_morphology()


def test_forms(morph):
    forms = morph('сирота')
    assert [(f.lemma, f.grams) for f in forms] == [
        ('сирота', frozenset({'ms-f', 'NOUN', 'anim', 'nomn', 'sing'}))]
    f = forms[0]
    assert f.gender_bits & 8        # bi-gender
    assert f.is_single
    assert not f.case_fixed
    assert morph.normalized('стали') == {'сталь', 'стать'}


def test_inflect(morph):
    form = morph('Александру')[0]
    assert 'Name' in form.grams
    assert form.inflect() == 'александр'
    assert form.inflect({'nomn', 'plur'}) == 'александры'


def test_unknown_word_fallback(morph):
    forms = morph('Квазибуква')
    assert len(forms) == 1
    assert forms[0].lemma == 'квазибуква'
    assert forms[0].grams == frozenset()
    assert forms[0].inflect() == 'квазибуква'


def test_check_gram(morph):
    morph.check_gram('NOUN')
    with pytest.raises(ValueError):
        morph.check_gram('verb')
    with pytest.raises(ValueError):
        morph.check_gram('UNK2')
