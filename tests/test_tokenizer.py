"""Tokenizer goldens — reference tests/test_tokenizer.py:30-101."""

import pytest

from yargy_spark.tokenizer import (EMAIL_RULE, MorphTokenizer, Tokenizer)
from yargy_spark.kernel.tokenize import render_tokens


def test_types():
    tk = Tokenizer()
    got = [(t.value, t.span, t.type) for t in tk('Ростов-на-Дону')]
    assert got == [
        ('Ростов', (0, 6), 'RU'),
        ('-', (6, 7), 'PUNCT'),
        ('на', (7, 9), 'RU'),
        ('-', (9, 10), 'PUNCT'),
        ('Дону', (10, 14), 'RU'),
    ]

    got = [(t.value, t.span, t.type) for t in tk('vk.com')]
    assert got == [('vk', (0, 2), 'LATIN'), ('.', (2, 3), 'PUNCT'),
                   ('com', (3, 6), 'LATIN')]

    got = [(t.value, t.span, t.type) for t in tk('1 500 000$')]
    assert got == [('1', (0, 1), 'INT'), ('500', (2, 5), 'INT'),
                   ('000', (6, 9), 'INT'), ('$', (9, 10), 'PUNCT')]

    got = [(t.value, t.span, t.type) for t in tk('π')]
    assert got == [('π', (0, 1), 'OTHER')]


def test_check_type():
    tk = Tokenizer()
    with pytest.raises(ValueError):
        tk.check_type('UNK')
    tk.remove_types('EOL')
    with pytest.raises(ValueError):
        tk.check_type('EOL')


def test_change_rules():
    assert Tokenizer().add_rules(EMAIL_RULE).split('mailto:me@host.ru') == \
        ['mailto', ':', 'me@host.ru']
    assert Tokenizer().remove_types('EOL').split('\nhi,\n\nthe\n') == \
        ['hi', ',', 'the']


def test_morph_decoration():
    toks = list(MorphTokenizer()('dvd-диски'))
    assert [(t.value, t.type) for t in toks] == [
        ('dvd', 'LATIN'), ('-', 'PUNCT'), ('диски', 'RU')]
    forms = toks[2].forms
    assert [(f.lemma, f.grams) for f in forms] == [
        ('диск', frozenset({'NOUN', 'accs', 'inan', 'masc', 'plur'})),
        ('диск', frozenset({'NOUN', 'inan', 'masc', 'nomn', 'plur'})),
    ]


def test_join_tokens():
    toks = list(Tokenizer()('pi =        3.14'))
    assert render_tokens(toks) == 'pi = 3.14'
