"""Gazetteer goldens — reference tests/test_pipeline.py."""

from yargy_spark import rule, Parser
from yargy_spark.pipelines import (pipeline, caseless_pipeline,
                                   morph_pipeline)


def test_pipelines():
    parser = Parser(rule(pipeline(['a b c', 'b c']), 'd'))
    assert parser.match('b c d')
    assert parser.match('a b c d')

    parser = Parser(rule(pipeline(['a b']).repeatable(), 'c'))
    assert parser.match('a b a b c')

    parser = Parser(rule(caseless_pipeline(['A B']), 'c'))
    assert parser.match('A b c')


def test_morph_pipeline_longest_wins():
    parser = Parser(morph_pipeline([
        'текст', 'текст песни', 'материал', 'информационный материал']))

    matches = list(parser.findall('текстом песни музыкальной группы'))
    assert len(matches) == 1
    assert [t.value for t in matches[0].tokens] == ['текстом', 'песни']

    matches = list(parser.findall('информационного материала под названием'))
    assert len(matches) == 1
    assert [t.value for t in matches[0].tokens] == \
        ['информационного', 'материала']


def test_morph_pipeline_mixed_tokens():
    parser = Parser(morph_pipeline(['1 B.']))
    assert parser.match('1 b .')


def test_morph_pipeline_inflections():
    parser = Parser(morph_pipeline(['электронный дневник']))
    text = 'электронным дневником, электронные дневники, электронное дневнику'
    got = [[t.value for t in m.tokens] for m in parser.findall(text)]
    assert got == [['электронным', 'дневником'],
                   ['электронные', 'дневники'],
                   ['электронное', 'дневнику']]


def test_caseless_pipeline_names():
    parser = Parser(caseless_pipeline([
        'Абд Аль-Азиз Бин Мухаммад', 'Абд ар-Рахман Наср ас-Са ди']))
    text = 'Абд Аль-Азиз Бин Мухаммад, АБД АР-РАХМАН НАСР АС-СА ДИ'
    got = [[t.value for t in m.tokens] for m in parser.findall(text)]
    assert got == [
        ['Абд', 'Аль', '-', 'Азиз', 'Бин', 'Мухаммад'],
        ['АБД', 'АР', '-', 'РАХМАН', 'НАСР', 'АС', '-', 'СА', 'ДИ']]


def test_morph_gazetteer_predicts_once_per_production():
    """A token whose several lemmas hit the same dictionary line must
    predict that production once — extract() (no span dedup) would
    otherwise yield duplicate parses."""
    from yargy_spark import Parser
    from yargy_spark.pipelines import morph_pipeline
    # 'стали' analyses to lemmas {'сталь','стать'}; index the line
    # under both by using the ambiguous word itself
    RULE = morph_pipeline(['стали'])
    matches = list(Parser(RULE).extract('мы стали лучше'))
    assert len(matches) == 1


def test_empty_dictionary_line_fails_loudly():
    """A blank or whitespace-only dictionary line (trailing newline in
    a file-loaded gazetteer) must name the offending line, not die
    with a bare IndexError inside grammar compilation."""
    import pytest
    from yargy_spark import Parser
    from yargy_spark.pipelines import morph_pipeline, pipeline
    with pytest.raises(ValueError, match="line ''"):
        Parser(pipeline(['иван', '']))
    with pytest.raises(ValueError, match='no words'):
        Parser(morph_pipeline(['красная площадь', '   ']))
