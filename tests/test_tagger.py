"""BIO tagger golden — reference tests/test_tagger.py."""

from yargy_spark import Parser, Tagger
from yargy_spark.predicates import tag


class EveryThirdOutside(Tagger):
    tags = {'I', 'O'}

    def __call__(self, tokens):
        for index, token in enumerate(tokens):
            yield token.with_tag('O' if index % 3 == 0 else 'I')


def test_tagger():
    text = 'a b c d e f g'
    parser = Parser(tag('I').repeatable(), tagger=EveryThirdOutside())
    substrings = [text[m.span[0]:m.span[1]] for m in parser.findall(text)]
    assert substrings == ['b c', 'e f']
