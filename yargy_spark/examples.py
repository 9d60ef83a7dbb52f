"""Extra extractors for agent-transcript corpora, demonstrating the
per-extractor tokenizer/tagger surface at the corpus level
(SURVEY.md §2.2: custom TokenRule / TagToken):

* ``email``: EMAIL token rule (reference tokenizer.py:25-29) via a
  custom tokenizer on the extractor.
* ``tool``: tool-name mentions driven by a keyword Tagger (the
  reference's external-tagging pattern, docs/cookbook.ipynb
  cells 30-33) — relevant to the ``tool`` column of the transcript
  schema.

Not part of the default bank (the golden/bench corpora pin that);
compose with ``CompiledBank(extractors={**EXTRACTORS, **EXTRA})``.
"""

from __future__ import annotations

from . import Tagger, rule
from .extractors import Extractor
from .interpretation import fact
from .predicates import tag, type_
from .tokenizer import EMAIL_RULE, MorphTokenizer

Email = fact('Email', ['addr'])
Tool = fact('Tool', ['name'])

TOOL_WORDS = frozenset({'bash', 'python', 'grep', 'sed', 'awk',
                        'spark', 'sql'})


def build_email():
    return rule(type_('EMAIL').interpretation(Email.addr)) \
        .interpretation(Email)


class ToolTagger(Tagger):
    tags = {'TOOL', 'O'}

    def __call__(self, tokens):
        for t in tokens:
            yield t.tagged('TOOL' if t.value.lower() in TOOL_WORDS
                           else 'O')


def build_tool():
    return rule(tag('TOOL').interpretation(Tool.name)) \
        .interpretation(Tool)


EXTRA = {
    'email': Extractor('email', 'Email', build_email, trigger=r'@',
                       tokenizer=MorphTokenizer()
                       .add_rules(EMAIL_RULE)),
    'tool': Extractor('tool', 'Tool', build_tool,
                      tagger=ToolTagger()),
}
