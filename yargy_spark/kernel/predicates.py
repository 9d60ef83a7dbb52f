"""Token predicates: the terminal symbols of the grammar.

Semantics parity: /root/reference/yargy/predicates/bank.py (the full
``__all__`` bank at bank.py:18-38) and predicates/constructors.py
(two-phase scheme->activate design at constructors.py:35-53; context is
tokenizer+tagger).  Every predicate is a pure function of one token, so
on the Spark side a batch of tokens turns each distinct predicate into
one vectorized boolean mask; the Earley scan then consumes mask lookups
(SURVEY.md §2.4).

Labels must match the reference's BNF rendering (tests/test_rule.py):
``eq`` -> ``'a'``, ``gram`` -> ``gram('NOUN')`` etc.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

from .tokenize import T_INT, Tok


class Pred:
    """Base predicate. ``activate`` binds a scheme to the parsing
    context (morph/tokenizer/tagger); default is already-bound."""

    def __call__(self, tok: Tok) -> bool:
        raise NotImplementedError

    def activate(self, context) -> 'Pred':
        return self

    def constrain(self, tok: Tok) -> Tok:
        """Narrow morphological readings on match (gram/is_single)."""
        return tok

    @property
    def label(self) -> str:
        # NOT `type(self)`: this module exports a builtin-shadowing
        # module-global `type` for reference API parity, which would
        # resolve here and crash
        return self.__class__.__name__ + '(...)'

    # --- rule-building sugar (predicates/constructors.py:12-33) -----
    def _as_rule(self):
        from .grammar import seq
        return seq(self)

    def optional(self, reverse=False):
        return self._as_rule().optional(reverse)

    def repeatable(self, min=None, max=None, reverse=False):
        return self._as_rule().repeatable(min=min, max=max, reverse=reverse)

    def named(self, name):
        return self._as_rule().named(name)

    def interpretation(self, item):
        return self._as_rule().interpretation(item)

    def match(self, relation):
        return self._as_rule().match(relation)


def is_predicate(item) -> bool:
    return isinstance(item, Pred)


def _t(text):
    """Doctest helper: first morph-decorated token of ``text``
    (the reference's executable-docs affordance, bank.py:81-507 run
    via --doctest-modules; here tests/test_doctests.py runs them).

    >>> _t('слово').value
    'слово'
    """
    from .tokenize import MorphTokenSpec
    return next(iter(MorphTokenSpec()(text)))


def _ctx():
    """Doctest helper: an activation context over the default
    tokenizer (schemes bind against it, constructors.py:35-53)."""
    from .earley import Context
    from .tokenize import MorphTokenSpec
    return Context(MorphTokenSpec())


# ---------------------------------------------------------------- simple

class true(Pred):
    """Always matches (bank.py:81-91).

    >>> true()(_t('любой'))
    True
    """

    def __call__(self, tok):
        return True

    label = 'true()'


class is_lower(Pred):
    """
    >>> is_lower()(_t('слово'))
    True
    >>> is_lower()(_t('Слово'))
    False
    """

    def __call__(self, tok):
        return tok.value.islower()


class is_upper(Pred):
    """
    >>> is_upper()(_t('СЛОВО'))
    True
    >>> is_upper()(_t('Слово'))
    False
    """

    def __call__(self, tok):
        return tok.value.isupper()


class is_title(Pred):
    """
    >>> is_title()(_t('Слово'))
    True
    >>> is_title()(_t('СЛОВО'))
    False
    """

    def __call__(self, tok):
        return tok.value.istitle()


class is_capitalized(Pred):
    """First character is uppercase (bank.py:142-157).

    >>> is_capitalized()(_t('Шварцнегер'))
    True
    >>> is_capitalized()(_t('слово'))
    False
    """

    def __call__(self, tok):
        return tok.value[0].isupper()


class eq(Pred):
    """
    >>> eq('1')(_t('1'))
    True
    >>> eq('1')(_t('2'))
    False
    """

    def __init__(self, value: str):
        self.value = value

    def __call__(self, tok):
        return tok.value == self.value

    @property
    def label(self):
        return "'%s'" % self.value


class caseless(Pred):
    """
    >>> caseless('рано')(_t('РАНО'))
    True
    """

    def __init__(self, value: str):
        self.value = value.lower()

    def __call__(self, tok):
        return tok.value.lower() == self.value

    @property
    def label(self):
        return "caseless('%s')" % self.value


class in_(Pred):
    """
    >>> in_({'a', 'b'})(_t('a'))
    True
    >>> in_({'a', 'b'})(_t('c'))
    False
    """

    def __init__(self, values):
        self.values = values

    def __call__(self, tok):
        return tok.value in self.values

    label = 'in_(...)'


class in_caseless(Pred):
    def __init__(self, values):
        self.values = {v.lower() for v in values}

    def __call__(self, tok):
        return tok.value.lower() in self.values

    label = 'in_caseless(...)'


class length_eq(Pred):
    def __init__(self, n: int):
        self.n = n

    def __call__(self, tok):
        return len(tok.value) == self.n

    @property
    def label(self):
        return 'length_eq(%d)' % self.n


class gte(Pred):
    """int(value) >= n; only fires on INT tokens
    (bank.py:41-49, 176-216).

    >>> gte(10)(_t('11'))
    True
    >>> gte(10)(_t('9'))
    False
    """

    def __init__(self, n: int):
        self.n = n

    def __call__(self, tok):
        return tok.type == T_INT and int(tok.value) >= self.n

    @property
    def label(self):
        return 'gte(%d)' % self.n


class lte(Pred):
    def __init__(self, n: int):
        self.n = n

    def __call__(self, tok):
        return tok.type == T_INT and int(tok.value) <= self.n

    @property
    def label(self):
        return 'lte(%d)' % self.n


# ------------------------------------------------------------ morph-bound

class LemmaIn(Pred):
    """Bound form of normalized()/dictionary(): any reading's lemma is
    in the expanded lemma set; non-morph tokens compare lowercase
    surface (bank.py:334-347)."""

    def __init__(self, lemmas):
        self.lemmas = lemmas

    def __call__(self, tok):
        if tok.forms:
            return any(f.lemma in self.lemmas for f in tok.forms)
        return tok.value.lower() in self.lemmas

    label = 'dictionary(...)'


class normalized(Pred):
    """Scheme: expands ``value``'s lemma set via morph at activation
    (bank.py:293-308) — 'сталь' also matches 'стали'.

    >>> normalized('сталь').activate(_ctx())(_t('стали'))
    True
    >>> normalized('железо').activate(_ctx())(_t('стали'))
    False
    """

    def __init__(self, value: str):
        self.value = value

    def activate(self, context):
        return LemmaIn(context.tokenizer.morph.normalized(self.value))

    @property
    def label(self):
        return "normalized('%s')" % self.value


class dictionary(Pred):
    """Scheme: union of lemma sets of all items (bank.py:311-331).

    >>> dictionary({'сталь'}).activate(_ctx())(_t('стали'))
    True
    """

    def __init__(self, values: Iterable[str]):
        self.values = values

    def activate(self, context):
        lemmas = set()
        morph = context.tokenizer.morph
        for value in self.values:
            lemmas.update(morph.normalized(value))
        return LemmaIn(lemmas)

    label = 'dictionary(...)'


class HasGram(Pred):
    """Bound gram(): any reading carries the grammeme; match narrows
    the readings to those carrying it (bank.py:368-384)."""

    def __init__(self, value: str):
        self.value = value

    def __call__(self, tok):
        if not tok.forms:
            return False
        return any(self.value in f.grams for f in tok.forms)

    def constrain(self, tok):
        return tok.constrained(
            [f for f in tok.forms if self.value in f.grams])

    @property
    def label(self):
        return "gram('%s')" % self.value


class gram(Pred):
    """
    >>> gram('NOUN').activate(_ctx())(_t('стали'))
    True
    >>> gram('Name').activate(_ctx())(_t('Иван'))
    True
    >>> gram('UNKNOWN-GRAM').activate(_ctx())
    Traceback (most recent call last):
     ...
    ValueError: UNKNOWN-GRAM
    """

    def __init__(self, value: str):
        self.value = value

    def activate(self, context):
        context.tokenizer.morph.check_gram(self.value)
        return HasGram(self.value)

    @property
    def label(self):
        return "gram('%s')" % self.value


class is_single(Pred):
    """Any reading is singular (sing or Sgtm); constrains readings
    (bank.py:434-459).

    >>> is_single()(_t('диск'))
    True
    """

    def __call__(self, tok):
        if not tok.forms:
            return False
        return any(f.is_single for f in tok.forms)

    def constrain(self, tok):
        return tok.constrained([f for f in tok.forms if f.is_single])

    label = 'is_single()'


# ------------------------------------------------------------- type / tag

class TypeIs(Pred):
    def __init__(self, value: str):
        self.value = value

    def __call__(self, tok):
        return tok.type == self.value

    @property
    def label(self):
        return 'type(%r)' % self.value


class type_(Pred):
    """Token type equals value; validated against tokenizer types at
    activation (bank.py:387-410).

    >>> type_('INT').activate(_ctx())(_t('3'))
    True
    >>> type_('INT').activate(_ctx())(_t('слово'))
    False
    """

    def __init__(self, value: str):
        self.value = value

    def activate(self, context):
        context.tokenizer.check_type(self.value)
        return TypeIs(self.value)

    @property
    def label(self):
        return 'type(%r)' % self.value


class TagIs(Pred):
    def __init__(self, value: str):
        self.value = value

    def __call__(self, tok):
        return tok.tag == self.value

    @property
    def label(self):
        return 'tag(%r)' % self.value


class tag(Pred):
    def __init__(self, value: str):
        self.value = value

    def activate(self, context):
        if not context.tagger or not context.tagger.check_tag(self.value):
            raise ValueError(self.value)
        return TagIs(self.value)

    @property
    def label(self):
        return 'tag(%r)' % self.value


# ----------------------------------------------------------------- custom

class FnPred(Pred):
    def __init__(self, function: Callable[[str], bool], types):
        self.function = function
        self.types = types

    def __call__(self, tok):
        if self.types and tok.type not in self.types:
            return False
        return self.function(tok.value)

    @property
    def label(self):
        return 'custom(%s)' % getattr(self.function, '__name__', 'fn')


class custom(Pred):
    """Arbitrary ``f(value)`` with optional token-type guard
    (bank.py:462-507) — the reference's scalar-UDF analog.

    >>> even = lambda v: int(v) % 2 == 0
    >>> custom(even, types='INT').activate(_ctx())(_t('4'))
    True
    >>> custom(even, types='INT').activate(_ctx())(_t('слово'))
    False
    """

    def __init__(self, function, types=None):
        self.function = function
        if types is not None and not isinstance(types, (tuple, list)):
            types = [types]
        self.types = types

    def activate(self, context):
        if self.types:
            for t in self.types:
                context.tokenizer.check_type(t)
        return FnPred(self.function, self.types)

    @property
    def label(self):
        return 'custom(%s)' % getattr(self.function, '__name__', 'fn')


# ------------------------------------------------------------ composition

class AndPred(Pred):
    def __init__(self, preds):
        self.preds = list(preds)

    def __call__(self, tok):
        return all(p(tok) for p in self.preds)

    def activate(self, context):
        return AndPred(p.activate(context) for p in self.preds)

    @property
    def label(self):
        return 'and_(%s)' % ', '.join(p.label for p in self.preds)


class OrPred(Pred):
    def __init__(self, preds):
        self.preds = list(preds)

    def __call__(self, tok):
        return any(p(tok) for p in self.preds)

    def activate(self, context):
        return OrPred(p.activate(context) for p in self.preds)

    @property
    def label(self):
        return 'or_(%s)' % ', '.join(p.label for p in self.preds)


class NotPred(Pred):
    def __init__(self, pred):
        self.pred = pred

    def __call__(self, tok):
        return not self.pred(tok)

    def activate(self, context):
        return NotPred(self.pred.activate(context))

    @property
    def label(self):
        return 'not_(%s)' % self.pred.label


# reference exports the builtin-shadowing name ``type`` too
globals()['type'] = type_
