"""Interpretation: parse tree -> typed fact records.

Semantics parity: /root/reference/yargy/interpretation/* —
  - dynamic fact record types           fact.py:52-67
  - attribute schemes / defaults /
    repeatable attributes               attribute.py:19-39
  - normalizers (normalized/inflected/
    const/custom, chaining)             normalizer.py:19-116
  - interpretator semantics: token
    chains, slot filling (rightmost
    non-repeatable wins), same-scheme
    fact merge, attr-under-attr
    disappears, mixed children raise    interpretator.py:39-261
Golden contract: tests/test_interpretation.py (all 25 cases).

On the Spark side each canonical fact type maps to a fixed StructType;
facts serialize to JSON inside the extraction UDF and are re-typed with
``from_json`` at the DataFrame level (see operators/extract.py).
"""

from __future__ import annotations

import copyreg
from collections import OrderedDict
from typing import Any, Dict, List, Optional

from .tokenize import (Tok, render_inflected, render_lemmas,
                       render_tokens)


# ===================================================================
# Fact record types
# ===================================================================

class FactBase:
    """Base for dynamically created fact classes; equality is by class
    and attribute values (fact.py:10-41)."""

    __fields__: List[str] = []
    _work = None  # the WorkingFact that produced this instance

    def __init__(self, **kwargs):
        for key in kwargs:
            if key not in self.__fields__:
                raise KeyError(key)
        for key in self.__fields__:
            if key in kwargs:
                value = kwargs[key]
            else:
                scheme = getattr(type(self), key)
                value = [] if isinstance(scheme, RepeatableSlot) \
                    else scheme.default
            setattr(self, key, value)

    def __eq__(self, other):
        return (type(self) is type(other)
                and all(getattr(self, k) == getattr(other, k)
                        for k in self.__fields__))

    def __ne__(self, other):
        return not self == other

    def __repr__(self):
        args = ', '.join('%s=%r' % (k, getattr(self, k))
                         for k in self.__fields__)
        return '%s(%s)' % (type(self).__name__, args)

    @property
    def as_json(self):
        return self._work.as_json

    @property
    def spans(self):
        return sorted(self._work.spans, key=lambda s: s[0])


class AttrSpec:
    """Pre-binding attribute declaration: ``attribute(name, default)``
    (attribute.py:19-30)."""

    def __init__(self, name: str, default=None):
        self.name = name
        self.default = default

    def repeatable(self) -> 'RepeatableAttrSpec':
        if self.default is not None:
            raise ValueError('repeatable attribute cannot have a default')
        return RepeatableAttrSpec(self.name)


class RepeatableAttrSpec:
    def __init__(self, name: str):
        self.name = name


def attribute(name: str, default=None) -> AttrSpec:
    return AttrSpec(name, default)


class Slot:
    """Fact-bound attribute: ``F.a``.  Fluent normalizer builders hang
    off it (attribute.py:61-96)."""

    def __init__(self, fact_cls, name: str, default=None):
        self.fact_cls = fact_cls
        self.name = name
        self.default = default

    @property
    def label(self) -> str:
        return '%s.%s' % (self.fact_cls.__name__, self.name)

    def normalized(self) -> 'SlotNorm':
        return SlotNorm(self, LemmaJoin())

    def inflected(self, grams=None) -> 'SlotNorm':
        return SlotNorm(self, InflectTo(grams or {'nomn', 'sing'}))

    def const(self, value) -> 'SlotNorm':
        return SlotNorm(self, ConstVal(value))

    def custom(self, function) -> 'SlotNorm':
        return SlotNorm(self, ApplyFn(function))


class RepeatableSlot(Slot):
    pass


class SlotNorm:
    """Attribute + normalizer pair, e.g. ``F.a.normalized()``; supports
    one further ``.custom(f)`` chain (attribute.py:98-191)."""

    def __init__(self, slot: Slot, normalizer: 'NormalizerBase'):
        self.slot = slot
        self.normalizer = normalizer

    def custom(self, function) -> 'SlotNorm':
        return SlotNorm(self.slot, self.normalizer.then(function))

    @property
    def label(self) -> str:
        return '%s.%s' % (self.slot.label, self.normalizer.label)


class FactMeta(type):
    """Marker metaclass for dynamically created fact classes; a copyreg
    reducer (below) makes the classes picklable as (name, field spec) —
    required because compiled grammars holding fact classes are
    broadcast to Spark executors — and the registry guarantees the same
    class object per process so identity-based equality keeps working."""


_FACT_REGISTRY: Dict[tuple, type] = {}


def _restore_fact_class(name: str, spec: tuple) -> type:
    key = (name, spec)
    cls = _FACT_REGISTRY.get(key)
    if cls is None:
        cls = FactMeta(str(name), (FactBase,),
                       {'__fields__': [], '_work': None,
                        '__factspec__': spec})
        for field, default, repeat in spec:
            cls.__fields__.append(field)
            slot = (RepeatableSlot(cls, field) if repeat
                    else Slot(cls, field, default))
            setattr(cls, field, slot)
        _FACT_REGISTRY[key] = cls
    return cls


def _reduce_fact_class(cls):
    return (_restore_fact_class, (cls.__name__, cls.__factspec__))


# classes are normally pickled by module reference; fact classes are
# synthesized at runtime, so route them through the registry instead
copyreg.pickle(FactMeta, _reduce_fact_class)


def fact(name: str, attributes) -> type:
    """Create a fact record class with the given attribute slots
    (fact.py:52-67); accepts bare names, attribute() and .repeatable()
    declarations."""
    if isinstance(attributes, str):
        attributes = [attributes]
    spec = []
    for item in attributes:
        if isinstance(item, str):
            item = AttrSpec(item)
        if isinstance(item, RepeatableAttrSpec):
            spec.append((item.name, None, True))
        else:
            spec.append((item.name, item.default, False))
    return _restore_fact_class(name, tuple(spec))


def is_fact_class(item) -> bool:
    return isinstance(item, type) and issubclass(item, FactBase)


# ===================================================================
# Normalizers
# ===================================================================

class NormalizerBase:
    label = 'normalizer'

    def __call__(self, chain: 'Chain'):
        raise NotImplementedError

    def then(self, function) -> 'NormalizerBase':
        raise TypeError('cannot chain custom() after %s' % self.label)

    def custom(self, function) -> 'NormalizerBase':
        """Chain a function after this normalizer, e.g.
        ``normalized().custom(MONTHS.get)`` (normalizer.py:26-28,
        46-48, 97-103)."""
        return self.then(function)


class LemmaJoin(NormalizerBase):
    """normalized(): lemma-join the tokens, or the gazetteer key when
    the match came from a pipeline (normalizer.py:19-32; golden:
    tests/test_interpretation.py:389-415)."""

    label = 'normalized()'

    def __call__(self, chain):
        if chain.key is not None:
            return chain.key
        return render_lemmas(chain.tokens)

    def then(self, function):
        return MorphThenFn(self, function)


class InflectTo(NormalizerBase):
    """inflected(grams): re-inflect each token's first (constrained)
    reading (normalizer.py:35-54)."""

    def __init__(self, grams):
        self.grams = frozenset(grams)

    @property
    def label(self):
        return 'inflected(%s)' % ', '.join(sorted(self.grams))

    def __call__(self, chain):
        return render_inflected(chain.tokens, self.grams)

    def then(self, function):
        return MorphThenFn(self, function)


class ConstVal(NormalizerBase):
    def __init__(self, value):
        self.value = value

    @property
    def label(self):
        return 'const(%r)' % (self.value,)

    def __call__(self, _):
        return self.value


class ApplyFn(NormalizerBase):
    """custom(f): f over the item's surface normalization
    (normalizer.py:87-116)."""

    def __init__(self, function):
        self.function = function

    @property
    def label(self):
        return 'custom(%s)' % getattr(self.function, '__name__', 'fn')

    def apply(self, value):
        return self.function(value)

    def then(self, function):
        return FnThenFn(self.function, function)


class FnThenFn(ApplyFn):
    def __init__(self, first, second):
        self.first = first
        self.second = second

    @property
    def label(self):
        return 'custom(%s).custom(%s)' % (
            getattr(self.first, '__name__', 'fn'),
            getattr(self.second, '__name__', 'fn'))

    def apply(self, value):
        return self.second(self.first(value))


class MorphThenFn(NormalizerBase):
    """normalized()/inflected() composed with custom(f)
    (normalizer.py:119-139)."""

    def __init__(self, morph: NormalizerBase, function):
        self.morph = morph
        self.function = function

    @property
    def label(self):
        return '%s.custom(%s)' % (
            self.morph.label, getattr(self.function, '__name__', 'fn'))

    def __call__(self, chain):
        return self.function(self.morph(chain))


# free-standing normalizer constructors (interpretation/__init__ API)

def normalized() -> LemmaJoin:
    return LemmaJoin()


def inflected(grams=None) -> InflectTo:
    return InflectTo(grams or {'nomn', 'sing'})


def const(value) -> ConstVal:
    return ConstVal(value)


def custom(function) -> ApplyFn:
    return ApplyFn(function)


# ===================================================================
# Interpretation results (what flows up the tree)
# ===================================================================

class Chain:
    """One-or-more adjacent tokens under an attribute/normalizer node;
    remembers the gazetteer key when present (interpretator.py:39-56)."""

    def __init__(self, tokens: List[Tok], key=None):
        self.tokens = tokens
        self.key = key

    @property
    def normalized(self):
        return render_tokens(self.tokens)

    @property
    def spans(self):
        # a const() over purely structured children carries no tokens;
        # such a value contributes no span (it has no surface form)
        if self.tokens:
            yield (self.tokens[0].start, self.tokens[-1].stop)

    @property
    def as_json(self):
        return self.normalized


class FactResult:
    def __init__(self, work: 'WorkingFact'):
        self.work = work

    @property
    def normalized(self):
        return self.work.normalized

    @property
    def spans(self):
        return self.work.spans

    @property
    def as_json(self):
        return self.work.as_json


class SlotResult:
    """A filled attribute value on its way to the parent fact node."""

    def __init__(self, value, slot: Slot):
        self.value = value
        self.slot = slot

    @property
    def normalized(self):
        return self.value.normalized

    @property
    def spans(self):
        return self.value.spans

    @property
    def as_json(self):
        return self.value.as_json


class NormResult:
    def __init__(self, value, source):
        self.value = value
        self.source = source

    @property
    def normalized(self):
        return self.value

    @property
    def spans(self):
        return self.source.spans

    @property
    def as_json(self):
        if hasattr(self.value, 'as_json'):
            return self.value.as_json
        return self.value


class WorkingFact:
    """Mutable fact under construction (fact.py:70-135): rightmost
    non-repeatable slot wins, repeatable slots append, same-scheme
    child facts merge field-wise."""

    def __init__(self, fact_cls):
        self.fact_cls = fact_cls
        self.values: Dict[str, Any] = {}
        self.filled = set()
        self.repeat = set()
        for key in fact_cls.__fields__:
            scheme = getattr(fact_cls, key)
            if isinstance(scheme, RepeatableSlot):
                self.repeat.add(key)
                self.values[key] = []
            else:
                self.values[key] = scheme.default

    def fill(self, key, value):
        if key in self.repeat:
            self.values[key].append(value)
        else:
            self.values[key] = value
        self.filled.add(key)

    def absorb(self, other: 'WorkingFact'):
        for key in other.filled:
            self.values[key] = other.values[key]
            self.filled.add(key)

    @property
    def normalized(self):
        out = {}
        for key, value in self.values.items():
            if key in self.repeat:
                value = [v.normalized for v in value]
            elif key in self.filled:
                value = value.normalized
            out[key] = value
        record = self.fact_cls(**out)
        record._work = self
        return record

    @property
    def spans(self):
        for key, value in self.values.items():
            if key in self.repeat:
                for item in value:
                    for span in item.spans:
                        yield span
            elif key in self.filled:
                for span in value.spans:
                    yield span

    @property
    def as_json(self):
        data = OrderedDict()
        for key in self.fact_cls.__fields__:
            value = self.values[key]
            if key in self.repeat:
                value = [v.as_json for v in value]
            elif key in self.filled:
                value = value.as_json
            if value is not None:
                data[key] = value
        return data


# ===================================================================
# Interpretators (annotations attached to grammar rules)
# ===================================================================

class Interpretator:
    label = 'interp'

    def __call__(self, items, key=None):
        raise NotImplementedError


class FactInterp(Interpretator):
    """Constructor node: fills slots from SlotResult children, merges
    same-scheme FactResults (interpretator.py:131-152)."""

    def __init__(self, fact_cls):
        self.fact_cls = fact_cls

    @property
    def label(self):
        return self.fact_cls.__name__

    def __call__(self, items, key=None):
        work = WorkingFact(self.fact_cls)
        for item in items:
            if (isinstance(item, SlotResult)
                    and issubclass(self.fact_cls, item.slot.fact_cls)):
                work.fill(item.slot.name, item.value)
            elif (isinstance(item, FactResult)
                    and issubclass(item.work.fact_cls, self.fact_cls)):
                work.absorb(item.work)
        return FactResult(work)


def _gather(items, key):
    """Common child handling (interpretator.py:166-216): all tokens ->
    Chain; a single structured child passes through; anything else is a
    type error."""
    if all(isinstance(i, Tok) for i in items):
        return Chain(list(items), key)
    if len(items) == 1:
        item = items[0]
        if isinstance(item, SlotResult):
            # attr under attr: the inner attribute disappears
            return item.value
        if isinstance(item, (NormResult, FactResult)):
            return item
    raise TypeError('bad interpretation input: %r'
                    % [type(i).__name__ for i in items])


class SlotInterp(Interpretator):
    """Attribute node: F.a (interpretator.py:155-187)."""

    def __init__(self, slot: Slot):
        self.slot = slot

    @property
    def label(self):
        return self.slot.label

    def __call__(self, items, key=None):
        return SlotResult(_gather(items, key), self.slot)


class NormInterp(Interpretator):
    """Bare normalizer node, e.g. ``custom(float)``
    (interpretator.py:190-216)."""

    def __init__(self, normalizer: NormalizerBase):
        self.normalizer = normalizer

    @property
    def label(self):
        return self.normalizer.label

    def __call__(self, items, key=None):
        norm = self.normalizer
        if isinstance(norm, ConstVal):
            return NormResult(norm.value,
                              Chain([t for t in items
                                     if isinstance(t, Tok)], key))
        source = _gather(items, key)
        if isinstance(norm, ApplyFn):
            value = norm.apply(source.normalized)
        else:
            if not isinstance(source, Chain):
                raise TypeError('morph normalizer needs tokens, got %s'
                                % type(source).__name__)
            value = norm(source)
        return NormResult(value, source)


class SlotNormInterp(SlotInterp, NormInterp):
    """Attribute + normalizer, e.g. F.a.custom(int)
    (interpretator.py:219-236)."""

    def __init__(self, slot: Slot, normalizer: NormalizerBase):
        SlotInterp.__init__(self, slot)
        NormInterp.__init__(self, normalizer)

    @property
    def label(self):
        return '%s.%s' % (self.slot.label, self.normalizer.label)

    def __call__(self, items, key=None):
        result = NormInterp.__call__(self, items, key)
        return SlotResult(result, self.slot)


def coerce_rule_interpretator(item) -> Interpretator:
    """Dispatch of ``.interpretation(x)`` arguments
    (interpretator.py:239-261)."""
    if isinstance(item, Interpretator):
        return item
    if is_fact_class(item):
        return FactInterp(item)
    if isinstance(item, SlotNorm):
        return SlotNormInterp(item.slot, item.normalizer)
    if isinstance(item, Slot):
        return SlotInterp(item)
    if isinstance(item, NormalizerBase):
        return NormInterp(item)
    raise TypeError(type(item))
