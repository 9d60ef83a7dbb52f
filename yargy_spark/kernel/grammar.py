"""Rule DSL, normalization rewrites, and BNF grammar compilation.

This is the driver-side "planner" of the engine (SURVEY.md §3.1): a
user DSL builds a rule object graph; five rewrite passes normalize it
(quantifier algebra, quantifier lowering to recursive CFG, or-
flattening, ε-normalization, plan flattening); a final pass emits the
BNF grammar the Earley executor runs, deduplicating shared subrules
and hoisting names/interpretators/relations.

Semantics parity (behavior, not structure):
  - DSL constructors      /root/reference/yargy/api.py:40-83,
                          rule/constructors.py:28-329
  - rewrite passes        rule/transformators.py:161-410
  - BNF compilation       rule/bnf.py:45-170
Golden contract: the 30+ BNF string assertions in
tests/test_rule.py:15-189 reproduce verbatim (rendering included).

Everything here runs once per extractor set on the Spark driver; the
compiled grammar is pickled into a broadcast variable (SURVEY.md §4.3).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional

from .predicates import Pred, eq, is_predicate
from .agree import Main


# ===================================================================
# DSL node types
# ===================================================================

class RuleBase:
    """Common fluent surface shared by every rule node."""

    def children(self) -> Iterable:
        return ()

    def optional(self, reverse: bool = False) -> 'RuleBase':
        return Opt(self, reverse)

    def repeatable(self, min: Optional[int] = None,
                   max: Optional[int] = None,
                   reverse: bool = False) -> 'RuleBase':
        if min is not None and min < 1:
            raise ValueError('min < 1')
        if max is not None and max < 1:
            raise ValueError('max < 1')
        if min and max:
            if max < min:
                raise ValueError('max < min')
            return MinMaxRep(self, min, max, reverse)
        if min:
            return MinRep(self, min, reverse)
        if max:
            return MaxRep(self, max, reverse)
        return Rep(self, reverse)

    def named(self, name: str) -> 'RuleBase':
        return Named(self, name)

    def interpretation(self, item) -> 'RuleBase':
        from .interp import coerce_rule_interpretator
        return Interp(self, coerce_rule_interpretator(item))

    def match(self, relation) -> 'RuleBase':
        return Rel(self, relation)

    def activate(self, context) -> 'RuleBase':
        return _Activate(context).run(self)

    @property
    def normalized(self) -> 'RuleBase':
        node = self
        for pass_cls in (_Squash, _LowerQuantifiers, _FlattenOr,
                         _ReplaceEps, _Collapse):
            node = pass_cls().run(node)
        return node

    @property
    def as_dot(self):
        """Graphviz DOT dump of the rule DAG (debug sink —
        rule/constructors.py:119-122, dot.py:18-170)."""
        from .dot import rule_dot
        return rule_dot(self)

    @property
    def as_bnf(self) -> 'BNF':
        node = _ToBNF().run(self)
        if isinstance(node, Fwd):
            # a lowered X+ root is its own forward placeholder
            node = node.rule
        _strip_forwards(node)
        return BNF(node)

    def walk(self, types=None) -> Iterator:
        seen = {id(self)}
        queue = [self]
        while queue:
            item = queue.pop(0)
            if types is None or isinstance(item, types):
                yield item
            getter = getattr(item, 'children', None)
            if getter is None:      # terminal predicate
                continue
            for child in getter():
                if id(child) not in seen:
                    seen.add(id(child))
                    queue.append(child)


def is_rule(item) -> bool:
    return isinstance(item, RuleBase)


class Prod:
    """One production: a term sequence plus head-term index (``main``,
    default leftmost — rule/constructors.py:12-25)."""

    __slots__ = ('terms', 'main', 'init_nodes', 'nullable',
                 'first_items')

    def __init__(self, items, main: int = 0):
        # rank -> shared dot-0 TreeNode (filled by the parser's
        # predict; safe to share because tree nodes are immutable)
        self.init_nodes = {}
        # lookahead annotations, filled by BNF._annotate_first:
        # nullable = can derive epsilon; first_items = terminal
        # predicates / opaque gazetteer rules that can begin a match
        self.nullable = None
        self.first_items = None
        terms = []
        head = None
        for idx, item in enumerate(items):
            if isinstance(item, Main):
                if head is not None:
                    raise ValueError('more than one main()')
                head = idx
                item = item.term
            if not (is_predicate(item) or is_rule(item)):
                raise TypeError(type(item))
            terms.append(item)
        self.terms = terms
        self.main = head if head is not None else (main or 0)

    def children(self):
        return self.terms

    def render(self) -> str:
        parts = []
        for idx, term in enumerate(self.terms):
            text = term.label if is_predicate(term) else term.label
            if self.main > 0 and idx == self.main:
                text = '^' + text
            parts.append(text)
        return ' '.join(parts)


class EpsProd(Prod):
    """ε production (rule/constructors.py:50-55)."""

    def __init__(self):
        super().__init__([])

    def render(self) -> str:
        return 'e'


class Plain(RuleBase):
    """A plain nonterminal: list of alternative productions."""

    def __init__(self, productions: Iterable[Prod]):
        self.productions = list(productions)

    def children(self):
        return self.productions


class Alt(RuleBase):
    """Ordered alternation; order defines ambiguity rank
    (rule/constructors.py:158-169, docs/cookbook cells 8-13)."""

    def __init__(self, rules):
        self.rules = list(rules)

    def children(self):
        return self.rules


class Wrap(RuleBase):
    def __init__(self, rule: RuleBase):
        self.rule = rule

    def children(self):
        yield self.rule

    def define(self, *args):
        return self.rule.define(*args)


class Opt(Wrap):
    def __init__(self, rule, reverse=False):
        super().__init__(rule)
        self.reverse = reverse


class Rep(Wrap):
    def __init__(self, rule, reverse=False):
        super().__init__(rule)
        self.reverse = reverse


class RepOpt(Wrap):
    def __init__(self, rule, reverse_rep=False, reverse_opt=False):
        super().__init__(rule)
        self.reverse_rep = reverse_rep
        self.reverse_opt = reverse_opt


class MinRep(Wrap):
    def __init__(self, rule, min, reverse=False):
        super().__init__(rule)
        self.min = min
        self.reverse = reverse


class MaxRep(Wrap):
    def __init__(self, rule, max, reverse=False):
        super().__init__(rule)
        self.max = max
        self.reverse = reverse


class MinMaxRep(Wrap):
    def __init__(self, rule, min, max, reverse=False):
        super().__init__(rule)
        self.min = min
        self.max = max
        self.reverse = reverse


class Named(Wrap):
    def __init__(self, rule, name):
        super().__init__(rule)
        self.name = name


class Interp(Wrap):
    def __init__(self, rule, interpretator):
        super().__init__(rule)
        self.interpretator = interpretator


class Rel(Wrap):
    def __init__(self, rule, relation):
        super().__init__(rule)
        self.relation = relation


class Fwd(RuleBase):
    """Recursive nonterminal placeholder (rule/constructors.py:277-307;
    Earley handles recursion including A -> A cycles)."""

    def __init__(self):
        self.rule: Optional[RuleBase] = None

    def define(self, item, *items):
        if not items and is_rule(item):
            if isinstance(item, Fwd):
                raise ValueError('forward(forward(...)) not allowed')
            self.rule = item
        else:
            self.rule = seq(item, *items)
        return self

    def children(self):
        if self.rule is not None:
            yield self.rule


class Eps(RuleBase):
    """Empty rule (``empty()``)."""


class Gaz(RuleBase):
    """Gazetteer rule wrapper; the scheme activates into an indexed
    BNF rule (pipelines — see gazetteer.py)."""

    def __init__(self, scheme):
        self.scheme = scheme


# ===================================================================
# DSL constructors
# ===================================================================

def _coerce(item):
    if is_predicate(item) or is_rule(item) or isinstance(item, Main):
        return item
    return eq(item)


def seq(*items) -> Plain:
    """Sequence production; bare strings coerce to eq (api.py:40-49)."""
    return Plain([Prod([_coerce(i) for i in items])])


def alt_rules(*rules) -> Alt:
    for r in rules:
        if not is_rule(r):
            raise TypeError(type(r))
    return Alt(rules)


def forward() -> Fwd:
    return Fwd()


def empty() -> Eps:
    return Eps()


# and_/or_/not_ dispatch over predicates, relations, rules (api.py:56-83)

def and_(*items):
    from .predicates import AndPred
    from .agree import AndRel, is_relation
    if all(is_predicate(i) for i in items):
        return AndPred(items)
    if all(is_relation(i) for i in items):
        return AndRel(items)
    raise TypeError('mixed operand types for and_')


def or_(*items):
    from .predicates import OrPred
    from .agree import OrRel, is_relation
    if all(is_predicate(i) for i in items):
        return OrPred(items)
    if all(is_relation(i) for i in items):
        return OrRel(items)
    if all(is_rule(i) for i in items):
        return alt_rules(*items)
    raise TypeError('mixed operand types for or_')


def not_(item):
    from .predicates import NotPred
    from .agree import NotRel, is_relation
    if is_predicate(item):
        return NotPred(item)
    if is_relation(item):
        return NotRel(item)
    raise TypeError(type(item))


# ===================================================================
# Rewrite machinery
# ===================================================================

class _Pass:
    """Bottom-up rewrite with id-memoization.  Forward rules are
    redefined in a pre-pass and returned as fixed points, which breaks
    recursion cycles (rule/transformators.py:59-68)."""

    def __init__(self):
        self.memo = {}

    def run(self, root: RuleBase) -> RuleBase:
        for fwd in root.walk(types=Fwd):
            if fwd.rule is not None:
                fwd.define(self.visit(fwd.rule))
        return self.visit(root)

    def visit(self, node):
        # memo by identity, RETAINING the key object: without the
        # node reference a temporary (e.g. the RepOpt objects _Squash
        # synthesizes) can be garbage-collected and its recycled id()
        # would alias a later node onto the wrong rewrite —
        # deterministically miscompiling grammars with two
        # stacked-quantifier sites
        key = id(node)
        hit = self.memo.get(key)
        if hit is not None:
            return hit[1]
        out = self.dispatch(node)
        self.memo[key] = (node, out)
        return out

    def term(self, item):
        return self.visit(item) if is_rule(item) else item

    def prod(self, p: Prod) -> Prod:
        if isinstance(p, EpsProd):
            return p
        from .gazetteer import GazProd
        if isinstance(p, GazProd):
            return p
        return Prod([self.term(t) for t in p.terms], p.main)

    # default structural recursion; passes override specific node kinds
    def dispatch(self, node):
        if isinstance(node, Plain):
            return Plain([self.prod(p) for p in node.productions])
        if isinstance(node, Alt):
            return Alt([self.visit(r) for r in node.rules])
        if isinstance(node, Opt):
            return Opt(self.visit(node.rule), node.reverse)
        if isinstance(node, RepOpt):
            return RepOpt(self.visit(node.rule),
                          node.reverse_rep, node.reverse_opt)
        if isinstance(node, Rep):
            return Rep(self.visit(node.rule), node.reverse)
        if isinstance(node, MinMaxRep):
            return MinMaxRep(self.visit(node.rule),
                             node.min, node.max, node.reverse)
        if isinstance(node, MinRep):
            return MinRep(self.visit(node.rule), node.min, node.reverse)
        if isinstance(node, MaxRep):
            return MaxRep(self.visit(node.rule), node.max, node.reverse)
        if isinstance(node, Named):
            return Named(self.visit(node.rule), node.name)
        if isinstance(node, Interp):
            return Interp(self.visit(node.rule), node.interpretator)
        if isinstance(node, Rel):
            return Rel(self.visit(node.rule), node.relation)
        if isinstance(node, (Fwd, Eps, Gaz, GrammarRule)):
            return node
        raise TypeError(type(node))


class _Activate(_Pass):
    """Bind predicate schemes / gazetteers to the parse context
    (rule/transformators.py:141-155)."""

    def __init__(self, context):
        super().__init__()
        self.context = context

    def term(self, item):
        if is_predicate(item):
            return item.activate(self.context)
        return self.visit(item)

    def dispatch(self, node):
        if isinstance(node, Gaz):
            return Gaz(node.scheme.activate(self.context))
        return super().dispatch(node)


class _Squash(_Pass):
    """Quantifier algebra: collapse stacked quantifiers so e.g.
    x.optional().repeatable() == x.repeatable().optional()
    (rule/transformators.py:161-272; goldens tests/test_rule.py:15-69).
    """

    _QUANTS = None  # set below

    def dispatch(self, node):
        quants = (Rep, RepOpt, Opt, MinRep, MaxRep, MinMaxRep)

        if isinstance(node, RepOpt):
            inner = node.rule
            if isinstance(inner, quants):
                return self.visit(RepOpt(inner.rule,
                                         node.reverse_rep,
                                         node.reverse_opt))
            return RepOpt(self.visit(inner),
                          node.reverse_rep, node.reverse_opt)

        if isinstance(node, Rep):
            inner = node.rule
            if isinstance(inner, RepOpt):
                return self.visit(
                    RepOpt(inner.rule, node.reverse, inner.reverse_opt))
            if isinstance(inner, Opt):
                return self.visit(
                    RepOpt(inner.rule, node.reverse, inner.reverse))
            if isinstance(inner, (Rep, MinRep, MaxRep, MinMaxRep)):
                return self.visit(Rep(inner.rule, node.reverse))
            return Rep(self.visit(inner), node.reverse)

        if isinstance(node, Opt):
            inner = node.rule
            if isinstance(inner, RepOpt):
                return self.visit(
                    RepOpt(inner.rule, inner.reverse_rep, node.reverse))
            if isinstance(inner, Rep):
                return self.visit(
                    RepOpt(inner.rule, inner.reverse, node.reverse))
            if isinstance(inner, Opt):
                return self.visit(Opt(inner.rule, node.reverse))
            return Opt(self.visit(inner), node.reverse)

        if isinstance(node, (MinRep, MaxRep, MinMaxRep)):
            inner = node.rule
            if isinstance(inner, Rep):
                return self.visit(Rep(inner.rule, inner.reverse))
            if isinstance(inner, RepOpt):
                return self.visit(RepOpt(inner.rule, inner.reverse_rep,
                                         inner.reverse_opt))
            if isinstance(inner, Opt):
                if isinstance(node, MinRep):
                    shifted = MinRep(inner.rule, node.min, node.reverse)
                elif isinstance(node, MaxRep):
                    shifted = MaxRep(inner.rule, node.max, node.reverse)
                else:
                    shifted = MinMaxRep(inner.rule, node.min, node.max,
                                        node.reverse)
                return self.visit(Opt(shifted, inner.reverse))
            if isinstance(node, MinRep):
                return MinRep(self.visit(inner), node.min, node.reverse)
            if isinstance(node, MaxRep):
                return MaxRep(self.visit(inner), node.max, node.reverse)
            return MinMaxRep(self.visit(inner), node.min, node.max,
                             node.reverse)

        return super().dispatch(node)


def _rep_cfg(item: RuleBase, reverse: bool) -> RuleBase:
    """X+  ->  T; T -> X T | X   (right-recursive CFG,
    rule/transformators.py:324-337)."""
    temp = Fwd()
    a: RuleBase = Plain([Prod([item, temp])])
    b: RuleBase = item
    if reverse:
        a, b = b, a
    return temp.define(alt_rules(a, b))


def _max_cfg(item: RuleBase, count: int, reverse: bool) -> RuleBase:
    """X{,n} unrolled alternation (rule/transformators.py:308-321)."""
    if count == 1:
        return item
    a: RuleBase = Plain([Prod([item, _max_cfg(item, count - 1, reverse)])])
    b: RuleBase = item
    if reverse:
        a, b = b, a
    return alt_rules(a, b)


class _LowerQuantifiers(_Pass):
    """Lower ?/+/{m,n} to forward/alt/ε CFG shapes
    (rule/transformators.py:374-410)."""

    def dispatch(self, node):
        if isinstance(node, RepOpt):
            item = self.visit(node.rule)
            temp = Fwd()
            branches: List[RuleBase] = [
                Eps(), Plain([Prod([item, temp])]), item]
            if node.reverse_rep:
                branches[1], branches[2] = branches[2], branches[1]
            if node.reverse_opt:
                branches = branches[1:] + branches[:1]
            return temp.define(alt_rules(*branches))
        if isinstance(node, Rep):
            return _rep_cfg(self.visit(node.rule), node.reverse)
        if isinstance(node, Opt):
            item = self.visit(node.rule)
            a: RuleBase = Eps()
            b: RuleBase = item
            if node.reverse:
                a, b = b, a
            return alt_rules(a, b)
        if isinstance(node, MinMaxRep):
            item = self.visit(node.rule)
            parts = [item] * (node.min - 1)
            parts.append(_max_cfg(item, node.max - node.min + 1,
                                  node.reverse))
            return Plain([Prod(parts)])
        if isinstance(node, MinRep):
            item = self.visit(node.rule)
            parts = [item] * (node.min - 1)
            parts.append(_rep_cfg(item, node.reverse))
            return Plain([Prod(parts)])
        if isinstance(node, MaxRep):
            return _max_cfg(self.visit(node.rule), node.max, node.reverse)
        return super().dispatch(node)


class _FlattenOr(_Pass):
    """Alt -> Plain with one production per branch; branch order is the
    ambiguity rank (rule/transformators.py:298-300)."""

    def dispatch(self, node):
        if isinstance(node, Alt):
            return Plain([Prod([self.visit(r)]) for r in node.rules])
        return super().dispatch(node)


class _ReplaceEps(_Pass):
    def dispatch(self, node):
        if isinstance(node, Eps):
            return Plain([EpsProd()])
        return super().dispatch(node)


class _Collapse(_Pass):
    """Collapse trivial single-production/single-term Plain wrappers —
    the projection-collapse analog (rule/transformators.py:275-295)."""

    def term(self, item):
        if type(item) is Plain and len(item.productions) == 1:
            terms = item.productions[0].terms
            if len(terms) == 1:
                return self.term(terms[0])
        return super().term(item)

    def prod(self, p: Prod) -> Prod:
        if isinstance(p, EpsProd):
            return p
        if len(p.terms) == 1:
            t = p.terms[0]
            if type(t) is Plain and len(t.productions) == 1:
                return self.prod(t.productions[0])
        return super().prod(p)


# ===================================================================
# BNF grammar (physical form)
# ===================================================================

class GrammarRule(RuleBase):
    """Executable nonterminal: productions + optional name /
    interpretator / relation (rule/bnf.py:45-86)."""

    # True for gazetteer rules: their first-token index replaces
    # FIRST-set expansion (which would enumerate every phrase)
    opaque_first = False

    def __init__(self, productions, name=None, interpretator=None,
                 relation=None):
        self.productions = list(productions)
        self.name = name
        self.interpretator = interpretator
        self.relation = relation
        self.nullable = None
        self.first_items = None

    def children(self):
        return self.productions

    def predict(self, token):
        """Productions viable given the upcoming token; gazetteer
        subclasses prune via a first-token index (partition-pruning
        analog — pipelines.py:24-75)."""
        return self.productions

    @property
    def label(self) -> str:
        name = self.name
        if self.interpretator is not None:
            name = self.interpretator.label
        if self.relation is not None:
            name = '%s^%s' % (name, self.relation.label)
        return name

    def render(self) -> str:
        return '%s -> %s' % (
            self.label, ' | '.join(p.render() for p in self.productions))


def is_grammar_rule(item) -> bool:
    return isinstance(item, GrammarRule)


def _lift(item) -> GrammarRule:
    return GrammarRule([Prod([item])])


class _ToBNF(_Pass):
    """Convert normalized DSL graph to GrammarRules, deduplicating
    shared subrules (CSE analog) and hoisting name/interp/relation
    annotations (rule/bnf.py:89-150; golden: D -> B C; B -> R0;
    C -> R0; R0 -> 'a')."""

    def __init__(self):
        super().__init__()
        self.parent_count = {}

    def run(self, root):
        for item in root.walk():
            getter = getattr(item, 'children', None)
            for child in (getter() if getter else ()):
                key = id(child)
                self.parent_count[key] = self.parent_count.get(key, 0) + 1
        return super().run(root)

    def _shared(self, item) -> bool:
        return self.parent_count.get(id(item), 0) > 1

    def _unwrap(self, node: Wrap) -> GrammarRule:
        inner = node.rule
        if isinstance(inner, Fwd):
            return _lift(inner)
        shared = self._shared(inner)
        out = self.visit(inner)
        if shared:
            out = _lift(out)
        return out

    def dispatch(self, node):
        if isinstance(node, Plain):
            return GrammarRule([self.prod(p) for p in node.productions])
        if isinstance(node, Named):
            out = self._unwrap(node)
            if out.name is not None:
                out = _lift(out)
            out.name = node.name
            return out
        if isinstance(node, Interp):
            out = self._unwrap(node)
            if out.interpretator is not None:
                out = _lift(out)
            out.interpretator = node.interpretator
            return out
        if isinstance(node, Rel):
            out = self._unwrap(node)
            if out.relation is not None:
                out = _lift(out)
            out.relation = node.relation
            return out
        if isinstance(node, Gaz):
            return node.scheme.as_grammar_rule()
        if isinstance(node, Fwd):
            return node
        if isinstance(node, GrammarRule):
            return node
        if isinstance(node, (Alt, Opt, Rep, RepOpt, MinRep, MaxRep,
                             MinMaxRep, Eps)):
            raise TypeError('not normalized: %s' % type(node).__name__)
        return super().dispatch(node)


def _strip_forwards(root: GrammarRule) -> None:
    """Replace Fwd terms with their defined GrammarRule in place
    (rule/bnf.py:153-170)."""
    seen = set()
    queue = [root]
    while queue:
        rule = queue.pop()
        if id(rule) in seen or not isinstance(rule, GrammarRule):
            continue
        seen.add(id(rule))
        for p in rule.productions:
            for i, t in enumerate(p.terms):
                if isinstance(t, Fwd):
                    if t.rule is None:
                        raise TypeError('forward not defined')
                    p.terms[i] = t.rule
            for t in p.terms:
                if isinstance(t, GrammarRule):
                    queue.append(t)


def _annotate_first(rules):
    """Nullable + FIRST-item fixpoint over the grammar — the
    compile-time side of Earley lookahead pruning (no analog in the
    reference, which predicts blindly; its gazetteer first-token index
    pipelines.py:24-75 is the special case we generalize).  A FIRST
    item is a terminal predicate, or an opaque gazetteer rule whose
    first-token index answers "can any phrase start here" in O(1)."""
    prods = [p for r in rules for p in r.productions]
    for r in rules:
        r.nullable = False
        r.first_items = {}
    for p in prods:
        p.nullable = not p.terms
        p.first_items = {}

    changed = True
    while changed:                                   # nullability
        changed = False
        for r in rules:
            for p in r.productions:
                if not p.nullable and all(
                        is_grammar_rule(t) and t.nullable
                        for t in p.terms):
                    p.nullable = True
                    changed = True
            if not r.nullable and any(p.nullable
                                      for p in r.productions):
                r.nullable = True
                changed = True

    changed = True
    while changed:                                   # FIRST sets
        changed = False
        for r in rules:
            for p in r.productions:
                acc = p.first_items
                before = len(acc)
                for t in p.terms:
                    if not is_grammar_rule(t):       # terminal
                        acc[id(t)] = t
                        break
                    if t.opaque_first:
                        acc[id(t)] = t
                        if not t.nullable:
                            break
                    else:
                        acc.update(t.first_items)
                        if not t.nullable:
                            break
                if len(acc) != before:
                    changed = True
            acc = r.first_items
            before = len(acc)
            for p in r.productions:
                acc.update(p.first_items)
            if len(acc) != before:
                changed = True

    for r in rules:
        r.first_items = tuple(r.first_items.values())
        for p in r.productions:
            p.first_items = tuple(p.first_items.values())


class BNF:
    """Named grammar: rules in BFS order from the start rule; unnamed
    rules get R0, R1, ... (rule/bnf.py:14-40)."""

    def __init__(self, start: GrammarRule):
        rules = list(start.walk(types=GrammarRule))
        count = 0
        for rule in rules:
            if not rule.name:
                rule.name = 'R%d' % count
                count += 1
        self.rules = rules
        _annotate_first(rules)

    @property
    def start(self) -> GrammarRule:
        return self.rules[0]

    @property
    def source(self) -> Iterator[str]:
        for rule in self.rules:
            yield rule.render()
