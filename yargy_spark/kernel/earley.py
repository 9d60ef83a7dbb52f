"""Earley chart parser, ambiguity ranking, and match resolution.

Semantics parity: /root/reference/yargy/parser.py —
  - chart/column/state model with per-column hash dedup and a
    waiting-states index keyed by awaited rule   parser.py:25-173
  - predict (with gazetteer first-token pruning), scan (predicate +
    reading constrain), complete                 parser.py:305-348
  - match/findall/extract/find entry points      parser.py:257-303
  - leftmost-derivation tree preference          tree/constructors.py:52-134
  - span-level dedup + max-coverage DP           parser.py:217-229, span.py
  - relation validation gate                     parser.py:202-207

Relational reading (SURVEY.md §2.7): scan is a selection; predict with
the gazetteer index is partition pruning; complete joining completed
states against waiting parents is a hash join keyed (rule, start col);
column dedup is a distinct aggregate; tree sort + span DP is sort+top-k.

A state budget (``cap``) guards combinatorial blowups — the
CappedParser pattern from docs/cookbook.ipynb cells 5-7, default-on in
the Spark extraction operator so one poison turn cannot stall an
executor.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from .grammar import (GrammarRule, RuleBase, is_grammar_rule,
                      is_predicate)
from .spans import pick_max_coverage
from .tokenize import MorphTokenSpec, Tok, TokenSpec
from .agree import TokenAgreementGraph


class ParseBudgetExceeded(Exception):
    """Raised when the chart state count passes the configured cap."""


class Context:
    """Activation context: tokenizer (with morph) + tagger
    (parser.py:232-237)."""

    def __init__(self, tokenizer, tagger=None):
        self.tokenizer = tokenizer
        self.tagger = tagger


class Tagger:
    tags = ()

    def __call__(self, tokens):
        raise NotImplementedError

    def check_tag(self, tag):
        return tag in self.tags


class PassTagger(Tagger):
    def __call__(self, tokens):
        return tokens


# ===================================================================
# Parse forest nodes
# ===================================================================

class TreeNode:
    __slots__ = ('rule', 'production', 'rank', 'children', 'ckey')

    def __init__(self, rule, production, rank, children, ckey=None):
        self.rule = rule
        self.production = production
        self.rank = rank
        self.children = children
        # child-identity tuple, grown incrementally: the state-dedup
        # key component (avoids re-walking children on every push)
        self.ckey = (tuple(id(c) for c in children)
                     if ckey is None else ckey)

    def grown(self, child) -> 'TreeNode':
        return TreeNode(self.rule, self.production, self.rank,
                        self.children + [child],
                        self.ckey + (id(child),))

    @property
    def head_token(self):
        """The production's head token (relations propagate through
        heads — tree/constructors.py:98-100)."""
        idx = self.production.main
        if idx >= len(self.children):
            idx = 0
        return self.children[idx].head_token

    @property
    def interpretator(self):
        return self.rule.interpretator

    @property
    def relation(self):
        return self.rule.relation


class TreeLeaf(TreeNode):
    __slots__ = ('predicate', 'token')

    def __init__(self, predicate, token):
        self.predicate = predicate
        self.token = token
        self.children = []
        self.ckey = ()

    interpretator = None
    relation = None

    @property
    def head_token(self):
        return self.token


def node_before(a: TreeNode, b: TreeNode) -> bool:
    """Leftmost-derivation preference between two parses of the same
    rule (tree/constructors.py:114-134): lower alternation rank wins,
    ties recurse into children."""
    if a is b:
        return False
    if a.rank != b.rank:
        return a.rank < b.rank
    for ca, cb in zip(a.children, b.children):
        if isinstance(ca, TreeLeaf) or ca is cb:
            continue
        if ca.rank != cb.rank:
            return ca.rank < cb.rank
        # parity: the reference returns the recursion result at the
        # FIRST differing equal-rank pair, even when it ties False
        # (tree/constructors.py:121-132) — it never falls through to
        # later child pairs
        return node_before(ca, cb)
    return False


class ParseTree:
    def __init__(self, root: TreeNode, range_: Tuple[int, int]):
        self.root = root
        self.range = range_

    def __lt__(self, other: 'ParseTree') -> bool:
        # earlier start, then longer span, then derivation rank
        # (tree/constructors.py:52-62)
        if self.range == other.range:
            return node_before(self.root, other.root)
        a0, a1 = self.range
        b0, b1 = other.range
        if a0 == b0:
            return a1 > b1
        return a0 < b0

    @property
    def as_dot(self):
        """Graphviz DOT dump of this parse tree (debug sink —
        tree/transformators.py:129-169)."""
        from .dot import tree_dot
        return tree_dot(self)

    def walk(self):
        stack = [self.root]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    # --- transformations (tree/transformators.py) --------------------
    def pruned(self) -> Optional['ParseTree']:
        """Drop ε-derived empty nodes (PropogateEmptyTransformator)."""
        root = _prune(self.root)
        if root is None:
            return None
        return ParseTree(root, self.range)

    def collect_relations(self) -> TokenAgreementGraph:
        graph = TokenAgreementGraph()
        for node in self.walk():
            if node.relation is not None:
                graph.add(node.relation, node.head_token)
        return graph

    def constrained(self, graph: TokenAgreementGraph) -> 'ParseTree':
        """New tree with agreement-narrowed leaf tokens.  MUST NOT
        mutate in place: chart completion shares subtree (and leaf)
        objects across candidate trees, so narrowing one candidate's
        leaves would contaminate overlapping candidates (the reference
        also rebuilds — ApplyRelationsTransformator,
        tree/transformators.py:121-126)."""
        return ParseTree(_constrain(self.root, graph), self.range)

    def interpret(self):
        if self.root.interpretator is None:
            raise ValueError('no .interpretation(...) for root rule')
        return _interpret(_keep_interp_nodes(self.root))


def _constrain(node: TreeNode,
               graph: TokenAgreementGraph) -> TreeNode:
    if isinstance(node, TreeLeaf):
        return TreeLeaf(node.predicate, graph.constrain(node.token))
    return TreeNode(node.rule, node.production, node.rank,
                    [_constrain(c, graph) for c in node.children])


def _prune(node: TreeNode) -> Optional[TreeNode]:
    if isinstance(node, TreeLeaf):
        return node
    children = [c for c in (_prune(c) for c in node.children)
                if c is not None]
    if not children:
        return None
    return TreeNode(node.rule, node.production, node.rank, children)


def _keep_interp_nodes(node: TreeNode) -> TreeNode:
    """Flatten away non-annotated inner nodes so only leaves and
    interpretator nodes remain (KeepInterpretationNodesTransformator)."""
    def significant(item):
        for child in item.children:
            if isinstance(child, TreeLeaf) or child.interpretator:
                yield child
            else:
                yield from significant(child)

    children = [_keep_interp_nodes(c) if not isinstance(c, TreeLeaf)
                else c
                for c in significant(node)]
    return TreeNode(node.rule, node.production, node.rank, children)


def _interpret(node: TreeNode):
    from .gazetteer import GazProd
    items = []
    for child in node.children:
        if isinstance(child, TreeLeaf):
            items.append(child.token)
        else:
            items.append(_interpret(child))
    key = node.production.value if isinstance(node.production, GazProd) \
        else None
    return node.interpretator(items, key)


# ===================================================================
# Chart
# ===================================================================

def _first_ok(items, token, memo):
    """Any FIRST item accepts the token?  Items are terminal
    predicates or opaque gazetteer rules (index lookup); results
    share the per-column scan memo."""
    for it in items:
        k = id(it)
        hit = memo.get(k)
        if hit is None:
            if isinstance(it, GrammarRule):
                hit = bool(it.predict(token))
            else:
                hit = bool(it(token))
            memo[k] = hit
        if hit:
            return True
    return False


class _State:
    __slots__ = ('rule', 'production', 'dot', 'start', 'stop', 'node',
                 'done', 'ahead', 'ahead_is_rule')

    def __init__(self, rule, production, dot, start, stop, node):
        self.rule = rule
        self.production = production
        self.dot = dot
        self.start = start      # _Col
        self.stop = stop        # _Col
        self.node = node
        terms = production.terms
        if dot >= len(terms):
            self.done = True
            self.ahead = None
            self.ahead_is_rule = False
        else:
            self.done = False
            ahead = self.ahead = terms[dot]
            self.ahead_is_rule = isinstance(ahead, GrammarRule)

    def key(self):
        return (id(self.rule), id(self.production), self.dot,
                self.start.index, self.stop.index, self.node.ckey)


def _term_label(term) -> str:
    if isinstance(term, GrammarRule):
        return term.name or 'Rule'
    label = getattr(term, 'label', None)
    return label if isinstance(label, str) else repr(term)


def _state_str(state: '_State') -> str:
    """'[start:stop] NAME -> a $ b' (reference parser.py:161-173)."""
    terms = state.production.terms
    production = ' '.join(
        [_term_label(t) for t in terms[:state.dot]]
        + ['$']
        + [_term_label(t) for t in terms[state.dot:]])
    return '[%d:%d] %s -> %s' % (
        state.start.index, state.stop.index,
        state.rule.name or 'Rule', production)


class Chart:
    """Debug view over the parse columns (reference parser.py Chart:
    ``chart.source`` text dump, ``matches``, ``last_column``)."""

    def __init__(self, columns):
        self.columns = columns

    def __getitem__(self, index):
        return self.columns[index]

    @property
    def last_column(self):
        return self.columns[-1]

    def matches(self, rule):
        for col in self.columns:
            for state in col.states:
                if state.done and state.rule is rule:
                    yield state

    @property
    def source(self):
        for col in self.columns:
            yield '%r %r' % (col.index,
                             col.token.value if col.token else None)
            yield '----------------'
            for state in col.states:
                yield _state_str(state)
            yield ''


class _Col:
    __slots__ = ('index', 'token', 'states', 'seen', 'waiting',
                 'predicted', 'scan_memo')

    def __init__(self, index: int, token: Optional[Tok]):
        self.index = index
        self.token = token
        self.states: List[_State] = []
        self.seen = set()
        self.waiting = {}    # id(awaited rule) -> [states]
        self.predicted = set()   # rule ids already expanded here
        self.scan_memo = {}  # id(predicate) -> bool on this token

    def push(self, state: _State) -> bool:
        key = state.key()
        if key in self.seen:
            return False
        self.seen.add(key)
        self.states.append(state)
        if state.ahead_is_rule:
            self.waiting.setdefault(id(state.ahead), []).append(state)
        return True

    def push_new(self, state: _State) -> None:
        """Append without the dedup check: predicted (dot-0) states are
        created exactly once per (rule, column) by construction — the
        predict guard — and no other path creates dot-0 states, so
        they can never collide."""
        self.states.append(state)
        if state.ahead_is_rule:
            self.waiting.setdefault(id(state.ahead), []).append(state)


class Match:
    """Final extraction result: tokens + span (+ lazy ``fact``)
    (parser.py:176-191)."""

    def __init__(self, tree: ParseTree):
        self.tree = tree
        self.tokens = [n.token for n in tree.walk()
                       if isinstance(n, TreeLeaf)]
        self.span = (self.tokens[0].start, self.tokens[-1].stop)

    @property
    def rule(self):
        return self.tree.root.rule

    @property
    def fact(self):
        return self.tree.interpret().normalized


def _finish_match(tree: ParseTree) -> Optional[Match]:
    """ε-prune, validate agreement, constrain readings
    (parser.py:202-207)."""
    tree = tree.pruned()
    if tree is None:
        return None
    graph = tree.collect_relations()
    if not graph.validate():
        return None
    return Match(tree.constrained(graph))


class Parser:
    """Compile a DSL rule and parse texts (parser.py:241-348)."""

    def __init__(self, rule: RuleBase, tokenizer=None, tagger=None,
                 cap: Optional[int] = None):
        if tokenizer is None:
            tokenizer = MorphTokenSpec()
        self.tokenizer = tokenizer
        self.tagger = tagger or PassTagger()
        self.cap = cap

        context = Context(tokenizer, self.tagger)
        rule = rule.activate(context)
        rule = rule.normalized
        self.bnf = rule.as_bnf
        self.rule = self.bnf.start

    @property
    def grammar_source(self):
        """Text dump of the compiled BNF grammar (the engine's
        toDebugString analog; replaces the reference's graphviz
        debug sink, dot.py)."""
        return list(self.bnf.source)

    def tokenize(self, text: str) -> List[Tok]:
        """Tokenize+tag once; the token list can be shared across many
        parsers via the ``tokens=`` parameter of the entry points (the
        reference's pre-tokenized source pattern,
        docs/cookbook.ipynb cells 14-16)."""
        return list(self.tagger(self.tokenizer(text)))

    def chart(self, text: str, tokens: Optional[List[Tok]] = None
              ) -> Chart:
        """Debug introspection: run the recognizer and return the
        filled chart (``chart.source`` text dump, per-column states —
        reference parser.py:257-273)."""
        toks = list(tokens) if tokens is not None \
            else self.tokenize(text)
        return Chart(self._chart(toks, everywhere=True))

    # --- chart construction -----------------------------------------
    def _chart(self, tokens: List[Tok], everywhere: bool) -> List[_Col]:
        cols = [_Col(0, None)]
        for i, tok in enumerate(tokens, 1):
            cols.append(_Col(i, tok))

        budget = self.cap
        n_states = 0

        def push(col, state):
            nonlocal n_states
            if col.push(state):
                n_states += 1
                if budget is not None and n_states > budget:
                    raise ParseBudgetExceeded(n_states)

        def push_new(col, state):
            nonlocal n_states
            col.push_new(state)
            n_states += 1
            if budget is not None and n_states > budget:
                raise ParseBudgetExceeded(n_states)

        size = len(cols)
        for ci in range(size):
            col = cols[ci]
            nxt = cols[ci + 1] if ci + 1 < size else None
            if ci == 0 or everywhere:
                self._predict(col, nxt, self.rule, push_new)
            for state in col.states:           # states grows while iterating
                if state.done:
                    # completion: join against parents waiting on this
                    # rule at the state's start column
                    for parent in state.start.waiting.get(
                            id(state.rule), ()):
                        push(col, _State(
                            parent.rule, parent.production,
                            parent.dot + 1, parent.start, col,
                            parent.node.grown(state.node)))
                elif state.ahead_is_rule:
                    # inline the predict-once guard (hot path)
                    if id(state.ahead) not in col.predicted:
                        self._predict(col, nxt, state.ahead, push_new)
                elif nxt is not None:
                    self._scan(nxt, state.ahead, state, push)
        return cols

    def _predict(self, col, nxt, rule, push):
        """Expand a nonterminal at this column.  Two prunings, both
        generalizing the reference's gazetteer first-token index
        (pipelines.py:24-75): the rule's own ``predict`` filters by the
        upcoming token, and productions whose first term is a terminal
        predicate that rejects the upcoming token are skipped — with
        dot at 0 their only next move is that exact scan, so they can
        never advance.  Ranks stay consistent per (rule, column), which
        is what the ambiguity comparator relies on."""
        # predict is a pure function of (rule, column): expanding once
        # per column is equivalent to the reference's per-state calls
        # followed by hash dedup (Column.append, parser.py:88-93)
        key = id(rule)
        if key in col.predicted:
            return
        col.predicted.add(key)
        if nxt is not None:
            productions = rule.predict(nxt.token)
            next_token = nxt.token
            memo = nxt.scan_memo
        else:
            productions = rule.productions
            next_token = None
            memo = None
        for rank, production in enumerate(productions):
            # FIRST-set lookahead: a non-nullable production whose
            # FIRST items all reject the upcoming token can never
            # advance — don't materialize its state at all.  At the
            # last column (no upcoming token) only nullable
            # productions can still complete.
            if not production.nullable:
                if next_token is None:
                    if production.nullable is not None:
                        continue
                else:
                    firsts = production.first_items
                    if firsts is not None and not _first_ok(
                            firsts, next_token, memo):
                        continue
            cache = production.init_nodes
            node = cache.get(rank)
            if node is None:
                node = cache[rank] = TreeNode(rule, production, rank, [])
            push(col, _State(rule, production, 0, col, col, node))

    def _scan(self, nxt, predicate, state, push):
        # one evaluation per (predicate, token): shared terminals across
        # productions/rules hit the memo
        memo = nxt.scan_memo
        key = id(predicate)
        hit = memo.get(key)
        if hit is None:
            hit = memo[key] = bool(predicate(nxt.token))
        if hit:
            leaf = TreeLeaf(predicate, predicate.constrain(nxt.token))
            push(nxt, _State(state.rule, state.production, state.dot + 1,
                             state.start, nxt, state.node.grown(leaf)))

    def _completed_trees(self, cols, whole: bool) -> Iterator[ParseTree]:
        target = cols[-1:] if whole else cols
        last = len(cols) - 1
        for col in target:
            for state in col.states:
                if state.done and state.rule is self.rule:
                    if whole and (state.start.index != 0
                                  or state.stop.index != last):
                        continue
                    yield ParseTree(state.node,
                                    (state.start.index, state.stop.index))

    # --- public entry points ------------------------------------------
    def match(self, text: str, tokens: Optional[List[Tok]] = None
              ) -> Optional[Match]:
        """Whole-text parse; best-ranked tree whose relations validate
        (parser.py:298-303)."""
        cols = self._chart(tokens if tokens is not None
                           else self.tokenize(text), everywhere=False)
        trees = sorted(self._completed_trees(cols, whole=True))
        for tree in trees:
            result = _finish_match(tree)
            if result is not None:
                return result
        return None

    def findall(self, text: str, tokens: Optional[List[Tok]] = None
                ) -> Iterator[Match]:
        """All non-overlapping matches, max-coverage resolved
        (parser.py:288-292, 217-229)."""
        cols = self._chart(tokens if tokens is not None
                           else self.tokenize(text), everywhere=True)
        trees = sorted(self._completed_trees(cols, whole=False))
        spans = []
        by_span = {}
        for tree in trees:
            span = tree.range
            if span in by_span:
                continue
            result = _finish_match(tree)
            if result is not None:
                spans.append(span)
                by_span[span] = result
        for span in pick_max_coverage(spans):
            yield by_span[span]

    def find(self, text: str) -> Optional[Match]:
        for m in self.findall(text):
            return m
        return None

    def extract(self, text: str, tokens: Optional[List[Tok]] = None
                ) -> Iterator[Match]:
        """Every completed parse incl. overlaps (debug mode,
        parser.py:283-286)."""
        cols = self._chart(tokens if tokens is not None
                           else self.tokenize(text), everywhere=True)
        for tree in self._completed_trees(cols, whole=False):
            result = _finish_match(tree)
            if result is not None:
                yield result
