"""Agreement relations: theta-joins between matched tokens' readings.

Semantics parity: /root/reference/yargy/relations/bank.py (gender at
:13-32 incl. plural-plural, bi-gender 'Ms-f', 'GNdr'; number at :35-51
incl. Sgtm/Pltm; case 7-bit mask equality or 'Fixd' at :54-64),
relations/constructors.py (Main/compositions) and relations/graph.py
(pairwise form filtering; a match dies if any token loses all readings
— graph.py:49-70, golden: 'сашу ивановой' rejected,
tests/test_relations.py:45-46).

Checks run on the precomputed bitmasks from ``morphology.Form`` so the
in-UDF hot path is a handful of integer ops per form pair.
"""

from __future__ import annotations

from itertools import combinations

from .morphology import Form

_MASC, _FEMN, _NEUT, _BI, _GNDR = 1, 2, 4, 8, 16
_SING, _PLUR, _SGTM, _PLTM = 1, 2, 4, 8


class Relation:
    label = 'relation'

    def __call__(self, a: Form, b: Form) -> bool:
        raise NotImplementedError


def is_relation(item) -> bool:
    return isinstance(item, Relation)


class Main:
    """Marks the head term of a production (relations propagate through
    heads; default head is the leftmost term — constructors.py:6-14)."""

    def __init__(self, term):
        self.term = term


def main(term) -> Main:
    return Main(term)


class gender_relation(Relation):
    label = 'gender'

    def __call__(self, a, b):
        if a.number_bits & _PLUR and b.number_bits & _PLUR:
            return True
        ga, gb = a.gender_bits, b.gender_bits
        return bool(
            (ga & gb & (_MASC | _FEMN | _NEUT))
            or (ga & _BI and gb & (_MASC | _FEMN))
            or (gb & _BI and ga & (_MASC | _FEMN))
            or (ga & _GNDR) or (gb & _GNDR)
        )


class number_relation(Relation):
    label = 'number'

    def __call__(self, a, b):
        na, nb = a.number_bits, b.number_bits
        return bool(
            (na & nb & (_SING | _PLUR))
            or (na & _SGTM and nb & _SING)
            or (na & _PLTM and nb & _PLUR)
            or (nb & _SGTM and na & _SING)
            or (nb & _PLTM and na & _PLUR)
        )


class case_relation(Relation):
    label = 'case'

    def __call__(self, a, b):
        return (a.case_bits == b.case_bits
                or a.case_fixed or b.case_fixed)


class gnc_relation(Relation):
    label = 'gnc'

    _g = gender_relation()
    _n = number_relation()
    _c = case_relation()

    def __call__(self, a, b):
        return self._g(a, b) and self._n(a, b) and self._c(a, b)


class AndRel(Relation):
    def __init__(self, relations):
        self.relations = list(relations)

    def __call__(self, a, b):
        return all(r(a, b) for r in self.relations)

    @property
    def label(self):
        return 'and_(%s)' % ', '.join(r.label for r in self.relations)


class OrRel(Relation):
    def __init__(self, relations):
        self.relations = list(relations)

    def __call__(self, a, b):
        return any(r(a, b) for r in self.relations)

    @property
    def label(self):
        return 'or_(%s)' % ', '.join(r.label for r in self.relations)


class NotRel(Relation):
    def __init__(self, relation):
        self.relation = relation

    def __call__(self, a, b):
        return not self.relation(a, b)

    @property
    def label(self):
        return 'not_(%s)' % self.relation.label


class TokenAgreementGraph:
    """Collects (relation, token) pairs from a parse tree, then filters
    each token's readings to the mutually compatible subset
    (graph.py:17-78).  Iterated semi-join of form sets."""

    def __init__(self):
        # relation identity groups its member tokens
        self._groups = {}        # id(relation) -> (relation, [tokens])
        self._forms = {}         # id(token) -> [forms]
        self._tokens = {}        # id(token) -> token

    def add(self, relation, token):
        key = id(relation)
        if key not in self._groups:
            self._groups[key] = (relation, [])
        self._groups[key][1].append(token)
        tid = id(token)
        if tid not in self._forms:
            self._tokens[tid] = token
            self._forms[tid] = list(token.forms or ())

    def validate(self) -> bool:
        for relation, tokens in self._groups.values():
            for first, second in combinations(tokens, 2):
                fid, sid = id(first), id(second)
                ff, sf = self._forms[fid], self._forms[sid]
                keep_f, keep_s = [], []
                for a in ff:
                    for b in sf:
                        if relation(a, b):
                            if a not in keep_f:
                                keep_f.append(a)
                            if b not in keep_s:
                                keep_s.append(b)
                self._forms[fid] = keep_f
                self._forms[sid] = keep_s
        return all(self._forms[tid] for tid in self._tokens)

    def constrain(self, token):
        tid = id(token)
        if tid in self._tokens:
            return token.constrained(self._forms[tid])
        return token
