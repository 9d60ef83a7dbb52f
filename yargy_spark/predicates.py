"""API-compat shim mirroring ``yargy.predicates``
(/root/reference/yargy/predicates/__init__.py)."""

from .kernel.predicates import (  # noqa: F401
    Pred as Predicate,
    is_predicate,
    true, is_lower, is_upper, is_title, is_capitalized,
    eq, caseless, in_, in_caseless, length_eq, gte, lte,
    normalized, dictionary, gram, is_single, custom,
    type_, tag,
    AndPred as AndPredicate, OrPred as OrPredicate,
    NotPred as NotPredicate,
)

# the reference exports the builtin-shadowing name ``type``
type = type_  # noqa: A001
