"""Executable documentation: run the predicate bank's doctests
(reference affordance: bank.py examples via ``--doctest-modules``,
Makefile:2-4)."""

import doctest


def test_predicates_doctests():
    import yargy_spark.kernel.predicates as P
    result = doctest.testmod(P, verbose=False)
    assert result.failed == 0, '%d doctest failures' % result.failed
    assert result.attempted >= 20
