"""Agreement goldens — reference tests/test_relations.py."""

from yargy_spark import rule, and_, Parser
from yargy_spark.predicates import gram
from yargy_spark.relations import (main, gnc_relation, number_relation,
                                   gender_relation)
from yargy_spark.interpretation import fact


def test_name_gnc():
    Name = fact('Name', ['first', 'last'])
    gnc = gnc_relation()
    FIRST = gram('Name').interpretation(
        Name.first.inflected()).match(gnc)
    LAST = gram('Surn').interpretation(
        Name.last.inflected()).match(gnc)
    parser = Parser(rule(FIRST, LAST).interpretation(Name))

    assert parser.match('саше иванову').fact == \
        Name(first='саша', last='иванов')
    assert parser.match('сашу иванову').fact == \
        Name(first='саша', last='иванова')
    assert not parser.match('сашу ивановой')


def test_main():
    relation = and_(number_relation(), gender_relation())
    A = rule(gram('Surn'), main(gram('Name'))).match(relation)
    B = gram('VERB').match(relation)
    parser = Parser(rule(A, B))

    assert parser.match('иванов иван стал')
    assert not parser.match('иванов иван стали')
    assert parser.match('ивановы иван стал')
