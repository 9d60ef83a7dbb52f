"""Full-integration golden — reference tests/test_person.py."""

from yargy_spark import rule, and_, not_, Parser
from yargy_spark.interpretation import fact
from yargy_spark.predicates import gram
from yargy_spark.relations import gnc_relation
from yargy_spark.pipelines import morph_pipeline


def test_person():
    Name = fact('Name', ['first', 'last'])
    Person = fact('Person', ['position', 'name'])

    LAST = and_(gram('Surn'), not_(gram('Abbr')))
    FIRST = and_(gram('Name'), not_(gram('Abbr')))
    POSITION = morph_pipeline(['управляющий директор', 'вице-мэр'])

    gnc = gnc_relation()
    NAME = rule(
        FIRST.interpretation(Name.first).match(gnc),
        LAST.interpretation(Name.last).match(gnc),
    ).interpretation(Name)

    PERSON = rule(
        POSITION.interpretation(Person.position).match(gnc),
        NAME.interpretation(Person.name),
    ).interpretation(Person)

    match = Parser(PERSON).match('управляющий директор Иван Ульянов')
    assert match
    assert match.fact == Person(
        position='управляющий директор',
        name=Name(first='Иван', last='Ульянов'))
