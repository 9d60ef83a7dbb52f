"""Address extractor goldens — the fourth canonical fact type
(north_star: Person/Name, Date, Money, Address).  Grammar shapes:
'<type> <genitive name>' and '<ADJF name> <type>', optional house
number ('дом 5' / 'д. 5' / bare INT)."""

from yargy_spark import Parser
from yargy_spark.extractors import Address, build_address


def _facts(text):
    return [m.fact for m in Parser(build_address()).findall(text)]


def test_type_then_genitive_name_with_house():
    assert _facts('живу на улице Ленина дом 5') == [
        Address(street_type='улица', street='ленина', house=5)]


def test_adj_name_then_type():
    """The ADJF name re-inflects to nominative PRESERVING the gender
    agreement with the street type (closest-form inflection, pymorphy
    Parse.inflect parity) — 'первомайская', not the masc lemma."""
    assert _facts('офис на Первомайской улице') == [
        Address(street_type='улица', street='первомайская', house=None)]


def test_abbreviated_house_marker():
    assert _facts('магазин на проспекте Мира д. 12') == [
        Address(street_type='проспект', street='мира', house=12)]


def test_bare_house_number():
    assert _facts('свернул в Глухой переулок 3') == [
        Address(street_type='переулок', street='глухой', house=3)]


def test_oblique_street_type():
    """Regression: fleeting-vowel street types must match in oblique
    cases (переулок -> переулке)."""
    assert _facts('офис в Тихом переулке 3') == [
        Address(street_type='переулок', street='тихий', house=3)]


def test_no_false_positives():
    assert _facts('дом 5 без адреса') == []
    assert _facts('просто разговор о погоде') == []
