"""Executable-docs goldens — reference docs/index.ipynb and
docs/ref.ipynb (the cells FIXTURES.md §5 lists)."""

from yargy_spark import rule, or_, and_, Parser
from yargy_spark.interpretation import fact, attribute, normalized as n_, \
    inflected, const, custom
from yargy_spark.predicates import (gram, dictionary, gte, lte,
                                    is_capitalized, eq, normalized,
                                    type_)
from yargy_spark.relations import gnc_relation, case_relation, main
from yargy_spark.pipelines import morph_pipeline


MONTH_WORDS = {'январь', 'февраль', 'март', 'апрель', 'мая', 'июнь',
               'июль', 'август', 'сентябрь', 'октябрь', 'ноябрь',
               'декабрь'}
MONTH_NAME = dictionary(MONTH_WORDS)
DAY = and_(gte(1), lte(31))
MONTH = and_(gte(1), lte(12))
YEAR = and_(gte(1900), lte(2100))


def test_geo_findall():
    """index.ipynb cell 6."""
    GEO = rule(
        and_(gram('ADJF'), is_capitalized()),
        gram('ADJF').optional().repeatable(),
        dictionary({'федерация', 'республика'}))
    text = ('\nВ Чеченской республике на день рождения ...\n'
            'Донецкая народная республика провозгласила ...\n'
            'Башня Федерация — одна из самых высоких ...\n')
    got = [[t.value for t in m.tokens] for m in Parser(GEO).findall(text)]
    assert got == [['Чеченской', 'республике'],
                   ['Донецкая', 'народная', 'республика']]


def test_date_shapes():
    """index.ipynb cells 46-50."""
    DATE = or_(
        rule(DAY, MONTH_NAME, YEAR),
        rule(YEAR, '-', MONTH, '-', DAY),
        rule(YEAR, 'г', '.')).named('DATE')
    parser = Parser(DATE)
    for line in ['2015г.', '18 июля 2016', '2016-01-02']:
        assert parser.match(line)


def test_date_normalized():
    """index.ipynb cell 54 / ref.ipynb cell 69."""
    Date = fact('Date', ['year', 'month', 'day'])
    MONTHS = {'январь': 1, 'февраль': 2, 'март': 3, 'апрель': 4,
              'мая': 5, 'июнь': 6, 'июль': 7, 'август': 8,
              'сентябрь': 9, 'октябрь': 10, 'ноябрь': 11, 'декабрь': 12}
    DATE = rule(
        DAY.interpretation(Date.day.custom(int)),
        MONTH_NAME.interpretation(Date.month.normalized()
                                  .custom(MONTHS.get)),
        YEAR.interpretation(Date.year.custom(int)),
    ).interpretation(Date)
    assert Parser(DATE).match('18 июня 2016').fact == \
        Date(year=2016, month=6, day=18)
    assert Parser(DATE).match('8 июня 2015').fact == \
        Date(year=2015, month=6, day=8)


def test_date_attribute_default():
    """ref.ipynb cell 27: default year 2017."""
    Date = fact('Date', [attribute('year', 2017), 'month', 'day'])
    DATE = rule(
        DAY.interpretation(Date.day),
        MONTH_NAME.interpretation(Date.month),
        YEAR.interpretation(Date.year).optional(),
    ).interpretation(Date)
    parser = Parser(DATE)
    assert parser.match('18 июля 2016').fact == \
        Date(year='2016', month='июля', day='18')
    assert parser.match('15 марта').fact == \
        Date(year=2017, month='марта', day='15')


def test_money():
    """ref.ipynb cells 31-33."""
    Money = fact('Money', ['value', 'currency'])
    MONEY = rule(
        rule(type_('INT'),
             dictionary({'тысяча', 'миллион'})).interpretation(
            Money.value),
        eq('$').interpretation(Money.currency),
    ).interpretation(Money)
    assert Parser(MONEY).match('5 тысяч$').fact == \
        Money(value='5 тысяч', currency='$')


def test_geo_normalized_words():
    """ref.ipynb cells 59-61: word-wise normalization vs gazetteer key."""
    Geo = fact('Geo', ['name'])
    RULE = rule(normalized('Красная'), normalized('площадь')) \
        .interpretation(Geo.name.normalized()).interpretation(Geo)
    got = [m.fact for m in Parser(RULE).findall('на Красной площади')]
    assert got == [Geo(name='красный площадь')]

    RULE = morph_pipeline(['красная площадь', 'первомайская улица']) \
        .interpretation(Geo.name.normalized()).interpretation(Geo)
    got = [m.fact for m in Parser(RULE).findall(
        'c Красной площади на Первомайскую улицу')]
    assert got == [Geo(name='красная площадь'),
                   Geo(name='первомайская улица')]


def test_inflected_names():
    """ref.ipynb cells 63-65."""
    Name = fact('Name', ['first'])
    NAME = gram('Name').interpretation(
        Name.first.inflected()).interpretation(Name)
    got = [m.fact.first for m in Parser(NAME).findall('Саше, Маше, Вадиму')]
    assert got == ['саша', 'маша', 'вадим']

    NAME = gram('Name').interpretation(
        Name.first.inflected({'accs', 'plur'})).interpretation(Name)
    got = [m.fact.first for m in Parser(NAME).findall('Саша, Маша, Вадим')]
    assert got == ['саш', 'маш', 'вадимов']


def test_era_const():
    """ref.ipynb cell 71."""
    Era = fact('Era', ['value'])
    BC = morph_pipeline(['до нашей эры', 'до н.э.']).interpretation(
        Era.value.const('BC'))
    AD = morph_pipeline(['наша эра', 'н.э.']).interpretation(
        Era.value.const('AD'))
    ERA = or_(BC, AD).interpretation(Era)
    got = [m.fact.value for m in Parser(ERA).findall('наша эра, до н.э.')]
    assert got == ['AD', 'BC']


def test_gnc_findall():
    """index.ipynb cells 60-66."""
    Name = fact('Name', ['first', 'last'])
    gnc = gnc_relation()
    NAME = rule(
        gram('Name').interpretation(Name.first.inflected()).match(gnc),
        gram('Surn').interpretation(Name.last.inflected()).match(gnc),
    ).interpretation(Name)
    parser = Parser(NAME)

    got = [[t.value for t in m.tokens]
           for m in parser.findall('Илье Ивановым, Павлом Семенов, Саша Быков')]
    assert got == [['Саша', 'Быков']]

    got = [m.fact for m in parser.findall('Сашу Иванову, Саше Иванову')]
    assert got == [Name(first='саша', last='иванова'),
                   Name(first='саша', last='иванов')]


def test_case_relation_main():
    """ref.ipynb cells 74-77."""
    Name = fact('Name', ['first', 'last'])
    gnc = gnc_relation()
    NAME = rule(
        gram('Name').interpretation(Name.first.inflected()).match(gnc),
        gram('Surn').interpretation(Name.last.inflected()).match(gnc),
    ).interpretation(Name)

    case = case_relation()
    POSITION = rule(normalized('главный'), main(normalized('бухгалтер')))
    PERSON = rule(POSITION.match(case), NAME.match(case))
    parser = Parser(PERSON)
    assert not parser.match('главного бухгалтер марину игореву')
    assert parser.match('главного бухгалтера марину игореву')


def test_person_position_inflected():
    """index.ipynb cell 9."""
    Person = fact('Person', ['position', 'name'])
    Name = fact('Name', ['first', 'last'])
    POSITION = morph_pipeline(['премьер министр', 'президент'])
    NAME = rule(
        gram('Name').interpretation(Name.first.inflected()),
        gram('Surn').interpretation(Name.last.inflected()),
    ).interpretation(Name)
    PERSON = rule(
        POSITION.interpretation(Person.position.inflected()),
        NAME.interpretation(Person.name),
    ).interpretation(Person)
    got = [m.fact for m in Parser(PERSON).findall(
        '12 марта по приказу президента Владимира Путина ...')]
    assert got == [Person(position='президент',
                          name=Name(first='владимир', last='путин'))]


def test_repeatable_titles():
    """ref.ipynb cells 46-48: repeatable attribute collects every
    occurrence instead of rightmost-wins."""
    from yargy_spark import not_
    Item = fact('Item', [attribute('titles').repeatable()])
    TITLE = rule('«', not_(eq('»')).repeatable(), '»')
    ITEM = rule(
        TITLE.interpretation(Item.titles),
        eq(',').optional(),
    ).repeatable().interpretation(Item)
    match = Parser(ITEM).match('«Каштанка», «Дядя Ваня»')
    assert match.fact == Item(titles=['«Каштанка»', '«Дядя Ваня»'])


def test_recursive_construct_merge():
    """ref.ipynb cells 50-52: construct-under-construct via a
    recursive grammar — the two partial Items merge field-wise."""
    from yargy_spark import forward, not_
    Date = fact('Date', [attribute('year', 2017), 'month', 'day'])
    DATE = rule(
        DAY.interpretation(Date.day),
        MONTH_NAME.interpretation(Date.month),
        YEAR.interpretation(Date.year).optional(),
    ).interpretation(Date)
    TITLE = rule('«', not_(eq('»')).repeatable(), '»')
    Item = fact('Item', ['title', 'date'])
    ITEM = forward().interpretation(Item)
    ITEM.define(or_(
        TITLE.interpretation(Item.title),
        rule(ITEM, TITLE),
        rule(ITEM, DATE.interpretation(Item.date))))
    match = Parser(ITEM).match('«Каштанка» 18 июня')
    assert match.fact == Item(
        title='«Каштанка»',
        date=Date(year=2017, month='июня', day='18'))
