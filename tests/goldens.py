"""Expected extractions for every golden sentence (the P/R oracle).

Derived from the reference's committed assertions (tests/) and
executable docs (docs/*.ipynb) — see FIXTURES.md §5.  Keyed by the
conv_id assigned in ``golden_only_transcripts``.
"""

# (conv_id, rule_id, fact_json-as-dict)
EXPECTED_FACTS = [
    ('g000000', 'person', {'name': {'first': 'Иван', 'last': 'Ульянов'},
                           'position': 'управляющий директор'}),
    ('g000000', 'name', {'first': 'иван', 'last': 'ульянов'}),
    ('g000001', 'name', {'first': 'саша', 'last': 'иванов'}),
    ('g000002', 'name', {'first': 'саша', 'last': 'иванова'}),
    ('g000003', 'date', {'day': 8, 'month': 6, 'year': 2015}),
    ('g000004', 'date', {'day': 18, 'month': 7, 'year': 2016}),
    ('g000005', 'date', {'day': 2, 'month': 1, 'year': 2016}),
    ('g000006', 'date', {'year': 2015}),
    ('g000007', 'money', {'currency': '$', 'value': '5 тысяч'}),
    ('g000008', 'era', {'value': 'AD'}),
    ('g000008', 'era', {'value': 'BC'}),
    ('g000009', 'geo', {'name': 'красная площадь'}),
    ('g000009', 'geo', {'name': 'первомайская улица'}),
    ('g000010', 'geo', {'name': 'чеченский республика'}),
    ('g000011', 'geo', {'name': 'донецкий народный республика'}),
    ('g000012', 'name', {'first': 'владимир', 'last': 'путин'}),
    ('g000012', 'person_norm',
     {'name': {'first': 'владимир', 'last': 'путин'},
      'position': 'президент'}),
    ('g000013', 'name', {'first': 'саша', 'last': 'быков'}),
    ('g000014', 'name', {'first': 'иван', 'last': 'ульянов'}),
    ('g000015', 'name', {'first': 'иван', 'last': 'ульянов'}),
    ('g000016', 'name', {'first': 'иван', 'last': 'ульянов'}),
]


def expected_set():
    import json
    return {(c, r, json.dumps(f, ensure_ascii=False, sort_keys=True))
            for c, r, f in EXPECTED_FACTS}
