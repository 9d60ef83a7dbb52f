"""Embedded morphological lexicon for the reference-test vocabulary.

pymorphy2/OpenCorpora cannot be installed in this sandbox, so this
module ships the (word -> readings) and (lemma -> paradigm) rows needed
by every golden in the reference test-suite and executable docs
(see FIXTURES.md §3).  Reading ORDER is significant: forms[0] supplies
``normalized`` and ``inflect`` (reference token.py:42-45, 122-127).

Exact-grams goldens transcribed from:
  - 'диски'  tests/test_tokenizer.py:85-95
  - 'сирота', 'стали', 'Александру'  tests/test_morph.py
  - 'век', 'стал'  docs/ref.ipynb cell 15
Other rows follow standard OpenCorpora analyses for the fixture
sentences (tests/test_person.py, tests/test_relations.py,
tests/test_pipeline.py, tests/test_interpretation.py, docs notebooks).

At 100 TB scale this module is replaced by the full OpenCorpora
dictionary loaded as a broadcast dimension table through the same
``Morphology`` interface; nothing else changes.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Tuple

# word -> ordered readings (lemma, "space-separated grammemes")
RAW: Dict[str, Tuple[Tuple[str, str], ...]] = {
    # --- tokenizer/morph goldens ------------------------------------
    'диски': (('диск', 'NOUN accs inan masc plur'),
              ('диск', 'NOUN inan masc nomn plur')),
    'диск': (('диск', 'NOUN inan masc nomn sing'),
             ('диск', 'NOUN accs inan masc sing')),
    'диске': (('диск', 'NOUN inan masc loct sing'),),
    'сирота': (('сирота', 'ms-f NOUN anim nomn sing'),),
    'стали': (('сталь', 'NOUN femn gent inan sing'),
              ('сталь', 'NOUN datv femn inan sing'),
              ('сталь', 'NOUN femn inan loct sing'),
              ('сталь', 'NOUN femn inan nomn plur'),
              ('сталь', 'NOUN accs femn inan plur'),
              ('стать', 'VERB indc intr past perf plur')),
    'сталь': (('сталь', 'NOUN femn inan nomn sing'),
              ('сталь', 'NOUN accs femn inan sing')),
    'стал': (('стать', 'VERB indc intr masc past perf sing'),),
    'век': (('век', 'NOUN inan masc nomn sing'),
            ('век', 'NOUN accs inan masc sing'),
            ('век', 'ADVB'),
            ('веко', 'NOUN gent inan neut plur')),

    # --- given names ---------------------------------------------------
    'александру': (('александр', 'NOUN Name anim datv masc sing'),),
    'александр': (('александр', 'NOUN Name anim masc nomn sing'),),
    'иван': (('иван', 'NOUN Name anim masc nomn sing'),),
    'ивана': (('иван', 'NOUN Name anim gent masc sing'),
              ('иван', 'NOUN Name accs anim masc sing')),
    'иваном': (('иван', 'NOUN Name ablt anim masc sing'),),
    'ивану': (('иван', 'NOUN Name anim datv masc sing'),),
    'саша': (('саша', 'ms-f NOUN Name anim nomn sing'),),
    'саше': (('саша', 'ms-f NOUN Name anim datv sing'),
             ('саша', 'ms-f NOUN Name anim loct sing')),
    'сашу': (('саша', 'ms-f NOUN Name accs anim sing'),),
    'маша': (('маша', 'NOUN Name anim femn nomn sing'),),
    'маше': (('маша', 'NOUN Name anim datv femn sing'),
             ('маша', 'NOUN Name anim femn loct sing')),
    'вадим': (('вадим', 'NOUN Name anim masc nomn sing'),),
    'вадиму': (('вадим', 'NOUN Name anim datv masc sing'),),
    'илье': (('илья', 'NOUN Name anim datv masc sing'),
             ('илья', 'NOUN Name anim loct masc sing')),
    'павлом': (('павел', 'NOUN Name ablt anim masc sing'),),
    'владимир': (('владимир', 'NOUN Name anim masc nomn sing'),),
    'владимира': (('владимир', 'NOUN Name anim gent masc sing'),
                  ('владимир', 'NOUN Name accs anim masc sing')),
    'марину': (('марина', 'NOUN Name accs anim femn sing'),),
    'марина': (('марина', 'NOUN Name anim femn nomn sing'),),
    'леонид': (('леонид', 'NOUN Name anim masc nomn sing'),),
    'леонида': (('леонид', 'NOUN Name anim gent masc sing'),
                ('леонид', 'NOUN Name accs anim masc sing')),

    # --- surnames -------------------------------------------------------
    'ульянов': (('ульянов', 'NOUN Surn anim masc nomn sing'),),
    'ульянова': (('ульянов', 'NOUN Surn anim gent masc sing'),
                 ('ульянов', 'NOUN Surn accs anim masc sing'),
                 ('ульянова', 'NOUN Surn anim femn nomn sing')),
    'ульяновым': (('ульянов', 'NOUN Surn ablt anim masc sing'),),
    'иванов': (('иванов', 'NOUN Surn anim masc nomn sing'),),
    'иванову': (('иванов', 'NOUN Surn anim datv masc sing'),
                ('иванова', 'NOUN Surn accs anim femn sing')),
    'ивановой': (('иванова', 'NOUN Surn anim femn gent sing'),
                 ('иванова', 'NOUN Surn anim datv femn sing'),
                 ('иванова', 'NOUN Surn ablt anim femn sing'),
                 ('иванова', 'NOUN Surn anim femn loct sing')),
    'ивановым': (('иванов', 'NOUN Surn ablt anim masc sing'),
                 ('иванов', 'NOUN Surn anim datv masc plur')),
    'ивановы': (('иванов', 'NOUN Surn anim masc nomn plur'),),
    'иванова': (('иванов', 'NOUN Surn anim gent masc sing'),
                ('иванов', 'NOUN Surn accs anim masc sing'),
                ('иванова', 'NOUN Surn anim femn nomn sing')),
    'семенов': (('семенов', 'NOUN Surn anim masc nomn sing'),),
    'быков': (('быков', 'NOUN Surn anim masc nomn sing'),
              ('бык', 'NOUN anim gent masc plur')),
    'путин': (('путин', 'NOUN Surn anim masc nomn sing'),),
    'путина': (('путин', 'NOUN Surn anim gent masc sing'),
               ('путин', 'NOUN Surn accs anim masc sing')),
    'путиным': (('путин', 'NOUN Surn ablt anim masc sing'),),
    'игореву': (('игорева', 'NOUN Surn accs anim femn sing'),),
    'рожков': (('рожков', 'NOUN Surn anim masc nomn sing'),),
    'рожкова': (('рожков', 'NOUN Surn anim gent masc sing'),
                ('рожков', 'NOUN Surn accs anim masc sing')),

    # --- positions / professions ----------------------------------------
    'управляющий': (('управляющий', 'NOUN anim masc nomn sing'),
                    ('управлять', 'PRTF actv impf intr masc nomn pres sing')),
    'директор': (('директор', 'NOUN anim masc nomn sing'),),
    'президент': (('президент', 'NOUN anim masc nomn sing'),),
    'президента': (('президент', 'NOUN anim gent masc sing'),
                   ('президент', 'NOUN accs anim masc sing')),
    'премьер': (('премьер', 'NOUN anim masc nomn sing'),),
    'министр': (('министр', 'NOUN anim masc nomn sing'),),
    'бухгалтер': (('бухгалтер', 'NOUN anim masc nomn sing'),),
    'бухгалтера': (('бухгалтер', 'NOUN anim gent masc sing'),
                   ('бухгалтер', 'NOUN accs anim masc sing')),
    'главный': (('главный', 'ADJF Qual masc nomn sing'),),
    'главного': (('главный', 'ADJF Qual gent masc sing'),
                 ('главный', 'ADJF Qual accs anim masc sing')),
    'учитель': (('учитель', 'NOUN anim masc nomn sing'),),
    'учителя': (('учитель', 'NOUN anim gent masc sing'),
                ('учитель', 'NOUN accs anim masc sing'),
                ('учитель', 'NOUN anim masc nomn plur')),
    'врач': (('врач', 'NOUN anim masc nomn sing'),),
    'врачи': (('врач', 'NOUN anim masc nomn plur'),),

    # --- months (goldens use июня/июля/марта; nomn rows keep the
    #     dictionary() expansion deterministic) --------------------------
    'январь': (('январь', 'NOUN inan masc nomn sing'),
               ('январь', 'NOUN accs inan masc sing')),
    'января': (('январь', 'NOUN gent inan masc sing'),),
    'январе': (('январь', 'NOUN inan loct masc sing'),),
    'февраль': (('февраль', 'NOUN inan masc nomn sing'),),
    'март': (('март', 'NOUN inan masc nomn sing'),),
    'марта': (('март', 'NOUN gent inan masc sing'),),
    'апрель': (('апрель', 'NOUN inan masc nomn sing'),),
    'мая': (('май', 'NOUN gent inan masc sing'),),
    'май': (('май', 'NOUN inan masc nomn sing'),),
    'июнь': (('июнь', 'NOUN inan masc nomn sing'),),
    'июня': (('июнь', 'NOUN gent inan masc sing'),),
    'июль': (('июль', 'NOUN inan masc nomn sing'),),
    'июля': (('июль', 'NOUN gent inan masc sing'),),
    'август': (('август', 'NOUN inan masc nomn sing'),),
    'сентябрь': (('сентябрь', 'NOUN inan masc nomn sing'),),
    'октябрь': (('октябрь', 'NOUN inan masc nomn sing'),),
    'ноябрь': (('ноябрь', 'NOUN inan masc nomn sing'),),
    'декабрь': (('декабрь', 'NOUN inan masc nomn sing'),),

    # --- money ----------------------------------------------------------
    'тысяч': (('тысяча', 'NOUN femn gent inan plur'),),
    'тысяча': (('тысяча', 'NOUN femn inan nomn sing'),),
    'миллион': (('миллион', 'NOUN inan masc nomn sing'),),

    # --- adjectives / toponyms -------------------------------------------
    'московским': (('московский', 'ADJF ablt masc sing'),
                   ('московский', 'ADJF ablt neut sing'),
                   ('московский', 'ADJF datv plur')),
    'московский': (('московский', 'ADJF masc nomn sing'),),
    'московская': (('московский', 'ADJF femn nomn sing'),),
    'зоопарк': (('зоопарк', 'NOUN inan masc nomn sing'),),
    'погода': (('погода', 'NOUN femn inan nomn sing'),),
    'слово': (('слово', 'NOUN inan neut nomn sing'),
              ('слово', 'NOUN accs inan neut sing')),
    'красная': (('красный', 'ADJF Qual femn nomn sing'),),
    'красной': (('красный', 'ADJF Qual femn gent sing'),
                ('красный', 'ADJF Qual datv femn sing'),
                ('красный', 'ADJF Qual ablt femn sing'),
                ('красный', 'ADJF Qual femn loct sing')),
    'площадь': (('площадь', 'NOUN femn inan nomn sing'),
                ('площадь', 'NOUN accs femn inan sing')),
    'площади': (('площадь', 'NOUN femn gent inan sing'),
                ('площадь', 'NOUN datv femn inan sing'),
                ('площадь', 'NOUN femn inan loct sing'),
                ('площадь', 'NOUN femn inan nomn plur')),
    'первомайская': (('первомайский', 'ADJF femn nomn sing'),),
    'первомайскую': (('первомайский', 'ADJF accs femn sing'),),
    'улица': (('улица', 'NOUN femn inan nomn sing'),),
    'улицу': (('улица', 'NOUN accs femn inan sing'),),
    'чеченской': (('чеченский', 'ADJF femn gent sing'),
                  ('чеченский', 'ADJF femn loct sing')),
    'республике': (('республика', 'NOUN datv femn inan sing'),
                   ('республика', 'NOUN femn inan loct sing')),
    'республика': (('республика', 'NOUN femn inan nomn sing'),),
    'донецкая': (('донецкий', 'ADJF femn nomn sing'),),
    'народная': (('народный', 'ADJF femn nomn sing'),),
    'федерация': (('федерация', 'NOUN femn inan nomn sing'),),
    'башня': (('башня', 'NOUN femn inan nomn sing'),),

    # --- morph_pipeline fixtures -----------------------------------------
    'электронный': (('электронный', 'ADJF masc nomn sing'),),
    'электронным': (('электронный', 'ADJF ablt masc sing'),
                    ('электронный', 'ADJF ablt neut sing')),
    'электронные': (('электронный', 'ADJF nomn plur'),),
    'электронное': (('электронный', 'ADJF neut nomn sing'),),
    'дневник': (('дневник', 'NOUN inan masc nomn sing'),),
    'дневником': (('дневник', 'NOUN ablt inan masc sing'),),
    'дневники': (('дневник', 'NOUN inan masc nomn plur'),),
    'дневнику': (('дневник', 'NOUN datv inan masc sing'),),
    'текст': (('текст', 'NOUN inan masc nomn sing'),
              ('текст', 'NOUN accs inan masc sing')),
    'текстом': (('текст', 'NOUN ablt inan masc sing'),),
    'песни': (('песня', 'NOUN femn gent inan sing'),
              ('песня', 'NOUN femn inan nomn plur')),
    'песня': (('песня', 'NOUN femn inan nomn sing'),),
    'материал': (('материал', 'NOUN inan masc nomn sing'),
                 ('материал', 'NOUN accs inan masc sing')),
    'материала': (('материал', 'NOUN gent inan masc sing'),),
    'информационный': (('информационный', 'ADJF masc nomn sing'),),
    'информационного': (('информационный', 'ADJF gent masc sing'),
                        ('информационный', 'ADJF gent neut sing')),
    'музыкальной': (('музыкальный', 'ADJF femn gent sing'),),
    'группы': (('группа', 'NOUN femn gent inan sing'),
               ('группа', 'NOUN femn inan nomn plur')),
    'названием': (('название', 'NOUN ablt inan neut sing'),),
    'закрытое': (('закрытый', 'ADJF neut nomn sing'),),
    'закрытом': (('закрытый', 'ADJF loct masc sing'),
                 ('закрытый', 'ADJF loct neut sing')),
    'обществе': (('общество', 'NOUN inan loct neut sing'),),
    'общество': (('общество', 'NOUN inan neut nomn sing'),),
    'завод': (('завод', 'NOUN inan masc nomn sing'),),
    'заводе': (('завод', 'NOUN inan loct masc sing'),),
    'пени': (('пеня', 'NOUN femn gent inan sing'),
             ('пеня', 'NOUN femn inan nomn plur')),
    'пеня': (('пеня', 'NOUN femn inan nomn sing'),),
    'неустойка': (('неустойка', 'NOUN femn inan nomn sing'),),
    'неустойку': (('неустойка', 'NOUN accs femn inan sing'),),
    'наша': (('наш', 'ADJF Apro femn nomn sing'),),
    'нашей': (('наш', 'ADJF Apro femn gent sing'),),
    'эра': (('эра', 'NOUN femn inan nomn sing'),),
    'эры': (('эра', 'NOUN femn gent inan sing'),),
}

# lemma -> paradigm rows (word, grams), used only by Form.inflect.
# Row order: first row covering the target grammeme set wins.
PARADIGM_RAW: Dict[str, Tuple[Tuple[str, str], ...]] = {
    'александр': (('александр', 'nomn sing'), ('александра', 'gent sing'),
                  ('александру', 'datv sing'), ('александра', 'accs sing'),
                  ('александром', 'ablt sing'), ('александре', 'loct sing'),
                  ('александры', 'nomn plur'), ('александров', 'accs plur')),
    'саша': (('саша', 'nomn sing'), ('саши', 'gent sing'),
             ('саше', 'datv sing'), ('сашу', 'accs sing'),
             ('сашей', 'ablt sing'), ('саше', 'loct sing'),
             ('саши', 'nomn plur'), ('саш', 'accs plur')),
    'маша': (('маша', 'nomn sing'), ('маши', 'gent sing'),
             ('маше', 'datv sing'), ('машу', 'accs sing'),
             ('машей', 'ablt sing'), ('маше', 'loct sing'),
             ('маши', 'nomn plur'), ('маш', 'accs plur')),
    'вадим': (('вадим', 'nomn sing'), ('вадима', 'gent sing'),
              ('вадиму', 'datv sing'), ('вадима', 'accs sing'),
              ('вадимом', 'ablt sing'), ('вадиме', 'loct sing'),
              ('вадимы', 'nomn plur'), ('вадимов', 'accs plur')),
    'илья': (('илья', 'nomn sing'), ('ильи', 'gent sing'),
             ('илье', 'datv sing'), ('илью', 'accs sing'),
             ('ильёй', 'ablt sing'), ('илье', 'loct sing')),
    'павел': (('павел', 'nomn sing'), ('павла', 'gent sing'),
              ('павлу', 'datv sing'), ('павла', 'accs sing'),
              ('павлом', 'ablt sing'), ('павле', 'loct sing')),
    'иван': (('иван', 'nomn sing'), ('ивана', 'gent sing'),
             ('ивану', 'datv sing'), ('ивана', 'accs sing'),
             ('иваном', 'ablt sing'), ('иване', 'loct sing')),
    'владимир': (('владимир', 'nomn sing'), ('владимира', 'gent sing'),
                 ('владимиру', 'datv sing'), ('владимира', 'accs sing'),
                 ('владимиром', 'ablt sing'), ('владимире', 'loct sing')),
    'марина': (('марина', 'nomn sing'), ('марины', 'gent sing'),
               ('марине', 'datv sing'), ('марину', 'accs sing'),
               ('мариной', 'ablt sing'), ('марине', 'loct sing')),
    'леонид': (('леонид', 'nomn sing'), ('леонида', 'gent sing'),
               ('леониду', 'datv sing'), ('леонида', 'accs sing')),
    'ульянов': (('ульянов', 'nomn sing'), ('ульянова', 'gent sing'),
                ('ульянову', 'datv sing'), ('ульянова', 'accs sing'),
                ('ульяновым', 'ablt sing'), ('ульянове', 'loct sing'),
                ('ульяновы', 'nomn plur')),
    'иванов': (('иванов', 'nomn sing'), ('иванова', 'gent sing'),
               ('иванову', 'datv sing'), ('иванова', 'accs sing'),
               ('ивановым', 'ablt sing'), ('иванове', 'loct sing'),
               ('ивановы', 'nomn plur')),
    'иванова': (('иванова', 'nomn sing'), ('ивановой', 'gent sing'),
                ('ивановой', 'datv sing'), ('иванову', 'accs sing'),
                ('ивановой', 'ablt sing'), ('ивановой', 'loct sing'),
                ('ивановы', 'nomn plur')),
    'семенов': (('семенов', 'nomn sing'), ('семенова', 'gent sing'),
                ('семенову', 'datv sing'), ('семенова', 'accs sing')),
    'быков': (('быков', 'nomn sing'), ('быкова', 'gent sing'),
              ('быкову', 'datv sing'), ('быкова', 'accs sing')),
    'путин': (('путин', 'nomn sing'), ('путина', 'gent sing'),
              ('путину', 'datv sing'), ('путина', 'accs sing'),
              ('путиным', 'ablt sing'), ('путине', 'loct sing')),
    'игорева': (('игорева', 'nomn sing'), ('игоревой', 'gent sing'),
                ('игоревой', 'datv sing'), ('игореву', 'accs sing')),
    'рожков': (('рожков', 'nomn sing'), ('рожкова', 'gent sing'),
               ('рожкову', 'datv sing'), ('рожкова', 'accs sing')),
    'московский': (('московский', 'masc nomn sing'),
                   ('московская', 'femn nomn sing'),
                   ('московское', 'neut nomn sing'),
                   ('московские', 'nomn plur')),
    'январь': (('январь', 'nomn sing'), ('января', 'gent sing'),
               ('январю', 'datv sing'), ('январь', 'accs sing'),
               ('январём', 'ablt sing'), ('январе', 'loct sing'),
               ('январи', 'nomn plur')),
    'президент': (('президент', 'nomn sing'), ('президента', 'gent sing'),
                  ('президенту', 'datv sing'), ('президента', 'accs sing'),
                  ('президентом', 'ablt sing'), ('президенте', 'loct sing'),
                  ('президенты', 'nomn plur')),
    'бухгалтер': (('бухгалтер', 'nomn sing'), ('бухгалтера', 'gent sing'),
                  ('бухгалтеру', 'datv sing'), ('бухгалтера', 'accs sing')),
    'управляющий': (('управляющий', 'masc nomn sing'),
                    ('управляющая', 'femn nomn sing'),
                    ('управляющие', 'nomn plur')),
    'директор': (('директор', 'nomn sing'), ('директора', 'gent sing'),
                 ('директору', 'datv sing'), ('директора', 'accs sing')),
}


def build_entries() -> Dict[str, List[Tuple[str, FrozenSet[str]]]]:
    return {
        word: [(lemma, frozenset(grams.split())) for lemma, grams in readings]
        for word, readings in RAW.items()
    }


def build_paradigms() -> Dict[str, List[Tuple[str, FrozenSet[str]]]]:
    return {
        lemma: [(word, frozenset(grams.split())) for word, grams in rows]
        for lemma, rows in PARADIGM_RAW.items()
    }


def lexicon_rows():
    """Flat rows (word, form_idx, lemma, grams) — the broadcast/dimension
    table layout used by the Spark side (FIXTURES.md §3)."""
    for word, readings in sorted(RAW.items()):
        for idx, (lemma, grams) in enumerate(readings):
            yield (word, idx, lemma, sorted(grams.split()))
