"""Deterministic synthetic transcript corpus.

Input-table contract (BASELINE.json.input_hint):
    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

The generator is pure Spark expressions over ``spark.range`` — no
Python in the data path, no RNG: every cell is a deterministic function
of the row id, so the same (sf, seed) always produces byte-identical
tables at any parallelism (the per-turn text equality invariant vs the
reference, and the basis of the two-parallelism scaling benchmark).

Turn texts cycle through the golden sentence pool (FIXTURES.md §5 —
sentences whose expected extractions are pinned by the reference test
suite) embedded in filler clauses, plus pure-filler turns, in a fixed
id-derived pattern.  Scale: SF 1.0 == 1,000,000 turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Golden sentences (FIXTURES.md §5.1/5.2).  Index in this list is the
# sentence id; expected extractions for P/R live in tests/goldens.py.
GOLDEN_SENTENCES = [
    'управляющий директор Иван Ульянов',                      # 0 person
    'саше иванову',                                           # 1 name
    'сашу иванову',                                           # 2 name
    '8 июня 2015',                                            # 3 date
    '18 июля 2016',                                           # 4 date
    '2016-01-02',                                             # 5 date
    '2015г.',                                                 # 6 date
    '5 тысяч$',                                               # 7 money
    'наша эра, до н.э.',                                      # 8 era
    'c Красной площади на Первомайскую улицу',                # 9 geo
    'В Чеченской республике на день рождения',                # 10 geo
    'Донецкая народная республика провозгласила',             # 11 geo
    '12 марта по приказу президента Владимира Путина',        # 12 person_norm+date(no year)
    'Илье Ивановым, Павлом Семенов, Саша Быков',              # 13 name
    'Иван Ульянов выступил с докладом',                       # 14 linking
    'по словам Ивана Ульянова всё готово',                    # 15 linking
    'мы говорили с Иваном Ульяновым вчера',                   # 16 linking
]

FILLERS = [
    'пользователь задал вопрос о статусе заявки',
    'ассистент ответил на вопрос и завершил диалог',
    'инструмент вернул результат без ошибок',
    'обсудили детали поставки и сроки',
    'запрос передан в обработку',
]

ROLES = ['user', 'assistant', 'tool']
TOOLS = ['search', 'calculator', 'db']

TURNS_PER_SF = 1_000_000
TURNS_PER_CONV = 8
# default synthetic corpus size for the batch job; the increment job
# derives its default start_turn from THIS constant so the synthetic
# increment can never overlap the base's conversation ids (the two
# literals drifting apart would duplicate conversations across
# batches)
DEFAULT_N_TURNS = 100_000


def synth_transcripts(spark: SparkSession, sf: float = 0.01,
                      n_turns: int | None = None,
                      partitions: int | None = None,
                      start_turn: int = 0) -> DataFrame:
    """Build the deterministic transcripts table at the given scale.

    ``start_turn`` shifts the row-id range: every cell is a function
    of the row id, so ``start_turn=N`` yields the deterministic
    continuation of the corpus after turn N — the increment source
    for the incremental-linking job (round up to a TURNS_PER_CONV
    multiple so conversation ids never span batches)."""
    if n_turns is None:
        n_turns = max(64, int(TURNS_PER_SF * sf))
    df = spark.range(start_turn, start_turn + n_turns, 1,
                     partitions or 32)

    golden = F.array(*[F.lit(s) for s in GOLDEN_SENTENCES])
    filler = F.array(*[F.lit(s) for s in FILLERS])
    n_g, n_f = len(GOLDEN_SENTENCES), len(FILLERS)

    rid = F.col('id')
    conv = (rid / TURNS_PER_CONV).cast('long')
    turn = (rid % TURNS_PER_CONV).cast('int')

    # every third turn carries a golden sentence wrapped in filler;
    # all selectors are modular functions of the row id (no RNG)
    golden_idx = (rid % n_g + 1).cast('int')
    filler_idx = (rid % n_f + 1).cast('int')
    filler2_idx = ((rid * 7 + 3) % n_f + 1).cast('int')

    is_golden = (rid % 3) == F.lit(0)
    text = F.when(
        is_golden,
        F.concat(F.element_at(filler, filler_idx), F.lit('. '),
                 F.element_at(golden, golden_idx), F.lit('. '),
                 F.element_at(filler, filler2_idx)),
    ).otherwise(
        F.concat(F.element_at(filler, filler_idx), F.lit(', '),
                 F.element_at(filler, filler2_idx)))

    role_idx = (turn % 3 + 1).cast('int')
    roles = F.array(*[F.lit(r) for r in ROLES])
    tools = F.array(*[F.lit(t) for t in TOOLS])
    tool = F.when(F.element_at(roles, role_idx) == 'tool',
                  F.element_at(tools, (rid % 3 + 1).cast('int')))

    ts = F.timestamp_seconds(F.lit(1_700_000_000) + conv * 3600 + turn * 60)

    return df.select(
        F.format_string('c%012d', conv).alias('conv_id'),
        turn.alias('turn_idx'),
        F.element_at(roles, role_idx).alias('role'),
        text.alias('text'),
        tool.alias('tool'),
        ts.alias('ts'),
    )


STREAM_BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z


def golden_stream_rows() -> list:
    """Golden sentences as streaming-source JSON rows with
    deterministic per-index event times — the ONE definition shared by
    the streaming query and its oracle (so a timestamp-formula drift
    between them is impossible)."""
    return [
        {'conv_id': 'g%06d' % i, 'turn_idx': 0, 'role': 'user',
         'text': s, 'tool': None,
         'ts': '2026-01-01T00:%02d:00.000Z' % (i % 20),
         'epoch': STREAM_BASE_EPOCH + (i % 20) * 60}
        for i, s in enumerate(GOLDEN_SENTENCES)]


def write_stream_fixture(src_dir: str) -> str:
    """Materialize ``golden_stream_rows`` as a one-file JSON-lines
    streaming source directory; returns the file path."""
    import json
    import os
    os.makedirs(src_dir, exist_ok=True)
    path = os.path.join(src_dir, 'batch0.json')
    with open(path, 'w', encoding='utf-8') as fh:
        for row in golden_stream_rows():
            rec = {k: v for k, v in row.items() if k != 'epoch'}
            fh.write(json.dumps(rec, ensure_ascii=False) + '\n')
    return path


def golden_only_transcripts(spark: SparkSession) -> DataFrame:
    """One turn per golden sentence, unwrapped — the P/R fixture table
    (conv g000..; expected extractions in tests/goldens.py)."""
    rows = [('g%06d' % i, 0, 'user', s, None)
            for i, s in enumerate(GOLDEN_SENTENCES)]
    df = spark.createDataFrame(
        rows, 'conv_id string, turn_idx int, role string, text string, '
              'tool string')
    return df.withColumn(
        'ts', F.timestamp_seconds(F.lit(1_700_000_000)))
