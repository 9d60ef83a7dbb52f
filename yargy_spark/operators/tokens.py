"""Token-table operators: tokenize once, reuse across consumers.

The reference's pre-tokenized source pattern (IdTokenizer,
docs/cookbook.ipynb cells 14-16) lifted to the corpus level: an
exploded token table materialized once, with morphology attached by a
**broadcast hash join against the lexicon dimension table** — the
"A-alternative" of SURVEY.md §2.2/§2.3 (JVM-side join instead of the
in-UDF dict lookup).  Useful when many downstream consumers (n-gram
stats, search indexing, extraction audits) want tokens without
re-running the tokenizer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType,
                               StringType, StructField, StructType)

TOKEN_SCHEMA = StructType([
    StructField('conv_id', StringType()),
    StructField('turn_idx', IntegerType()),
    StructField('tok_idx', IntegerType()),
    StructField('value', StringType()),
    StructField('start', IntegerType()),
    StructField('stop', IntegerType()),
    StructField('type', StringType()),
])


def token_table(transcripts: DataFrame) -> DataFrame:
    """Exploded token rows, regex tokenizer only (no morphology —
    that's a join, below)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.tokenize import TokenSpec
        spec = TokenSpec()
        cols = [f.name for f in TOKEN_SCHEMA.fields]
        for pdf in batches:
            out = []
            for conv_id, turn_idx, text in zip(
                    pdf['conv_id'].values, pdf['turn_idx'].values,
                    pdf['text'].values):
                # null turn_idx arrives as NaN (nullable int ->
                # float64 in pandas); int(nan) would raise and kill
                # the task — skip the malformed row like null text
                if not text or pd.isna(turn_idx):
                    continue
                for i, tok in enumerate(spec(text)):
                    out.append((conv_id, int(turn_idx), i, tok.value,
                                tok.start, tok.stop, tok.type))
            yield pd.DataFrame(out, columns=cols) if out else \
                pd.DataFrame({c: [] for c in cols})

    return (transcripts.select('conv_id', 'turn_idx', 'text')
            .mapInPandas(fn, TOKEN_SCHEMA))


def lexicon_table(spark: SparkSession) -> DataFrame:
    """The full merged lexicon (embedded golden + generated
    dictionary) as a dimension table (word, form_idx, lemma, grams) —
    FIXTURES.md §3 layout; the SQL-side twin of
    ``default_morphology()`` so the broadcast-join path and the
    in-UDF analyzer can never diverge on vocabulary."""
    from ..kernel.morphology import default_morphology
    morph = default_morphology()
    rows = [(word, i, lemma, sorted(grams))
            for word, readings in sorted(morph.entries.items())
            for i, (lemma, grams) in enumerate(readings)]
    return spark.createDataFrame(
        rows,
        StructType([
            StructField('word', StringType()),
            StructField('form_idx', IntegerType()),
            StructField('lemma', StringType()),
            StructField('grams', ArrayType(StringType())),
        ]))


def annotate_lemmas(tokens: DataFrame,
                    lexicon: DataFrame) -> DataFrame:
    """Attach the lemma set per token via a broadcast hash join on
    the lowercased surface.

    Contract: matches the in-UDF analyzer for every DICTIONARY word
    (lexicon_table serves the same merged dictionary the analyzer
    loads).  Out-of-vocabulary words fall back to their lowercased
    surface — the kernel's suffix PREDICTOR is not expressible as a
    dimension join, so OOV lemmas differ between the two paths by
    design; pipelines needing predicted OOV lemmas use the kernel
    (extract_mentions / lemma_text)."""
    lemma_sets = (lexicon
                  .select(F.lower('word').alias('word'), 'lemma')
                  .groupBy('word')
                  .agg(F.array_sort(F.collect_set('lemma'))
                       .alias('lemmas')))
    low = F.lower(F.col('value'))
    joined = tokens.withColumn('word', low).join(
        F.broadcast(lemma_sets), 'word', 'left')
    return (joined
            .withColumn('lemmas',
                        F.coalesce(F.col('lemmas'), F.array(low)))
            .drop('word'))
