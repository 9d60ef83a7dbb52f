"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full KG pipeline (extract -> link ->
triples) over the deterministic transcript corpus, plus document
near-dup edges from the sf0.001 documents table, as one triples frame.

``queries()`` / ``oracle_sql()`` — one entry per operator family:
  * kg_* — extraction/linking/triples over the golden transcript
    corpus; oracles are VALUES literals transcribed from the
    reference's committed test assertions (the only executable oracle
    for yargy semantics in this sandbox — see FIXTURES.md).
  * dedup/similarity/textstats/multimodal — training-data ops over the
    provided documents/embeddings tables; oracles replay the exact
    same algorithm in DuckDB SQL (portable md5-based hashing,
    integer-scaled ratios).
  * relational corpus ops (agg/join/window) over the TPC-H-ish tables.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ------------------------------------------------------------------ helpers


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, 'documents.parquet'))


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, 'embeddings.parquet'))


def _golden_mentions(spark):
    from yargy_spark.operators.extract import extract_mentions
    from yargy_spark.sources.transcripts import golden_only_transcripts
    return extract_mentions(golden_only_transcripts(spark))


# ------------------------------------------------------------------ entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples from transcripts + near-dup edges from the
    sf0.001 documents table, one unified (subj, pred, obj) frame."""
    from yargy_spark.pipeline import run_pipeline
    from yargy_spark.operators.dedup import minhash_lsh_pairs
    from yargy_spark.sources.transcripts import synth_transcripts

    transcripts = synth_transcripts(spark, n_turns=512, partitions=8)
    kg = run_pipeline(transcripts)['triples'] \
        .select('subj', 'pred', 'obj')

    docs = _docs(spark, '/root/testdata/sf0.001')
    dup_edges = minhash_lsh_pairs(docs).select(
        F.format_string('doc_%d', F.col('a')).alias('subj'),
        F.lit('near_duplicate_of').alias('pred'),
        F.format_string('doc_%d', F.col('b')).alias('obj'))
    return kg.unionByName(dup_edges)


# ------------------------------------------------------------------ queries


def q_kg_facts_golden(spark, sf_dir) -> DataFrame:
    return _golden_mentions(spark).select('conv_id', 'rule_id',
                                          'fact_json')


def q_kg_triples_date(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.triples import materialize_triples
    m = _golden_mentions(spark)
    t = materialize_triples(m.where(F.col('rule_id') == 'date'))
    return t.select('conv_id', 'pred', 'obj')


def q_kg_entities(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.linking import link_entities
    m = _golden_mentions(spark)
    e = link_entities(m)
    return (m.join(e, 'mention_id')
            .groupBy('canonical')
            .agg(F.count('*').alias('n_mentions')))


def q_kg_incremental(spark, sf_dir) -> DataFrame:
    """Incremental linking (linking.py::link_entities_incremental):
    even-parity golden conversations are the batch-linked PRIOR
    corpus, odd-parity conversations arrive as the increment and link
    against the compact entity-key state without global CC.  One row
    per entity over the increment: canonical, mention count, and
    whether the entity was adopted from the prior state (1) or
    freshly minted (0) — deterministic because adoption is an
    equi-join against the key state plus the same deterministic
    CC/canonicalization the batch path runs over the increment."""
    from yargy_spark.operators.extract import extract_mentions
    from yargy_spark.operators.linking import (
        entity_key_table, link_entities, link_entities_incremental)
    from yargy_spark.sources.transcripts import golden_only_transcripts
    t = golden_only_transcripts(spark)
    parity = (F.substring('conv_id', 2, 6).cast('int') % 2)
    prior_m = extract_mentions(t.where(parity == 0))
    prior_links = link_entities(prior_m)
    keys = entity_key_table(prior_m, prior_links)
    new_m = extract_mentions(t.where(parity == 1))
    links, _merges = link_entities_incremental(new_m, keys)
    prior_ids = (keys.select('entity_id').distinct()
                 .withColumn('flag', F.lit(1)))
    return (links
            .join(prior_ids, 'entity_id', 'left')
            .groupBy('canonical')
            .agg(F.count('*').alias('n_mentions'),
                 F.max(F.coalesce('flag', F.lit(0)))
                 .cast('int').alias('adopted')))


def q_kg_merge_candidates(spark, sf_dir) -> DataFrame:
    """Merge-candidate work-list
    (linking.py::link_entities_incremental): prior entities bridged
    by one increment component surface as candidates — and are NOT
    merged in the links output.  The fixture frames are inline
    because the golden corpus's parity split never bridges prior
    entities; the driver hash pins the operator's full output
    contract (pair orientation, witness conversation and lemma)."""
    from yargy_spark.operators.linking import link_entities_incremental
    prior_keys = spark.createDataFrame(
        [('анна|петров', 'ent_100', 'анна|петров'),
         ('борис|петров', 'ent_200', 'борис|петров'),
         ('иван|ульянов', 'ent_300', 'иван|ульянов'),
         ('пётр|ульянов', 'ent_400', 'пётр|ульянов')],
        'norm_key string, entity_id string, canonical string')
    new_mentions = spark.createDataFrame(
        [(1, 'cX', 'анна|петров'),    # direct -> ent_100
         (2, 'cX', 'вера|петров'),    # coref: joins the cX component
         (3, 'cX', 'борис|петров'),   # direct -> ent_200 (bridge!)
         (4, 'cY', 'иван|ульянов'),   # direct -> ent_300
         (5, 'cY', 'пётр|ульянов'),   # direct -> ent_400 (bridge!)
         (6, 'cZ', 'глеб|сидоров')],  # fresh, no candidates
        'mention_id long, conv_id string, norm_key string')
    _links, merges = link_entities_incremental(new_mentions,
                                               prior_keys)
    return merges


# apply_entity_merges fixtures (inline like kg_merge_candidates: the
# golden corpus's parity split never bridges prior entities).  The
# chain (100-200, 200-300) must collapse to ONE survivor; the
# (1000, 999) pair pins NUMERIC-min survivor election (string min
# would pick ent_1000); duplicate pairs from different increments
# must be harmless.
MERGE_APPLY_KEYS = [
    ('анна|петров', 'ent_100', 'анна|петров'),
    ('аня|петров', 'ent_200', 'аня|петров'),
    ('анюта|петров', 'ent_300', 'анюта|петров'),
    ('иван|ульянов', 'ent_999', 'иван|ульянов'),
    ('ваня|ульянов', 'ent_1000', 'ваня|ульянов'),
    ('глеб|сидоров', 'ent_600', 'глеб|сидоров'),
]
MERGE_APPLY_CANDS = [
    ('ent_100', 'ent_200', 'c1', 'петров'),
    ('ent_200', 'ent_300', 'c2', 'петров'),
    ('ent_100', 'ent_200', 'c9', 'петров'),
    ('ent_1000', 'ent_999', 'c3', 'ульянов'),
]


def q_kg_merge_apply(spark, sf_dir) -> DataFrame:
    """Merge application (linking.py::apply_entity_merges): CC over
    the candidate graph, numeric-min survivor, key state rewritten.
    Output joins each norm_key's prior entity to its post-merge
    entity; the oracle recomputes the transitive closure with a
    recursive CTE (independent CC implementation, not pinned
    literals)."""
    from yargy_spark.operators.linking import apply_entity_merges
    keys = spark.createDataFrame(
        MERGE_APPLY_KEYS,
        'norm_key string, entity_id string, canonical string')
    cands = spark.createDataFrame(
        MERGE_APPLY_CANDS,
        'entity_a string, entity_b string, conv_id string, '
        'last_lemma string')
    _mapping, new_keys = apply_entity_merges(cands, keys)
    orig = spark.createDataFrame(
        [(k, e) for k, e, _ in MERGE_APPLY_KEYS],
        'norm_key string, prior_entity string')
    return (new_keys.join(orig, 'norm_key')
            .select('norm_key', 'prior_entity', 'entity_id',
                    'canonical'))


def q_kg_person_triples(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.linking import link_entities
    from yargy_spark.operators.triples import materialize_triples
    m = _golden_mentions(spark)
    e = link_entities(m)
    t = materialize_triples(m, e)
    canon = (t.where(F.col('pred') == 'canonical_name')
             .select(F.col('subj'), F.col('obj').alias('canonical'))
             .distinct())
    return (t.where(F.col('rule_id') == 'person')
            .where(~F.col('pred').isin('canonical_name', 'mentioned_as'))
            .join(canon, 'subj')
            .select('canonical', 'pred', 'obj'))


_TOKEN_CONVS = ('g000000', 'g000003', 'g000007', 'g000009')

# rule_id -> fact_type (extractor bank, yargy_spark/extractors.py)
_FACT_TYPES = {'person': 'Person', 'person_norm': 'Person',
               'name': 'Name', 'date': 'Date', 'money': 'Money',
               'geo': 'Geo', 'era': 'Era'}


def q_kg_money_triples(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.triples import materialize_triples
    m = _golden_mentions(spark)
    t = materialize_triples(m.where(F.col('rule_id').isin('money',
                                                          'era')))
    return t.select('conv_id', 'rule_id', 'pred', 'obj')


def q_kg_geo_triples(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.triples import materialize_triples
    m = _golden_mentions(spark)
    t = materialize_triples(m.where(F.col('rule_id') == 'geo'))
    return t.select('conv_id', 'pred', 'obj')


def q_kg_fact_spans(spark, sf_dir) -> DataFrame:
    """Span sink (Fact.spans): char offsets of filled attributes."""
    m = _golden_mentions(spark).where(
        F.col('conv_id').isin(*_TOKEN_CONVS))
    return (m.select('conv_id', 'rule_id',
                     F.explode('fact_spans').alias('sp'))
            .select('conv_id', 'rule_id',
                    F.col('sp.start').alias('start'),
                    F.col('sp.stop').alias('stop')))


# Sentences whose name words are OUTSIDE the embedded golden lexicon
# (several outside the generated dictionary too): coverage comes from
# the suffix-based OOV predictor (kernel/predictor.py) + the generated
# multi-thousand-lemma dictionary (tools/gen_lexicon.py) — the
# pymorphy2 production behavior the reference relies on
# (morph.py:118-130).
_OOV_TURNS = (
    ('v000000', 0, 'вчера приехала Эльвира Зубкова'),
    ('v000001', 0, 'письмо от Аделаиды Брусникиной'),
    ('v000002', 0, 'договор подписан Трофимом Зюзиным'),
    ('v000003', 0, 'встреча с Максимом Кочергиным'),
    ('v000004', 0, 'отчет для Эльвиры Зубковой'),
)


def q_kg_oov_person(spark, sf_dir) -> DataFrame:
    """Name extraction over OOV vocabulary: every (first, last) pair
    normalizes to nominative lemmas even though the surface forms are
    oblique and absent from the shipped lexicons."""
    from yargy_spark.operators.extract import extract_mentions
    t = spark.createDataFrame(
        list(_OOV_TURNS), 'conv_id string, turn_idx int, text string')
    m = extract_mentions(t, extractor_names=['name'])
    return m.select('conv_id', 'rule_id', 'fact_json')


_ADDRESS_TURNS = (
    ('a000000', 0, 'живу на улице Ленина дом 5'),
    ('a000001', 0, 'офис на Первомайской улице'),
    ('a000002', 0, 'магазин на проспекте Мира д. 12'),
    ('a000003', 0, 'свернул в Глухой переулок 3'),
)


def q_kg_address(spark, sf_dir) -> DataFrame:
    """Address — the fourth canonical fact type (north_star:
    Person/Name, Date, Money, Address).  Runs in its OWN bank so the
    default-bank golden oracles stay byte-stable."""
    from yargy_spark.extractors import Extractor, CompiledBank, \
        build_address
    from yargy_spark.operators.extract import extract_mentions
    bank = CompiledBank(extractors={
        'address': Extractor('address', 'Address', build_address,
                             trigger=r'[а-яёА-ЯЁ]')})
    t = spark.createDataFrame(
        list(_ADDRESS_TURNS),
        'conv_id string, turn_idx int, text string')
    m = extract_mentions(t, bank=bank)
    return m.select('conv_id', 'rule_id', 'fact_json')


def q_kg_lemma_tokens(spark, sf_dir) -> DataFrame:
    """Morphology as a broadcast-joined dimension table (the
    'A-alternative' of SURVEY.md §2.2/§2.3)."""
    from yargy_spark.operators.tokens import (annotate_lemmas,
                                              lexicon_table,
                                              token_table)
    from yargy_spark.sources.transcripts import golden_only_transcripts
    t = golden_only_transcripts(spark).where(
        F.col('conv_id').isin(*_TOKEN_CONVS))
    toks = token_table(t)
    return (annotate_lemmas(toks, lexicon_table(spark))
            .select('conv_id', 'tok_idx', 'value',
                    F.array_join('lemmas', ',').alias('lemmas')))


def _asof_query(spark, sf_dir, ts_bucket_width=None) -> DataFrame:
    """Shared body of the two as-of variants — they share ONE DuckDB
    oracle and must stay row-identical, so the clicks/errors prep
    exists exactly once and only the mitigation knob differs."""
    from pyspark.sql import Window
    from yargy_spark.operators.events import asof_join
    ev = spark.read.parquet(os.path.join(sf_dir, 'events.parquet'))
    clicks = (ev.where(F.col('event_type') == 'click')
              .select('event_id', 'user_id', 'ts'))
    w = Window.partitionBy('user_id', 'ts').orderBy(F.desc('event_id'))
    errors = (ev.where(F.col('event_type') == 'error')
              .withColumn('rn', F.row_number().over(w))
              .where(F.col('rn') == 1)
              .select('user_id', 'ts', 'event_id'))
    out = asof_join(clicks, errors, on='user_id',
                    right_cols=('event_id',),
                    ts_bucket_width=ts_bucket_width)
    return out.select('event_id', 'user_id',
                      F.col('r_event_id').alias('last_error_id'))


def q_kg_entity_degree(spark, sf_dir) -> DataFrame:
    """Graph analytics over the materialized entity graph
    (linking.py::entity_degree): neighbor count + total co-mention
    weight per canonical entity, derived from the same edges
    kg_entity_cooccurrence gates."""
    from yargy_spark.operators.linking import entity_degree
    return entity_degree(q_kg_entity_cooccurrence(spark, sf_dir))


def q_events_asof(spark, sf_dir) -> DataFrame:
    """As-of join: each click annotated with the user's most recent
    error at-or-before it (union-and-carry composition, one shuffle)."""
    return _asof_query(spark, sf_dir)


def q_events_asof_bucketed(spark, sf_dir) -> DataFrame:
    """Same as-of join through the hot-key mitigation path: the carry
    window partitions by (user_id, 6h time bucket) with per-bucket
    seeds, so one hot user parallelizes across its time range.  Must
    be row-identical to events_asof (same DuckDB ASOF oracle)."""
    return _asof_query(spark, sf_dir, ts_bucket_width=6 * 3600.0)


def q_kg_entity_cooccurrence(spark, sf_dir) -> DataFrame:
    """Entity-graph materialization: canonical entity pairs
    co-mentioned in the same group (golden convs folded into 4 groups
    so pairs exist at this corpus size)."""
    from yargy_spark.operators.linking import (entity_cooccurrence,
                                               link_entities)
    m = _golden_mentions(spark).withColumn(
        'grp', F.pmod(F.substring('conv_id', 2, 6).cast('int'),
                      F.lit(4)))
    e = link_entities(m)
    return entity_cooccurrence(m, e, group_col='grp')


def q_transcripts_tool_stats(spark, sf_dir) -> DataFrame:
    """Input-schema rollup over the deterministic transcript source
    (role/tool/conv columns); the oracle replays the id-derived
    generator expressions in SQL."""
    from yargy_spark.sources.transcripts import synth_transcripts
    t = synth_transcripts(spark, n_turns=1024, partitions=8)
    return (t.groupBy('role', 'tool')
            .agg(F.count('*').alias('n_turns'),
                 F.countDistinct('conv_id').alias('n_convs')))


def q_context_windows(spark, sf_dir) -> DataFrame:
    """Rolling k-turn context assembly (packing.context_windows —
    the SFT chat-data input layout) over the deterministic generator
    corpus; the oracle replays the id-derived text generator AND the
    window frame in SQL."""
    from yargy_spark.operators.packing import context_windows
    from yargy_spark.sources.transcripts import synth_transcripts
    t = synth_transcripts(spark, n_turns=1024, partitions=8)
    return context_windows(t, k=3)


def q_stream_mention_rollup(spark, sf_dir) -> DataFrame:
    """Structured Streaming: file source -> extraction kernel ->
    watermarked event-time rollup, drained with availableNow."""
    import tempfile
    from yargy_spark.sources.transcripts import write_stream_fixture
    from yargy_spark.streaming.ingest import (stream_transcripts,
                                              windowed_mention_counts)
    base = tempfile.mkdtemp(prefix='ys_stream_q_')
    src = os.path.join(base, 'src')
    # corpus + timestamps come from the ONE shared fixture definition
    # (sources/transcripts.golden_stream_rows) — the oracle reads the
    # same rows, so query and oracle cannot drift
    write_stream_fixture(src)
    agg = windowed_mention_counts(stream_transcripts(spark, src),
                                  watermark='30 minutes',
                                  window='10 minutes')
    name = 'rollup_' + os.path.basename(base)[-8:]
    q = (agg.writeStream.format('memory').queryName(name)
         .outputMode('complete').trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col('window.start').cast('long')
                    .alias('win_start'), 'fact_type', 'n_mentions'))


def q_stream_dedup(spark, sf_dir) -> DataFrame:
    """Structured Streaming first-copy-wins dedup
    (streaming/dedup.py): documents replayed as a file stream with
    deterministic synthetic event times, drained with availableNow.
    The emitted KEY SET is arrival-order-independent, so the query
    projects the portable text hash — fully value-hash gated against
    a batch DISTINCT oracle."""
    from yargy_spark.streaming.dedup import stream_exact_dedup
    stream, tag = _stream_docs(spark, sf_dir, 'ys_sdedup_q_')
    deduped = stream_exact_dedup(stream, watermark='30 minutes')
    name = 'sdedup_' + tag
    q = (deduped.writeStream.format('memory').queryName(name)
         .outputMode('append').trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select('text_hash')


# synthetic event-time scheme shared by BOTH streaming document
# queries AND the stream_band_collisions oracle — one definition
# (review finding: three verbatim copies would let the oracle gate
# the wrong windows after a scheme change).  The epoch is 5-minute
# aligned so window floors agree across engines.
STREAM_EPOCH = 1767225600
STREAM_TS_MOD = 600

# dedup_incremental gate: batch doc_ids are shifted above the state
# half's (dedup_increment's ids-time-order-after-state contract);
# comfortably above any test-SF corpus, well inside int64
DEDUP_INC_OFFSET = 1_000_000_000


def _stream_docs(spark, sf_dir, prefix):
    """documents replayed as a JSON file stream with deterministic
    synthetic event times ts = STREAM_EPOCH + doc_id % STREAM_TS_MOD."""
    import tempfile
    base = tempfile.mkdtemp(prefix=prefix)
    src = os.path.join(base, 'src')
    (_docs(spark, sf_dir)
     .select('doc_id', 'text',
             F.timestamp_seconds(F.lit(STREAM_EPOCH)
                                 + F.col('doc_id') % STREAM_TS_MOD)
             .alias('ts'))
     .coalesce(4).write.mode('overwrite').json(src))
    stream = (spark.readStream
              .schema('doc_id long, text string, ts timestamp')
              .json(src))
    return stream, os.path.basename(base)[-8:]


def q_stream_band_collisions(spark, sf_dir) -> DataFrame:
    """Streaming NEAR-dup detection (streaming/dedup.py
    stream_band_collisions): per event-time window, MinHash band
    buckets with >= 2 documents — the LSH candidate signal as a
    stream.  Signatures compute IN-ROW (map-only), the only stateful
    op is the watermarked windowed count.  Drained with
    availableNow + complete mode so every window is observable in
    one shot (production runs append and emits on watermark
    closure); results are batch-replayable, so the oracle recomputes
    the same windows/bands in DuckDB."""
    from yargy_spark.streaming.dedup import stream_band_collisions
    stream, tag = _stream_docs(spark, sf_dir, 'ys_sband_q_')
    coll = stream_band_collisions(stream, watermark='30 minutes',
                                  window='5 minutes')
    name = 'sband_' + tag
    q = (coll.writeStream.format('memory').queryName(name)
         .outputMode('complete').trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def q_kg_token_table(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.tokens import token_table
    from yargy_spark.sources.transcripts import golden_only_transcripts
    t = golden_only_transcripts(spark).where(
        F.col('conv_id').isin(*_TOKEN_CONVS))
    return token_table(t)


def q_exact_dedup(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.dedup import exact_dedup
    return exact_dedup(_docs(spark, sf_dir))


def q_ngram_jaccard_dups(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(_docs(spark, sf_dir))


def q_minhash_lsh_dups(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(spark, sf_dir))


def q_dedup_incremental(spark, sf_dir) -> DataFrame:
    """Incremental near-dup dedup: the even-doc_id half of the corpus
    is the committed state (minhash_state), the odd half arrives as a
    new batch (dedup_increment) with its ids OFFSET above the state's
    max — the operator's documented caller contract (batch ids are
    disjoint and time-order AFTER the state's, exactly how
    jobs/run_dedup_increment.py feeds it; a round-4 gate fed
    interleaved ids, normalizing a contract-violating call shape).
    vs_state=1 rows pair state docs with batch docs (verified on the
    state's STORED shingle arrays — prior text never rescanned);
    vs_state=0 rows are the batch-internal minhash_lsh_pairs
    semantics."""
    from yargy_spark.operators.dedup import (dedup_increment,
                                             minhash_state)
    docs = _docs(spark, sf_dir)
    state = minhash_state(docs.where(F.col('doc_id') % 2 == 0))
    batch = (docs.where(F.col('doc_id') % 2 == 1)
             .withColumn('doc_id',
                         F.col('doc_id') + F.lit(DEDUP_INC_OFFSET)))
    pairs, _new_state = dedup_increment(batch, state)
    return pairs


def q_dedup_report(spark, sf_dir) -> DataFrame:
    """Corpus dedup OBSERVABILITY: one (metric, value) row per dedup
    family — what an operator reads before choosing a cleanup plan.
    Exercises that the four families compose in one job: exact groups
    (count + surplus copies), LSH near-dup pairs, duplicated
    paragraph occurrences, duplicated span grams."""
    from yargy_spark.operators.dedup import (dup_span_scores,
                                             exact_dedup,
                                             lsh_hot_buckets,
                                             minhash_lsh_pairs,
                                             paragraph_dedup)
    docs = _docs(spark, sf_dir)

    def one(name, df):
        return df.select(F.lit(name).alias('metric'),
                         F.coalesce(F.col(df.columns[0]), F.lit(0))
                         .cast('long').alias('value'))

    groups = exact_dedup(docs).where(F.col('group_size') > 1)
    rows = [
        one('exact_dup_groups', groups.agg(F.count('*'))),
        one('exact_surplus_docs',
            groups.agg(F.sum(F.col('group_size') - 1))),
        one('lsh_dup_pairs', minhash_lsh_pairs(docs).agg(F.count('*'))),
        # the hot-bucket governor's loud counter: band buckets that
        # degraded to star edges this run (0 on a healthy corpus)
        one('lsh_hot_buckets', lsh_hot_buckets(docs).agg(F.count('*'))),
        one('dup_paragraph_occurrences',
            paragraph_dedup(docs).agg(F.sum('n_dropped'))),
        one('dup_span_grams',
            dup_span_scores(docs).agg(F.sum('n_dup_grams'))),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def q_dup_clusters(spark, sf_dir) -> DataFrame:
    """Near-duplicate clusters: MinHash/LSH pairs fed into the SAME
    alternating large/small-star connected-components operator the
    KG entity linker uses (operators/linking.py) — cluster_id = min
    doc_id of the component.  Gated against a DuckDB RECURSIVE-CTE
    transitive closure of the identical pair set, putting the CC
    kernel itself under the value-hash gate."""
    from yargy_spark.operators.dedup import minhash_lsh_pairs
    from yargy_spark.operators.linking import connected_components
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir))
    cc = connected_components(
        pairs.select(F.col('a').alias('src'), F.col('b').alias('dst')))
    return cc.select(F.col('node').alias('doc_id'),
                     F.col('component').alias('cluster_id'))


def q_clean_corpus(spark, sf_dir) -> DataFrame:
    """End-to-end corpus cleanup composition: quality gate -> exact
    dedup -> MinHash/LSH near-dup pruning, one declarative plan."""
    from yargy_spark.operators.dedup import clean_corpus
    return clean_corpus(_docs(spark, sf_dir),
                        meta_cols=('lang', 'source'))


def q_simhash_docs(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.dedup import simhash_docs
    return simhash_docs(_docs(spark, sf_dir))


def q_simhash_dup_pairs(spark, sf_dir) -> DataFrame:
    """Banded SimHash near-dup pairs (pigeonhole full recall at
    hamming <= 2 with 4 bands)."""
    from yargy_spark.operators.dedup import simhash_dup_pairs
    return simhash_dup_pairs(_docs(spark, sf_dir), max_hamming=2)


def q_embedding_dup_pairs(spark, sf_dir) -> DataFrame:
    """IVF-blocked default (no cross join in the plan).
    n_centroids pinned to 16 so the DuckDB oracle replays the exact
    same codebook; the operator default is corpus-adaptive."""
    from yargy_spark.operators.dedup import embedding_dup_pairs
    return embedding_dup_pairs(_emb(spark, sf_dir),
                               threshold_x10000=4000, n_centroids=16)


def q_embedding_dup_exact(spark, sf_dir) -> DataFrame:
    """Quadratic all-pairs baseline kept as the recall oracle."""
    from yargy_spark.operators.dedup import embedding_dup_pairs_exact
    return embedding_dup_pairs_exact(_emb(spark, sf_dir),
                                     threshold_x10000=4000)


def q_ann_cosine_topk(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.similarity import cosine_topk
    return cosine_topk(_emb(spark, sf_dir))


def q_ann_ivf_topk(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.similarity import ivf_topk
    return ivf_topk(_emb(spark, sf_dir))


def q_ann_query_topk(spark, sf_dir) -> DataFrame:
    """Cross-table retrieval: the first 10 odd vec_ids as the query
    batch against the even half as the corpus — queries broadcast,
    corpus never shuffles (similarity.query_topk)."""
    from yargy_spark.operators.similarity import query_topk
    emb = _emb(spark, sf_dir)
    return query_topk(
        emb.where((F.col('vec_id') % 2 == 1) & (F.col('vec_id') < 20)),
        emb.where(F.col('vec_id') % 2 == 0))


def q_kg_extract_report(spark, sf_dir) -> DataFrame:
    """CappedParser observability at corpus level (extract_audit):
    the golden corpus plus one pathological 'a 'x40 turn (the
    cookbook cells 5-7 ambiguous grammar at cap=50 — combinatorial
    parse count, budget trips mid-chart) plus one never-triggered
    turn.  The report proves the poison turn's abort FIRES and is
    COUNTED per-turn (not silently swallowed), kernel errors stay
    zero, and trigger coverage is visible — the extraction analog of
    dedup_report."""
    from yargy_spark import or_, rule
    from yargy_spark.extractors import (EXTRACTORS, CompiledBank,
                                        Extractor)
    from yargy_spark.operators.extract import extract_audit
    from yargy_spark.sources.transcripts import golden_only_transcripts

    def _amb():
        return or_(rule('a'), rule('a', 'a')).repeatable().named('AMB')

    pool = dict(EXTRACTORS)
    pool['amb'] = Extractor('amb', 'Amb', _amb, trigger='a', cap=50)
    bank = CompiledBank(names=list(pool), extractors=pool)

    extra = spark.createDataFrame(
        [('poison0', 0, 'user', 'a ' * 40, None),   # trips the budget
         ('quiet0', 0, 'user', 'zz zz zz', None)],  # never triggers
        'conv_id string, turn_idx int, role string, text string, '
        'tool string').withColumn(
            'ts', F.timestamp_seconds(F.lit(1_700_000_000)))
    audit = extract_audit(
        golden_only_transcripts(spark).unionByName(extra), bank=bank)
    agg = audit.agg(
        F.count('*').cast('long').alias('turns_total'),
        F.sum('triggered').cast('long').alias('turns_triggered'),
        F.sum((F.col('n_budget_aborts') > 0).cast('int'))
        .cast('long').alias('turns_budget_aborted'),
        F.sum('n_budget_aborts').cast('long').alias('budget_aborts'),
        F.sum('n_mentions').cast('long').alias('mentions'),
        F.sum('n_errors').cast('long').alias('kernel_errors'))
    return agg.selectExpr(
        "stack(6, 'turns_total', turns_total, "
        "'turns_triggered', turns_triggered, "
        "'turns_budget_aborted', turns_budget_aborted, "
        "'budget_aborts', budget_aborts, "
        "'mentions', mentions, "
        "'kernel_errors', kernel_errors) AS (metric, value)")


def q_ann_query_ivf_topk(spark, sf_dir) -> DataFrame:
    """Probe-filtered cross-table retrieval — the 10^9-vector scale
    path for q_ann_query_topk: the corpus (even half) is k-means
    assigned once, the query batch (first 10 odd vec_ids) probes its
    4 nearest cells, and the corpus stream carries a literal
    probe-cell IN-filter BEFORE the broadcast join (plan-guarded in
    test_scale_guards).  n_centroids pinned to 16 so the DuckDB
    oracle replays the exact codebook."""
    from yargy_spark.operators.similarity import query_topk
    emb = _emb(spark, sf_dir)
    return query_topk(
        emb.where((F.col('vec_id') % 2 == 1) & (F.col('vec_id') < 20)),
        emb.where(F.col('vec_id') % 2 == 0),
        ivf=(16, 4))


def q_ann_query_indexed(spark, sf_dir) -> DataFrame:
    """Retrieval against a MATERIALIZED IVF index (build once, query
    many — similarity.write_ivf_index + query_topk_indexed): the
    cells parquet is hive-partitioned by centroid_id so the query
    batch's probe-cell filter prunes whole partitions at the scan
    (PartitionFilters, plan-guarded in test_scale_guards).  Same
    deterministic codebook and therefore the same rows as the inline
    ``ivf=(16, 4)`` path, so the oracle is shared with
    ann_query_ivf_topk.  The index root is a deterministic
    per-sf_dir temp path; write_ivf_index overwrites, so rebuilds
    are idempotent."""
    import hashlib
    import os
    import tempfile
    from yargy_spark.operators.similarity import (query_topk_indexed,
                                                  write_ivf_index)
    emb = _emb(spark, sf_dir)
    tag = hashlib.sha1(
        os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(),
                        'yargy_spark_ivf_gate_' + tag)
    write_ivf_index(emb.where(F.col('vec_id') % 2 == 0), root,
                    n_centroids=16)
    return query_topk_indexed(
        emb.where((F.col('vec_id') % 2 == 1) & (F.col('vec_id') < 20)),
        root, k=5, n_probe=4)


def q_dup_spans(spark, sf_dir) -> DataFrame:
    """Span-level duplication (exact-substring-dedup proxy): corpus
    frequency of positional 8-gram occurrences (dedup.dup_span_scores)."""
    from yargy_spark.operators.dedup import dup_span_scores
    return dup_span_scores(_docs(spark, sf_dir))


def q_rare_tokens(spark, sf_dir) -> DataFrame:
    """Corpus-relative rare-token ratio (textstats.rare_token_scores)
    — the integer-safe stand-in for an LM perplexity quality filter."""
    from yargy_spark.operators.textstats import rare_token_scores
    return rare_token_scores(_docs(spark, sf_dir))


def q_remove_dup_spans(spark, sf_dir) -> DataFrame:
    """Span-level dedup WRITER: corpus-duplicated 8-gram spans removed
    keeping each gram's corpus-first occurrence; full rewritten text
    under the value hash (dedup.remove_dup_spans)."""
    from yargy_spark.operators.dedup import remove_dup_spans
    return remove_dup_spans(_docs(spark, sf_dir))


def q_paragraph_dedup(spark, sf_dir) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (RefinedWeb-style
    boilerplate pass): duplicated lines keep one occurrence at the
    lowest (doc_id, pos); rows carry the rewritten text + counts."""
    from yargy_spark.operators.dedup import paragraph_dedup
    return paragraph_dedup(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.textstats import lang_id
    return lang_id(_docs(spark, sf_dir))


def q_quality_scores(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.textstats import quality_scores
    return quality_scores(_docs(spark, sf_dir))


def q_repetition_scores(spark, sf_dir) -> DataFrame:
    """Gopher repetition filters (textstats.repetition_scores): the
    Spark side is a map-only in-array run-length scan; the oracle
    replays it through unnest -> GROUP BY -> window."""
    from yargy_spark.operators.textstats import repetition_scores
    return repetition_scores(_docs(spark, sf_dir))


# the synthetic corpus carries no PII, so the scrub query unions
# crafted rows onto it; the oracle mirrors them as VALUES literals.
# Rows 4-6 are NEGATIVES (round-3 VERDICT #3): formatted money,
# space-grouped IDs and ISO dates must SURVIVE the scrub; row 5 mixes
# a surviving order id with real phones that must still redact.
PII_ROWS = [
    (1000001, 'contact me at john.doe@example.com or call '
              '+7 (495) 123-45-67 today'),
    (1000002, 'two mails: a@b.io and c.d@e.org; fax 84951234567'),
    (1000003, 'no pii here, just words'),
    (1000004, 'цена выросла до 1 500 000 $ (или 12 500 000 руб) '
              'к 2026-08-18'),
    (1000005, 'order 1234-5678 of 10 000 units; support '
              '555-123-4567 or 8 (916) 123-45-67'),
    (1000006, 'счёт на 250 000 000 рублей от 2025-12-31 досрочно'),
    # pins the ONE in-pattern alternation overlap: the hyphen-grouped
    # shape (full '123-456-7890-12') vs NANP ('123-456-7890' prefix)
    # both match at the same offset — both engines must take the
    # leftmost-FIRST (longer, earlier-listed) alternative
    (1000007, 'ticket 123-456-7890-12 escalated; call 123-456-7890'),
]


def q_corpus_vocabulary(spark, sf_dir) -> DataFrame:
    """Corpus vocabulary (textstats.corpus_vocabulary) — the feed
    for the vocabulary-filtered dictionary load."""
    from yargy_spark.operators.textstats import corpus_vocabulary
    return corpus_vocabulary(_docs(spark, sf_dir))


def q_pii_scrub(spark, sf_dir) -> DataFrame:
    """Email/phone redaction (textstats.pii_scrub): corpus plus
    crafted PII rows; full scrubbed text under the value hash."""
    from yargy_spark.operators.textstats import pii_scrub
    docs = _docs(spark, sf_dir).select('doc_id', 'text')
    crafted = spark.createDataFrame(PII_ROWS,
                                    'doc_id long, text string')
    return pii_scrub(docs.unionByName(crafted))


# crafted rows exercising each stage of the composed filter chain:
# a PII-bearing survivor, a repetition drop, a quality drop
FILTER_ROWS = [
    (2000001, 'please write to support at team dot example dot com '
              'or email me directly at help.desk@example.com '
              'whenever anything breaks'),
    (2000002, ('ля ' * 25).strip()),
    (2000003, 'короткий'),
]


def q_filter_corpus(spark, sf_dir) -> DataFrame:
    """The composed one-pass filter chain (textstats.filter_corpus:
    quality gate -> repetition drop -> PII scrub, zero exchanges);
    oracle composed from the same fragments as the stage oracles."""
    from yargy_spark.operators.textstats import filter_corpus
    docs = _docs(spark, sf_dir).select('doc_id', 'text')
    crafted = spark.createDataFrame(FILTER_ROWS,
                                    'doc_id long, text string')
    return filter_corpus(docs.unionByName(crafted))


def q_token_counts(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.textstats import token_counts
    return token_counts(_docs(spark, sf_dir))


def q_top_ngrams(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.textstats import top_ngrams
    return top_ngrams(_docs(spark, sf_dir), n=2, k=20)


def q_doc_fingerprints(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.textstats import doc_fingerprints
    return doc_fingerprints(_docs(spark, sf_dir))


def q_multimodal_meta(spark, sf_dir) -> DataFrame:
    from yargy_spark.operators.multimodal import media_metadata
    return media_metadata(_docs(spark, sf_dir))


def q_multimodal_decode(spark, sf_dir) -> DataFrame:
    """Full image decode path: deterministic REAL P6 payloads
    (synth_ppm_media) -> binary column -> decode_image (the pure
    netpbm/BMP codec) -> per-image stats.  The oracle recomputes the
    stats from the doc_id arithmetic that generated the pixels, so a
    header-parse or raster-order bug breaks the hash."""
    from yargy_spark.operators.multimodal import (decode_stats,
                                                  synth_ppm_media)
    return decode_stats(synth_ppm_media(_docs(spark, sf_dir)))


def q_multimodal_png(spark, sf_dir) -> DataFrame:
    """PNG decode path: deterministic REAL 8-bit PNG payloads
    (synth_png_media — channels doc_id%4+1 covering gray/gray+alpha/
    RGB/RGBA, row filter (doc_id+y)%5 covering every unfilter branch;
    doc_id%7==3 docs are palette PNGs with an arithmetic PLTE and,
    on odd ids, a short tRNS) -> binary column -> decode_image
    (stdlib-zlib DEFLATE + scanline unfilter + PLTE/tRNS lookup) ->
    per-image stats.  The oracle recomputes the stats from the
    generating doc_id arithmetic (replaying the palette lookup in
    SQL), so a filter-arithmetic, chunk-walk, raster-order, or
    palette-lookup bug breaks the hash."""
    from yargy_spark.operators.multimodal import (decode_stats,
                                                  synth_png_media)
    return decode_stats(synth_png_media(_docs(spark, sf_dir)))


def q_multimodal_jpeg(spark, sf_dir) -> DataFrame:
    """Baseline-JPEG decode path: deterministic REAL SOF0 payloads
    (synth_jpeg_media — block-constant grayscale built on the
    codec's lossless witness: even block values make DC quantization
    exact, so the lossy format round-trips bit-exactly while every
    block runs the full Huffman/DC-prediction entropy path) ->
    binary column -> decode_image (jpeg.decode_jpeg: marker walk,
    DQT/DHT from the file, bit-level Huffman, numpy IDCT) ->
    per-image stats.  The oracle replays the block-value arithmetic
    in SQL — an entropy-decode, dequantize, IDCT, or marker-parse
    bug breaks the hash."""
    from yargy_spark.operators.multimodal import (decode_stats,
                                                  synth_jpeg_media)
    return decode_stats(synth_jpeg_media(_docs(spark, sf_dir)))


def q_multimodal_wav(spark, sf_dir) -> DataFrame:
    """Audio decode path: deterministic REAL RIFF/WAVE PCM payloads
    (synth_wav_media — mono/stereo 16-bit frames from doc_id
    arithmetic) -> binary column -> decode_wav (chunk walk with word
    alignment, PCM only, loud boundaries) -> per-clip amplitude
    stats.  PCM is lossless, so the oracle replays every decoded
    sample in SQL — a chunk-parse, interleave, or sign bug breaks
    the hash."""
    from yargy_spark.operators.multimodal import (audio_stats,
                                                  synth_wav_media)
    return audio_stats(synth_wav_media(_docs(spark, sf_dir)))


def q_multimodal_frames(spark, sf_dir) -> DataFrame:
    """Video frame-sampling path: deterministic REAL YUV4MPEG2
    payloads (synth_y4m_media — the public uncompressed video
    container, Cmono frames from doc_id arithmetic) -> binary
    column -> decode_y4m + sample_frames(every_k=2) -> per-sampled-
    frame stats.  Raw planar video is lossless, so the oracle
    replays every sampled frame's bytes in SQL — a header-parse,
    frame-walk, or sampling-stride bug breaks the hash."""
    from yargy_spark.operators.multimodal import (sample_frames,
                                                  synth_y4m_media)
    return sample_frames(synth_y4m_media(_docs(spark, sf_dir)),
                         every_k=2)


def q_doc_splits(spark, sf_dir) -> DataFrame:
    """Leakage-safe deterministic train/val/test split by hashed
    doc_id (operators/sampling.py::hash_split) — 98/1/1 in basis
    points over the portable md5 bucket."""
    from yargy_spark.operators.sampling import hash_split
    return (hash_split(_docs(spark, sf_dir), 'doc_id')
            .select('doc_id', 'split'))


def q_lang_balanced_sample(spark, sf_dir) -> DataFrame:
    """Per-language deterministic Bernoulli downsampling (rebalances
    the English-heavy head to 35%, keeps the rest)."""
    from yargy_spark.operators.sampling import stratified_sample
    return (stratified_sample(_docs(spark, sf_dir), 'lang',
                              {'en': 0.35}, 'doc_id',
                              default_fraction=1.0)
            .select('doc_id', 'lang'))


def q_source_reservoir(spark, sf_dir) -> DataFrame:
    """Deterministic 5-per-source uniform sample (lowest salted hash
    wins; WindowGroupLimit caps the window map-side)."""
    from yargy_spark.operators.sampling import stratum_reservoir
    return (stratum_reservoir(_docs(spark, sf_dir), 'source', 5,
                              'doc_id')
            .select('source', 'doc_id'))


def q_decontam_pairs(spark, sf_dir) -> DataFrame:
    """Eval-set decontamination (operators/dedup.py::decontaminate):
    documents sharing >=2 distinct 3-gram shingles with the held-out
    eval slice (doc_id % 97 == 0) — broadcast eval shingles, no
    corpus shuffle."""
    from yargy_spark.operators.dedup import decontaminate
    docs = _docs(spark, sf_dir)
    train = docs.where(F.col('doc_id') % 97 != 0)
    ev = docs.where(F.col('doc_id') % 97 == 0)
    return decontaminate(train, ev, k=3, min_hits=2)


def q_mixture_sample(spark, sf_dir) -> DataFrame:
    """Deterministic token-budget data mixture
    (operators/sampling.py::mixture_sample): 50/30/20 en/zh/de shares
    of a 6000-token budget; es/fr excluded by omission."""
    from yargy_spark.operators.sampling import mixture_sample
    return (mixture_sample(_docs(spark, sf_dir), 'lang',
                           {'en': 0.5, 'zh': 0.3, 'de': 0.2},
                           6000, 'doc_id')
            .select('doc_id', 'lang', 'n_tokens'))


def q_mixture_re_tokens(spark, sf_dir) -> DataFrame:
    """The pluggable budget counter (sampling.mixture_sample
    token_expr= + textstats.re_token_count): the SAME 50/30/20
    mixture but budgeted in BPE-ish regex tokens — selection
    thresholds and the emitted n_tokens both follow the swapped
    counter."""
    from yargy_spark.operators.sampling import mixture_sample
    from yargy_spark.operators.textstats import re_token_count
    return (mixture_sample(_docs(spark, sf_dir), 'lang',
                           {'en': 0.5, 'zh': 0.3, 'de': 0.2},
                           6000, 'doc_id',
                           token_expr=re_token_count())
            .select('doc_id', 'lang', 'n_tokens'))


def q_mixture_epochs(spark, sf_dir) -> DataFrame:
    """Upsampling mixture (sampling.py::mixture_epochs): de at 0.9 of
    a 20k-token budget repeats ~5 epochs; en at 0.1 downsamples —
    whole-epoch + hash-selected-partial repetition, all integer
    arithmetic."""
    from yargy_spark.operators.sampling import mixture_epochs
    return (mixture_epochs(_docs(spark, sf_dir), 'lang',
                           {'de': 0.9, 'en': 0.1}, 20000, 'doc_id')
            .select('doc_id', 'lang', 'n_tokens', 'epoch'))


def q_pack_sequences(spark, sf_dir) -> DataFrame:
    """Deterministic concat-and-chunk packing layout
    (operators/packing.py): per-doc shard, stream offset, and
    first/last ctx-length training sequence — reproducible across
    engines via the salted md5 order."""
    from yargy_spark.operators.packing import pack_sequences
    return pack_sequences(_docs(spark, sf_dir), ctx_len=512,
                          n_buckets=8)


def q_materialize_sequences(spark, sf_dir) -> DataFrame:
    """The packing WRITER (packing.materialize_sequences): actual
    (bucket, seq_id) training rows with the assembled token payload.
    The oracle re-slices every document in SQL, proving each sequence
    is exactly ctx_len tokens except per-bucket tails — the full
    payload text rides under the value hash."""
    from yargy_spark.operators.packing import materialize_sequences
    return materialize_sequences(_docs(spark, sf_dir), ctx_len=512,
                                 n_buckets=8)


def q_training_batches(spark, sf_dir) -> DataFrame:
    """The WHOLE training-data preparation pipeline as one declarative
    plan: quality gate -> exact dedup -> LSH near-dup prune
    (clean_corpus) -> leakage-safe train split (hash_split) ->
    token-budget language mixture (mixture_sample) -> concat-and-chunk
    packing (pack_sequences).  Every stage is the scale-shaped
    operator it reuses; the composed DuckDB oracle replays the chain
    end-to-end from the same shared SQL fragments."""
    from yargy_spark.operators.dedup import clean_corpus
    from yargy_spark.operators.packing import pack_sequences
    from yargy_spark.operators.sampling import (hash_split,
                                                mixture_sample)
    docs = _docs(spark, sf_dir)
    cleaned = clean_corpus(docs, meta_cols=('text', 'lang'))
    train = (hash_split(cleaned, 'doc_id')
             .where(F.col('split') == 'train'))
    mixed = mixture_sample(train, 'lang',
                           {'en': 0.5, 'zh': 0.3, 'de': 0.2},
                           6000, 'doc_id')
    return pack_sequences(mixed, ctx_len=512, n_buckets=4)


def q_pricing_summary(spark, sf_dir) -> DataFrame:
    """TPC-H Q1-style rollup. Money/quantity emitted as integer
    hundredths (BIGINT): floor(x*100) is IEEE-deterministic in both
    engines and integer sums are order-independent, so the result is
    hash-stable in every serializer (Decimal outputs were not —
    VERDICT r2 #1)."""
    li = spark.read.parquet(os.path.join(sf_dir, 'lineitem.parquet'))
    cents = lambda c: F.floor(F.col(c) * 100).cast('long')  # noqa: E731
    return (li.groupBy('l_returnflag', 'l_linestatus')
            .agg(F.sum(cents('l_quantity')).alias('sum_qty'),
                 F.sum(cents('l_extendedprice')).alias('sum_price'),
                 F.count('*').alias('count_order')))


def q_top_customers(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window
    orders = spark.read.parquet(os.path.join(sf_dir, 'orders.parquet'))
    cust = spark.read.parquet(os.path.join(sf_dir, 'customer.parquet'))
    # total_spent in integer cents (see q_pricing_summary docstring);
    # monotonic in the Decimal value, so the ranking is unchanged.
    per = (orders.groupBy('o_custkey')
           .agg(F.count('*').alias('n_orders'),
                F.sum(F.floor(F.col('o_totalprice') * 100).cast('long'))
                .alias('total_spent')))
    joined = per.join(F.broadcast(cust),
                      per.o_custkey == cust.c_custkey)
    w = Window.partitionBy('c_mktsegment').orderBy(
        F.desc('n_orders'), F.desc('total_spent'), F.asc('c_custkey'))
    return (joined.withColumn('rnk', F.row_number().over(w))
            .where(F.col('rnk') <= 3)
            .select('c_mktsegment', 'c_custkey', 'n_orders',
                    'total_spent', 'rnk'))


def q_idle_customers(spark, sf_dir) -> DataFrame:
    """Anti-join: customers with no orders (except-semantics analog,
    SURVEY.md §2.7 relational view)."""
    orders = spark.read.parquet(os.path.join(sf_dir, 'orders.parquet'))
    cust = spark.read.parquet(os.path.join(sf_dir, 'customer.parquet'))
    big = orders.where(F.col('o_totalprice') > 300000)
    return (cust.join(big, cust.c_custkey == big.o_custkey,
                      'left_anti')
            .select('c_custkey', 'c_mktsegment'))


def q_orders_rollup(spark, sf_dir) -> DataFrame:
    """Grouping-sets rollup over order status x priority."""
    orders = spark.read.parquet(os.path.join(sf_dir, 'orders.parquet'))
    return (orders
            .rollup('o_orderstatus', 'o_orderpriority')
            .agg(F.count('*').alias('n_orders'))
            .select(F.coalesce('o_orderstatus', F.lit('ALL'))
                    .alias('status'),
                    F.coalesce('o_orderpriority', F.lit('ALL'))
                    .alias('priority'),
                    'n_orders'))


def q_event_sessions(spark, sf_dir) -> DataFrame:
    from pyspark.sql import Window
    ev = spark.read.parquet(os.path.join(sf_dir, 'events.parquet'))
    w = Window.partitionBy('user_id').orderBy('ts', 'event_id')
    gap = (F.unix_timestamp('ts')
           - F.unix_timestamp(F.lag('ts').over(w)))
    marked = ev.withColumn(
        'new_session',
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    return (marked.groupBy('user_id')
            .agg(F.sum('new_session').alias('n_sessions'),
                 F.count('*').alias('n_events')))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING MATTERS: the external driver's CORRECTNESS artifact
    # reports only the FIRST 50 entries (round-3 VERDICT finding).
    # ROTATION POLICY (round-4 VERDICT #2, documented in BASELINE.md
    # "driver reporting window"): the window holds, in priority
    # order, (a) queries NEW or semantically changed this round —
    # including queries whose ORACLES nest a changed fragment, (b)
    # every entry that fell past the cap LAST round (so the union of
    # two consecutive CORRECTNESS artifacts re-gates all queries with
    # a <= 1-round-old green row), (c) fillers gated in the fewest
    # prior rounds.  Entries confirmed green last round with unchanged
    # semantics rotate to the tail.
    return {
        # -- the KG headline family (cheap, the north-rule spine)
        'kg_facts_golden': q_kg_facts_golden,
        'kg_triples_date': q_kg_triples_date,
        'kg_entities': q_kg_entities,
        'kg_incremental': q_kg_incremental,
        'kg_merge_candidates': q_kg_merge_candidates,
        'kg_person_triples': q_kg_person_triples,
        'kg_token_table': q_kg_token_table,
        'kg_money_triples': q_kg_money_triples,
        'kg_geo_triples': q_kg_geo_triples,
        'kg_fact_spans': q_kg_fact_spans,
        'kg_oov_person': q_kg_oov_person,
        'kg_address': q_kg_address,
        'kg_lemma_tokens': q_kg_lemma_tokens,
        'kg_entity_cooccurrence': q_kg_entity_cooccurrence,
        'kg_entity_degree': q_kg_entity_degree,
        # -- NEW this round (never gated)
        'ann_query_ivf_topk': q_ann_query_ivf_topk,
        'ann_query_indexed': q_ann_query_indexed,
        'kg_extract_report': q_kg_extract_report,
        'multimodal_png': q_multimodal_png,
        'multimodal_jpeg': q_multimodal_jpeg,
        'multimodal_wav': q_multimodal_wav,
        'multimodal_frames': q_multimodal_frames,
        # -- CHANGED this round: the LSH hot-bucket governor rewrites
        # the candidate stage of the whole minhash family (and
        # dup_clusters' oracle nests the pair oracle); the
        # dedup_incremental gate now offsets batch ids per the
        # operator contract; dedup_report gained the hot-bucket row;
        # multimodal_decode's netpbm parser gained strict validation
        'minhash_lsh_dups': q_minhash_lsh_dups,
        'clean_corpus': q_clean_corpus,
        'dup_clusters': q_dup_clusters,
        'dedup_incremental': q_dedup_incremental,
        'dedup_report': q_dedup_report,
        'multimodal_decode': q_multimodal_decode,
        # -- rotated IN: past the cap in round 4 (last gated r2/r3)
        'decontam_pairs': q_decontam_pairs,
        'mixture_sample': q_mixture_sample,
        'mixture_epochs': q_mixture_epochs,
        'pack_sequences': q_pack_sequences,
        'training_batches': q_training_batches,
        'exact_dedup': q_exact_dedup,
        'stream_dedup': q_stream_dedup,
        'stream_mention_rollup': q_stream_mention_rollup,
        'events_asof': q_events_asof,
        'embedding_dup_exact': q_embedding_dup_exact,
        'ann_cosine_topk': q_ann_cosine_topk,
        'multimodal_meta': q_multimodal_meta,
        'doc_splits': q_doc_splits,
        'lang_id': q_lang_id,
        'quality_scores': q_quality_scores,
        'token_counts': q_token_counts,
        'doc_fingerprints': q_doc_fingerprints,
        # -- fillers: gated only once so far (new in round 4)
        'kg_merge_apply': q_kg_merge_apply,
        'pii_scrub': q_pii_scrub,
        'filter_corpus': q_filter_corpus,
        'materialize_sequences': q_materialize_sequences,
        'mixture_re_tokens': q_mixture_re_tokens,
        # ---- entries below fall past the driver's 50-query cap;
        # ---- every one was driver-gated hash-green in ROUND 4
        # ---- (CORRECTNESS_r04.json) with unchanged semantics and
        # ---- oracles, so each keeps a <= 1-round-old green row.
        # ---- (rare_tokens, dup_spans, ann_query_topk and
        # ---- paragraph_dedup yielded their slots to the new
        # ---- ann_query_indexed, multimodal_jpeg, multimodal_wav
        # ---- and multimodal_frames per priority (a) of the
        # ---- policy.)
        'paragraph_dedup': q_paragraph_dedup,
        'ann_query_topk': q_ann_query_topk,
        'dup_spans': q_dup_spans,
        'rare_tokens': q_rare_tokens,
        'remove_dup_spans': q_remove_dup_spans,
        'pricing_summary': q_pricing_summary,
        'top_customers': q_top_customers,
        'idle_customers': q_idle_customers,
        'orders_rollup': q_orders_rollup,
        'event_sessions': q_event_sessions,
        'stream_band_collisions': q_stream_band_collisions,
        'simhash_docs': q_simhash_docs,
        'events_asof_bucketed': q_events_asof_bucketed,
        'transcripts_tool_stats': q_transcripts_tool_stats,
        'context_windows': q_context_windows,
        'ngram_jaccard_dups': q_ngram_jaccard_dups,
        'simhash_dup_pairs': q_simhash_dup_pairs,
        'embedding_dup_pairs': q_embedding_dup_pairs,
        'ann_ivf_topk': q_ann_ivf_topk,
        'repetition_scores': q_repetition_scores,
        'corpus_vocabulary': q_corpus_vocabulary,
        'top_ngrams': q_top_ngrams,
        'lang_balanced_sample': q_lang_balanced_sample,
        'source_reservoir': q_source_reservoir,
    }


# ------------------------------------------------------------- oracle SQL

def _values_rows(rows, cols, casts=None):
    """VALUES-literal oracle.  ``casts`` maps column -> SQL type so the
    oracle's declared dtype matches the Spark side exactly (bare int
    literals infer as INTEGER in DuckDB while Spark counts are
    BIGINT; the driver hashes typed values)."""
    body = ',\n  '.join(
        '(%s)' % ', '.join(_sql_lit(v) for v in row) for row in rows)
    casts = casts or {}
    sel = ', '.join(
        'CAST(%s AS %s) AS %s' % (c, casts[c], c) if c in casts else c
        for c in cols)
    return 'SELECT %s FROM (VALUES\n  %s\n) AS t(%s)' % (
        sel, body, ', '.join(cols))


def _sql_lit(v):
    if isinstance(v, str):
        return "'%s'" % v.replace("'", "''")
    return str(v)


def _kg_expected():
    from tests.goldens import EXPECTED_FACTS
    return [(c, r, json.dumps(f, ensure_ascii=False, sort_keys=True))
            for c, r, f in EXPECTED_FACTS]


_NORM = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"

# the ONE SQL twin of textstats.ws_token_count — shared by the
# token_counts / mixture_sample / pack_sequences oracles so the three
# can never count differently (mirrors the shared Spark expression)
_WS_TOKENS = """CAST(CASE WHEN length(trim(lower(text))) = 0 THEN 0
       ELSE len(regexp_split_to_array(trim(lower(text)),
                                      '\\s+')) END AS INT)"""

# Quality-gate fragments shared by oracles['quality_scores'] and the
# clean_corpus keepdocs CTE — ONE definition so the two oracles (and
# therefore the gate) can never run different keep thresholds than
# each other (textstats.quality_scores is the Spark-side source of
# truth for both).
_Q_BASE_COLS = r"""length(text) AS n_chars_txt,
         len(regexp_split_to_array(trim(lower(text)), '\s+'))
           AS n_words,
         length(regexp_replace(lower(text), '[^\p{L}\p{N}]', '', 'g'))
           AS alpha_len,
         length(regexp_replace(lower(text), '[\p{L}\p{N}\s]', '', 'g'))
           AS punct"""
_Q_KEEP_PRED = """n_words >= 10 AND n_chars_txt >= 50
        AND floor(100.0 * alpha_len / greatest(n_words, 1))
            BETWEEN 200 AND 1000
        AND floor(10000.0 * punct / greatest(n_chars_txt, 1)) <= 2000"""
_H60 = "('0x' || substr(md5({x}), 1, 15))::int64"


def _repetition_sql(src):
    """CTE chain ending in ``rep_scored(doc_id, n_words,
    dup_line_ratio_x10000, dup_line_char_ratio_x10000,
    top_2gram_char_ratio_x10000)`` over ``src`` — ONE definition
    shared by the repetition_scores and filter_corpus oracles
    (mirrors textstats._repetition_cols the same way the quality
    fragments mirror _quality_features)."""
    return r"""l0 AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS l
  FROM {src}),
l1 AS (
  SELECT doc_id, trim(l) AS ln FROM l0 WHERE length(trim(l)) > 0),
lc AS (
  SELECT doc_id, ln, count(*) AS c, length(ln) AS len
  FROM l1 GROUP BY doc_id, ln),
lstat AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         sum(c) - count(*) AS dup_lines,
         sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dup_chars,
         sum(c * len) AS tot_chars
  FROM lc GROUP BY doc_id),
w AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS wa
  FROM {src}),
g0 AS (
  SELECT doc_id, wa[i] || ' ' || wa[i+1] AS g
  FROM (SELECT doc_id, wa,
               unnest(generate_series(1, len(wa) - 1)) AS i
        FROM w WHERE len(wa) >= 2)),
gc AS (SELECT doc_id, g, count(*) AS c FROM g0 GROUP BY doc_id, g),
top AS (
  SELECT doc_id, c, g FROM (
    SELECT doc_id, c, g,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, g ASC) AS rn
    FROM gc) WHERE rn = 1),
nl AS (SELECT doc_id, length(array_to_string(wa, ' ')) AS norm_len,
              len(wa) AS n_words
       FROM w),
rep_scored AS (
  SELECT d.doc_id, nl.n_words,
    CAST(COALESCE(floor(10000.0 * ls.dup_lines / ls.n_lines), 0)
         AS BIGINT) AS dup_line_ratio_x10000,
    CAST(COALESCE(floor(10000.0 * ls.dup_chars / ls.tot_chars), 0)
         AS BIGINT) AS dup_line_char_ratio_x10000,
    CAST(COALESCE(floor(10000.0 * t.c * length(t.g) / nl.norm_len),
                  0) AS BIGINT) AS top_2gram_char_ratio_x10000
  FROM {src} d
  LEFT JOIN lstat ls USING (doc_id)
  LEFT JOIN top t USING (doc_id)
  LEFT JOIN nl USING (doc_id))""".replace('{src}', src)


_REP_FLAG_PRED = """n_words >= 20
                  AND (dup_line_ratio_x10000 > 3000
                       OR dup_line_char_ratio_x10000 > 3000
                       OR top_2gram_char_ratio_x10000 > 2000)"""

def _shingles_sql(src):
    """norm + shingles CTEs over ``src`` (documents or repdocs)."""
    return """
  norm AS (SELECT doc_id, string_split({norm}, ' ') AS w FROM {src}),
  shingles AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
    FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
          FROM norm WHERE len(w) >= 3))
""".format(norm=_NORM, src=src)


_SHINGLES = _shingles_sql('documents')

_JACCARD_VERIFY = """
  sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
  inter AS (
    SELECT c.a, c.b, count(*) AS inter
    FROM cands c
    JOIN shingles sa ON sa.doc_id = c.a
    JOIN shingles sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
    GROUP BY c.a, c.b),
  verified AS (
    SELECT i.a, i.b,
           CAST(floor(10000.0 * i.inter /
                (za.sz + zb.sz - i.inter)) AS BIGINT) AS jaccard_x10000
    FROM inter i
    JOIN sizes za ON za.doc_id = i.a
    JOIN sizes zb ON zb.doc_id = i.b)
"""


# dedup-first replay (operators/dedup._exact_groups/_expand_groups):
# candidates and Jaccard verification run over one representative per
# distinct normalized text; member pairs (and within-group pairs of
# exact copies with >= k words, jaccard 10000) are expanded at the end.
def _dedup_first_sql(src):
    """grp + repdocs CTEs over ``src`` (documents, or a quality-kept
    subset for the clean_corpus composition)."""
    return """
  grp AS (
    SELECT doc_id,
           min(doc_id) OVER (
             PARTITION BY ('0x' || substr(md5({norm}), 1, 15))::int64
           ) AS rep_id
    FROM {src}),
  repdocs AS (
    SELECT d.doc_id, d.text FROM {src} d
    JOIN grp g ON d.doc_id = g.doc_id AND g.doc_id = g.rep_id)
""".format(norm=_NORM, src=src)


_DEDUP_FIRST = _dedup_first_sql('documents')

_SHINGLES_REPS = _shingles_sql('repdocs')

# MinHash banding over the repdocs shingle table (operators/dedup.
# _minhash_rep_pairs): shared verbatim by the minhash_lsh_dups and
# clean_corpus oracles so the two can never band differently.
# Candidate generation carries the round-5 hot-bucket governor
# (operators/dedup._band_candidates): buckets over {cap} reps emit
# star edges to the bucket-min doc only — in SQL the star edge is
# exactly "left side IS the bucket min" since bmin < every member.
# Placeholders: {fam} hash-family VALUES rows, {m} Mersenne modulus,
# {rpb} rows per band, {h} the 60-bit shingle hash expression,
# {cap} the governor threshold (LSH_MAX_BUCKET).
_MINHASH_CANDS = """
  fam(i, a, b) AS (VALUES
    {fam}),
  xs AS (SELECT doc_id, {h} % {m} AS x FROM shingles),
  sig AS (
    SELECT doc_id, fam.i AS hash_idx,
           min((fam.a * xs.x + fam.b) % {m}) AS minhash
    FROM xs CROSS JOIN fam GROUP BY doc_id, fam.i),
  bands AS (
    -- integer floor division: CAST(x / 2 AS INT) would ROUND in
    -- DuckDB and run a different banding than Spark's
    SELECT doc_id, CAST(hash_idx // {rpb} AS INT) AS band,
           string_agg(CAST(minhash AS VARCHAR), '_'
                      ORDER BY hash_idx) AS sig_key
    FROM sig GROUP BY doc_id, CAST(hash_idx // {rpb} AS INT)),
  bstats AS (
    SELECT band, sig_key, count(*) AS bn, min(doc_id) AS bmin
    FROM bands GROUP BY band, sig_key),
  cands AS (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM bands l JOIN bands r
      ON l.band = r.band AND l.sig_key = r.sig_key
    JOIN bstats s ON s.band = l.band AND s.sig_key = l.sig_key
    WHERE l.doc_id < r.doc_id
      AND (s.bn <= {cap} OR l.doc_id = s.bmin))
"""

def _mh_split_sql(pred, p, id_expr='doc_id'):
    """Prefixed dedup-first + shingle + minhash sig/band CTE chain
    over ``documents WHERE pred`` — the dedup_incremental oracle runs
    TWO of these (base state / new batch), so every CTE name takes
    prefix ``p``.  ``id_expr`` lets the batch chain remap doc_ids
    (the gate offsets the batch half above the state half, honoring
    dedup_increment's ids-time-order-after-state contract).  Formulas
    mirror _dedup_first_sql / _shingles_sql / _MINHASH_CANDS verbatim
    (same hash family ``fam`` CTE, Mersenne modulus, banding
    arithmetic, k=3 shingles); placeholders {h60s} (60-bit shingle
    hash) and {m} are closed by the caller's .format alongside fam."""
    return """
  {p}src AS (SELECT {id_expr} AS doc_id, text
             FROM documents WHERE {pred}),
  {p}grp AS (
    SELECT doc_id,
           min(doc_id) OVER (
             PARTITION BY ('0x' || substr(md5({norm}), 1, 15))::int64
           ) AS rep_id
    FROM {p}src),
  {p}rep AS (
    SELECT d.doc_id, d.text FROM {p}src d
    JOIN {p}grp g ON d.doc_id = g.doc_id AND g.doc_id = g.rep_id),
  {p}norm AS (SELECT doc_id, string_split({norm}, ' ') AS w
              FROM {p}rep),
  {p}sh AS (
    SELECT DISTINCT doc_id,
           w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
    FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
          FROM {p}norm WHERE len(w) >= 3)),
  {p}sig AS (
    SELECT doc_id, fam.i AS hash_idx,
           min((fam.a * x + fam.b) % {{m}}) AS minhash
    FROM (SELECT doc_id, {{h60s}} % {{m}} AS x FROM {p}sh)
    CROSS JOIN fam GROUP BY doc_id, fam.i),
  {p}bands AS (
    SELECT doc_id, CAST(hash_idx // {rpb} AS INT) AS band,
           string_agg(CAST(minhash AS VARCHAR), '_'
                      ORDER BY hash_idx) AS sig_key
    FROM {p}sig GROUP BY doc_id, CAST(hash_idx // {rpb} AS INT)),
  {p}sizes AS (SELECT doc_id, count(*) AS sz FROM {p}sh
               GROUP BY doc_id)""".format(
        p=p, pred=pred, id_expr=id_expr, norm=_NORM, rpb='{rpb}')


def _expand_groups_sql(score_col='jaccard_x10000', self_score=10000,
                       min_words=3):
    """Member expansion over the dedup-first rep_pairs CTE — the ONE
    SQL twin of operators/dedup._expand_groups (self_score is the
    metric's identical-document value: jaccard 10000, hamming 0)."""
    return """
  self_pairs AS (
    SELECT doc_id AS a, doc_id AS b,
           CAST({ss} AS BIGINT) AS {sc}
    FROM norm WHERE len(w) >= {mw}),
  allp AS (SELECT a, b, {sc} FROM rep_pairs
           UNION ALL SELECT a, b, {sc} FROM self_pairs),
  ga AS (SELECT rep_id AS a, doc_id AS ma FROM grp),
  gb AS (SELECT rep_id AS b, doc_id AS mb FROM grp)
SELECT least(ga.ma, gb.mb) AS a, greatest(ga.ma, gb.mb) AS b,
       {sc}
FROM allp JOIN ga USING (a) JOIN gb USING (b)
WHERE allp.a != allp.b OR ga.ma < gb.mb
""".format(sc=score_col, ss=self_score, mw=min_words)


_EXPAND_GROUPS = _expand_groups_sql()

def oracle_sql() -> dict[str, str]:
    from yargy_spark.operators.dedup import (HASH_FAMILY,
                                             LSH_DEFAULT_THRESHOLD,
                                             LSH_MAX_BUCKET,
                                             MERSENNE, ROWS_PER_BAND)
    from yargy_spark.operators.textstats import EN_STOP, TOKEN_PATTERN

    kg = _kg_expected()
    stop_list = ', '.join("'%s'" % w for w in EN_STOP)
    family_rows = ',\n    '.join(
        '(%d, %d, %d)' % (i, a, b)
        for i, (a, b) in enumerate(HASH_FAMILY))

    oracles = {}

    oracles['kg_facts_golden'] = _values_rows(
        kg, ['conv_id', 'rule_id', 'fact_json'])

    # CappedParser observability (q_kg_extract_report): fixture =
    # golden corpus + 1 poison turn ('a 'x40, ambiguous grammar at
    # cap=50 -> exactly one (turn, rule) budget abort) + 1 turn no
    # trigger matches; mentions = the golden fact count (the same
    # EXPECTED_FACTS the kg_facts_golden oracle pins — the poison and
    # quiet turns contribute zero)
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES
    oracles['kg_extract_report'] = _values_rows([
        ('turns_total', len(GOLDEN_SENTENCES) + 2),
        ('turns_triggered', len(GOLDEN_SENTENCES) + 1),
        ('turns_budget_aborted', 1),
        ('budget_aborts', 1),
        ('mentions', len(kg)),
        ('kernel_errors', 0),
    ], ['metric', 'value'], casts={'value': 'BIGINT'})

    oracles['kg_triples_date'] = _values_rows([
        ('g000003', 'day', '8'), ('g000003', 'month', '6'),
        ('g000003', 'year', '2015'),
        ('g000004', 'day', '18'), ('g000004', 'month', '7'),
        ('g000004', 'year', '2016'),
        ('g000005', 'day', '2'), ('g000005', 'month', '1'),
        ('g000005', 'year', '2016'),
        ('g000006', 'year', '2015'),
    ], ['conv_id', 'pred', 'obj'])

    oracles['kg_entities'] = _values_rows([
        ('иван|ульянов', 5), ('владимир|путин', 2),
        ('саша|иванов', 1), ('саша|иванова', 1), ('саша|быков', 1),
    ], ['canonical', 'n_mentions'], casts={'n_mentions': 'BIGINT'})

    # incremental linking over the parity-split golden corpus: the
    # lone odd-half Иван Ульянов mention adopts the even-half entity
    # (its norm_key is in the prior state); the two odd-half Саша
    # keys never occur in the even half, so they mint fresh entities
    oracles['kg_incremental'] = _values_rows([
        ('иван|ульянов', 1, 1),
        ('саша|быков', 1, 0), ('саша|иванов', 1, 0),
    ], ['canonical', 'n_mentions', 'adopted'],
        casts={'n_mentions': 'BIGINT', 'adopted': 'INT'})

    # merge work-list over the inline bridge fixture: each increment
    # conversation that connects two prior entities emits exactly one
    # oriented pair with its witness conversation and surname lemma
    oracles['kg_merge_candidates'] = _values_rows([
        ('ent_100', 'ent_200', 'cX', 'петров'),
        ('ent_300', 'ent_400', 'cY', 'ульянов'),
    ], ['entity_a', 'entity_b', 'conv_id', 'last_lemma'])

    # merge APPLICATION: the oracle recomputes the candidate graph's
    # transitive closure with a recursive CTE and the numeric-min
    # survivor election — an independent CC implementation checking
    # apply_entity_merges' large/small-star run, not pinned literals
    ma_keys = ',\n    '.join(
        "('%s', '%s', '%s')" % row for row in MERGE_APPLY_KEYS)
    ma_cands = ',\n    '.join(
        "('%s', '%s')" % (a, b) for a, b, _c, _l in MERGE_APPLY_CANDS)
    oracles['kg_merge_apply'] = """
WITH RECURSIVE
keys(norm_key, entity_id, canonical) AS (VALUES
    %(keys)s),
cands(entity_a, entity_b) AS (VALUES
    %(cands)s),
e0 AS (
  SELECT CAST(regexp_extract(entity_a, 'ent_([0-9]+)', 1) AS BIGINT)
           AS a,
         CAST(regexp_extract(entity_b, 'ent_([0-9]+)', 1) AS BIGINT)
           AS b
  FROM cands),
edges AS (SELECT a AS src, b AS dst FROM e0
          UNION SELECT b AS src, a AS dst FROM e0),
reach(node, r) AS (
  SELECT src AS node, src AS r FROM edges
  UNION SELECT src AS node, dst AS r FROM edges
  UNION SELECT e.src AS node, r.r
        FROM edges e JOIN reach r ON e.dst = r.node),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
mapping AS (
  SELECT 'ent_' || CAST(node AS VARCHAR) AS entity_id,
         'ent_' || CAST(component AS VARCHAR) AS merged_id
  FROM comp WHERE node <> component),
surv AS (SELECT DISTINCT entity_id AS merged_id,
                canonical AS merged_canonical FROM keys)
SELECT k.norm_key, k.entity_id AS prior_entity,
       COALESCE(m.merged_id, k.entity_id) AS entity_id,
       COALESCE(s.merged_canonical, k.canonical) AS canonical
FROM keys k
LEFT JOIN mapping m ON k.entity_id = m.entity_id
LEFT JOIN surv s ON m.merged_id = s.merged_id
""" % {'keys': ma_keys, 'cands': ma_cands}

    oracles['kg_oov_person'] = _values_rows([
        ('v000000', 'name',
         '{"first": "эльвира", "last": "зубкова"}'),
        ('v000001', 'name',
         '{"first": "аделаида", "last": "брусникина"}'),
        ('v000002', 'name',
         '{"first": "трофим", "last": "зюзин"}'),
        ('v000003', 'name',
         '{"first": "максим", "last": "кочергин"}'),
        ('v000004', 'name',
         '{"first": "эльвира", "last": "зубкова"}'),
    ], ['conv_id', 'rule_id', 'fact_json'])

    oracles['kg_address'] = _values_rows([
        ('a000000', 'address',
         '{"house": 5, "street": "ленина", "street_type": "улица"}'),
        ('a000001', 'address',
         '{"street": "первомайская", "street_type": "улица"}'),
        ('a000002', 'address',
         '{"house": 12, "street": "мира", "street_type": "проспект"}'),
        ('a000003', 'address',
         '{"house": 3, "street": "глухой", '
         '"street_type": "переулок"}'),
    ], ['conv_id', 'rule_id', 'fact_json'])

    oracles['kg_person_triples'] = _values_rows([
        ('иван|ульянов', 'name.first', 'Иван'),
        ('иван|ульянов', 'name.last', 'Ульянов'),
        ('иван|ульянов', 'position', 'управляющий директор'),
    ], ['canonical', 'pred', 'obj'])

    # token-table oracle: the kernel tokenizer is the oracle generator;
    # its own behavior is pinned byte-for-byte by the reference golden
    # suite (tests/test_tokenizer.py), so these VALUES are
    # reference-derived, and the query validates the Spark plumbing.
    from yargy_spark.kernel.tokenize import TokenSpec
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES
    spec = TokenSpec()
    token_rows = []
    for conv in _TOKEN_CONVS:
        sentence = GOLDEN_SENTENCES[int(conv[1:])]
        for i, tok in enumerate(spec(sentence)):
            token_rows.append((conv, 0, i, tok.value, tok.start,
                               tok.stop, tok.type))
    oracles['kg_token_table'] = _values_rows(
        token_rows, ['conv_id', 'turn_idx', 'tok_idx', 'value',
                     'start', 'stop', 'type'])

    oracles['kg_money_triples'] = _values_rows([
        ('g000007', 'money', 'currency', '$'),
        ('g000007', 'money', 'value', '5 тысяч'),
        ('g000008', 'era', 'value', 'AD'),
        ('g000008', 'era', 'value', 'BC'),
    ], ['conv_id', 'rule_id', 'pred', 'obj'])

    oracles['kg_geo_triples'] = _values_rows([
        ('g000009', 'name', 'красная площадь'),
        ('g000009', 'name', 'первомайская улица'),
        ('g000010', 'name', 'чеченский республика'),
        ('g000011', 'name', 'донецкий народный республика'),
    ], ['conv_id', 'pred', 'obj'])

    # span-sink oracle: kernel-generated like kg_token_table — the
    # kernel's span behavior is pinned by the reference-derived golden
    # suite (tests/test_interpretation.py spans cases); the query
    # validates the Spark plumbing end-to-end.
    from yargy_spark.extractors import CompiledBank
    from yargy_spark.sources.transcripts import GOLDEN_SENTENCES
    bank = CompiledBank()
    span_rows = []
    for conv in _TOKEN_CONVS:
        for row in bank.run(GOLDEN_SENTENCES[int(conv[1:])]):
            for sp in row['fact_spans']:
                span_rows.append((conv, row['rule_id'],
                                  sp['start'], sp['stop']))
    oracles['kg_fact_spans'] = _values_rows(
        span_rows, ['conv_id', 'rule_id', 'start', 'stop'])

    # lemma-annotation oracle: built from the SAME merged dictionary
    # lexicon_table() serves (embedded golden + generated), so the
    # oracle replays the query's lookup exactly — an embedded-only
    # replica would silently diverge the moment a golden-sentence
    # token lands in the generated vocabulary
    from yargy_spark.kernel.morphology import default_morphology
    from yargy_spark.kernel.tokenize import TokenSpec as _TS
    lemma_sets: dict = {}
    for word, readings in default_morphology().entries.items():
        for lemma, _g in readings:
            lemma_sets.setdefault(word.lower(), set()).add(lemma)
    _spec = _TS()
    lemma_rows = []
    for conv in _TOKEN_CONVS:
        for i, tok in enumerate(_spec(GOLDEN_SENTENCES[int(conv[1:])])):
            low = tok.value.lower()
            lemmas = sorted(lemma_sets.get(low) or [low])
            lemma_rows.append((conv, i, tok.value, ','.join(lemmas)))
    oracles['kg_lemma_tokens'] = _values_rows(
        lemma_rows, ['conv_id', 'tok_idx', 'value', 'lemmas'])

    # co-occurrence oracle: conv -> canonical entity (from the
    # kg_entities golden), folded into grp = conv_idx % 4:
    #   grp0 {ульянов(0,16), путин(12)}  grp1 {иванов(1), быков(13)}
    #   grp2 {иванова(2), ульянов(14)}   grp3 {ульянов(15)} -> no pair
    oracles['kg_entity_cooccurrence'] = _values_rows([
        ('владимир|путин', 'иван|ульянов', 1),
        ('иван|ульянов', 'саша|иванова', 1),
        ('саша|быков', 'саша|иванов', 1),
    ], ['a', 'b', 'n_groups'], casts={'n_groups': 'BIGINT'})

    # degree over the same three gated edges: each undirected edge
    # contributes both endpoints
    oracles['kg_entity_degree'] = _values_rows([
        ('владимир|путин', 1, 1), ('иван|ульянов', 2, 2),
        ('саша|быков', 1, 1), ('саша|иванов', 1, 1),
        ('саша|иванова', 1, 1),
    ], ['entity', 'n_neighbors', 'degree_weight'],
        casts={'n_neighbors': 'BIGINT', 'degree_weight': 'BIGINT'})

    oracles['events_asof'] = """
WITH err AS (
  SELECT user_id, ts, max(event_id) AS err_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts),
clicks AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click')
SELECT c.event_id, c.user_id, e.err_id AS last_error_id
FROM clicks c
ASOF LEFT JOIN err e
  ON c.user_id = e.user_id AND c.ts >= e.ts
"""

    # the mitigation path must be indistinguishable from the plain one
    oracles['events_asof_bucketed'] = oracles['events_asof']

    oracles['transcripts_tool_stats'] = """
WITH t AS (
  SELECT i AS id, (i % 8) % 3 AS role_idx, i // 8 AS conv
  FROM (SELECT unnest(generate_series(0, 1023)) AS i)),
r AS (
  SELECT conv,
    ['user','assistant','tool'][role_idx + 1] AS role,
    CASE WHEN role_idx = 2
         THEN ['search','calculator','db'][id % 3 + 1] END AS tool
  FROM t)
SELECT role, tool, count(*) AS n_turns,
       count(DISTINCT conv) AS n_convs
FROM r GROUP BY role, tool
"""

    # context-window oracle: replay the id-derived text generator
    # (same modular selectors as transcripts_tool_stats, plus the
    # golden/filler sentence pools) and the rolling frame in SQL
    from yargy_spark.sources.transcripts import (FILLERS,
                                                 GOLDEN_SENTENCES)

    def _sql_list(items):
        return '[%s]' % ', '.join(
            "'%s'" % s.replace("'", "''") for s in items)

    oracles['context_windows'] = """
WITH t AS (
  SELECT i AS id, i // 8 AS conv, CAST(i % 8 AS INT) AS turn_idx,
         (i % 8) % 3 AS role_idx
  FROM (SELECT unnest(generate_series(0, 1023)) AS i)),
txt AS (
  SELECT printf('c%012d', conv) AS conv_id, turn_idx,
         ['user','assistant','tool'][role_idx + 1] AS role,
         CASE WHEN id % 3 = 0
              THEN {f}[id % {nf} + 1] || '. ' || {g}[id % {ng} + 1]
                   || '. ' || {f}[(id * 7 + 3) % {nf} + 1]
              ELSE {f}[id % {nf} + 1] || ', '
                   || {f}[(id * 7 + 3) % {nf} + 1]
         END AS text
  FROM t)
SELECT conv_id, turn_idx, role,
       count(text) OVER w AS n_ctx_turns,
       coalesce(string_agg(text, chr(10)) OVER w, '') AS context
FROM txt
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
""".format(f=_sql_list(FILLERS), g=_sql_list(GOLDEN_SENTENCES),
           nf=len(FILLERS), ng=len(GOLDEN_SENTENCES))

    # streaming rollup oracle: event-time windows computed from the
    # SAME fixture rows the query streams (sources/transcripts.
    # golden_stream_rows) — one source of truth for the timestamps
    from yargy_spark.sources.transcripts import golden_stream_rows
    epoch_by_conv = {row['conv_id']: row['epoch']
                     for row in golden_stream_rows()}
    win_counts: dict = {}
    for c, r, _f in kg:
        win = epoch_by_conv[c] // 600 * 600
        key = (win, _FACT_TYPES[r])
        win_counts[key] = win_counts.get(key, 0) + 1
    oracles['stream_mention_rollup'] = _values_rows(
        [(w, ft, n) for (w, ft), n in sorted(win_counts.items())],
        ['win_start', 'fact_type', 'n_mentions'],
        casts={'win_start': 'BIGINT', 'n_mentions': 'BIGINT'})

    # group key is (hash, normalized text) — collision guard parity
    # with operators/dedup.py::exact_dedup
    oracles['exact_dedup'] = """
WITH hashed AS (
  SELECT doc_id, {h} AS h, {norm} AS t FROM documents)
SELECT min(doc_id) AS rep_id, count(*) AS group_size
FROM hashed GROUP BY h, t
""".format(h=_H60.format(x=_NORM), norm=_NORM)

    oracles['ngram_jaccard_dups'] = """
WITH {df},
  {sh},
  dfreq AS (SELECT shingle, count(*) AS df FROM shingles GROUP BY shingle),
  rare AS (SELECT s.doc_id, s.shingle FROM shingles s
           JOIN dfreq USING (shingle) WHERE dfreq.df <= 100),
  cands AS (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM rare l JOIN rare r ON l.shingle = r.shingle
    WHERE l.doc_id < r.doc_id),
  {jv},
  rep_pairs AS (SELECT a, b, jaccard_x10000 FROM verified
                WHERE jaccard_x10000 >= 2000),
  {exp}
""".format(df=_DEDUP_FIRST, sh=_SHINGLES_REPS, jv=_JACCARD_VERIFY,
           exp=_EXPAND_GROUPS)

    minhash_cands = _MINHASH_CANDS.format(
        fam=family_rows, m=MERSENNE, rpb=ROWS_PER_BAND,
        h=_H60.format(x='shingle'), cap=LSH_MAX_BUCKET)

    oracles['minhash_lsh_dups'] = """
WITH {df},
  {sh},
  {mc},
  {jv},
  rep_pairs AS (SELECT a, b, jaccard_x10000 FROM verified
                WHERE jaccard_x10000 >= {thr}),
  {exp}
""".format(df=_DEDUP_FIRST, sh=_SHINGLES_REPS, mc=minhash_cands,
           jv=_JACCARD_VERIFY, thr=LSH_DEFAULT_THRESHOLD,
           exp=_EXPAND_GROUPS)

    # incremental near-dup: TWO independent split chains (even half =
    # committed state, odd half = arriving batch) built by the SAME
    # prefixed fragment; within-batch pairs replay the batch operator
    # (threshold -> group expansion incl. reflexive self pairs), cross
    # pairs band-join state vs batch and expand only the batch side —
    # exactly dedup_increment's contract, independently in DuckDB
    oracles['dedup_incremental'] = ("""
WITH fam(i, a, b) AS (VALUES
    {fam}),""" + _mh_split_sql('doc_id % 2 = 0', 'b_') + ','
        + _mh_split_sql('doc_id % 2 = 1', 'i_',
                        id_expr='doc_id + %d' % DEDUP_INC_OFFSET)
        + ',' + """
  i_bstats AS (
    SELECT band, sig_key, count(*) AS bn, min(doc_id) AS bmin
    FROM i_bands GROUP BY band, sig_key),
  w_cands AS (
    -- hot-bucket governor (dedup._band_candidates): buckets over
    -- {cap} reps emit star edges to the bucket-min doc only
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM i_bands l JOIN i_bands r
      ON l.band = r.band AND l.sig_key = r.sig_key
    JOIN i_bstats s ON s.band = l.band AND s.sig_key = l.sig_key
    WHERE l.doc_id < r.doc_id
      AND (s.bn <= {cap} OR l.doc_id = s.bmin)),
  w_inter AS (
    SELECT c.a, c.b, count(*) AS inter
    FROM w_cands c
    JOIN i_sh sa ON sa.doc_id = c.a
    JOIN i_sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
    GROUP BY c.a, c.b),
  w_rep_pairs AS (
    SELECT i.a, i.b,
           CAST(floor(10000.0 * i.inter / (za.sz + zb.sz - i.inter))
                AS BIGINT) AS jaccard_x10000
    FROM w_inter i
    JOIN i_sizes za ON za.doc_id = i.a
    JOIN i_sizes zb ON zb.doc_id = i.b
    WHERE floor(10000.0 * i.inter / (za.sz + zb.sz - i.inter))
          >= {thr}),
  w_self AS (
    SELECT doc_id AS a, doc_id AS b,
           CAST(10000 AS BIGINT) AS jaccard_x10000
    FROM i_norm WHERE len(w) >= 3),
  w_allp AS (SELECT a, b, jaccard_x10000 FROM w_rep_pairs
             UNION ALL SELECT a, b, jaccard_x10000 FROM w_self),
  w_exp AS (
    SELECT least(ga.ma, gb.mb) AS a, greatest(ga.ma, gb.mb) AS b,
           jaccard_x10000
    FROM w_allp
    JOIN (SELECT rep_id AS a, doc_id AS ma FROM i_grp) ga USING (a)
    JOIN (SELECT rep_id AS b, doc_id AS mb FROM i_grp) gb USING (b)
    WHERE w_allp.a != w_allp.b OR ga.ma < gb.mb),
  b_bstats AS (
    SELECT band, sig_key, count(*) AS bn, min(doc_id) AS bmin
    FROM b_bands GROUP BY band, sig_key),
  x_cands AS (
    -- bipartite governor form: a HOT state bucket contributes only
    -- its min-doc rep to the cross band join
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM b_bands l JOIN i_bands r
      ON l.band = r.band AND l.sig_key = r.sig_key
    JOIN b_bstats s ON s.band = l.band AND s.sig_key = l.sig_key
    WHERE s.bn <= {cap} OR l.doc_id = s.bmin),
  x_inter AS (
    SELECT c.a, c.b, count(*) AS inter
    FROM x_cands c
    JOIN b_sh sa ON sa.doc_id = c.a
    JOIN i_sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
    GROUP BY c.a, c.b),
  x_rep AS (
    SELECT i.a, i.b,
           CAST(floor(10000.0 * i.inter / (za.sz + zb.sz - i.inter))
                AS BIGINT) AS jaccard_x10000
    FROM x_inter i
    JOIN b_sizes za ON za.doc_id = i.a
    JOIN i_sizes zb ON zb.doc_id = i.b
    WHERE floor(10000.0 * i.inter / (za.sz + zb.sz - i.inter))
          >= {thr}),
  x_exp AS (
    SELECT x.a, g.doc_id AS b, x.jaccard_x10000
    FROM x_rep x JOIN i_grp g ON g.rep_id = x.b)
SELECT a, b, jaccard_x10000, CAST(0 AS INT) AS vs_state FROM w_exp
UNION ALL
SELECT a, b, jaccard_x10000, CAST(1 AS INT) AS vs_state FROM x_exp
""").format(fam=family_rows, m=MERSENNE, rpb=ROWS_PER_BAND,
            h60s=_H60.format(x='shingle'), thr=LSH_DEFAULT_THRESHOLD,
            cap=LSH_MAX_BUCKET)

    # streaming band collisions: the windowed bucket counts are
    # batch-replayable — per-doc signatures over the SAME shingle
    # fragment + hash family, 5-minute windows floored on the epoch
    oracles['stream_band_collisions'] = """
WITH fam(i, a, b) AS (VALUES
    {fam}),{sh}
  , xs AS (SELECT doc_id, {h} % {m} AS x FROM shingles),
  sig AS (
    SELECT doc_id, fam.i AS hash_idx,
           min((fam.a * x + fam.b) % {m}) AS minhash
    FROM xs CROSS JOIN fam GROUP BY doc_id, fam.i),
  bands AS (
    SELECT doc_id, CAST(hash_idx // {rpb} AS INT) AS band,
           string_agg(CAST(minhash AS VARCHAR), '_'
                      ORDER BY hash_idx) AS sig_key
    FROM sig GROUP BY doc_id, CAST(hash_idx // {rpb} AS INT)),
  ev AS (
    SELECT b.doc_id, b.band,
           ('0x' || substr(md5(b.sig_key), 1, 15))::int64 AS band_hash,
           ({epoch} + d.doc_id % {mod}) // 300 * 300 AS win_start
    FROM bands b JOIN documents d ON d.doc_id = b.doc_id)
SELECT CAST(win_start AS BIGINT) AS win_start, band, band_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM ev GROUP BY 1, 2, 3 HAVING count(*) > 1
""".format(fam=family_rows, sh=_SHINGLES, m=MERSENNE,
           rpb=ROWS_PER_BAND, h=_H60.format(x='shingle'),
           epoch=STREAM_EPOCH, mod=STREAM_TS_MOD)

    # streaming dedup: whichever copy survives arrival order, the
    # emitted key set equals batch DISTINCT over normalized text
    oracles['stream_dedup'] = """
SELECT DISTINCT {h} AS text_hash FROM documents
""".format(h=_H60.format(x=_NORM))

    # dup_clusters: the SAME minhash pair oracle, closed transitively
    # by a recursive CTE (UNION dedups, so the fixpoint terminates);
    # component id = min reachable node, exactly the CC contract
    oracles['dup_clusters'] = """
WITH RECURSIVE pairs AS ({mh}),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION SELECT b AS src, a AS dst FROM pairs),
reach(node, r) AS (
  SELECT src AS node, src AS r FROM edges
  UNION SELECT src AS node, dst AS r FROM edges
  UNION SELECT e.src AS node, r.r
        FROM edges e JOIN reach r ON e.dst = r.node)
SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
""".format(mh=oracles['minhash_lsh_dups'])

    # clean_corpus replays the full composition: the quality_scores
    # keep-predicate as a row filter, dedup-first representatives over
    # the kept docs, the SAME banded-minhash candidate chain, and
    # greater-id pruning of every verified pair.
    # salted portable bucket fragments shared by the sampling oracles
    # and the training_batches composition: coalesce(..., chr(0))
    # mirrors sampling._key_str's NULL-key sentinel (a NULL key would
    # otherwise poison the hash chain)
    _KS = "coalesce(CAST(doc_id AS VARCHAR), chr(0))"
    _B = ("('0x' || substr(md5('{{salt}}|' || {ks}), "
          "1, 15))::int64 % 10000").format(ks=_KS)

    oracles['clean_corpus'] = """
WITH keepdocs AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
         {qb}
    FROM documents)
  WHERE {qk}),
  {df},
  {sh},
  {mc},
  {jv},
  rep_pairs AS (SELECT a, b, jaccard_x10000 FROM verified
                WHERE jaccard_x10000 >= {thr}),
  dropped AS (SELECT DISTINCT b AS doc_id FROM rep_pairs)
SELECT r.doc_id, d.lang, d.source
FROM repdocs r
JOIN documents d ON d.doc_id = r.doc_id
WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_id = r.doc_id)
""".format(qb=_Q_BASE_COLS, qk=_Q_KEEP_PRED,
           df=_dedup_first_sql('keepdocs'), sh=_SHINGLES_REPS,
           mc=minhash_cands, jv=_JACCARD_VERIFY,
           thr=LSH_DEFAULT_THRESHOLD)

    # training_batches: the END-TO-END pipeline oracle, composed from
    # the SAME fragments as its stage oracles — clean_corpus retained
    # set (embedded verbatim as a CTE), the hash-split train bucket,
    # the mixture integer thresholds, and the packing cumsum.  Any
    # drift in a stage oracle shows up here too, by construction.
    oracles['training_batches'] = """
WITH clean AS ({clean}),
cdocs AS (
  SELECT d.doc_id, d.text, d.lang FROM documents d
  JOIN clean c ON c.doc_id = d.doc_id),
train AS (SELECT * FROM cdocs WHERE {bsplit} < 9800),
ttoks AS (SELECT doc_id, lang, {ws} AS n_tokens FROM train),
tot AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tot
        FROM ttoks GROUP BY lang),
kf AS (
  SELECT lang,
    CASE WHEN tot <= 0 THEN 0
         ELSE LEAST(10000,
                    CAST(CASE lang WHEN 'de' THEN 1200
                                   WHEN 'en' THEN 3000
                                   WHEN 'zh' THEN 1800 END
                         AS BIGINT) * 10000 // tot) END AS keep_bp
  FROM tot WHERE lang IN ('de', 'en', 'zh')),
mix AS (SELECT t.doc_id, t.n_tokens FROM ttoks t JOIN kf USING (lang)
        WHERE {bmix} < keep_bp),
pk AS (
  SELECT doc_id, n_tokens,
    CAST(('0x' || substr(md5('packb|' || {ks}), 1, 15))::int64 % 4
         AS INT) AS bucket,
    ('0x' || substr(md5('pack|' || {ks}), 1, 15))::int64 AS draw
  FROM mix WHERE n_tokens > 0),
packed AS (
  SELECT doc_id, bucket, n_tokens,
    CAST(sum(n_tokens) OVER (
      PARTITION BY bucket ORDER BY draw ASC, doc_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fin
  FROM pk)
SELECT doc_id, bucket,
       CAST(fin - n_tokens AS BIGINT) AS start_tok,
       n_tokens,
       CAST((fin - n_tokens) // 512 AS BIGINT) AS seq_first,
       CAST((fin - 1) // 512 AS BIGINT) AS seq_last
FROM packed
""".format(clean=oracles['clean_corpus'],
           bsplit=_B.format(salt='split'),
           bmix=_B.format(salt='mixture'),
           ks=_KS, ws=_WS_TOKENS)

    oracles['simhash_docs'] = """
WITH toks AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest(string_split({norm}, ' ')) AS w
        FROM documents)),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit)
  GROUP BY doc_id, bit)
SELECT doc_id,
       -- CAST: DuckDB sum(BIGINT) widens to HUGEINT; Spark emits LONG
       CAST(sum(CASE WHEN s > 0 THEN (1::int64 << bit) ELSE 0 END)
            AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
""".format(h=_H60.format(x='w'), norm=_NORM)

    # Deterministic k-means replay (similarity._centroids): hash-
    # sampled seeds + one Lloyd round over integer-quantized
    # components — centroid coordinates are exact int-sums divided as
    # doubles, so both engines compute bit-identical values.  ``src``
    # is the table/CTE the codebook is built over (the full
    # embeddings table for the self-join oracles; the corpus half for
    # the cross-table retrieval oracle, matching
    # _centroids_rows(corpus, ...)).
    _kmeans_sql = """
seeds AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS centroid_id,
         embedding AS centv
  FROM (SELECT vec_id, embedding,
               ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                 ::int64 AS h
        FROM {src})
  ORDER BY h, vec_id LIMIT 16),
assign0 AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, s.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY floor(10000.0 * list_cosine_similarity(
                 e.embedding, s.centv)) DESC, s.centroid_id ASC) AS r
    FROM {src} e CROSS JOIN seeds s)
  WHERE r = 1),
comp AS (
  SELECT centroid_id, i AS pos,
         CAST(floor(embedding[i] * 10000.0) AS BIGINT) AS q
  FROM assign0,
       unnest(generate_series(1, len(embedding))) AS t(i)),
cent AS (
  SELECT centroid_id, list(val ORDER BY pos) AS centv
  FROM (SELECT centroid_id, pos,
               CAST(sum(q) AS DOUBLE) / count(*) / 10000.0 AS val
        FROM comp GROUP BY centroid_id, pos)
  GROUP BY centroid_id)"""
    kmeans_ctes = _kmeans_sql.format(src='embeddings')

    oracles['simhash_dup_pairs'] = """
WITH {df},
  norm AS (SELECT doc_id, string_split({n}, ' ') AS w FROM repdocs),
  toks AS (
    SELECT doc_id, {h} AS h
    FROM (SELECT doc_id, unnest(w) AS w FROM norm)),
  per_bit AS (
    SELECT doc_id, bit,
           sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit)
    GROUP BY doc_id, bit),
  sig AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1::int64 << bit)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM per_bit GROUP BY doc_id),
  bands AS (
    SELECT doc_id, simhash, bb AS band,
           (simhash >> (15 * bb)) & 32767 AS key
    FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bb)),
  cand AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT)
             AS hamming
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.key = y.key
    WHERE x.doc_id < y.doc_id),
  rep_pairs AS (SELECT a, b, hamming FROM cand WHERE hamming <= 2),
  {exp}
""".format(df=_DEDUP_FIRST, n=_NORM, h=_H60.format(x='w'),
           exp=_expand_groups_sql('hamming', 0, 1))

    oracles['embedding_dup_exact'] = """
SELECT a.vec_id AS a, b.vec_id AS b,
       CAST(floor(10000.0 * list_cosine_similarity(
           a.embedding, b.embedding)) AS BIGINT) AS cos_x10000
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE floor(10000.0 * list_cosine_similarity(a.embedding, b.embedding))
      >= 4000
"""

    oracles['embedding_dup_pairs'] = """
WITH {km},
assign4 AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY floor(10000.0 * list_cosine_similarity(
                 e.embedding, c.centv)) DESC, c.centroid_id ASC) AS r
    FROM embeddings e CROSS JOIN cent c)
  WHERE r <= 4),
pairs AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
         x.embedding AS va, y.embedding AS vb
  FROM assign4 x JOIN assign4 y USING (centroid_id)
  WHERE x.vec_id < y.vec_id)
SELECT a, b,
       CAST(floor(10000.0 * list_cosine_similarity(va, vb))
            AS BIGINT) AS cos_x10000
FROM pairs
WHERE floor(10000.0 * list_cosine_similarity(va, vb)) >= 4000
""".format(km=kmeans_ctes)

    oracles['ann_cosine_topk'] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(floor(10000.0 * list_cosine_similarity(
             q.embedding, c.embedding)) AS BIGINT) AS cos_x10000
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < 10),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY cos_x10000 DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id,
       CAST(rank AS INT) AS rank,  -- Spark row_number() is INT
       cos_x10000
FROM ranked WHERE rank <= 5
"""

    oracles['ann_query_topk'] = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(floor(10000.0 * list_cosine_similarity(
             q.embedding, c.embedding)) AS BIGINT) AS cos_x10000
  FROM embeddings q JOIN embeddings c ON c.vec_id % 2 = 0
  WHERE q.vec_id % 2 = 1 AND q.vec_id < 20),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY cos_x10000 DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id,
       CAST(rank AS INT) AS rank,  -- Spark row_number() is INT
       cos_x10000
FROM ranked WHERE rank <= 5
"""

    # span-level duplication: positional 8-gram occurrences (NOT
    # per-doc distinct), counted corpus-wide on the exact gram string
    oracles['dup_spans'] = r"""
WITH w AS (
  SELECT doc_id, string_split({norm}, ' ') AS wa FROM documents),
occ AS (
  SELECT doc_id, array_to_string(list_slice(wa, i, i + 7), ' ') AS gram
  FROM (SELECT doc_id, wa, unnest(generate_series(1, len(wa) - 7)) AS i
        FROM w WHERE len(wa) >= 8)),
counts AS (SELECT gram, count(*) AS n FROM occ GROUP BY gram),
pd AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_grams
  FROM occ JOIN counts USING (gram) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(pd.n_grams, 0) AS n_grams,
       coalesce(pd.n_dup_grams, 0) AS n_dup_grams,
       CAST(floor(10000.0 * coalesce(pd.n_dup_grams, 0)
                  / greatest(coalesce(pd.n_grams, 0), 1))
            AS BIGINT) AS dup_gram_ratio_x10000
FROM documents d LEFT JOIN pd USING (doc_id)
""".format(norm=_NORM)

    # span-removal writer: marks = positions covered by NON-keeper
    # duplicated-gram occurrences (keeper = min slot, as in
    # paragraph_dedup); kept tokens rejoin in position order
    oracles['remove_dup_spans'] = r"""
WITH w AS (
  SELECT doc_id, CASE WHEN length(trim(lower(text))) = 0
                      THEN []::VARCHAR[]
                      ELSE string_split({norm}, ' ') END AS wa
  FROM documents),
occ AS (
  SELECT doc_id, i,
         array_to_string(list_slice(wa, i, i + 7), ' ') AS gram,
         doc_id * 1048576 + i AS slot
  FROM (SELECT doc_id, wa, unnest(generate_series(1, len(wa) - 7)) AS i
        FROM w WHERE len(wa) >= 8)),
cnt AS (SELECT gram, count(*) AS n, min(slot) AS keeper
        FROM occ GROUP BY gram),
marks AS (
  SELECT DISTINCT doc_id, p
  FROM (SELECT o.doc_id, unnest(generate_series(o.i, o.i + 7)) AS p
        FROM occ o JOIN cnt c USING (gram)
        WHERE c.n > 1 AND o.slot != c.keeper)),
toks AS (
  SELECT doc_id, i, wa[i] AS tok
  FROM (SELECT doc_id, wa, unnest(generate_series(1, len(wa))) AS i
        FROM w)),
kept AS (
  SELECT t.doc_id, t.i, t.tok
  FROM toks t LEFT JOIN marks m ON m.doc_id = t.doc_id AND m.p = t.i
  WHERE m.p IS NULL),
pd AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(len(wa) AS BIGINT) AS n_tokens FROM w)
SELECT t.doc_id,
       coalesce(pd.clean_text, '') AS clean_text,
       t.n_tokens,
       t.n_tokens - coalesce(pd.n_kept, 0) AS n_removed
FROM tot t LEFT JOIN pd USING (doc_id)
""".format(norm=_NORM)

    # rare-token ratio: corpus DOCUMENT frequency (distinct doc per
    # token) joined back to the full occurrence stream
    oracles['rare_tokens'] = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS wa
  FROM documents WHERE length(trim(lower(text))) > 0),
occ AS (SELECT doc_id, unnest(wa) AS tok FROM w),
dfreq AS (
  SELECT tok, count(*) AS df
  FROM (SELECT DISTINCT doc_id, tok
        FROM (SELECT doc_id, unnest(wa) AS tok FROM w))
  GROUP BY tok),
pd AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rare
  FROM occ JOIN dfreq USING (tok) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(pd.n_tokens, 0) AS n_tokens,
       coalesce(pd.n_rare, 0) AS n_rare,
       CAST(floor(10000.0 * coalesce(pd.n_rare, 0)
                  / greatest(coalesce(pd.n_tokens, 0), 1))
            AS BIGINT) AS rare_ratio_x10000
FROM documents d LEFT JOIN pd USING (doc_id)
"""

    # paragraph dedup: the keeper election replays the integer slot
    # min over the SAME normalized-line (hash, text) key; string_agg
    # skips the NULL (dropped) lines and reassembles in pos order
    oracles['paragraph_dedup'] = r"""
WITH la AS (
  SELECT doc_id, string_split(text, chr(10)) AS arr FROM documents),
occ AS (
  SELECT doc_id, i - 1 AS pos, arr[i] AS line,
         regexp_replace(trim(lower(arr[i])), '\s+', ' ', 'g')
           AS keynorm,
         doc_id * 1048576 + (i - 1) AS slot
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
        FROM la)
  WHERE length(trim(arr[i])) > 0),
keep AS (
  SELECT ('0x' || substr(md5(keynorm), 1, 15))::int64 AS kh, keynorm,
         min(slot) AS keeper
  FROM occ GROUP BY 1, 2),
fl AS (
  SELECT o.doc_id, o.pos, o.line,
         CASE WHEN o.slot = k.keeper THEN 1 ELSE 0 END AS kept
  FROM occ o JOIN keep k
    ON ('0x' || substr(md5(o.keynorm), 1, 15))::int64 = k.kh
   AND o.keynorm = k.keynorm),
pd AS (
  SELECT doc_id,
         string_agg(CASE WHEN kept = 1 THEN line END, chr(10)
                    ORDER BY pos) AS clean_text,
         CAST(sum(kept) AS BIGINT) AS n_kept,
         CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped
  FROM fl GROUP BY doc_id)
SELECT d.doc_id, coalesce(pd.clean_text, '') AS clean_text,
       coalesce(pd.n_kept, 0) AS n_kept,
       coalesce(pd.n_dropped, 0) AS n_dropped
FROM documents d LEFT JOIN pd USING (doc_id)
"""

    oracles['ann_ivf_topk'] = """
WITH {km},
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY floor(10000.0 * list_cosine_similarity(
                 e.embedding, c.centv)) DESC, c.centroid_id ASC) AS r
    FROM embeddings e CROSS JOIN cent c)
  WHERE r = 1),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY floor(10000.0 * list_cosine_similarity(
                 q.embedding, c.centv)) DESC, c.centroid_id ASC) AS r
    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 10)
  WHERE r <= 4),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         CAST(floor(10000.0 * list_cosine_similarity(
             p.qv, a.embedding)) AS BIGINT) AS cos_x10000
  FROM probes p JOIN assigned a USING (centroid_id)
  WHERE p.query_id != a.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY cos_x10000 DESC, neighbor_id ASC) AS rank
  FROM cand)
SELECT query_id, neighbor_id,
       CAST(rank AS INT) AS rank,  -- Spark row_number() is INT
       cos_x10000
FROM ranked WHERE rank <= 5
""".format(km=kmeans_ctes)

    # cross-table IVF retrieval: the codebook is built over the
    # CORPUS half only (query_topk's _centroids_rows(corpus, ...));
    # candidate pairs are (query probe cell) x (corpus cell) joins —
    # the oracle has no separate IN-filter because the USING join is
    # semantically identical (the Spark-side literal filter is a plan
    # optimization, asserted in test_scale_guards, not a semantics
    # change)
    oracles['ann_query_ivf_topk'] = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
{km},
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY floor(10000.0 * list_cosine_similarity(
                 e.embedding, c.centv)) DESC, c.centroid_id ASC) AS r
    FROM corpus e CROSS JOIN cent c)
  WHERE r = 1),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.vec_id AS query_id, q.embedding AS qv, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY floor(10000.0 * list_cosine_similarity(
                 q.embedding, c.centv)) DESC, c.centroid_id ASC) AS r
    FROM embeddings q CROSS JOIN cent c
    WHERE q.vec_id % 2 = 1 AND q.vec_id < 20)
  WHERE r <= 4),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         CAST(floor(10000.0 * list_cosine_similarity(
             p.qv, a.embedding)) AS BIGINT) AS cos_x10000
  FROM probes p JOIN assigned a USING (centroid_id)),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY cos_x10000 DESC, neighbor_id ASC) AS rank
  FROM cand)
SELECT query_id, neighbor_id,
       CAST(rank AS INT) AS rank,  -- Spark row_number() is INT
       cos_x10000
FROM ranked WHERE rank <= 5
""".format(km=_kmeans_sql.format(src='corpus'))

    # materialized-index retrieval is row-identical to the inline
    # probe-filtered path by construction (same deterministic
    # codebook; asserted in test_scale_guards) — shared oracle
    oracles['ann_query_indexed'] = oracles['ann_query_ivf_topk']

    oracles['lang_id'] = """
SELECT doc_id,
  CASE
    WHEN 10000 * length(regexp_replace(lower(text), '[^а-яё]', '', 'g'))
         / greatest(length(text), 1) > 300 THEN 'ru'
    WHEN 10000 * length(regexp_replace(text, '[^一-鿿]', '', 'g'))
         / greatest(length(text), 1) > 300 THEN 'zh'
    WHEN len(list_intersect(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             [{stops}])) >= 1 THEN 'en'
    ELSE 'und'
  END AS detected_lang
FROM documents
""".format(stops=stop_list)

    oracles['quality_scores'] = """
WITH base AS (
  SELECT doc_id,
         {qb},
         len(list_filter(
             regexp_split_to_array(trim(lower(text)), '\\s+'),
             w -> w IN ({stops}))) AS stop_hits
  FROM documents)
SELECT doc_id,
  CAST(n_chars_txt AS INT) AS n_chars_txt,  -- Spark length() is INT
  CAST(n_words AS INT) AS n_words,
  CAST(floor(100.0 * alpha_len / greatest(n_words, 1)) AS BIGINT)
    AS mean_word_len_x100,
  CAST(floor(10000.0 * punct / greatest(n_chars_txt, 1)) AS BIGINT)
    AS punct_ratio_x10000,
  CAST(floor(10000.0 * stop_hits / greatest(n_words, 1)) AS BIGINT)
    AS stop_ratio_x10000,
  CASE WHEN {qk}
       THEN 1 ELSE 0 END AS keep
FROM base
""".format(qb=_Q_BASE_COLS, qk=_Q_KEEP_PRED, stops=stop_list)

    # Gopher repetition filters: the Spark side computes everything
    # in-array per document (sorted run-length scans); the oracle is
    # the orthodox relational formulation — same math, independent
    # plumbing.  Multiplication-before-division order matches the
    # Spark expressions exactly so the float64 floors agree.
    oracles['repetition_scores'] = """
WITH """ + _repetition_sql('documents') + """
SELECT doc_id, dup_line_ratio_x10000, dup_line_char_ratio_x10000,
       top_2gram_char_ratio_x10000,
       CAST(CASE WHEN """ + _REP_FLAG_PRED + """
                 THEN 1 ELSE 0 END AS INT) AS repetitive
FROM rep_scored
"""

    # filter_corpus composes the SAME fragments the stage oracles use
    # (quality keep, repetition flag, PII regexps) — like
    # training_batches, the composition can never diverge from its
    # stages' gated definitions
    from yargy_spark.operators.textstats import (
        EMAIL_PATTERN, PHONE_ANCHORED_PATTERN, PHONE_GROUPED_PATTERN)
    filter_values = ',\n    '.join(
        "(%d, '%s')" % (i, t.replace("'", "''")) for i, t in
        FILTER_ROWS)
    oracles['filter_corpus'] = ("""
WITH fbase AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    """ + filter_values + """) AS v(doc_id, text)),
""" + _repetition_sql('fbase') + """,
qkeep AS (
  SELECT doc_id FROM (
    SELECT doc_id, """ + _Q_BASE_COLS + """
    FROM fbase)
  WHERE """ + _Q_KEEP_PRED + """),
surv AS (
  SELECT b.doc_id, b.text FROM fbase b
  JOIN qkeep USING (doc_id)
  JOIN rep_scored r USING (doc_id)
  WHERE NOT (""" + _REP_FLAG_PRED.replace(
        'n_words', 'r.n_words').replace(
        'dup_line_ratio', 'r.dup_line_ratio').replace(
        'dup_line_char_ratio', 'r.dup_line_char_ratio').replace(
        'top_2gram_char_ratio', 'r.top_2gram_char_ratio') + """)),
e AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '%(em)s')) AS INT)
           AS n_emails,
         regexp_replace(text, '%(em)s', '<EMAIL>', 'g') AS t1
  FROM surv),
p1 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '%(pa)s')) AS INT) AS n_a,
         regexp_replace(t1, '%(pa)s', '<PHONE>', 'g') AS t2
  FROM e)
SELECT doc_id, n_emails,
       CAST(n_a + len(regexp_extract_all(t2, '%(pg)s')) AS INT)
         AS n_phones,
       regexp_replace(t2, '%(pg)s', '<PHONE>', 'g') AS clean_text
FROM p1
""") % {'em': EMAIL_PATTERN,
        'pa': PHONE_ANCHORED_PATTERN, 'pg': PHONE_GROUPED_PATTERN}

    pii_values = ',\n    '.join(
        "(%d, '%s')" % (i, t.replace("'", "''")) for i, t in PII_ROWS)
    # DuckDB regexp_replace is first-match-only without the 'g' flag;
    # Spark's is global by default — flag required for parity.  The
    # two phone passes mirror pii_scrub: anchored (+ / parenthesis)
    # shapes first, then hyphen-grouped / bare-run shapes.
    oracles['pii_scrub'] = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    %(rows)s) AS v(doc_id, text)),
e AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '%(em)s')) AS INT)
           AS n_emails,
         regexp_replace(text, '%(em)s', '<EMAIL>', 'g') AS t1
  FROM base),
p1 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '%(pa)s')) AS INT) AS n_a,
         regexp_replace(t1, '%(pa)s', '<PHONE>', 'g') AS t2
  FROM e)
SELECT doc_id, n_emails,
       CAST(n_a + len(regexp_extract_all(t2, '%(pg)s')) AS INT)
         AS n_phones,
       regexp_replace(t2, '%(pg)s', '<PHONE>', 'g') AS clean_text
FROM p1
""" % {'rows': pii_values, 'em': EMAIL_PATTERN,
       'pa': PHONE_ANCHORED_PATTERN, 'pg': PHONE_GROUPED_PATTERN}

    oracles['corpus_vocabulary'] = """
SELECT DISTINCT
  unnest(regexp_extract_all(lower(text), '[а-яёa-z]+')) AS word
FROM documents
"""

    oracles['token_counts'] = """
SELECT doc_id,
  -- empty/whitespace-only text counts 0 tokens (split('') is [''])
  {ws} AS ws_tokens,  -- Spark size() is INT
  CAST(len(regexp_extract_all(lower(text), '{pat}')) AS INT)
    AS re_tokens
FROM documents
""".format(pat=TOKEN_PATTERN, ws=_WS_TOKENS)

    oracles['top_ngrams'] = """
WITH norm AS (SELECT doc_id, string_split({norm}, ' ') AS w
              FROM documents),
grams AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS ngram
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        FROM norm WHERE len(w) >= 2)),
counts AS (SELECT ngram, count(*) AS df FROM grams GROUP BY ngram),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY df DESC, ngram ASC) AS rank
  FROM counts)
SELECT CAST(rank AS INT) AS rank,  -- Spark row_number() is INT
       ngram, df
FROM ranked WHERE rank <= 20
""".format(norm=_NORM)

    oracles['doc_fingerprints'] = """
WITH {sh},
hashed AS (SELECT DISTINCT doc_id, {h} AS fp_hash FROM shingles),
ranked AS (
  SELECT doc_id, fp_hash, row_number() OVER (
      PARTITION BY doc_id ORDER BY fp_hash ASC) AS fp_rank
  FROM hashed)
SELECT doc_id,
       CAST(fp_rank AS INT) AS fp_rank,  -- Spark row_number() is INT
       fp_hash
FROM ranked WHERE fp_rank <= 4
""".format(sh=_SHINGLES, h=_H60.format(x='shingle'))

    # decode-path oracle: regenerates every raster byte from the same
    # doc_id arithmetic as synth_ppm_media and aggregates — the Spark
    # side instead round-trips real P6 bytes through decode_image, so
    # agreement proves the encoder+decoder pair, not shared code
    oracles['multimodal_decode'] = """
WITH dims AS (
  SELECT doc_id, CAST(doc_id % 8 + 4 AS INT) AS width,
         CAST(doc_id % 6 + 4 AS INT) AS height
  FROM documents),
bytes AS (
  SELECT doc_id, width, height,
         unnest(generate_series(0, 3 * width * height - 1)) AS j
  FROM dims)
SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
       CAST(3 * width * height AS INT) AS n_bytes,
       CAST(sum(((doc_id % 256) * 7 + j * 13) % 256)
            AS BIGINT) AS byte_sum,
       CAST(sum(((doc_id % 256) * 7 + j * 13) % 256) * 100
            // (3 * width * height) AS BIGINT) AS byte_mean_x100
FROM bytes GROUP BY doc_id, width, height
"""

    # PNG variant: same generating arithmetic with channels =
    # doc_id%4+1 — the oracle never runs a codec; if the Spark side's
    # zlib/unfilter path misreads one byte, byte_sum diverges.
    # doc_id%7==3 docs are PALETTE (color type 3) PNGs: the stream is
    # 256-range indices into palette entry i = ((i*3+1)%256,
    # (i*5+2)%256, (i*7+3)%256); odd ids carry a 128-entry tRNS
    # (alpha i = (i*11+4)%256, the rest opaque 255) so decoded
    # channels = 4 — the oracle replays the PLTE lookup in SQL
    oracles['multimodal_png'] = """
WITH dims AS (
  SELECT doc_id, CAST(doc_id % 8 + 4 AS INT) AS width,
         CAST(doc_id % 6 + 4 AS INT) AS height,
         CAST(CASE WHEN doc_id % 7 = 3 THEN
                CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END
              ELSE doc_id % 4 + 1 END AS INT) AS channels,
         (doc_id % 7 = 3) AS pal
  FROM documents),
px AS (
  SELECT doc_id, width, height, channels, pal,
         unnest(generate_series(0, CASE WHEN pal
                  THEN width * height
                  ELSE channels * width * height END - 1)) AS j
  FROM dims),
vals AS (
  SELECT doc_id, width, height, channels,
         CASE WHEN pal THEN
              (idx * 3 + 1) % 256 + (idx * 5 + 2) % 256
              + (idx * 7 + 3) % 256
              + CASE WHEN channels = 4 THEN
                  CASE WHEN idx < 128 THEN (idx * 11 + 4) % 256
                       ELSE 255 END
                ELSE 0 END
         ELSE idx END AS v
  FROM (SELECT *, ((doc_id % 256) * 7 + j * 13) % 256 AS idx FROM px))
SELECT doc_id, width, height, channels,
       CAST(channels * width * height AS INT) AS n_bytes,
       CAST(sum(v) AS BIGINT) AS byte_sum,
       CAST(sum(v) * 100 // (channels * width * height)
            AS BIGINT) AS byte_mean_x100
FROM vals GROUP BY doc_id, width, height, channels
"""

    # JPEG variant (lossless witness): each image is bw x bh
    # 8x8-constant blocks, block j's value v = 32 + 2*(((doc_id%256)
    # *7 + j*13) % 96) — even, so DC quantization (step 16) is exact
    # and the decoded raster is bit-identical to the generator.  The
    # oracle sums 64*v per block in SQL; the Spark side round-trips
    # real Huffman-coded SOF0 bytes through jpeg.decode_jpeg
    oracles['multimodal_jpeg'] = """
WITH dims AS (
  SELECT doc_id, CAST(doc_id % 3 + 1 AS INT) AS bw,
         CAST(doc_id % 2 + 1 AS INT) AS bh
  FROM documents),
blocks AS (
  SELECT doc_id, bw, bh,
         unnest(generate_series(0, bw * bh - 1)) AS j
  FROM dims),
vals AS (
  SELECT doc_id, bw, bh,
         32 + 2 * (((doc_id % 256) * 7 + j * 13) % 96) AS v
  FROM blocks)
SELECT doc_id, CAST(8 * bw AS INT) AS width,
       CAST(8 * bh AS INT) AS height,
       CAST(1 AS INT) AS channels,
       CAST(64 * bw * bh AS INT) AS n_bytes,
       CAST(64 * sum(v) AS BIGINT) AS byte_sum,
       CAST(64 * sum(v) * 100 // (64 * bw * bh)
            AS BIGINT) AS byte_mean_x100
FROM vals GROUP BY doc_id, bw, bh
"""

    # WAV variant (PCM is lossless): interleaved sample k =
    # ((doc_id%256)*31 + k*17) % 4096 - 2048 over n_frames*channels;
    # the oracle sums |sample| in SQL, the Spark side round-trips
    # real RIFF/WAVE bytes through decode_wav
    oracles['multimodal_wav'] = """
WITH dims AS (
  SELECT doc_id, CAST(doc_id % 50 + 20 AS INT) AS n_frames,
         CAST(doc_id % 2 + 1 AS INT) AS channels,
         CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate
  FROM documents),
samples AS (
  SELECT doc_id, n_frames, channels, sample_rate,
         unnest(generate_series(0, n_frames * channels - 1)) AS k
  FROM dims)
SELECT doc_id, n_frames, channels, sample_rate,
       CAST(sum(abs(((doc_id % 256) * 31 + k * 17) % 4096 - 2048))
            AS BIGINT) AS amp_sum,
       CAST(sum(abs(((doc_id % 256) * 31 + k * 17) % 4096 - 2048))
            * 100 // (n_frames * channels)
            AS BIGINT) AS amp_mean_x100
FROM samples GROUP BY doc_id, n_frames, channels, sample_rate
"""

    # y4m variant (raw planar video is lossless): frame f byte j =
    # ((doc_id%256)*7 + f*29 + j*13) % 256; the gate samples every
    # 2nd frame, so the oracle filters f % 2 = 0 and replays each
    # sampled frame's byte sum in SQL
    oracles['multimodal_frames'] = """
WITH dims AS (
  SELECT doc_id, CAST(doc_id % 8 + 4 AS INT) AS width,
         CAST(doc_id % 6 + 4 AS INT) AS height,
         CAST(doc_id % 6 + 2 AS INT) AS n_frames
  FROM documents),
sampled AS (
  SELECT doc_id, width, height, n_frames,
         unnest(generate_series(0, n_frames - 1)) AS f
  FROM dims),
px AS (
  SELECT doc_id, width, height, n_frames, f,
         unnest(generate_series(0, width * height - 1)) AS j
  FROM sampled WHERE f % 2 = 0)
SELECT doc_id, CAST(f AS INT) AS frame_idx, width, height, n_frames,
       CAST(sum(((doc_id % 256) * 7 + f * 29 + j * 13) % 256)
            AS BIGINT) AS byte_sum,
       CAST(sum(((doc_id % 256) * 7 + f * 29 + j * 13) % 256) * 100
            // (width * height) AS BIGINT) AS byte_mean_x100
FROM px GROUP BY doc_id, f, width, height, n_frames
"""

    oracles['multimodal_meta'] = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
  CAST(doc_id % 64 + 16 AS INT) AS width,
  CAST(doc_id % 48 + 16 AS INT) AS height,
  CAST(length(repeat(md5(text), 4)) / 2 AS INT) AS n_bytes
FROM documents
"""

    # deterministic sampling / splits (operators/sampling.py): the
    # salted 60-bit md5 bucket replays exactly — no rand() anywhere
    # (_KS/_B defined above, before the training_batches composition)
    oracles['doc_splits'] = """
SELECT doc_id,
  CASE WHEN b < 9800 THEN 'train'
       WHEN b < 9900 THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT doc_id, {b} AS b FROM documents)
""".format(b=_B.format(salt='split'))

    oracles['lang_balanced_sample'] = """
SELECT doc_id, lang
FROM (SELECT doc_id, lang, {b} AS b FROM documents)
WHERE b < CASE WHEN lang = 'en' THEN 3500 ELSE 10000 END
""".format(b=_B.format(salt='sample'))

    oracles['source_reservoir'] = """
SELECT source, doc_id
FROM (SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY {h}, doc_id) AS r
      FROM documents)
WHERE r <= 5
""".format(h="('0x' || substr(md5('reservoir|' || " + _KS +
             "), 1, 15))::int64")

    # eval-set decontamination (operators/dedup.py::decontaminate):
    # the hash join replays on the same 60-bit shingle hash both
    # engines compute; count(*) is BIGINT in both
    # ONE shingle-hash CTE for both sides (the Spark twin routes
    # train and eval through the same word_shingles); the % 97 split
    # applies as join-time filters
    oracles['decontam_pairs'] = """
WITH norm AS (SELECT doc_id, string_split({norm}, ' ') AS w
              FROM documents),
sh AS (
  SELECT DISTINCT doc_id, {h} AS hsh
  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
        FROM norm WHERE len(w) >= 3))
SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_hits
FROM sh t JOIN sh e USING (hsh)
WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
GROUP BY t.doc_id, e.doc_id
HAVING count(*) >= 2
""".format(norm=_NORM,
           h=_H60.format(x="w[i] || ' ' || w[i+1] || ' ' || w[i+2]"))

    # token-budget mixture (operators/sampling.py::mixture_sample):
    # integer targets (weight_bp * budget DIV 10000 precomputed:
    # en 3000 / zh 1800 / de 1200 of 6000) and integer keep
    # thresholds replay exactly; sum(INT) is HUGEINT -> cast
    oracles['mixture_sample'] = """
WITH toks AS (
  SELECT doc_id, lang, {ws} AS n_tokens
  FROM documents),
tot AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tot
        FROM toks GROUP BY lang),
kf AS (
  SELECT lang,
    CASE WHEN tot <= 0 THEN 0
         ELSE LEAST(10000,
                    CAST(CASE lang WHEN 'de' THEN 1200
                                   WHEN 'en' THEN 3000
                                   WHEN 'zh' THEN 1800 END
                         AS BIGINT) * 10000 // tot) END AS keep_bp
  FROM tot WHERE lang IN ('de', 'en', 'zh'))
SELECT doc_id, lang, n_tokens
FROM toks JOIN kf USING (lang)
WHERE {b} < keep_bp
""".format(b=_B.format(salt='mixture'), ws=_WS_TOKENS)

    # the same mixture budgeted in regex (BPE-ish) tokens — only the
    # counter fragment differs from oracles['mixture_sample']
    _RE_TOKENS = ("CAST(len(regexp_extract_all(lower(text), '%s')) "
                  "AS INT)" % TOKEN_PATTERN)
    oracles['mixture_re_tokens'] = """
WITH toks AS (
  SELECT doc_id, lang, {re} AS n_tokens
  FROM documents),
tot AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tot
        FROM toks GROUP BY lang),
kf AS (
  SELECT lang,
    CASE WHEN tot <= 0 THEN 0
         ELSE LEAST(10000,
                    CAST(CASE lang WHEN 'de' THEN 1200
                                   WHEN 'en' THEN 3000
                                   WHEN 'zh' THEN 1800 END
                         AS BIGINT) * 10000 // tot) END AS keep_bp
  FROM tot WHERE lang IN ('de', 'en', 'zh'))
SELECT doc_id, lang, n_tokens
FROM toks JOIN kf USING (lang)
WHERE {b} < keep_bp
""".format(b=_B.format(salt='mixture'), re=_RE_TOKENS)

    # upsampling mixture (sampling.py::mixture_epochs): whole epochs
    # = tgt DIV tot, partial epoch by the SAME mixture bucket;
    # unnest(generate_series(0, nc-1)) is empty when nc = 0, exactly
    # Spark's guarded sequence explode
    oracles['mixture_epochs'] = """
WITH toks AS (
  SELECT doc_id, lang, {ws} AS n_tokens FROM documents),
tot AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS tot
        FROM toks GROUP BY lang),
kf AS (
  SELECT lang,
    CASE WHEN tot <= 0 THEN 0 ELSE tgt // tot END AS n_full,
    CASE WHEN tot <= 0 THEN 0
         ELSE LEAST(10000,
                    (tgt - (tgt // tot) * tot) * 10000 // tot)
    END AS rem_bp
  FROM (SELECT lang, tot,
          CAST(CASE lang WHEN 'de' THEN 18000
                         WHEN 'en' THEN 2000 END AS BIGINT) AS tgt
        FROM tot WHERE lang IN ('de', 'en')))
SELECT doc_id, lang, n_tokens,
       CAST(unnest(generate_series(0, CAST(nc AS BIGINT) - 1))
            AS INT) AS epoch
FROM (
  SELECT t.doc_id, t.lang, t.n_tokens,
         kf.n_full + CASE WHEN {b} < kf.rem_bp THEN 1 ELSE 0 END AS nc
  FROM toks t JOIN kf USING (lang))
""".format(ws=_WS_TOKENS, b=_B.format(salt='mixture'))

    # concat-and-chunk packing (operators/packing.py): the token
    # count is the token_counts ws expression, the order is the
    # salted md5 draw, the cumsum window replays row-for-row.
    # sum(INT) is HUGEINT in DuckDB -> cast the running sum back.
    oracles['pack_sequences'] = """
WITH toks AS (
  SELECT doc_id, {ws} AS n_tokens,
    CAST(('0x' || substr(md5('packb|' || {ks}), 1, 15))::int64 % 8
         AS INT) AS bucket,
    ('0x' || substr(md5('pack|' || {ks}), 1, 15))::int64 AS draw
  FROM documents),
packed AS (
  SELECT doc_id, bucket, n_tokens,
    CAST(sum(n_tokens) OVER (
      PARTITION BY bucket ORDER BY draw ASC, doc_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fin
  FROM toks WHERE n_tokens > 0)
SELECT doc_id, bucket,
       CAST(fin - n_tokens AS BIGINT) AS start_tok,
       n_tokens,
       CAST((fin - n_tokens) // 512 AS BIGINT) AS seq_first,
       CAST((fin - 1) // 512 AS BIGINT) AS seq_last
FROM packed
""".format(ks=_KS, ws=_WS_TOKENS)

    # the packing WRITER: re-derive the layout, then slice each
    # document's token array per sequence and assemble in stream
    # order.  DuckDB list slicing is 1-based inclusive-inclusive, so
    # [from0+1 : to0] mirrors Spark's slice(arr, from0+1, to0-from0).
    oracles['materialize_sequences'] = """
WITH toks AS (
  SELECT doc_id, {ws} AS n_tokens,
    CAST(('0x' || substr(md5('packb|' || {ks}), 1, 15))::int64 % 8
         AS INT) AS bucket,
    ('0x' || substr(md5('pack|' || {ks}), 1, 15))::int64 AS draw
  FROM documents),
packed AS (
  SELECT doc_id, bucket, n_tokens,
    CAST(sum(n_tokens) OVER (
      PARTITION BY bucket ORDER BY draw ASC, doc_id ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fin
  FROM toks WHERE n_tokens > 0),
layout AS (
  SELECT doc_id, bucket, fin - n_tokens AS start_tok, n_tokens,
         (fin - n_tokens) // 512 AS seq_first,
         (fin - 1) // 512 AS seq_last
  FROM packed),
arrs AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS tarr
  FROM documents),
ex AS (
  SELECT l.bucket, l.start_tok, l.n_tokens, a.tarr,
         unnest(generate_series(l.seq_first, l.seq_last)) AS seq_id
  FROM layout l JOIN arrs a USING (doc_id)),
parts AS (
  SELECT bucket, seq_id, start_tok,
         tarr[CAST(GREATEST(seq_id * 512, start_tok)
                   - start_tok + 1 AS BIGINT)
              : CAST(LEAST((seq_id + 1) * 512, start_tok + n_tokens)
                     - start_tok AS BIGINT)] AS part
  FROM ex)
SELECT bucket, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(len(flatten(list(part ORDER BY start_tok)))
            AS INT) AS n_tokens,
       array_to_string(flatten(list(part ORDER BY start_tok)), ' ')
         AS seq_text
FROM parts GROUP BY bucket, seq_id
""".format(ks=_KS, ws=_WS_TOKENS)

    oracles['pricing_summary'] = """
SELECT l_returnflag, l_linestatus,
       -- integer hundredths: floor(x*100) is IEEE-identical across
       -- engines; sum(BIGINT) is HUGEINT in DuckDB -> cast back
       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT))
            AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
            AS BIGINT) AS sum_price,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

    oracles['top_customers'] = """
WITH per AS (
  SELECT o_custkey, count(*) AS n_orders,
         -- integer cents (see pricing_summary note)
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS total_spent
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT c.c_mktsegment, c.c_custkey, p.n_orders, p.total_spent,
         row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY p.n_orders DESC, p.total_spent DESC,
                    c.c_custkey ASC) AS rnk
  FROM per p JOIN customer c ON p.o_custkey = c.c_custkey)
SELECT c_mktsegment, c_custkey, n_orders, total_spent,
       -- CAST: DuckDB row_number() is BIGINT; Spark's is INT
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
"""

    oracles['idle_customers'] = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""

    oracles['orders_rollup'] = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

    oracles['event_sessions'] = """
WITH marked AS (
  -- floor to whole seconds like Spark's unix_timestamp: fractional
  -- epoch would flip sessions at the +/-1s gap boundary
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT)
                   - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT)
                   > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       -- CAST: DuckDB sum(INT) widens to HUGEINT; Spark emits LONG
       CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM marked GROUP BY user_id
"""

    # the governor's loud counter (dedup.lsh_hot_buckets): band
    # buckets whose rep population exceeds the cap, recomputed
    # through the SAME dedup-first/shingle/banding CTEs the pair
    # oracle uses (bstats comes from _MINHASH_CANDS verbatim)
    hot_sql = """
WITH {df},
  {sh},
  {mc}
SELECT CAST(count(*) AS BIGINT) AS value
FROM bstats WHERE bn > {cap}
""".format(df=_DEDUP_FIRST, sh=_SHINGLES_REPS, mc=minhash_cands,
           cap=LSH_MAX_BUCKET)

    # dedup observability report: each metric recomputes through the
    # SAME oracle the family query gates on (nested as subqueries),
    # so the report can never disagree with its constituent gates
    oracles['dedup_report'] = """
SELECT 'exact_dup_groups' AS metric, CAST(count(*) AS BIGINT) AS value
FROM ({exact}) WHERE group_size > 1
UNION ALL
SELECT 'exact_surplus_docs',
       CAST(coalesce(sum(group_size - 1), 0) AS BIGINT)
FROM ({exact}) WHERE group_size > 1
UNION ALL
SELECT 'lsh_dup_pairs', CAST(count(*) AS BIGINT) FROM ({mh})
UNION ALL
SELECT 'lsh_hot_buckets', value FROM ({hot})
UNION ALL
SELECT 'dup_paragraph_occurrences',
       CAST(coalesce(sum(n_dropped), 0) AS BIGINT) FROM ({para})
UNION ALL
SELECT 'dup_span_grams',
       CAST(coalesce(sum(n_dup_grams), 0) AS BIGINT) FROM ({spans})
""".format(exact=oracles['exact_dedup'],
           mh=oracles['minhash_lsh_dups'],
           hot=hot_sql,
           para=oracles['paragraph_dedup'],
           spans=oracles['dup_spans'])

    return oracles
