"""Incremental entity linking (operators/linking.py::
link_entities_incremental): new batches link against the compact
entity-key state without global CC; prior-entity merges are surfaced
as candidates, never applied silently."""

import pytest

from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


@pytest.fixture(scope='module')
def halves(spark):
    """Golden corpus split by conversation parity: batch-link the even
    half (the 'prior' corpus), treat the odd half as the increment."""
    from yargy_spark.operators.extract import extract_mentions
    from yargy_spark.operators.linking import (entity_key_table,
                                               link_entities)
    from yargy_spark.sources.transcripts import golden_only_transcripts
    t = golden_only_transcripts(spark)
    parity = (F.substring('conv_id', 2, 6).cast('int') % 2)
    prior_mentions = extract_mentions(t.where(parity == 0)).persist()
    new_mentions = extract_mentions(t.where(parity == 1)).persist()
    prior_links = link_entities(prior_mentions).persist()
    prior_keys = entity_key_table(prior_mentions, prior_links).persist()
    return prior_mentions, prior_links, prior_keys, new_mentions


def test_every_new_mention_assigned_once(spark, halves):
    from yargy_spark.operators.linking import link_entities_incremental
    _, _, prior_keys, new_mentions = halves
    links, _ = link_entities_incremental(new_mentions, prior_keys)
    links = links.persist()
    pm = new_mentions.where(F.col('norm_key').isNotNull())
    assert links.count() == pm.count()
    assert links.select('mention_id').distinct().count() == pm.count()
    links.unpersist()


def test_shared_key_adopts_prior_entity(spark, halves):
    """A norm_key seen in the prior corpus resolves every new mention
    to the prior entity id — the direct tier."""
    from yargy_spark.operators.linking import link_entities_incremental
    prior_mentions, prior_links, prior_keys, new_mentions = halves
    links, _ = link_entities_incremental(new_mentions, prior_keys)

    shared = (new_mentions.select('norm_key').distinct()
              .join(prior_keys.select('norm_key', 'entity_id'),
                    'norm_key'))
    rows = shared.collect()
    assert rows, 'fixture must have keys spanning both halves'
    got = {r['norm_key']: r['entity_id'] for r in
           (new_mentions.select('mention_id', 'norm_key')
            .join(links, 'mention_id')
            .join(shared.select('norm_key'), 'norm_key')
            .select('norm_key', 'entity_id').distinct().collect())}
    want = {r['norm_key']: r['entity_id'] for r in rows}
    assert got == want

    # fresh ids never collide with prior ids
    prior_ids = {r['entity_id'] for r in
                 prior_links.select('entity_id').distinct().collect()}
    new_only_ids = {r['entity_id'] for r in links.select('entity_id')
                    .distinct().collect()} - set(want.values())
    assert not (new_only_ids & prior_ids)


def test_residual_grouping_matches_batch(spark, halves):
    """Mentions whose components touch no prior entity cluster exactly
    as a standalone batch link of the increment clusters them (they
    keep their fresh batch component ids)."""
    from yargy_spark.operators.linking import (link_entities,
                                               link_entities_incremental)
    _, _, prior_keys, new_mentions = halves
    links, _ = link_entities_incremental(new_mentions, prior_keys)
    prior_ids = {r['entity_id'] for r in
                 prior_keys.select('entity_id').distinct().collect()}

    fresh = {r['mention_id']: r['entity_id'] for r in links.collect()
             if r['entity_id'] not in prior_ids}
    batch = {r['mention_id']: r['entity_id'] for r in
             link_entities(new_mentions).collect()}

    def groups(assign, keys):
        by = {}
        for m in keys:
            by.setdefault(assign[m], set()).add(m)
        return {frozenset(v) for v in by.values()}

    assert fresh, 'fixture must leave some keys unique to the increment'
    assert groups(fresh, fresh) <= groups(batch, batch)


def test_coref_adoption_and_merge_candidates(spark):
    """Synthetic shapes: an unmatched mention sharing the conversation
    coref key with a direct match adopts that entity (min per
    component); two prior entities bridged by one new conversation
    become merge candidates (and are NOT merged in the links output —
    each direct match keeps its own prior entity)."""
    from yargy_spark.operators.linking import link_entities_incremental
    prior_keys = spark.createDataFrame(
        [('анна|петров', 'ent_100', 'анна|петров'),
         ('борис|петров', 'ent_200', 'борис|петров')],
        'norm_key string, entity_id string, canonical string')
    new_mentions = spark.createDataFrame(
        [(1, 'cX', 'анна|петров'),     # direct -> ent_100
         (2, 'cX', 'вера|петров'),     # coref adopt -> min = ent_100
         (3, 'cX', 'борис|петров'),    # direct -> ent_200 (bridges!)
         (4, 'cY', 'глеб|сидоров')],   # residual -> fresh entity
        'mention_id long, conv_id string, norm_key string')

    links, merges = link_entities_incremental(new_mentions, prior_keys)
    got = {r['mention_id']: (r['entity_id'], r['canonical'])
           for r in links.collect()}
    assert got[1] == ('ent_100', 'анна|петров')
    assert got[2] == ('ent_100', 'анна|петров')  # adopted, min entity
    assert got[3] == ('ent_200', 'борис|петров')
    assert got[4][0] not in ('ent_100', 'ent_200')  # fresh id
    assert got[4][1] == 'глеб|сидоров'

    mc = merges.collect()
    assert [(r['entity_a'], r['entity_b'], r['conv_id'],
             r['last_lemma']) for r in mc] == \
        [('ent_100', 'ent_200', 'cX', 'петров')]


def test_chain_adoption_closes_over_components(spark):
    """Adoption is decided per increment component, so it closes over
    chains: a mention whose only connection to a direct match is
    same-norm_key with a coref NEIGHBOR of the match (different
    conversation, key unseen in the prior corpus) still adopts the
    prior entity — a per-neighbor tier scheme would split this pair
    across an adopted and a fresh entity."""
    from yargy_spark.operators.linking import link_entities_incremental
    prior_keys = spark.createDataFrame(
        [('анна|петров', 'ent_100', 'анна|петров')],
        'norm_key string, entity_id string, canonical string')
    new_mentions = spark.createDataFrame(
        [(1, 'cA', 'анна|петров'),    # direct -> ent_100
         (2, 'cA', 'мария|петров'),   # coref neighbor of the match
         (3, 'cB', 'мария|петров')],  # chain: same key as 2, other conv
        'mention_id long, conv_id string, norm_key string')
    links, merges = link_entities_incremental(new_mentions, prior_keys)
    got = {r['mention_id']: (r['entity_id'], r['canonical'])
           for r in links.collect()}
    assert got == {1: ('ent_100', 'анна|петров'),
                   2: ('ent_100', 'анна|петров'),
                   3: ('ent_100', 'анна|петров')}
    assert merges.count() == 0


def test_run_incremental_job(spark, tmp_path):
    """Job surface: the batch job commits the entity_keys state; the
    increment job links a disjoint continuation corpus against it,
    committing increment triples + the merge_candidates work-list,
    nooping on rerun, and refusing drift / a missing base."""
    import pytest as _pytest
    from yargy_spark.pipeline import run_incremental, run_resumable
    from yargy_spark.sources import manifest as mf
    from yargy_spark.sources.transcripts import synth_transcripts

    base_out = str(tmp_path / 'base')
    inc_out = str(tmp_path / 'inc')
    base = synth_transcripts(spark, n_turns=96, partitions=4)
    assert run_resumable(spark, base, base_out, n_buckets=4,
                         chunk_size=4) is not None

    # the batch job now also REPLACE-commits the entity-key state,
    # stamped with the mentions snapshot it derived from
    keys = mf.read_table(spark, base_out + '/entity_keys')
    base_ids = {r['entity_id'] for r in
                keys.select('entity_id').distinct().collect()}
    assert base_ids

    # increment = deterministic continuation, disjoint conversations
    inc = synth_transcripts(spark, n_turns=96, partitions=4,
                            start_turn=96)
    snap = run_incremental(spark, inc, base_out, inc_out, n_buckets=4)
    assert snap is not None
    assert snap['counters']['mentions'] > 0
    assert snap['counters']['base_keys_snapshot'] == \
        mf.current_snapshot(base_out + '/entity_keys')

    # the golden pool repeats across the continuation, so increment
    # triples must reuse base entity ids (adoption, not re-minting)
    inc_subjects = {r['subj'] for r in
                    mf.read_table(spark, inc_out + '/triples')
                    .select('subj').distinct().collect()}
    assert inc_subjects & base_ids
    assert mf.current_snapshot(inc_out + '/merge_candidates')

    # rerun: increment and base state both unchanged -> noop
    assert run_incremental(spark, inc, base_out, inc_out,
                           n_buckets=4) is None

    # drift guard and missing-base guard stay loud
    with _pytest.raises(ValueError, match='n_buckets'):
        run_incremental(spark, inc, base_out, inc_out, n_buckets=8)
    with _pytest.raises(ValueError, match='entity_keys'):
        run_incremental(spark, inc, str(tmp_path / 'nobase'),
                        str(tmp_path / 'inc2'), n_buckets=4)
    with _pytest.raises(ValueError, match='own table root'):
        run_incremental(spark, inc, base_out, base_out, n_buckets=4)

    # CHAINING: day 2 links against day 1's rolled entity_keys state
    # instead of the base — repeated keys adopt day-1 entity ids,
    # never re-mint them
    inc2_out = str(tmp_path / 'inc_day2')
    inc2 = synth_transcripts(spark, n_turns=96, partitions=4,
                             start_turn=192)
    snap2 = run_incremental(spark, inc2, inc_out, inc2_out,
                            n_buckets=4)
    assert snap2 is not None
    state1 = {r['entity_id'] for r in
              mf.read_table(spark, inc_out + '/entity_keys')
              .select('entity_id').distinct().collect()}
    assert state1 >= base_ids    # rolled forward, never dropped
    inc2_ents = {r['subj'] for r in
                 mf.read_table(spark, inc2_out + '/triples')
                 .select('subj').distinct().collect()
                 if r['subj'].startswith('ent_')}
    assert inc2_ents and inc2_ents <= state1


def test_empty_increment_and_empty_prior(spark):
    """Degenerate shapes: an empty increment yields empty outputs; an
    empty prior state degrades to plain batch linking."""
    from yargy_spark.operators.linking import (link_entities,
                                               link_entities_incremental)
    prior_keys = spark.createDataFrame(
        [], 'norm_key string, entity_id string, canonical string')
    new_mentions = spark.createDataFrame(
        [(1, 'cZ', 'иван|ульянов'), (2, 'cZ', 'пётр|ульянов')],
        'mention_id long, conv_id string, norm_key string')

    links, merges = link_entities_incremental(new_mentions, prior_keys)
    batch = link_entities(new_mentions)
    assert ({tuple(r) for r in links.collect()}
            == {tuple(r) for r in batch.collect()})
    assert merges.count() == 0

    empty = new_mentions.where(F.lit(False))
    links2, merges2 = link_entities_incremental(empty, prior_keys)
    assert links2.count() == 0 and merges2.count() == 0


def test_entity_degree(spark):
    """Degree centrality over co-occurrence edges: each undirected
    a<b edge contributes both endpoints once."""
    from yargy_spark.operators.linking import entity_degree
    edges = spark.createDataFrame(
        [('a', 'b', 2), ('a', 'c', 1), ('b', 'c', 3)],
        'a string, b string, n_groups long')
    got = {r['entity']: (r['n_neighbors'], r['degree_weight'])
           for r in entity_degree(edges).collect()}
    assert got == {'a': (2, 3), 'b': (2, 5), 'c': (2, 4)}


def test_merge_witness_shared_conversation(spark):
    """The pair witness is a conversation where BOTH prior entities
    have direct mentions whenever one exists — entity_a's own min
    conversation (the old scheme) can contain only entity_a."""
    from yargy_spark.operators.linking import link_entities_incremental
    prior_keys = spark.createDataFrame(
        [('анна|петров', 'ent_100', 'анна|петров'),
         ('борис|петров', 'ent_200', 'борис|петров')],
        'norm_key string, entity_id string, canonical string')
    new_mentions = spark.createDataFrame(
        [(1, 'c0', 'анна|петров'),    # a-only conversation (min!)
         (2, 'c2', 'анна|петров'),    # shared conversation
         (3, 'c2', 'борис|петров')],  # bridge via coref in c2
        'mention_id long, conv_id string, norm_key string')
    _links, merges = link_entities_incremental(new_mentions,
                                               prior_keys)
    assert [(r['entity_a'], r['entity_b'], r['conv_id'],
             r['last_lemma']) for r in merges.collect()] == \
        [('ent_100', 'ent_200', 'c2', 'петров')]


def test_merge_witness_no_shared_conversation(spark):
    """When the bridge runs through a cross-conversation coref chain
    (no conversation co-locates the pair), the witness falls back to
    the min of the two sides' own witness conversations."""
    from yargy_spark.operators.linking import link_entities_incremental
    prior_keys = spark.createDataFrame(
        [('анна|петров', 'ent_100', 'анна|петров'),
         ('борис|петров', 'ent_200', 'борис|петров')],
        'norm_key string, entity_id string, canonical string')
    new_mentions = spark.createDataFrame(
        [(1, 'c5', 'анна|петров'),    # direct a in c5
         (2, 'c5', 'мария|петров'),   # coref neighbor in c5
         (3, 'c2', 'мария|петров'),   # same key, other conversation
         (4, 'c2', 'борис|петров')],  # direct b in c2
        'mention_id long, conv_id string, norm_key string')
    _links, merges = link_entities_incremental(new_mentions,
                                               prior_keys)
    assert [(r['entity_a'], r['entity_b'], r['conv_id'])
            for r in merges.collect()] == [('ent_100', 'ent_200',
                                            'c2')]


def test_apply_entity_merges(spark):
    """CC over the candidate graph: chained pairs (possibly from
    different increments) collapse to ONE numeric-min survivor; the
    key state and triples rewrite; survivors keep their rows."""
    from yargy_spark.operators.linking import apply_entity_merges
    keys = spark.createDataFrame(
        [('анна|петров', 'ent_100', 'анна|петров'),
         ('аня|петров', 'ent_200', 'аня|петров'),
         ('анюта|петров', 'ent_300', 'анюта|петров'),
         ('иван|ульянов', 'ent_999', 'иван|ульянов'),
         ('ваня|ульянов', 'ent_1000', 'ваня|ульянов'),
         ('глеб|сидоров', 'ent_600', 'глеб|сидоров')],
        'norm_key string, entity_id string, canonical string')
    cands = spark.createDataFrame(
        # (100,200) day 1 + (200,300) day 4: chains -> ent_100;
        # (1000,999): string order says ent_1000 < ent_999 but the
        # survivor is NUMERIC min ent_999; duplicate pairs are fine
        [('ent_100', 'ent_200', 'c1', 'петров'),
         ('ent_200', 'ent_300', 'c2', 'петров'),
         ('ent_100', 'ent_200', 'c9', 'петров'),
         ('ent_1000', 'ent_999', 'c3', 'ульянов')],
        'entity_a string, entity_b string, conv_id string, '
        'last_lemma string')
    triples = spark.createDataFrame(
        [('ent_200', 'mentioned_as', 'Аня', 'c1'),
         ('ent_200', 'canonical_name', 'аня|петров', 'c1'),
         ('ent_100', 'mentioned_as', 'Анна', 'c0'),
         ('ent_600', 'mentioned_as', 'Глеб', 'c7'),
         ('fact_42', 'amount', '17', 'c8')],
        'subj string, pred string, obj string, conv_id string')

    mapping, new_keys, patch = apply_entity_merges(cands, keys,
                                                   triples)
    got_map = {r['entity_id']: (r['merged_id'], r['merged_canonical'])
               for r in mapping.collect()}
    assert got_map == {
        'ent_200': ('ent_100', 'анна|петров'),
        'ent_300': ('ent_100', 'анна|петров'),
        'ent_1000': ('ent_999', 'иван|ульянов')}

    got_keys = {r['norm_key']: (r['entity_id'], r['canonical'])
                for r in new_keys.collect()}
    assert got_keys == {
        'анна|петров': ('ent_100', 'анна|петров'),
        'аня|петров': ('ent_100', 'анна|петров'),
        'анюта|петров': ('ent_100', 'анна|петров'),
        'иван|ульянов': ('ent_999', 'иван|ульянов'),
        'ваня|ульянов': ('ent_999', 'иван|ульянов'),
        'глеб|сидоров': ('ent_600', 'глеб|сидоров')}

    # patch: retired subjects rewritten, canonical_name rows dropped,
    # survivor/fresh/unrelated rows untouched (not in the patch)
    assert {tuple(r) for r in patch.collect()} == {
        ('ent_100', 'mentioned_as', 'Аня', 'c1')}


def test_apply_entity_merges_empty(spark):
    """No candidates: nothing retired, state passes through."""
    from yargy_spark.operators.linking import apply_entity_merges
    keys = spark.createDataFrame(
        [('анна|петров', 'ent_100', 'анна|петров')],
        'norm_key string, entity_id string, canonical string')
    cands = spark.createDataFrame(
        [], 'entity_a string, entity_b string, conv_id string, '
            'last_lemma string')
    mapping, new_keys = apply_entity_merges(cands, keys)
    assert mapping.count() == 0
    assert [tuple(r) for r in new_keys.collect()] == \
        [('анна|петров', 'ent_100', 'анна|петров')]


def test_run_apply_merges_job(spark, tmp_path):
    """Job surface: resolve a committed merge work-list, commit the
    rewritten key state + audit mapping + triples patch, noop on
    rerun — and day 2 chains off the APPLY root, so retired ids can
    never be re-adopted."""
    import pytest as _pytest
    from yargy_spark.pipeline import (run_apply_merges,
                                      run_incremental, run_resumable)
    from yargy_spark.sources import manifest as mf
    from yargy_spark.sources.transcripts import synth_transcripts

    base_out = str(tmp_path / 'base')
    base = synth_transcripts(spark, n_turns=96, partitions=4)
    assert run_resumable(spark, base, base_out, n_buckets=4,
                         chunk_size=4) is not None

    # manufacture an increment root whose work-list pairs two REAL
    # base entities (the synthetic continuation corpus never bridges
    # prior entities, so the candidates are committed directly).
    # Pick entities whose keys RECUR in the day-2 corpus, so the
    # day-2 adoption assertions below cannot pass vacuously.
    from yargy_spark.operators.extract import extract_mentions
    day2 = synth_transcripts(spark, n_turns=96, partitions=4,
                             start_turn=96)
    day2_keys = (extract_mentions(day2)
                 .where(F.col('norm_key').isNotNull())
                 .select('norm_key').distinct())
    keys = mf.read_table(spark, base_out + '/entity_keys') \
        .select('norm_key', 'entity_id', 'canonical')
    recurring = sorted({r['entity_id'] for r in
                        keys.join(day2_keys, 'norm_key').collect()},
                       key=lambda e: int(e.split('_')[1]))
    assert len(recurring) >= 2, \
        'fixture must repeat >=2 base entities in the continuation'
    survivor, retired = recurring[:2]
    two = [survivor, retired]
    inc_out = str(tmp_path / 'inc')
    mf.commit_replace(mf.with_bucket(keys, 4, key='norm_key'),
                      inc_out + '/entity_keys', note='entity_keys',
                      n_buckets=4)
    cands = spark.createDataFrame(
        [(min(two), max(two), 'c0', 'x')],
        'entity_a string, entity_b string, conv_id string, '
        'last_lemma string')
    mf.commit_replace(mf.with_bucket(cands, 4, key='entity_a'),
                      inc_out + '/merge_candidates',
                      note='merge_candidates', n_buckets=4)

    apply_out = str(tmp_path / 'merged')
    snap = run_apply_merges(spark, inc_out, apply_out, n_buckets=4,
                            triples_roots=[base_out])
    assert snap is not None
    assert snap['counters']['retired_entities'] == 1

    state = mf.read_table(spark, apply_out + '/entity_keys')
    state_ids = {r['entity_id'] for r in
                 state.select('entity_id').distinct().collect()}
    assert retired not in state_ids and survivor in state_ids
    merges = {(r['entity_id'], r['merged_id']) for r in
              mf.read_table(spark, apply_out + '/entity_merges')
              .collect()}
    assert merges == {(retired, survivor)}
    patch = mf.read_table(spark, apply_out + '/triples_patch')
    assert patch.where(F.col('subj') == retired).count() == 0
    assert patch.where(F.col('subj') == survivor).count() > 0
    assert patch.where(F.col('pred') == 'canonical_name').count() == 0

    # rerun = noop while both upstream snapshots are unchanged
    assert run_apply_merges(spark, inc_out, apply_out, n_buckets=4,
                            triples_roots=[base_out]) is None

    # guards stay loud
    with _pytest.raises(ValueError, match='differ'):
        run_apply_merges(spark, inc_out, inc_out, n_buckets=4)
    with _pytest.raises(ValueError, match='merge_candidates'):
        run_apply_merges(spark, str(tmp_path / 'nowhere'),
                         str(tmp_path / 'm2'), n_buckets=4)
    with _pytest.raises(ValueError, match='n_buckets'):
        run_apply_merges(spark, inc_out, apply_out, n_buckets=8)

    # DAY 2 chains off the apply root: repeated keys adopt the
    # SURVIVOR (the retired id is gone from the state, so no new
    # mention can ever link to it)
    day2_out = str(tmp_path / 'day2')
    snap2 = run_incremental(spark, day2, apply_out, day2_out,
                            n_buckets=4)
    assert snap2 is not None
    day2_subjects = {r['subj'] for r in
                     mf.read_table(spark, day2_out + '/triples')
                     .select('subj').distinct().collect()}
    assert retired not in day2_subjects
    assert survivor in day2_subjects
