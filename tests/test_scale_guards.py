"""Scale-robustness guards: hot-key skew, poison turns, partition
pruning on the bucketed table layout, property-based invariants."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_hot_key_linking_is_linear(spark):
    """A hot entity (many mentions of one blocking key) must produce
    O(n) star edges, not O(n^2) pairs, and still link correctly."""
    from yargy_spark.operators.linking import link_entities, mention_edges
    n = 2000
    rows = [(i, 'c%05d' % (i % 50), 'иван|ульянов') for i in range(n)] \
        + [(n + i, 'c%05d' % i, 'саша|быков') for i in range(5)]
    m = spark.createDataFrame(
        rows, 'mention_id long, conv_id string, norm_key string')

    edges = mention_edges(m)
    # star topology: per-group edge count is group size - 1 per family
    assert edges.count() <= 2 * (n + 5)

    linked = link_entities(m)
    ents = {r['canonical']: r['entity_id'] for r in
            m.join(linked, 'mention_id').select('canonical',
                                                'entity_id').collect()}
    assert len(ents) == 2
    per_entity = (m.join(linked, 'mention_id')
                  .groupBy('entity_id').count().collect())
    assert sorted(r['count'] for r in per_entity) == [5, n]


def _ambiguous_rule():
    # A -> a | a a; B -> A+  (89 parses at 'a '*10, cookbook cell 4);
    # module-level so the compiled bank pickles into the broadcast
    from yargy_spark import rule, or_
    return or_(rule('a'), rule('a', 'a')).repeatable().named('AMB')


def test_poison_turn_budget(spark):
    """A combinatorially ambiguous turn trips the parse budget for the
    affected rule without killing the stage or other turns."""
    from yargy_spark.extractors import Extractor, CompiledBank
    from yargy_spark.operators.extract import (extract_mentions,
                                               make_extract_metrics)

    ext = Extractor('amb', 'Amb', _ambiguous_rule, cap=50)
    bank = CompiledBank(extractors={'amb': ext})

    turns = spark.createDataFrame(
        [('p0', 0, 'a ' * 30),          # blows the budget
         ('p1', 0, 'b b b')],           # unaffected
        'conv_id string, turn_idx int, text string')
    metrics = make_extract_metrics(spark)
    out = extract_mentions(turns, bank=bank, use_trigger=False,
                           metrics=metrics).collect()
    assert out == []                    # no partial garbage emitted
    assert metrics['budget_aborts'].value >= 1
    assert metrics['turns'].value == 2  # stage completed both turns


def test_extract_audit_per_turn(spark):
    """extract_audit: every input turn keeps a row (non-triggered
    included), the poison turn's budget abort is attributed to ITS
    row, and a kernel fault lands in n_errors — never in
    n_budget_aborts."""
    from yargy_spark.extractors import (EXTRACTORS, CompiledBank,
                                        Extractor)
    from yargy_spark.operators.extract import extract_audit
    from yargy_spark.testing import FaultyParser

    pool = dict(EXTRACTORS)
    pool['amb'] = Extractor('amb', 'Amb', _ambiguous_rule,
                            trigger='a', cap=50)
    bank = CompiledBank(names=['name', 'amb'], extractors=pool)
    bank.parsers.append(
        ('faulty', 'Faulty', FaultyParser(), None, None, False))

    turns = spark.createDataFrame(
        [('p0', 0, 'a ' * 40),            # amb budget abort + fault
         ('p1', 0, 'пришла Маша Иванова'),  # clean name match + fault
         ('p2', 0, 'zz zz'),   # no DECLARED trigger fires (the post-
                               # hoc FaultyParser doesn't widen the
                               # bank's trigger union) -> untriggered
                               # row kept with zero counts
         ('p3', 0, '')],       # empty: untriggered, zero counts
        'conv_id string, turn_idx int, text string')
    rows = {r['conv_id']: r for r in extract_audit(
        turns, bank=bank).collect()}
    assert set(rows) == {'p0', 'p1', 'p2', 'p3'}
    assert rows['p0']['triggered'] == 1
    assert rows['p0']['n_budget_aborts'] == 1
    assert rows['p0']['n_errors'] == 1          # FaultyParser raises
    assert rows['p1']['n_budget_aborts'] == 0
    assert rows['p1']['n_mentions'] > 0
    assert rows['p1']['n_errors'] == 1
    assert rows['p2']['triggered'] == 0 and rows['p2']['n_mentions'] == 0
    assert rows['p3']['triggered'] == 0 and rows['p3']['n_errors'] == 0


def test_kernel_fault_is_not_a_budget_abort(spark):
    """A non-budget kernel exception must surface in the ``errors``
    metric — never as ``budget_aborts`` — and must not disturb other
    extractors' findall results; strict mode re-raises."""
    from yargy_spark.extractors import CompiledBank
    from yargy_spark.operators.extract import (extract_mentions,
                                               make_extract_metrics)
    from yargy_spark.testing import FaultyParser

    bank = CompiledBank(names=['date'])
    bank.parsers.append(
        ('faulty', 'Faulty', FaultyParser(), None, None, False))

    turns = spark.createDataFrame(
        [('f0', 0, 'с 8 июня 2015 года')],
        'conv_id string, turn_idx int, text string')
    metrics = make_extract_metrics(spark)
    out = extract_mentions(turns, bank=bank, use_trigger=False,
                           metrics=metrics).collect()
    assert [r['rule_id'] for r in out] == ['date']  # date unaffected
    assert metrics['errors'].value == 1
    assert metrics['budget_aborts'].value == 0

    with pytest.raises(Exception, match='injected kernel fault'):
        extract_mentions(turns, bank=bank, use_trigger=False,
                         strict=True).collect()


def test_bucket_partition_pruning(spark, tmp_path):
    """Reading one bucket of the iceberg-like table scans only that
    partition directory (partition pruning in the plan)."""
    from yargy_spark.sources import manifest as mf
    from yargy_spark.sources.transcripts import synth_transcripts

    t = mf.with_bucket(synth_transcripts(spark, n_turns=256,
                                         partitions=4), 8)
    root = str(tmp_path / 'tbl')
    mf.commit_append(t, root)

    df = mf.read_table(spark, root).where(F.col('bucket') == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert 'bucket' in plan
    # pruned scan: only rows of bucket 3 come back
    assert df.select('bucket').distinct().collect()[0][0] == 3
    done = mf.committed_partitions(root)
    assert sum(s['rows'] for s in done.values()) == 256


# ---------------------------------------------------------- properties

@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=1200),
               max_size=80))
def test_tokenizer_span_invariants(text):
    """Tokens tile the non-space text: spans are in-order,
    non-overlapping, and each token's value equals its span slice."""
    from yargy_spark.tokenizer import Tokenizer
    toks = list(Tokenizer()(text))
    prev_stop = 0
    for t in toks:
        assert t.start >= prev_stop
        assert text[t.start:t.stop] == t.value
        prev_stop = t.stop


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(1, 10)),
                max_size=12))
def test_span_dp_invariants(raw):
    """Max-coverage selection is non-overlapping and covers at least as
    much as any single span."""
    from yargy_spark.kernel.spans import pick_max_coverage, span_len
    spans = sorted({(a, a + w) for a, w in raw},
                   key=lambda s: (s[0], -s[1]))
    chosen = list(pick_max_coverage(spans))
    for (a0, a1), (b0, b1) in zip(chosen, chosen[1:]):
        assert a1 <= b0
    if spans:
        assert sum(map(span_len, chosen)) >= max(map(span_len, spans))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                max_size=30))
def test_connected_components_property(spark_edges):
    """Distributed CC must agree with a local union-find."""
    edges = [(a, b) for a, b in spark_edges if a != b]
    if not edges:
        return
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {}
    for node in parent:
        expected.setdefault(find(node), set()).add(node)
    test_connected_components_property.cases.append(
        (edges, {frozenset(v) for v in expected.values()}))


test_connected_components_property.cases = []


def test_connected_components_vs_union_find(spark):
    """Replay the hypothesis-generated graphs through the distributed
    algorithm (one SparkSession, many graphs)."""
    from yargy_spark.operators.linking import connected_components
    cases = test_connected_components_property.cases
    assert cases, 'hypothesis generation ran first'
    for edges, expected in cases[:8]:
        df = spark.createDataFrame(edges, 'src long, dst long')
        rows = connected_components(df).collect()
        got = {}
        for r in rows:
            got.setdefault(r['component'], set()).add(r['node'])
        assert {frozenset(v) for v in got.values()} == expected


def test_round4_plan_shapes(spark):
    """Plan-shape guards for the round-4 operators (the claims in
    SCALE.md/PLANS.md §12-13, asserted so refactors can't silently
    regress them): decode path zero Exchanges; map-only banding after
    the one state agg; no CartesianProduct anywhere in the dedup
    increment; paragraph dedup has no window; query_topk's corpus
    side joins via broadcast."""
    import re

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def exchanges(p):
        # count real shuffles only (ReusedExchange re-reads one)
        return len(re.findall(r'(?<!Reused)Exchange ', p))

    docs = spark.createDataFrame(
        [(i, 'alpha beta gamma delta epsilon zeta eta theta '
              'word%d tail' % i) for i in range(30)],
        'doc_id long, text string')

    from yargy_spark.operators.dedup import (_exact_groups, _sig_bands,
                                             _state_rows,
                                             dedup_increment,
                                             minhash_state,
                                             paragraph_dedup)
    from yargy_spark.operators.multimodal import (decode_stats,
                                                  synth_ppm_media)
    from yargy_spark.operators.similarity import query_topk

    p = plan(decode_stats(synth_ppm_media(docs)))
    assert exchanges(p) == 0 and 'CartesianProduct' not in p

    # the whole media-codec family keeps the same zero-Exchange
    # map-only shape (PLANS.md §16): jpeg, wav, y4m frame sampling
    from yargy_spark.operators.multimodal import (audio_stats,
                                                  sample_frames,
                                                  synth_jpeg_media,
                                                  synth_wav_media,
                                                  synth_y4m_media)
    for q in (decode_stats(synth_jpeg_media(docs)),
              audio_stats(synth_wav_media(docs)),
              sample_frames(synth_y4m_media(docs))):
        p = plan(q)
        assert exchanges(p) == 0 and 'CartesianProduct' not in p

    reps, _ = _exact_groups(docs)
    p = plan(_sig_bands(_state_rows(reps)))
    # exact-group window + ONE state agg; banding itself adds none
    assert exchanges(p) <= 2

    state = minhash_state(docs.where('doc_id % 2 = 0'))
    pairs, new_state = dedup_increment(docs.where('doc_id % 2 = 1'),
                                       state)
    assert 'CartesianProduct' not in plan(pairs)
    assert 'CartesianProduct' not in plan(new_state)

    p = plan(paragraph_dedup(docs))
    assert 'Window' not in p and 'CartesianProduct' not in p

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5), 1.0]) for i in range(40)],
        'vec_id long, embedding array<double>')
    p = plan(query_topk(emb.where('vec_id < 4'),
                        emb.where('vec_id >= 4')))
    assert 'BroadcastNestedLoopJoin' in p
    assert 'WindowGroupLimit' in p
    # the corpus side reaches the join straight from the scan: every
    # hash repartition in the plan serves the per-query top-k window
    # (keys on query_id) — a corpus-side Exchange would key on
    # something else and fail here
    hps = re.findall(r'Exchange hashpartitioning\(([^,)]+)', p)
    assert hps and all('query_id' in h for h in hps)


def test_query_topk_ivf_plan_and_recall(spark):
    """query_topk(ivf=...) — the 10^9-vector retrieval path: the
    corpus stream must carry the literal probe-cell IN-filter BEFORE
    the broadcast probe join (so a centroid-partitioned materialized
    corpus prunes at the scan), the join must be a broadcast HASH
    join on centroid_id (never a NestedLoop over the full corpus),
    and the only hash repartition is the per-query top-k window.
    Semantics: probing ALL cells must reproduce the exact path
    row-for-row; probing few cells keeps rank-1 recall high (every
    query's probe includes its own best cell unless quantization
    splits them — bound asserted, value printed as the recall row)."""
    import re

    from yargy_spark.operators.similarity import query_topk

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    emb = spark.createDataFrame(
        [(i, [float((i * 7) % 13), float((i * 3) % 11),
              float(i % 5) + 1.0]) for i in range(60)],
        'vec_id long, embedding array<double>')
    queries = emb.where('vec_id < 4')
    corpus = emb.where('vec_id >= 4')

    ivf = query_topk(queries, corpus, ivf=(8, 2))
    p = plan(ivf)
    assert 'BroadcastNestedLoopJoin' not in p
    assert 'BroadcastHashJoin' in p and 'centroid_id' in p
    # the literal probe-cell filter sits on the corpus stream
    assert re.search(r'centroid_id#\d+ IN\b|centroid_id#\d+ INSET',
                     p), p
    hps = re.findall(r'Exchange hashpartitioning\(([^,)]+)', p)
    assert hps and all('query_id' in h for h in hps)

    # probe ALL cells -> exactly the exact path's output
    exact = {(r['query_id'], r['rank'], r['neighbor_id'],
              r['cos_x10000'])
             for r in query_topk(queries, corpus).collect()}
    full = {(r['query_id'], r['rank'], r['neighbor_id'],
             r['cos_x10000'])
            for r in query_topk(queries, corpus, ivf=(8, 8)).collect()}
    assert full == exact

    # the recall row: narrow probes vs exact top-5 neighbor sets
    got = {}
    for r in ivf.collect():
        got.setdefault(r['query_id'], set()).add(r['neighbor_id'])
    want = {}
    for q, _rk, n, _c in exact:
        want.setdefault(q, set()).add(n)
    recall = (sum(len(got.get(q, set()) & ns) for q, ns in want.items())
              / sum(len(ns) for ns in want.values()))
    print('ann_query_ivf recall@5 (n_probe=2/8): %.3f' % recall)
    assert recall >= 0.4


def test_query_topk_materialized_index(spark, tmp_path):
    """write_ivf_index + query_topk_indexed — the build-once
    query-many production shape: identical rows to the inline
    query_topk(ivf=...) path (same deterministic codebook), and the
    cells scan PARTITION-PRUNES on the probe cells (the IN-filter
    lands in PartitionFilters, not post-scan)."""
    from yargy_spark.operators.similarity import (query_topk,
                                                  query_topk_indexed,
                                                  write_ivf_index)

    emb = spark.createDataFrame(
        [(i, [float((i * 7) % 13), float((i * 3) % 11),
              float(i % 5) + 1.0]) for i in range(60)],
        'vec_id long, embedding array<double>')
    queries = emb.where('vec_id < 4')
    corpus = emb.where('vec_id >= 4')

    root = str(tmp_path / 'ivf')
    write_ivf_index(corpus, root, n_centroids=8)

    out = query_topk_indexed(queries, root, k=5, n_probe=2)
    p = out._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r'PartitionFilters: \[([^\]]*)\]', p)
    assert m and 'centroid_id' in m.group(1), p

    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in
            query_topk(queries, corpus, ivf=(8, 2)).collect()}
    assert got == want

    # a half-written index (no codebook marker) refuses
    import shutil
    shutil.rmtree(root + '/codebook.json')
    with pytest.raises(Exception):
        query_topk_indexed(queries, root).collect()

    # rebuild over the damaged root recovers (overwrite idempotence)
    write_ivf_index(corpus, root, n_centroids=8)
    assert {tuple(r) for r in
            query_topk_indexed(queries, root, k=5, n_probe=2)
            .collect()} == want

    # rebuild UN-commits first: a crash mid-rebuild must leave NO
    # stale marker behind (old codebook + new cells would silently
    # mismatch if the corpus changed between builds)
    import os
    import yargy_spark.operators.similarity as sim

    def _boom(*a, **k):
        raise RuntimeError('simulated mid-rebuild crash')

    orig = sim._centroids_rows
    sim._centroids_rows = _boom
    try:
        with pytest.raises(RuntimeError, match='mid-rebuild'):
            write_ivf_index(corpus, root, n_centroids=8)
    finally:
        sim._centroids_rows = orig
    assert not os.path.exists(root + '/codebook.json')
    with pytest.raises(Exception):
        query_topk_indexed(queries, root).collect()
