"""Entity linking: blocking, mention graph, connected components,
canonicalization.

north_rule stages with no reference analog (SURVEY.md §2.10) —
designed Spark-first for the 100 TB point:

* Blocking key = normalized-lemma pair ('иван|ульянов') produced by the
  inflected Name extractor, so every inflection of a name blocks
  together.
* The mention graph is built WITHOUT a quadratic self-join: each
  blocking group contributes star edges (mention -> group anchor).
  A hot entity mentioned 10^8 times yields 10^8 edges, not 10^16
  pairs — this, plus map-side partial aggregation of the min() anchor
  (Catalyst's partial HashAggregate collapses a hot key to one row
  per map task before the exchange, so explicit salting would only
  add a redundant second shuffle), is the skew design (AQE skew-join
  stays on as backstop for the joins that remain).
* Components via alternating large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond") — O(log n) rounds on
  arbitrary graphs, checkpoint per round to truncate lineage
  (reliable ``checkpoint()`` when a checkpoint dir is configured —
  the right setting on a cluster where executor loss is routine —
  falling back to ``localCheckpoint`` in local mode).
* Canonicalization: one representative surface form per entity via a
  frequency-ranked window, deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ------------------------------------------------------------------ edges

def _checkpointed(df: DataFrame, eager: bool = True,
                  pending: list = None) -> DataFrame:
    """Truncate lineage: reliable ``checkpoint()`` when the session
    has a checkpoint dir (survives executor loss — required at the
    cluster design point where lineage-truncated localCheckpoint
    blocks die with their executor), else ``localCheckpoint``.

    Reliable checkpoint has NO implicit persist (unlike
    localCheckpoint): without one, the checkpoint-write job would
    recompute the whole subtree a second time and downstream reuse a
    third — so persist first (the documented checkpoint pattern).
    Eager checkpoints release the pre-checkpoint blocks before
    returning.  Lazy checkpoints append the persisted frame to
    ``pending``; the CALLER must unpersist after the action that
    materializes the checkpoint — relying on LRU eviction instead
    builds storage-memory pressure across the up-to-20 CC rounds on a
    cluster with a checkpoint dir."""
    sc = df.sparkSession.sparkContext
    get_dir = getattr(sc, 'getCheckpointDir', None)
    has_dir = bool(get_dir()) if get_dir is not None else False
    if has_dir:
        df = df.persist()
        out = df.checkpoint(eager=eager)
        if eager:
            df.unpersist()
        elif pending is not None:
            pending.append(df)
        return out
    return df.localCheckpoint(eager=eager)


def _anchor_edges(df: DataFrame, key_col: str, node_col: str
                  ) -> DataFrame:
    """Star edges (node -> min node) per blocking key.  min() is
    algebraic: Catalyst's partial HashAggregate collapses a hot key
    to <= one row per map task BEFORE the exchange, so no reducer
    ever sees a hot key's raw rows and no explicit salting is needed
    (a salted two-phase min would just add a second shuffle)."""
    anchors = (df
               .select(key_col, node_col)
               .groupBy(key_col)
               .agg(F.min(node_col).alias('anchor')))
    return (df
            .select(key_col, node_col)
            .join(anchors, key_col)
            .where(F.col(node_col) != F.col('anchor'))
            .select(F.col(node_col).alias('src'),
                    F.col('anchor').alias('dst')))


def mention_edges(mentions: DataFrame) -> DataFrame:
    """Mention-graph edges over person-like mentions:
      (a) global blocking on the full lemma key,
      (b) conversation-local coref on the surname lemma
    (FIXTURES.md §6)."""
    pm = (mentions
          .where(F.col('norm_key').isNotNull())
          .select('mention_id', 'conv_id', 'norm_key')
          .withColumn('last_lemma',
                      F.element_at(F.split('norm_key', r'\|'), 2)))

    # both blocking families run through ONE two-phase aggregation:
    # keys are disjoint by prefix, so a single union'd pass halves the
    # shuffle/job count vs aggregating each family separately.
    # Mentions with no surname lemma are excluded from the
    # conversation family: concat_ws would silently drop the NULL and
    # collapse every such mention in a conversation onto one key,
    # star-edging unrelated mentions into one entity.
    keyed = (pm.select(F.concat_ws('#', F.lit('k'), 'norm_key')
                       .alias('bkey'), 'mention_id')
             .union(pm.where(F.col('last_lemma').isNotNull())
                    .select(
                 F.concat_ws('#', F.lit('c'), 'conv_id', 'last_lemma')
                 .alias('bkey'), 'mention_id')))
    return _anchor_edges(keyed, 'bkey', 'mention_id')


# ------------------------------------------------- connected components

def _large_star(sym: DataFrame) -> DataFrame:
    mins = (sym.groupBy('src')
            .agg(F.least(F.min('dst'), F.first('src')).alias('m')))
    return (sym.join(mins, 'src')
            .where(F.col('dst') > F.col('src'))
            .select(F.col('dst').alias('src'), F.col('m').alias('dst')))


def _small_star(sym: DataFrame) -> DataFrame:
    orient = sym.where(F.col('src') >= F.col('dst'))
    mins = orient.groupBy('src').agg(F.min('dst').alias('m'))
    joined = orient.join(mins, 'src')
    part1 = (joined.where(F.col('dst') != F.col('m'))
             .select(F.col('dst').alias('src'), F.col('m').alias('dst')))
    part2 = (mins.where(F.col('src') != F.col('m'))
             .select('src', F.col('m').alias('dst')))
    return part1.union(part2)


def connected_components(edges: DataFrame, max_iter: int = 20
                         ) -> DataFrame:
    """edges(src,dst) -> (node, component) with component = min node id
    of the component.  Alternating large-star/small-star with
    convergence detection on a deterministic edge-set signature."""
    edges = _checkpointed(edges.select(
        F.col('src').cast('long'), F.col('dst').cast('long')
    ).where(F.col('src') != F.col('dst')).distinct())

    def signature(e: DataFrame):
        # order-insensitive, overflow-free edge-set digest
        row = (e.select(F.xxhash64('src', 'dst').alias('h'))
               .agg(F.count('*').alias('n'),
                    F.expr('bit_xor(h)').alias('x'))
               .first())
        return (row['n'], row['x'])

    current = edges
    prev_sig = None
    converged = False
    pending = []
    for _ in range(max_iter):
        sym = current.union(
            current.select(F.col('dst').alias('src'),
                           F.col('src').alias('dst')))
        # star outputs are canonically oriented already: every emitted
        # edge is (node, group-min) with node > min, so the distinct'd
        # union IS the canonical edge set — signature it directly.
        # The checkpoint is lazy; the signature action materializes it
        # (one job per round instead of three), after which the
        # pre-checkpoint persist is released immediately.
        current = _checkpointed(
            _large_star(sym).union(_small_star(sym)).distinct(),
            eager=False, pending=pending)
        sig = signature(current)
        for p in pending:
            p.unpersist()
        pending.clear()
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # silent exit would emit SPLIT components (nodes mapped to
        # non-minimal local anchors) with no signal downstream
        raise RuntimeError(
            'connected_components did not converge in %d rounds; '
            'raise max_iter' % max_iter)

    # after convergence every edge points node -> component min
    membership = (current
                  .select(F.greatest('src', 'dst').alias('node'),
                          F.least('src', 'dst').alias('component'))
                  .groupBy('node')
                  .agg(F.min('component').alias('component')))
    roots = (membership.select(F.col('component').alias('node'),
                               F.col('component'))
             .distinct())
    return membership.union(roots).groupBy('node').agg(
        F.min('component').alias('component'))


# ------------------------------------------------------ canonicalization

def link_entities(mentions: DataFrame) -> DataFrame:
    """Person-like mentions -> (mention_id, entity_id, canonical)
    with one deterministic canonical name per connected component."""
    pm = mentions.where(F.col('norm_key').isNotNull())
    edges = mention_edges(pm)
    cc = connected_components(edges)

    # linked feeds TWO subtrees (the freq/canon window and the final
    # join): project to the three needed columns, then truncate so
    # the pm x cc join runs once, not twice.  Eager: the checkpoint
    # job runs at the first downstream action either way, and eager
    # releases the pre-checkpoint persist deterministically (no
    # materializing action happens inside this function).
    pm_small = pm.select('mention_id', 'norm_key')
    linked = _checkpointed(
        pm_small.join(cc, pm_small.mention_id == cc.node, 'left')
        .withColumn('component',
                    F.coalesce('component', 'mention_id'))
        .select('mention_id', 'norm_key', 'component'))

    # canonical form: most frequent lemma key in the component,
    # ties broken lexicographically (deterministic)
    freq = (linked.groupBy('component', 'norm_key')
            .agg(F.count('*').alias('n')))
    w = Window.partitionBy('component').orderBy(
        F.desc('n'), F.asc('norm_key'))
    canon = (freq.withColumn('rank', F.row_number().over(w))
             .where(F.col('rank') == 1)
             .select('component', F.col('norm_key').alias('canonical')))

    return (linked.join(canon, 'component')
            .withColumn('entity_id',
                        F.format_string('ent_%d', F.col('component')))
            .select('mention_id', 'entity_id', 'canonical'))


# ------------------------------------------------ incremental linking

def entity_key_table(mentions: DataFrame, links: DataFrame
                     ) -> DataFrame:
    """The compact incremental-linking state: one row per distinct
    blocking key, ``(norm_key, entity_id, canonical)``.

    Derived from a linked corpus (mentions joined to a
    ``link_entities`` output); bounded by |distinct surface keys| —
    at the 10^12-turn design point that is ~10^8 rows (person-name
    keys), ~GBs as parquet, vs the 10^10+ mention rows it summarizes.
    Within one batch-linked corpus ``norm_key -> entity`` is
    functional (all mentions sharing a key share the 'k#' blocking
    key, hence the component); the min() below is a deterministic
    belt-and-braces for state that was itself built incrementally
    with unapplied merges."""
    keyed = (mentions
             .where(F.col('norm_key').isNotNull())
             .select('mention_id', 'norm_key')
             .join(links.select('mention_id', 'entity_id'),
                   'mention_id'))
    canon = links.select('entity_id', 'canonical').distinct()
    return (keyed.groupBy('norm_key')
            .agg(F.min('entity_id').alias('entity_id'))
            .join(canon, 'entity_id')
            .select('norm_key', 'entity_id', 'canonical'))


def link_entities_incremental(new_mentions: DataFrame,
                              prior_keys: DataFrame) -> tuple:
    """Link a NEW batch of mentions against an already-linked corpus
    WITHOUT re-running global connected components — the bounded-
    staleness fast path that complements the REPLACE-snapshot full
    re-link (jobs/run_kg.py): at 10^12 turns a daily increment is
    ~10^9 turns, and global CC over the full mention graph per
    increment is the one cost the two-phase resume design could not
    avoid (SCALE.md "Failure / resume").

    Component adoption: batch-link the INCREMENT (star edges + CC
    over increment-local edges only — never the historical mention
    graph), then one equi-join of the components' member keys against
    ``prior_keys`` (the `entity_key_table` state — distinct-key-
    bounded; can exceed broadcast size at the design point, AQE picks
    broadcast when it fits) decides each component's fate:

    * a mention whose own ``norm_key`` is in the prior state keeps
      THAT entity unconditionally — re-assigning it would silently
      merge prior entities and rewrite committed triples;
    * every other mention of a component that touches >= 1 prior
      entity adopts the (deterministic min) touched entity — this is
      closed over chains (same-key mentions in other conversations,
      coref neighbors of those, ...) because adoption is decided per
      CC component, not per direct neighbor;
    * components touching no prior entity keep their fresh batch id
      ('ent_<min mention_id>'; mention ids are 63-bit content hashes
      unique across batches, so fresh ids cannot collide with prior
      ids).

    Returns ``(links, merge_candidates)``:

    * ``links`` — (mention_id, entity_id, canonical) for every
      person-like new mention, same contract as ``link_entities``.
    * ``merge_candidates`` — (entity_a, entity_b, conv_id,
      last_lemma): pairs of PRIOR entities that one increment
      component now connects, with a witness conversation/lemma for
      human triage.  The witness is a conversation where BOTH
      entities have direct mentions (deterministic min over shared
      conversations) whenever one exists; when the bridge runs only
      through a coref chain spanning conversations — so no single
      conversation co-locates the pair — it falls back to the
      lexicographic min of the two sides' own witness conversations.
      Incremental assignment never merges prior entities; the
      candidates are the work-list for ``apply_entity_merges`` or
      the next full re-link — bounded staleness, loud rather than
      silent.
    """
    pm = (new_mentions
          .where(F.col('norm_key').isNotNull())
          .select('mention_id', 'conv_id', 'norm_key')
          .withColumn('last_lemma',
                      F.element_at(F.split('norm_key', r'\|'), 2)))

    # both frames feed three subtrees each (touched, the anti-join,
    # the links output); truncate once so the increment CC and the
    # prior-state join are not re-derived per reference — after this,
    # the adoption superstructure is a handful of equi-joins and
    # aggregations over increment- / key-table-bounded rows
    inc = _checkpointed(
        link_entities(pm)
        .withColumnRenamed('entity_id', 'comp_id')
        .withColumnRenamed('canonical', 'comp_canonical'))
    direct = _checkpointed(
        pm.join(prior_keys, 'norm_key')
        .select('mention_id', 'conv_id', 'last_lemma',
                'entity_id', 'canonical'))

    # prior entities touched by each increment component.  The
    # distinct (component, prior, conversation) table drives both the
    # per-entity witness and the pair-shared-conversation witness —
    # bounded by direct-tier rows, far below mention cardinality.
    touched_cl = (inc.select('mention_id', 'comp_id')
                  .join(direct.select(
                      'mention_id', 'conv_id', 'last_lemma',
                      F.col('entity_id').alias('prior_id')),
                      'mention_id')
                  .select('comp_id', 'prior_id', 'conv_id',
                          'last_lemma')
                  .distinct())
    touched = (touched_cl
               .groupBy('comp_id', 'prior_id')
               .agg(F.min('conv_id').alias('conv_id'),
                    F.min('last_lemma').alias('last_lemma')))

    ent_canon = prior_keys.select('entity_id', 'canonical').distinct()
    adopt = (touched.groupBy('comp_id')
             .agg(F.min('prior_id').alias('adopt_id'))
             .join(ent_canon.select(
                 F.col('entity_id').alias('adopt_id'),
                 F.col('canonical').alias('adopt_canonical')),
                 'adopt_id'))

    nondirect = inc.join(direct.select('mention_id'), 'mention_id',
                         'left_anti')
    assigned = (nondirect.join(adopt, 'comp_id', 'left')
                .select('mention_id',
                        F.coalesce('adopt_id', 'comp_id')
                        .alias('entity_id'),
                        F.coalesce('adopt_canonical', 'comp_canonical')
                        .alias('canonical')))
    links = (direct.select('mention_id', 'entity_id', 'canonical')
             .union(assigned))

    a, b = touched.alias('a'), touched.alias('b')
    pairs = (a.join(b, 'comp_id')
             .where(F.col('a.prior_id') < F.col('b.prior_id'))
             .select('comp_id',
                     F.col('a.prior_id').alias('entity_a'),
                     F.col('b.prior_id').alias('entity_b'),
                     F.col('a.conv_id').alias('conv_a'),
                     F.col('b.conv_id').alias('conv_b'),
                     F.col('a.last_lemma').alias('lemma_a')))
    # pair witness: a conversation where BOTH priors have direct
    # mentions (the a-side min conversation can contain only
    # entity_a when the component bridges via a coref chain).
    # Self-join on (component, conversation) over the distinct
    # direct-tier rows, min per pair; NULL when no shared
    # conversation exists.
    sa, sb = touched_cl.alias('sa'), touched_cl.alias('sb')
    shared = (sa.join(sb, (F.col('sa.comp_id') == F.col('sb.comp_id'))
                      & (F.col('sa.conv_id') == F.col('sb.conv_id'))
                      & (F.col('sa.prior_id') < F.col('sb.prior_id')))
              .groupBy(F.col('sa.comp_id').alias('comp_id'),
                       F.col('sa.prior_id').alias('entity_a'),
                       F.col('sb.prior_id').alias('entity_b'))
              # struct min: the witness lemma comes from the SAME
              # (min) shared conversation, not an unrelated one
              .agg(F.min(F.struct(F.col('sa.conv_id'),
                                  F.col('sa.last_lemma')))
                   .alias('w'))
              .select('comp_id', 'entity_a', 'entity_b',
                      F.col('w.conv_id').alias('shared_conv'),
                      F.col('w.last_lemma').alias('shared_lemma')))
    merge_candidates = (
        pairs.join(shared, ['comp_id', 'entity_a', 'entity_b'],
                   'left')
        .select('entity_a', 'entity_b',
                F.coalesce('shared_conv',
                           F.least('conv_a', 'conv_b'))
                .alias('conv_id'),
                F.coalesce('shared_lemma', 'lemma_a')
                .alias('last_lemma')))
    return links, merge_candidates


def apply_entity_merges(merge_candidates: DataFrame,
                        prior_keys: DataFrame,
                        triples: DataFrame = None):
    """Resolve the merge work-list BETWEEN full re-links: connected
    components over the prior-entity merge graph (pairs accumulated
    from one or many increments CHAIN — a-b from day 1 and b-c from
    day 4 must land in one surviving entity, so per-pair min is not
    enough; this reuses the same large/small-star CC kernel the
    linker runs), elect each component's numeric-min entity id as the
    survivor, and rewrite the entity-key state.  This is the explicit
    apply step a KG operator schedules after triaging
    ``merge_candidates`` — merges are still never applied silently
    (jobs/run_kg_apply_merges.py commits the outcome as new state +
    an audit mapping).

    Returns ``(mapping, new_keys)`` — or ``(mapping, new_keys,
    patch)`` when ``triples`` is given:

    * ``mapping`` — (entity_id, merged_id, merged_canonical), one row
      per RETIRED entity (survivors do not appear as ``entity_id``).
    * ``new_keys`` — the full ``entity_key_table`` contract with
      retired ids rewritten to their survivor (id AND canonical), so
      the next increment chains off merged state.
    * ``patch`` — corrected rows for every input triple whose subject
      is retired: subject rewritten to the survivor, ``canonical_name``
      rows dropped (the survivor already owns one).  Applying the
      patch = anti-join retired subjects out of the triples table,
      union the patch in — jobs/run_kg_apply_merges.py materializes
      it; the next full re-link supersedes it.

    Scale shape: the merge graph is candidate-bounded (orders of
    magnitude below the key table, let alone mentions), so CC here is
    cheap; both rewrites are single equi-joins against the
    candidate-bounded mapping — Catalyst broadcasts it, making the
    key-table and triples passes map-side."""
    def _num(col):
        return F.regexp_extract(col, '^ent_([0-9]+)$', 1).cast('long')

    edges = (merge_candidates
             .select(_num('entity_a').alias('src'),
                     _num('entity_b').alias('dst'))
             .where(F.col('src').isNotNull()
                    & F.col('dst').isNotNull()))
    cc = connected_components(edges)
    mapping_ids = (cc.where(F.col('node') != F.col('component'))
                   .select(F.format_string('ent_%d', F.col('node'))
                           .alias('entity_id'),
                           F.format_string('ent_%d',
                                           F.col('component'))
                           .alias('merged_id')))
    # the survivor is itself a prior entity (candidates are prior-id
    # pairs), so its canonical comes from the key state; left join
    # keeps the mapping loud (NULL canonical) rather than silently
    # dropping a retired entity if state and candidates ever diverge
    survivor_canon = (prior_keys
                      .select(F.col('entity_id').alias('merged_id'),
                              F.col('canonical')
                              .alias('merged_canonical'))
                      .distinct())
    mapping = mapping_ids.join(survivor_canon, 'merged_id', 'left') \
        .select('entity_id', 'merged_id', 'merged_canonical')

    new_keys = (prior_keys.join(mapping, 'entity_id', 'left')
                .select('norm_key',
                        F.coalesce('merged_id', 'entity_id')
                        .alias('entity_id'),
                        F.coalesce('merged_canonical', 'canonical')
                        .alias('canonical')))
    if triples is None:
        return mapping, new_keys

    retired = mapping.select(F.col('entity_id').alias('subj'),
                             'merged_id')
    rest = [c for c in triples.columns if c != 'subj']
    patch = (triples.join(retired, 'subj')
             .where(F.col('pred') != 'canonical_name')
             .select(F.col('merged_id').alias('subj'), *rest))
    return mapping, new_keys, patch


# ------------------------------------------------------- graph edges

def entity_cooccurrence(mentions: DataFrame, entities: DataFrame,
                        group_col: str = 'conv_id') -> DataFrame:
    """Entity co-occurrence edges: (a, b, n_groups) for canonical
    entity pairs mentioned in the same group (conversation by
    default) — the KG's entity-graph materialization.

    Scale shape: the self-join runs on the DISTINCT (group, entity)
    table, which is bounded by group count x entities-per-group, not
    by mention count; hot groups are handled by AQE skew-join."""
    ge = (mentions.join(entities, 'mention_id')
          .select(F.col(group_col).alias('grp'), 'canonical')
          .distinct())
    left = ge.select('grp', F.col('canonical').alias('a'))
    right = ge.select('grp', F.col('canonical').alias('b'))
    # ge is distinct per (grp, entity), so the joined (grp, a, b)
    # triples are already distinct — plain count equals countDistinct
    # without the two-phase distinct-aggregate expansion
    return (left.join(right, 'grp')
            .where(F.col('a') < F.col('b'))
            .groupBy('a', 'b')
            .agg(F.count('*').alias('n_groups')))


def entity_degree(edges: DataFrame) -> DataFrame:
    """Degree centrality over the entity co-occurrence graph (edges
    from ``entity_cooccurrence``): per canonical entity, the number
    of distinct neighbors and the total co-mention weight — the
    basic graph-analytics readout over the materialized KG.

    Scale shape: one union (each undirected a<b edge contributes
    both endpoints) + one map-side-combined groupBy on the entity
    key; no joins.  The edge table is pair-of-entities bounded —
    orders of magnitude smaller than the mention table it derives
    from."""
    both = (edges.select(F.col('a').alias('entity'), 'n_groups')
            .union(edges.select(F.col('b').alias('entity'),
                                'n_groups')))
    return (both.groupBy('entity')
            .agg(F.count('*').alias('n_neighbors'),
                 F.sum('n_groups').alias('degree_weight')))
