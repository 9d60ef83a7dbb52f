"""Similarity search over an embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the exactness baseline; a cross join
    whose inner product runs entirely in JVM expressions
    (zip_with + aggregate, whole-stage codegen),
  * IVF-lite top-k — the scale path: deterministic centroid set,
    cluster assignment, probe only the ``n_probe`` nearest clusters.
    At 100 TB the cross join disappears; each query touches
    n_probe/n_centroids of the corpus, and the cluster id is the
    shuffle key (naturally balanced for spherical data).

Cosines are emitted as floor(x * 10000) integers so a DuckDB oracle
hash-matches despite independent float summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v * v))


def cosine_x10000(a, b):
    # Degenerate-input contract (BOTH backends): null array or length
    # mismatch -> NULL (threshold filters drop it; never silently 0,
    # which would outrank negative cosines); zero-norm vectors have no
    # direction -> cosine 0 rather than NaN (NaN would cast to null
    # and float through window ranks with engine-dependent placement).
    denom = _norm(a) * _norm(b)
    zero = F.lit(0).cast('long')
    return F.when(
        denom > 0,
        # a length mismatch makes the zip_with dot NULL here even
        # though both norms exist — NULL propagates out, as intended
        F.floor(F.lit(10000.0) * _dot(a, b) / denom).cast('long')
    ).otherwise(F.when(denom == 0, zero)
                .otherwise(F.lit(None).cast('long')))


def _np_cosine_x10000_fn(a, b):
    """Vectorized kernel shared by the pandas UDF and tests.

    Precision mirrors the JVM expression EXACTLY where it matters:
    Spark's ``zip_with(a, b, x*y)`` multiplies float32 x float32 in
    float32 (the dominant rounding step, identical element-wise
    here), then accumulates into a float64 — numpy reproduces the
    float32 products bit-for-bit and sums them in float64, where
    summation-order error (~1e-15) cannot move a x10000-floored
    value.  Centroid arrays arrive as float64 and stay float64,
    matching the JVM's double-promoted multiply."""
    import numpy as np
    import pandas as pd
    va, vb = a.to_numpy(), b.to_numpy()
    if len(va) == 0:
        return pd.Series(pd.array([], dtype='Int64'), index=a.index)
    # JVM-wrapper parity for degenerate rows: a null array or a
    # per-row length mismatch yields a NULL cosine (threshold filters
    # drop it) — np.stack would instead crash the task.  Rows with
    # DIFFERENT (but internally consistent) dims across the batch are
    # also legal input (mixed-model embedding tables): stack per dim
    # group, never across.
    lens = np.fromiter(
        (len(x) if x is not None else -1 for x in va),
        dtype=np.int64, count=len(va))
    valid = np.fromiter(
        (x is not None and y is not None and len(x) == len(y)
         for x, y in zip(va, vb)), dtype=bool, count=len(va))
    if not valid.all() or len(np.unique(lens[valid])) > 1:
        out = pd.array([None] * len(va), dtype='Int64')
        for d in np.unique(lens[valid]):
            m = valid & (lens == d)
            sub = _np_cosine_x10000_fn(a[m], b[m])
            out[m] = sub.to_numpy()
        return pd.Series(out, index=a.index)
    A = np.stack(va)
    B = np.stack(vb)
    # norms square each side in its NATIVE dtype (Spark squares a
    # float column in float32 even when the other operand is double)
    sq_a, sq_b = A * A, B * B
    if A.dtype == B.dtype:
        prods = A * B                       # float32, matches zip_with
    else:
        prods = A.astype(np.float64) * B.astype(np.float64)
    dots = prods.astype(np.float64).sum(axis=1)
    denom = (np.sqrt(sq_a.astype(np.float64).sum(axis=1))
             * np.sqrt(sq_b.astype(np.float64).sum(axis=1)))
    out = np.zeros(len(dots), dtype=np.int64)
    nz = denom > 0
    out[nz] = np.floor(10000.0 * dots[nz] / denom[nz]).astype(np.int64)
    return pd.Series(out, index=a.index)


def cosine_x10000_np(a, b):
    """Arrow-vectorized cosine — the HOT-PATH backend.

    Same contract as ``cosine_x10000`` but computed with numpy over
    Arrow batches: Spark's higher-order array functions are
    interpreted per element (no whole-stage codegen inside
    aggregate/zip_with lambdas), which measured ~10x slower on
    pair-heavy workloads.  numpy's pairwise/SIMD float64 summation can
    differ from sequential summation in the last ulp; values are
    floored at x10000, so a flip needs a true cosine within ~1e-12 of
    an integer boundary — not observed on any gate corpus (the DuckDB
    oracle already sums in its own order and has always matched)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf('long')
    def _udf(x, y):
        return _np_cosine_x10000_fn(x, y)

    return _udf(a, b)


def cosine_topk(embeddings: DataFrame, k: int = 5,
                n_queries: int = 10) -> DataFrame:
    """Brute-force cosine top-k neighbors for the first ``n_queries``
    vectors: (query_id, neighbor_id, rank, cos_x10000)."""
    q = (embeddings.where(F.col('vec_id') < n_queries)
         .select(F.col('vec_id').alias('query_id'),
                 F.col('embedding').alias('qv')))
    c = embeddings.select(F.col('vec_id').alias('neighbor_id'),
                          F.col('embedding').alias('cv'))
    scored = (q.join(c, F.col('query_id') != F.col('neighbor_id'))
              .select('query_id', 'neighbor_id',
                      cosine_x10000_np(F.col('qv'), F.col('cv'))
                      .alias('cos_x10000')))
    w = Window.partitionBy('query_id').orderBy(
        F.desc('cos_x10000'), F.asc('neighbor_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .where(F.col('rank') <= k)
            .select('query_id', 'neighbor_id', 'rank', 'cos_x10000'))


def query_topk(queries: DataFrame, corpus: DataFrame,
               k: int = 5, ivf: tuple | None = None) -> DataFrame:
    """Cross-table cosine top-k — the RETRIEVAL shape (a query batch
    against an indexed corpus), vs ``cosine_topk``'s self-join.
    Returns (query_id, neighbor_id, rank, cos_x10000).

    ``ivf=None`` (exact): the query side is batch-sized by
    definition, so it is BROADCAST and the corpus never shuffles —
    the scan streams through one BroadcastNestedLoopJoin + the Arrow
    cosine UDF; the only exchange is the per-query top-k window,
    whose input WindowGroupLimit caps map-side at k rows per
    (partition, query).  Exact, but a FULL corpus scan per batch —
    wrong at 10^9 vectors.

    ``ivf=(n_centroids, n_probe)`` (the scale path): k-means the
    CORPUS (``_centroids_rows`` — deterministic, quantized sums),
    assign each corpus vector to its nearest cell and each query to
    its ``n_probe`` nearest cells (both map-only over one broadcast
    codebook), then cosine only (query, corpus-in-probe-cell) pairs.
    The distinct probe-cell set (≤ |batch| x n_probe ids, collected
    driver-side — O(batch) metadata, not data) is pushed as a
    LITERAL ``centroid_id IN (...)`` filter on the corpus stream
    BEFORE the broadcast probe join, so each batch touches
    ~n_probe/n_centroids of the corpus; against a materialized
    ``ivf_assign`` table partitioned by centroid_id the same literal
    becomes partition pruning at the scan.  Approximate: recall is
    bounded by probe coverage (see test_scale_guards'
    recall-vs-exact row)."""
    q = queries.select(F.col('vec_id').alias('query_id'),
                       F.col('embedding').alias('qv'))
    if ivf is None:
        c = corpus.select(F.col('vec_id').alias('neighbor_id'),
                          F.col('embedding').alias('cv'))
        scored = (F.broadcast(q).crossJoin(c)
                  .select('query_id', 'neighbor_id',
                          cosine_x10000_np(F.col('qv'), F.col('cv'))
                          .alias('cos_x10000')))
    else:
        n_centroids, n_probe = ivf
        spark = corpus.sparkSession
        cent_rows = _centroids_rows(corpus, n_centroids)
        bc = codebook_broadcast(spark, cent_rows)
        assigned = _nearest(corpus, cent_rows, 1, bc=bc)
        probe_udf = nearest_centroid_udf(spark, cent_rows,
                                         n_probe, bc=bc)
        probes = q.select('query_id', 'qv',
                          F.explode(probe_udf(F.col('qv')))
                          .alias('centroid_id'))
        scored = _probe_scored(assigned, probes)
    return _topk(scored, k)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy('query_id').orderBy(
        F.desc('cos_x10000'), F.asc('neighbor_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .where(F.col('rank') <= k)
            .select('query_id', 'neighbor_id', 'rank', 'cos_x10000'))


def _probe_scored(assigned: DataFrame, probes: DataFrame) -> DataFrame:
    """Score (query, corpus-in-probe-cell) pairs: the batch's
    distinct probe cells (collected driver-side — O(batch x n_probe)
    metadata, not data) become a LITERAL IN-filter on the assigned
    corpus stream BEFORE the broadcast probe join, so the filter can
    push to the scan (partition pruning on a materialized index)."""
    cells = sorted({r['centroid_id']
                    for r in probes.select('centroid_id')
                    .distinct().collect()})
    return (assigned
            .where(F.col('centroid_id').isin(cells))
            .join(F.broadcast(probes), 'centroid_id')
            .select('query_id',
                    F.col('vec_id').alias('neighbor_id'),
                    cosine_x10000_np(F.col('qv'), F.col('embedding'))
                    .alias('cos_x10000')))


def write_ivf_index(embeddings: DataFrame, root: str,
                    n_centroids: int = 16) -> dict:
    """Materialize the IVF index — build once, query many times:

      * ``<root>/cells`` — the corpus with its nearest-centroid
        assignment, written PARTITIONED BY centroid_id (hive layout),
        so a query batch's probe-cell IN-filter prunes whole
        partitions at the scan;
      * ``<root>/codebook.json`` — the deterministic quantized-sum
        codebook (exact float round-trip via JSON repr), written
        LAST as the commit marker: readers refuse a half-written
        index.

    Deterministic: same corpus -> same codebook -> same layout, so an
    overwrite rebuild is idempotent.  At 10^9 vectors this is the
    production shape the inline ``query_topk(ivf=...)`` path
    approximates by computing the assignment per batch."""
    import json
    spark = embeddings.sparkSession
    # UN-commit first: drop any existing marker BEFORE touching the
    # cells, so a crash mid-rebuild can never leave an old codebook
    # paired with new cells — the marker is absent for the whole
    # rebuild window and readers refuse.  Hadoop FS so the path
    # semantics (local, HDFS, s3a) match the writes below.
    jvm = spark._jvm
    marker = jvm.org.apache.hadoop.fs.Path(root + '/codebook.json')
    marker.getFileSystem(spark._jsc.hadoopConfiguration()) \
        .delete(marker, True)
    cent_rows = _centroids_rows(embeddings, n_centroids)
    assigned = _nearest(embeddings, cent_rows, 1)
    (assigned.write.mode('overwrite')
     .partitionBy('centroid_id').parquet(root + '/cells'))
    payload = json.dumps({'n_centroids': n_centroids,
                          'centroids': [{'centroid_id': c, 'centv': v}
                                        for c, v in cent_rows]})
    # one-row text write through the JVM so the path semantics (local,
    # HDFS, s3a) match the parquet write above
    spark.createDataFrame([(payload,)], 'v string').coalesce(1) \
        .write.mode('overwrite').text(root + '/codebook.json')
    return {'n_centroids': n_centroids, 'cells': root + '/cells'}


def query_topk_indexed(queries: DataFrame, root: str, k: int = 5,
                       n_probe: int = 4) -> DataFrame:
    """Retrieval against a MATERIALIZED ``write_ivf_index`` root: the
    codebook loads driver-side (O(n_centroids)), the query batch
    probes its ``n_probe`` nearest cells map-only, and the cells scan
    carries the probe-cell filter as PARTITION PRUNING (plan-guarded
    in test_scale_guards) — a batch reads ~n_probe/n_centroids of the
    corpus.  Same semantics as ``query_topk(ivf=...)`` with the same
    codebook (asserted row-for-row in tests)."""
    import json
    spark = queries.sparkSession
    rows = spark.read.text(root + '/codebook.json').collect()
    if not rows:
        raise ValueError('no codebook at %s — write_ivf_index did '
                         'not complete' % root)
    cb = json.loads(rows[0]['value'])
    cent_rows = [(c['centroid_id'], c['centv'])
                 for c in cb['centroids']]
    bc = codebook_broadcast(spark, cent_rows)
    probe_udf = nearest_centroid_udf(spark, cent_rows, n_probe, bc=bc)
    q = queries.select(F.col('vec_id').alias('query_id'),
                       F.col('embedding').alias('qv'))
    probes = q.select('query_id', 'qv',
                      F.explode(probe_udf(F.col('qv')))
                      .alias('centroid_id'))
    assigned = spark.read.parquet(root + '/cells')
    return _topk(_probe_scored(assigned, probes), k)


def _seed_centroids(embeddings: DataFrame,
                    n_centroids: int) -> DataFrame:
    """Hash-sampled seed centroids: the ``n_centroids`` vectors with
    the smallest portable md5 hash of their id.  Unlike 'first N ids',
    this is an unbiased pseudo-random sample of the corpus (ids carry
    no positional meaning under hashing), yet fully deterministic and
    replayable in any SQL engine.

    orderBy+limit plans as TakeOrderedAndProject (distributed partial
    top-k, no global sort); centroid ids are assigned on the driver
    over the n_centroids collected rows."""
    from .dedup import md5_int
    rows = (embeddings
            .select('vec_id', 'embedding',
                    md5_int(F.col('vec_id').cast('string'))
                    .alias('hsh'))
            .orderBy(F.asc('hsh'), F.asc('vec_id'))
            .limit(n_centroids)
            .collect())
    lit = [(i, [float(v) for v in r['embedding']])
           for i, r in enumerate(rows)]
    return embeddings.sparkSession.createDataFrame(
        lit, 'centroid_id int, centv array<double>')


def codebook_broadcast(spark, cent_rows):
    """One SparkContext broadcast of the codebook as ready ndarrays
    (ascending-centroid-id order): ``(cids int64[k], C float64[k,d])``.

    Shared by the assignment and probe UDFs of one IVF query so the
    codebook ships once, and pre-converted so the hot-path UDF never
    rebuilds arrays from Python lists per Arrow batch (at a
    100k x 100-dim codebook that conversion would dominate the
    assignment pass).  Lifecycle: the broadcast lives as long as a
    plan references it; Spark's ContextCleaner reclaims it once the
    last referencing DataFrame is garbage-collected."""
    import numpy as np

    rows = sorted(((int(r[0]), [float(v) for v in r[1]])
                   for r in cent_rows), key=lambda t: t[0])
    cids = np.array([c for c, _ in rows], dtype=np.int64)
    C = np.array([v for _, v in rows], dtype=np.float64)
    return spark.sparkContext.broadcast((cids, C))


def nearest_centroid_udf(spark, cent_rows, n_assign: int, bc=None):
    """Build a map-only pandas UDF ``embedding -> array<int>`` of the
    ``n_assign`` nearest centroid ids, in rank order.

    This replaces the former crossJoin(broadcast(cent)) + row_number
    window: the window's Exchange shuffled |corpus| x n_centroids
    skinny rows (N^1.5 with a sqrt(N) codebook) purely to pick a
    per-vector top-k that a map task can compute locally.  Centroids
    travel via a real SparkContext broadcast (torrent protocol — holds
    at 100k+-centroid codebooks where a pickled closure would not).

    Parity contract (what keeps the DuckDB oracle hash-green):
      * sims are ``_np_cosine_x10000_fn`` bit-for-bit — per-centroid
        float64 products summed along the vector axis, float32 squares
        for the embedding-side norm, floor at x10000;
      * ordering is desc(sim), ties by asc(centroid_id) — centroid
        columns are laid out in ascending-id order so a STABLE argsort
        of -sims reproduces the window's tie-break exactly;
      * degenerate rows (null / dim-mismatched embedding -> NULL sims;
        zero-norm -> sim 0 everywhere) keep the window semantics: NULL
        sorts last under desc, full ties resolve to ascending ids.
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    if bc is None:
        bc = codebook_broadcast(spark, cent_rows)
    _NULL_SIM = -(1 << 62)  # valid sims live in [-10000, 10000]

    @pandas_udf('array<int>')
    def _assign(emb):
        import pandas as pd
        cids, C = bc.value
        k, d = C.shape
        take = min(n_assign, k)
        # centroid-side norm terms: same per-row pairwise reduction the
        # tiled (N x d) path performed — one scalar per centroid
        cnorm = np.sqrt((C * C).sum(axis=1))
        va = emb.to_numpy()
        n = len(va)
        sims = np.full((n, k), _NULL_SIM, dtype=np.int64)
        valid = np.fromiter(
            (x is not None and len(x) == d for x in va),
            dtype=bool, count=n)
        if valid.any():
            A = np.stack(va[valid])
            A64 = A.astype(np.float64)
            # embedding-side norm squares in the NATIVE dtype (float32
            # for array<float> input), summed in float64 — mirrors
            # _np_cosine_x10000_fn exactly
            anorm = np.sqrt((A * A).astype(np.float64).sum(axis=1))
            sub = np.empty((A.shape[0], k), dtype=np.int64)
            for j in range(k):
                dots = (A64 * C[j]).sum(axis=1)
                denom = anorm * cnorm[j]
                col = np.zeros(A.shape[0], dtype=np.int64)
                nz = denom > 0
                col[nz] = np.floor(
                    10000.0 * dots[nz] / denom[nz]).astype(np.int64)
                sub[:, j] = col
            sims[valid] = sub
        order = np.argsort(-sims, axis=1, kind='stable')[:, :take]
        picked = cids[order]
        return pd.Series(list(picked), index=emb.index)

    return _assign


def _nearest(embeddings: DataFrame, cent: DataFrame,
             n_assign: int = 1, bc=None) -> DataFrame:
    """(vec_id, embedding, centroid_id) for each vector's ``n_assign``
    nearest centroids — map-only (see ``nearest_centroid_udf``): no
    Exchange between the embedding scan and the assignment, and no
    join-back (the embedding stays on its own row through the UDF).

    ``cent`` may be a DataFrame (collected here — an O(n_centroids)
    driver collect; production callers pass an already-local literal
    frame, so with the default single Lloyd round no extra job is
    triggered) or a pre-collected ``[(centroid_id, centv), ...]``
    list."""
    spark = embeddings.sparkSession
    if isinstance(cent, DataFrame):
        cent = [(r['centroid_id'], r['centv']) for r in cent.collect()]
    assign = nearest_centroid_udf(spark, cent, n_assign, bc=bc)
    return (embeddings
            .select('vec_id', 'embedding',
                    F.explode(assign(F.col('embedding')))
                    .alias('centroid_id')))


def _centroids_rows(embeddings: DataFrame, n_centroids: int,
                    lloyd_rounds: int = 1) -> list:
    """Deterministic seeded k-means centroids as a collected
    ``[(centroid_id, centv), ...]`` list (the ONE centroid
    definition, shared by assignment and probing so they can never
    drift apart).

    Hash-sampled seeds + ``lloyd_rounds`` Lloyd updates.  The mean is
    computed over integer-quantized components (floor(v * 10000)), so
    the sums are order-independent and the resulting coordinates are
    bit-identical across partitionings AND across engines — float
    summation order can never flip a downstream floor().  Per round:
    one broadcast-join assignment + one (centroid, pos)-keyed mean
    with map-side partial aggregation; no collect."""
    cent = _seed_centroids(embeddings, n_centroids)
    for _ in range(lloyd_rounds):
        assigned = _nearest(embeddings, cent, 1)
        comp = (assigned
                .select('centroid_id',
                        F.posexplode(F.transform(
                            'embedding',
                            lambda v: F.floor(v * 10000.0)
                            .cast('long')))
                        .alias('pos', 'q')))
        cent = (comp.groupBy('centroid_id', 'pos')
                .agg(F.sum('q').alias('sq'), F.count('*').alias('cnt'))
                .groupBy('centroid_id')
                .agg(F.array_sort(F.collect_list(F.struct(
                    'pos',
                    (F.col('sq').cast('double') / F.col('cnt')
                     / F.lit(10000.0)).alias('val')))).alias('pv'))
                .select('centroid_id',
                        F.col('pv.val').alias('centv')))
    # materialize the (tiny: n_centroids rows) result driver-side:
    # downstream plans reference centroids several times (assignment
    # + probing) and would otherwise recompute the whole k-means
    # subplan per reference.  An O(n_centroids) driver collect, not
    # a data collect.
    return [(int(r['centroid_id']), [float(v) for v in r['centv']])
            for r in cent.collect()]


def _centroids(embeddings: DataFrame, n_centroids: int,
               lloyd_rounds: int = 1) -> DataFrame:
    """``_centroids_rows`` as a literal DataFrame, for callers that
    compose it into further plans."""
    return embeddings.sparkSession.createDataFrame(
        _centroids_rows(embeddings, n_centroids, lloyd_rounds),
        'centroid_id int, centv array<double>')


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16,
               n_assign: int = 1) -> DataFrame:
    """Assign every vector to its ``n_assign`` nearest k-means
    centroids — map-only over the broadcast codebook."""
    return _nearest(embeddings,
                    _centroids_rows(embeddings, n_centroids),
                    n_assign)


def ivf_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 10,
             n_centroids: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-lite approximate top-k: search only vectors assigned to the
    query's ``n_probe`` nearest centroids."""
    # compute the k-means subplan ONCE, collect the (tiny) codebook
    # once, broadcast it ONCE, and share the broadcast between
    # assignment and probing
    cent_rows = _centroids_rows(embeddings, n_centroids)
    bc = codebook_broadcast(embeddings.sparkSession, cent_rows)
    assigned = _nearest(embeddings, cent_rows, 1, bc=bc)

    q = (embeddings.where(F.col('vec_id') < n_queries)
         .select(F.col('vec_id').alias('query_id'),
                 F.col('embedding').alias('qv')))
    # probe selection is the same nearest-centroid problem at
    # n_assign=n_probe — map-only, no per-query window exchange
    probe_udf = nearest_centroid_udf(
        embeddings.sparkSession, cent_rows, n_probe, bc=bc)
    probes = q.select('query_id', 'qv',
                      F.explode(probe_udf(F.col('qv')))
                      .alias('centroid_id'))

    cand = (probes.join(assigned, 'centroid_id')
            .where(F.col('query_id') != F.col('vec_id'))
            .select('query_id', F.col('vec_id').alias('neighbor_id'),
                    cosine_x10000_np(F.col('qv'), F.col('embedding'))
                    .alias('cos_x10000')))
    w2 = Window.partitionBy('query_id').orderBy(
        F.desc('cos_x10000'), F.asc('neighbor_id'))
    return (cand.withColumn('rank', F.row_number().over(w2))
            .where(F.col('rank') <= k)
            .select('query_id', 'neighbor_id', 'rank', 'cos_x10000'))
