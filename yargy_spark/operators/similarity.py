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
    # zero-norm vectors have no direction: define cosine = 0 rather
    # than NaN (which would cast to null and float through window
    # ranks with engine-dependent placement)
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0,
                  F.floor(F.lit(10000.0) * _dot(a, b) / denom)
                  .cast('long')).otherwise(F.lit(0).cast('long'))


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
                      cosine_x10000(F.col('qv'), F.col('cv'))
                      .alias('cos_x10000')))
    w = Window.partitionBy('query_id').orderBy(
        F.desc('cos_x10000'), F.asc('neighbor_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .where(F.col('rank') <= k)
            .select('query_id', 'neighbor_id', 'rank', 'cos_x10000'))


def _seed_centroids(embeddings: DataFrame,
                    n_centroids: int) -> DataFrame:
    """Hash-sampled seed centroids: the ``n_centroids`` vectors with
    the smallest portable md5 hash of their id.  Unlike 'first N ids',
    this is an unbiased pseudo-random sample of the corpus (ids carry
    no positional meaning under hashing), yet fully deterministic and
    replayable in any SQL engine."""
    from .dedup import md5_int
    hashed = embeddings.select(
        'vec_id', 'embedding',
        md5_int(F.col('vec_id').cast('string')).alias('hsh'))
    w = Window.orderBy(F.asc('hsh'), F.asc('vec_id'))
    return (hashed.withColumn('rn', F.row_number().over(w))
            .where(F.col('rn') <= n_centroids)
            .select((F.col('rn') - 1).alias('centroid_id'),
                    F.col('embedding').alias('centv')))


def _nearest(embeddings: DataFrame, cent: DataFrame,
             n_assign: int = 1) -> DataFrame:
    """(vec_id, embedding, centroid_id) for each vector's ``n_assign``
    nearest centroids; the centroid dimension is broadcast."""
    scored = (embeddings.crossJoin(F.broadcast(cent))
              .select('vec_id', 'embedding', 'centroid_id',
                      cosine_x10000(F.col('embedding'), F.col('centv'))
                      .alias('sim')))
    w = Window.partitionBy('vec_id').orderBy(
        F.desc('sim'), F.asc('centroid_id'))
    return (scored.withColumn('r', F.row_number().over(w))
            .where(F.col('r') <= n_assign)
            .select('vec_id', 'embedding', 'centroid_id'))


def _centroids(embeddings: DataFrame, n_centroids: int,
               lloyd_rounds: int = 1) -> DataFrame:
    """Deterministic seeded k-means centroids (the ONE centroid
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
    return cent


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16,
               n_assign: int = 1) -> DataFrame:
    """Assign every vector to its ``n_assign`` nearest k-means
    centroids; the assignment join broadcasts the centroid
    dimension."""
    return _nearest(embeddings, _centroids(embeddings, n_centroids),
                    n_assign)


def ivf_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 10,
             n_centroids: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-lite approximate top-k: search only vectors assigned to the
    query's ``n_probe`` nearest centroids."""
    # compute the k-means subplan ONCE and share it between
    # assignment and probing
    cent = _centroids(embeddings, n_centroids)
    assigned = _nearest(embeddings, cent, 1)

    q = (embeddings.where(F.col('vec_id') < n_queries)
         .select(F.col('vec_id').alias('query_id'),
                 F.col('embedding').alias('qv')))
    qprobe = (q.crossJoin(F.broadcast(cent))
              .select('query_id', 'qv', 'centroid_id',
                      cosine_x10000(F.col('qv'), F.col('centv'))
                      .alias('sim')))
    w = Window.partitionBy('query_id').orderBy(
        F.desc('sim'), F.asc('centroid_id'))
    probes = (qprobe.withColumn('r', F.row_number().over(w))
              .where(F.col('r') <= n_probe)
              .select('query_id', 'qv', 'centroid_id'))

    cand = (probes.join(assigned, 'centroid_id')
            .where(F.col('query_id') != F.col('vec_id'))
            .select('query_id', F.col('vec_id').alias('neighbor_id'),
                    cosine_x10000(F.col('qv'), F.col('embedding'))
                    .alias('cos_x10000')))
    w2 = Window.partitionBy('query_id').orderBy(
        F.desc('cos_x10000'), F.asc('neighbor_id'))
    return (cand.withColumn('rank', F.row_number().over(w2))
            .where(F.col('rank') <= k)
            .select('query_id', 'neighbor_id', 'rank', 'cos_x10000'))
