"""Text analysis operators: language id, quality scoring, token
counting, document fingerprinting.

All JVM-side expressions (regexp/split/aggregate — no Python UDFs).
Every ratio is emitted as floor(x * 10000) so cross-engine oracles
hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_int, word_shingles

# minimal multi-language stopword probe sets (heuristic langid + the
# stopword-ratio quality feature)
EN_STOP = ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for']

# portable "BPE-ish" token pattern: letter runs (Latin AND Cyrillic —
# a Latin-only run class would count one token per character on the
# project's primary Russian corpus), digit runs, single non-alnum
# non-whitespace marks
TOKEN_PATTERN = '[a-zа-яё]+|[0-9]+|[^a-zа-яё0-9\\s]'


def lang_id(docs: DataFrame) -> DataFrame:
    """Character-range n-gram heuristic language id: script detection
    first (cyrillic / CJK / arabic), then an English stopword-density
    test within latin script.  (doc_id, detected_lang)."""
    text = F.lower(F.col('text'))
    n_chars = F.greatest(F.length('text'), F.lit(1))
    cyr = F.length(F.regexp_replace(text, '[^а-яё]', ''))
    cjk = F.length(F.regexp_replace(F.col('text'), r'[^一-鿿]', ''))
    # split on non-letter runs: 'the\ncat' and 'the,cat' both
    # surface their stopwords (a literal-space split misses them)
    words = F.split(text, '[^a-z]+')
    stop_hits = F.size(F.array_intersect(
        words, F.array(*[F.lit(w) for w in EN_STOP])))
    detected = (
        F.when(F.lit(10000) * cyr / n_chars > 300, 'ru')
        .when(F.lit(10000) * cjk / n_chars > 300, 'zh')
        .when(stop_hits >= 1, 'en')
        .otherwise('und'))
    return docs.select('doc_id', detected.alias('detected_lang'))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Gopher-style quality features + keep/drop flag:
    (doc_id, n_chars_txt, n_words, mean_word_len_x100,
     punct_ratio_x10000, stop_ratio_x10000, keep)."""
    text = F.lower(F.col('text'))
    # ANY whitespace separates words: a literal-space split would
    # collapse newline/tab-separated documents to n_words=1 and
    # auto-drop perfectly fine line-wrapped text
    words = F.split(F.trim(text), r'\s+')
    n_words = F.size(words)
    n_chars = F.length('text')
    # Unicode letter/digit classes: [a-z0-9] would score every
    # Cyrillic (or any non-Latin) document as ~100% punctuation and
    # auto-drop it — fatal for the project's primary Russian corpus;
    # \s in the keep-class so line breaks are not "punctuation"
    punct = F.length(F.regexp_replace(text, r'[\p{L}\p{N}\s]', ''))
    alpha_len = F.length(F.regexp_replace(text, r'[^\p{L}\p{N}]', ''))
    mean_wl = F.floor(F.lit(100.0) * alpha_len
                      / F.greatest(n_words, F.lit(1)))
    stop_hits = F.aggregate(
        F.transform(words, lambda w: F.when(
            w.isin(EN_STOP), 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v)
    stop_ratio = F.floor(F.lit(10000.0) * stop_hits
                         / F.greatest(n_words, F.lit(1)))
    punct_ratio = F.floor(F.lit(10000.0) * punct
                          / F.greatest(n_chars, F.lit(1)))
    # when/otherwise(0), not a bare boolean cast: null text must
    # yield keep=0 like the oracle's CASE ... ELSE 0, never NULL
    keep = F.when((n_words >= 10) & (n_chars >= 50)
                  & (mean_wl >= 200) & (mean_wl <= 1000)
                  & (punct_ratio <= 2000),
                  F.lit(1)).otherwise(F.lit(0))
    return docs.select(
        'doc_id',
        n_chars.alias('n_chars_txt'),
        n_words.alias('n_words'),
        mean_wl.cast('long').alias('mean_word_len_x100'),
        punct_ratio.cast('long').alias('punct_ratio_x10000'),
        stop_ratio.cast('long').alias('stop_ratio_x10000'),
        keep.alias('keep'))


def ws_token_count(text_col=None):
    """Whitespace token-count expression (shared by ``token_counts``,
    ``packing.pack_sequences`` and ``sampling.mixture_sample`` so the
    three can never count differently).  split('') yields [''] (size
    1): empty/whitespace-only docs must count 0 tokens, not 1.
    DuckDB replay: ``CASE WHEN length(trim(lower(text))) = 0 THEN 0
    ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+')) END``.
    """
    text = F.lower(text_col if text_col is not None else F.col('text'))
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(F.trim(text), r'\s+')))


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + regex (BPE-ish) token count."""
    text = F.lower(F.col('text'))
    re_toks = F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN),
                                          F.lit(0)))
    return docs.select('doc_id', ws_token_count().alias('ws_tokens'),
                       re_toks.alias('re_tokens'))


def doc_fingerprints(docs: DataFrame, n: int = 4,
                     k: int = 3) -> DataFrame:
    """Winnowing-style fingerprint: the ``n`` smallest distinct
    word-shingle hashes per document -> (doc_id, fp_rank, fp_hash)."""
    sh = word_shingles(docs, k).select(
        'doc_id', md5_int(F.col('shingle')).alias('fp_hash')).distinct()
    w = Window.partitionBy('doc_id').orderBy(F.asc('fp_hash'))
    return (sh.withColumn('fp_rank', F.row_number().over(w))
            .where(F.col('fp_rank') <= n)
            .select('doc_id', 'fp_rank', 'fp_hash'))


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide top-k word n-grams by document frequency
    (language-model-style corpus statistics).  Deterministic: ties
    break lexicographically.  One shuffle on the n-gram key with
    map-side partial counts; the final top-k is a tiny sort."""
    grams = word_shingles(docs, k=n)          # distinct per doc
    counts = (grams.groupBy('shingle')
              .agg(F.count('*').alias('df')))
    # distributed top-k (TakeOrderedAndProject) FIRST — an
    # unpartitioned row_number window would drag the whole distinct
    # n-gram vocabulary through one task; the rank window then runs
    # over only k rows
    top = counts.orderBy(F.desc('df'), F.asc('shingle')).limit(k)
    w = Window.orderBy(F.desc('df'), F.asc('shingle'))
    return (top.withColumn('rank', F.row_number().over(w))
            .select('rank', F.col('shingle').alias('ngram'), 'df'))
