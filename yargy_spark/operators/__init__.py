"""Corpus-level Spark operators (one module per family; see
COVERAGE.md for the operator -> test -> query map)."""

from .extract import extract_mentions            # noqa: F401
from .linking import (apply_entity_merges,       # noqa: F401
                      connected_components,
                      entity_cooccurrence, entity_degree,
                      entity_key_table, link_entities,
                      link_entities_incremental, mention_edges)
from .triples import materialize_triples         # noqa: F401
from .tokens import (annotate_lemmas,            # noqa: F401
                     lexicon_table, token_table)
from .events import asof_join                    # noqa: F401
from .dedup import (clean_corpus, decontaminate,  # noqa: F401
                    dedup_increment, exact_dedup,
                    embedding_dup_pairs, minhash_lsh_pairs,
                    minhash_signatures, minhash_state,
                    dup_span_scores,
                    ngram_jaccard_pairs, paragraph_dedup,
                    remove_dup_spans, row_signatures,
                    simhash_docs, word_shingles)
from .sampling import (hash_split,               # noqa: F401
                       mixture_epochs, mixture_sample,
                       stratified_sample, stratum_reservoir,
                       temperature_weights)
from .packing import (context_windows,           # noqa: F401
                      materialize_sequences, pack_sequences)
from .similarity import (cosine_topk, ivf_topk,  # noqa: F401
                         query_topk)
from .textstats import (corpus_vocabulary,       # noqa: F401
                        doc_fingerprints, filter_corpus, lang_id,
                        pii_scrub, quality_scores, re_token_count,
                        rare_token_scores,
                        repetition_scores, token_counts, top_ngrams,
                        ws_token_count)
from .multimodal import (audio_stats,            # noqa: F401
                         decode_image, decode_png, decode_stats,
                         decode_wav, decode_y4m, encode_png,
                         encode_png_palette, encode_ppm, encode_wav,
                         encode_y4m, extract_features,
                         media_metadata, sample_frames, synth_media,
                         synth_ppm_media)
from .jpeg import decode_jpeg, encode_jpeg       # noqa: F401
