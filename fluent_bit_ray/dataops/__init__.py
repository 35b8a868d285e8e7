from .textstats import (fingerprint_ds, langid_ds, normalize_ds,  # noqa: F401
                        quality_ds, token_count_ds, vocab_topk)
from .redact import redact_ds  # noqa: F401
from .search import (bm25_topk, corpus_length_stats,  # noqa: F401
                     document_frequencies, hybrid_search_topk,
                     keyword_search_topk)
from .boilerplate import boilerplate_keys, remove_boilerplate  # noqa: F401
from .segdedup import segment_dedup, segment_drop_pairs  # noqa: F401
from .cluster import (cluster_balanced_sample, kmeans,  # noqa: F401
                      kmeans_fit, semantic_dedup_pairs)
from .classifier import quality_model_scores  # noqa: F401
from .lm import ngram_lm_scores  # noqa: F401
from .bpe import (bpe_tokenize_counts, bpe_train,  # noqa: F401
                  bpe_train_sql)
from .dedup import (  # noqa: F401
    embedding_dup_pairs,
    exact_dedup,
    minhash_dup_pair_counts,
    minhash_dup_pairs,
    ngram_jaccard_pairs,
    simhash_ds,
    simhash_dup_pairs,
)
from .annsearch import brute_force_topk, ivf_topk, lsh_topk  # noqa: F401
from .sft import (collapse_repeats, conversation_gate,  # noqa: F401
                  render_conversations, sft_examples)
from .transitions import tool_transitions  # noqa: F401
from .sketch import (  # noqa: F401
    cms_estimate,
    cms_registers,
    hll_estimate,
    hll_registers,
)
from .curation import (  # noqa: F401
    benchmark_ngram_hashes,
    chunk_docs,
    column_quantiles,
    curate_corpus,
    decontaminate,
    grouped_topk,
    epoch_shuffle,
    hash_sample,
    hash_split,
    mix_by_source,
    pack_sequences,
    repetition_stats,
    stratified_sample,
)
