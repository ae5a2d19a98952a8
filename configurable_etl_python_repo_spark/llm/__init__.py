"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY.md §2), these are the operators a
100 TB LLM-data pipeline needs: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search, text analysis
(language ID, quality scoring, token counting, fingerprinting), and
multimodal column plumbing. All hot paths are built-in Column expressions;
Python appears only in Arrow-batched pandas UDFs where Spark genuinely lacks
the primitive.
"""

from .text import (  # noqa: F401
    backoff_lm_table,
    backoff_surprisal,
    backoff_surprisal_stream,
    chunk_documents,
    text_stats,
    language_id,
    language_id_ngram,
    fingerprint,
    gopher_line_rules,
    pack_sequences,
    perplexity_partition,
    repetition_stats,
    token_count_bpe_ish,
)
from .dedup import (  # noqa: F401
    decontaminate,
    decontaminate_stream,
    dedup_exact,
    dedup_spans,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash32,
    simhash64,
    simhash_pairs,
)
from .dedup_index import (  # noqa: F401
    dedup_against_index,
    embedding_against_index,
    embedding_build_index,
    embedding_extend_index,
    minhash_build_index,
    minhash_extend_index,
    simhash_against_index,
    simhash_build_index,
    simhash_extend_index,
)
from .scrub import pii_scrub  # noqa: F401
from .similarity import (  # noqa: F401
    brute_force_topk,
    embedding_cosine_pairs,
    ivf_build_index,
    ivf_extend_index,
    ivf_search_index,
    ivf_topk,
    ivf_topk_kmeans,
    lsh_bucketed_topk,
)
from .clusters import connected_components, dedup_clusters  # noqa: F401
from .sampling import (  # noqa: F401
    dsir_select,
    dsir_weights,
    hash_sample,
    mixture_sample,
    stratified_sample,
)
