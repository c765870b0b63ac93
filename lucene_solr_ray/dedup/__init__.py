from .components import (  # noqa: F401
    connected_components,
    dedup_clusters,
    star_edges,
)
from .ops import (  # noqa: F401
    dedup_exact,
    dedup_minhash_lsh,
    dedup_minhash_verified,
    embedding_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
