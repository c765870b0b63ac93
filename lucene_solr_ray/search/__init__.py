from .bm25 import BM25Params, term_weight  # noqa: F401
from .query import parse_query, Term, Bool, Phrase  # noqa: F401
from .searcher import IndexSearcher, DistributedSearcher  # noqa: F401
from .similarity import (  # noqa: F401
    AxiomaticF2EXP,
    BM25Similarity,
    BooleanSimilarity,
    ClassicSimilarity,
    DFISimilarity,
    IBSimilarity,
    MultiSimilarity,
    PerFieldSimilarityWrapper,
    DFRSimilarity,
    LMDirichletSimilarity,
    LMJelinekMercerSimilarity,
    Similarity,
    SweetSpotSimilarity,
)
