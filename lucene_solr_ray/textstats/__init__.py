from .ops import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
