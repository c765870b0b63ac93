from .corpus import corpus_table, synthesize_corpus  # noqa: F401
