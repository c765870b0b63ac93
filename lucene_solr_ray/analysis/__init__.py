from .analyzers import (  # noqa: F401
    standard_analyzer,
    tokenize_batch,
    word_delimiter_parts,
)
from .htmlstrip import html_to_text  # noqa: F401
from .lowercase import java_lower  # noqa: F401
from .tokenizer import standard_tokenize, MAX_TOKEN_LENGTH  # noqa: F401
