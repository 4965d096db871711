from .text import (  # noqa: F401
    any_answer_contained,
    exact_match,
    first_line,
    normalize_question,
    normalize_text,
    substring_match,
    words,
)
from .hashing import portable_hash64, token_id  # noqa: F401
