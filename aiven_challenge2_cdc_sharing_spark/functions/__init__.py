from .text import (
    doc_fingerprint,
    lang_id_stopwords,
    quality_score,
    token_count,
    tokenize,
)

__all__ = [
    "doc_fingerprint",
    "lang_id_stopwords",
    "quality_score",
    "token_count",
    "tokenize",
]
