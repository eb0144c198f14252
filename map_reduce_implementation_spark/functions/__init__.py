from .text import normalize_text, tokens, word_ngrams

__all__ = ["tokens", "normalize_text", "word_ngrams"]
