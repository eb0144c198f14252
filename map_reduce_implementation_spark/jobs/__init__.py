"""Reference-parity jobs (SURVEY.md §2.2, §2.4, §3).

The reference ships exactly two user jobs — a letter counter and a
whole-word line finder (reference ``usr_functions.c``). Both are
re-expressed here as declarative DataFrame pipelines so Catalyst plans
them (partial/final aggregation, predicate pushdown) instead of the
reference's hand-rolled fork/file dataflow.
"""

from .letter_counter import letter_counter, letter_domain
from .word_finder import whole_word_pattern, word_finder

__all__ = ["letter_counter", "letter_domain", "word_finder", "whole_word_pattern"]
