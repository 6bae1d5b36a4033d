"""Reusable DataFrame → DataFrame operators beyond stock Spark SQL.

These fill the gaps in the reference's declared surface (SURVEY.md §2) where
Spark has no single built-in: as-of/temporal joins (J7), interval joins as a
batch analog (J6), HOP and CUMULATE windows (W2), and MATCH_RECOGNIZE-lite
sequence patterns (W9). Every operator is a composition of built-in
expressions — one shuffle keyed by the join/group key, no Python row loops —
so the plans scale to arbitrary input sizes.
"""

from .cep import sequence_pattern
from .match_recognize import (
    match_recognize,
    match_recognize_stream,
    parse_match_recognize,
    sql_match_recognize,
)
from .joins import asof_join, interval_join
from .skew import hot_keys, salted_join
from .text import pii_counts, scrub_pii
from .windows import cumulate_window, hop_window

__all__ = [
    "asof_join",
    "interval_join",
    "salted_join",
    "hot_keys",
    "hop_window",
    "cumulate_window",
    "sequence_pattern",
    "match_recognize",
    "match_recognize_stream",
    "parse_match_recognize",
    "sql_match_recognize",
    "scrub_pii",
    "pii_counts",
]
