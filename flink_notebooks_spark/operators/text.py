"""Text-curation operators: PII scrubbing.

Part of the training-data pipeline surface (SURVEY.md §7.1 step 8 north-star
extensions): redact personally-identifying patterns from a text column before
a corpus ships to training. Pure ``regexp_replace`` / ``regexp_extract_all``
expressions — whole-stage codegen, map-only, no shuffle, so the operator is
embarrassingly parallel at any corpus size.

The synthetic ``documents`` fixture contains no PII, so this operator is
exercised by unit tests on adversarial synthetic strings rather than a
declared oracle query (tests/test_text_ops.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deliberately linear-time patterns: character classes + bounded repetition,
# no alternation-of-prefix or lookaround (catastrophic backtracking on
# adversarial corpus text is a real availability risk at scale).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # order matters: emails before ipv4 (an email's dotted domain must not be
    # half-eaten as an address first), ipv4 before phone (digit runs).
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d[\d().\-\s]{6,}\d\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-kind match-count expressions (for audit metrics)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, (pat, _) in PII_PATTERNS.items()
    }


def scrub_pii(
    df: DataFrame,
    col: str,
    kinds: tuple[str, ...] = ("email", "ipv4", "ssn", "phone"),
    with_counts: bool = True,
) -> DataFrame:
    """Replace PII matches in ``df[col]`` with typed placeholder tokens.

    ``kinds`` applies in the given order (earlier patterns must not be
    partially consumed by later ones — see PII_PATTERNS). When
    ``with_counts``, an ``n_pii_<kind>`` audit column per kind counts the
    redactions made in the ORIGINAL text.
    """
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"scrub_pii: unknown kinds {unknown}")
    out = df
    if with_counts:
        counts = pii_counts(col)
        for k in kinds:
            out = out.withColumn(f"n_pii_{k}", counts[k])
    scrubbed = F.col(col)
    for k in kinds:
        pat, repl = PII_PATTERNS[k]
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(col, scrubbed)
