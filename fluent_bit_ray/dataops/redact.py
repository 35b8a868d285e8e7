"""PII redaction over a text column — the scrubbing stage every
training-data pipeline runs before anything else touches the corpus.

Fluent Bit users do this with modify/lua filters (SURVEY §2.4); here
it is one vectorized ``map_batches`` stage: an ORDERED list of
RE2-compatible patterns applied sequentially with
``pyarrow.compute.replace_substring_regex`` (zero-copy Arrow in/out,
no Python row loop). Counting happens sequentially too — each
pattern's hit count is measured on the text AS LEFT by the previous
replacements, so overlapping grammars (an IPv4 inside an email) never
double-count and the DuckDB oracle can chain the same
regexp_replace/regexp_extract_all steps to identical results.

The pattern list is importable (`PII_PATTERNS`) so the oracle SQL is
generated from the exact same strings the engine compiles.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — ORDER IS SEMANTIC (sequential).
# RE2-only constructs (no lookarounds) so Arrow and DuckDB agree.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_batch(b: pa.Table, text_col: str = "text",
                 out_col: str = "text_redacted",
                 count_col: str = "n_redactions") -> pa.Table:
    """One batch: text → redacted text + total replacement count."""
    cur = b.column(text_col)
    if isinstance(cur, pa.ChunkedArray):
        cur = cur.combine_chunks()
    cur = cur.cast(pa.string())
    total = None
    for _name, pat, repl in PII_PATTERNS:
        hits = pc.count_substring_regex(cur, pattern=pat)
        total = hits if total is None else pc.add(total, hits)
        cur = pc.replace_substring_regex(cur, pattern=pat,
                                         replacement=repl)
    out = b.append_column(out_col, cur)
    return out.append_column(count_col,
                             pc.cast(total, pa.int64()))


def redact_ds(ds, text_col: str = "text"):
    """Dataset → Dataset with text_redacted + n_redactions columns."""
    return ds.map_batches(
        lambda b: redact_batch(b, text_col=text_col),
        batch_format="pyarrow")
