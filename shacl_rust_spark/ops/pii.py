"""PII detection & redaction for corpus curation.

Pure-Column regex ops (JVM-side, whole-stage codegen — no Python in the
hot path): count and redact email / NANP-phone / IPv4 occurrences per
document. Patterns are deliberately RE2-safe (no lookaround, no
backreferences) so the same source text produces identical matches in
Spark's java.util.regex and the DuckDB oracle's RE2 — and in any other
engine a deployment cross-checks against.

Redaction order is fixed (emails, then phones, then IPs) and part of
the contract: an email's host can contain digit runs an IP pattern
would otherwise nibble at, so later patterns must see earlier
placeholders, not raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

REDACTIONS = [
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
]


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII hit counts: (id, n_emails, n_phones, n_ips,
    has_pii). One projection over the scan — counts are the cheap
    audit pass a pipeline runs before deciding to redact or drop."""
    t = F.col(text_col)
    n_e = F.regexp_count(t, F.lit(EMAIL_RE))
    n_p = F.regexp_count(t, F.lit(PHONE_RE))
    n_i = F.regexp_count(t, F.lit(IPV4_RE))
    return docs.select(
        F.col(id_col),
        n_e.alias("n_emails"),
        n_p.alias("n_phones"),
        n_i.alias("n_ips"),
        ((n_e + n_p + n_i) > 0).alias("has_pii"),
    )


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document redacted text: every match replaced by its typed
    placeholder, in the fixed REDACTIONS order."""
    out = F.col(text_col)
    for pat, repl in REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return docs.select(F.col(id_col), out.alias("redacted"))


def k_anonymity(
    df: DataFrame, quasi_cols: tuple, k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: one row
    per distinct quasi-identifier tuple with its equivalence-class
    size and a 0/1 `is_safe` flag (size ≥ k). A release is
    k-anonymous iff every class is safe; the per-class table is what
    the curation run actually needs — which combinations to suppress
    or generalize before publishing. Companion to pii_scan: that
    finds direct identifiers, this measures re-identification risk
    from the indirect ones.

    Plan: one groupBy on the quasi columns (single shuffle with
    map-side partial counts); output is class-cardinality, bounded by
    the quasi-space, not the corpus."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn(
            "is_safe",
            F.when(F.col("class_size") >= k, F.lit(1))
            .otherwise(F.lit(0)).cast("bigint"),
        )
    )


CARD_RE = r"\b[0-9]{16}\b"


def _luhn_sum_expr(var: str, n: int = 16) -> str:
    """SQL text of the Luhn digit sum over the first ``n`` chars of a
    digit-string expression ``var`` (16-digit card layout: odd
    1-based positions — even from the right — double with the −9
    adjust). Shared between the validator, the gate's check-digit
    construction (n=15), and the DuckDB oracle's closed forms."""
    terms = []
    for i in range(1, n + 1):
        d = f"CAST(substring({var}, {i}, 1) AS INT)"
        if i % 2 == 1:
            terms.append(f"(CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 "
                         f"ELSE 2*{d} END)")
        else:
            terms.append(d)
    return " + ".join(terms)


def luhn_card_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Payment-card detection with Luhn validation: 16-digit
    candidates from one regexp pass, then the ISO/IEC 7812 check —
    the false-positive filter that separates card numbers from
    order ids and timestamps (a random 16-digit string passes Luhn
    1 time in 10). Output (id, n_card_candidates, n_valid_cards);
    curation drops or redacts on n_valid_cards > 0. Pure Column
    expressions: regexp_extract_all + a filter lambda whose body is
    the unrolled 16-term Luhn sum — JVM-side, no Python."""
    re_sql = "'\\\\b[0-9]{16}\\\\b'"
    cands = F.expr(
        f"regexp_extract_all({text_col}, {re_sql}, 0)")
    valid = F.expr(
        f"size(filter(regexp_extract_all({text_col}, {re_sql}, 0), "
        f"c -> ({_luhn_sum_expr('c')}) % 10 = 0))")
    return docs.select(
        F.col(id_col),
        F.size(cands).cast("bigint").alias("n_card_candidates"),
        valid.cast("bigint").alias("n_valid_cards"),
    )
