"""PII detection and redaction for training-data pipelines.

Not in the reference (no text layer); this is the standard pre-release
scrub (e.g. the BigScience ROOTS / StarCoder pipelines redact emails,
IPs and phone-like digit runs from code corpora before training).

Patterns are deliberately kept inside the regex subset that Java's
engine (Spark) and RE2 (DuckDB, Go tooling) interpret identically —
no lookaround, no backreferences — so the same rule set is portable
across the pipeline and its oracles:

  email  [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}
  ipv4   \\b(\\d{1,3}\\.){3}\\d{1,3}\\b
  phone  \\+\\d{7,15}            (international E.164-ish form)

Detection and replacement are regexp_extract_all / regexp_replace —
pure codegen string ops, one pass, no shuffle, composing with the
other per-row text stages into a single projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{7,15}"

_RULES = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Append per-kind match counts (n_emails, n_ipv4, n_phones)."""
    out = df
    for kind, pat, _ in _RULES:
        out = out.withColumn(
            f"n_{kind}s" if kind != "ipv4" else "n_ipv4",
            F.size(F.regexp_extract_all(F.col(col), F.lit(pat), F.lit(0)))
            .cast("long"),
        )
    return out


def redact_pii(
    df: DataFrame, col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Append `out_col` with every PII match replaced by its tag.

    Order matters: emails go first (an address would otherwise lose
    only its IP-looking host part), then IPs, then phone runs.
    """
    redacted = F.col(col)
    for _, pat, tag in _RULES:
        redacted = F.regexp_replace(redacted, pat, tag)
    return df.withColumn(out_col, redacted)
