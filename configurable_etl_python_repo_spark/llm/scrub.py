"""PII scrubbing for training-data curation: detect and redact emails,
SSNs, IPv4 addresses, and US-style phone numbers with typed replacement
tokens, plus per-category match counts for audit/reporting.

The reference pipeline has no PII stage (its gold sink stores clinical
identifiers verbatim, `Configurable_ETL_Python.py:559-578`); this is part
of the training-data surface the engine adds. Everything is
`regexp_count`/`regexp_replace` — whole-stage codegen, zero shuffles, a
pure scan-stage map at 100 TB. The patterns stick to the common
Java-regex/RE2 subset so the DuckDB oracle replays them bit-for-bit.

Counts are computed per category on the ORIGINAL text (before any
replacement), so categories report independently even where one scrub
would destroy a later pattern's context; replacements then apply in
PII_PATTERNS order (SSN before phone: 3-2-4 vs 3-3-4 groupings are
disjoint, but ordering makes that explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, regex, replacement token), applied in order. Regexes avoid
#: lookbehind quirks and stay in the Java/RE2 common subset.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


#: extracts the host of every http(s) URL as capture group 1, with a
#: leading 'www.' stripped by the non-capturing group (keeps the whole
#: normalization inside ONE codegen regexp — no lambda HOF needed);
#: Java-regex/RE2 common subset, like PII_PATTERNS
URL_HOST_PATTERN = r"https?://(?:www\.)?([A-Za-z0-9.-]+)"


def url_blocklist_filter(
    df: DataFrame,
    blocked_domains: "list[str] | tuple[str, ...]",
    text_col: str = "text",
    mode: str = "flag",
) -> DataFrame:
    """Domain-blocklist curation (the UT1/URL-filter stage of web-corpus
    pipelines): extract every http(s) URL host from the text, normalize
    (lowercase, strip a leading 'www.'), and test membership in
    `blocked_domains` (exact-domain matching, normalized the same way —
    subdomain suffix matching would need a per-element lambda; stated
    limitation).

    mode='flag' annotates every row with `n_urls` (total URL count),
    `n_blocked_domains` (DISTINCT blocked hosts present), and `blocked`;
    mode='drop' keeps only clean rows, un-annotated.

    Pure scan-stage Column work: regexp_extract_all + array_distinct +
    array_intersect against a literal array — zero shuffles, codegen,
    and the blocklist rides the plan as a literal (fine for real
    blocklists of 10^4-10^5 domains; beyond that, broadcast-join a
    blocklist table instead)."""
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    norm_blocked = sorted(
        {d.lower().removeprefix("www.") for d in blocked_domains}
    )
    # NULL text counts as zero URLs: without the coalesce, Spark's
    # size(NULL) = -1 leaks nonsense counts and diverges from the oracle
    hosts = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit(URL_HOST_PATTERN), 1,
    )
    hit = F.array_intersect(
        F.array_distinct(hosts), F.lit(norm_blocked).cast("array<string>")
    )
    out = df.withColumns(
        {
            "n_urls": F.size(hosts).cast("long"),
            "n_blocked_domains": F.size(hit).cast("long"),
            "blocked": F.size(hit) > 0,
        }
    )
    if mode == "drop":
        return out.where(~F.col("blocked")).drop(
            "n_urls", "n_blocked_domains", "blocked"
        )
    return out


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-category match counts (`pii_email`, `pii_ssn`, `pii_ipv4`,
    `pii_phone`, long), their sum `pii_total`, and the redacted text as
    `<text_col>_scrubbed` (original column kept — drop it downstream with
    REMOVE COLUMN when exporting)."""
    text = F.col(text_col)
    counts = {
        f"pii_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }
    out = df.withColumns(counts)
    total = None
    for name in counts:
        total = F.col(name) if total is None else total + F.col(name)
    scrubbed = text
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return out.withColumn("pii_total", total).withColumn(
        f"{text_col}_scrubbed", scrubbed
    )
