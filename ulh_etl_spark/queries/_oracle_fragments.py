"""Shared DuckDB SQL fragments mirroring the engine's md5-based text
primitives (ulh_etl_spark.operators.text) so generated oracle SQL
stays in lockstep with the Spark expressions."""

from __future__ import annotations

from ulh_etl_spark.operators.dedup import MINHASH_A, MINHASH_B
from ulh_etl_spark.operators.text import MERSENNE31, WS_CLASS

# the escape syntax in WS_CLASS ([ \t\n\x0B\f\r]) parses identically
# in RE2, and DuckDB string literals keep backslashes verbatim, so
# the engine constant drops straight into the SQL — one definition,
# zero drift (Java \s vs RE2 \s disagree on \x0B; see operators.text)
WS = WS_CLASS


def md5h(expr: str) -> str:
    """32-bit md5-prefix hash — identical to text.md5_hash32."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def grams(expr: str, n: int) -> str:
    """Character n-grams — identical to text.char_ngrams."""
    return (
        f"list_transform(generate_series(1, greatest(length({expr}) - {n - 1}, 1)), "
        f"i -> substr({expr}, i, {n}))"
    )


def ws_tokens(expr: str) -> str:
    """Whitespace tokens — identical to text.whitespace_tokens."""
    return f"list_filter(string_split_regex({expr}, '{WS}+'), t -> t <> '')"


def norm_text(expr: str) -> str:
    """Normalized text — identical to text.normalized_text."""
    return (
        "trim(regexp_replace(regexp_replace("
        f"lower({expr}), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    )


def minhash_expr(hashes_expr: str, j: int) -> str:
    """j-th MinHash value — identical to dedup.minhash_columns."""
    a, b = MINHASH_A[j], MINHASH_B[j]
    return (
        f"list_min(list_transform({hashes_expr}, "
        f"h -> ({a} * h + {b}) % {MERSENNE31}))"
    )


def simhash_expr(hashes_expr: str, bits: int) -> str:
    """SimHash fingerprint — identical to dedup.simhash."""
    terms = []
    for b in range(bits):
        s = (
            f"list_sum(list_transform({hashes_expr}, "
            f"h -> CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {s} > 0 THEN {1 << b} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def html_to_text(expr: str) -> str:
    """HTML -> text extraction — identical chain to
    operators.text.html_to_text (RE2-safe patterns, 'g' flag: DuckDB
    replaces first-match-only by default where Spark replaces all)."""
    out = f"regexp_replace({expr}, '(?is)<script\\b[^>]*>.*?</script{WS}*>', ' ', 'g')"
    out = f"regexp_replace({out}, '(?is)<style\\b[^>]*>.*?</style{WS}*>', ' ', 'g')"
    out = f"regexp_replace({out}, '(?s)<!--.*?-->', ' ', 'g')"
    out = f"regexp_replace({out}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        out = f"replace({out}, '{ent}', '{ch}')"
    return f"trim(regexp_replace({out}, '{WS}+', ' ', 'g'))"
