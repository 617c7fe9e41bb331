"""Normalized (punctuation/case-insensitive) column resolution.

The reference matches config-declared column names to actual table
columns by stripping non-alphanumerics and lowercasing (`_norm_name`,
reference RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:399-404, and again at
REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:316-319,1301-1307), so a
config entry "Appt Provider" resolves to a CSV header
"appt_provider". Spark's ``spark.sql.caseSensitive=false`` covers case
only — punctuation-insensitivity lives here, in the engine layer
(SURVEY §1.3).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_NORM_RE = re.compile(r"[^0-9a-z]")


def norm_name(name: str) -> str:
    """Lowercase and strip every non-alphanumeric character."""
    return _NORM_RE.sub("", name.lower())


class ColumnResolver:
    """Resolve config-side names against a DataFrame's actual columns.

    First-wins on normalized collisions (matching the reference's
    dict-build order semantics).
    """

    def __init__(self, columns: list[str]):
        self.columns = list(columns)
        self._by_norm: dict[str, str] = {}
        for c in columns:
            self._by_norm.setdefault(norm_name(c), c)

    @classmethod
    def for_df(cls, df: DataFrame) -> "ColumnResolver":
        return cls(df.columns)

    def resolve(self, name: str) -> str | None:
        """Exact match wins; fall back to normalized match."""
        if name in self.columns:
            return name
        return self._by_norm.get(norm_name(name))

    def resolve_or_raise(self, name: str) -> str:
        got = self.resolve(name)
        if got is None:
            raise KeyError(
                f"column {name!r} (normalized {norm_name(name)!r}) not found "
                f"among {self.columns}"
            )
        return got

    def resolve_many(self, names: list[str]) -> dict[str, str | None]:
        return {n: self.resolve(n) for n in names}

    def missing(self, names: list[str]) -> list[str]:
        return [n for n in names if self.resolve(n) is None]
