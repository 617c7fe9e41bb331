"""Column-expression compilers: config-declared transforms, mappings,
and predicates compiled to native Catalyst ``Column`` expressions.

Everything here emits built-in ``pyspark.sql.functions`` expressions —
no Python UDFs — so the hot path stays inside whole-stage codegen.
"""

from ulh_etl_spark.functions.transforms import (  # noqa: F401
    column_regex_replace,
    column_strip,
    concat_mapping,
    dummy_key,
    split_reorder,
    value_map,
)
from ulh_etl_spark.functions.predicates import compile_predicate  # noqa: F401
