"""Unit tests for the transform compilers — semantics pinned to the
reference behaviors called out in SURVEY §2.7/§7.4 (first-match-wins
chains, null part handling, null-fill vs plain concat)."""

from pyspark.sql import functions as F

from ulh_etl_spark.functions.predicates import FilterClause, apply_source_filter
from ulh_etl_spark.functions.transforms import (
    RegexRule,
    column_regex_replace,
    column_strip,
    concat_mapping,
    dummy_key,
    split_reorder,
    value_map,
)


def _vals(spark, data, expr):
    df = spark.createDataFrame([(d,) for d in data], ["v"])
    return [r[0] for r in df.select(expr(F.col("v")).alias("out")).collect()]


def test_regex_chain_first_match_wins(spark):
    rules = [
        RegexRule(search="x", replace="1", match_substring="a"),
        RegexRule(search="x", replace="2", match_substring="b"),
    ]
    out = _vals(spark, ["ax", "bx", "abx", "cx"], lambda c: column_regex_replace(c, rules))
    # "abx" contains both 'a' and 'b' -> first rule applies
    assert out == ["a1", "b2", "ab1", "cx"]


def test_regex_chain_unconditional_rule(spark):
    rules = [RegexRule(search="-", replace="_")]
    assert _vals(spark, ["a-b-c"], lambda c: column_regex_replace(c, rules)) == ["a_b_c"]


def test_split_reorder_last_first(spark):
    out = _vals(
        spark,
        ["Smith, Jane", "Solo"],
        lambda c: split_reorder(c, ",", [1, 0], join_with=" "),
    )
    # out-of-range part -> NULL -> concat_ws skips it (Snowflake parity)
    assert out == ["Jane Smith", "Solo"]


def test_column_strip(spark):
    out = _vals(spark, ["{abc-123}"], lambda c: column_strip(c, "{}-"))
    assert out == ["abc123"]


def test_value_map_case_insensitive_and_passthrough(spark):
    m = {"Declined": "DECL"}
    out = _vals(
        spark,
        ["Declined", "declined", "other"],
        lambda c: value_map(c, m, prefix="st:"),
    )
    assert out == ["st:DECL", "st:DECL", "st:other"]


def test_dummy_key(spark):
    df = spark.createDataFrame(
        [("MBI1", "p1"), ("", "p2"), ("  ", "p3"), (None, "p4")], ["mbi", "pat"]
    )
    out = [
        r[0]
        for r in df.select(dummy_key(F.col("mbi"), F.col("pat")).alias("k")).collect()
    ]
    assert out == ["MBI1", "NOMBI_p2", "NOMBI_p3", "NOMBI_p4"]


def test_concat_null_fill_vs_plain(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    filled = df.select(
        concat_mapping([F.col("x"), F.col("y")], "|", null_fill=True).alias("o")
    ).collect()[0][0]
    plain = df.select(
        concat_mapping([F.col("x"), F.col("y")], "|", null_fill=False).alias("o")
    ).collect()[0][0]
    assert filled == "a|"  # SQL path keeps separator, null -> ''
    assert plain == "a"  # row path drops null part and separator


def test_predicate_compiler_ops(spark):
    df = spark.createDataFrame(
        [("Y", 5, "abc"), ("N", 9, "xyz"), (None, 3, "abq")], ["elig", "n", "s"]
    )
    got = apply_source_filter(
        df,
        [
            FilterClause("ELIG", "=", "Y"),  # resolver: case-insensitive
            FilterClause("n", "<=", 5),
            FilterClause("s", "LIKE", "ab%"),
        ],
    ).collect()
    assert len(got) == 1 and got[0]["elig"] == "Y"

    got = apply_source_filter(df, [FilterClause("elig", "IS NULL")]).collect()
    assert len(got) == 1 and got[0]["n"] == 3

    got = apply_source_filter(df, [FilterClause("s", "IN", "abc, xyz")]).collect()
    assert len(got) == 2
