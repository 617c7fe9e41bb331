"""Relational operator catalog (SURVEY §2.3-2.7) over the synthetic
star schema, each with a DuckDB oracle.

Scale notes are attached per query: which side broadcasts, where the
shuffle lands, and why the plan survives 100 TB. Floating-point
aggregates are rounded IN BOTH engines so the driver's value-hash is
stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ulh_etl_spark.functions.mapping import ColumnMapping, apply_mappings
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
from ulh_etl_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- A1/A3/A4 + arithmetic: flagship pricing summary (TPC-H Q1 shape) ---
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupBy-agg with computed measures. Scale: partial (map-side)
    aggregation then a 2-key shuffle — the canonical hash-agg plan;
    cardinality of the group key is tiny so AQE coalesces post-shuffle
    partitions. Reference analog: A3/A4 conditional+grouped counts."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- P1/P4/P5/P6/P7: projection + compiled config predicate ---
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-declared predicate compiled to Column exprs (reference P7,
    REFINED...CURATED.py:1267-1299) + renamed projection (P1). Scale:
    filter + pruned column list both push into the parquet scan."""
    orders = _t(spark, sf_dir, "orders")
    filtered = apply_source_filter(
        orders,
        [
            FilterClause("o_orderstatus", "=", "F"),
            FilterClause("o_orderpriority", "IN", "1-URGENT,2-HIGH"),
            FilterClause("o_totalprice", ">", 50000.0),
        ],
    )
    return filtered.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderpriority").alias("priority"),
    )


# --- J1 + F7: broadcast lookup left join -> NEW/UPDATE classification ---
def q03_record_type_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated-stage create-vs-update classifier (reference
    REFINED...CURATED.py:1397-1405): LEFT JOIN a key lookup, CASE on
    null-ness. Scale: the lookup (distinct curated keys) is small
    relative to facts -> explicit broadcast, so the fact table never
    shuffles."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lookup = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("lk_custkey"))
        .distinct()
    )
    return orders.join(
        F.broadcast(lookup), orders.o_custkey == lookup.lk_custkey, "left"
    ).select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.when(F.col("lk_custkey").isNotNull(), F.lit("UPDATE"))
        .otherwise(F.lit("NEW"))
        .alias("record_type"),
    )


# --- A4: distribution over the derived key ---
def q04_record_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY over a derived CASE key (reference :1462-1474)."""
    return (
        q03_record_type_classify(spark, sf_dir)
        .groupBy("record_type")
        .agg(F.count("*").alias("cnt"))
    )


# --- J3: inner self equi-join (config source-query shape) ---
def q05_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self join on the order key picking fields from two line numbers
    (reference config practice_ingest_config.json:280 joins a staging
    table to itself on encounterid). Scale: same-key self join -> one
    shuffle, co-partitioned probe; AQE may convert to SMJ/SHJ."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).alias("a")
    b = li.filter(F.col("l_linenumber") == 2).alias("b")
    return a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"), "inner").select(
        F.col("a.l_orderkey").alias("order_key"),
        F.col("a.l_partkey").alias("part1"),
        F.col("b.l_partkey").alias("part2"),
        F.round(F.col("a.l_extendedprice") + F.col("b.l_extendedprice"), 2).alias(
            "combined_price"
        ),
    )


# --- J4: composite-key lookup join ---
def q06_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on a composite (user_id, event_type) key — the reference
    probes python dicts keyed by tuples (REFINED...CURATED.py:1648-1665);
    here it's a real equi-join on two columns, which Spark hashes as a
    compound key (no struct packing needed)."""
    events = _t(spark, sf_dir, "events")
    lkp = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("type_cnt"),
        F.round(F.sum("value"), 2).alias("type_value"),
    )
    return events.join(lkp, ["user_id", "event_type"], "inner").select(
        "event_id", "user_id", "event_type", "type_cnt", "type_value"
    )


# --- A3: multi-conditional aggregate in one pass ---
def q07_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(CASE WHEN ...) three ways in one scan (reference
    REFINED...CURATED.py:1508-1519 counts rows with/without MBI)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("total_cnt"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent_cnt"),
        F.count(
            F.when(
                (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000), 1
            )
        ).alias("open_high_value_cnt"),
    )


# --- P10: DISTINCT ---
def q08_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a two-column projection (P10) — hash aggregate, map-side partial dedup."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


# --- O2: deterministic top-k ---
def q09_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 by price with a key tiebreak. Scale: Spark plans
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# --- F2: conditional regex-replace chain ---
def q10_regex_replace_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional regex-replace chain (F1/F2): each rule fires only when its match_substring guard hits (reference transform config)."""
    part = _t(spark, sf_dir, "part")
    rules = [
        RegexRule(search="widget", replace="gadget", match_substring="cold"),
        RegexRule(search="^small", replace="tiny", match_substring="small"),
    ]
    return part.select(
        "p_partkey",
        column_regex_replace(F.col("p_name"), rules).alias("name_fixed"),
    )


# --- F3: split / reorder / rejoin ---
def q11_split_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split on a delimiter, reorder the parts, rejoin (F3) — the reference's name-flipping transform."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        split_reorder(F.col("c_name"), "#", [1, 0], join_with=" ").alias("name_flipped"),
    )


# --- F4: strip a character set ---
def q12_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip a configured character set from a column (F4)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        column_strip(F.col("o_orderpriority"), "0123456789-").alias("priority_word"),
    )


# --- F5/F6: null-filling concat + coalesce ---
def q13_concat_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-filling concat + coalesce fallback (F5/F6) — multi-column key assembly."""
    cust = _t(spark, sf_dir, "customer")
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("FURNITURE")), F.lit("(none)"))
    return cust.select(
        "c_custkey",
        concat_mapping([F.col("c_name"), seg], "|", null_fill=True).alias("name_seg"),
    )


# --- F16: value-map remap + prefix ---
def q14_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal value-map remap with prefix/suffix and pass-through fallback (F16)."""
    orders = _t(spark, sf_dir, "orders")
    mapped = value_map(
        F.col("o_orderpriority"),
        {"1-URGENT": "urgent", "2-HIGH": "high"},
        prefix="prio:",
    )
    return orders.select("o_orderkey", mapped.alias("priority_mapped"))


# --- F17: dummy-key synthesis ---
def q15_dummy_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dummy-key synthesis for blank business keys (F17) — deterministic surrogate from the row id."""
    cust = _t(spark, sf_dir, "customer")
    raw_key = F.when(F.col("c_acctbal") < 500, F.lit("")).otherwise(F.col("c_name"))
    return cust.select(
        "c_custkey",
        dummy_key(raw_key, F.col("c_custkey")).alias("synthetic_key"),
    )


# --- F12: date -> string formatting ---
def q16_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date -> string formatting (F12, reference MM-dd-yyyy convention)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "MM-dd-yyyy").alias("order_date_str"),
    )


# --- S6 analog: JSON path extraction ---
def q17_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: the reference parses JSON in-engine with
    ':' paths + '::' casts (RAW_ADLS...py:580-609). Spark equivalent:
    get_json_object + cast."""
    events = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


# --- P9/F13: lenient timestamp parse + future-only filter ---
def q18_future_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_TO_TIMESTAMP(CONCAT(date,' ',time)) > <now> (reference
    REFINED...CURATED.py:1539-1557). 'now' fixed for determinism; the
    date round-trips through a string as the reference's stringly
    pipeline does."""
    orders = _t(spark, sf_dir, "orders")
    date_str = F.date_format("o_orderdate", "yyyy-MM-dd")
    ts = F.try_to_timestamp(F.concat_ws(" ", date_str, F.lit("08:00:00")))
    return orders.filter(ts > F.lit("1997-06-01").cast("timestamp")).select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )


# --- incremental state: watermark anti-join (idiomatic IS_NEW/IS_VALID) ---
def q19_incremental_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7's replacement for the mutable IS_NEW/IS_VALID flags:
    left-anti join against the processed-keys watermark. Scale: anti
    join broadcasts when the watermark side is small; no wide shuffle
    of the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    processed = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return li.join(
        processed, li.l_orderkey == processed.o_orderkey, "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_quantity")


# --- K4: MERGE-upsert semantics as keep-latest dedup ---
def q20_merge_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert (reference Rater8 MERGE on (SURVEY_ID, QUESTION_ID))
    expressed as window dedup keep-latest — the parquet-mode fallback
    for MERGE named in SURVEY §2.2 K4. Scale: one shuffle on the merge
    key; row_number avoids a full sort."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --- K3: curated column-mapping compiler end-to-end ---
def q21_curated_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated-stage SELECT builder (K3/F5/F6/F15): literal,
    source, concat and coalesce mappings compiled into one projection.
    Column names are deliberately given in punctuation/case-variant
    form to exercise the normalized resolver (SURVEY §1.3)."""
    cust = _t(spark, sf_dir, "customer")
    return apply_mappings(
        cust,
        [
            ColumnMapping(target="cust_key", kind="source", source="C_CustKey"),
            ColumnMapping(
                target="display_name",
                kind="concat",
                sources=["c_name", "c-mktsegment"],
                separator=" / ",
                null_fill=True,
            ),
            ColumnMapping(target="source_system", kind="literal", literal="tpch"),
            ColumnMapping(
                target="balance", kind="source", source="C_ACCTBAL"
            ),
        ],
    )



# --- P6: disjunctive filter (isin | isin) ---
def q22_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-IN-lists filter (reference P6: file_type IN (...) OR
    directory_leaf IN (...), RAW_ADLS_TO_RAW_SNOWFLAKE.py:620-624).
    Disjunctions of in-lists still push to the parquet scan."""
    cust = _t(spark, sf_dir, "customer")
    return cust.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        | F.col("c_nationkey").isin(1, 2, 3)
    ).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation_key"),
    )


# --- F8: LIKE / NOT LIKE guards ---
def q23_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE containment + NOT LIKE exclusion (reference F8 rule guards
    and config predicates, RAW_SNOWFLAKE_TO_REFINED...py:457).
    Predicates chosen so BOTH arms are non-vacuous on the synthetic
    data: ECONOMY matches ~10% of p_type; 'blue %' names exist and
    are excluded — the check compares non-empty, genuinely filtered
    result sets."""
    part = _t(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("%ECONOMY%") & ~F.col("p_name").like("blue%")
    ).select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_type").alias("part_type"),
        F.col("p_name").alias("part_name"),
    )


# --- F11: leaf-dir extraction (RTRIM + REGEXP_SUBSTR) ---
def q24_leaf_dir_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaf directory name from a path: REGEXP_SUBSTR(RTRIM(dir,'/'),
    '[^/]+$') (reference F11, RAW_ADLS_TO_RAW_SNOWFLAKE.py:585) over a
    synthesized inbound path per part row."""
    part = _t(spark, sf_dir, "part")
    path = F.concat(
        F.lit("/inbound/"), F.col("p_brand"), F.lit("/"), F.col("p_type"),
        F.lit("/"),
    )
    return part.select(
        F.col("p_partkey").alias("part_key"),
        path.alias("dir_path"),
        F.regexp_extract(F.rtrim(path, F.lit("/")), "[^/]+$", 0).alias("leaf_dir"),
    )



# --- §2.10: survey flatten (unpivot wide -> long) ---
def q25_unpivot_survey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot — the reference's only custom row logic is
    flattening survey JSON into (Survey_ID, Question_ID, Rating) rows
    (Rater8_Reviews.ipynb flatten_internal_surveys); as Spark it's a
    single generator expression (stack), no Python in the path.
    Here: each order row unpivots three measures into (metric, value)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.expr(
            "stack(2, 'totalprice', o_totalprice, "
            "'custkey', CAST(o_custkey AS DOUBLE)) AS (metric, metric_value)"
        ),
    )


# --- K5 parity: IS_NEW flag semantics == watermark anti-join ---
_BUCKETS = 8


def q167_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed layout: orders and
    lineitem are written as bucketBy(8, orderkey).sortBy(orderkey)
    managed tables (sinks.tables.write_bucketed — K-family sink,
    here exercised as the read-side join accelerator), then joined
    bucket-to-bucket — the read-side plan has NO Exchange on either
    join input (pinned in tests/test_plans.py; the merge hint keeps
    the demo on SortMergeJoin, which is what the bucket+sort layout
    feeds shuffle-free and sort-free). THE pay-once strategy for
    repeated fact-fact joins at 100 TB: one shuffle at write time,
    amortized over every later join on the key. Result is the plain
    revenue-per-priority join-agg, which is exactly the oracle."""
    from ulh_etl_spark.sinks.tables import write_bucketed

    tag = _md5_tag(sf_dir)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o_name, l_name = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    write_bucketed(orders, o_name, ["o_orderkey"], num_buckets=_BUCKETS)
    write_bucketed(li, l_name, ["l_orderkey"], num_buckets=_BUCKETS)
    bo = spark.table(o_name)
    bl = spark.table(l_name)
    joined = bl.hint("merge").join(
        bo, bl.l_orderkey == bo.o_orderkey
    )
    return joined.groupBy("o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def _md5_tag(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()[:8]


def q26_flag_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked proof of the documented IS_NEW/IS_VALID parity
    claim (state.py module doc; SURVEY §7.4): the production watermark
    anti-join (``state.unconsumed``) and the reference's flag
    semantics — materialize IS_NEW=0 for consumed runs, read WHERE
    IS_NEW=1 (RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:379,717) — must
    select the SAME rows.

    Consumed "runs" are users with a purchase event over value 150
    (~half the users at every shipped SF — both the consumed and the
    surviving set stay non-empty, so the check is non-vacuous),
    registered in a session-scoped temp view shaped like the watermark
    table so the REAL ``unconsumed()`` code path runs (existence
    probe, stage filter, broadcast anti-join). Both paths are returned
    union'd with a path label; the oracle emits the SQL anti-join once
    per label — a hash match means pathA == pathB == SQL semantics.
    """
    from ulh_etl_spark.state import unconsumed

    events = _t(spark, sf_dir, "events")
    consumed = (
        events.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > 150)
        )
        .select(F.col("user_id").alias("run_id"))
        .distinct()
        .select(
            F.lit("PARITY").alias("stage"),
            "run_id",
            F.lit(None).cast("timestamp").alias("processed_at"),
        )
    )
    consumed.createOrReplaceTempView("_parity_marks")

    cols = [
        F.col("event_id").alias("event_id"),
        F.col("user_id").alias("run_key"),
        F.col("event_type").alias("event_type"),
    ]
    # path A: production watermark anti-join (the real function)
    path_a = unconsumed(
        spark, events, stage="PARITY", run_col="user_id", table="_parity_marks"
    ).select(*cols, F.lit("watermark").alias("path"))

    # path B: reference flag semantics — flag state AFTER the flip
    # (consumed rows flipped to 0), then the reader's IS_NEW=1 filter
    marks = consumed.select(F.col("run_id").alias("_mk"))
    flagged = events.join(
        F.broadcast(marks), events["user_id"] == F.col("_mk"), "left"
    ).withColumn(
        "IS_NEW", F.when(F.col("_mk").isNotNull(), F.lit(0)).otherwise(F.lit(1))
    )
    path_b = flagged.filter(F.col("IS_NEW") == 1).select(
        *cols, F.lit("flag").alias("path")
    )
    return path_a.unionByName(path_b)




_SALT_N = 8


def q172_salted_priority_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-resilient fact/dim join (operators.skew.salted_join):
    lineitem joins orders on orderkey through the SALTED path — fact
    rows get a deterministic salt in [0, 8), the dim side replicates
    8x, and the join key becomes (orderkey, salt) — then rolls up to
    per-priority totals. On THIS data orderkey is uniform and AQE
    alone suffices; the catalog entry pins the invariant that makes
    salting deployable against the 100 TB null-key/default-value
    hotspot AQE cannot split further: the salted plan's RESULT is
    bit-identical to the plain join the oracle runs. Aggregate
    rounding follows q01 (sums to 2, avg to 4)."""
    from ulh_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        "l_extendedprice",
        "l_quantity",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, ["orderkey"], num_salts=_SALT_N)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
        .withColumnRenamed("o_orderpriority", "priority")
    )




_BLOOM_JOIN_BITS = 1 << 17
_BLOOM_JOIN_HASHES = 5


def q177_bloom_join_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered fact/dim join: the urgent-orders key set
    compresses to a fixed 16 KiB bitmap (operators.bloom) that
    broadcasts once; lineitem probes it VECTORIZED and only the
    survivors (members + a bounded false-positive tail) enter the
    shuffle join whose exact equality kills the FPs — so the result
    is bit-identical to the plain join the oracle runs, while the
    shuffled fact volume drops to ~the matching fraction. This is
    the semi-join reduction that matters at 100 TB when the dim key
    set is too large to broadcast raw but its BITMAP is not (the
    q113 decontamination economics, applied to a relational join).
    Keys pre-hash through the portable md5 (sequential orderkeys
    would otherwise degenerate the double-hash scheme).

    The bitmap SELF-SIZES to >= 10 bits/key (next power of two, one
    scalar count on the already-eager dim side; r15): a fixed width
    saturates as the dim grows — at sf10 the 16 KiB bitmap held ~3M
    keys, every lineitem row "survived", and the reduction became a
    no-op full join (probe exp +1.03). Survivor-set size changes
    with the width; the RESULT never does (the exact join kills
    every false positive), so the oracle is width-independent."""
    import math

    from ulh_etl_spark.operators.bloom import bloom_probe, build_bloom
    from ulh_etl_spark.operators.text import md5_hash60

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    members = orders.select(
        md5_hash60(F.col("o_orderkey").cast("string")).alias("_bkey")
    )
    n_keys = orders.count()
    n_bits = max(
        _BLOOM_JOIN_BITS,
        1 << math.ceil(math.log2(max(1, 10 * n_keys))),
    )
    bits = build_bloom(
        members, "_bkey", n_bits=n_bits, n_hashes=_BLOOM_JOIN_HASHES
    )
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_bkey", md5_hash60(F.col("l_orderkey").cast("string"))
    )
    survivors = (
        bloom_probe(li, "_bkey", bits, n_hashes=_BLOOM_JOIN_HASHES)
        .filter(F.col("_in_bloom"))
        .drop("_bkey", "_in_bloom")
    )
    joined = survivors.join(
        orders, survivors.l_orderkey == orders.o_orderkey
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        )
        .withColumnRenamed("l_returnflag", "returnflag")
    )




def q182_partition_pruned_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned layout read: events land as a managed table
    partitioned by (event_type, day) (sinks.tables.write_partitioned
    — the zone-table layout), then the purchase-only mid-month query
    reads it back — the scan's PartitionFilters prune to ~11 of 150
    directories at PLAN time, before any I/O (pinned in
    tests/test_plans.py). THE layout decision that turns a 100 TB
    full-scan query into a per-day touch; the oracle runs the same
    filter over the raw relation, so the result also pins that the
    partition columns round-trip losslessly through the directory
    encoding."""
    from ulh_etl_spark.sinks.tables import write_partitioned

    tag = _md5_tag(sf_dir)
    name = f"part_events_{tag}"
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )
    # cluster=True: one write task per partition value — without it
    # the write emits (scan tasks)·150 files and the single-task
    # local write serializes 150 parquet writers (guide §6.2; r16:
    # warm write 10.9 -> 2.6 s, file count unchanged at 150).
    write_partitioned(ev, name, ["event_type", "day"], cluster=True)
    t = spark.table(name).filter(
        (F.col("event_type") == "purchase")
        & (F.col("day") >= "2024-01-10")
        & (F.col("day") <= "2024-01-20")
    )
    return t.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )




_JS_DEPTH = 4
_JS_WIDTH = 512


def q185_join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation before the join runs: CMS
    inner-product estimate of |orders JOIN lineitem ON orderkey| next
    to the exact cardinality (operators.sketch.cms_join_size) — the
    optimizer statistic that catches a 10^15-row blow-up from two
    KiB-scale sketches instead of at shuffle time. One-sided by
    construction (never undercounts); the overcount column IS the
    collision error. Sketches are the constant-volume cms_counters
    aggregates; a zero-overlap hash row short-circuits the estimate
    to 0 via the rows scaffold (disjoint key sets report 0, not a
    collision artifact)."""
    from ulh_etl_spark.operators.sketch import cms_join_size

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return cms_join_size(
        orders, li, "o_orderkey", "l_orderkey",
        depth=_JS_DEPTH, width=_JS_WIDTH,
    )


_KANON_K = 5
_KANON_BAL_BUCKET = 1000.0


def q216_k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (nation, market segment, account-balance bucket of 1000): the
    privacy gate a training-data pipeline runs BEFORE releasing
    joined/derived records — a row is re-identifiable when its
    equivalence class (all rows sharing its quasi-identifiers) has
    fewer than k members (Sweeney 2002, "k-anonymity: a model for
    protecting privacy"). One row per class SIZE with the class
    count, row count, and whether that size violates k=5 — the
    histogram form tells you both how bad the tail is and how much
    generalization (coarser buckets) would cost.

    Scale: one groupBy on the quasi-identifier tuple (uniform
    composite key), then a groupBy on the class size (at most
    |distinct sizes| rows) — nothing wider than the dimension
    table itself. 100 TB of events joined to this dimension
    inherits the same audit by auditing the dimension."""
    cust = load_table(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / F.lit(_KANON_BAL_BUCKET))
            .cast("long")
            .alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count("*").alias("_k"))
    )
    return (
        classes.groupBy(F.col("_k").alias("class_size"))
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            (F.count("*") * F.first("_k")).cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("class_size").cast("bigint").alias("class_size"),
            "n_classes",
            "n_rows",
            (F.col("class_size") < _KANON_K).alias("violates_k5"),
        )
    )


def q223_order_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE / GROUPING SETS rollup: order counts and revenue at every
    aggregation level of (status, order year) in ONE pass — the
    OLAP-report shape (detail + two marginals + grand total) that a
    config-driven reporting layer emits constantly. Spark expands the
    4 grouping sets map-side WITH partial aggregation, so the shuffle
    carries ~4x the distinct-group rows, not 4x the fact rows — one
    Exchange however many levels the cube adds. Null dims coalesce to
    the '(all)' sentinel (both dims are non-null in the data), so the
    output needs no engine-specific grouping-id bit order."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube(
            F.col("o_orderstatus").alias("status"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("status"), F.lit("(all)")).alias("status"),
            F.coalesce(F.col("yr").cast("string"), F.lit("(all)")).alias(
                "order_year"
            ),
            "n_orders",
            "total_price",
        )
    )


_LDIV_L = 3


def q224_l_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., TKDD 2007
    "l-diversity: privacy beyond k-anonymity") — the companion gate
    to q216: a k-anonymous class is still disclosive when everyone
    in it shares the SENSITIVE value, so each quasi-identifier class
    (nation, account-balance bucket) is scored by how many DISTINCT
    sensitive values (market segment) it contains. One row per
    distinct-count with the class count, row count, and whether that
    count violates l=3 — the histogram that prices how much coarser
    the quasi-identifiers must get before release.

    Scale: one groupBy on the quasi tuple with a count-distinct
    partial agg, then a groupBy on the distinct-count (<= |sensitive
    domain| rows). Same dimension-table audit shape as q216."""
    cust = load_table(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / F.lit(_KANON_BAL_BUCKET))
            .cast("long")
            .alias("bal_bucket"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_bucket")
        .agg(
            F.countDistinct("c_mktsegment").alias("_l"),
            F.count("*").alias("_n"),
        )
    )
    return (
        classes.groupBy(F.col("_l").alias("distinct_sensitive"))
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum("_n").cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("distinct_sensitive").cast("bigint").alias(
                "distinct_sensitive"
            ),
            "n_classes",
            "n_rows",
            (F.col("distinct_sensitive") < _LDIV_L).alias("violates_l3"),
        )
    )


def q234_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: the multiplicity histogram of the fact
    side's join key (lineitem.l_orderkey) — per multiplicity m, how
    many keys have it, how many rows they carry, and their share of
    the table — the pre-join forecast of shuffle-partition imbalance
    (a key at multiplicity M joins into M x dim-multiplicity rows;
    the heavy tail here is what AQE skew-split / salting exists
    for). The relational twin of q230's LSH bucket histogram: price
    the skew BEFORE the join. All integer counts plus one share
    division.

    Scale: two partial-aggregated groupBys (key, then multiplicity)
    and a 1-row total cross-joined in — strictly cheaper than the
    join it forecasts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    tot = li.agg(F.count("*").cast("long").alias("_t"))
    mult = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("_m")
    )
    return (
        mult.groupBy(F.col("_m").alias("multiplicity"))
        .agg(F.count("*").cast("bigint").alias("n_keys"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("multiplicity").cast("bigint").alias("multiplicity"),
            "n_keys",
            (F.col("multiplicity") * F.col("n_keys"))
            .cast("bigint")
            .alias("n_rows"),
            F.round(
                (F.col("multiplicity") * F.col("n_keys")).cast("double")
                / F.col("_t").cast("double"),
                6,
            ).alias("row_share"),
        )
    )


QUERIES = {
    "q234_join_skew_profile": q234_join_skew_profile,
    "q216_k_anonymity_profile": q216_k_anonymity_profile,
    "q223_order_cube": q223_order_cube,
    "q224_l_diversity_profile": q224_l_diversity_profile,
    "q185_join_size_sketch": q185_join_size_sketch,
    "q182_partition_pruned_totals": q182_partition_pruned_totals,
    "q177_bloom_join_reduction": q177_bloom_join_reduction,
    "q172_salted_priority_totals": q172_salted_priority_totals,
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_record_type_classify": q03_record_type_classify,
    "q04_record_type_distribution": q04_record_type_distribution,
    "q05_self_join": q05_self_join,
    "q06_composite_key_join": q06_composite_key_join,
    "q07_conditional_agg": q07_conditional_agg,
    "q08_distinct": q08_distinct,
    "q09_topk_orders": q09_topk_orders,
    "q10_regex_replace_chain": q10_regex_replace_chain,
    "q11_split_reorder": q11_split_reorder,
    "q12_strip": q12_strip,
    "q13_concat_coalesce": q13_concat_coalesce,
    "q14_value_map": q14_value_map,
    "q15_dummy_key": q15_dummy_key,
    "q16_date_format": q16_date_format,
    "q17_json_extract": q17_json_extract,
    "q18_future_filter": q18_future_filter,
    "q19_incremental_antijoin": q19_incremental_antijoin,
    "q20_merge_keep_latest": q20_merge_keep_latest,
    "q21_curated_mapping": q21_curated_mapping,
    "q22_disjunctive_filter": q22_disjunctive_filter,
    "q25_unpivot_survey": q25_unpivot_survey,
    "q23_like_filters": q23_like_filters,
    "q24_leaf_dir_extract": q24_leaf_dir_extract,
    "q26_flag_parity": q26_flag_parity,
    "q167_bucketed_join": q167_bucketed_join,
}

ORACLES = {
    "q234_join_skew_profile": """
        WITH mult AS (
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS m
            FROM lineitem GROUP BY l_orderkey
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS t FROM lineitem
        )
        SELECT m AS multiplicity,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(m * COUNT(*) AS BIGINT) AS n_rows,
               ROUND(CAST(m * COUNT(*) AS DOUBLE) / CAST(t AS DOUBLE), 6)
                   AS row_share
        FROM mult CROSS JOIN tot
        GROUP BY m, t
    """,
    "q224_l_diversity_profile": f"""
        WITH classes AS (
            SELECT c_nationkey,
                   CAST(floor(c_acctbal / {_KANON_BAL_BUCKET}) AS BIGINT)
                       AS bal_bucket,
                   COUNT(DISTINCT c_mktsegment) AS l,
                   COUNT(*) AS n
            FROM customer
            GROUP BY 1, 2
        )
        SELECT CAST(l AS BIGINT) AS distinct_sensitive,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               l < {_LDIV_L} AS violates_l3
        FROM classes GROUP BY l
    """,
    "q223_order_cube": """
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(CAST(year(o_orderdate) AS VARCHAR), '(all)')
                   AS order_year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               round(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, year(o_orderdate))
    """,
    "q216_k_anonymity_profile": f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / {_KANON_BAL_BUCKET}) AS BIGINT)
                       AS bal_bucket,
                   COUNT(*) AS k
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT CAST(k AS BIGINT) AS class_size,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(COUNT(*) * k AS BIGINT) AS n_rows,
               k < {_KANON_K} AS violates_k5
        FROM classes GROUP BY k
    """,
    "q185_join_size_sketch": f"""
        WITH lk AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS token FROM orders
        ), rk AS (
            SELECT CAST(l_orderkey AS VARCHAR) AS token FROM lineitem
        ), cl AS (
            SELECT g.r AS rw, CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || '_' || token), 1, 8) AS BIGINT) % {_JS_WIDTH} AS bucket,
                   COUNT(*) AS ca
            FROM lk CROSS JOIN generate_series(0, {_JS_DEPTH - 1}) AS g(r)
            GROUP BY 1, 2
        ), cr AS (
            SELECT g.r AS rw, CAST('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || '_' || token), 1, 8) AS BIGINT) % {_JS_WIDTH} AS bucket,
                   COUNT(*) AS cb
            FROM rk CROSS JOIN generate_series(0, {_JS_DEPTH - 1}) AS g(r)
            GROUP BY 1, 2
        ), dots AS (
            SELECT cl.rw, SUM(cl.ca * cr.cb) AS dot
            FROM cl JOIN cr ON cl.rw = cr.rw AND cl.bucket = cr.bucket
            GROUP BY cl.rw
        ), est AS (
            SELECT CAST(MIN(COALESCE(d.dot, 0)) AS BIGINT) AS cms_estimate
            FROM generate_series(0, {_JS_DEPTH - 1}) AS rows_(r)
            LEFT JOIN dots d ON d.rw = rows_.r
        ), la AS (
            SELECT token, COUNT(*) AS a FROM lk GROUP BY token
        ), rb AS (
            SELECT token, COUNT(*) AS b FROM rk GROUP BY token
        ), ex AS (
            SELECT CAST(COALESCE(SUM(la.a * rb.b), 0) AS BIGINT)
                       AS exact_pairs
            FROM la JOIN rb USING (token)
        )
        SELECT ex.exact_pairs, est.cms_estimate,
               CAST(est.cms_estimate - ex.exact_pairs AS BIGINT) AS overcount
        FROM ex CROSS JOIN est
    """,
    "q182_partition_pruned_totals": """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        WHERE event_type = 'purchase'
          AND strftime(date_trunc('day', ts), '%Y-%m-%d') >= '2024-01-10'
          AND strftime(date_trunc('day', ts), '%Y-%m-%d') <= '2024-01-20'
        GROUP BY 1
    """,
    "q177_bloom_join_reduction": """
        SELECT l.l_returnflag AS returnflag,
               COUNT(*) AS n_items,
               ROUND(SUM(l.l_extendedprice), 2) AS sum_price,
               ROUND(AVG(l.l_quantity), 4) AS avg_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
    """,
    "q172_salted_priority_totals": """
        SELECT o.o_orderpriority AS priority,
               COUNT(*) AS n_items,
               ROUND(SUM(l.l_extendedprice), 2) AS sum_price,
               ROUND(AVG(l.l_quantity), 4) AS avg_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    "q167_bucketed_join": """
        SELECT o.o_orderpriority,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_filter_project": """
        SELECT o_orderkey AS order_key, o_custkey AS cust_key,
               o_totalprice AS total_price, o_orderpriority AS priority
        FROM orders
        WHERE o_orderstatus = 'F'
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice > 50000.0
    """,
    "q03_record_type_classify": """
        SELECT o_orderkey AS order_key, o_custkey AS cust_key,
               CASE WHEN lk.lk_custkey IS NOT NULL THEN 'UPDATE' ELSE 'NEW' END AS record_type
        FROM orders
        LEFT JOIN (SELECT DISTINCT c_custkey AS lk_custkey FROM customer
                   WHERE c_mktsegment = 'BUILDING') lk
          ON o_custkey = lk.lk_custkey
    """,
    "q04_record_type_distribution": """
        SELECT CASE WHEN lk.lk_custkey IS NOT NULL THEN 'UPDATE' ELSE 'NEW' END AS record_type,
               COUNT(*) AS cnt
        FROM orders
        LEFT JOIN (SELECT DISTINCT c_custkey AS lk_custkey FROM customer
                   WHERE c_mktsegment = 'BUILDING') lk
          ON o_custkey = lk.lk_custkey
        GROUP BY 1
    """,
    "q05_self_join": """
        SELECT a.l_orderkey AS order_key, a.l_partkey AS part1, b.l_partkey AS part2,
               ROUND(a.l_extendedprice + b.l_extendedprice, 2) AS combined_price
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_linenumber = 1 AND b.l_linenumber = 2
    """,
    "q06_composite_key_join": """
        SELECT e.event_id, e.user_id, e.event_type, l.type_cnt, l.type_value
        FROM events e
        JOIN (SELECT user_id, event_type, COUNT(*) AS type_cnt,
                     ROUND(SUM(value), 2) AS type_value
              FROM events GROUP BY user_id, event_type) l
          ON e.user_id = l.user_id AND e.event_type = l.event_type
    """,
    "q07_conditional_agg": """
        SELECT COUNT(*) AS total_cnt,
               COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent_cnt,
               COUNT(CASE WHEN o_orderstatus = 'O' AND o_totalprice > 150000 THEN 1 END)
                   AS open_high_value_cnt
        FROM orders
    """,
    "q08_distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "q09_topk_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "q10_regex_replace_chain": """
        SELECT p_partkey,
               CASE WHEN p_name LIKE '%cold%' THEN regexp_replace(p_name, 'widget', 'gadget', 'g')
                    WHEN p_name LIKE '%small%' THEN regexp_replace(p_name, '^small', 'tiny', 'g')
                    ELSE p_name END AS name_fixed
        FROM part
    """,
    "q11_split_reorder": """
        SELECT c_custkey,
               concat_ws(' ', trim(split_part(c_name, '#', 2)),
                              trim(split_part(c_name, '#', 1))) AS name_flipped
        FROM customer
    """,
    "q12_strip": """
        SELECT o_orderkey,
               regexp_replace(o_orderpriority, '[0123456789-]', '', 'g') AS priority_word
        FROM orders
    """,
    "q13_concat_coalesce": """
        SELECT c_custkey,
               concat(coalesce(c_name, ''), '|',
                      coalesce(coalesce(nullif(c_mktsegment, 'FURNITURE'), '(none)'), ''))
                   AS name_seg
        FROM customer
    """,
    "q14_value_map": """
        SELECT o_orderkey,
               'prio:' || (CASE
                   WHEN o_orderpriority = '1-URGENT' OR lower(o_orderpriority) = '1-urgent'
                       THEN 'urgent'
                   WHEN o_orderpriority = '2-HIGH' OR lower(o_orderpriority) = '2-high'
                       THEN 'high'
                   ELSE o_orderpriority END) AS priority_mapped
        FROM orders
    """,
    "q15_dummy_key": """
        SELECT c_custkey,
               CASE WHEN trim(CASE WHEN c_acctbal < 500 THEN '' ELSE c_name END) = ''
                    THEN 'NOMBI_' || CAST(c_custkey AS VARCHAR)
                    ELSE c_name END AS synthetic_key
        FROM customer
    """,
    "q16_date_format": """
        SELECT o_orderkey, strftime(o_orderdate, '%m-%d-%Y') AS order_date_str
        FROM orders
    """,
    "q17_json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
    "q18_future_filter": """
        SELECT o_orderkey, o_orderdate, o_orderstatus
        FROM orders
        WHERE try_cast(concat_ws(' ', strftime(o_orderdate, '%Y-%m-%d'), '08:00:00')
                       AS TIMESTAMP) > TIMESTAMP '1997-06-01'
    """,
    "q19_incremental_antijoin": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
    """,
    "q20_merge_keep_latest": """
        SELECT user_id, event_type, event_id, value
        FROM (SELECT user_id, event_type, event_id, value,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "q21_curated_mapping": """
        SELECT c_custkey AS cust_key,
               concat(coalesce(c_name, ''), ' / ', coalesce(c_mktsegment, '')) AS display_name,
               'tpch' AS source_system,
               c_acctbal AS balance
        FROM customer
    """,
    "q25_unpivot_survey": """
        SELECT o_orderkey AS order_key, metric, metric_value
        FROM (
            SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS metric_value FROM orders
            UNION ALL
            SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
        )
    """,
    "q22_disjunctive_filter": """
        SELECT c_custkey AS cust_key, c_mktsegment AS segment,
               c_nationkey AS nation_key
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
           OR c_nationkey IN (1, 2, 3)
    """,
    "q23_like_filters": """
        SELECT p_partkey AS part_key, p_type AS part_type,
               p_name AS part_name
        FROM part
        WHERE p_type LIKE '%ECONOMY%' AND p_name NOT LIKE 'blue%'
    """,
    "q24_leaf_dir_extract": """
        SELECT p_partkey AS part_key,
               '/inbound/' || p_brand || '/' || p_type || '/' AS dir_path,
               regexp_extract(rtrim('/inbound/' || p_brand || '/' || p_type || '/', '/'),
                              '[^/]+$') AS leaf_dir
        FROM part
    """,
    "q26_flag_parity": """
        WITH consumed AS (
            SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase' AND value > 150
        ),
        base AS (
            SELECT e.event_id, e.user_id AS run_key, e.event_type
            FROM events e
            WHERE NOT EXISTS (
                SELECT 1 FROM consumed c WHERE c.user_id = e.user_id
            )
        )
        SELECT event_id, run_key, event_type, 'watermark' AS path FROM base
        UNION ALL
        SELECT event_id, run_key, event_type, 'flag' AS path FROM base
    """,
}
