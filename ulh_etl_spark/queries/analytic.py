"""OLAP analytics catalog: multi-level aggregation (ROLLUP), pivot,
sliding-window aggregates, exact percentiles, and sketch-based
distinct counts.

Scale notes per operator:

- **ROLLUP** — Spark expands grouping sets inside ONE hash aggregate
  (Expand + partial agg), so the rollup costs one shuffle, same as a
  flat groupBy.
- **pivot** — the pivot values are passed EXPLICITLY, which skips the
  distinct-collect Spark otherwise runs on the driver to discover
  them (an extra job + a collect — the thing to avoid at scale).
- **rolling window** — one shuffle on the partition key, then a sort;
  ROWS frames stream in O(1) memory per row. The deterministic
  (date, key) ordering makes the result reproducible AND
  oracle-checkable.
- **percentiles** — ``percentile()`` is Spark's exact implementation
  (sort-based per group). Quartiles of integer-valued data are exact
  binary fractions, so both engines agree bit-for-bit with no
  rounding. At 100 TB you'd swap in ``approx_percentile`` (t-digest,
  mergeable, one pass) — same call shape.
- **approx distinct** — HyperLogLog++: mergeable partial sketches,
  map-side combine, constant memory. No SQL oracle (DuckDB's HLL
  differs); the error bound vs exact is pinned in
  tests/test_analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ulh_etl_spark.operators.fanout import fan_out as _fo
from ulh_etl_spark.session import load_table


def q54_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity totals at (flag, status), (flag), and grand-total
    levels in one pass — reference analog: the per-practice AND
    overall tallies its notebooks compute in separate queries
    (SURVEY §2.5)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


PIVOT_STATUSES = ("F", "O", "P")


def q55_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total price by priority x status, statuses as columns. Explicit
    value list => no driver-side distinct scan."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


def q56_rolling_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 3-order sliding total, deterministically ordered
    by (orderdate, orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling3_total"),
    )


def q59_quantity_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of l_quantity per return flag. Integer-valued
    data + quarter fractions -> exact binary arithmetic in both
    engines (no rounding tolerance needed)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.50)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
    )


def q68_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grouping sets of (priority, status) in one pass —
    cube is the same Expand + single-shuffle plan as rollup, with 4
    grouping sets instead of 3."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.count("*").alias("n_orders"),
    )


def q77_approx_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: approx_percentile (t-digest-style
    mergeable sketch, one map-combined pass, no per-group sort) over
    the same quartiles as exact q59. Sketch ESTIMATES are
    engine-specific (no SQL oracle can reproduce them), so the
    emitted columns are the exact quartiles (hash-checked) plus
    ``sketch_within_10pct`` — the sketch audited against its own
    error bound, which the oracle pins to TRUE: an approx_percentile
    regression flips the flag and fails the hash gate. (The exact
    leg is the correctness artifact; at 100 TB run the sketch
    alone.) Tighter bounds stay pinned in tests/test_analytics."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").alias("_e"),
        F.expr(
            "approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)"
        ).alias("_a"),
    )
    within = F.aggregate(
        F.zip_with(
            "_e", "_a", lambda e, a: F.abs(a - e) <= F.lit(0.1) * e
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        F.col("_e")[0].alias("exact_q1"),
        F.col("_e")[1].alias("exact_median"),
        F.col("_e")[2].alias("exact_q3"),
        within.alias("sketch_within_10pct"),
    )


HLL_RSD = 0.05


def q62_approx_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type (rsd 5%). Sketches
    merge associatively, so this is one map-combined shuffle at any
    scale. Sketch ESTIMATES are engine-specific (no SQL oracle can
    reproduce them), so the emitted columns are the exact count
    (hash-checked against DuckDB) plus ``sketch_within_3rsd`` — the
    sketch audited against its 3-sigma error bound, which the oracle
    pins to TRUE: an HLL regression flips the flag and fails the
    hash gate. (The exact countDistinct leg costs the Expand the
    pure-sketch form exists to avoid — this catalog entry is the
    correctness artifact; at 100 TB run the sketch alone.) Tighter
    bounds stay pinned in tests/test_analytics."""
    events = load_table(spark, sf_dir, "events")
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", HLL_RSD)
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        exact.alias("exact_users"),
        (
            F.abs(approx - exact)
            <= F.greatest(F.lit(3.0), F.lit(3 * HLL_RSD) * exact)
        ).alias("sketch_within_3rsd"),
    )


def q69_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT as first-class operators: customers with
    both F- and O-status orders, minus those with any P-status order.
    Compiles to semi/anti joins on hashed keys — one shuffle each, no
    distinct-collect."""
    orders = load_table(spark, sf_dir, "orders")

    def custs(status: str) -> DataFrame:
        return orders.filter(F.col("o_orderstatus") == status).select(
            "o_custkey"
        )

    return (
        custs("F").intersect(custs("O")).subtract(custs("P"))
    ).select(F.col("o_custkey").alias("custkey"))


def q70_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style left-semi join: customers having at least one
    urgent open order. Semi joins never duplicate the probe side, so
    no post-join distinct is needed."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderstatus") == "O")
    )
    return customer.join(
        urgent, customer["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


def q71_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: orders priced above 1.5x the global
    average. The scalar aggregate is one map-combined job whose 1-row
    result broadcasts — never a driver collect in the plan."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        orders.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q72_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped string aggregation: the 5 highest-value
    order keys per priority, concatenated in (price desc, key)
    order. collect_list has no deterministic order by itself — the
    sort must be explicit (struct sort -> slice -> join), exactly the
    pitfall this entry pins."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.reverse(
                            F.array_sort(
                                F.collect_list(
                                    F.struct(
                                        F.col("o_totalprice").alias("p"),
                                        F.col("o_orderkey").alias("k"),
                                    )
                                )
                            )
                        ),
                        lambda s: s.getField("k").cast("string"),
                    ),
                    1,
                    5,
                ),
                ",",
            ).alias("top5_keys")
        )
    )


def q73_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile assignment of orders by price (deterministic orderkey
    tiebreak), aggregated to per-decile bounds — the
    histogram/quantile-bucket pattern. Implemented with
    ``global_ntile`` (operators/rank.py): range-repartition +
    per-slice rank + broadcast offsets — bit-identical to ``ntile(10)
    OVER (ORDER BY ...)`` (the oracle) but with NO unpartitioned
    window; every task sorts only its contiguous range slice."""
    from ulh_etl_spark.operators.rank import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    return (
        global_ntile(
            # pre-project: the ranked intermediate is persisted, which
            # pins whatever columns flow in — prune to the two the
            # query needs BEFORE the operator, not after.
            orders.select("o_totalprice", "o_orderkey"),
            [F.col("o_totalprice"), F.col("o_orderkey")],
            10,
            out_col="decile",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .select(F.col("decile").cast("int").alias("decile"),
                "n_orders", "min_price", "max_price")
    )


_Z_BITS = 16
_Z_SHIFT = 20


def q95_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering report over orders: bucket the
    bit-interleaved (custkey, orderkey) key and report each bucket's
    row count and BOTH dimensions' min/max span — the file-statistics
    rectangle a Z-ordered write gives every parquet file, which is
    what lets filters on EITHER column prune at 100 TB (the Delta
    OPTIMIZE ZORDER BY layout, as plain Spark expressions). Narrow
    key computation + one partial-agged shuffle on the bucket."""
    from ulh_etl_spark.operators.layout import zorder_bucket_stats

    orders = load_table(spark, sf_dir, "orders")
    return zorder_bucket_stats(
        orders, "o_custkey", "o_orderkey", bits=_Z_BITS, bucket_shift=_Z_SHIFT
    )


def _morton_sql(a: str, b: str, bits: int) -> str:
    """The morton_key closed form as DuckDB SQL — generated from the
    same loop shape as operators.layout.morton_key."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def q128_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix: per-user event sequences
    (deterministic (ts, event_id) ordering) -> lag -> corpus-wide
    (from, to) counts — the Markov-chain view of product analytics.
    One shuffle (the per-user window); the transition matrix is
    |types|^2 rows, trivially small at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    )
    return (
        t.filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )


def q129_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-active week,
    counted per week-offset — the standard retention triangle. Two
    bounded shuffles (distinct user-weeks, per-user min); week
    truncation is Monday-based in both engines."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    j = uw.join(cohort, "user_id").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("long")
        .alias("week_offset"),
    )
    return j.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def q130_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ordered funnel over FUNNEL_STEPS: a user advances to
    step i only if their FIRST step-i event is strictly after their
    first step-(i-1) event (first-touch attribution). One per-user
    conditional-min agg + one global roll-up — two map-combined
    shuffles regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    mins = ev.groupBy("user_id").agg(
        *[
            F.min(
                F.when(F.col("event_type") == s, F.col("ts"))
            ).alias(f"_t{i}")
            for i, s in enumerate(FUNNEL_STEPS)
        ]
    )
    q = [F.col("_t0").isNotNull()]
    for i in range(1, len(FUNNEL_STEPS)):
        q.append(q[i - 1] & (F.col(f"_t{i}") > F.col(f"_t{i - 1}")))
    counts = mins.agg(
        *[F.sum(qi.cast("long")).alias(f"_n{i}") for i, qi in enumerate(q)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                F.col(f"_n{i}").cast("long").alias("n_users"),
            )
            for i, s in enumerate(FUNNEL_STEPS)
        ]
    )
    return counts.select(F.explode(rows).alias("_r")).select("_r.*")


MIN_SUPPORT = 3


def q131_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence (the Apriori candidate-pair step):
    part pairs appearing together in >= MIN_SUPPORT orders, with
    lift = N * c12 / (c1 * c2). Candidate volume is O(sum basket^2)
    — bounded by basket size, never |parts|^2; the per-part counts
    broadcast while the catalog fits (AQE)."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    # 1-row scalar aggregate joined broadcast (q71 pattern) — not a
    # driver-side count() action
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("_n"))
    part_cnt = items.groupBy("l_partkey").agg(F.count("*").alias("_c"))
    a = items.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("p1")
    )
    b = items.select(
        F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(b, "_o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )
    c1 = part_cnt.select(
        F.col("l_partkey").alias("p1"), F.col("_c").alias("_c1")
    )
    c2 = part_cnt.select(
        F.col("l_partkey").alias("p2"), F.col("_c").alias("_c2")
    )
    return (
        pairs.join(c1, "p1")
        .join(c2, "p2")
        .join(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "support",
            F.round(
                F.col("_n") * F.col("support")
                / (F.col("_c1") * F.col("_c2")),
                6,
            ).alias("lift"),
        )
    )


def q133_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (last order
    date), frequency (order count) and monetary (total spend), each
    quintiled 1-5 (1 = earliest/fewest/least; deterministic custkey
    tiebreak) and concatenated into the segment label — the classic
    marketing cut. All three quintile passes use global_ntile
    (range-repartition + driver offsets): bit-identical to ntile(5)
    OVER (ORDER BY ...) with NO unpartitioned window, so the pattern
    survives a customer table of any size."""
    from ulh_etl_spark.operators.rank import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey").agg(
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    x = global_ntile(
        pc, [F.col("last_order"), F.col("o_custkey")], 5, out_col="r_q"
    )
    x = global_ntile(
        x, [F.col("n_orders"), F.col("o_custkey")], 5, out_col="f_q"
    )
    x = global_ntile(
        x, [F.col("monetary"), F.col("o_custkey")], 5, out_col="m_q"
    )
    return x.select(
        "o_custkey",
        "last_order",
        "n_orders",
        "monetary",
        F.col("r_q").cast("int").alias("r_q"),
        F.col("f_q").cast("int").alias("f_q"),
        F.col("m_q").cast("int").alias("m_q"),
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
    )


PROFILE_COLS = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]


def q125_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level data-quality profile of lineitem: per column,
    non-null count, exact distinct count, min/max as strings — the
    post-load snapshot an ETL engine records (companion to the
    file-level precheck suite). ONE pass: every metric for every
    column in a single partial-aggregated agg."""
    from ulh_etl_spark.operators.profile import profile_columns

    li = load_table(spark, sf_dir, "lineitem")
    return profile_columns(li, PROFILE_COLS)




def q173_merged_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-rollup correctness kernel: per event_type stats
    (count/mean/stddev/min/max) computed NOT by scanning the whole
    relation, but by building the mergeable algebraic state (count,
    sum, sum-of-squares, min, max) on two disjoint slices (even /
    odd event_id — standing in for \"at-rest history\" and \"today's
    batch\") and folding the states (operators.profile.algebraic_state
    / merge_states). The oracle replays the same two-slice merge, so
    the catalog pins the contract that makes 100 TB rollups
    incremental: state(old) + state(new) == scan(all), no history
    rescan ever. Stddev uses the clamped closed form (the q132
    cancellation lesson)."""
    from ulh_etl_spark.operators.profile import algebraic_state, merge_states

    ev = load_table(spark, sf_dir, "events")
    hist = algebraic_state(
        ev.filter(F.col("event_id") % 2 == 0), ["event_type"], "value"
    )
    batch = algebraic_state(
        ev.filter(F.col("event_id") % 2 == 1), ["event_type"], "value"
    )
    return merge_states([hist, batch], ["event_type"])




_FM_REGISTERS = 64


def q176_fm_user_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flajolet-Martin / HLL register table over events.user_id
    (operators.sketch.fm_registers, 64 registers): the
    oracle-checkable distinct-count sketch next to q62's opaque
    HLL++ binary — every column is an integer derived from the
    portable md5 hash, so DuckDB replays the sketch bit-for-bit.
    The register table is the mergeable production artifact (MAX-
    combine across days/slices); the harmonic estimate derived from
    it is pinned within 15% of exact in tests/test_graph_sketch.py.
    One partial-aggregated groupBy — constant shuffle volume at any
    corpus size."""
    from ulh_etl_spark.operators.sketch import fm_registers

    ev = load_table(spark, sf_dir, "events")
    return fm_registers(ev, "user_id", n_registers=_FM_REGISTERS)


_SWD_HOURS = 3
_SWD_ALPHA = repr(0.7213 / (1.0 + 1.079 / _FM_REGISTERS))


def q208_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 3-hour sliding window answered from the
    HOURLY FM/HLL register cube (operators.sketch.
    sliding_distinct_windows): the raw stream is scanned once into
    <= 64 integer rows per hour; every window is a MAX-merge of its
    member hours' registers — re-windowing never re-reads history
    (the sketch-mergeability contract q176 pins, now exercised along
    the time axis). exact_keys is the audit column (the only
    corpus-sized exchange; dropped at scale)."""
    from ulh_etl_spark.operators.sketch import sliding_distinct_windows

    ev = load_table(spark, sf_dir, "events")
    return sliding_distinct_windows(
        ev, "user_id", "ts", window_hours=_SWD_HOURS,
        n_registers=_FM_REGISTERS,
    )


def _q208_oracle_sql() -> str:
    m = _FM_REGISTERS
    shift = m.bit_length() - 1
    rho_max = 60 - shift + 1
    offs = ", ".join(f"({i})" for i in range(_SWD_HOURS))
    return f"""
        WITH hrs AS (
            SELECT date_trunc('hour', ts) AS hr, user_id AS k FROM events
        ), h AS (
            SELECT hr, k,
                   CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h
            FROM hrs
        ), r AS (
            SELECT hr,
                   CAST(h % {m} AS INT) AS register,
                   CASE WHEN (h >> {shift}) = 0 THEN {rho_max}
                        ELSE CAST(round(log2(CAST(((h >> {shift}) &
                                  -(h >> {shift})) AS DOUBLE)), 0)
                                  AS INT) + 1 END AS rho,
                   k
            FROM h
        ), reg AS (
            SELECT hr, register, MAX(rho) AS max_rho
            FROM r GROUP BY hr, register
        ), merged AS (
            SELECT reg.hr - to_hours(CAST(o.i AS BIGINT)) AS window_start,
                   register, MAX(max_rho) AS max_rho
            FROM reg CROSS JOIN (VALUES {offs}) AS o(i)
            GROUP BY 1, register
        ), per_win AS (
            SELECT window_start,
                   SUM(power(2.0, -max_rho)) AS zp,
                   CAST(COUNT(*) AS INT) AS registers_hit
            FROM merged GROUP BY window_start
        ), est AS (
            SELECT window_start, registers_hit,
                   round(CASE WHEN ({m} - registers_hit) > 0
                              AND (CAST({_SWD_ALPHA} AS DOUBLE) * {m} * {m})
                                  / (zp + ({m} - registers_hit))
                                  <= 2.5 * {m}
                         THEN CAST({float(m)!r} AS DOUBLE) * ln(CAST({float(m)!r} AS DOUBLE) /
                              CAST({m} - registers_hit AS DOUBLE))
                         ELSE (CAST({_SWD_ALPHA} AS DOUBLE) * {m} * {m})
                              / (zp + ({m} - registers_hit)) END,
                         3) AS est_keys
            FROM per_win
        ), exact AS (
            SELECT hrs.hr - to_hours(CAST(o.i AS BIGINT)) AS window_start,
                   CAST(COUNT(DISTINCT k) AS BIGINT) AS exact_keys
            FROM hrs CROSS JOIN (VALUES {offs}) AS o(i)
            GROUP BY 1
        )
        SELECT e.window_start, e.exact_keys, s.est_keys,
               s.registers_hit,
               round(abs(s.est_keys - CAST(e.exact_keys AS DOUBLE))
                     / CAST(e.exact_keys AS DOUBLE), 6) AS rel_err
        FROM exact e JOIN est s USING (window_start)
    """


_FMC_BATCHES = 4


def q212_sliding_cube_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q208 sliding windows answered from an INCREMENTALLY
    maintained hourly register cube — the q202 at-rest-store pattern
    applied to the FM/HLL monoid along the time axis: events arrive
    in 4 deterministic batches (event_id % 4); each batch's hourly
    cube (<= 64 integer rows per touched hour) max-merges into the
    store WITHOUT re-reading event history — every merge touches
    only cube-sized relations whatever the corpus size. The exact
    n_keys audit column deliberately does NOT survive incremental
    maintenance (distinct counts are not mergeable by row — that is
    the whole reason the register sketch exists), so the store keeps
    only the mergeable (hour, register, max_rho). The oracle REPLAYS
    the sequential merges (unrolled CTEs, the q202 fold-vs-unrolled
    pattern) and then the window estimates, so the merge rule itself
    is hash-checked, not just the endpoint."""
    from ulh_etl_spark.operators.sketch import (
        fm_registers,
        sliding_window_estimates,
    )

    ev = load_table(spark, sf_dir, "events")
    store = None
    for b in range(_FMC_BATCHES):
        hours = ev.filter(
            F.col("event_id") % _FMC_BATCHES == b
        ).select(
            F.date_trunc("hour", F.col("ts")).alias("_hr"),
            F.col("user_id").alias("_k"),
        )
        cube = fm_registers(
            hours, "_k", _FM_REGISTERS, group_cols=("_hr",)
        ).select("_hr", "register", "max_rho")
        store = (
            cube
            if store is None
            else store.unionByName(cube)
            .groupBy("_hr", "register")
            .agg(F.max("max_rho").alias("max_rho"))
        )
    per_win, est = sliding_window_estimates(
        store, _SWD_HOURS, _FM_REGISTERS
    )
    return per_win.select(
        "window_start", est.alias("est_keys"), "registers_hit"
    )


def _q212_oracle_sql() -> str:
    m = _FM_REGISTERS
    shift = m.bit_length() - 1
    rho_max = 60 - shift + 1
    offs = ", ".join(f"({i})" for i in range(_SWD_HOURS))
    parts = []
    for b in range(_FMC_BATCHES):
        parts.append(
            f"""c{b} AS MATERIALIZED (
            SELECT hr, register, MAX(rho) AS max_rho FROM (
                SELECT date_trunc('hour', ts) AS hr,
                       CAST(h % {m} AS INT) AS register,
                       CASE WHEN (h >> {shift}) = 0 THEN {rho_max}
                            ELSE CAST(round(log2(CAST(((h >> {shift}) &
                                      -(h >> {shift})) AS DOUBLE)), 0)
                                      AS INT) + 1 END AS rho
                FROM (
                    SELECT ts,
                           CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                1, 15) AS BIGINT) AS h
                    FROM events WHERE event_id % {_FMC_BATCHES} = {b}
                )
            ) GROUP BY hr, register
        )"""
        )
    prev = "c0"
    for b in range(1, _FMC_BATCHES):
        parts.append(
            f"""m{b} AS MATERIALIZED (
            SELECT hr, register, MAX(max_rho) AS max_rho FROM (
                SELECT * FROM {prev} UNION ALL SELECT * FROM c{b}
            ) GROUP BY hr, register
        )"""
        )
        prev = f"m{b}"
    parts.append(
        f"""merged AS (
            SELECT {prev}.hr - to_hours(CAST(o.i AS BIGINT)) AS window_start,
                   register, MAX(max_rho) AS max_rho
            FROM {prev} CROSS JOIN (VALUES {offs}) AS o(i)
            GROUP BY 1, register
        )"""
    )
    parts.append(
        f"""per_win AS (
            SELECT window_start,
                   SUM(power(2.0, -max_rho)) AS zp,
                   CAST(COUNT(*) AS INT) AS registers_hit
            FROM merged GROUP BY window_start
        )"""
    )
    joined = ",\n        ".join(parts)
    return f"""
        WITH {joined}
        SELECT window_start,
               round(CASE WHEN ({m} - registers_hit) > 0
                          AND (CAST({_SWD_ALPHA} AS DOUBLE) * {m} * {m})
                              / (zp + ({m} - registers_hit))
                              <= 2.5 * {m}
                     THEN CAST({float(m)!r} AS DOUBLE) *
                          ln(CAST({float(m)!r} AS DOUBLE) /
                             CAST({m} - registers_hit AS DOUBLE))
                     ELSE (CAST({_SWD_ALPHA} AS DOUBLE) * {m} * {m})
                          / (zp + ({m} - registers_hit)) END,
                     3) AS est_keys,
               registers_hit
        FROM per_win
    """


_PS_K = 512


def q214_priority_sample_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value totals estimated from ONE global 512-row
    priority sample (operators.sketch.priority_sample_sums —
    Duffield/Lund/Thorup JACM'07): sample once by w/u priority, then
    ANY subset-sum (here each event type; equally any predicate)
    reads off the same k rows via sum(max(w, tau)). The pattern that
    replaces per-query scans with one TakeOrdered pass at 100 TB;
    exact totals ride along as the audit columns, so the estimator's
    per-group error is on the record."""
    from ulh_etl_spark.operators.sketch import priority_sample_sums

    ev = load_table(spark, sf_dir, "events")
    return priority_sample_sums(
        ev, "value", "event_id", "event_type", k=_PS_K
    )


def _q214_oracle_sql() -> str:
    k = _PS_K
    u = (
        "(CAST(CAST('0x' || substr(md5('psamp_' || "
        "CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)"
        " + 1.0) / CAST(1152921504606846976 AS DOUBLE)"
    )
    return f"""
        WITH rows_w AS MATERIALIZED (
            SELECT event_id AS id, event_type AS grp,
                   CAST(value AS DOUBLE) AS w,
                   CAST(value AS DOUBLE) / ({u}) AS q
            FROM events WHERE CAST(value AS DOUBLE) > 0
        ), top AS MATERIALIZED (
            SELECT id, grp, w, q,
                   row_number() OVER (ORDER BY q DESC, id) AS rk
            FROM rows_w
            ORDER BY q DESC, id LIMIT {k + 1}
        ), tau AS (
            SELECT CASE WHEN COUNT(*) = {k + 1} THEN MIN(q)
                        ELSE 0.0 END AS tau
            FROM top
        ), est AS (
            SELECT grp,
                   SUM(GREATEST(w, tau.tau)) AS est_raw,
                   CAST(COUNT(*) AS INT) AS n_sampled
            FROM top, tau WHERE rk <= {k}
            GROUP BY grp
        ), exact AS (
            SELECT grp, SUM(w) AS exact_raw FROM rows_w GROUP BY grp
        )
        SELECT e.grp AS event_type,
               round(COALESCE(s.est_raw, 0.0), 2) AS est_total,
               round(e.exact_raw, 2) AS exact_total,
               round(abs(COALESCE(s.est_raw, 0.0) - e.exact_raw)
                     / e.exact_raw, 6) AS rel_err,
               COALESCE(s.n_sampled, 0) AS n_sampled
        FROM exact e LEFT JOIN est s ON e.grp = s.grp
    """


_QS_K = 256
_QS_PROBS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def q192_quantile_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile-sketch register table over events.value
    (operators.sketch.quantile_sample_registers, k=256): the bottom-k
    hash sample — the KMV construction with the portable md5 rank as
    the no-RNG uniform order, completing the sketch family
    (CMS counts q171, FM distincts q176, now quantiles) with the same
    contract: integer/hash-deterministic register table, mergeable by
    union + re-take (slicing invariance pinned by pytest), constant
    exchange volume (TakeOrdered keeps per-task bottom-k)."""
    from ulh_etl_spark.operators.sketch import quantile_sample_registers

    ev = load_table(spark, sf_dir, "events")
    return quantile_sample_registers(ev, "value", "event_id", k=_QS_K)


def q193_quantile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile point queries from the q192 register table, audited
    against the corpus (the q171 overcount-audit shape): per
    requested p, the sketch estimate (exact rank selection inside
    the sample — no interpolation), the TRUE number of corpus values
    at or below it, and the CDF error |n_le/N - p| — the 1/sqrt(k)
    rank-error bound surfaced as a column (pinned <= 3/sqrt(k) by
    pytest). At 100 TB the audit legs run on a sample; the SKETCH
    leg is the production artifact."""
    from ulh_etl_spark.operators.sketch import (
        quantile_sample_registers,
        quantile_sketch_estimates,
    )

    ev = load_table(spark, sf_dir, "events")
    reg = quantile_sample_registers(ev, "value", "event_id", k=_QS_K)
    est = quantile_sketch_estimates(reg, _QS_PROBS)
    n = ev.agg(F.count("*").cast("long").alias("_n"))
    audited = (
        est.crossJoin(ev.select(F.col("value").alias("_v")))
        .groupBy("p", "estimate")
        .agg(
            F.sum(F.when(F.col("_v") <= F.col("estimate"), 1).otherwise(0))
            .cast("long")
            .alias("n_le")
        )
    )
    return audited.crossJoin(F.broadcast(n)).select(
        "p",
        F.round("estimate", 6).alias("estimate"),
        "n_le",
        F.round(
            F.abs(
                F.col("n_le").cast("double") / F.col("_n").cast("double")
                - F.col("p")
            ),
            6,
        ).alias("cdf_err"),
    )


_GS_K = 16


def q194_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget per-group uniform sample: each event type's 16
    events with the smallest md5 rank (operators.sketch.
    group_bottomk_sample) — q192's bottom-k sketch, stratified.
    Where q65's rate sample scales output with stratum size, this
    pins EXACTLY k rows per group however skewed the groups (the
    "256 eval docs per language" contract), stays mergeable per
    group, and costs one rank-window shuffle on the group key."""
    from ulh_etl_spark.operators.sketch import group_bottomk_sample

    ev = load_table(spark, sf_dir, "events")
    # Under-parallel guard: the md5 rank map precedes the window
    # exchange (r17 probe 0.40 s -> 0.31 s; no-op at real scale).
    ev = _fo(ev)
    return group_bottomk_sample(ev, "event_type", "event_id", k=_GS_K)


_QS_BATCHES = 4


def q202_quantile_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the q192 quantile register table —
    the at-rest store pattern the FM family exercises in streaming
    (stream_fm_registers_available_now): events arrive in 4
    deterministic batches (event_id % 4); each batch's k-row register
    table is merged into the store by union + re-take-bottom-k,
    NEVER re-reading event history — every merge touches <= 2k rows
    whatever the corpus size. By the KMV merge invariance (pinned by
    pytest) the final store equals the one-shot q192 sketch, but the
    oracle REPLAYS the sequential merges (unrolled CTEs, the
    fold-vs-unrolled pattern) so the merge rule itself is what gets
    hash-checked, not just the endpoint."""
    from ulh_etl_spark.operators.sketch import quantile_sample_registers

    ev = load_table(spark, sf_dir, "events")
    store = None
    for b in range(_QS_BATCHES):
        regs = quantile_sample_registers(
            ev.filter(F.col("event_id") % _QS_BATCHES == b),
            "value",
            "event_id",
            k=_QS_K,
        )
        store = (
            regs
            if store is None
            else store.unionByName(regs).orderBy("h", "key").limit(_QS_K)
        )
    return store


_GQ_K = 64
_GQ_PROBS = (0.5, 0.95)


def q203_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile estimates from per-group registers — the
    "doc-length p50/p95 per language" shape every mixture report
    needs (operators.sketch.group_quantile_registers +
    group_quantile_estimates): each language keeps its own bottom-k
    KMV sample of documents.n_chars, and the estimate for p is the
    exact rank selection inside that group's sample. ONE shuffle on
    the group key builds the registers; the estimate window reuses
    the same partitioning. Mergeable per group like every bottom-k
    sketch."""
    from ulh_etl_spark.operators.sketch import (
        group_quantile_estimates,
        group_quantile_registers,
    )

    docs = load_table(spark, sf_dir, "documents")
    regs = group_quantile_registers(
        docs, "n_chars", "doc_id", "lang", k=_GQ_K
    )
    return group_quantile_estimates(regs, _GQ_PROBS, group_col="lang")


def q226_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state predictability of the user-journey Markov chain:
    for each FROM event type, the Shannon entropy (bits) of its
    next-event distribution plus the modal transition probability —
    the sequence-mining QA that tells a behavioral-features pipeline
    which states are deterministic funnels (entropy ~0, top_prob ~1)
    and which are junctions worth modeling. Counts come from q128's
    transition matrix (per-user lag over the (ts, event_id) order);
    H = log2(n) - (sum_t c_t * log2(c_t)) / n with the term sum
    folded in sorted (to_type, count) order — the q195 discipline,
    so both engines accumulate identical doubles — and top_prob is
    one integer division. Scale: one per-user window shuffle, then
    aggregates over the |types|^2 transition matrix."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    )
    counts = (
        t.filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("_c"))
    )
    per = counts.groupBy("from_type").agg(
        F.sum("_c").cast("long").alias("_n"),
        F.count("*").cast("bigint").alias("n_next_types"),
        F.max("_c").cast("long").alias("_top"),
        F.array_sort(
            F.collect_list(F.struct(F.col("to_type"), F.col("_c")))
        ).alias("_arr"),
    )
    term_sum = F.aggregate(
        F.col("_arr"),
        F.lit(0.0),
        lambda acc, s: acc
        + s["_c"].cast("double") * F.log2(s["_c"].cast("double")),
    )
    return per.select(
        "from_type",
        F.col("_n").alias("n_transitions"),
        "n_next_types",
        F.round(
            F.log2(F.col("_n").cast("double"))
            - term_sum / F.col("_n").cast("double"),
            6,
        ).alias("entropy_bits"),
        F.round(
            F.col("_top").cast("double") / F.col("_n").cast("double"), 6
        ).alias("top_prob"),
    )


QUERIES = {
    "q226_transition_entropy": q226_transition_entropy,
    "q176_fm_user_registers": q176_fm_user_registers,
    "q208_sliding_distinct_users": q208_sliding_distinct_users,
    "q212_sliding_cube_incremental": q212_sliding_cube_incremental,
    "q214_priority_sample_sums": q214_priority_sample_sums,
    "q202_quantile_incremental": q202_quantile_incremental,
    "q203_group_quantiles": q203_group_quantiles,
    "q192_quantile_registers": q192_quantile_registers,
    "q193_quantile_estimates": q193_quantile_estimates,
    "q194_group_sample": q194_group_sample,
    "q173_merged_event_stats": q173_merged_event_stats,
    "q125_column_profile": q125_column_profile,
    "q128_event_transitions": q128_event_transitions,
    "q131_copurchase_pairs": q131_copurchase_pairs,
    "q133_rfm_segments": q133_rfm_segments,
    "q129_cohort_retention": q129_cohort_retention,
    "q130_funnel": q130_funnel,
    "q95_zorder_clustering": q95_zorder_clustering,
    "q54_rollup_agg": q54_rollup_agg,
    "q55_pivot_status": q55_pivot_status,
    "q56_rolling_order_total": q56_rolling_order_total,
    "q59_quantity_quartiles": q59_quantity_quartiles,
    "q62_approx_user_counts": q62_approx_user_counts,
    "q68_cube_agg": q68_cube_agg,
    "q77_approx_quartiles": q77_approx_quartiles,
    "q69_set_ops": q69_set_ops,
    "q70_semi_join": q70_semi_join,
    "q71_above_avg_orders": q71_above_avg_orders,
    "q72_ordered_string_agg": q72_ordered_string_agg,
    "q73_price_deciles": q73_price_deciles,
}

_QS_REG_SQL = f"""
            SELECT CAST('0x' || substr(md5('qs_' || CAST(event_id AS VARCHAR)),
                        1, 8) AS BIGINT) AS h,
                   CAST(event_id AS BIGINT) AS key,
                   CAST(value AS DOUBLE) AS value
            FROM events
            ORDER BY h, key LIMIT {_QS_K}
"""

_QS_PROBS_SQL = ", ".join(f"(CAST({p!r} AS DOUBLE))" for p in _QS_PROBS)

ORACLES = {
    "q194_group_sample": f"""
        WITH hh AS (
            SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
                   CAST('0x' || substr(md5('gs_' ||
                        CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
            FROM events
        )
        SELECT event_type, event_id, h, CAST(rn AS INT) AS grank
        FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY h, event_id) AS rn
            FROM hh
        ) WHERE rn <= {_GS_K}
    """,
    "q192_quantile_registers": _QS_REG_SQL,
    "q202_quantile_incremental": f"""
        WITH {", ".join(
            f'''b{b} AS MATERIALIZED (
            SELECT CAST('0x' || substr(md5('qs_' ||
                        CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS h,
                   CAST(event_id AS BIGINT) AS key,
                   CAST(value AS DOUBLE) AS value
            FROM events WHERE event_id % {_QS_BATCHES} = {b}
            ORDER BY h, key LIMIT {_QS_K}
        )''' for b in range(_QS_BATCHES)
        )}, {", ".join(
            f'''s{b} AS MATERIALIZED (
            SELECT h, key, value FROM (
                SELECT * FROM {"b0" if b == 1 else f"s{b - 1}"}
                UNION ALL SELECT * FROM b{b}
            ) ORDER BY h, key LIMIT {_QS_K}
        )''' for b in range(1, _QS_BATCHES)
        )}
        SELECT h, key, value FROM s{_QS_BATCHES - 1}
    """,
    "q203_group_quantiles": f"""
        WITH hh AS (
            SELECT lang,
                   CAST('0x' || substr(md5('qs_' ||
                        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h,
                   CAST(doc_id AS BIGINT) AS key,
                   CAST(n_chars AS DOUBLE) AS value
            FROM documents
        ), reg AS MATERIALIZED (
            SELECT lang, h, key, value FROM (
                SELECT *, row_number() OVER (PARTITION BY lang
                                             ORDER BY h, key) AS rn
                FROM hh
            ) WHERE rn <= {_GQ_K}
        ), ranked AS (
            SELECT lang, value,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY value, key) AS r,
                   COUNT(*) OVER (PARTITION BY lang) AS m
            FROM reg
        ), probs(p) AS (
            VALUES {", ".join(f"(CAST({p!r} AS DOUBLE))" for p in _GQ_PROBS)}
        )
        SELECT rk.lang, pr.p, rk.value AS estimate
        FROM ranked rk CROSS JOIN probs pr
        WHERE rk.r = greatest(CAST(ceil(pr.p * rk.m) AS BIGINT), 1)
    """,
    "q193_quantile_estimates": f"""
        WITH reg AS MATERIALIZED (
            {_QS_REG_SQL}
        ), m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m FROM reg
        ), ranked AS (
            SELECT value,
                   row_number() OVER (ORDER BY value, key) AS r
            FROM reg
        ), probs(p) AS (
            VALUES {_QS_PROBS_SQL}
        ), est AS MATERIALIZED (
            SELECT pr.p, rk.value AS estimate
            FROM probs pr CROSS JOIN m
            JOIN ranked rk
              ON rk.r = greatest(CAST(ceil(pr.p * m.m) AS BIGINT), 1)
        ), n AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
        ), audited AS (
            SELECT e.p, e.estimate,
                   CAST(SUM(CASE WHEN ev.value <= e.estimate
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_le
            FROM est e CROSS JOIN events ev
            GROUP BY e.p, e.estimate
        )
        SELECT a.p, ROUND(a.estimate, 6) AS estimate, a.n_le,
               ROUND(abs(CAST(a.n_le AS DOUBLE) / CAST(n.n AS DOUBLE)
                         - a.p), 6) AS cdf_err
        FROM audited a CROSS JOIN n
    """,
    "q208_sliding_distinct_users": _q208_oracle_sql(),
    "q212_sliding_cube_incremental": _q212_oracle_sql(),
    "q214_priority_sample_sums": _q214_oracle_sql(),
    "q176_fm_user_registers": f"""
        WITH h AS (
            SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS h,
                   user_id
            FROM events
        ), k AS (
            SELECT CAST(h % {_FM_REGISTERS} AS INT) AS register,
                   (h >> {_FM_REGISTERS.bit_length() - 1}) AS rest,
                   user_id
            FROM h
        ), r AS (
            SELECT register,
                   CASE WHEN rest = 0 THEN {60 - (_FM_REGISTERS.bit_length() - 1) + 1}
                        ELSE CAST(round(log2(CAST((rest & -rest) AS DOUBLE)), 0)
                                  AS INT) + 1 END AS rho,
                   user_id
            FROM k
        )
        SELECT register, CAST(MAX(rho) AS INT) AS max_rho,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
        FROM r GROUP BY register
    """,
    "q173_merged_event_stats": """
        WITH s0 AS (
            SELECT event_type, COUNT(value) AS cnt, SUM(value) AS s,
                   SUM(value * value) AS sumsq,
                   MIN(value) AS mn, MAX(value) AS mx
            FROM events WHERE event_id % 2 = 0 GROUP BY event_type
        ), s1 AS (
            SELECT event_type, COUNT(value) AS cnt, SUM(value) AS s,
                   SUM(value * value) AS sumsq,
                   MIN(value) AS mn, MAX(value) AS mx
            FROM events WHERE event_id % 2 = 1 GROUP BY event_type
        ), u AS (
            SELECT * FROM s0 UNION ALL SELECT * FROM s1
        ), m AS (
            SELECT event_type, SUM(cnt) AS cnt, SUM(s) AS s,
                   SUM(sumsq) AS sumsq, MIN(mn) AS mn, MAX(mx) AS mx
            FROM u GROUP BY event_type
        )
        SELECT event_type, CAST(cnt AS BIGINT) AS cnt,
               ROUND(s / CAST(cnt AS DOUBLE), 6) AS avg_value,
               ROUND(CASE WHEN cnt >= 2 THEN
                   sqrt(GREATEST(0.0, sumsq - s * s / CAST(cnt AS DOUBLE))
                        / (CAST(cnt AS DOUBLE) - 1.0)) END, 6) AS std_value,
               ROUND(mn, 6) AS min_value,
               ROUND(mx, 6) AS max_value
        FROM m
    """,
    "q133_rfm_segments": """
        WITH pc AS (
            SELECT o_custkey,
                   strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ), q AS (
            SELECT o_custkey, last_order, n_orders, monetary,
                   CAST(ntile(5) OVER (ORDER BY last_order, o_custkey)
                        AS INT) AS r_q,
                   CAST(ntile(5) OVER (ORDER BY n_orders, o_custkey)
                        AS INT) AS f_q,
                   CAST(ntile(5) OVER (ORDER BY monetary, o_custkey)
                        AS INT) AS m_q
            FROM pc
        )
        SELECT o_custkey, last_order, n_orders, monetary, r_q, f_q, m_q,
               CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
                   || CAST(m_q AS VARCHAR) AS segment
        FROM q
    """,
    "q131_copurchase_pairs": """
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), n AS (
            SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items
        ), pc AS (
            SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey
        ), pairs AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                   COUNT(*) AS support
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        )
        SELECT p.p1, p.p2, p.support,
               ROUND(n.n_orders * p.support / (c1.c * c2.c), 6) AS lift
        FROM pairs p
        JOIN pc c1 ON c1.l_partkey = p.p1
        JOIN pc c2 ON c2.l_partkey = p.p2
        CROSS JOIN n
    """,
    "q226_transition_entropy": """
        WITH t AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ), counts AS (
            SELECT prev AS from_type, event_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM t WHERE prev IS NOT NULL
            GROUP BY 1, 2
        ), per AS (
            SELECT from_type,
                   CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_next_types,
                   CAST(MAX(c) AS BIGINT) AS top,
                   list_sum(list_transform(
                       list({'to_type': to_type, 'c': c}
                            ORDER BY to_type, c),
                       s -> CAST(s.c AS DOUBLE)
                            * log2(CAST(s.c AS DOUBLE)))) AS ts
            FROM counts GROUP BY from_type
        )
        SELECT from_type, n AS n_transitions, n_next_types,
               ROUND(log2(CAST(n AS DOUBLE))
                     - ts / CAST(n AS DOUBLE), 6) AS entropy_bits,
               ROUND(top * 1.0 / n, 6) AS top_prob
        FROM per
    """,
    "q128_event_transitions": """
        WITH t AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        )
        SELECT prev AS from_type, event_type AS to_type,
               COUNT(*) AS n_transitions
        FROM t WHERE prev IS NOT NULL
        GROUP BY 1, 2
    """,
    "q129_cohort_retention": """
        WITH uw AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events
        ), c AS (
            SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
        )
        SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                              CAST(uw.week AS DATE)) / 7 AS BIGINT)
                   AS week_offset,
               COUNT(*) AS n_users
        FROM uw JOIN c ON uw.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "q130_funnel": """
        WITH m AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
            FROM events GROUP BY user_id
        ), f AS (
            SELECT CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 > t0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 > t0
                                  AND t2 > t1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n2
            FROM m
        )
        SELECT CAST(1 AS INT) AS step, 'view' AS step_name, n0 AS n_users FROM f
        UNION ALL SELECT CAST(2 AS INT), 'click', n1 FROM f
        UNION ALL SELECT CAST(3 AS INT), 'purchase', n2 FROM f
    """,
    "q125_column_profile": """
        SELECT 'l_orderkey' AS column, COUNT(l_orderkey) AS n_nonnull, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct, CAST(MIN(l_orderkey) AS VARCHAR) AS min_value, CAST(MAX(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
        UNION ALL SELECT 'l_linenumber' AS column, COUNT(l_linenumber) AS n_nonnull, CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_distinct, CAST(MIN(l_linenumber) AS VARCHAR) AS min_value, CAST(MAX(l_linenumber) AS VARCHAR) AS max_value FROM lineitem
        UNION ALL SELECT 'l_quantity' AS column, COUNT(l_quantity) AS n_nonnull, CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct, CAST(MIN(l_quantity) AS VARCHAR) AS min_value, CAST(MAX(l_quantity) AS VARCHAR) AS max_value FROM lineitem
        UNION ALL SELECT 'l_returnflag' AS column, COUNT(l_returnflag) AS n_nonnull, CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_distinct, CAST(MIN(l_returnflag) AS VARCHAR) AS min_value, CAST(MAX(l_returnflag) AS VARCHAR) AS max_value FROM lineitem
    """,
    "q54_rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q55_pivot_status": """
        SELECT o_orderpriority,
               ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
               ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
               ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        FROM orders
        GROUP BY o_orderpriority
    """,
    "q56_rolling_order_total": """
        SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                   AS rolling3_total
        FROM orders
    """,
    "q59_quantity_quartiles": """
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.50) AS q50,
               quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem
        GROUP BY l_returnflag
    """,
    # Sketch queries (q62/q77): the sketch estimate itself is
    # engine-specific, so the oracle checks the EXACT companion
    # columns and pins the sketch's error-bound flag to TRUE — a
    # sketch regression fails the hash gate via the flipped flag.
    "q62_approx_user_counts": """
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS sketch_within_3rsd
        FROM events GROUP BY event_type
    """,
    "q77_approx_quartiles": """
        SELECT l_returnflag, COUNT(*) AS n_rows,
               quantile_cont(l_quantity, 0.25) AS exact_q1,
               quantile_cont(l_quantity, 0.50) AS exact_median,
               quantile_cont(l_quantity, 0.75) AS exact_q3,
               TRUE AS sketch_within_10pct
        FROM lineitem GROUP BY l_returnflag
    """,
    "q68_cube_agg": """
        SELECT o_orderpriority, o_orderstatus,
               ROUND(SUM(o_totalprice), 2) AS total_price,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    # INTERSECT binds tighter than EXCEPT (SQL standard), matching the
    # engine's (F ∩ O) \ P
    "q69_set_ops": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    "q70_semi_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND o.o_orderstatus = 'O'
        )
    """,
    "q71_above_avg_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    "q72_ordered_string_agg": """
        WITH ranked AS (
            SELECT o_orderpriority, o_orderkey,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
            FROM orders
        )
        SELECT o_orderpriority,
               string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn)
                   AS top5_keys
        FROM ranked WHERE rn <= 5
        GROUP BY o_orderpriority
    """,
    "q95_zorder_clustering": f"""
        WITH z AS (
            SELECT o_custkey, o_orderkey,
                   ({_morton_sql('o_custkey', 'o_orderkey', _Z_BITS)}
                    >> {_Z_SHIFT}) AS zbucket
            FROM orders
        )
        SELECT zbucket,
               COUNT(*) AS n_rows,
               MIN(o_custkey) AS min_o_custkey,
               MAX(o_custkey) AS max_o_custkey,
               MIN(o_orderkey) AS min_o_orderkey,
               MAX(o_orderkey) AS max_o_orderkey
        FROM z GROUP BY zbucket
    """,
    "q73_price_deciles": """
        WITH tiled AS (
            SELECT o_totalprice,
                   ntile(10) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS decile
            FROM orders
        )
        SELECT CAST(decile AS INT) AS decile,
               COUNT(*) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM tiled
        GROUP BY decile
    """,
}
