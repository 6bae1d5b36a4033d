"""Declared batch correctness queries Q1–Q18 (SURVEY.md §2.11).

These exercise the full batch operator inventory the reference exposes via
Flink SQL (SURVEY.md §2.2–§2.7; capability citation
reference:flink-runtime/build.gradle:37). Everything here is a declarative
DataFrame plan — Catalyst does predicate pushdown, column pruning, join
selection (broadcast for the small dims), partial aggregation, and AQE does
runtime coalescing/skew handling. No collect(), no driver-side loops: every
query is a DataFrame the caller may write out or page through, so the same
plan runs at sf0.001 and at 100 TB.

Scale notes per query are inline. Explicit ``F.broadcast`` is applied only to
dimensions that are small *by schema design* (region/nation: ≤25 rows at any
scale factor — TPC-H fixed tables), never to tables that grow with SF.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from ._registry import davg, dsum, query, sql_davg, sql_dsum


# --- Q1: constant select (P1, P5; reference SETUP.md:76 smoke query) --------
@query("q01_const", oracle="SELECT 1 AS id, 'Hello Flink!' AS message")
def q01_const(spark, sf_dir):
    return spark.range(1).select(F.lit(1).alias("id"), F.lit("Hello Flink!").alias("message"))


# --- Q2: projection + ORDER BY + LIMIT (P1, O2) -----------------------------
@query(
    "q02_scan_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50",
)
def q02_scan_limit(spark, sf_dir):
    # TakeOrderedAndProject: per-partition top-50 then merge — no full sort,
    # no full shuffle; scans only 2 columns (column pruning reaches parquet).
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(50)
    )


# --- Q3: filter + arithmetic projection (P2, P3) ----------------------------
@query(
    "q03_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem WHERE l_quantity > 30
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q03_filter_project(spark, sf_dir):
    # Filter is pushed to the parquet scan (PushedFilters: GreaterThan).
    # Per-row IEEE arithmetic is deterministic — no decimal trick needed.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 30)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --- Q4: hash aggregate w/ HAVING (A1-A5, A9; mirrors TPC-H Q1) -------------
@query(
    "q04_group_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           SUM(l_quantity) AS sq,
           {sql_davg("l_extendedprice", "ap")},
           MIN(l_shipdate) AS mind, MAX(l_shipdate) AS maxd
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) > 0
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q04_group_agg(spark, sf_dir):
    # Tungsten HashAggregate with partial (map-side) aggregation: the shuffle
    # moves one row per (flag, status) per partition — ~6 groups regardless
    # of SF, so this scales to 100 TB with a constant-size shuffle.
    # l_quantity is integer-valued → plain double SUM is exact.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("l_quantity").alias("sq"),
            davg("l_extendedprice", "ap"),
            F.min("l_shipdate").alias("mind"),
            F.max("l_shipdate").alias("maxd"),
        )
        .filter(F.col("cnt") > 0)
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q5: inner equi-join (J1) ----------------------------------------------
@query(
    "q05_join_inner",
    oracle="""
    SELECT c.c_custkey, n.n_name, c.c_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY c.c_custkey
    """,
)
def q05_join_inner(spark, sf_dir):
    # nation is 25 rows at every SF → broadcast-hash join, zero shuffle of
    # the (large) customer side.
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "n_name", "c_acctbal")
        .orderBy("c_custkey")
    )


# --- Q6: multi-join + agg + top-k (J1×2, A2, O1, O3) ------------------------
@query(
    "q06_join_agg_topk",
    oracle=f"""
    SELECT n.n_name, {sql_dsum("o.o_totalprice", "rev")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_regionkey
    GROUP BY n.n_name
    ORDER BY rev DESC, n.n_name LIMIT 10
    """,
)
def q06_join_agg_topk(spark, sf_dir):
    # orders⋈customer is the big join (shuffle on custkey; AQE may turn it
    # into broadcast at small SF); nation side is broadcast. Aggregation
    # reduces to ≤25 groups before the final top-k.
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(dsum("o_totalprice", "rev"))
        .orderBy(F.desc("rev"), "n_name")
        .limit(10)
    )


# --- Q7: left outer join + agg (J2) ----------------------------------------
@query(
    "q07_left_join",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS cnt
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
)
def q07_left_join(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
        .orderBy("c_custkey")
    )


# --- Q8: semi + anti join via IN / NOT IN (J4, J5) --------------------------
@query(
    "q08_semi_anti",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
      AND p_partkey NOT IN (SELECT s_suppkey FROM supplier)
    ORDER BY p_partkey
    """,
)
def q08_semi_anti(spark, sf_dir):
    # left_semi then left_anti — Catalyst plans both as hash joins; the semi
    # join side (lineitem keys) is aggregated implicitly by the join, and the
    # anti side (supplier) is broadcast-sized.
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .join(s, p.p_partkey == s.s_suppkey, "left_anti")
        .select("p_partkey")
        .orderBy("p_partkey")
    )


# --- Q9: distinct aggregate (A6) -------------------------------------------
@query(
    "q09_count_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS dc
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q09_count_distinct(spark, sf_dir):
    # Catalyst expands to a two-stage aggregate (distinct keys first, then
    # count) — partial aggregation keeps the shuffle proportional to the
    # number of distinct (status, custkey) pairs, not input rows.
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("dc"))
        .orderBy("o_orderstatus")
    )


# --- Q10: ROLLUP (A7) -------------------------------------------------------
@query(
    "q10_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           SUM(l_quantity) AS sq
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
)
def q10_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sq"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sq",
        )
        .orderBy("rf", "ls")
    )


# --- Q11: ranking + running-sum OVER windows (W4, W6) -----------------------
@query(
    "q11_window_rank_runsum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
    FROM orders ORDER BY o_custkey, rn
    """,
)
def q11_window_rank_runsum(spark, sf_dir):
    # Window shuffles on o_custkey once; both functions share the same
    # window spec so a single sort serves both. Decimal sum keeps the
    # running total exact (DuckDB computes moving sums with a segment tree —
    # a different association order, so doubles would drift).
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(wf).cast("double").alias("run"),
    ).orderBy("o_custkey", "rn")


# --- Q12: LAG analytic window (W5) ------------------------------------------
@query(
    "q12_window_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def q12_window_lag(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", F.lag("o_totalprice").over(w).alias("prev")
    ).orderBy("o_custkey", "o_orderkey")


# --- Q13: tumbling-window aggregation, batch analog (W1) --------------------
# Our engine uses F.window (same operator the streaming path uses —
# reference example: 10s tumble, examples/01-datagen-streaming.flinknb:47);
# the oracle expresses the identical bucketing with epoch arithmetic.
@query(
    "q13_tumble_window",
    oracle=f"""
    SELECT CAST(FLOOR(EXTRACT(EPOCH FROM ts) / 10) AS BIGINT) * 10 AS w,
           event_type, COUNT(*) AS c, {sql_dsum("value", "sv")}
    FROM events GROUP BY 1, 2 ORDER BY w, event_type
    """,
)
def q13_tumble_window(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 seconds").alias("win"), "event_type")
        .agg(F.count("*").alias("c"), dsum("value", "sv"))
        .select(
            # NTZ-safe epoch: integer seconds since epoch of the window start.
            F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', win.start)").alias(
                "w"
            ),
            "event_type",
            "c",
            "sv",
        )
        .orderBy("w", "event_type")
    )


# --- Q14: set operations (O4, O5) -------------------------------------------
@query(
    "q14a_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY k
    """,
)
def q14a_intersect(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@query(
    "q14b_except",
    oracle="""
    SELECT n_nationkey FROM nation
    EXCEPT
    SELECT c_nationkey FROM customer
    ORDER BY n_nationkey
    """,
)
def q14b_except(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    return n.exceptAll(c).distinct().orderBy("n_nationkey")


# --- Q15: scalar function library (§2.7) ------------------------------------
@query(
    "q15_scalars",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority) AS pu,
           SUBSTRING(o_orderstatus, 1, 1) AS s1,
           YEAR(o_orderdate) AS y,
           ROUND(o_totalprice, 0) AS rt,
           CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS sz
    FROM orders ORDER BY o_orderkey
    """,
)
def q15_scalars(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pu"),
        F.substring("o_orderstatus", 1, 1).alias("s1"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.round("o_totalprice", 0).alias("rt"),
        F.when(F.col("o_totalprice") > 100000, "big").otherwise("small").alias("sz"),
    ).orderBy("o_orderkey")


# --- Q16: JSON extraction (§2.7 JSON family) --------------------------------
@query(
    "q16_json",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events ORDER BY event_id
    """,
)
def q16_json(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", F.get_json_object("props", "$.k").alias("k")).orderBy("event_id")


# --- Q17: theta (non-equi) join (J3) ----------------------------------------
@query(
    "q17_theta_join",
    oracle="""
    SELECT r.r_regionkey, n.n_nationkey
    FROM region r JOIN nation n ON n.n_regionkey < r.r_regionkey
    ORDER BY r.r_regionkey, n.n_nationkey
    """,
)
def q17_theta_join(spark, sf_dir):
    # Non-equi join → BroadcastNestedLoopJoin; region is 5 rows at any SF so
    # the broadcast side is trivially small.
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey < r.r_regionkey)
        .select("r_regionkey", "n_nationkey")
        .orderBy("r_regionkey", "n_nationkey")
    )


# --- Q18: per-aggregate FILTER clause (A8) ----------------------------------
@query(
    "q18_agg_filter",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sf,
           COUNT(*) AS c
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def q18_agg_filter(spark, sf_dir):
    # F.when(cond, x) with no otherwise → NULL for non-matching rows; SUM
    # ignores NULLs — identical semantics to SQL's FILTER clause (groups with
    # zero matching rows yield NULL on both sides).
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).cast("decimal(18,2)")
            )
            .cast("double")
            .alias("sf"),
            F.count("*").alias("c"),
        )
        .orderBy("o_custkey")
    )
