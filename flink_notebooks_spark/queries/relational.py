"""Extended relational coverage: Q19–Q27 (SURVEY.md §2 Tier-B operators).

Fills the declared-operator gaps beyond §2.11's Q1–Q18: analytic window
functions (W5/W6), CUBE + GROUPING (A7), UNNEST/explode (J9), scalar-library
breadth (§2.7), interval joins (J6), as-of/temporal joins (J7), HOP and
CUMULATE windows (W2), and MATCH_RECOGNIZE-lite sequence patterns (W9).
Custom time/join/pattern semantics live in ``..operators`` — each a
one-shuffle composition of built-in expressions (see that module's docstrings
for the 100 TB cost argument); everything here stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import asof_join, cumulate_window, hop_window, interval_join, sequence_pattern
from ._registry import dsum, query, sql_dsum

# --- Q19: analytic OVER functions (W5, W6) ----------------------------------
@query(
    "q19_window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q19_window_analytics(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    ).orderBy("o_custkey", "o_orderkey")


# --- Q20: CUBE + GROUPING (A7) ----------------------------------------------
@query(
    "q20_cube",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS cnt, {sql_dsum("l_quantity", "sq")}
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY gid, rf, ls
    """,
)
def q20_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # CUBE's Expand multiplies rows 4x before the partial aggregate, so the
    # exact sum runs on 4n rows — Decimal-object sums there cost ~3x the whole
    # query (measured 1.18 s vs 0.39 s plain at sf0.1). Scale to integer cents
    # ONCE below the Expand instead: round(q*100) as long is exact for
    # 2-decimal values, the long sum is order-independent integer math with
    # MORE headroom than DECIMAL(18,2) (9.2e16 vs 1e16 in value terms; a
    # long-sum overflow raises loudly because spark.sql.ansi.enabled is
    # PINNED true in session.RUNTIME_CONFS — not merely inherited from
    # Spark 4's default), and /100 at the end reproduces the decimal result
    # bit-identically (verified vs dsum and the oracle).
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_quantity") * 100).cast("long").alias("q100"),
    )
    return (
        pre.cube("l_returnflag", "l_linestatus")
        .agg(
            # grouping() is only resolvable inside the grouping aggregate
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("gid"),
            F.count("*").alias("cnt"),
            (F.sum("q100").cast("double") / 100.0).alias("sq"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "gid",
            "cnt",
            "sq",
        )
        .orderBy("gid", "rf", "ls")
    )


# --- Q21: UNNEST / explode (J9) ---------------------------------------------
@query(
    "q21_unnest_words",
    oracle="""
    SELECT w AS word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS nd
    FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
          FROM documents)
    GROUP BY w ORDER BY word
    """,
)
def q21_unnest_words(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("word"),
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("nd"))
        .orderBy("word")
    )


# --- Q22: scalar-library breadth (§2.7) --------------------------------------
@query(
    "q22_scalar_breadth",
    oracle="""
    SELECT o_orderkey,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS okey_pad,
           CAST(regexp_extract(o_orderpriority, '([0-9])', 1) AS INT) AS prio_num,
           translate(o_orderstatus, 'OFP', 'XYZ') AS stat_x,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd,
           date_trunc('month', o_orderdate) AS mth,
           concat_ws('/', o_orderstatus, o_orderpriority) AS cw,
           CAST(o_orderkey % 7 AS BIGINT) AS m7,
           strpos(o_orderpriority, '-') AS pos,
           reverse(o_orderpriority) AS rev
    FROM orders ORDER BY o_orderkey
    """,
)
def q22_scalar_breadth(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("okey_pad"),
        F.regexp_extract("o_orderpriority", r"([0-9])", 1).cast("int").alias("prio_num"),
        F.translate("o_orderstatus", "OFP", "XYZ").alias("stat_x"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("dd"),
        F.date_trunc("month", "o_orderdate").alias("mth"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("cw"),
        F.pmod("o_orderkey", F.lit(7)).cast("long").alias("m7"),
        F.instr("o_orderpriority", "-").alias("pos"),
        F.reverse("o_orderpriority").alias("rev"),
    ).orderBy("o_orderkey")


# --- Q23: interval join, batch analog (J6) -----------------------------------
TEN_MIN_US = 600_000_000


@query(
    "q23_interval_join",
    oracle=f"""
    SELECT p.event_id AS p_id, p.user_id, COUNT(c.ts) AS n_clicks
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND epoch_us(c.ts) >= epoch_us(p.ts) - {TEN_MIN_US}
     AND epoch_us(c.ts) < epoch_us(p.ts)
    GROUP BY p.event_id, p.user_id ORDER BY p_id
    """,
)
def q23_interval_join(spark, sf_dir):
    """Clicks in the 10 minutes before each purchase, per user."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts_us").alias("p_us")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("c_us")
    )
    j = interval_join(
        purchases, clicks, "user_id", "p_us", "c_us", lower=-TEN_MIN_US, upper=0, how="left"
    )
    return (
        j.groupBy("p_id", "user_id")
        .agg(F.count("c_us").alias("n_clicks"))
        .select("p_id", "user_id", "n_clicks")
        .orderBy("p_id")
    )


# --- Q24: as-of / temporal join (J7) -----------------------------------------
@query(
    "q24_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           (SELECT p.event_id FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
              AND epoch_us(p.ts) <= epoch_us(e.ts)
            ORDER BY epoch_us(p.ts) DESC, p.event_id DESC LIMIT 1) AS last_purchase
    FROM events e ORDER BY e.event_id
    """,
)
def q24_asof_join(spark, sf_dir):
    """For every event: the latest preceding purchase by the same user
    (FOR SYSTEM_TIME AS OF semantics over an event-sourced 'versioned table')."""
    e = load_table(spark, sf_dir, "events")
    probe = e.select("user_id", "event_id", "ts_us")
    build = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts_us").alias("p_us")
    )
    j = asof_join(
        probe, build, on="user_id", probe_time="ts_us", build_time="p_us",
        payload=["purchase_id"],
    )
    return j.select(
        "event_id", "user_id", F.col("purchase_id").alias("last_purchase")
    ).orderBy("event_id")


# --- Q25: HOP / sliding window (W2) ------------------------------------------
@query(
    "q25_hop_window",
    oracle=f"""
    WITH x AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
    h AS (
      SELECT (us // 10000000) * 10000000 AS ws, event_type, value FROM x
      UNION ALL
      SELECT ((us - 5000000) // 10000000) * 10000000 + 5000000 AS ws, event_type, value FROM x
    )
    SELECT ws // 1000000 AS w, event_type, COUNT(*) AS c, {sql_dsum("value", "sv")}
    FROM h GROUP BY 1, 2 ORDER BY w, event_type
    """,
)
def q25_hop_window(spark, sf_dir):
    """10s windows sliding every 5s (each event lands in 2 windows)."""
    e = load_table(spark, sf_dir, "events")
    h = hop_window(e, "ts_us", width_us=10_000_000, slide_us=5_000_000)
    return (
        h.groupBy("w_start_us", "event_type")
        .agg(F.count("*").alias("c"), dsum("value", "sv"))
        .select(
            F.expr("w_start_us div 1000000").alias("w"), "event_type", "c", "sv"
        )
        .orderBy("w", "event_type")
    )


# --- Q26: CUMULATE window (W2) -----------------------------------------------
@query(
    "q26_cumulate_window",
    oracle=f"""
    WITH x AS (SELECT epoch_us(ts) AS us, value FROM events),
    c AS (SELECT (us // 60000000) * 60000000 AS ws, us, value FROM x),
    k AS (SELECT ws, value,
                 unnest(range(((us - ws) // 10000000) + 1, 7)) AS kk
          FROM c)
    SELECT ws // 1000000 AS w_s, (ws + kk * 10000000) // 1000000 AS w_e,
           COUNT(*) AS c, {sql_dsum("value", "sv")}
    FROM k GROUP BY 1, 2 ORDER BY w_s, w_e
    """,
)
def q26_cumulate_window(spark, sf_dir):
    """Growing 10s-step windows over a 60s span (Flink CUMULATE TVF)."""
    e = load_table(spark, sf_dir, "events")
    cm = cumulate_window(e, "ts_us", step_us=10_000_000, span_us=60_000_000)
    return (
        cm.groupBy("w_start_us", "w_end_us")
        .agg(F.count("*").alias("c"), dsum("value", "sv"))
        .select(
            F.expr("w_start_us div 1000000").alias("w_s"),
            F.expr("w_end_us div 1000000").alias("w_e"),
            "c",
            "sv",
        )
        .orderBy("w_s", "w_e")
    )


# --- Q28: CDC — Debezium envelope decode + changelog apply (S6) ---------------
@query(
    "q28_cdc_apply",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS price,
           o_orderstatus
    FROM orders WHERE o_orderkey % 97 <> 0 ORDER BY o_orderkey
    """,
)
def q28_cdc_apply(spark, sf_dir):
    """A deterministic Debezium change stream derived from ``orders`` —
    create for every row, an update (+1 price) for keys ≡0 (mod 10), a delete
    for keys ≡0 (mod 97) — serialized to envelope JSON, decoded with
    ``sources.cdc.parse_debezium``, materialized with ``apply_changelog``.
    The oracle computes the equivalent final state directly."""
    from pyspark.sql import types as T

    from ..sources import cdc

    row_type = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("o_orderstatus", T.StringType()),
        ]
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("price"), "o_orderstatus"
    )
    row = F.struct("o_orderkey", "price", "o_orderstatus")

    def env(before, after, op, ts):
        return F.to_json(
            F.struct(
                before.alias("before"), after.alias("after"),
                F.lit(op).alias("op"), F.lit(ts).cast("long").alias("ts_ms"),
            )
        ).alias("value")

    null_row = F.lit(None).cast(row_type)
    creates = o.select(env(null_row, row, "c", 1))
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("price", F.col("price") + 1.0)
        .select(env(null_row, F.struct("o_orderkey", "price", "o_orderstatus"), "u", 2))
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(env(row, null_row, "d", 3))

    raw = creates.unionByName(updates).unionByName(deletes)
    changes = cdc.parse_debezium(raw, "value", row_type)
    state = cdc.apply_changelog(changes, keys=["o_orderkey"])
    return state.select("o_orderkey", "price", "o_orderstatus").orderBy("o_orderkey")


# --- Q30: full TPC-H Q1 (pricing summary report) ------------------------------
@query(
    "q30_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q30_tpch_q1(spark, sf_dir):
    """TPC-H Q1 verbatim shape: one scan, partial+final hash aggregate on a
    ~6-group key, shuffle of constant size at any SF. All money sums go
    through exact decimals (order-independent — identical at any partition
    count); the per-row double products are computed identically on both
    engines before the decimal cast."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,6)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*"))
            .alias("avg_qty"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double") / F.count("*"))
            .alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q31: TPC-H Q3 shape (shipping priority: 3-way join + agg + top-k) --------
@query(
    "q31_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, odate, l_orderkey LIMIT 10
    """,
)
def q31_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (o_orderpriority stands in for o_shippriority, which the
    fixture lacks). Scale plan: all three filters are pushed to the parquet
    scans BEFORE the joins (1/5 of customers, date-split orders/lineitem), the
    two joins shuffle on their keys, the aggregate is partial+final on
    l_orderkey, and the top-10 is TakeOrderedAndProject — per-partition heaps,
    no global sort. Revenue sums via exact decimals (order-independent)."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "odate", "l_orderkey")
        .limit(10)
    )


# --- Q32: TPC-H Q5 shape (6-table star join, regional revenue) ----------------
@query(
    "q32_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q32_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape: the classic 6-table star. Scale plan: nation/region are
    schema-fixed (≤25 rows at ANY scale factor) → explicit broadcast, zero
    shuffle for those joins; the fact-side chain lineitem⨝orders⨝customer⨝
    supplier shuffles on join keys with the date filter pushed into the orders
    scan first. The c_nationkey = s_nationkey constraint rides along as a
    post-join filter on already-joined columns. Final agg has ≤25 groups —
    constant-size shuffle at any SF."""
    reg = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --- Q33: MATCH_RECOGNIZE funnel (W9 full row-pattern recognition) ------------
@query(
    "q33_match_recognize",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ), nxt AS (
      SELECT l.user_id, l.rn AS lrn, l.ts_us AS start_us,
             (SELECT MIN(rn) FROM s x WHERE x.user_id = l.user_id
                AND x.rn > l.rn AND x.event_type <> 'click') AS nrn
      FROM s l WHERE l.event_type = 'view')
    SELECT n.user_id, n.start_us, p.ts_us AS end_us,
           (n.nrn - n.lrn - 1) AS n_clicks
    FROM nxt n JOIN s p ON p.user_id = n.user_id AND p.rn = n.nrn
    WHERE p.event_type = 'purchase' AND n.nrn - n.lrn >= 2
    ORDER BY n.user_id, n.start_us
    """,
)
def q33_match_recognize(spark, sf_dir):
    """MATCH_RECOGNIZE view→click+→purchase funnel per user. The oracle is a
    window-function reformulation: for this pattern a match span holds exactly
    one 'view' (its first row), so greedy matches can never overlap and SKIP
    PAST LAST ROW suppresses nothing — making the semantics SQL-expressible.
    DEFINE predicates evaluate JVM-side; only the linear span scan runs in
    Arrow-batched pandas (operators/match_recognize.py)."""
    from ..operators import match_recognize

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us", "event_type"
    )
    return match_recognize(
        e,
        """
        PARTITION BY user_id
        ORDER BY ts_us, event_id
        MEASURES A.ts_us AS start_us, LAST(C.ts_us) AS end_us,
                 COUNT(B.*) AS n_clicks
        PATTERN (A B+ C)
        DEFINE A AS A.event_type = 'view', B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'
        """,
    ).orderBy("user_id", "start_us")


# --- Q37: MATCH_RECOGNIZE with an UNBOUNDED sequence group --------------------
SEQ_GROUP_ORACLE = """
    WITH RECURSIVE s AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events),
    pr AS (
      SELECT a.user_id, a.rn
      FROM s a JOIN s b ON b.user_id = a.user_id AND b.rn = a.rn + 1
      WHERE a.event_type = 'view' AND b.event_type = 'click'),
    chain(user_id, start_rn, j) AS (
      SELECT user_id, rn, 1 FROM pr
      UNION ALL
      SELECT c.user_id, c.start_rn, c.j + 1
      FROM chain c JOIN pr p ON p.user_id = c.user_id
                            AND p.rn = c.start_rn + 2 * c.j),
    m AS (
      SELECT a.user_id, a.rn AS s_rn, a.ts_us AS start_us, MAX(c.j) AS n_pairs
      FROM s a
      JOIN chain c ON c.user_id = a.user_id AND c.start_rn = a.rn + 1
      JOIN s p ON p.user_id = a.user_id AND p.rn = a.rn + 1 + 2 * c.j
      WHERE a.event_type = 'signup' AND p.event_type = 'purchase'
      GROUP BY a.user_id, a.rn, a.ts_us)
    SELECT m.user_id, m.start_us, p.ts_us AS end_us, m.n_pairs
    FROM m JOIN s p ON p.user_id = m.user_id
                   AND p.rn = m.s_rn + 1 + 2 * m.n_pairs
    ORDER BY m.user_id, m.start_us
    """



@query(
    "q37_seq_group_pattern",
    oracle=SEQ_GROUP_ORACLE,
)
def q37_seq_group_pattern(spark, sf_dir):
    """MATCH_RECOGNIZE with an unbounded sequence group: a signup followed
    by one-or-more strictly-alternating (view click) pairs and a closing
    purchase — ``PATTERN (S (V C)+ P)``. The oracle reformulates the greedy
    repetition in SQL: a recursive CTE builds every alternating pair chain,
    and MAX(j) with a purchase at the chain's end is exactly the greediest
    repetition count the matcher's most-reps-first flattening picks. The
    leading signup makes match spans provably non-overlapping (span
    interiors hold only view/click/purchase rows), so SKIP PAST LAST ROW
    suppresses nothing and the per-signup computation is independent —
    SQL-expressible without sequential-consumption state."""
    from ..operators import match_recognize

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us", "event_type"
    )
    return match_recognize(
        e,
        """
        PARTITION BY user_id
        ORDER BY ts_us, event_id
        MEASURES FIRST(S.ts_us) AS start_us, LAST(P.ts_us) AS end_us,
                 COUNT(V.*) AS n_pairs
        PATTERN (S (V C)+ P)
        DEFINE S AS S.event_type = 'signup', V AS V.event_type = 'view',
               C AS C.event_type = 'click', P AS P.event_type = 'purchase'
        """,
    ).orderBy("user_id", "start_us")


# --- Q34: explicit GROUPING SETS (A7 beyond ROLLUP/CUBE) ----------------------
@query(
    "q34_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus,'ALL') AS st, COALESCE(o_orderpriority,'ALL') AS pr,
           CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
    ORDER BY gid, st, pr
    """,
)
def q34_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS through Spark SQL — Catalyst expands to a
    single Expand + hash aggregate (one pass over the fact table regardless
    of how many sets are requested; at 100 TB this beats N separate
    aggregations unioned)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus,'ALL') AS st,
               COALESCE(o_orderpriority,'ALL') AS pr,
               CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS INT) AS gid,
               COUNT(*) AS cnt
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority), ())
        ORDER BY gid, st, pr
        """
    )


# --- Q35: ordered string aggregation (LISTAGG family, §2.7) -------------------
@query(
    "q35_string_agg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS keys_csv,
           COUNT(*) AS n
    FROM (SELECT * FROM orders WHERE o_orderkey < 500)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q35_string_agg(spark, sf_dir):
    """LISTAGG/string_agg with deterministic ORDER BY inside the aggregate:
    collect_list + array_sort + array_join keeps it one hash aggregate (the
    sort happens per group on the collected array, never a global sort).
    The key filter bounds per-group array size — the pattern to insist on at
    100 TB, where unbounded collect_list is an OOM."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col("o_orderkey"))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("keys_csv"),
            F.count("*").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


# --- Q36: conditional + safe-cast breadth (§2.7 conditional/casting family) ---
@query(
    "q36_conditional_breadth",
    oracle="""
    SELECT o_orderkey,
      TRY_CAST(CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey AS VARCHAR)
               ELSE o_orderpriority END AS INT) AS bad_cast,
      TRY_CAST(substring(o_orderpriority,1,1) AS INT) AS pr_num,
      NULLIF(o_orderstatus, 'O') AS st_n,
      IF(o_totalprice > 100000, 'hi', 'lo') AS band,
      o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f,
      COALESCE(TRY_CAST('x' AS INT), -1) AS fallback
    FROM orders ORDER BY o_orderkey
    """,
)
def q36_conditional_breadth(spark, sf_dir):
    """TRY_CAST (null on failure — load-bearing under ANSI mode, where plain
    CAST throws), NULLIF, IF, IS NOT DISTINCT FROM (null-safe equality <=>),
    COALESCE fallback. All whole-stage codegen, map-only.

    Scale note (and the round-14 change): under ANSI mode a FAILING
    try_cast costs ~12µs/row (a Java exception per failure inside TryEval)
    — ~13× a successful cast — and the cast column here fails on half its
    rows. The fix this docstring used to only recommend is now applied:
    a cheap integer-shape regexp guards the cast, so non-parsing rows take
    the NULL arm without ever throwing, and try_cast runs only on rows it
    will (overflow aside) succeed on. Result-equivalent to the bare
    try_cast: both yield NULL exactly for non-integral strings (the guard
    uses \\s* where the JVM cast trims unicode whitespace — identical on
    any ASCII-spaced data; for exotic-whitespace corpora keep plain
    try_cast), and overflow still goes through try_cast's NULL path.
    Isolated sf0.1 median 2.58s → 1.11s (−57%); oracle hash-verified."""
    o = load_table(spark, sf_dir, "orders")
    int_shape = r"^\s*[+-]?[0-9]+\s*$"
    mixed = F.when(
        F.col("o_orderkey") % 2 == 0, F.col("o_orderkey").cast("string")
    ).otherwise(F.col("o_orderpriority"))
    pr1 = F.substring("o_orderpriority", 1, 1)
    return o.select(
        "o_orderkey",
        F.when(mixed.rlike(int_shape), mixed.try_cast("int")).alias("bad_cast"),
        F.when(pr1.rlike(int_shape), pr1.try_cast("int")).alias("pr_num"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st_n"),
        F.when(F.col("o_totalprice") > 100000, "hi").otherwise("lo").alias("band"),
        F.col("o_orderstatus").eqNullSafe(F.lit("F")).alias("is_f"),
        F.coalesce(F.lit("x").try_cast("int"), F.lit(-1)).alias("fallback"),
    ).orderBy("o_orderkey")


# --- Q29: JSON function breadth (§2.7 JSON family) ----------------------------
@query(
    "q29_json_breadth",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_valid(props) AS ok,
           CAST(json_extract_string(json_object('v', value), '$.v') AS DOUBLE) AS v_round,
           json_array_length(json_array(user_id, event_id)) AS arr_len
    FROM events ORDER BY event_id
    """,
)
def q29_json_breadth(spark, sf_dir):
    """JSON scalar family (Flink JSON_VALUE/JSON_OBJECT/JSON_EXISTS ↔ Spark
    get_json_object/to_json/from_json): extract, validate-by-parse, build an
    object and round-trip it, build an array and measure it."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        # JSON_EXISTS analog: a parse that yields a non-null struct
        F.from_json("props", "k long").isNotNull().alias("ok"),
        F.get_json_object(F.to_json(F.struct(F.col("value").alias("v"))), "$.v")
        .cast("double")
        .alias("v_round"),
        F.expr("size(from_json(to_json(array(user_id, event_id)), 'array<long>'))").alias(
            "arr_len"
        ),
    ).orderBy("event_id")


# --- Q27: MATCH_RECOGNIZE-lite sequence pattern (W9) --------------------------
@query(
    "q27_cep_pattern",
    oracle="""
    WITH s AS (SELECT user_id,
                      string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_us(ts), event_id) AS seq
               FROM events GROUP BY user_id)
    SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
           CAST((length(seq) - length(replace(seq, 'vp', ''))) // 2 AS BIGINT) AS n_matches
    FROM s ORDER BY user_id
    """,
)
def q27_cep_pattern(spark, sf_dir):
    """Count view→purchase adjacencies per user over the time-ordered
    event-type sequence (the common MATCH_RECOGNIZE workload)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts_us", "event_id", "event_type")
    m = sequence_pattern(
        e, key="user_id", order_cols=["ts_us", "event_id"],
        symbol="substring(event_type, 1, 1)", pattern="vp",
    )
    return m.select(
        "user_id", F.length("seq").cast("long").alias("seq_len"), "n_matches"
    ).orderBy("user_id")


# --- Kafka connector round-trip (S4) -----------------------------------------
@query(
    "kafka_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n, {sql_dsum("o_totalprice", "total")}
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def kafka_roundtrip(spark, sf_dir):
    """Kafka source/sink integration (SURVEY.md S4; reference
    CONNECTORS.md:98-109) as a correctness query: publish a projection of
    ``orders`` to a file-backed emulated topic, consume the topic back as
    JSON records, aggregate. The record encode/decode (to_json → Kafka
    record → from_json against the declared schema) is byte-identical to
    the real-broker transport — only the record store differs; a broker
    deployment swaps 'file:///…' for 'host:port' in the table options. At
    scale the consumer is one map-only scan; the aggregate is the usual
    partial-agg shuffle on o_orderstatus."""
    import tempfile

    from pyspark.sql import types as T

    from ..engine.ddl import ColumnDef, TableDef
    from ..sources import kafka

    tmp = tempfile.mkdtemp(prefix="fns-kafka-")
    topic = TableDef(
        name="orders_topic",
        columns=[
            ColumnDef("o_orderkey", T.LongType()),
            ColumnDef("o_orderstatus", T.StringType()),
            ColumnDef("o_totalprice", T.DoubleType()),
        ],
        options={
            "connector": "kafka",
            "topic": "orders",
            "properties.bootstrap.servers": f"file://{tmp}",
            "format": "json",
            "scan.startup.mode": "earliest-offset",
        },
    )
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    kafka.write_batch(src, topic, overwrite=False)
    back = kafka.build_batch(spark, topic)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "total"))
        .orderBy("o_orderstatus")
    )


# --- JDBC connector round-trip (S5) ------------------------------------------
@query(
    "jdbc_roundtrip",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(c_nationkey) AS BIGINT) AS nat_sum
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def jdbc_roundtrip(spark, sf_dir):
    """JDBC source/sink integration (SURVEY.md S5; reference
    CONNECTORS.md:113-121,144-152) as a correctness query: write a
    projection of ``customer`` to the embedded Derby database Spark ships,
    read it back over the same JDBC scan path, aggregate. The identical
    adapter drives Postgres/MySQL by swapping url/driver table options; at
    scale reads parallelize via scan.partition.* → Spark's
    partitionColumn/numPartitions ranged scans (tests/test_jdbc_derby.py)."""
    import tempfile

    from pyspark.sql import types as T

    from ..engine.ddl import ColumnDef, TableDef
    from ..sources import jdbc as jdbc_src

    tmp = tempfile.mkdtemp(prefix="fns-jdbc-")
    tbl = TableDef(
        name="customer_jdbc",
        columns=[
            ColumnDef("c_custkey", T.LongType()),
            ColumnDef("c_mktsegment", T.StringType()),
            ColumnDef("c_nationkey", T.LongType()),
        ],
        options={
            "connector": "jdbc",
            "url": f"jdbc:derby:{tmp}/db;create=true",
            "table-name": "CUSTOMER_RT",
            "driver": "org.apache.derby.jdbc.EmbeddedDriver",
        },
    )
    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    jdbc_src.write_batch(src, tbl, overwrite=True)
    back = jdbc_src.build_batch(spark, tbl)
    return (
        back.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.sum("c_nationkey").alias("nat_sum"))
        .orderBy("c_mktsegment")
    )
