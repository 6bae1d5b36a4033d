"""TPC-H kit completion: Q6/Q8/Q9/Q11/Q12/Q14/Q16/Q19 adaptations (q49–q56).

With tpch.py (Q1/Q3/Q5-shape q30–q32), tpch2.py (Q4/Q7/Q10/Q13/Q15/Q17/Q18/
Q20/Q21/Q22/Q2) and these eight, every TPC-H plan shape the fixture schema
can express is registered. The reference accepts arbitrary Flink SQL
(reference flink-runtime/build.gradle:37 — the planner jar carries the whole
dialect), so decision-support coverage is engine capability, not benchmark
cosplay; where the fixture lacks a column (partsupp, shipmode, containers,
comments) each query keeps the original's PLAN SHAPE on columns that exist,
same convention as tpch2.py.

Determinism: money sums ride DECIMAL(18,6) exactly as the registry contract
requires; every ratio divides double-cast decimal sums (never decimal÷decimal
— DuckDB would keep decimal division, Spark wouldn't); thresholds compare
double-cast values so boundary rows can't flip with partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ._registry import query

_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


# --- Q49: TPC-H Q6 (forecasting revenue change — pure scan-aggregate) ---------
@query(
    "q49_tpch_q6",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q49_tpch_q6(spark, sf_dir):
    """TPC-H Q6 verbatim (the fixture has every column). The kit's pure
    scan-aggregate: no join, no group key — the whole query is predicate
    pushdown + a partial/final global sum.

    Scale plan: all three range predicates reach the parquet scan as
    PushedFilters (shipdate year, discount band, quantity cap — row groups
    outside any range are skipped on footer statistics), the scan reads
    exactly 4 columns, and the only exchange is the single-partition final
    sum — a fixed-size shuffle at any SF. The discount band compares the
    stored 2-decimal doubles against the same double literals on both
    engines, so membership is bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --- Q50: TPC-H Q8 (national market share — CASE ratio over an 8-way join) ----
@query(
    "q50_tpch_q8",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume_c
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(volume_c) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                 {_REV} AS volume_c, n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer,
               nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
            AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def q50_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (share of NATION_5 suppliers in ASIA's ECONOMY-part market,
    by order year) — the kit's widest join: part, supplier, lineitem, orders,
    customer, nation twice, region, then a conditional-sum ratio.

    Scale plan: the selective filters cut BEFORE the fact joins — p_type
    prunes part to 1/6 (pushed to its scan) and the two-year window pushes
    into the orders scan; nation (25 rows) and region (5) broadcast on both
    the customer-region and supplier-nation branches, and the filtered part
    list broadcasts into lineitem. The two big shuffles are
    lineitem⨝orders (orderkey) and ⨝customer (custkey). Both CASE branches
    sum exact decimals and the share divides double-cast sums once, rounded
    once — order-independent at any parallelism."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(
        nat.join(
            F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
        ).select(F.col("n_nationkey").alias("cust_nk"))
    )
    n2 = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("nation")
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("cust_nk"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("supp_nk"))
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        joined.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume_c"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_5", F.col("volume_c")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume_c").cast("double")
            ).alias("share_raw")
        )
        .select("o_year", F.round("share_raw", 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- Q51: TPC-H Q9 (product-type profit measure — LIKE filter + rollup) -------
# partsupp's supplycost analog is the q48 convention: MIN(l_extendedprice)
# per (part, supplier) pair, rolled up from lineitem itself.
@query(
    "q51_tpch_q9",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2)
    SELECT nation, o_year, CAST(SUM(amount_c) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      - ps_supplycost * l_quantity AS DECIMAL(18,6)) AS amount_c
          FROM part, supplier, lineitem, ps, orders, nation
          WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
            AND ps_partkey = l_partkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%') profit
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def q51_tpch_q9(spark, sf_dir):
    """TPC-H Q9 (profit by supplier nation and order year, over parts whose
    name CONTAINS a color — the kit's non-prefix LIKE). Profit per lineitem =
    revenue − supplycost×quantity, with supplycost the (part, supplier)
    MIN(l_extendedprice) rollup standing in for partsupp (q48 convention).

    Scale plan: the contains-LIKE pushes to the part scan as a
    StringContains filter (no index help, but row groups still skip on
    dictionary pages) and the surviving part keys BROADCAST into lineitem
    before anything else; the ps rollup aggregates lineitem on
    (l_partkey, l_suppkey) once and joins back pairwise; orders joins on the
    order key; nation broadcasts. The profit expression is one float tree
    evaluated identically on both engines, then cast to exact decimal for
    the order-independent sum."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_q9")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_q9")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q9")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q9")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_q9")
    return spark.sql(
        """
        WITH ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 MIN(l_extendedprice) AS ps_supplycost
          FROM lineitem_q9 GROUP BY 1, 2)
        SELECT nation, o_year, CAST(SUM(amount_c) AS DOUBLE) AS sum_profit
        FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                     CAST(l_extendedprice * (1 - l_discount)
                          - ps_supplycost * l_quantity AS DECIMAL(18,6)) AS amount_c
              FROM part_q9, supplier_q9, lineitem_q9, ps, orders_q9, nation_q9
              WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
                AND ps_partkey = l_partkey AND p_partkey = l_partkey
                AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
                AND p_name LIKE '%red%') profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC
        """
    )


# --- Q52: TPC-H Q11 (important stock — group-by vs global scalar HAVING) ------
@query(
    "q52_tpch_q11",
    oracle="""
    WITH pv AS (
      SELECT l_partkey AS ps_partkey,
             SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS value_c
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_7'
      GROUP BY 1)
    SELECT ps_partkey, CAST(value_c AS DOUBLE) AS value
    FROM pv
    WHERE CAST(value_c AS DOUBLE) >
          (SELECT CAST(SUM(value_c) AS DOUBLE) * 0.001 FROM pv)
    ORDER BY value DESC, ps_partkey
    """,
)
def q52_tpch_q11(spark, sf_dir):
    """TPC-H Q11 (parts representing a significant share of one nation's
    stock value): a grouped aggregate compared against a FRACTION OF THE
    GLOBAL TOTAL of the same aggregate — the group-vs-global-scalar HAVING
    shape nothing else in the registry exercises (q40's scalar is a MAX of
    the groups; this one re-aggregates the groups).

    Scale plan: the per-part value view computes ONCE (persisted + memoized
    per session, q15's contract) and both consumers — the scalar SUM and the
    threshold filter — read the persisted blocks; the nation filter prunes
    suppliers before the lineitem join via broadcast. Threshold semantics:
    both engines compare double-cast exact-decimal sums against
    (double total) × 0.001, so the boundary cannot flip with partitioning
    or engine decimal-division rules."""
    pv = _q11_value(spark, sf_dir)
    thr = pv.agg(
        (F.sum("value_c").cast("double") * F.lit(0.001)).alias("thr")
    )
    return (
        pv.join(F.broadcast(thr), F.col("value_c").cast("double") > F.col("thr"))
        .select("ps_partkey", F.col("value_c").cast("double").alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


_Q11_MEMO: dict = {}


def _q11_value(spark, sf_dir):
    """NATION_7's per-part stock value, persisted + memoized per (session,
    dataset) — the scalar-total branch and the threshold filter both read it
    (same lifecycle contract as tpch2._q15_revenue)."""
    from pyspark import StorageLevel

    from .llm import _memo_put

    key = (spark.sparkContext.applicationId, sf_dir, "q11val")
    pv = _Q11_MEMO.get(key)
    if pv is None:
        sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
        nat = (
            load_table(spark, sf_dir, "nation")
            .filter(F.col("n_name") == "NATION_7")
            .select("n_nationkey")
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
        )
        val = (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(18,6)")
        pv = (
            li.join(
                F.broadcast(
                    sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
                ),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
            .groupBy(F.col("l_partkey").alias("ps_partkey"))
            .agg(F.sum(val).alias("value_c"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _memo_put(_Q11_MEMO, key, pv)
    return pv


# --- Q53: TPC-H Q12 (shipping-mode priority buckets) ---------------------------
# The fixture has no l_shipmode; l_returnflag plays the 2-of-N bucket column
# (IN ('A','N')), and "late" = shipped > 90 days after the order date (the
# fixture lacks commitdate/receiptdate — same lateness convention as q46).
@query(
    "q53_tpch_q12",
    oracle="""
    SELECT l_returnflag AS shipmode,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_returnflag IN ('A', 'N')
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag ORDER BY shipmode
    """,
)
def q53_tpch_q12(spark, sf_dir):
    """TPC-H Q12 (late lines bucketed by mode, split by order priority —
    the two-CASE-counts-per-group shape). Scale plan: the year window and
    the 2-value IN push into the lineitem scan; the lateness predicate
    (l_shipdate > o_orderdate + 90d) references both sides so it evaluates
    inside the orderkey join; the final aggregate has 2 groups with the
    CASE counts folded map-side — a constant-size shuffle at any SF."""
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_returnflag").isin("A", "N")
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


# --- Q54: TPC-H Q14 (promotion effect — conditional-aggregate ratio) -----------
@query(
    "q54_tpch_q14",
    oracle=f"""
    SELECT ROUND(CAST(100 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c
                                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(rev_c) AS DOUBLE), 6) AS promo_revenue
    FROM (SELECT p_type, {_REV} AS rev_c
          FROM lineitem, part
          WHERE l_partkey = p_partkey
            AND l_shipdate >= TIMESTAMP '1997-09-01'
            AND l_shipdate < TIMESTAMP '1997-10-01') t
    """,
)
def q54_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (share of one month's revenue from PROMO parts — the
    single-row conditional-aggregate ratio). Scale plan: the month window
    pushes into the lineitem scan (one month ≈ 1/84 of the table skipped on
    row-group stats); part joins broadcast-by-key since only (p_partkey,
    p_type) is read; both CASE sums are exact decimals folded map-side into
    ONE single-partition final — no second pass for the denominator. The
    ratio divides double-cast sums once and rounds once."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero).alias("promo_c"),
                rev.alias("rev_c"))
        .agg(
            F.round(
                F.lit(100).cast("double")
                * F.sum("promo_c").cast("double")
                / F.sum("rev_c").cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


# --- Q55: TPC-H Q16 (parts/supplier relationship — NOT IN + COUNT DISTINCT) ----
# partsupp analog: the DISTINCT (l_partkey, l_suppkey) pairs of lineitem;
# the excluded-supplier subquery filters on s_acctbal < 0 (the fixture has no
# s_comment to LIKE against) — same NOT IN plan shape.
@query(
    "q55_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
          FROM lineitem) ps, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#5'
      AND p_type NOT IN ('LARGE', 'MEDIUM')
      AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q55_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (how many suppliers can supply each qualifying part class):
    NOT IN against a filtered supplier list + COUNT(DISTINCT) per group —
    the null-aware anti-join + distinct-aggregate pair.

    Scale plan: the brand/type/size predicates (incl. the 8-value IN) push
    into the part scan; the NOT IN plans as a null-aware anti join against
    the (tiny, filtered) supplier keys — broadcastable at any SF since
    suppliers ≪ lineitem; the DISTINCT pair rollup shuffles 16-byte key
    pairs once and COUNT(DISTINCT suppkey) rides the same exchange.
    s_suppkey is non-nullable in the fixture, so NOT IN's three-valued-logic
    trap (any NULL in the list empties the result) cannot fire — both
    engines agree by construction."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q16")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_q16")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_q16")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
              FROM lineitem_q16) ps, part_q16
        WHERE p_partkey = ps_partkey
          AND p_brand <> 'Brand#5'
          AND p_type NOT IN ('LARGE', 'MEDIUM')
          AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
          AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier_q16
                                 WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """
    )


# --- Q56: TPC-H Q19 (discounted revenue — disjunctive OR-of-ANDs predicate) ----
@query(
    "q56_tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q56_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (revenue from three brand/size/quantity bands — the kit's
    disjunctive OR-of-ANDs predicate, the one shape that stresses disjunct
    pushdown). The fixture lacks p_container and l_shipmode; brand/size/
    quantity carry the three-band structure.

    Scale plan (partial pushdown, by construction): a mixed-table OR can't
    push as-is, so the plan FACTORS the per-side implications out manually —
    the part-only disjunction ((brand1 ∧ size≤5) ∨ (brand2 ∧ size≤10) ∨
    (brand3 ∧ size≤15)) pushes to the part scan as an Or filter, and the
    quantity hull (1 ≤ l_quantity ≤ 30, the union of the three bands)
    pushes to the lineitem scan; the exact three-way OR then evaluates as
    the join's residual. The plan test pins both pushed filters. The
    surviving part keys broadcast; one fact-side exchange total (the global
    sum)."""
    b1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
    b2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
    b3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(b1 | b2 | b3)  # part-only implication of the OR → PushedFilters
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        # quantity hull of the three bands — the lineitem-only implication
        .filter(F.col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
