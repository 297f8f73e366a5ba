"""TPC-H-style star-schema queries over the driver's test tables.

The reference engine has no joins/sorts/set-ops (SURVEY.md §2, "operators
the reference does NOT have") — this module is the general relational
surface our Spark-native engine adds on top. Design notes per query cover
the 100 TB strategy: dimension joins broadcast, fact-side filters pushed to
the parquet scan, aggregation partial+final via Catalyst.

Cross-engine determinism contract (shared with oracle SQL):
  * money math in exact DECIMAL(18,2/4/6) before any cast to double
  * averages = CAST(exact-sum AS DOUBLE)/count, identical IEEE ops
  * output floats rounded (sums 2dp, averages 6dp)
  * timestamps surfaced as epoch-second BIGINTs
  * top-k always fully tie-broken
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_task_spark.sources.tables import load_table

DEC = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(DEC)


def _ts_s(c: str):
    # parquet µs-timestamps arrive as TIMESTAMP_NTZ, which has no direct
    # BIGINT cast. Micros-since-NTZ-epoch via timestampdiff is pure calendar
    # arithmetic — genuinely session-tz-free, matching DuckDB's epoch() on
    # naive timestamps. (to_utc_timestamp(ntz,'UTC') is NOT: Spark casts
    # NTZ→TIMESTAMP through the session tz first.)
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {c})"
        " div 1000000"
    )


# --- Q1: pricing summary (scan + filter + wide aggregate) ----------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushes to the parquet scan; single shuffle on a 6-value key.
    At 100 TB this is the canonical map-side-combine aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1).cast(DEC) + _dec("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 2).alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_disc_price,
  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (3-way join + top-k) --------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem shuffles on o_orderkey (the natural co-partition key
    at scale). customer scales linearly with SF, so it carries NO static
    broadcast hint — AQE picks broadcast at runtime when the measured size
    fits (it does at test SF). Top-k is a total sort of an
    already-aggregated small result."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue).cast("double"), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            _ts_s("o_orderdate").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate_s", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
  o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate_s, l_orderkey
LIMIT 10
"""


# --- Q5: local supplier volume (5-way join through region) ---------------

def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-cardinality dims (region/nation) broadcast statically; the
    SF-scaling supplier/customer joins carry no hint (AQE broadcasts at
    runtime when small). The only big shuffle is orders⋈lineitem. The
    c_nationkey = s_nationkey equi-condition rides on the join, pruning
    before aggregation."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue).cast("double"), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --- Q6: forecast revenue (pure scan-side filter + single agg) -----------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate is parquet-pushable; the aggregate reduces to one
    row — at scale this is scan-bound, the plan must show PushedFilters."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24
"""


# --- Q10: returned items (join + group + top-k by revenue) ---------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returned items in one
    quarter — returnflag-filtered lineitem joined to date-filtered orders.
    nation broadcasts (25 rows, fixed); customer scales with SF so its
    join is unhinted, left to AQE."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(revenue).cast("double"), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
  round(c_acctbal, 2) AS c_acctbal,
  n_name
FROM customer JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- rollup: multi-level aggregate (grouping sets surface) ---------------

def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — subtotal + grand-total rows in one pass (Catalyst
    expands to grouping sets; still a single shuffle). NULL group keys from
    rollup are coalesced to 'ALL' for unambiguous cross-engine hashing."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


Q_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- Q4 shape: EXISTS semi-join ------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (one quarter) with ≥1 late-shipped lineitem, counted per
    priority — the EXISTS correlated-subquery shape as a LEFT SEMI join.
    At scale: the semi join shuffles on orderkey but the probe side only
    carries (orderkey, shipdate-violation) — no payload columns move."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --- Q12 shape: CASE aggregation over a join ------------------------------

def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per returnflag, high- vs low-priority line counts for one ship
    year — the conditional-aggregation (CASE WHEN inside SUM) shape."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
"""


# --- Q14 shape: conditional revenue share ---------------------------------

def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROMO revenue share for one ship month: part join (unhinted —
    part scales with SF; AQE broadcasts when small) + global conditional
    ratio (two exact sums, one double division)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    j = l.join(p, l.l_partkey == p.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)")))
    total = F.sum(rev)
    return j.agg(
        F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 6).alias(
            "promo_revenue_pct"
        )
    )


Q14_SQL = """
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


# --- Q19 shape: OR-of-ANDs bracket predicate ------------------------------

def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive brackets over a part⋈lineitem join —
    the predicate Catalyst must keep ABOVE the join but still prune with
    (common p_size/l_quantity bounds push into both scans)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b1 | b2 | b3).agg(
        F.round(F.sum(rev).cast("double"), 2).alias("revenue")
    )


Q19_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q22 shape: scalar subquery + anti join -------------------------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the positive-balance average with NO orders: a
    scalar aggregate broadcast into a filter + LEFT ANTI join. The anti
    join shuffles only custkeys; the scalar avg is a one-row broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a"))
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal").cast(DEC).cast("double") > F.col("a")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(_dec("c_acctbal")).cast("double"), 2).alias("total_acctbal"),
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_acctbal
FROM customer c
WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) >
      (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
       FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


# --- Q7 shape: nation-pair volume shipping (5-way join, disjunctive pair
# predicate, year rollup) --------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional trade volume between two nations by ship year.
    lineitem⋈orders shuffles on the natural orderkey; BOTH nation copies
    broadcast (25 rows, fixed); supplier/customer scale with SF so their
    joins are unhinted (AQE broadcasts at runtime when small); the
    nation-pair disjunction is evaluated post-join on broadcast columns, so
    the big fact side never fans out. Adapted to this schema: no
    l_commitdate etc., year comes from l_shipdate."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(rev) AS DOUBLE), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q13 shape: left outer join + distribution-of-counts -----------------

def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts INCLUDING zero-order
    customers — the left outer join is load-bearing (an inner join loses
    the c_count=0 bucket). First aggregate shuffles on custkey (orders'
    natural key); the second aggregates the tiny (custkey, count) set by
    count — a classic two-stage rollup where stage 2's input is already
    small. Priority filter stands in for TPC-H's comment filter (no
    o_comment in this schema)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- Q15 shape: agg-of-agg (top supplier by revenue, with ties) ----------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers achieving the MAX quarterly revenue: revenue per supplier
    (one shuffle on suppkey), then the scalar max broadcasts back as a
    filter (single row — that hint stays static) — the view+scalar-subquery
    shape of TPC-H Q15. The supplier enrich join is unhinted (supplier
    scales with SF; AQE decides). Ties all surface (no arbitrary pick), so
    the result is deterministic."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    per_supp = l.groupBy("l_suppkey").agg(F.sum(rev).alias("__rev"))
    max_rev = per_supp.agg(F.max("__rev").alias("__max"))
    return (
        per_supp.join(F.broadcast(max_rev))
        .filter(F.col("__rev") == F.col("__max"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__rev").cast("double"), 2).alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


# --- Q17 shape: per-group scalar threshold (small-quantity revenue) ------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost to small orders: lineitems of one brand
    whose quantity is below 20% of that part's average quantity. The
    per-part average is a second aggregate over the SAME join key
    (l_partkey) — at scale both sides shuffle once on partkey; the
    brand-filtered part join prunes the fact rows before the heavy agg
    (unhinted: part scales with SF, AQE broadcasts when small). The
    threshold compare uses the identical CAST(sum)/count double in both
    engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    l = load_table(spark, sf_dir, "lineitem")
    branded = l.join(p, l.l_partkey == p.p_partkey)
    avg_qty = branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    # NO broadcast hint on avg_qty: it has one row per qualifying partkey —
    # it grows with the part table, and an unconditional F.broadcast() is a
    # scale-killer AQE cannot override. Both sides already hash-partition on
    # the partkey after the aggregate, so the shuffle join reuses that
    # exchange; AQE may still choose broadcast at runtime when it measures
    # the aggregate as small.
    small = branded.join(avg_qty, F.col("l_partkey") == F.col("__pk")).filter(
        F.col("l_quantity").cast(DEC).cast("double") < 0.2 * F.col("__avg")
    )
    return small.agg(
        F.round(
            F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2
        ).alias("avg_yearly")
    )


Q17_SQL = """
SELECT round(CAST(sum(CAST(l1.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#3'
  AND CAST(CAST(l1.l_quantity AS DECIMAL(18,2)) AS DOUBLE) < 0.2 * (
    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
    FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
  )
"""


# --- Q18 shape: HAVING subquery + enriched top-k -------------------------

Q18_QTY_THRESHOLD = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds the threshold, enriched with
    customer context. The HAVING aggregate runs on lineitem alone (one
    shuffle on orderkey, partials absorb per-order lines map-side); only
    the qualifying key set joins back against orders⋈customer. No static
    broadcast hint on it: it is keyed by ORDERKEY and grows linearly with
    the fact table (a tiny fraction, but a fraction); AQE converts the
    join to broadcast at runtime when the measured size allows."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > Q18_QTY_THRESHOLD)
    )
    return (
        o.join(big, o.o_orderkey == F.col("l_orderkey"))
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _ts_s("o_orderdate").alias("o_orderdate_s"),
            F.round(_dec("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            F.round(F.col("__qty").cast("double"), 2).alias("sum_qty"),
        )
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
       round(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS o_totalprice,
       round(CAST(q.sum_qty AS DOUBLE), 2) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_QTY_THRESHOLD}) q
  ON o_orderkey = q.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- Q2 shape: correlated-min subquery (min-cost supplier per part) -------
# No partsupp table in this schema: unit price observed on lineitem
# (l_extendedprice / l_quantity) stands in for ps_supplycost.

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each mid-size part of one type class, the supplier(s) that
    shipped it at the MINIMUM observed unit price within one region — the
    correlated-min-subquery shape of TPC-H Q2. Per-part min is one shuffle
    on partkey; the min re-joins unhinted (one row per qualifying part —
    scales with part); nation/region broadcast statically (fixed rows),
    part/supplier joins are left to AQE. Unit price is
    decimal(18,6)-exact so the equality re-join is bit-stable across
    engines."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size").between(10, 20)) & F.col("p_type").startswith("STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    unit = (_dec("l_extendedprice") / _dec("l_quantity")).cast("decimal(18,6)")
    offers = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name",
            unit.alias("unit_cost"),
        )
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("unit_cost").alias("__min_cost")
    )
    # NO broadcast hint on min_cost: one row per qualifying partkey — grows
    # linearly with part. Let the equi-join shuffle (or AQE pick broadcast
    # at runtime if it measures the aggregate as genuinely small).
    return (
        offers.join(
            min_cost,
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("unit_cost") == F.col("__min_cost")),
        )
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "n_name")
        .agg(
            F.round(F.max("s_acctbal"), 2).alias("s_acctbal"),
            F.round(F.min("unit_cost").cast("double"), 6).alias("min_unit_cost"),
        )
    )


Q2_SQL = """
WITH offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) / CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,6)) AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type LIKE 'STANDARD%'
    AND r_name = 'EUROPE' AND l_quantity > 0
)
SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
       round(max(s_acctbal), 2) AS s_acctbal,
       round(CAST(min(unit_cost) AS DOUBLE), 6) AS min_unit_cost
FROM offers o
WHERE unit_cost = (SELECT min(unit_cost) FROM offers i WHERE i.p_partkey = o.p_partkey)
GROUP BY p_partkey, p_name, s_suppkey, s_name, n_name
"""


# --- Q8 shape: national market share --------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one nation's suppliers in a region's order revenue, by
    order year — the ratio-of-conditional-sum-over-sum shape of TPC-H Q8.
    lineitem⋈orders is the only big shuffle; both nation roles and region
    broadcast statically (fixed rows); part/customer/supplier joins are
    unhinted (SF-scaling — AQE broadcasts at runtime when small). The share
    divides two exact decimal sums as doubles, identically in DuckDB."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation")  # customer nation → region filter
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    vol = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), rev.alias("rev"), "supp_nation")
    )
    national = F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("rev"))
                     .otherwise(F.lit(0).cast("decimal(18,4)")))
    return (
        vol.groupBy("o_year")
        .agg(F.round(national.cast("double") / F.sum("rev").cast("double"), 6).alias("mkt_share"))
    )


Q8_SQL = """
SELECT o_year, round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev
                                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
GROUP BY o_year
"""


# --- Q9 shape: product-type profit by nation and year ---------------------
# ps_supplycost does not exist here; cost is modeled from the part list
# price (80% of p_retailprice per unit), keeping the profit = revenue −
# quantity×cost structure and the join topology of TPC-H Q9.

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on name-matched parts grouped by supplier nation and ship
    year. The selective name-filtered part join prunes fact rows early
    (unhinted — part scales with SF, AQE broadcasts when small); profit
    math is decimal(18,4)-exact until the final double round."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cost_per_unit = (_dec("p_retailprice") * F.lit(0.8).cast(DEC)).cast("decimal(18,4)")
    profit = (
        _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    ).cast("decimal(18,4)") - (cost_per_unit * _dec("l_quantity")).cast("decimal(18,4)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("sum_profit"))
    )


Q9_SQL = """
SELECT nation, o_year, round(CAST(sum(amount) AS DOUBLE), 2) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
         - CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.8 AS DECIMAL(18,2)) AS DECIMAL(18,4))
                * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
)
GROUP BY nation, o_year
"""


# --- Q11 shape: important stock (group share vs global scalar) ------------
# partsupp stands in as "shipped value per (nation, part)" from lineitem.

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from one nation exceeds a fixed fraction
    of that nation's total — the group-sum vs scalar-total-subquery shape
    of TPC-H Q11. Both aggregates share one shuffled base (value per
    part); the scalar total broadcasts back as a filter (single row —
    static hint OK). supplier join is unhinted (scales with SF)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value = _dec("l_extendedprice") * _dec("l_quantity").cast("decimal(18,2)")
    base = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(value.cast("decimal(18,4)")).alias("__val"))
    )
    total = base.agg(F.sum("__val").alias("__total"))
    return (
        base.join(F.broadcast(total))
        .filter(F.col("__val").cast("double") > 0.001 * F.col("__total").cast("double"))
        .select("l_partkey", F.round(F.col("__val").cast("double"), 2).alias("part_value"))
    )


Q11_SQL = """
WITH base AS (
  SELECT l_partkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey, round(CAST(val AS DOUBLE), 2) AS part_value
FROM base
WHERE CAST(val AS DOUBLE) > 0.001 * (SELECT CAST(sum(val) AS DOUBLE) FROM base)
"""


# --- Q16 shape: supplier count per part bracket (distinct + NOT IN) -------

def q16_parts_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) bracket, EXCLUDING
    negative-balance suppliers — the count-distinct + NOT-IN-subquery
    shape of TPC-H Q16. The exclusion anti-join and the part join are
    unhinted (both sides scale with SF; AQE picks broadcast at runtime);
    count-distinct shuffles once on the bracket key with partial distinct
    map-side."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
    )
    l = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q20 shape: nested semi-join chain (potential part promotion) ---------

Q20_QTY_THRESHOLD = 40


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in one nation who moved MORE than a threshold quantity of
    name-matched parts in one year — TPC-H Q20's nested-subquery chain as
    aggregate → semi-join. The inner aggregate shuffles on (suppkey,
    partkey); qualifying suppkeys collapse to a DISTINCT set for the outer
    semi join (unhinted — grows with supplier; AQE broadcasts when small);
    nation broadcasts (fixed 25 rows). All nations kept (single-
    nation filter empties the synthetic data at small SF); nation is a
    group key instead."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    movers = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > Q20_QTY_THRESHOLD)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(movers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(
            "s_suppkey", "s_name", "n_name",
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
        )
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name, n_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q20_QTY_THRESHOLD}
  )
"""


# --- Q21 shape: EXISTS + NOT-EXISTS double correlation --------------------
# No l_receiptdate/l_commitdate in this schema: "late" means shipped more
# than 60 days after the order date.

Q21_LATE_DAYS = 60


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on a multi-supplier order —
    TPC-H Q21's EXISTS + NOT-EXISTS double correlation, expressed as two
    per-order aggregates (distinct supplier count, distinct LATE supplier
    count) joined back to the late lines: one shuffle on orderkey feeds
    both aggregates, and the per-order summary re-joins on that same
    orderkey partitioning (no static hint; AQE may broadcast). F-status
    filter stands in for o_orderstatus='F'. Nation rides as a group key
    (a one-nation filter empties the synthetic data at small SF)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lines = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")).alias("__late"),
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__n_late"),
    )
    return (
        # NO broadcast hint on per_order: one row per qualifying ORDERKEY —
        # tens of GB per executor at 100 TB. The semi-join shuffles on the
        # orderkey both sides (per_order is already partitioned on it from
        # the aggregate); AQE may still broadcast at runtime if small.
        lines.filter(F.col("__late"))
        .join(
            per_order.filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1)),
            F.col("l_orderkey") == F.col("__ok"),
            "left_semi",
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


Q21_SQL = f"""
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey AS ok, count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM lines GROUP BY l_orderkey
)
SELECT s_name, n_name, count(DISTINCT l_orderkey) AS numwait
FROM lines
JOIN per_order ON l_orderkey = ok AND n_supp > 1 AND n_late = 1
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE late
GROUP BY s_name, n_name
"""


TPCH_QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q12_priority_class": (q12_priority_class, Q12_SQL),
    "q14_promo_share": (q14_promo_share, Q14_SQL),
    "q19_bracket_revenue": (q19_bracket_revenue, Q19_SQL),
    "q22_idle_customers": (q22_idle_customers, Q22_SQL),
    "q_rollup_lineitem": (q_rollup_lineitem, Q_ROLLUP_SQL),
    # round-4 widening (registry.OVERFLOW_LAST — locally oracle-gated)
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q13_order_distribution": (q13_order_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    # round-5 widening — completes all 22 TPC-H query shapes (adapted to
    # this schema: no partsupp / receipt dates; docstrings note the stand-in)
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q16_parts_supplier_relation": (q16_parts_supplier_relation, Q16_SQL),
    "q20_potential_promotion": (q20_potential_promotion, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
}
