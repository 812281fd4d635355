package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.OracleRound.{exactSum, floorRound}

/** Relational query surface (SURVEY.md §2.6, §7.1 Layer B1/B2).
  *
  * The reference (wizgrao/blow) has no relational operators at all —
  * its one transform is flatMap (`/root/reference/maps/maps.go:12-14`)
  * — so this layer is the driver-mandated query surface expressed
  * Spark-first: declarative DataFrame plans, Catalyst does pushdown /
  * pruning / join selection.
  *
  * Conventions (oracle hash-match discipline, FIXTURES.md):
  *  - every query ends with orderBy on a unique key combination;
  *  - double aggregates are round()ed identically on both sides;
  *  - computed integers are cast to long (DuckDB returns BIGINT);
  *  - integer sums in DuckDB are CAST(... AS BIGINT) (DuckDB widens to
  *    HUGEINT);
  *  - dates/timestamps in output are formatted to strings so both
  *    engines hash identical values.
  *
  * 100 TB notes are given per query.
  */
object Relational {

  /** q01 — TPC-H Q1-style pricing summary. Single wide scan → partial
    * (map-side) aggregation → 6-group final. At 100 TB this is the
    * canonical scan-heavy query: only 8 of 11 columns read (pruning),
    * shipdate predicate pushed to parquet row-group stats, shuffle is
    * 6 rows × partial states — negligible. */
  def q01(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        floorRound(exactSum(col("l_quantity")), 2).as("sum_qty"),
        floorRound(exactSum(col("l_extendedprice")), 2).as("sum_base_price"),
        floorRound(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        floorRound(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        floorRound(exactSum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
        floorRound(exactSum(col("l_extendedprice")) / count(lit(1)), 4).as("avg_price"),
        floorRound(exactSum(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_qty,
      | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_base_price,
      | floor(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_disc_price,
      | floor(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_charge,
      | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_qty,
      | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_price,
      | floor(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000 AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — scan / filter / project, no aggregation: Catalyst must push
    * both predicates and prune to 6 columns (verify via
    * PushedFilters/ReadSchema in explain). At 100 TB the parquet
    * min/max stats skip whole row groups outside the date range. */
  def q02(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_quantity") < 10)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // raw product, NOT rounded: the IEEE multiply is bit-identical
        // on both engines, while round-to-2 implementations disagree
        // exactly at .005 boundaries (observed at sf0.1)
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        col("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber,
      | l_extendedprice*(1-l_discount) AS net_price, l_returnflag
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND l_discount > 0.05 AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03 — TPC-H Q3-style shipping-priority: 3-way join + agg + top-k.
    * customer is the small side (15k rows at sf0.1) → broadcast; the
    * orders⋈lineitem join shuffles on orderkey. Top-10 via
    * orderBy+limit is a TakeOrdered physical op — no global sort
    * materialization at scale. Rounded revenue is the sort key so both
    * engines order identically; o_orderkey breaks ties. */
  def q03(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey")
      .agg(
        floorRound(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        date_format(first("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey,
      | floor(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
      | strftime(min(o_orderdate), '%Y-%m-%d') AS orderdate
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** q04 — semi join (EXISTS): orders that have at least one lineitem
    * shipped after the order date. left_semi never duplicates or
    * widens rows — at scale the build side streams, no row explosion.
    * The count per priority is a 5-group agg. */
  def q04(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, sfDir)
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q05 — TPC-H Q5-style 5-way star join: revenue by nation of the
    * customer. region(5)/nation(25)/customer(15k) are broadcast — only
    * the lineitem⋈orders join shuffles, on orderkey. At 100 TB the
    * dims stay broadcastable; the fact-fact join benefits from
    * bucketing both on orderkey (documented growth path). */
  def q05(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(spark, sfDir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(floorRound(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val q05Sql: String =
    """SELECT r_name, n_name,
      | floor(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** q06 — TPC-H Q6-style forecasting revenue: single-table global
    * aggregate. All three predicates push to parquet; result is one
    * row. The cheapest possible shape at any scale. */
  def q06(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 25)
      .agg(floorRound(exactSum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  val q06Sql: String =
    """SELECT floor(CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 25""".stripMargin

  /** q07 — broadcast hash join against the part dimension (20k rows at
    * sf0.1, ~MBs at 100 TB fact scale — always broadcastable), then
    * per-brand aggregation. No shuffle on the fact side until the
    * 25-group agg. */
  def q07(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.part(spark, sfDir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        floorRound(exactSum(col("l_quantity")), 2).as("sum_qty"),
        floorRound(exactSum(col("p_retailprice")) / count(lit(1)), 4).as("avg_retail"))
      .orderBy("p_brand")

  val q07Sql: String =
    """SELECT p_brand, count(*) AS n_items,
      | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_qty,
      | floor(CAST(sum(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_retail
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q08 — anti join (NOT EXISTS): customers who never placed a
    * >400k order, counted per market segment. (Plain "no orders at
    * all" is degenerate on this data — 0 rows at sf≤0.01.) left_anti
    * never widens rows; the filtered build side is small enough to
    * broadcast, and at 100 TB it becomes a shuffled anti join on
    * custkey — still linear. */
  def q08(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        min("c_custkey").as("min_custkey"),
        max("c_custkey").as("max_custkey"))
      .orderBy("c_mktsegment")

  val q08Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      | min(c_custkey) AS min_custkey, max(c_custkey) AS max_custkey
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q09 — ROLLUP hierarchy totals. Spark expands rollup into a
    * grouping-set union computed in one pass (Expand + partial agg);
    * NULL group markers are coalesced to 'ALL' so both engines emit
    * identical, orderable values. */
  def q09(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        floorRound(exactSum(col("l_extendedprice")), 2).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_items"), col("sum_price"))
      .orderBy("returnflag", "linestatus")

  val q09Sql: String =
    """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
      | coalesce(l_linestatus,'ALL') AS linestatus,
      | count(*) AS n_items,
      | floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q10 — set operations: (AUTOMOBILE ∪ high-balance customers)
    * EXCEPT customers holding an expensive order. union/except are
    * hash-dedup shuffles on the single key column — minimal width. */
  def q10(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val big = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("c_custkey"))
    auto.union(rich).distinct().except(big).orderBy("c_custkey")
  }

  val q10Sql: String =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
      |ORDER BY c_custkey""".stripMargin

  /** q11 — exact distinct aggregation: distinct suppliers/parts per
    * return flag. Spark plans count(distinct x) via Expand +
    * two-phase agg — no driver materialization. (The approximate
    * HLL++ variant is llm_approx_distinct — not oracle-comparable.) */
  def q11(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")

  val q11Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      | count(DISTINCT l_partkey) AS n_part, count(*) AS n_items
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q12 — top-k per group via ranking window: 3 most expensive orders
    * per customer. One shuffle on the partition key; row_number then
    * filter — the standard scale-safe top-k-per-group (never a global
    * sort of the fact table). Ties broken by o_orderkey. */
  def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), floorRound(col("o_totalprice"), 2).as("totalprice"))
      .orderBy("o_custkey", "rk")
  }

  val q12Sql: String =
    """SELECT o_custkey, rk, o_orderkey, totalprice FROM (
      |  SELECT o_custkey, o_orderkey,
      |    floor(o_totalprice * 100 + 0.5) / 100 AS totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** q13 — analytic window frame: running revenue + previous order
    * value per customer in order-date order. Explicit ROWS frame so
    * both engines use identical cumulative semantics. */
  def q13(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        floorRound(sum(col("o_totalprice").cast("decimal(18,6)")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"), 2)
          .as("running_total"),
        floorRound(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("order_seq"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q13Sql: String =
    """SELECT o_custkey, o_orderkey,
      | strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (PARTITION BY o_custkey
      |   ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) * 100 + 0.5) / 100 AS running_total,
      | floor(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |   ORDER BY o_orderdate, o_orderkey) * 100 + 0.5) / 100 AS prev_price,
      | count(*) OVER (PARTITION BY o_custkey
      |   ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q14 — scalar function gauntlet (string/math) over part: all
    * expressions are Catalyst built-ins inside one WholeStageCodegen
    * span — the codegen'd analog of blow's per-record Go closures
    * (`/root/reference/cmd/fizzbuzz/fizzbuzz.go:24-45`). */
  def q14(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_brand"), 7, 2).cast("long").as("brand_num"),
        substring_index(col("p_type"), " ", 1).as("type_head"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        floorRound(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
        floorRound(abs(col("p_retailprice") - 1000.0), 2).as("price_dist"))
      .orderBy("p_partkey")

  val q14Sql: String =
    """SELECT p_partkey,
      | upper(substring(p_name, 1, 8)) AS name_prefix,
      | CAST(length(p_name) AS BIGINT) AS name_len,
      | CAST(substring(p_brand, 7, 2) AS BIGINT) AS brand_num,
      | split_part(p_type, ' ', 1) AS type_head,
      | CAST(p_size % 7 AS BIGINT) AS size_mod,
      | floor(sqrt(p_retailprice) * 10000 + 0.5) / 10000 AS price_sqrt,
      | floor(abs(p_retailprice - 1000.0) * 100 + 0.5) / 100 AS price_dist
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q15 — fizzbuzz, the reference's canonical workload
    * (`/root/reference/cmd/fizzbuzz/fizzbuzz.go:19-46`), as a pure
    * Catalyst CaseWhen over lineitem keys — no UDF, fully codegen'd,
    * pushdown-transparent. The typed flatMap twin lives in
    * graft.pipeline (Layer A). */
  def q15(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_orderkey") % 15 === 0, "fizzbuzz")
          .when(col("l_orderkey") % 3 === 0, "fizz")
          .when(col("l_orderkey") % 5 === 0, "buzz")
          .otherwise(col("l_orderkey").cast("string")).as("word"))
      .orderBy("l_orderkey", "l_linenumber")

  val q15Sql: String =
    """SELECT l_orderkey, l_linenumber,
      | CASE WHEN l_orderkey % 15 = 0 THEN 'fizzbuzz'
      |      WHEN l_orderkey % 3 = 0 THEN 'fizz'
      |      WHEN l_orderkey % 5 = 0 THEN 'buzz'
      |      ELSE CAST(l_orderkey AS VARCHAR) END AS word
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q16 — CUBE over two order dimensions (all four grouping sets in
    * one Expand pass). NULL markers coalesced to 'ALL' as in q09. */
  def q16(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        floorRound(exactSum(col("o_totalprice")), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("sum_price"))
      .orderBy("orderstatus", "orderpriority")

  val q16Sql: String =
    """SELECT coalesce(o_orderstatus,'ALL') AS orderstatus,
      | coalesce(o_orderpriority,'ALL') AS orderpriority,
      | count(*) AS n_orders,
      | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin

  /** q38 — supplier-side star join: revenue by supplier nation
    * (completes table coverage — lineitem → supplier → nation branch
    * of the join graph). Both dims broadcast (1k / 25 rows at sf0.1,
    * still MB-scale against a 100 TB fact table), so the only shuffle
    * is the 25-group aggregation. */
  def q38(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(broadcast(Tables.supplier(spark, sfDir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(floorRound(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")

  val q38Sql: String =
    """SELECT n_name,
      | floor(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue,
      | count(DISTINCT s_suppkey) AS n_suppliers,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q39 — exact percentiles per group: Spark's `percentile` is the
    * exact interpolated quantile (rank p·(n−1), linear interpolation)
    * — the same definition as DuckDB's quantile_cont, so values agree
    * after rounding. Exact percentile shuffles each group's values to
    * one reducer; at 100 TB swap in approx_percentile (KLL-ish
    * sketch, mergeable partials) — kept exact here for the oracle. */
  def q39(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(
        // floorRound, not round(): interpolated quantiles are
        // arbitrary doubles, exactly the case where the two engines'
        // round() algorithms can split at .5·10⁻⁵ boundaries
        // (functions/OracleRound).
        graft.functions.OracleRound.floorRound(
          expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        graft.functions.OracleRound.floorRound(
          expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        graft.functions.OracleRound.floorRound(
          expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val q39Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""SELECT o_orderpriority,
       | ${floorRoundSql("quantile_cont(o_totalprice, 0.5)", 4)} AS p50,
       | ${floorRoundSql("quantile_cont(o_totalprice, 0.9)", 4)} AS p90,
       | ${floorRoundSql("quantile_cont(o_totalprice, 0.99)", 4)} AS p99,
       | count(*) AS n_orders
       |FROM orders GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** q40 — date/time function gauntlet over orders: extraction,
    * truncation, arithmetic, calendar endpoints — all codegen'd
    * Catalyst built-ins in one projection (no shuffle; the orderBy is
    * presentation only). Day-of-week is avoided deliberately: Spark
    * (1=Sunday) and DuckDB (0=Sunday) disagree by convention. */
  def q40(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_left"))
      .orderBy("o_orderkey")

  val q40Sql: String =
    """SELECT o_orderkey,
      | CAST(year(o_orderdate) AS BIGINT) AS yr,
      | CAST(month(o_orderdate) AS BIGINT) AS mo,
      | CAST(day(o_orderdate) AS BIGINT) AS dom,
      | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      | strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
      | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_left
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q43 — pivot (cross-tab): document counts by source × language.
    * The value domain is declared explicitly (no values-discovery
    * collect — at 100 TB an undeclared pivot first runs a distinct on
    * the pivot column and materializes it on the driver); the pivot
    * compiles to one partial-aggregated shuffle with 5 conditional
    * counts per group, nulls zero-filled to match the oracle's
    * FILTER counts. */
  def q43(spark: SparkSession, sfDir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val p = Tables.documents(spark, sfDir)
      .groupBy("source")
      .pivot("lang", langs)
      .agg(count(lit(1)))
    p.select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
      .orderBy("source")
  }

  val q43Sql: String =
    """SELECT source,
      | count(*) FILTER (WHERE lang='de') AS de,
      | count(*) FILTER (WHERE lang='en') AS en,
      | count(*) FILTER (WHERE lang='es') AS es,
      | count(*) FILTER (WHERE lang='fr') AS fr,
      | count(*) FILTER (WHERE lang='zh') AS zh
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q45 — custom typed Aggregator (UDAF): geometric mean of order
    * totals per priority, next to the built-in arithmetic mean. The
    * log-sum buffer is mergeable, so the plan is the standard partial
    * + final two-phase aggregate — custom aggregation logic, built-in
    * scale shape. */
  def q45(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(
        // floorRound (not round()): geo/arith means are arbitrary
        // doubles — same cross-engine .5-boundary hazard as q39.
        graft.functions.OracleRound.floorRound(
          graft.functions.GeoMean.geo_mean(col("o_totalprice")), 4).as("geo_mean_price"),
        graft.functions.OracleRound.floorRound(
          avg("o_totalprice"), 4).as("arith_mean_price"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val q45Sql: String = {
    import graft.functions.OracleRound.floorRoundSql
    s"""SELECT o_orderpriority,
       | ${floorRoundSql("exp(avg(ln(o_totalprice)))", 4)} AS geo_mean_price,
       | ${floorRoundSql("avg(o_totalprice)", 4)} AS arith_mean_price,
       | count(*) AS n_orders
       |FROM orders GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  }

  /** q46 — INTERSECT (the set op q10 doesn't cover): customers who
    * both placed a 1997 order and hold a high balance. Spark plans
    * intersect as a left-semi join over distinct inputs — one shuffle
    * per side on the single key column. */
  def q46(spark: SparkSession, sfDir: String): DataFrame = {
    val o97 = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey").as("c_custkey"))
    val rich = Tables.customer(spark, sfDir)
      .filter(col("c_acctbal") > 3000).select("c_custkey")
    o97.intersect(rich).orderBy("c_custkey")
  }

  val q46Sql: String =
    """SELECT o_custkey AS c_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |INTERSECT
      |SELECT c_custkey FROM customer WHERE c_acctbal > 3000
      |ORDER BY c_custkey""".stripMargin

  /** q47 — LEFT OUTER join with unmatched rows preserved: every part
    * vs its shipped lineitems in a narrow window; parts with no
    * match keep NULL-derived zeros. The probe side broadcasts is
    * wrong here — part is the LEFT side and must keep all rows, so
    * the filtered lineitem side broadcasts and the join is
    * BroadcastHashJoin LeftOuter BuildRight: no shuffle of part at
    * all (and at 100 TB, shuffle on p_partkey — still linear). */
  def q47(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_shipped"),
        floorRound(exactSum(col("l_quantity")), 2).as("qty"))
    Tables.part(spark, sfDir)
      .join(l, col("p_partkey") === col("l_partkey"), "left_outer")
      .select(col("p_partkey"), col("p_brand"),
        coalesce(col("n_shipped"), lit(0L)).as("n_shipped"),
        coalesce(col("qty"), lit(0.0)).as("qty"))
      .orderBy("p_partkey")
  }

  val q47Sql: String =
    """WITH l AS (
      |  SELECT l_partkey, count(*) AS n_shipped,
      |    floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS qty
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
      |  GROUP BY l_partkey)
      |SELECT p_partkey, p_brand,
      | coalesce(n_shipped, 0) AS n_shipped,
      | coalesce(qty, 0.0) AS qty
      |FROM part LEFT JOIN l ON p_partkey = l_partkey
      |ORDER BY p_partkey""".stripMargin

  /** q48 — ranking/distribution window functions beyond row_number:
    * rank, dense_rank, ntile, percent_rank, cume_dist over one
    * customer-partitioned sort — a single shuffle evaluates all five
    * (one Window operator, shared frame). Doubles rounded; ties
    * broken by orderkey so both engines agree. */
  def q48(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        floorRound(percent_rank().over(w), 6).as("pct_rank"),
        floorRound(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_custkey", "rnk")
  }

  val q48Sql: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(rank()       OVER w AS BIGINT) AS rnk,
      | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      | CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
      | floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
      | floor(cume_dist()    OVER w * 1000000 + 0.5) / 1000000 AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, rnk""".stripMargin

  /** q49 — RANGE-frame moving aggregate: 7-day trailing order count
    * and revenue per day (global daily series). The frame is value-
    * based (RANGE over epoch days), not row-based — the semantics
    * rows frames can't express when days are missing. Daily rollup
    * first, so the window runs over O(days) rows, not O(orders). */
  def q49(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .withColumn("day", datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_day"), sum("o_totalprice").as("rev_day"))
    val w = Window.orderBy("day").rangeBetween(-6, 0)
    daily.select(col("day"),
        col("n_day"),
        sum("n_day").over(w).as("n_7d"),
        floorRound(sum(col("rev_day").cast("decimal(18,6)")).over(w).cast("double"), 2)
          .as("rev_7d"))
      .orderBy("day")
  }

  val q49Sql: String =
    """WITH daily AS (
      |  SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |    count(*) AS n_day, sum(o_totalprice) AS rev_day
      |  FROM orders GROUP BY 1)
      |SELECT day, n_day,
      | CAST(sum(n_day) OVER w AS BIGINT) AS n_7d,
      | floor(CAST(sum(CAST(rev_day AS DECIMAL(18,6))) OVER w AS DOUBLE) * 100 + 0.5) / 100 AS rev_7d
      |FROM daily
      |WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin

  /** q51 — top-k per group via a mergeable bounded Aggregator: same
    * answer as the window formulation (q12) but the shuffle carries
    * ≤ k rows per group per map task instead of every row — the plan
    * a 100 TB top-k actually wants (map-side partial top-k, like
    * TakeOrderedAndProject but per group). Oracle: the q12 SQL. */
  def q51(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{KeyedPrice, TopKByPrice}
    val ds = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("group"), col("o_orderkey").as("key"),
        col("o_totalprice").as("price"))
      .as[KeyedPrice]
    ds.groupByKey(_.group)
      .agg(TopKByPrice(3).toColumn.name("top"))
      .flatMap { case (g, top) =>
        top.iterator.zipWithIndex.map { case (kp, i) =>
          (g, (i + 1).toLong, kp.key, kp.price)
        }
      }
      .toDF("o_custkey", "rk", "o_orderkey", "price")
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        floorRound(col("price"), 2).as("totalprice"))
      .orderBy("o_custkey", "rk")
  }

  /** q52 — explicit GROUPING SETS (the arbitrary-set form rollup/cube
    * can't express): per-returnflag totals, per-linestatus totals, and
    * the grand total in ONE Expand pass — no union of three scans.
    * grouping() flags disambiguate real NULLs from set markers. */
  def q52(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        floorRound(exactSum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_items"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val q52Sql: String =
    """SELECT coalesce(l_returnflag,'ALL') AS returnflag,
      | coalesce(l_linestatus,'ALL') AS linestatus,
      | count(*) AS n_items,
      | floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q57 — correlated-aggregate filter: orders costing more than 1.5×
    * their customer's average order. The correlated scalar subquery is
    * planned as a per-customer aggregate joined back — at scale the
    * aggregate side is orders-of-magnitude smaller than the fact and
    * the join shuffles on the same custkey both sides (co-partition). */
  def q57(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val custAvg = o.groupBy("o_custkey")
      .agg((exactSum(col("o_totalprice")) / count(lit(1))).as("cust_avg"))
    o.join(custAvg, "o_custkey")
      .filter(col("o_totalprice") > col("cust_avg") * 1.5)
      .select(col("o_custkey"), col("o_orderkey"),
        floorRound(col("o_totalprice"), 2).as("totalprice"),
        floorRound(col("cust_avg"), 2).as("cust_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q57Sql: String =
    """WITH ca AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS cust_avg
      |  FROM orders GROUP BY o_custkey)
      |SELECT o.o_custkey, o.o_orderkey,
      | floor(o.o_totalprice * 100 + 0.5) / 100 AS totalprice,
      | floor(ca.cust_avg * 100 + 0.5) / 100 AS cust_avg
      |FROM orders o JOIN ca ON o.o_custkey = ca.o_custkey
      |WHERE o.o_totalprice > ca.cust_avg * 1.5
      |ORDER BY o.o_custkey, o.o_orderkey""".stripMargin

  /** q59 — string aggregation: the market segments each nation's
    * customers span, as a deterministic sorted comma list (sort_array
    * before concat — collect_set order is otherwise partition-
    * dependent). The list domain is tiny (5 segments), so the payload
    * stays bounded regardless of customer count — the safe shape for
    * string aggregation at scale (unbounded string_agg of raw rows is
    * not). */
  def q59(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("segments"))
      .orderBy("n_name")

  val q59Sql: String =
    """SELECT n_name, count(*) AS n_customers,
      | string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Sibling graft_*_bkt_* warehouse dirs untouched for this long are
    * orphans of a crashed JVM (every live flow here — tests, Verify,
    * Bench — finishes in minutes). */
  private val StaleBucketDirMs = 6L * 3600 * 1000
  private val bucketReapDone = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val bucketHookRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteDir(dir: java.io.File): Unit =
    if (dir.exists()) { import scala.reflect.io.Directory; new Directory(dir).deleteRecursively() }

  /** One sweep per JVM: delete graft bucket-table dirs older than the
    * staleness threshold (left behind by crashed JVMs whose shutdown
    * hook never ran). */
  private def reapStaleBucketDirs(warehouse: java.io.File): Unit =
    if (bucketReapDone.compareAndSet(false, true)) {
      val now = System.currentTimeMillis()
      Option(warehouse.listFiles()).getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("graft_") &&
          d.getName.contains("_bkt_") && now - d.lastModified() > StaleBucketDirMs)
        .foreach(deleteDir)
    }

  /** JVM shutdown hook deleting this app's own bucket-table dirs —
    * app-unique names mean no other process can be reading them. One
    * JVM may bucket several sfDirs (tests sf0.001, Verify sf0.01,
    * Bench sf0.1), so targets accumulate in a set and one hook sweeps
    * them all at exit. */
  private val bucketDirTargets =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.File]()
  private def registerBucketDirCleanup(warehouse: java.io.File, tables: Seq[String]): Unit = {
    tables.foreach(t => bucketDirTargets.add(new java.io.File(warehouse, t)))
    if (bucketHookRegistered.compareAndSet(false, true))
      sys.addShutdownHook { bucketDirTargets.forEach(deleteDir(_)) }
  }

  /** q61 — bucketed co-located fact⋈fact join: lineitem and orders
    * are written ONCE per (session, sfDir) as catalog tables bucketed
    * 8-ways on the order key, and the join then reads co-located
    * buckets — `.hint("merge")` pins the sort-merge path and the plan
    * has NO shuffle exchange under the join (BucketingSpec asserts
    * this shape; at 100 TB neither fact side broadcasts, so bucketing
    * is what deletes the per-query shuffle of both). First call pays
    * the bucketed write — the real-world trade: one layout write
    * amortized over every subsequent co-located join. Bucket count 8
    * is corpus-sized; at cluster scale pick ~(total cores × small
    * factor) and the same code holds. The oracle is the plain join —
    * bucketing is physical layout, not semantics. */
  def q61(spark: SparkSession, sfDir: String): DataFrame = {
    // The tag folds in the Spark application id as well as sfDir: the
    // warehouse DIRECTORY outlives the in-memory catalog, so if two
    // JVMs (tests + Verify, say) shared a name, one deleting its
    // "orphan" would yank files the other is actively scanning.
    // App-unique names make cross-process collision impossible. The
    // leftovers are reaped two ways so repeated runs on a long-lived
    // host don't grow the warehouse without bound: a JVM shutdown
    // hook deletes THIS app's own tag dirs (precise — no other
    // process can be scanning an app-unique name), and on first use
    // we sweep sibling graft_*_bkt_* dirs whose mtime is older than
    // StaleBucketDirMs (covers crashed JVMs whose hook never ran; a
    // live session's dirs are hours younger than the threshold). A
    // production deployment uses a persistent metastore, where none
    // of this arises.
    val tag = java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(
        (sfDir + "#" + spark.sparkContext.applicationId).getBytes("UTF-8"))
        .getMostSignificantBits & Long.MaxValue)
    val liT = s"graft_li_bkt_$tag"
    val ordT = s"graft_ord_bkt_$tag"
    val warehouse = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    reapStaleBucketDirs(warehouse)
    registerBucketDirCleanup(warehouse, Seq(liT, ordT))
    // Keep THIS session's dirs visibly fresh: the stale-dir reaper in
    // another JVM keys on mtime, so a long-lived session touching its
    // tables on every reuse (below, in the tableExists branch) stays
    // safely inside the staleness window instead of relying on the
    // write-time mtime alone.
    def touch(table: String): Unit = {
      val d = new java.io.File(warehouse, table)
      if (d.exists()) { d.setLastModified(System.currentTimeMillis()); () }
    }
    // The in-memory catalog forgets tables across sessions while the
    // warehouse directory survives — saveAsTable refuses a new
    // managed table over an orphaned location, so clear it first
    // (with session-unique names this only ever matches a dir this
    // same session wrote).
    def dropOrphanedLocation(table: String): Unit =
      deleteDir(new java.io.File(warehouse, table))
    if (spark.catalog.tableExists(liT)) touch(liT)
    else {
      dropOrphanedLocation(liT)
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(liT)
    }
    if (spark.catalog.tableExists(ordT)) touch(ordT)
    else {
      dropOrphanedLocation(ordT)
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ordT)
    }
    spark.table(liT).hint("merge")
      .join(spark.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        floorRound(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("o_orderpriority")
  }

  val q61Sql: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      | floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q67 — MERGE/upsert semantics on plain parquet tables: apply a
    * deterministic change set (1997 order revenue per customer; every
    * third key re-mapped to a fresh id to exercise inserts) to the
    * customer base — WHEN MATCHED THEN UPDATE (balance += delta),
    * WHEN NOT MATCHED THEN INSERT, unmatched base rows kept. Spark
    * without a lakehouse format has no MERGE INTO; the composable
    * re-expression is a full outer join + coalesce projection — one
    * shuffle on the key each side, the same plan a MERGE executor
    * runs under the hood. At 100 TB: broadcast the delta if small,
    * else pre-bucket both sides on the key (q61's layout) so the
    * merge joins co-located buckets. */
  def q67(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), col("c_name"), col("c_acctbal"))
    val updates = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy("o_custkey")
      .agg(exactSum(col("o_totalprice")).as("delta"))
      .select(
        // inserts use NEGATED keys: custkeys are positive at every
        // scale factor, so -k is provably outside the base key domain
        // (a fixed additive offset would collide once custkeys reach
        // it and silently turn inserts into updates of strangers).
        when(col("o_custkey") % 3 === 0, -col("o_custkey"))
          .otherwise(col("o_custkey")).as("key"),
        col("delta"))
    base.join(updates, Seq("key"), "full_outer")
      .select(
        col("key"),
        when(col("c_acctbal").isNotNull && col("delta").isNotNull, "updated")
          .when(col("c_acctbal").isNull, "inserted")
          .otherwise("kept").as("status"),
        coalesce(col("c_name"), lit("(new)")).as("name"),
        floorRound(coalesce(col("c_acctbal"), lit(0.0)) + coalesce(col("delta"), lit(0.0)), 2)
          .as("balance"))
      .orderBy("key")
  }

  val q67Sql: String = {
    import graft.functions.OracleRound.{exactSumSql, floorRoundSql}
    s"""WITH updates AS (
       |  SELECT CASE WHEN o_custkey % 3 = 0 THEN -o_custkey ELSE o_custkey END AS key,
       |    ${exactSumSql("o_totalprice")} AS delta
       |  FROM orders WHERE year(o_orderdate) = 1997
       |  GROUP BY 1
       |), base AS (
       |  SELECT c_custkey AS key, c_name, c_acctbal FROM customer
       |)
       |SELECT COALESCE(b.key, u.key) AS key,
       | CASE WHEN b.c_acctbal IS NOT NULL AND u.delta IS NOT NULL THEN 'updated'
       |      WHEN b.c_acctbal IS NULL THEN 'inserted'
       |      ELSE 'kept' END AS status,
       | COALESCE(b.c_name, '(new)') AS name,
       | ${floorRoundSql("COALESCE(b.c_acctbal, 0.0) + COALESCE(u.delta, 0.0)", 2)} AS balance
       |FROM base b FULL OUTER JOIN updates u ON b.key = u.key
       |ORDER BY key""".stripMargin
  }

  /** q73 — decile binning via ntile: global order-statistics bucketing
    * of orders by price, with per-decile stats. ntile over a GLOBAL
    * window is a single-reducer sort by construction — fine for the
    * result-sized inputs it is meant for; when the input is the raw
    * 100 TB fact table, the scale path is q63's approx_percentile
    * cut-points (one mergeable-sketch pass) with a broadcast
    * range-lookup — same output contract, no global sort. Registered
    * on orders to exercise the real ntile operator end to end. */
  def q73(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_orders"),
        floorRound(min("o_totalprice"), 2).as("min_price"),
        floorRound(max("o_totalprice"), 2).as("max_price"),
        floorRound(exactSum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy("decile")
  }

  val q73Sql: String =
    """WITH d AS (
      |  SELECT o_totalprice,
      |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT decile, count(*) AS n_orders,
      | floor(min(o_totalprice) * 100 + 0.5) / 100 AS min_price,
      | floor(max(o_totalprice) * 100 + 0.5) / 100 AS max_price,
      | floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_price
      |FROM d GROUP BY decile ORDER BY decile""".stripMargin

  /** q74 — correlated LATERAL top-k join (SQL surface): top-3
    * customers by account balance per nation, written as the LATERAL
    * subquery a SQL user writes. Catalyst decorrelates the
    * limit-per-group into the same window/rank plan as q12 — the
    * per-key top-k never globally sorts and the nation side stays a
    * broadcast; exercising the SQL-entry path (spark.sql over raw
    * parquet) alongside the DataFrame builders is the point. */
  def q74(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      s"""SELECT n_name, c_name, c_acctbal
         |FROM parquet.`$sfDir/nation.parquet` n,
         |LATERAL (
         |  SELECT c_name, c_acctbal FROM parquet.`$sfDir/customer.parquet` c
         |  WHERE c.c_nationkey = n.n_nationkey
         |  ORDER BY c_acctbal DESC, c_name LIMIT 3
         |) t
         |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin)

  val q74Sql: String =
    """SELECT n_name, c_name, c_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 3
      |) t
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  /** q75 — recursive CTE date spine with gap fill: generate the
    * yearly calendar 1995–2003 by recursion (Spark 4 WITH RECURSIVE),
    * left-join yearly order revenue onto it, and 0-fill empty years
    * (2002–2003 have no orders — the rows a plain GROUP BY silently
    * drops and a reporting query must not). Recursion depth scales
    * with the DATE RANGE, never the data — 9 iterations whether
    * orders is 60k rows or 100 TB; each step is a one-row union, and
    * the fact-side aggregate is an ordinary partial+final rollup. */
  def q75(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql(
      s"""WITH RECURSIVE years(y) AS (
         |  SELECT 1995
         |  UNION ALL SELECT y + 1 FROM years WHERE y < 2003
         |),
         |rev AS (
         |  SELECT year(o_orderdate) AS yr, count(*) AS cnt,
         |    floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revsum
         |  FROM parquet.`$sfDir/orders.parquet`
         |  GROUP BY year(o_orderdate)
         |)
         |SELECT y AS order_year, coalesce(cnt, 0) AS n_orders,
         |  coalesce(revsum, CAST(0 AS DOUBLE)) AS revenue
         |FROM years LEFT JOIN rev ON yr = y
         |ORDER BY order_year""".stripMargin)

  val q75Sql: String =
    """WITH RECURSIVE years(y) AS (
      |  SELECT 1995
      |  UNION ALL SELECT y + 1 FROM years WHERE y < 2003
      |),
      |rev AS (
      |  SELECT year(o_orderdate) AS yr, count(*) AS cnt,
      |    floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revsum
      |  FROM orders
      |  GROUP BY year(o_orderdate)
      |)
      |SELECT y AS order_year, coalesce(cnt, 0) AS n_orders,
      |  coalesce(revsum, CAST(0 AS DOUBLE)) AS revenue
      |FROM years LEFT JOIN rev ON yr = y
      |ORDER BY order_year""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_ntile_deciles" -> q73 _,
    "q74_lateral_topk" -> q74 _,
    "q75_year_spine" -> q75 _,
    "q67_merge_upsert" -> q67 _,
    "q61_bucketed_join" -> q61 _,
    "q59_string_agg" -> q59 _,
    "q57_correlated_avg" -> q57 _,
    "q52_grouping_sets" -> q52 _,
    "q51_topk_aggregator" -> q51 _,
    "q48_rank_funcs" -> q48 _,
    "q49_range_frame" -> q49 _,
    "q46_intersect" -> q46 _,
    "q47_outer_join" -> q47 _,
    "q45_geomean_udaf" -> q45 _,
    "q43_pivot" -> q43 _,
    "q38_supplier_revenue" -> q38 _,
    "q39_percentiles" -> q39 _,
    "q40_date_funcs" -> q40 _,
    "q01_pricing_summary" -> q01 _,
    "q02_filter_project" -> q02 _,
    "q03_top_orders" -> q03 _,
    "q04_semi_join_priority" -> q04 _,
    "q05_region_revenue" -> q05 _,
    "q06_forecast_revenue" -> q06 _,
    "q07_broadcast_brand" -> q07 _,
    "q08_anti_join_customers" -> q08 _,
    "q09_rollup" -> q09 _,
    "q10_setops" -> q10 _,
    "q11_distinct_agg" -> q11 _,
    "q12_topk_per_group" -> q12 _,
    "q13_window_running" -> q13 _,
    "q14_scalar_funcs" -> q14 _,
    "q15_fizzbuzz" -> q15 _,
    "q16_cube" -> q16 _)

  val oracles: Map[String, String] = Map(
    "q73_ntile_deciles" -> q73Sql,
    "q74_lateral_topk" -> q74Sql,
    "q75_year_spine" -> q75Sql,
    "q67_merge_upsert" -> q67Sql,
    "q61_bucketed_join" -> q61Sql,
    "q59_string_agg" -> q59Sql,
    "q57_correlated_avg" -> q57Sql,
    "q52_grouping_sets" -> q52Sql,
    "q51_topk_aggregator" -> q12Sql, // same contract as the window top-k
    "q48_rank_funcs" -> q48Sql,
    "q49_range_frame" -> q49Sql,
    "q46_intersect" -> q46Sql,
    "q47_outer_join" -> q47Sql,
    "q45_geomean_udaf" -> q45Sql,
    "q43_pivot" -> q43Sql,
    "q38_supplier_revenue" -> q38Sql,
    "q39_percentiles" -> q39Sql,
    "q40_date_funcs" -> q40Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_top_orders" -> q03Sql,
    "q04_semi_join_priority" -> q04Sql,
    "q05_region_revenue" -> q05Sql,
    "q06_forecast_revenue" -> q06Sql,
    "q07_broadcast_brand" -> q07Sql,
    "q08_anti_join_customers" -> q08Sql,
    "q09_rollup" -> q09Sql,
    "q10_setops" -> q10Sql,
    "q11_distinct_agg" -> q11Sql,
    "q12_topk_per_group" -> q12Sql,
    "q13_window_running" -> q13Sql,
    "q14_scalar_funcs" -> q14Sql,
    "q15_fizzbuzz" -> q15Sql,
    "q16_cube" -> q16Sql)
}
