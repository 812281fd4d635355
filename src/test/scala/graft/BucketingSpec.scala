package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Bucketing: the 100 TB growth path for the fact⋈fact join
  * (SURVEY.md §7.1 B1 / BASELINE.md) — pre-bucket both tables on the
  * join key so the sort-merge join reads co-located buckets and the
  * per-query shuffle of the big tables disappears. This spec writes
  * lineitem/orders bucketed by orderkey and asserts (a) the join plan
  * has NO shuffle exchange on either side, and (b) results match the
  * plain-join answer exactly. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs without a shuffle exchange and matches the plain join") {
    // bucketed tables must go through the catalog (saveAsTable);
    // they land in the session's default warehouse (./spark-warehouse,
    // gitignored) since warehouse.dir is a static config
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable auto-broadcast so the join exercises the SMJ path the
    // bucketing is designed for (at 100 TB neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("s"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
