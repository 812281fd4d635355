package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's full query surface: every operator family from
  * SURVEY.md §2/§7.1 registers here as a named query, each paired (in
  * `oracleSql`) with ANSI SQL the driver runs in DuckDB over the same
  * parquet tables. Queries without an oracle entry are
  * non-SQL-expressible (typed mapPartitions / sketches) and get the
  * weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Five-way star join + aggregation (q05). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05(spark, "/root/testdata/sf0.001")

  /** approx_count_distinct (HLL++ sketch) — Spark-native approximate
    * distinct; no DuckDB twin (different sketch), so rows-only. The
    * 100 TB story: sketches shuffle O(groups × sketch), never the key
    * space. */
  private def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supps"))
      .orderBy("l_returnflag")

  /** approx_percentile (KLL-style mergeable quantile sketch) — the
    * 100 TB path for q39's exact percentiles: partials merge map-side
    * and the shuffle carries O(groups × sketch), never each group's
    * value multiset. No DuckDB twin (different sketch) → rows-only
    * here; OperatorSpec bounds the rank error against the exact
    * q39-style answer instead. */
  private def approxPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)").as("pcts"),
        count(lit(1)).as("n_orders"))
      .select(col("o_orderpriority"),
        element_at(col("pcts"), 1).as("p50"),
        element_at(col("pcts"), 2).as("p90"),
        element_at(col("pcts"), 3).as("p99"),
        col("n_orders"))
      .orderBy("o_orderpriority")

  /** freqItems (single-pass frequent-item sketch, Karp-Shenker-
    * Papadimitriou) — the approximate twin of q41's exact salted
    * heavy hitters: one narrow pass, O(1/support) state per
    * partition, mergeable — the vocabulary-pruning shape at 100 TB
    * where an exact token count is its own full job. Guarantee: every
    * token with frequency > support·N is present (false positives
    * possible, false negatives not) — OperatorSpec pins exactly that
    * superset property against the exact counts. Rows-only here (the
    * sketch's false-positive set is engine-specific). */
  private def freqTokens(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val items = toks.stat.freqItems(Seq("tok"), 0.01)
      .select(explode(col("tok_freqItems")).as("tok"))
    items.select(col("tok")).orderBy("tok")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Multimodal.queries ++
      Corpus.queries ++ Training.queries ++ Analytics.queries ++
      Map("q33_approx_distinct" -> (approxDistinct _),
        "q63_approx_percentiles" -> (approxPercentiles _),
        "q66_freq_items" -> (freqTokens _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Events.oracles ++ Dedup.oracles ++
      TextAnalysis.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      Corpus.oracles ++ Training.oracles ++ Analytics.oracles
}
