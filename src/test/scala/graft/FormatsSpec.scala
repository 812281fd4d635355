package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Formats, Tables}

/** Round-trip every non-parquet format through a real fixture table
  * and assert exact value equality — the source/sink coverage the
  * reference lacks entirely. */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val sf = "/root/testdata/sf0.001"

  private def nationSorted = Tables.nation(spark, sf).orderBy("n_nationkey")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("n_nationkey").collect().toSeq.map(_.toSeq)

  test("csv round-trip preserves all values (explicit schema, no inference pass)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Formats.writeCsv(nationSorted, dir)
    val back = Formats.readCsv(spark, dir, nationSorted.schema)
    assert(rowsOf(back) === rowsOf(nationSorted))
  }

  test("orc round-trip preserves all values and pushes filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Formats.writeOrc(nationSorted, dir)
    val back = Formats.readOrc(spark, dir)
    assert(rowsOf(back) === rowsOf(nationSorted))
    val filtered = back.filter(col("n_nationkey") > 20)
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedFilters"))
    assert(filtered.count() === 4)
  }

  test("json round-trip preserves all values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    Formats.writeJson(nationSorted, dir)
    val back = Formats.readJson(spark, dir, nationSorted.schema)
    assert(rowsOf(back) === rowsOf(nationSorted))
  }

  test("registerAll exposes the full SQL surface over the fixture tables") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT r_name, count(*) AS n
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").count().orderBy("r_name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql === viaDf)
    // events view carries the ns-workaround
    assert(spark.sql("SELECT count(*) FROM events WHERE event_type = 'view'")
      .collect()(0).getLong(0) > 0)
  }

  test("schema evolution: mergeSchema read unions v1 and v2 parquet layouts") {
    // The layout-change reality of a long-lived 100 TB table: files
    // written before a column existed must stay readable next to
    // files written after. mergeSchema=true reconciles footers; old
    // rows surface NULL for the new column, and pruning/pushdown are
    // unaffected (still one parquet scan).
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/t")
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "name", "score")
      .write.mode("append").parquet(s"$dir/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.schema.fieldNames.toSet === Set("id", "name", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length === 4)
    assert(rows.take(2).forall(_.isNullAt(2)), "v1 rows must read NULL for the new column")
    assert(rows.drop(2).map(_.getDouble(2)).toSeq === Seq(0.5, 0.7))
  }

  test("partitioned parquet sink prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Formats.writePartitioned(Tables.customer(spark, sf), dir, Seq("c_mktsegment"))
    val pruned = Formats.readParquet(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    // partition pruning: the physical scan lists only the matching directory
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ===
      Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING").count())
    assert(!scan.contains("c_mktsegment=AUTOMOBILE"))
  }

  test("JSONL training export: split directories, bounded shards, manifest counts, lossless read-back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/out"
    val docs = Tables.documents(spark, sf)
      .withColumn("split", expr(graft.functions.HashBucket.splitExpr("doc_id")))
      .select("doc_id", "text", "lang", "split")
    val manifest = Formats.writeJsonlBySplit(docs, dir, "split", shards = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(manifest.keySet === Set("train", "val", "test"))
    assert(manifest.values.sum === docs.count())
    // Directory per split, and — the scale property — every split is
    // written by MULTIPLE tasks: the round-robin repartition must fan
    // each split (especially the ~80% train split) across all
    // `shards` writers. A single part file per split means the export
    // funneled that split through one task; that exact bug passed the
    // old `parts.length <= shards` assertion trivially.
    Seq("train", "val", "test").foreach { s =>
      val d = new java.io.File(dir, s"split=$s")
      assert(d.isDirectory, s"missing split directory $s")
      val parts = d.listFiles().filter(_.getName.endsWith(".json"))
      // The multi-writer fan-out property is only guaranteed for the
      // DOMINANT split: round-robin lands the ~80% train split in
      // every shard, but a tiny val/test split can legally leave a
      // shard empty (empty partitions write no part file), so those
      // only get the bounded-shard-count check.
      if (s == "train")
        assert(parts.length == 2,
          s"train: ${parts.length} shard files, expected exactly 2 (one per writer task)")
      else
        assert(parts.length >= 1 && parts.length <= 2,
          s"$s: ${parts.length} shard files, expected 1..2")
    }
    // read-back is lossless (schema given explicitly — JSONL carries no types)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() === docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.select("doc_id", "text", "lang", "split")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq, "JSONL round-trip altered rows")
  }
}
