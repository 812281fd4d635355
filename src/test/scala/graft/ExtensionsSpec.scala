package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the dot-product rewrite rule and SQL function
  * registration, on a dedicated session (extensions are fixed at
  * session build time, so the shared test session can't be reused). */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate() would hand back the shared (extension-less) test
    // session when the whole suite runs; clear the active/default
    // handles so the builder constructs a NEW session (reusing the
    // JVM's SparkContext) with GraftExtensions applied, then restore
    // the shared session as default for the other suites.
    val shared = SparkTestSession.get
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // withExtensions (not the config string): when the builder reuses
      // an existing SparkContext the conf-driven path is not re-read.
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  private def df = {
    import spark.implicits._
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.5, -1.0, 2.5), Array(1.5, 0.0, -2.0))).toDF("a", "b")
  }

  test("HOF aggregate(zip_with(...)) dot product is rewritten to native dot_product") {
    // Assert on a parquet-backed plan: a LocalRelation would be
    // constant-folded end-to-end and hide the rewritten expression.
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .createOrReplaceTempView("emb_plan")
    val q = spark.sql(
      "SELECT aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, w) -> acc + w) AS dot FROM emb_plan")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product"), s"rule did not fire:\n$optimized")

    df.createOrReplaceTempView("vecs")
    val got = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS dot FROM vecs")
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(1.0 * 4 + 2 * 5 + 3 * 6, 0.5 * 1.5 + 0.0 - 5.0))
  }

  test("injected SQL functions dot_product / cosine_sim / l2_distance evaluate correctly") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT dot_product(a, b) AS d, cosine_sim(a, a) AS c, l2_distance(a, a) AS l FROM vecs")
      .collect()
    assert(r.map(_.getDouble(0)).toSeq === Seq(32.0, -4.25))
    r.foreach { row =>
      assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
      assert(row.getDouble(2) === 0.0)
    }
  }

  test("rewrite parity on degenerate inputs: ragged lengths and null elements → NULL both ways") {
    // zip_with null-pads ragged arrays and a null element poisons the
    // HOF aggregate; DotProduct must reproduce that NULL, not a number
    // over min(len) — the rewrite fires on arbitrary user SQL, so this
    // is the semantics-preservation proof for the ugly inputs.
    import spark.implicits._
    val weird = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0))), // ragged
      (2L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))), // null elem
      (3L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0), Some(4.0))) // clean
    ).toDF("id", "a", "b")
    // Force a non-local plan so neither side constant-folds away.
    val path = java.nio.file.Files.createTempDirectory("graft_ragged").toString
    weird.write.mode("overwrite").parquet(path)
    // The TRUE HOF baseline must come from the extension-less shared
    // session — in `spark` the rule would rewrite it to dot_product
    // and the comparison would be circular.
    val vanilla = SparkTestSession.get
    vanilla.read.parquet(path).createOrReplaceTempView("ragged_v")
    val hof = vanilla.sql(
      """SELECT id, aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v) AS d
        |FROM ragged_v ORDER BY id""".stripMargin).collect()
    spark.read.parquet(path).createOrReplaceTempView("ragged")
    val native = spark.sql(
      "SELECT id, dot_product(a, b) AS d FROM ragged ORDER BY id").collect()
    hof.zip(native).foreach { case (h, n) =>
      assert(h.isNullAt(1) === n.isNullAt(1), s"null parity broke at id ${h.getLong(0)}")
      if (!h.isNullAt(1)) assert(h.getDouble(1) === n.getDouble(1))
    }
    assert(hof(0).isNullAt(1) && hof(1).isNullAt(1) && hof(2).getDouble(1) === 11.0)
  }

  test("rewrite preserves results vs the interpreted HOF on real embeddings") {
    val sf = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    e.createOrReplaceTempView("emb")
    val viaRule = spark.sql(
      """SELECT vec_id, aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, v2) -> acc + v2) AS ss
        |FROM emb ORDER BY vec_id""".stripMargin).collect()
    val native = spark.sql(
      "SELECT vec_id, dot_product(v, v) AS ss FROM emb ORDER BY vec_id").collect()
    viaRule.zip(native).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getDouble(1) === b.getDouble(1)) // bitwise: same accumulation order
    }
  }
}
