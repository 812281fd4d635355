package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Training
import graft.sources.Tables

/** Semantic invariants for the training-data assembly wave (q79-q87)
  * on sf0.001 — properties that must hold regardless of the DuckDB
  * oracle: conservation laws (packing loses no tokens, splits
  * partition the corpus), ordering laws (funnel stages only shrink),
  * round-trip laws (unpivot re-pivots to its input), and analytic
  * bounds (interpolation stays between its anchors, quantization
  * error within the quantizer's step bound, PageRank mass ≈ 1). */
class TrainingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val sf = "/root/testdata/sf0.001"

  test("q79 packing conserves tokens per source and pack ids are dense from 0") {
    val packs = Training.q79(spark, sf).collect()
    val truth = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxDoc = Tables.documents(spark, sf)
      .agg(max(size(split(col("text"), " ")))).head.getInt(0)
    val bySource = packs.groupBy(_.getString(0))
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getLong(3)).sum === truth(src),
        s"$src: packed tokens != corpus tokens")
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.head === 0L, s"$src: packs don't start at 0")
      assert(ids.distinct.length === ids.length, s"$src: duplicate pack ids")
      // density is only an invariant when no single document spans a
      // whole budget (a 5000-token doc skips pack ids by design:
      // pack = cum_before DIV budget) — guard so a fixture refresh
      // with long docs doesn't fail a correct operator
      if (maxDoc <= 2048)
        assert(ids === (0L until ids.length).toArray.toSeq,
          s"$src: pack ids not dense")
    }
  }

  test("q80 split assignment partitions the corpus (no doc lost or double-counted)") {
    val splits = Training.q80(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(splits.map(_.getLong(1)).sum === total)
    assert(splits.map(_.getString(0)).toSet === Set("train", "val", "test"))
    // hash-bucket split: train must dominate (80/10/10 target)
    val train = splits.find(_.getString(0) == "train").get.getLong(1)
    assert(train > total / 2)
  }

  test("q81 funnel stages are monotonically non-increasing") {
    val r = Training.q81(spark, sf).collect().head
    val (users, viewed, clicked, bought) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users >= viewed && viewed >= clicked && clicked >= bought)
    assert(bought > 0, "funnel degenerate at sf0.001 — pick different stages")
    assert(r.getLong(6) > 0, "mean view->purchase lag must be positive")
  }

  test("q82 unpivot emits one row per (key, measure) and re-pivots to its input") {
    val long = Training.q82(spark, sf)
    val rows = long.collect()
    val flags = rows.map(_.getString(0)).distinct
    assert(rows.length === flags.length * 3)
    // melt . pivot == identity (on the same measure domain)
    val roundTrip = long.groupBy("l_returnflag")
      .pivot("measure", Seq("sum_qty", "sum_price", "n_items"))
      .agg(first("value"))
    val wide = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(count(lit(1)).cast("double").as("n_items"))
    val joined = roundTrip.join(wide.withColumnRenamed("n_items", "expected"), "l_returnflag")
    assert(joined.filter(col("n_items") =!= col("expected")).count() === 0)
  }

  test("q83 interpolation: observed hours keep their value, gaps stay between anchors") {
    val out = Training.q83(spark, sf)
    val gaps = out.filter(col("is_gap"))
    assert(gaps.count() > 0, "no gaps at sf0.001 — interpolation untested")
    // every filled gap lies within [min, max] of its type's observed values
    val bounds = out.filter(!col("is_gap"))
      .groupBy("event_type")
      .agg(min("value_filled").as("lo"), max("value_filled").as("hi"))
    val out15 = gaps.join(bounds, "event_type")
      .filter(col("value_filled") < col("lo") || col("value_filled") > col("hi"))
    assert(out15.count() === 0, "interpolated value escaped its anchor range")
  }

  test("q84 PMI: every reported bigram meets the count floor and is finite") {
    val rows = Training.q84(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5, s"${r.getString(0)} ${r.getString(1)}: count < floor")
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
    // ranked descending by pmi
    val pmis = rows.map(_.getDouble(3)).toSeq
    assert(pmis === pmis.sorted.reverse)
  }

  test("q85 quantization error is bounded by the per-dim quantizer step") {
    // worst-case per-component sq error is (scale/2)^2; mse over 64
    // dims is bounded by 64 * max_dim((scale/2)^2)
    val e = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(((max(col("x").cast("double")) - min(col("x").cast("double"))) / 255.0).as("scale"))
    val maxScale = e.agg(max("scale")).collect().head.getDouble(0)
    val bound = 64.0 * math.pow(maxScale / 2.0, 2) * 1.0001 // rounding slack
    Training.q85(spark, sf).collect().foreach { r =>
      val mse = r.getDouble(2)
      assert(mse >= 0.0 && mse <= bound, s"label ${r.get(0)}: mse $mse > bound $bound")
    }
  }

  test("q86 PageRank conserves probability mass (Σrank ≈ 1, all ranks positive)") {
    val rows = Training.q86(spark, sf).collect()
    assert(rows.length === 25)
    val mass = rows.map(_.getDouble(2)).sum
    // floor-rounding at 1e-12 per node per iteration + no dangling
    // mass at sf0.001 (every nation trades) → tight tolerance
    assert(math.abs(mass - 1.0) < 1e-6, s"rank mass $mass")
    rows.foreach(r => assert(r.getDouble(2) > 0.0))
  }

  test("q87 inverted index: postings head size = min(df, 3) and df >= posting docs") {
    Training.q87(spark, sf).collect().foreach { r =>
      val df = r.getLong(1)
      val cf = r.getLong(2)
      val head = r.getString(3).split(",").filter(_.nonEmpty)
      assert(head.length === math.min(df, 3L).toInt, s"${r.getString(0)}: head size")
      assert(cf >= df, s"${r.getString(0)}: collection freq < doc freq")
      assert(head.distinct.length === head.length, s"${r.getString(0)}: dup posting")
    }
  }
}
