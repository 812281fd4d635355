package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, Corpus}
import graft.sources.Tables

/** Semantic invariants for the statistics/analytics wave (q88-q99) on
  * sf0.001 — checks independent of the DuckDB oracle: closed-form
  * moments against a local reference implementation, analytic bounds
  * (entropy ≤ ln(types), |corr| ≤ 1, retention ≤ 1), structural laws
  * (SCD2 intervals tile each user's timeline, histogram buckets
  * partition the table), a brute-force triangle count, and plan pins
  * (EXISTS decorrelates to semi/anti joins, moment aggregates stay
  * one partial+final pass).
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  val sf = "/root/testdata/sf0.001"

  test("q157 skew profile matches an exact local replay of the key histogram") {
    def fr(x: Double, k: Int): Double = {
      val m = math.pow(10, k); math.floor(x * m + 0.5) / m
    }
    val counts = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getLong(0)).groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val nKeys = counts.size.toLong
    val nRows = counts.values.sum
    val top = counts.toSeq.sortBy { case (k, n) => (-n, k) }.take(10)
    val out = SparkEntry.queries("q157_skew_profile")(spark, sf).collect()
    assert(out.length === 10)
    var cum = 0L
    out.zipWithIndex.foreach { case (r, i) =>
      val (key, n) = top(i)
      cum += n
      assert(r.getLong(0) === (i + 1).toLong, "rank")
      assert(r.getLong(1) === key, s"key at rank ${i + 1}")
      assert(r.getLong(2) === n, s"count at rank ${i + 1}")
      assert(r.getDouble(3) === fr(n.toDouble / nRows.toDouble, 6), "share")
      assert(r.getDouble(4) === fr(cum.toDouble / nRows.toDouble, 6), "cum_share")
      assert(r.getDouble(5) ===
        fr(n.toDouble * nKeys.toDouble / nRows.toDouble, 4), "skew_factor")
    }
    // the profile's defining invariants: heaviest-first, cumulative
    assert(out.map(_.getLong(2)).toSeq === out.map(_.getLong(2)).sortBy(-_).toSeq)
    assert(out.map(_.getDouble(4)).toSeq === out.map(_.getDouble(4)).sorted.toSeq)
  }

  test("q159 per-dim stats match an exact local replay (decimal-sum moments) and shares total ~1") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def fr(x: Double, k: Int): Double = {
      val m = math.pow(10, k); math.floor(x * m + 0.5) / m
    }
    def dec18(x: Double): JBD =
      new JBD(x).setScale(18, RoundingMode.HALF_UP)
    val vecs = Tables.embeddings(spark, sf)
      .filter(size(col("embedding")) === 64)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val out = SparkEntry.queries("q159_embed_dim_stats")(spark, sf).collect()
    assert(out.length === 64)
    val vars = out.map(_.getDouble(5))
    assert(vars.forall(_ >= 0.0), "variance must be non-negative")
    // local replay with the SAME arithmetic: double→DECIMAL(_,18)
    // per-element sums (exact, order-free), double division, floor-round
    val n = vecs.length
    (0 until 64).foreach { d =>
      val xs = vecs.map(_(d))
      val s = xs.map(dec18).foldLeft(JBD.ZERO)(_.add(_)).doubleValue()
      val ssq = xs.map(x => dec18(x * x)).foldLeft(JBD.ZERO)(_.add(_)).doubleValue()
      val r = out(d)
      assert(r.getLong(0) === (d + 1).toLong)
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) === xs.min, s"min dim ${d + 1}")
      assert(r.getDouble(3) === xs.max, s"max dim ${d + 1}")
      assert(r.getDouble(4) === fr(s / n, 9), s"mean dim ${d + 1}")
      assert(r.getDouble(5) === fr((ssq - s * s / n) / n, 9), s"var dim ${d + 1}")
    }
    // anisotropy shares partition total variance (up to 64 × 1e-6 rounding)
    assert(math.abs(out.map(_.getDouble(6)).sum - 1.0) < 64e-6)
  }

  test("q164 trigram patterns match an exact local replay of the per-user sequence walk") {
    val evs = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tris = evs.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(3).filter(_.length == 3)
        .map(t => (uid, t.mkString(">"))).toSeq
    }
    val exp = tris.groupBy(_._2).map { case (p, occ) =>
      p -> (occ.map(_._1).distinct.length.toLong, occ.length.toLong)
    }
    val top = exp.toSeq.map { case (p, (u, o)) => (p, u, o) }
      .sortBy { case (p, u, o) => (-u, -o, p) }.take(10)
    val out = SparkEntry.queries("q164_seq_patterns")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === top, "trigram support table diverges from the replay")
    // support can never exceed occurrences, nor total users
    val nUsers = evs.map(_._1).distinct.length.toLong
    out.foreach { case (p, u, o) =>
      assert(u <= o, s"$p support above occurrences")
      assert(u <= nUsers, s"$p support above user count")
    }
  }

  test("q88 moments match a local reference implementation") {
    val rows = Analytics.q88(spark, sf).collect()
    val data = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = data(r.getString(0)).map(_._2)
      val ys = data(r.getString(0)).map(_._3)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val m2 = xs.map(x => (x - mean) * (x - mean)).sum / n
      val std = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      val skew = xs.map(x => math.pow(x - mean, 3)).sum / n / math.pow(m2, 1.5)
      val kurt = xs.map(x => math.pow(x - mean, 4)).sum / n / (m2 * m2) - 3.0
      val my = ys.sum / n
      val corr = xs.zip(ys).map { case (x, y) => (x - mean) * (y - my) }.sum /
        (math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum) *
          math.sqrt(ys.map(y => (y - my) * (y - my)).sum))
      assert(r.getLong(1) === xs.length)
      assert(math.abs(r.getDouble(2) - mean) < 1e-4, "mean")
      assert(math.abs(r.getDouble(3) - std) < 1e-4, "std")
      assert(math.abs(r.getDouble(4) - skew) < 1e-4, "skew")
      assert(math.abs(r.getDouble(5) - kurt) < 1e-3, "kurt")
      assert(math.abs(r.getDouble(6) - corr) < 1e-4, "corr")
      assert(math.abs(r.getDouble(6)) <= 1.0)
    }
  }

  test("q88 is one partial+final aggregate over the scan (mergeable moments)") {
    val plan = Analytics.q88(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), "moment sums must map-side combine")
    assert(!plan.toLowerCase.contains("stddev") && !plan.toLowerCase.contains("skewness"),
      "statistics must derive from raw moments, not engine builtins")
  }

  test("q89 OLS matches a local least-squares fit per brand") {
    val fits = Analytics.q89(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val data = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select("p_brand", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    data.foreach { case (brand, pts) =>
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
      val sxx = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val (gs, gi, r2) = fits(brand)
      assert(math.abs(gs - slope) < 1e-3, s"$brand slope")
      assert(math.abs(gi - icept) < 1e-1, s"$brand intercept")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$brand r2 out of range")
    }
  }

  test("q90 histogram buckets partition the orders table") {
    val rows = Analytics.q90(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(lo >= b * 25000.0 && hi < (b + 1) * 25000.0,
        s"bucket $b bounds [$lo,$hi] escape its range")
    }
  }

  test("q91 entropy is within (0, ln(n_types)] and TTR within (0,1]") {
    val rows = Analytics.q91(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (types, h, ttr) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(h > 0.0 && h <= math.log(types.toDouble) + 1e-9,
        s"${r.getString(0)}: entropy $h outside (0, ln($types)]")
      assert(ttr > 0.0 && ttr <= 1.0)
    }
  }

  test("q92 reports exactly the >2-sigma hours") {
    val rows = Analytics.q92(spark, sf).collect()
    assert(rows.nonEmpty, "no anomalies at sf0.001 — threshold too tight")
    rows.foreach(r => assert(math.abs(r.getDouble(3)) > 2.0))
  }

  test("q93 SCD2 intervals tile each user's timeline") {
    val rows = Analytics.q93(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    rows.groupBy(_._1).foreach { case (user, ivs) =>
      val sorted = ivs.sortBy(_._3)
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_._4.isEmpty) === 1)
      assert(sorted.last._4.isEmpty)
      // contiguous: each valid_to equals the next valid_from
      sorted.iterator.sliding(2).withPartial(false).foreach { pair =>
        val (a, b) = (pair.head, pair.last)
        assert(a._4.contains(b._3), s"user $user: gap between intervals")
        assert(a._2 != b._2, s"user $user: consecutive equal states not collapsed")
      }
    }
  }

  test("q94 cohort week 0 retains 100% and retention never exceeds 1") {
    val rows = Analytics.q94(spark, sf).collect()
    rows.filter(_.getLong(1) == 0L).foreach(r => assert(r.getDouble(3) === 1.0))
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    // every user appears in exactly one cohort: cohort sizes sum to distinct users
    val users = Tables.events(spark, sf).select(countDistinct("user_id")).head.getLong(0)
    assert(rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum === users)
  }

  test("q95 triangle count matches brute force on the edge set") {
    val r = Analytics.q95(spark, sf).head
    val sn = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("s_nationkey")).collect()
      .map(x => (x.getAs[Number](0).longValue(), x.getAs[Number](1).longValue()))
    val edges = sn.groupBy(_._1).values.flatMap { g =>
      val ns = g.map(_._2).distinct.toSeq
      for (a <- ns; b <- ns if a < b) yield (a, b)
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tri = (for {
      a <- nodes; b <- nodes if a < b && edges((a, b))
      c <- nodes if b < c && edges((b, c)) && edges((a, c))
    } yield 1).size
    assert(r.getLong(1) === edges.size, "edge count")
    assert(r.getLong(2) === tri, "triangle count")
  }

  test("q96 EXISTS pair decorrelates to semi+anti joins (no per-row subqueries)") {
    val plan = Analytics.q96(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS must become a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS must become an anti join")
  }

  test("q96 matches the DataFrame semi/anti twin") {
    val got = Analytics.q96(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Tables.orders(spark, sf)
    val twin = Tables.customer(spark, sf)
      .join(orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .join(orders.filter(col("o_orderpriority") === "5-LOW"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === twin)
  }

  test("q97 filtered aggregates agree with explicit-filter twins") {
    val rows = Analytics.q97(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val flag = r.getString(0)
      val heavy = li.filter(col("l_returnflag") === flag && col("l_quantity") > 25)
      assert(r.getLong(2) === heavy.count(), "n_heavy")
      assert(r.getLong(3) === heavy.select(countDistinct("l_suppkey")).head.getLong(0))
      assert(r.getLong(1) >= r.getLong(2), "filtered count exceeds total")
    }
  }

  test("q98 map build/filter/explode equals the flat relational twin") {
    val got = Analytics.q98(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val flat = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 3)
      .groupBy("tok").agg(count(lit(1)).as("n_docs"), sum("c").as("n_occ"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === flat)
  }

  test("q100 coverage curve is monotone, bounded, and dense-ranked") {
    val rows = Analytics.q100(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length).toSeq, "ranks not dense")
    val cov = rows.map(_.getDouble(3))
    cov.sliding(2).foreach(p => if (p.length == 2) assert(p(0) <= p(1), "coverage decreased"))
    assert(cov.last <= 1.0 + 1e-9)
    val counts = rows.map(_.getLong(2))
    counts.sliding(2).foreach(p => if (p.length == 2) assert(p(0) >= p(1), "head not sorted by count"))
  }

  test("q101 leakage audits only the eval splits and bounds ratios") {
    val rows = Analytics.q101(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === Set("val", "test"))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "more leaked than present")
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("q102 weighted sampling is deterministic and near its expectation") {
    val a = Analytics.q102(spark, sf).collect().map(_.toSeq)
    val b = Analytics.q102(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq, "re-execution changed the sample")
    Analytics.q102(spark, sf).collect().foreach { r =>
      val (n, kept, exp) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(kept <= n)
      // md5 buckets are uniform: actual within a generous binomial bound
      assert(math.abs(kept - exp) <= 4.0 * math.sqrt(exp.max(1.0)) + 4.0,
        s"${r.getString(0)}: kept=$kept expected=$exp — hash sampling biased?")
    }
  }

  test("q103 null-safe join keeps the NULL-key group and reconciles totals") {
    val rows = Analytics.q103(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === total, "groups lost rows")
    val nullRow = rows.find(_.getBoolean(1)).get
    assert(nullRow.getLong(3) === 0L, "count(col) must skip NULL keys")
    assert(!nullRow.isNullAt(4), "null-safe join dropped the NULL group's match")
    rows.filterNot(_.getBoolean(1)).foreach(r => assert(r.getLong(3) === r.getLong(2)))
  }

  test("q104 HLL sketches estimate within 5% and union consistently") {
    val rows = Analytics.q104(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang").agg(countDistinct("tok").as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, d) =>
      assert(math.abs(rows(lang) - d) <= math.max(2.0, 0.05 * d),
        s"$lang: estimate ${rows(lang)} vs exact $d")
    }
    val perLang = rows.collect { case (k, v) if k != "ALL" => v }
    assert(rows("ALL") >= perLang.max, "union below its largest input")
    assert(rows("ALL") <= math.ceil(perLang.sum * 1.05).toLong, "union exceeds sum of inputs")
  }

  test("q105 variant extraction agrees with string-path JSON extraction") {
    val got = Analytics.q105(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    val twin = Tables.events(spark, sf)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("nk"), sum("k").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === twin)
  }

  test("q106 SQL UDF inlines into the plan (no opaque UDF node)") {
    val qe = Analytics.q106(spark, sf).queryExecution
    assert(!qe.executedPlan.toString.contains("BatchEvalPython"))
    assert(!qe.optimizedPlan.toString.toLowerCase.contains("scalaudf"),
      "SQL function body must inline, not wrap in a JVM UDF")
    // the body appears as plain arithmetic in the aggregate itself
    assert(qe.executedPlan.toString.contains("* (1.0 - "),
      "inlined function body not visible in the physical plan")
  }

  test("q107 LM cross-entropy is positive, bounded by ln(corpus), and flags a minority") {
    val rows = graft.operators.TextAnalysis.q107(spark, sf).collect()
    val nTokens = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " "))).count()
    rows.foreach { r =>
      val (n, xent, flagged) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(xent > 0.0 && xent <= math.log(nTokens.toDouble),
        s"${r.getString(0)}: mean_xent $xent outside (0, ln($nTokens)]")
      assert(flagged <= n)
    }
    // the filter must not reject the bulk of the corpus
    assert(rows.map(_.getLong(3)).sum < rows.map(_.getLong(1)).sum / 2,
      "threshold flags most documents — not a usable filter")
  }

  test("q108 z-order ranges are 4x4 tiles (bounded spread in BOTH dimensions)") {
    val rows = Analytics.q108(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "ranges lost orders")
    rows.foreach { r =>
      val (zr, sx, sy) = (r.getLong(0),
        r.getLong(3) - r.getLong(2), r.getLong(5) - r.getLong(4))
      assert(sx <= 3 && sy <= 3,
        s"z-range $zr spans ${sx + 1}x${sy + 1} — not a 4x4 tile; " +
          "a linear key would span the full y domain, which is what z-order prevents")
    }
  }

  test("q109 transition rows are stochastic and transitions conserve events") {
    val rows = Analytics.q109(spark, sf).collect()
    // each from_type's probabilities sum to ~1 (floor-rounding loses <1e-5)
    rows.groupBy(_.getString(0)).foreach { case (from, cells) =>
      val p = cells.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from: row sums to $p")
    }
    // #transitions = #events - #users (each user's last event has no successor)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select(countDistinct("user_id")).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === expected)
  }

  test("q110 audit passes on the clean fixtures and checks full table counts") {
    val rows = Analytics.q110(spark, sf).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getLong(1) === 0L, s"${r.getString(0)}: fixture should be clean")
      assert(r.getBoolean(3), s"${r.getString(0)} not marked passed")
      assert(r.getLong(2) > 0L, s"${r.getString(0)}: checked 0 rows")
    }
    val li = Tables.lineitem(spark, sf).count()
    assert(rows.find(_.getString(0) == "fk_lineitem_orderkey").get.getLong(2) === li)
  }

  test("q110 detects injected violations through the REAL audit code") {
    // run constraintAudit itself against corrupted twins: 5 orphaned
    // out-of-range lineitems, a duplicated order key, an orphaned
    // order, and a null customer name must each surface in its check
    val base = Tables.lineitem(spark, sf).limit(20)
    val badLi = base.limit(5)
      .withColumn("l_orderkey", lit(-999L))
      .withColumn("l_discount", lit(1.5))
      .union(base)
    val ordBase = Tables.orders(spark, sf).limit(10)
    val badOrd = ordBase
      .union(ordBase.limit(1)) // duplicate key
      .union(ordBase.limit(1).withColumn("o_orderkey", lit(-7L))
        .withColumn("o_custkey", lit(-77L))) // orphaned order
    // full customer table so ordBase's FKs resolve — the ONLY orphan
    // must be the injected -77 order
    val badCust = Tables.customer(spark, sf)
      .union(Tables.customer(spark, sf).limit(1)
        .withColumn("c_custkey", lit(-1L))
        .withColumn("c_name", lit(null: String)))
    val got = graft.operators.Analytics
      .constraintAudit(spark, badLi, badOrd, badCust)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("range_lineitem_discount") === 5L)
    assert(got("fk_lineitem_orderkey") >= 5L, "injected orphans undetected")
    assert(got("unique_orders_orderkey") === 1L)
    assert(got("fk_orders_custkey") === 1L)
    assert(got("not_null_customer_name") === 1L)
  }

  test("q111 RFM codes partition users into balanced quartiles") {
    val rows = Analytics.q111(spark, sf).collect()
    val users = Tables.events(spark, sf).select(countDistinct("user_id")).head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === users, "segments lost users")
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(c => assert(c >= 1 && c <= 4))
    }
    // each single dimension's quartiles are balanced (ntile property)
    val byR = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(3)).sum)
    assert(byR.values.max - byR.values.min <= 1, s"recency quartiles unbalanced: $byR")
  }

  test("q112 winsorized mean is pulled toward the center and clamps ~10% of rows") {
    val rows = Analytics.q112(spark, sf).collect()
    rows.foreach { r =>
      val (n, clamped) = (r.getLong(1), r.getLong(2))
      // two 5% tails: ~10% of rows clamp (generous band for small groups)
      assert(clamped.toDouble / n > 0.02 && clamped.toDouble / n < 0.25,
        s"${r.getString(0)}: clamped $clamped of $n")
      // clamping both tails of a right-skewed price distribution moves
      // the mean; winsorized must differ from raw but stay in its range
      assert(r.getDouble(4) !== r.getDouble(3))
      assert(math.abs(r.getDouble(4) - r.getDouble(3)) < r.getDouble(3) * 0.2)
    }
  }

  test("q99 scrub conserves tokens and removes real mass") {
    val rows = Analytics.q99(spark, sf).collect()
    val raw = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === raw(r.getString(0)), "raw token count drifted")
      assert(r.getLong(2) < r.getLong(1), "stop list removed nothing")
      val mass = r.getDouble(4)
      assert(mass > 0.0 && mass < 1.0)
    }
  }

  test("q114 KL divergences match a local reference and satisfy Gibbs' inequality") {
    val rows = Analytics.q114(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // Local reference: smoothed unigram KL from raw token counts.
    val counts = Tables.documents(spark, sf)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sources = counts.keys.map(_._1).toSeq.distinct.sorted
    val vocab = counts.keys.map(_._2).toSeq.distinct
    val v = vocab.size
    val ntok = sources.map(s => s -> vocab.map(t => counts.getOrElse((s, t), 0L)).sum).toMap
    def p(s: String, t: String): Double =
      (counts.getOrElse((s, t), 0L) + 1.0) / (ntok(s) + v)
    assert(rows.size === sources.size * (sources.size - 1), "one row per ordered pair")
    rows.foreach { case ((a, b), kl) =>
      assert(a !== b)
      assert(kl >= 0.0, s"Gibbs violated for ($a,$b): $kl")
      val ref = vocab.map(t => p(a, t) * math.log(p(a, t) / p(b, t))).sum
      assert(math.abs(kl - ref) < 1e-5, s"($a,$b): engine $kl vs reference $ref")
    }
  }

  test("q113 BM25 top-k matches a local reference ranking") {
    val got = Corpus.queries("q113_bm25_retrieval")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val terms = Set("hash", "join", "scan")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t))).toMap
    val (k1, b) = (1.2, 0.75)
    val scored = docs.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val ts = terms.toSeq.filter(toks.contains).map { t =>
        val c = toks.count(_ == t).toDouble
        math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (c * (k1 + 1.0)) / (c + k1 * (1.0 - b + b * dl / avgdl))
      }
      // Round to the engine's 6-decimal output contract BEFORE
      // sorting: the engine orders by the ROUNDED score (doc_id ties),
      // so a reference sorted on raw doubles could legally disagree
      // on near-tie neighbors.
      (id, ts.size.toLong, math.floor(ts.sum * 1e6 + 0.5) / 1e6)
    }.filter(_._2 > 0)
      .sortBy { case (id, _, s) => (-s, id) }.take(got.length)
    got.zip(scored).foreach { case ((gid, gn, gs), (rid, rn, rs)) =>
      assert(gid === rid, s"rank order diverged: engine doc $gid vs reference $rid")
      assert(gn === rn)
      assert(math.abs(gs - rs) < 1e-5, s"doc $gid: engine $gs vs reference $rs")
    }
  }
}
