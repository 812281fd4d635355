package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline

/** Property-based checks (SURVEY.md §5.3): algebraic invariants that
  * must hold for arbitrary inputs, not just the fixtures. Spark-backed
  * properties use few trials with small data (each trial is a job);
  * pure-function properties use ScalaCheck defaults. */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get

  private def check(prop: Prop, trials: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  test("GeoMean: any buffer split merges to the sequential result (mergeability)") {
    import graft.functions.GeoMean
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.choose(1e-3, 1e6))
      k <- Gen.choose(0, xs.length)
    } yield (xs, k)
    check(Prop.forAll(gen) { case (xs, k) =>
      val (l, r) = xs.splitAt(k)
      val seqBuf = xs.foldLeft(GeoMean.zero)(GeoMean.reduce)
      val merged = GeoMean.merge(
        l.foldLeft(GeoMean.zero)(GeoMean.reduce),
        r.foldLeft(GeoMean.zero)(GeoMean.reduce))
      val a = GeoMean.finish(seqBuf)
      val b = GeoMean.finish(merged)
      math.abs(a - b) <= 1e-9 * math.max(math.abs(a), 1.0)
    })
  }

  test("GeoMean: equals exp(mean(ln x)) on positive inputs") {
    import graft.functions.GeoMean
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(1e-3, 1e6))) { xs =>
      val got = GeoMean.finish(xs.foldLeft(GeoMean.zero)(GeoMean.reduce))
      val want = math.exp(xs.map(math.log).sum / xs.length)
      math.abs(got - want) <= 1e-9 * math.max(want, 1.0)
    })
  }

  test("OracleRound.floorRound: within half-step of x, idempotent, and monotone") {
    import graft.functions.OracleRound
    import org.apache.spark.sql.functions.lit
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.choose(0.0, 1e6))
      k <- Gen.choose(0, 6)
    } yield (xs, k)
    check(Prop.forAll(gen) { case (xs, k) =>
      import spark.implicits._
      val rounded = xs.toDF("x")
        .select(OracleRound.floorRound($"x", k).as("r"), $"x")
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      val step = math.pow(10.0, -k)
      rounded.forall { case (r, x) =>
        math.abs(r - x) <= step / 2 + step * 1e-9 && // within half step
          (math.floor(r * math.pow(10.0, k) + 0.5) / math.pow(10.0, k)) == r // idempotent
      }
    }, trials = 8)
  }

  test("TopKByPrice: any merge tree equals the top-k of the full list") {
    import graft.functions.{KeyedPrice, TopKByPrice}
    val agg = TopKByPrice(3)
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0.0, 1e5)))
      k <- Gen.choose(0, xs.length)
    } yield (xs.map { case (id, p) => KeyedPrice(1L, id, p) }, k)
    check(Prop.forAll(gen) { case (xs, k) =>
      val (l, r) = xs.splitAt(k)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val direct = xs.sortBy(x => (-x.price, x.key)).take(3)
      agg.finish(merged) == direct
    })
  }

  test("BoundedDocSet: any merge tree gives the complete sorted set iff df ≤ cap, else overflow proof") {
    import graft.functions.BoundedDocSet
    val cap = 5
    val agg = new BoundedDocSet(cap)
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.choose(0L, 12L)) // small domain → frequent dups + overflows
      k <- Gen.choose(0, xs.length)
    } yield (xs, k)
    check(Prop.forAll(gen) { case (xs, k) =>
      val (l, r) = xs.splitAt(k)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      val distinct = xs.distinct.sorted
      if (distinct.length <= cap)
        merged == distinct // complete + sorted: the df-cutoff keep case
      else
        merged.length == cap + 1 && // overflow proof: caller drops the bucket
          merged == distinct.take(cap + 1) // deterministic (smallest ids)
    })
  }

  test("BPE doubled-separator replace ≡ explicit greedy left-to-right merge on arbitrary symbol sequences") {
    // The q167/q169 merge trick's core claim, pinned beyond the real-
    // token replay specs: for ANY space-free symbol sequence and ANY
    // merge pair, one doubled-separator replace pass (Java's
    // String.replace has the engines' leftmost-non-overlapping,
    // continue-after-replacement semantics) equals the textbook
    // greedy merge. The generator leans on adversarial shapes: self-
    // pairs over runs ("a a a"), adjacent overlapping matches
    // ("a b a b"), and symbols that are concatenations of others
    // ("ab", "aa" — substring-collision bait for the pattern).
    val alphabet = Seq("a", "b", "c", "ab", "aa", "ba", "abb")
    val gen = for {
      syms <- Gen.nonEmptyListOf(Gen.oneOf(alphabet))
      a <- Gen.oneOf(alphabet)
      b <- Gen.oneOf(alphabet)
    } yield (syms, a, b)
    def mergeGreedy(s: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = s
      while (rest.nonEmpty) rest match {
        case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil => ()
      }
      out.toList
    }
    def mergeReplace(s: List[String], a: String, b: String): List[String] = {
      val doubled = "  " + s.mkString(" ").replace(" ", "  ") + "  "
      val merged = doubled.replace(" " + a + "  " + b + " ", " " + a + b + " ")
      merged.replace("  ", " ").trim.split(" ").toList
    }
    check(Prop.forAll(gen) { case (syms, a, b) =>
      mergeReplace(syms, a, b) == mergeGreedy(syms, a, b)
    }, trials = 500)
  }

  test("Similarity.dec18 ≡ Spark's double→DECIMAL(38,18) cast for arbitrary doubles") {
    // q171's driver algebra stands on dec18 replicating the engine
    // cast exactly; pin it against Spark's own Decimal implementation
    // rather than trusting the scaladoc's account of it. The DuckDB
    // half of the contract (its cast is a double-scaled round, NOT
    // this recipe — agreeing only within ~2^-52 relative, absorbed by
    // the <= 9-digit output rounding) is pinned by
    // `dev/check.py --dec18-probe` via graft.Dec18Probe.
    val gen = Gen.oneOf(
      Gen.choose(-1e6, 1e6),
      Gen.choose(-1.0, 1.0),
      Gen.choose(-1e-10, 1e-10),
      Gen.oneOf(0.0, -0.0, 0.1, 1.0 / 3.0, math.Pi, 1e-18, -1e-18))
    check(Prop.forAll(gen) { x =>
      val d = org.apache.spark.sql.types.Decimal(x)
      val ok = d.changePrecision(38, 18)
      ok && d.toJavaBigDecimal.compareTo(graft.operators.Similarity.dec18(x)) == 0
    }, trials = 500)
  }

  test("StubCodec: decode is a pure function of the payload bytes") {
    import graft.operators.{MediaBlob, Multimodal}
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val blob = MediaBlob(1L, bytes.toArray, "src")
      val a = Multimodal.StubCodec.decode(blob)
      val b = Multimodal.StubCodec.decode(MediaBlob(1L, bytes.toArray, "other"))
      a.width == b.width && a.height == b.height && a.n_frames == b.n_frames &&
        a.width >= 0 && a.width <= 255 && a.height >= 0 && a.height <= 255 &&
        a.n_frames >= 1 && a.n_frames <= 30 && a.n_bytes == bytes.length
    })
  }

  test("pipeline: mapLocalParallel output multiset is invariant to lane count (blow's lane routing)") {
    import spark.implicits._
    val gen = for {
      xs <- Gen.listOfN(30, Gen.choose(-100, 100))
      lanes <- Gen.choose(1, 6)
    } yield (xs, lanes)
    check(Prop.forAll(gen) { case (xs, lanes) =>
      val base = Pipeline.generatorSource(spark, xs)
        .mapLocal(x => Seq(x, x * 2)).ds.collect().sorted.toSeq
      val par = Pipeline.generatorSource(spark, xs)
        .mapLocalParallel(x => Seq(x, x * 2), lanes)(identity)
        .ds.collect().sorted.toSeq
      base == par
    }, trials = 8)
  }

  test("exact dedup is idempotent: dropDuplicates ∘ dropDuplicates ≡ dropDuplicates") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(50, Gen.choose(0, 10))) { xs =>
      val df = xs.toDF("v")
      val once = df.dropDuplicates("v").collect().map(_.getInt(0)).sorted.toSeq
      val twice = df.dropDuplicates("v").dropDuplicates("v")
        .collect().map(_.getInt(0)).sorted.toSeq
      once == twice && once == xs.distinct.sorted
    }, trials = 8)
  }
}
