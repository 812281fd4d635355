package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the per-row centroid score array the
  * IVF/k-means family's narrow argmin/argmax assignment reduces —
  * `[(score, c_id), …]` over a TRAINED centroid table, score =
  * −cosine ("the best cell first" under struct ordering) or L2
  * distance.
  *
  * Why this exists (scale-aware nlist fallout, r11): the previous
  * form — `array(struct(cosine_sim(lit(cv₀), v), 0), struct(…), …)` —
  * UNROLLS one full cosine loop per centroid into the generated
  * method, so its bytecode size grows linearly with nlist. At the
  * fixed k = 8 that was ~2.5 KB and JIT-compiled; at the scale-aware
  * nlist(2000) = 32 it crossed HotSpot's 8000-byte huge-method limit
  * (measured maxMethodCodeSize 10254), the JIT silently refused the
  * method, and every corpus row paid INTERPRETED-bytecode cosines —
  * q30's serve cell regressed 0.39 s → 1.4 s with ¼ of the flops of
  * this loop form. Here the centroid matrix rides in the references
  * array (`double[][]` + `long[]`, the broadcast-literal posture) and
  * the generated code is ONE doubly-nested loop — constant bytecode
  * size in nlist, JIT-friendly at any cell count up to the
  * [[graft.operators.Similarity.ivfNlist]] cap.
  *
  * Determinism contract: per centroid the score is computed by the
  * IDENTICAL sequential loop as [[CosineSimilarity]] /
  * [[EuclideanDistance]] (dot/norms resp. Σd² accumulate
  * left-to-right, one sqrt at the end, negation as a final sign
  * flip), so scores — and therefore every argmin assignment and its
  * oracle comparison — are bit-for-bit what the unrolled per-centroid
  * expressions produced.
  *
  * Null contract: a NULL vector, a length≠dim vector, or a NULL
  * element yields NULL (the family's readers exclude all three up
  * front; this mirrors the binary expressions' posture).
  */
case class CentroidScores(child: Expression,
    cents: Seq[(Long, Seq[Double])], negCosine: Boolean)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${other.catalogString}")
  }

  private def scoreField: String = if (negCosine) "negcos" else "dist"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField(scoreField, DoubleType, nullable = false),
    StructField("c_id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  @transient private lazy val cmat: Array[Array[Double]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val cids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val dim: Int = cmat.headOption.map(_.length).getOrElse(0)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return null
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    val v = arr.toDoubleArray()
    val k = cmat.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cmat(c)
      if (negCosine) {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < n) {
          val xi = cv(i); val yi = v(i)
          dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
        }
        scores(c) = -(dot / (math.sqrt(nx) * math.sqrt(ny)))
      } else {
        var acc = 0.0; var i = 0
        while (i < n) {
          val d = cv(i) - v(i)
          acc += d * d; i += 1
        }
        scores(c) = math.sqrt(acc)
      }
      c += 1
    }
    CentroidScores.pack(scores, cids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mRef = ctx.addReferenceObj("cmat", cmat, "double[][]")
      val idRef = ctx.addReferenceObj("cids", cids, "long[]")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val sc = ctx.freshName("sc")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullScan =
        if (VectorNulls.mayContainNull(child, child))
          s"""for (int $i = 0; $i < $n && !${ev.isNull}; $i++)
             |  if ($arr.isNullAt($i)) ${ev.isNull} = true;""".stripMargin
        else ""
      val body =
        if (negCosine)
          s"""double $dot = 0.0, $nx = 0.0, $ny = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $xi = $cv[$i]; double $yi = $v[$i];
             |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
             |}
             |$sc[$c] = -($dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny)));""".stripMargin
        else
          s"""double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $d = $cv[$i] - $v[$i];
             |  $acc += $d * $d;
             |}
             |$sc[$c] = java.lang.Math.sqrt($acc);""".stripMargin
      s"""
         |int $n = $arr.numElements();
         |if ($n != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    double[] $v = $arr.toDoubleArray();
         |    double[] $sc = new double[${cmat.length}];
         |    for (int $c = 0; $c < ${cmat.length}; $c++) {
         |      double[] $cv = $mRef[$c];
         |      $body
         |    }
         |    ${ev.value} = graft.functions.CentroidScores.pack($sc, $idRef);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidScores =
    copy(child = newChild)

  override def prettyName: String =
    if (negCosine) "centroid_negcos_scores" else "centroid_l2_scores"
}

/** Native argmin / arg-top-2 over the trained centroid table — the
  * reduction of [[CentroidScores]] fused INTO the scoring loop.
  *
  * Why this exists (r12): `array_min(centroid_scores(...))` first
  * materializes k (score, c_id) structs per row (a GenericArrayData of
  * k GenericInternalRows — 2k boxed values) and then reduces them; at
  * the sf1 decade's nlist = 313 that is ~6.4 M transient objects per
  * 10k-row pass, and the training loop (q77) runs the pass per
  * iteration — allocation, not arithmetic, dominated the profile. This
  * expression tracks the running best (and optionally second-best)
  * score/id pair in locals and allocates exactly one struct (or one
  * 2-struct array) per row — constant in k.
  *
  * Selection contract — bit-identical to `array_min` of the scores
  * array (and to sorted[0], sorted[1] of `array_sort`): candidates
  * compare by (score, c_id) lexicographically, score under SQL double
  * ordering = java.lang.Double.compare (-0.0 < 0.0, NaN greatest).
  * Scores come from the IDENTICAL sequential loops as
  * [[CentroidScores]], so every selected pair — and every oracle
  * comparison downstream — is unchanged.
  *
  * Null contract: identical to [[CentroidScores]] (NULL vector,
  * length ≠ dim, or a NULL element ⇒ NULL). `top2` with k = 1 emits a
  * 1-element array — `el[1]` then reads NULL, matching the previous
  * array_min-over-empty-filter form.
  */
case class CentroidBest(child: Expression,
    cents: Seq[(Long, Seq[Double])], negCosine: Boolean, top2: Boolean)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${other.catalogString}")
  }

  private def scoreField: String = if (negCosine) "negcos" else "dist"

  private def entryType: StructType = StructType(Seq(
    StructField(scoreField, DoubleType, nullable = false),
    StructField("c_id", LongType, nullable = false)))

  override def dataType: DataType =
    if (top2) ArrayType(entryType, containsNull = false) else entryType

  override def nullable: Boolean = true

  @transient private lazy val cmat: Array[Array[Double]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val cids: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val dim: Int = cmat.headOption.map(_.length).getOrElse(0)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return null
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    val v = arr.toDoubleArray()
    val k = cmat.length
    var b1 = 0.0; var i1 = 0L; var b2 = 0.0; var i2 = 0L; var has2 = false
    var c = 0
    while (c < k) {
      val cv = cmat(c)
      var s = 0.0
      if (negCosine) {
        var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
        while (i < n) {
          val xi = cv(i); val yi = v(i)
          dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
        }
        s = -(dot / (math.sqrt(nx) * math.sqrt(ny)))
      } else {
        var acc = 0.0; var i = 0
        while (i < n) {
          val d = cv(i) - v(i)
          acc += d * d; i += 1
        }
        s = math.sqrt(acc)
      }
      val id = cids(c)
      if (c == 0) { b1 = s; i1 = id }
      else {
        val cmp = java.lang.Double.compare(s, b1)
        if (cmp < 0 || (cmp == 0 && id < i1)) {
          b2 = b1; i2 = i1; has2 = true; b1 = s; i1 = id
        } else {
          val cmp2 = if (has2) java.lang.Double.compare(s, b2) else -1
          if (!has2 || cmp2 < 0 || (cmp2 == 0 && id < i2)) {
            b2 = s; i2 = id; has2 = true
          }
        }
      }
      c += 1
    }
    if (top2) CentroidBest.pack2(b1, i1, b2, i2, has2)
    else InternalRow(b1, i1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mRef = ctx.addReferenceObj("cmat", cmat, "double[][]")
      val idRef = ctx.addReferenceObj("cids", cids, "long[]")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val s = ctx.freshName("s")
      val id = ctx.freshName("id")
      val b1 = ctx.freshName("b1")
      val i1 = ctx.freshName("i1")
      val b2 = ctx.freshName("b2")
      val i2 = ctx.freshName("i2")
      val has2 = ctx.freshName("has2")
      val cmp = ctx.freshName("cmp")
      val cmp2 = ctx.freshName("cmp2")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullScan =
        if (VectorNulls.mayContainNull(child, child))
          s"""for (int $i = 0; $i < $n && !${ev.isNull}; $i++)
             |  if ($arr.isNullAt($i)) ${ev.isNull} = true;""".stripMargin
        else ""
      val scoreBody =
        if (negCosine)
          s"""double $dot = 0.0, $nx = 0.0, $ny = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $xi = $cv[$i]; double $yi = $v[$i];
             |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
             |}
             |$s = -($dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny)));""".stripMargin
        else
          s"""double $acc = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $d = $cv[$i] - $v[$i];
             |  $acc += $d * $d;
             |}
             |$s = java.lang.Math.sqrt($acc);""".stripMargin
      val result =
        if (top2)
          s"${ev.value} = graft.functions.CentroidBest.pack2($b1, $i1, $b2, $i2, $has2);"
        else
          s"${ev.value} = graft.functions.CentroidBest.pack1($b1, $i1);"
      s"""
         |int $n = $arr.numElements();
         |if ($n != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    double[] $v = $arr.toDoubleArray();
         |    double $b1 = 0.0; long $i1 = 0L;
         |    double $b2 = 0.0; long $i2 = 0L; boolean $has2 = false;
         |    for (int $c = 0; $c < ${cmat.length}; $c++) {
         |      double[] $cv = $mRef[$c];
         |      double $s;
         |      $scoreBody
         |      long $id = $idRef[$c];
         |      if ($c == 0) { $b1 = $s; $i1 = $id; }
         |      else {
         |        int $cmp = java.lang.Double.compare($s, $b1);
         |        if ($cmp < 0 || ($cmp == 0 && $id < $i1)) {
         |          $b2 = $b1; $i2 = $i1; $has2 = true; $b1 = $s; $i1 = $id;
         |        } else {
         |          int $cmp2 = $has2 ? java.lang.Double.compare($s, $b2) : -1;
         |          if (!$has2 || $cmp2 < 0 || ($cmp2 == 0 && $id < $i2)) {
         |            $b2 = $s; $i2 = $id; $has2 = true;
         |          }
         |        }
         |      }
         |    }
         |    $result
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CentroidBest =
    copy(child = newChild)

  override def prettyName: String = (negCosine, top2) match {
    case (true, true) => "centroid_negcos_best2"
    case (true, false) => "centroid_negcos_best"
    case (false, true) => "centroid_l2_best2"
    case (false, false) => "centroid_l2_best"
  }
}

object CentroidBest {
  /** Driver-side twin of the l2 argmin: index of the best centroid
    * under (dist ASC, c_id ASC), scores by the IDENTICAL sequential
    * Σd² + one-sqrt loop and ties by the IDENTICAL
    * java.lang.Double.compare rule as [[CentroidBest.nullSafeEval]] /
    * its generated code. Used by the bounded in-driver Lloyd trainer
    * ([[graft.operators.Similarity]]); CentroidBestParitySpec pins
    * this helper against the expression over adversarial inputs so
    * the two can never drift. */
  def bestL2Index(cmat: Array[Array[Double]], cids: Array[Long], v: Array[Double]): Int = {
    var bi = 0
    var b1 = 0.0
    var c = 0
    while (c < cmat.length) {
      val cv = cmat(c)
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        val d = cv(i) - v(i)
        acc += d * d
        i += 1
      }
      val s = math.sqrt(acc)
      if (c == 0) { b1 = s; bi = 0 }
      else {
        val cmp = java.lang.Double.compare(s, b1)
        if (cmp < 0 || (cmp == 0 && cids(c) < cids(bi))) { b1 = s; bi = c }
      }
      c += 1
    }
    bi
  }

  /** One (score, c_id) struct — eval/codegen shared packing. */
  def pack1(s: Double, id: Long): InternalRow = InternalRow(s, id)

  /** The best and (when k ≥ 2) second-best structs, in rank order —
    * ≡ slice(array_sort(scores), 1, 2). */
  def pack2(b1: Double, i1: Long, b2: Double, i2: Long, has2: Boolean): ArrayData =
    if (has2) new GenericArrayData(Array[Any](InternalRow(b1, i1), InternalRow(b2, i2)))
    else new GenericArrayData(Array[Any](InternalRow(b1, i1)))

  /** Nearest cell under (dist ASC, c_id ASC) — ≡ array_min of
    * [[CentroidScores.centroid_l2]]. */
  def centroid_l2_best(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    Bridge.column(CentroidBest(
      Bridge.expression(v.cast("array<double>")), cents, negCosine = false, top2 = false))

  /** Best cell under (negcos ASC, c_id ASC) — ≡ array_min of
    * [[CentroidScores.centroid_negcos]]. */
  def centroid_negcos_best(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    Bridge.column(CentroidBest(
      Bridge.expression(v.cast("array<double>")), cents, negCosine = true, top2 = false))

  /** Two nearest cells under (dist ASC, c_id ASC), rank order. */
  def centroid_l2_best2(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    Bridge.column(CentroidBest(
      Bridge.expression(v.cast("array<double>")), cents, negCosine = false, top2 = true))

  /** Two best cells under (negcos ASC, c_id ASC), rank order. */
  def centroid_negcos_best2(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    Bridge.column(CentroidBest(
      Bridge.expression(v.cast("array<double>")), cents, negCosine = true, top2 = true))
}

object CentroidScores {
  /** Builds the (score, c_id) struct array the generated loop fills —
    * shared by eval and codegen so the packing is defined once. */
  def pack(scores: Array[Double], ids: Array[Long]): ArrayData = {
    val rows = new Array[Any](scores.length)
    var i = 0
    while (i < rows.length) {
      rows(i) = InternalRow(scores(i), ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** `[(−cosine(cᵢ, v), c_idᵢ), …]` — array_min of it is the best
    * cell under (negcos ASC, c_id ASC), the q30/q132 assignment. */
  def centroid_negcos(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    Bridge.column(CentroidScores(
      Bridge.expression(v.cast("array<double>")), cents, negCosine = true))

  /** `[(l2(cᵢ, v), c_idᵢ), …]` — array_min of it is the nearest
    * cell under (dist ASC, c_id ASC), the Lloyd/maintenance argmin. */
  def centroid_l2(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    Bridge.column(CentroidScores(
      Bridge.expression(v.cast("array<double>")), cents, negCosine = false))
}
