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
