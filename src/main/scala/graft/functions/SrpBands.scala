package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the banded sign-random-projection
  * signature of a double vector — `["0110…", …]`, one bit-string per
  * band, bit j of band b = sign(⟨plane_{b·bits+j}, v⟩) — the SRP-LSH
  * stage shared by the embedding near-dup family (q37/q54, the
  * streaming twin) and the media near-dup operator (q172).
  *
  * Why native ([[CentroidScores]]' reason, the projection flavor):
  * the previous form unrolled one `dot_product` + CASE WHEN + concat
  * chain per plane into the generated method — bytecode linear in
  * the plane count, and at 64 planes past HotSpot's 8000-byte
  * huge-method limit, so every row paid interpreted-bytecode dots
  * (q172 measured ~5 s/run at sf0.1 from this alone). Here the ±1
  * plane matrix rides in the references array and the generated code
  * is one nested loop — constant bytecode size in the plane count.
  *
  * Determinism contract: each dot accumulates sequentially
  * left-to-right exactly as [[DotProduct]] does, and the bit is
  * `dot >= 0` — bit-for-bit the strings the unrolled form produced
  * and the DuckDB oracles' `list_inner_product(...) >= 0` replays.
  *
  * Null contract: NULL vector, length ≠ plane dim, or a NULL element
  * yields NULL (the family's readers exclude all three up front).
  */
case class SrpBands(child: Expression, planes: Seq[Seq[Double]], bandBits: Int)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  @transient private lazy val pmat: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val dim: Int = pmat.headOption.map(_.length).getOrElse(0)
  private def nBands: Int = planes.length / bandBits

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return null
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    val v = arr.toDoubleArray()
    SrpBands.pack(v, pmat, bandBits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val pRef = ctx.addReferenceObj("pmat", pmat, "double[][]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val nullScan =
        if (VectorNulls.mayContainNull(child, child))
          s"""for (int $i = 0; $i < $n && !${ev.isNull}; $i++)
             |  if ($arr.isNullAt($i)) ${ev.isNull} = true;""".stripMargin
        else ""
      s"""
         |int $n = $arr.numElements();
         |if ($n != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    double[] $v = $arr.toDoubleArray();
         |    ${ev.value} = graft.functions.SrpBands.pack($v, $pRef, $bandBits);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)

  override def prettyName: String = "srp_bands"
}

object SrpBands {
  /** The banding loop itself, shared by eval and codegen: per plane a
    * sequential dot (the [[DotProduct]] order), per band a bandBits
    * ASCII '0'/'1' string. */
  def pack(v: Array[Double], pmat: Array[Array[Double]], bandBits: Int): ArrayData = {
    val nBands = pmat.length / bandBits
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      val bits = new Array[Byte](bandBits)
      var j = 0
      while (j < bandBits) {
        val pl = pmat(b * bandBits + j)
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * pl(i); i += 1 }
        bits(j) = if (dot >= 0) '1'.toByte else '0'.toByte
        j += 1
      }
      out(b) = UTF8String.fromBytes(bits)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry: `posexplode(srp_bands(planes, bits, v))` is
    * the (band_idx, band_val) expansion the LSH candidate joins key
    * on. */
  def srp_bands(planes: Seq[Seq[Double]], bandBits: Int, v: Column): Column =
    Bridge.column(SrpBands(
      Bridge.expression(v.cast("array<double>")), planes, bandBits))
}
