package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.ArrayType

/** Shared helper for the vector-expression family
  * ([[DotProduct]] / [[CosineSimilarity]] / [[EuclideanDistance]]):
  * whether per-element null checks must be emitted in the generated
  * loop. When both inputs are `array<double>` with
  * `containsNull = false`, the checks are statically dead and the
  * codegen stays branch-free on the hot path. */
private[functions] object VectorNulls {
  def mayContainNull(left: Expression, right: Expression): Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })
}
