package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Sign-LSH bucket id (0 .. 2^planes - 1) of an `array<double>` vector as a
  * NATIVE codegen'd expression: bit p is set iff the dot product with the
  * deterministic integer hyperplane w_p(d) = ((p*37 + d*11) mod 13) - 6 is
  * strictly positive.
  *
  * The composed formulation (explode over planes -> HOF dot -> groupBy(id)
  * sum of bits) pays one SHUFFLE per bucket computation plus interpreted
  * lambdas; this expression is a map-only double loop inside the generated
  * stage — bit-exact with the composed path and the DuckDB oracle twin
  * (same d-ascending accumulation order per plane; a null element makes
  * that plane's dot product null, which contributes bit 0, matching
  * `when(dp > 0, ...)` on a null).
  */
case class SignLshBucket(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if planes >= 1 && planes <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"sign_lsh_bucket requires array<double> and 1 <= planes <= 62, got " +
          s"${child.dataType.catalogString} / planes=$planes")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    SignLshBucket.bucketOf(v, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLshBucket.bucketOf($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object SignLshBucket {
  /** Shared kernel for eval + generated code. */
  def bucketOf(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dp = 0.0
      var anyNull = false
      var d = 0
      while (d < n) {
        if (v.isNullAt(d)) { anyNull = true; d = n }
        else { dp += v.getDouble(d) * (((p * 37 + d * 11) % 13) - 6); d += 1 }
      }
      if (!anyNull && dp > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}
