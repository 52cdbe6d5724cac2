package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}

/** All index-ordered element pairs (xs[i], xs[j]) with i < j of a string
  * array, as `array<struct<a, b>>` — the NATIVE codegen twin of the nested
  * `transform(xs, (x, i) -> transform(slice(xs, i+2, size(xs)), y ->
  * struct(x, y)))` + `flatten` chain (CodegenFallback lambdas that evaluate
  * interpreted per emitted pair — the dominant per-row cost of wedge/
  * co-occurrence pair generation). On a sorted input the pairs come out
  * value-ordered, exactly like the composed form. Null elements are
  * emitted as-is (the callers' arrays are null-free by construction).
  */
case class ArrayPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", StringType), StructField("b", StringType))),
    containsNull = false)
  override def prettyName: String = "array_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"array_pairs requires array<string>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ArrayPairs.pairsOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayPairs.pairsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): ArrayPairs =
    copy(child = newChild)
}

object ArrayPairs {
  /** Shared kernel for eval + generated code. */
  def pairsOf(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = if (xs.isNullAt(i)) null else xs.getUTF8String(i)
      var j = i + 1
      while (j < n) {
        val b = if (xs.isNullAt(j)) null else xs.getUTF8String(j)
        out(k) = InternalRow(a, b)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
