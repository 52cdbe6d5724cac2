package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding k-token shingle TEXTS of a token array, each shingle joined by
  * `sep` — the NATIVE codegen twin of
  * `transform(sequence(0, n-k), i -> array_join(slice(toks, i+1, k), sep))`
  * (a CodegenFallback lambda chain that evaluates interpreted per element).
  * n < k ⇒ empty array, mirroring the composed
  * `CASE WHEN size >= k ... ELSE [] END` form; null tokens are skipped the
  * way `array_join` skips them (element and its delimiter omitted).
  */
case class TokenShingles(child: Expression, k: Int, sep: String)
    extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"token_shingles requires array<string>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenShingles.shinglesOf(input.asInstanceOf[ArrayData], k,
      UTF8String.fromString(sep))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("shingleSep",
      UTF8String.fromString(sep), "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenShingles.shinglesOf($c, $k, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

object TokenShingles {
  /** Shared kernel for eval + generated code. */
  def shinglesOf(toks: ArrayData, k: Int, sep: UTF8String): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      // join toks[i..i+k-1] with sep, skipping nulls like array_join
      val parts = new java.util.ArrayList[UTF8String](k)
      var j = 0
      while (j < k) {
        if (!toks.isNullAt(i + j)) parts.add(toks.getUTF8String(i + j))
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts.toArray(new Array[UTF8String](parts.size())): _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
