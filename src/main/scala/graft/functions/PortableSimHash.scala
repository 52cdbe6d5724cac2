package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash of a token array under the engine's portable hash convention
  * (md5-prefix, see `TextOps.portableHash64`), as a NATIVE codegen'd
  * expression: bit j of the result is set iff Σ_tokens (2·bit_j(h(tok))−1)
  * is > 0, h = the top `bits` bits of md5 (bits ≤ 60 = 15 hex chars).
  *
  * The composed formulation explodes tokens × bits rows (a 60× blow-up)
  * through TWO aggregations; this expression is one map-only pass per
  * document — same math bit-for-bit (the DuckDB oracle twin parses the same
  * 15-hex-char prefix), null tokens skipped like an exploded null row
  * group would be.
  */
case class PortableSimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits >= 1 && bits <= 60 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"portable_simhash requires array<string> and 1 <= bits <= 60, got " +
          s"${child.dataType.catalogString} / bits=$bits")
  }

  override def nullSafeEval(input: Any): Any =
    PortableSimHash.simhashOf(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableSimHash.simhashOf($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash =
    copy(child = newChild)
}

object PortableSimHash {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes) — numerically equal to parsing the first 15
    * hex chars of the digest (the portable-hash convention): the first 8
    * digest bytes big-endian, unsigned-shifted right by one nibble.
    */
  def portableHash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Shared kernel for eval + generated code. */
  def simhashOf(toks: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = portableHash60(toks.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) out |= 1L << j; j += 1 }
    out
  }
}
