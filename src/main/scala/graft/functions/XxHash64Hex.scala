package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-lowercase-hex-char XXH64(seed=0) digest of a string's UTF-8 bytes.
  *
  * Byte-parity target: the reference edgelist hashing
  * (`graph/building/edgelist.py:29-34` — `xxhash.xxh64(value).hexdigest()`),
  * anchor constant `xxh64_hex("<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")
  * == "ae98476863dc6ec5"` (`graph/measures/fernandez_et_al/typed_subjects_objects.py:11`).
  *
  * Spark's builtin `xxhash64` is seed-42 over internal-row encoding and is NOT
  * byte-equal; this expression reuses Spark's vetted XXH64 kernel with seed 0
  * directly over the UTF8String bytes, and stays inside whole-stage codegen.
  */
case class XxHash64Hex(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"xxh64_hex requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "xxh64_hex"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    XxHash64Hex.hexU(XXH64.hashUTF8String(s, 0L))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.XxHash64Hex.hexU(" +
        s"org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($c, 0L))")

  override protected def withNewChildInternal(newChild: Expression): XxHash64Hex =
    copy(child = newChild)
}

object XxHash64Hex {
  /** Driver/test-side convenience: digest of a plain Scala string. */
  def hexOf(s: String): String =
    hex(XXH64.hashUTF8String(UTF8String.fromString(s), 0L))

  private val HexDigits = "0123456789abcdef".getBytes

  /** Hot path: hex digest as UTF8String built from raw ASCII bytes — one
    * allocation instead of char[] + String + UTF-8 re-encode per call.
    */
  def hexU(v: Long): UTF8String = {
    val b = new Array[Byte](16)
    var i = 15
    var x = v
    while (i >= 0) { b(i) = HexDigits((x & 0xf).toInt); x >>>= 4; i -= 1 }
    UTF8String.fromBytes(b)
  }

  /** %016x without locale surprises; called from generated code too. */
  def hex(v: Long): String = {
    val out = new Array[Char](16)
    var i = 15
    var x = v
    while (i >= 0) { out(i) = Character.forDigit((x & 0xf).toInt, 16); x >>>= 4; i -= 1 }
    new String(out)
  }
}

/** Column-level entry points for graft's custom expressions. */
object gfunctions {
  /** lodcc-parity vertex/edge hash (see [[XxHash64Hex]]). */
  def xxh64_hex(c: Column): Column = Bridge.column(XxHash64Hex(Bridge.expression(c)))

  /** Hash of the rdf:type predicate token, `typed_subjects_objects.py:11`. */
  val RdfTypeHash = "ae98476863dc6ec5"
  val RdfTypeToken = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
}
