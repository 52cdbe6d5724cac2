package graft.extract

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass gazetteer scanner: normalization + word-level trie matching
  * (leftmost-longest, non-overlapping) + first-occurrence dedup, fused into
  * one O(len) pass — replaces the 60+-alternation regex, the per-element map
  * lookups and array_distinct of the column-expression path.
  *
  * Matching contract is IDENTICAL to Extractor.mentionIds (regex) and
  * OracleExtractor.mentions (word scanner); the three-way equivalence is
  * pinned by ExtractorSpec.
  */
object MentionScanner {

  /** Word-level trie node; entityId set on terminal nodes. */
  final class Node {
    val next = new mutable.HashMap[String, Node]()
    var entityId: String = _
  }

  val root: Node = {
    val r = new Node
    Gazetteer.aliasToId.foreach { case (alias, id) =>
      var n = r
      alias.split(' ').foreach { w => n = n.next.getOrElseUpdate(w, new Node) }
      n.entityId = id
    }
    r
  }

  private val maxWords: Int = Gazetteer.aliasToId.keys.map(_.count(_ == ' ') + 1).max

  /** Ordered distinct canonical entity ids mentioned in `text`. */
  def scan(text: UTF8String): ArrayData = {
    val norm = TextNorm.normalize(text.toString)
    val out = new java.util.ArrayList[Any](4)
    var seen: java.util.HashSet[String] = null
    val len = norm.length
    var i = 0
    while (i < len) {
      // i is at a word start (normalize() guarantees single spaces)
      var n = root
      var j = i
      var lastMatch: String = null
      var lastEnd = -1
      var words = 0
      var done = false
      while (!done && words < maxWords) {
        // find end of current word
        var e = j
        while (e < len && norm.charAt(e) != ' ') e += 1
        val w = norm.substring(j, e)
        val child = n.next.getOrElse(w, null)
        if (child == null) done = true
        else {
          n = child
          words += 1
          if (n.entityId != null) { lastMatch = n.entityId; lastEnd = e }
          if (e >= len) done = true else j = e + 1
        }
      }
      if (lastMatch != null) {
        if (seen == null) seen = new java.util.HashSet[String](8)
        if (seen.add(lastMatch)) out.add(UTF8String.fromString(lastMatch))
        i = lastEnd + 1
      } else {
        // advance past the current word
        var e = i
        while (e < len && norm.charAt(e) != ' ') e += 1
        i = e + 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Catalyst expression wrapping [[MentionScanner.scan]] — a real doGenCode
  * (single static call) keeps the projection inside whole-stage codegen,
  * unlike higher-order-function pipelines which fall back to interpretation.
  */
case class GazetteerMentions(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gazetteer_mentions"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gazetteer_mentions requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MentionScanner.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.extract.MentionScanner.scan($c)")

  override protected def withNewChildInternal(newChild: Expression): GazetteerMentions =
    copy(child = newChild)
}

object GazetteerMentions {
  def apply(c: Column): Column = Bridge.column(GazetteerMentions(Bridge.expression(c)))
}
