package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-turn triple emission: mention scan (MentionScanner trie) plus
  * all four emission rules (rdf:type, consecutive-pair relations, discusses,
  * tool use) in ONE expression call per turn, returning the ordered
  * array<struct<subj,pred,obj>>. A single Generate(explode) downstream keeps
  * the whole extraction stage inside whole-stage codegen — the composed
  * column pipeline (regex + transform/zip_with/array HOFs) runs interpreted.
  *
  * Output order and content are contract-identical to Extractor's composed
  * path and OracleExtractor (pinned by ExtractorSpec).
  */
object TripleEmitter {

  private val RdfType = UTF8String.fromString("rdf:type")
  private val Discusses = UTF8String.fromString("d:discusses")
  private val Used = UTF8String.fromString("d:used")
  private val ToolRole = UTF8String.fromString("tool")
  private val ConvPrefix = "conv:"
  private val ToolPrefix = "tool:"

  // allocation-free lookups: entity id (interned UTF8String) -> type index;
  // type names and pair predicates pre-interned in flat arrays
  private val typeNames: Array[String] = Gazetteer.entities.map(_.etype).distinct.toArray
  private val typeNameU: Array[UTF8String] = typeNames.map(UTF8String.fromString)
  private val typeIdxOf: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    Gazetteer.byId.foreach { case (id, e) =>
      m.put(UTF8String.fromString(id), Integer.valueOf(typeNames.indexOf(e.etype)))
    }
    m
  }
  private val relPredU: Array[Array[UTF8String]] =
    typeNames.map(a => typeNames.map(b =>
      UTF8String.fromString(s"d:rel_${a.toLowerCase}_${b.toLowerCase}")))

  def emit(text: UTF8String, convId: UTF8String, role: UTF8String, tool: UTF8String): ArrayData = {
    val ments = MentionScanner.scan(text)
    val k = ments.numElements()
    val out = new java.util.ArrayList[Any](k * 2 + 2)
    var i = 0
    // (a) rdf:type per distinct entity, in order
    while (i < k) {
      val id = ments.getUTF8String(i)
      out.add(InternalRow(id, RdfType, typeNameU(typeIdxOf.get(id).intValue())))
      i += 1
    }
    // (b) consecutive-pair relations
    i = 0
    while (i < k - 1) {
      val a = ments.getUTF8String(i)
      val b = ments.getUTF8String(i + 1)
      out.add(InternalRow(a,
        relPredU(typeIdxOf.get(a).intValue())(typeIdxOf.get(b).intValue()), b))
      i += 1
    }
    // (c) discusses (first entity only)
    if (k > 0) {
      val conv = UTF8String.fromString(ConvPrefix + convId.toString)
      out.add(InternalRow(conv, Discusses, ments.getUTF8String(0)))
    }
    // (d) tool use
    if (role != null && role.equals(ToolRole) && tool != null && tool.numBytes() > 0) {
      val conv = UTF8String.fromString(ConvPrefix + convId.toString)
      out.add(InternalRow(conv, Used, UTF8String.fromString(ToolPrefix + tool.toString)))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

case class ExtractTriples(text: Expression, convId: Expression,
                          role: Expression, tool: Expression)
    extends QuaternaryExpression {

  override def first: Expression = text
  override def second: Expression = convId
  override def third: Expression = role
  override def fourth: Expression = tool

  override def dataType: DataType = ExtractTriples.schema
  override def nullable: Boolean = false
  override def prettyName: String = "extract_triples"

  override protected def nullSafeEval(t: Any, c: Any, r: Any, tl: Any): Any =
    TripleEmitter.emit(t.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], tl.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c, r, tl) =>
      s"graft.extract.TripleEmitter.emit($t, $c, $r, $tl)")

  override protected def withNewChildrenInternal(
      first: Expression, second: Expression, third: Expression, fourth: Expression): ExtractTriples =
    copy(text = first, convId = second, role = third, tool = fourth)
}

object ExtractTriples {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("subj", StringType, nullable = false),
    StructField("pred", StringType, nullable = false),
    StructField("obj", StringType, nullable = false))), containsNull = false)

  def apply(text: Column, convId: Column, role: Column, tool: Column): Column =
    Bridge.column(ExtractTriples(Bridge.expression(text), Bridge.expression(convId),
      Bridge.expression(role), Bridge.expression(tool)))
}
