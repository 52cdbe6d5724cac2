package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NATIVE codegen'd kernels for the portable-hash MinHash family.
  *
  * The composed formulation — `transform(idx, i -> portableHash31(
  * array_join(slice(toks, i+1, k), " ")))` followed by k
  * `array_min(transform(hs, h -> (a·h+b) % P))` passes — evaluates every
  * element through Catalyst's INTERPRETED lambda path (higher-order
  * functions are CodegenFallback), costing ~10 ms/row at a few hundred
  * shingles and multiplying by every plan branch that re-inlines the
  * projection. These expressions compute the identical values in one
  * compiled loop per row (guide §4: prefer codegen'd expressions in the
  * hot path); the DuckDB oracle twins are unchanged because the math is
  * bit-for-bit the same 15-hex-char md5 prefix convention
  * (`TextOps.portableHash31`).
  */
object PortableMinhash {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** md5-prefix 31-bit hash of raw bytes: first 60 bits of the digest
    * (== parsing the first 15 hex chars, `conv(substring(md5(x),1,15),16,10)`)
    * masked to 31 bits — numerically identical to `TextOps.portableHash31`.
    */
  private def hash31(d: MessageDigest): Long = {
    val h = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v >>> 4) & 0x7fffffffL
  }

  /** Distinct (first-occurrence order, mirroring `array_distinct`)
    * 31-bit hashes of the k-token shingles of `toks`, shingle text =
    * `array_join(slice(toks, i+1, k), " ")`. n < k ⇒ empty array —
    * the same value the composed `transform(CASE WHEN size >= k ...)`
    * produces. Null tokens are skipped exactly as `array_join` skips them.
    */
  def tokenShingles31(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val d = md5.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    val space = Array[Byte](' ')
    var i = 0
    while (i <= n - k) {
      d.reset()
      var j = 0
      var first = true
      while (j < k) {
        if (!toks.isNullAt(i + j)) {
          if (!first) d.update(space)
          d.update(toks.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      val h = hash31(d)
      if (seen.add(h)) out.add(h)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct (first-occurrence order) 31-bit hashes of the k-char
    * shingles of `s`; a string shorter than k chars contributes the single
    * shingle `substr(1, k)` == the whole string — the same value the
    * composed `CASE WHEN length >= k THEN sequence(...) ELSE array(1)`
    * index form produces.
    */
  def charShingles31(s: UTF8String, k: Int): ArrayData = {
    val d = md5.get()
    val n = s.numChars()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    val last = if (n >= k) n - k else 0
    var i = 0
    while (i <= last) {
      d.reset()
      d.update(s.substring(i, i + k).getBytes)
      val h = hash31(d)
      if (seen.add(h)) out.add(h)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** The MinHash signature over a 31-bit hash array: element j is
    * `min over h of (a_j·h + b_j) % p` — identical to
    * `array_min(transform(hs, h -> (a·h+b) % p))` per coefficient,
    * including the empty-input case (null element, as `array_min([])`).
    * Products stay < 2^51 for a < 2^20 and 31-bit h — no overflow.
    */
  def sigsOf(hs: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val k = as.length
    val n = hs.numElements()
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }
}

/** `array<string>` tokens → `array<long>` distinct k-token-shingle hashes. */
case class TokenShingleHash31(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hash31"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"token_shingle_hash31 requires array<string>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PortableMinhash.tokenShingles31(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableMinhash.tokenShingles31($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingleHash31 =
    copy(child = newChild)
}

/** `string` → `array<long>` distinct k-char-shingle hashes. */
case class CharShingleHash31(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_shingle_hash31"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hash31 requires string, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PortableMinhash.charShingles31(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableMinhash.charShingles31($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHash31 =
    copy(child = newChild)
}

/** `array<long>` hashes → `array<long>` the per-coefficient minima
  * (the MinHash signature). Coefficients ride the expression so the plan
  * canonicalizes/compares them structurally.
  */
case class MinhashSigs(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.nonEmpty && as.length == bs.length, "need matching coefficient lists")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<long>, got ${child.dataType.catalogString}")
  }

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def nullSafeEval(input: Any): Any =
    PortableMinhash.sigsOf(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableMinhash.sigsOf($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}
