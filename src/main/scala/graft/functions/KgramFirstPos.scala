package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every k-token-window md5 of a document
  * with the position of its FIRST occurrence, in ONE row-local pass —
  * `graft_kgram_first_pos(text, k)` → `array<struct<g: string, i: int>>`
  * (first-occurrence order; consumers are order-insensitive).
  *
  * Same rationale as [[MinhashSig]]: the (gram, first-position) map is
  * a PER-DOCUMENT value, but the expression-convenient formulation
  * (explode window starts → md5 → groupBy(doc, gram) min(position))
  * pays a corpus-wide shuffle of the full gram stream just to collapse
  * occurrences that were row-local all along. This expression removes
  * that shuffle: the exploded index frame of Dedup.substringRunCandidates
  * becomes a pure projection of the input.
  *
  * Bit-parity contract (spec-pinned against the explode+groupBy
  * formulation): tokens = `split(text, ' ')` with Spark's limit −1
  * semantics; gram text = `concat_ws(' ', w[i..i+k−1])`; md5 =
  * lowercase hex over UTF-8 bytes; dedup by the md5 STRING. Documents
  * with fewer than `k` tokens return NULL (explode then yields no
  * rows — the old `size(w) >= k` gate). */
case class KgramFirstPos(text: Expression, k: Expression)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = k

  override def checkInputDataTypes(): TypeCheckResult = {
    val kOk = k.foldable && k.dataType == IntegerType && k.eval() != null &&
      k.eval().asInstanceOf[Int] >= 1 && k.eval().asInstanceOf[Int] <= 64
    if (text.dataType == StringType && kOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int literal in [1,64]), " +
        s"got ${text.dataType.sql}, ${k.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("i", IntegerType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  private lazy val n: Int = k.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val t = text.eval(input)
    if (t == null) return null
    val tokens = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (tokens.length < n) return null
    val md = KgramFirstPos.digest.get()
    val seen = new java.util.LinkedHashMap[String, Int]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      md.reset()
      val hex = KgramFirstPos.toHex(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      if (!seen.containsKey(hex)) seen.put(hex, i)
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.entrySet().iterator()
    var s = 0
    while (it.hasNext) {
      val e = it.next()
      out(s) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, k = newRight)

  override def prettyName: String = "graft_kgram_first_pos"
}

object KgramFirstPos {
  /** MD5 instances are not thread-safe and expressions may be shared
    * across tasks — one digest per thread. */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(dig: Array[Byte]): String = {
    val out = new Array[Char](dig.length * 2)
    var i = 0
    while (i < dig.length) {
      out(i * 2) = hexChars((dig(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
