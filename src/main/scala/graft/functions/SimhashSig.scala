package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the per-document 32-bit SimHash
  * signature in one row-local pass — `graft_simhash(text)` → bigint.
  *
  * Same structural motive as [[MinhashSig]]: the signature is a
  * per-document value (±1 bit-sums over raw token occurrences,
  * signature bit b set when the sum is ≥ 0), but the plan-level
  * formulation exploded tokens and reassembled per-doc rows with a
  * 32-aggregate groupBy — a corpus-wide shuffle for a row-local
  * computation. Here the token loop, the per-token md5, and all 32
  * bit counters run in one compiled eval per row; the candidate
  * stage's bucket join is then the FIRST shuffle of the operator.
  *
  * Bit-parity contract (spec-pinned against the explode+groupBy
  * formulation): tokens = `split(text, ' ')` with limit −1 semantics
  * (empty tokens kept — an empty token still hashes, matching
  * `explode(split(...))`); v = the md5's big-endian leading 32 bits;
  * occurrence b-bit vote = +1 when `(v >> (31−b)) & 1` else −1;
  * signature = Σ_b [sum_b ≥ 0]·2^b. NULL text → NULL. */
case class SimhashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return null
    val tokens = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    val sums = new Array[Int](32)
    val md = SimhashSig.digest.get()
    var i = 0
    while (i < tokens.length) {
      md.reset()
      val dig = md.digest(tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      var b = 0
      while (b < 32) {
        if (((v >> (31 - b)) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimhashSig {
  /** MD5 instances are not thread-safe and expressions may be shared
    * across tasks — one digest per thread. */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
