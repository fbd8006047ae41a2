package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: both Gopher-style intra-document
  * repetition fractions in one row-local pass —
  * `graft_repetition(text)` →
  * `struct<top_bigram_frac: double, dup_trigram_frac: double>`.
  *
  * Same structural motive as [[MinhashSig]]/[[SimhashSig]]: the
  * fractions are per-document values, but the plan-level formulation
  * exploded bigram and trigram positions separately (two corpus scans)
  * and reassembled per-doc ratios through two gram-keyed groupBys
  * (two shuffles of the gram stream) plus a join. Here one token walk
  * counts both gram multisets in per-row hash maps and emits the two
  * exact integer ratios — one scan, zero shuffles before whatever
  * aggregate the caller runs.
  *
  * Parity contract (spec-pinned against the plan formulation): tokens
  * = `split(text, ' ')` with limit −1 semantics; grams joined with a
  * single space; `top_bigram_frac` = max bigram count / bigram
  * occurrences, `dup_trigram_frac` = Σ counts ≥ 2 / trigram
  * occurrences — small-integer ratios, so the doubles are identical
  * on any engine. Documents with fewer than 3 tokens (either signal
  * undefined) return NULL, the caller's `isNotNull` filter matching
  * the plan form's `size(w) >= 3` gate. */
case class RepetitionSignals(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_trigram_frac", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return null
    val tokens = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (tokens.length < 3) return null
    def counts(n: Int): java.util.HashMap[String, Int] = {
      val m = new java.util.HashMap[String, Int]()
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
        m.merge(sb.toString, 1, Integer.sum)
        i += 1
      }
      m
    }
    val bi = counts(2)
    var biMax = 0
    var biTot = 0
    val itB = bi.values().iterator()
    while (itB.hasNext) {
      val c = itB.next()
      biTot += c
      if (c > biMax) biMax = c
    }
    val tri = counts(3)
    var triDup = 0
    var triTot = 0
    val itT = tri.values().iterator()
    while (itT.hasNext) {
      val c = itT.next()
      triTot += c
      if (c >= 2) triDup += c
    }
    new GenericInternalRow(Array[Any](
      biMax.toDouble / biTot, triDup.toDouble / triTot))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_repetition"
}
