package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local span-cover machinery for exact-substring dedup
  * ([[graft.ops.Dedup.dedupSubstrings]], round 19).
  *
  * Given a document's token array and the ASCENDING-sorted start
  * positions of its removed k-token spans, everything the operator
  * previously computed by exploding the token stream — anti-joining it
  * against exploded covered positions and re-aggregating by doc — is a
  * one-pass merge over the two row-local arrays:
  *
  *   - [[RemoveCoveredTokens]] rebuilds the surviving text (tokens at
  *     positions covered by no span, joined by one space — exactly the
  *     `array_join(sorted kept tokens, " ")` of the join shape);
  *   - [[CoveredTokenCount]] is `n_removed`: the size of the union of
  *     `[s, s+k-1]` clamped to `[0, n-1]` over the span starts.
  *
  * Both are tight codegen loops (`defineCodeGen` → static compute, the
  * [[SortedIntersectSize]] pattern): O(tokens + spans) and O(spans)
  * per row, zero shuffle. PRECONDITION: `starts` ascending-sorted
  * (what `sort_array(collect_list(pos))` produces); unsorted input
  * silently miscounts.
  */
case class RemoveCoveredTokens(
    left: Expression,
    right: Expression,
    k: Int,
    sep: String = " ",
    skipEmpty: Boolean = false
) extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType), ArrayType(IntegerType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_remove_covered"

  // one shared separator object per expression instance; generated
  // code references it through ctx.addReferenceObj
  @transient private lazy val sepUtf8: UTF8String = UTF8String.fromString(sep)

  override def nullSafeEval(w: Any, starts: Any): Any =
    RemoveCoveredTokens.compute(
      w.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], k, sepUtf8, skipEmpty)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepUtf8, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, (w, s) =>
      s"graft.functions.RemoveCoveredTokens.compute($w, $s, $k, $sepRef, $skipEmpty)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RemoveCoveredTokens {
  /** Tokens at positions not covered by any `[start, start+k-1]`,
    * joined by `sep` (null tokens skipped, like `array_join`; empty
    * tokens additionally skipped when `skipEmpty` — the line-dedup
    * convention, where zero-length fragments never reassemble).
    * Called from generated code.
    */
  def compute(
      w: ArrayData, starts: ArrayData, k: Int, sep: UTF8String, skipEmpty: Boolean): UTF8String = {
    val n = w.numElements()
    val ns = starts.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var si = 0
    var coveredUntil = -1L
    var i = 0
    while (i < n) {
      // consume every span starting at or before this position (null
      // elements can't occur — collect_list skips them — but are
      // consumed harmlessly if they ever did)
      while (si < ns && (starts.isNullAt(si) || starts.getInt(si) <= i)) {
        if (!starts.isNullAt(si)) {
          val e = starts.getInt(si).toLong + (k - 1)
          if (e > coveredUntil) coveredUntil = e
        }
        si += 1
      }
      if (i > coveredUntil && !w.isNullAt(i)) {
        val t = w.getUTF8String(i)
        if (!(skipEmpty && t.numBytes() == 0)) kept.add(t)
      }
      i += 1
    }
    UTF8String.concatWs(sep, kept.toArray(new Array[UTF8String](kept.size)): _*)
  }
}

/** `n_removed` of [[graft.ops.Dedup.dedupSubstrings]]: the covered
  * token count — |union of `[s, s+k-1] ∩ [0, n-1]`| over the sorted
  * span starts, where `n` (right child) is the document's token count.
  */
case class CoveredTokenCount(left: Expression, right: Expression, k: Int)
    extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_covered_count"

  override def nullSafeEval(starts: Any, n: Any): Any =
    CoveredTokenCount.compute(starts.asInstanceOf[ArrayData], k, n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.functions.CoveredTokenCount.compute($s, $k, $n)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CoveredTokenCount {
  /** Interval-union size over sorted starts. Called from generated code. */
  def compute(starts: ArrayData, k: Int, n: Int): Long = {
    val ns = starts.numElements()
    var cnt = 0L
    var prev = -1L
    var si = 0
    while (si < ns) {
      if (!starts.isNullAt(si)) {
        val s = starts.getInt(si).toLong
        val hi = math.min(s + (k - 1), n - 1L)
        val lo = math.max(s, prev + 1)
        if (hi >= lo) { cnt += hi - lo + 1; prev = hi }
      }
      si += 1
    }
    cnt
  }
}

object SpanCover {

  /** Surviving text after covered-span removal (codegen). */
  def removeCoveredTokens(w: Column, starts: Column, k: Int): Column =
    Bridge.column(RemoveCoveredTokens(Bridge.expression(w), Bridge.expression(starts), k))

  /** Surviving fragments after dropped-position removal, rejoined with
    * `". "` and empty fragments skipped — the [[graft.ops.Dedup
    * .dedupLines]] reassembly (codegen).
    */
  def removeDroppedFragments(frags: Column, dropped: Column): Column =
    Bridge.column(RemoveCoveredTokens(
      Bridge.expression(frags), Bridge.expression(dropped), k = 1, sep = ". ", skipEmpty = true))

  /** Covered-position count, clamped to the document (codegen). */
  def coveredTokenCount(starts: Column, k: Int, n: Column): Column =
    Bridge.column(CoveredTokenCount(Bridge.expression(starts), Bridge.expression(n), k))
}
