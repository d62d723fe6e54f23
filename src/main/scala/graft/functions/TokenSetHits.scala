package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen count of array elements contained in a small fixed
  * lexicon — `size(filter(tokens, t => array_contains(lexicon, t)))`
  * without the interpreted higher-order closure.
  *
  * The builtin formulation evaluates the lambda per TOKEN interpreted
  * (and re-materializes the literal lexicon array per call): with the
  * 10-word stopword lists this was ~10M closure evaluations per
  * language pass over the sf1 corpus, and languageId runs four
  * passes — measured as the dominant cost of text_quality /
  * text_langid at sf1. Here the lexicon is one shared hash set and
  * the token loop runs inside whole-stage codegen.
  *
  * Semantics match the builtin composition exactly (same token string
  * equality, occurrences counted with multiplicity), so the DuckDB
  * oracle SQL is unchanged.
  */
case class TokenSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_token_set_hits"

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any =
    TokenSetHits.count(a.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenSetHits.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSetHits {
  /** Token-in-set occurrence count. Called from generated code. */
  def count(tokens: ArrayData, set: java.util.HashSet[_]): Int = {
    val n = tokens.numElements()
    var i = 0
    var hits = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && set.contains(t)) hits += 1
      i += 1
    }
    hits
  }

  /** Count of `tokens` elements appearing in `words` (codegen). */
  def tokenSetHits(tokens: Column, words: Seq[String]): Column =
    Bridge.column(TokenSetHits(Bridge.expression(tokens), words))
}
