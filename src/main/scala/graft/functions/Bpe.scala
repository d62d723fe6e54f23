package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen byte-pair-encoding token count over a token array —
  * REAL BPE (GPT-2/tiktoken-style ranked merges), not the
  * longest-match approximation of [[SubwordCounts]].
  *
  * Semantics (mirrored exactly by the recursive-CTE DuckDB oracle):
  * per word, start from the word's Unicode CODE POINTS as symbols,
  * then repeatedly merge the LEFTMOST occurrence of the
  * LOWEST-RANKED adjacent symbol pair present in the merge table,
  * until no table pair remains; the BPE token count is the final
  * symbol count. One-occurrence-at-a-time with re-selection is
  * equivalent to the textbook merge-all-occurrences-per-rank loop for
  * any WELL-FORMED merge table (each merged symbol's own pairs rank
  * strictly later than the merge that created it — enforced in the
  * constructor), and it is the formulation a SQL oracle can replay
  * with one first-occurrence replace per recursion step.
  *
  * Code points, not UTF-16 units: surrogate pairs step atomically so
  * the JVM walk agrees with DuckDB's code-point `substr` on any input,
  * not just the BMP. Characters outside the merge alphabet simply
  * never merge — a CJK word counts its code points, the byte-level
  * fallback analogue.
  *
  * The whole merge loop runs inside whole-stage codegen as one static
  * JVM call per row (the [[ShingleHashes]]/[[SubwordCounts]] pattern);
  * the merge table is a plan-time constant baked into the generated
  * code and parsed once per executor. Cost is O(symbols² · merges) per
  * word with short words in practice — a narrow per-row projection,
  * no shuffle, no UDF.
  */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression
    with ExpectsInputTypes {

  // lowercase-ASCII alphabet keeps the oracle's string surgery exact
  // (no regex metachars, UTF-16 length == code points); well-formed
  // ranks make one-at-a-time == merge-all (see class doc)
  require(merges.nonEmpty, "merge table must be non-empty")
  require(
    merges.forall { case (a, b) =>
      (a + b).forall(c => c >= 'a' && c <= 'z') && a.nonEmpty && b.nonEmpty
    },
    "merge symbols must be non-empty lowercase ASCII")
  require(
    merges.zipWithIndex.forall { case ((a, b), r) =>
      def ok(s: String): Boolean = s.length == 1 || {
        val formedBy = merges.indexWhere { case (x, y) => x + y == s }
        formedBy >= 0 && formedBy < r
      }
      ok(a) && ok(b)
    },
    "merge table must be well-formed: multi-char symbols arise from earlier merges")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_count"

  private lazy val mergesKey = merges.map { case (a, b) => s"$a $b" }.mkString(",")

  override def nullSafeEval(a: Any): Any =
    BpeCount.compute(a.asInstanceOf[ArrayData], mergesKey)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lit = ctx.addReferenceObj("bpeMerges", mergesKey, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.compute($c, $lit)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {

  /** Default English-ish merge table in rank order (rank = position).
    * Well-formed: every multi-character symbol is the product of an
    * earlier merge. A production deployment bakes the trained
    * tokenizer's merge list here instead — same expression, same plan.
    */
  val DefaultMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("i", "n"), ("a", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("th", "e"), ("in", "g"), ("a", "t"), ("e", "n"),
    ("e", "s"), ("o", "r"), ("a", "r"), ("s", "t"), ("t", "o"),
    ("an", "d"), ("o", "u"), ("i", "t"), ("i", "s"), ("e", "d"),
    ("l", "l"), ("l", "e"), ("t", "i"), ("ti", "on")
  )

  private final class Table(val a: Array[String], val b: Array[String]) {
    val n: Int = a.length
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Table]()

  private def tableFor(key: String): Table =
    cache.computeIfAbsent(key, k => {
      val parts = k.split(',')
      val as = new Array[String](parts.length)
      val bs = new Array[String](parts.length)
      var i = 0
      while (i < parts.length) {
        val sp = parts(i).indexOf(' ')
        as(i) = parts(i).substring(0, sp)
        bs(i) = parts(i).substring(sp + 1)
        i += 1
      }
      new Table(as, bs)
    })

  /** BPE token count over every word in the array (see class doc). */
  def compute(tokens: ArrayData, mergesKey: String): Long = {
    val t = tableFor(mergesKey)
    var total = 0L
    val n = tokens.numElements()
    var w = 0
    while (w < n) {
      if (!tokens.isNullAt(w)) {
        val word = tokens.getUTF8String(w).toString
        if (word.nonEmpty) total += bpeWordCount(word, t)
      }
      w += 1
    }
    total
  }

  private def bpeWordCount(word: String, t: Table): Long = {
    // symbols as code-point strings (surrogate pairs atomic)
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val cc = Character.charCount(cp)
      syms.add(word.substring(i, i + cc))
      i += cc
    }
    var done = false
    while (!done) {
      // leftmost occurrence of the lowest-ranked present pair
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var p = 0
      while (p < syms.size - 1) {
        var r = 0
        var found = -1
        while (found < 0 && r < t.n) {
          if (r < bestRank && t.a(r) == syms.get(p) && t.b(r) == syms.get(p + 1)) found = r
          r += 1
        }
        if (found >= 0 && found < bestRank) { bestRank = found; bestIdx = p }
        p += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms.set(bestIdx, syms.get(bestIdx) + syms.get(bestIdx + 1))
        syms.remove(bestIdx + 1)
      }
    }
    syms.size.toLong
  }

  def bpeCount(tokens: Column, merges: Seq[(String, String)] = DefaultMerges): Column =
    Bridge.column(BpeCount(Bridge.expression(tokens), merges))
}
