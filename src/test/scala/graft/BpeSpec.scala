package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeCount
import graft.ops.TextOps

/** Parity of the native BPE merge loop against an INDEPENDENT textbook
  * reference implementation (merge ALL occurrences of the best-ranked
  * pair per round — the HuggingFace/GPT-2 formulation, deliberately a
  * different algorithm shape than the expression's
  * one-leftmost-occurrence-at-a-time loop; for a well-formed merge
  * table the two provably coincide, and this spec pins that on unicode
  * edge cases plus randomized inputs).
  */
class BpeSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  /** Textbook reference: per round, pick the lowest-ranked pair present
    * anywhere, merge all its non-overlapping occurrences left-to-right.
    */
  private def referenceBpe(word: String, merges: Seq[(String, String)]): Int = {
    val rank = merges.zipWithIndex.toMap
    var syms = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += word.substring(i, i + Character.charCount(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    var done = syms.isEmpty
    while (!done) {
      val present = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(r => (r, p)))
      if (present.isEmpty) done = true
      else {
        val (_, best) = present.minBy(_._1)
        // merge all non-overlapping occurrences left-to-right
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && (syms(i), syms(i + 1)) == best) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms.length
  }

  private def nativeCounts(words: Seq[String]): Seq[Long] =
    words.toDF("text").select(
      BpeCount.bpeCount(TextOps.tokens(col("text"))).as("n")).as[Long].collect().toSeq

  test("BPE expression matches the textbook reference on unicode edge cases") {
    val cases = Seq(
      "the", "theresting", "nation station installation",
      "banana", "aaaa", "xyz", "it is and standing",
      "中文字",                       // CJK: no merges, code points count
      "café résumé", // latin-1 accents between mergeable runs
      "😀ing",            // astral emoji (surrogate pair) + mergeable suffix
      "a😀b 𝄞",// surrogates interleaved and standalone
      "better litter os", "to|it"   // pipe inside a word
    )
    for (c <- cases) {
      val expected = c.trim.split("[ \\t\\n\\x0B\\f\\r]+").filter(_.nonEmpty)
        .map(w => referenceBpe(w, BpeCount.DefaultMerges)).sum
      val got = nativeCounts(Seq(c)).head
      assert(got == expected, s"'$c': native $got vs reference $expected")
    }
  }

  test("BPE expression matches the reference on randomized merge-alphabet soup") {
    val rnd = new scala.util.Random(7)
    val alphabet = "theringoandst"
    val words = Seq.fill(200)(
      (0 until (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val expected = words.map(w => referenceBpe(w, BpeCount.DefaultMerges).toLong)
    assert(nativeCounts(words) == expected)
  }

  test("empty and whitespace-only docs count zero") {
    assert(nativeCounts(Seq("", "   ")) == Seq(0L, 0L))
  }

  test("merge table validation rejects malformed tables") {
    intercept[IllegalArgumentException](BpeCount(null, Seq(("A", "b"))))      // non-lowercase
    intercept[IllegalArgumentException](BpeCount(null, Seq(("ab", "c"))))     // "ab" never formed
    intercept[IllegalArgumentException](
      BpeCount(null, Seq(("th", "e"), ("t", "h"))))                           // formed too late
  }

  test("graft_bpe_count resolves as a SQL function") {
    graft.functions.GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT graft_bpe_count(array('the', 'station')) AS n").as[Long].head
    assert(n == 1L + 4L)
  }
}
