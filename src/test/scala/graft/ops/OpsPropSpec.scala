package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property tests for the round-10 ops: the distributed formulations
  * must agree with brute-force single-machine reference
  * implementations on arbitrary small corpora — overlapping repeated
  * spans, within-doc repeats, short docs, empty docs, and non-ASCII
  * words included. (Generators are driven manually with fixed seeds,
  * like JoinPropSpec — the scalatest-scalacheck bridge isn't in the
  * offline cache.)
  */
class OpsPropSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // tiny vocab forces plenty of repeated k-grams
  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 14)
    ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
  } yield ws.mkString(" ")

  private val genCorpus: Gen[List[String]] = Gen.listOfN(10, genDoc)

  /** Reference ExactSubstr: global first-occurrence keep, token keys
    * instead of hashes (collision-free by construction).
    */
  private def refDedupSubstrings(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] = {
    def toks(s: String): Vector[String] =
      s.trim.toLowerCase.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").split(" ", -1).toVector
    val seen = scala.collection.mutable.Set[Seq[String]]()
    val covered = scala.collection.mutable.Map[Long, Set[Int]]().withDefaultValue(Set.empty)
    for ((id, text) <- docs.sortBy(_._1)) {
      val w = toks(text)
      val nonEmpty = !(w.length == 1 && w.head == "")
      if (nonEmpty) {
        val spans: Seq[(Int, Seq[String])] =
          if (w.length >= k) (0 to w.length - k).map(i => i -> w.slice(i, i + k))
          else Seq(0 -> ("WHOLE" +: w))
        for ((pos, key) <- spans) {
          if (seen.contains(key))
            covered(id) = covered(id) ++ (pos until math.min(pos + k, w.length))
          else seen += key
        }
      }
    }
    docs.map { case (id, text) =>
      val w = toks(text)
      val nonEmpty = !(w.length == 1 && w.head == "")
      if (!nonEmpty) id -> (("", 0L))
      else {
        val cov = covered(id)
        val keptToks = w.zipWithIndex.collect { case (t, i) if !cov.contains(i) => t }
        id -> ((keptToks.mkString(" "), cov.size.toLong))
      }
    }.toMap
  }

  test("dedupSubstrings agrees with the brute-force reference on random corpora") {
    for (seed <- 1L to 8L) {
      val texts = sample(genCorpus, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = refDedupSubstrings(docs, k = 3)
      val got = Dedup.dedupSubstrings(docs.toDF("doc_id", "text"), "text", "doc_id", k = 3)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected, s"seed=$seed docs=$docs")
    }
  }

  private val genWord: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar.map(_.toString),
      1 -> Gen.oneOf("中", "字", "é"),
      1 -> Gen.const(new String(Character.toChars(0x1F600)))
    ))
  } yield cs.mkString

  /** Reference greedy maximal munch over code points. */
  private def refSubwords(words: Seq[String], vocab: Seq[String]): (Long, Long) = {
    val sorted = vocab.sortBy(v => -v.length)
    var sub = 0L; var oov = 0L
    for (w <- words) {
      var i = 0
      while (i < w.length) {
        sorted.find(v => w.startsWith(v, i)) match {
          case Some(v) => i += v.length
          case None    => oov += 1; i += Character.charCount(w.codePointAt(i))
        }
        sub += 1
      }
    }
    (sub, oov)
  }

  test("SubwordCounts agrees with the brute-force reference on random unicode words") {
    val vocab = graft.functions.SubwordCounts.DefaultVocab
    for (seed <- 1L to 8L) {
      val words = sample(Gen.listOfN(20, genWord), seed)
      val text = words.mkString(" ")
      val got = TextOps.subwordStats(Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
        .as[(Long, Long, Long)].collect().head
      // the op tokenizes the normalized text itself; mirror that
      val toks = text.trim.toLowerCase.replaceAll("[ \\t\\n\\x0B\\f\\r]+", " ").split(" ", -1).toSeq
      val expected = refSubwords(toks, vocab)
      assert((got._2, got._3) == expected, s"seed=$seed text=$text")
    }
  }
}
