package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[NearDup.rowBandRows]] (the shuffle-free streaming form) must emit
  * band keys BIT-IDENTICAL to the batch explode→agg pipeline — the
  * whole point is that streaming state and batch dedup agree on what a
  * band is.
  */
class RowBandSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap at all whatsoever"),
    (4L, "tiny doc"), // < 3 tokens → whole-text shingle path
    (5L, "Punctuation,  CASE and   spacing must normalize! the same way?")
  ).toDF("doc_id", "text")

  test("per-row band keys are bit-identical to the batch explode/agg pipeline") {
    // The batch pipeline packs 1-2-component band keys into ONE long
    // (`c0·P + c1`, a bijection — round 19); the streaming form keeps
    // the pipe-joined string (part of the stream gate entries' declared
    // output). Bit-identity is asserted through the bijection: the
    // string key, re-packed, must equal the batch long for every
    // (doc, band). Wider bands (r=4) keep the string form on both.
    val P = 2147483647L
    def packed(key: String, r: Int): String = {
      val parts = key.split('|').map(_.toLong)
      if (r == 1) parts(0).toString
      else if (r == 2) (parts(0) * P + parts(1)).toString
      else key
    }
    for ((k, r) <- Seq((32, 2), (8, 1), (16, 4))) {
      val batch = NearDup.bandRowsOf(
        NearDup.minhashSigsFromHashed(
          NearDup.hashedShingles(docs, "text", "doc_id"), "doc_id", k),
        "doc_id", k, r
      ).select(col("doc_id"), col("band_idx"), col("band_key").cast("string"))
        .as[(Long, Int, String)].collect().toSet
      val perRow = NearDup.rowBandRows(docs, "text", k, r)
        .select(col("doc_id"), col("band_idx"), col("band_key"))
        .as[(Long, Int, String)].collect()
        .map { case (id, b, key) => (id, b, packed(key, r)) }.toSet
      assert(perRow == batch, s"k=$k r=$r:\nrow=$perRow\nbatch=$batch")
      assert(perRow.size == docs.count() * (k / r)) // no dropped/dup bands
    }
  }

  test("null-text docs emit NO band rows (intentional round-19 change)") {
    // The pre-codegen interpreted chain gave null-text docs a k-NULL
    // signature whose array_join produced nBands rows with band_key ""
    // — colliding with every other null-text doc. The codegen
    // signature is NULL for null text, so such docs produce no band
    // rows at all (they collide with nothing). This pins the new
    // contract; non-null docs are unaffected.
    val withNull = docs.unionByName(Seq((6L, null: String)).toDF("doc_id", "text"))
    val bands = NearDup.rowBandRows(withNull, "text", 32, 2)
      .select(col("doc_id"), col("band_idx"), col("band_key"))
      .as[(Long, Int, String)].collect()
    assert(!bands.exists(_._1 == 6L), s"null-text doc emitted band rows: ${bands.filter(_._1 == 6L).toSeq}")
    assert(bands.count(_._1 == 1L) == 16) // non-null docs keep all k/r bands
  }

  test("near-identical docs share bands; unrelated docs share none") {
    val bands = NearDup.rowBandRows(docs, "text", 32, 2)
      .select(col("doc_id"), col("band_idx"), col("band_key"))
      .as[(Long, Int, String)].collect()
    def of(id: Long) = bands.filter(_._1 == id).map(t => (t._2, t._3)).toSet
    assert(of(1L).intersect(of(2L)).nonEmpty) // one-word difference
    assert(of(1L).intersect(of(3L)).isEmpty)
  }
}
