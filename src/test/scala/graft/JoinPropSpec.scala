package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the scalable formulations of the as-of and range
  * joins must agree with a brute-force reference implementation on
  * arbitrary small datasets — keys with no matches, duplicate
  * timestamps, bucket-boundary and tie cases included. (Generators are
  * driven manually with fixed seeds, like ParserPropSpec — the
  * scalatest-scalacheck bridge isn't in the offline cache.)
  */
class JoinPropSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._
  import graft.ops.{AsOf, RangeJoin}

  private def ts(m: Int): Timestamp = new Timestamp(1767225600000L + m * 60000L)

  private val genLeft = Gen.listOfN(
    12,
    for {
      k <- Gen.oneOf("a", "b", "c")
      m <- Gen.choose(0, 40)
    } yield (k, m)
  )
  private val genRight = Gen.listOfN(
    8,
    for {
      k <- Gen.oneOf("a", "b", "c")
      m <- Gen.choose(0, 40)
      v <- Gen.choose(1, 999)
    } yield (k, m, v)
  )

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("as-of join agrees with the brute-force definition") {
    (1 to 8).foreach { trial =>
      val ls = sample(genLeft, trial * 7L)
      // unique (key, ts) on the right, as the operator requires
      val rs = sample(genRight, trial * 13L)
        .groupBy(t => (t._1, t._2)).map { case ((k, m), g) => (k, m, g.map(_._3).max) }.toSeq
      val left = ls.zipWithIndex.map { case ((k, m), i) => (k, ts(m), i.toLong) }.toDF("k", "ts", "lid")
      val right = rs.map { case (k, m, v) => (k, ts(m), v.toLong) }.toDF("k", "ts", "v")

      // sweep the skew-split knob too: 1 (plain window), tiny counts
      // (all ts in one bucket / boundary collisions), and the default
      val buckets = Seq(1, 2, 3, 5, 32)(trial % 5)
      val got = AsOf.joinAsOf(left, right, Seq("k"), "ts", Seq("v"), timeBuckets = buckets)
        .select("lid", "v").as[(Long, Option[Long])].collect().toMap

      val want = ls.zipWithIndex.map { case ((k, m), i) =>
        val prior = rs.filter(r => r._1 == k && r._2 <= m)
        i.toLong -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3.toLong))
      }.toMap
      assert(got == want, s"trial $trial (buckets $buckets): left=$ls right=$rs")
    }
  }

  test("as-of join fills multiple value columns atomically under NULLs") {
    // brute-force: the most recent prior right row wins WHOLE — its
    // NULL fields stay NULL, never backfilled from an older row, and
    // v1/v2 never mix across right rows
    val genRightN = Gen.listOfN(
      8,
      for {
        k <- Gen.oneOf("a", "b", "c")
        m <- Gen.choose(0, 40)
        v1 <- Gen.option(Gen.choose(1L, 999L))
        v2 <- Gen.option(Gen.choose(1L, 999L))
      } yield (k, m, v1, v2)
    )
    (1 to 8).foreach { trial =>
      val ls = sample(genLeft, trial * 19L)
      val rs = sample(genRightN, trial * 23L)
        .groupBy(t => (t._1, t._2)).map { case (_, g) => g.head }.toSeq
      val left = ls.zipWithIndex.map { case ((k, m), i) => (k, ts(m), i.toLong) }.toDF("k", "ts", "lid")
      val right = rs.map { case (k, m, v1, v2) => (k, ts(m), v1, v2) }.toDF("k", "ts", "v1", "v2")

      val got = AsOf.joinAsOf(left, right, Seq("k"), "ts", Seq("v1", "v2"))
        .select("lid", "v1", "v2").as[(Long, Option[Long], Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap

      val want = ls.zipWithIndex.map { case ((k, m), i) =>
        val prior = rs.filter(r => r._1 == k && r._2 <= m)
        i.toLong -> (if (prior.isEmpty) (None, None)
                     else { val hit = prior.maxBy(_._2); (hit._3, hit._4) })
      }.toMap
      assert(got == want, s"trial $trial: left=$ls right=$rs")
    }
  }

  test("range join agrees with the brute-force definition across bucket widths") {
    (1 to 8).foreach { trial =>
      val ls = sample(genLeft, trial * 17L)
      val rs = sample(genRight, trial * 29L)
      val bucketMin = Seq(1, 3, 7, 60)(trial % 4)
      val left = ls.zipWithIndex.map { case ((k, m), i) => (k, ts(m), i.toLong) }.toDF("k", "ts", "lid")
      val right = rs.zipWithIndex.map { case ((k, m, _), j) => (k, ts(m), ts(m + 5), j.toLong) }
        .toDF("k", "s", "e", "iid")

      val got = RangeJoin
        .pointInInterval(left, right, Seq("k"), "ts", "s", "e", bucketMin * 60L * 1000 * 1000)
        .select("lid", "iid").as[(Long, Long)].collect().toSet

      val want = (for {
        ((lk, lm), i) <- ls.zipWithIndex
        ((rk, rm, _), j) <- rs.zipWithIndex
        if lk == rk && lm >= rm && lm < rm + 5
      } yield (i.toLong, j.toLong)).toSet
      assert(got == want, s"trial $trial (bucket $bucketMin m): left=$ls right=$rs")
    }
  }
}
