package graft

import graft.fuzz.{DisorderFuzz, PipelineGen}

/** Out-of-order / late-data streaming fuzz (round 19): the same seeded
  * query space as StreamFuzzSpec, replayed in APPEND mode over
  * disordered file layouts, asserting the watermark contract per seed:
  * bounded disorder (jittered arrival inside the watermark delay)
  * leaves the gated result identical to the time-ordered replay, and
  * guaranteed-beyond-budget rows (earliest-quartile holdout delivered
  * after the global max event time) are dropped by every stateful
  * operator — result equals the ordered replay with the holdout
  * deleted — while stateless chains keep them. This is the regime both
  * real streaming bugs so far lived in (StreamFuzz seed 36's
  * event-time copy, the r10 sessionizer clamp). See
  * [[graft.fuzz.DisorderFuzz]].
  *
  * Seed count: GRAFT_DISORDERFUZZ_N (default 6 — each seed runs three
  * or four real StreamingQuery drains, so seeds are expensive; the
  * smoke default keeps `sbt test` inside the driver's verify window).
  * The standalone campaign (`graft.fuzz.DisorderFuzz <sfDir> <n>`)
  * runs the wider sweep recorded in BASELINE. Reproduce one seed with
  * `PipelineGen.stream(seed)`.
  */
class DisorderFuzzSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("seeded random streaming pipelines under disorder: within-budget invariant, beyond-budget dropped") {
    val n = sys.env.getOrElse("GRAFT_DISORDERFUZZ_N", "6").toInt
    val workDir =
      java.nio.file.Files.createTempDirectory("graft_disorderfuzz_spec").toString
    DisorderFuzz.prepare(spark, sfDir, workDir, seed = 1L)

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val mix = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    (1 to n).foreach { seed =>
      val gq = PipelineGen.stream(seed.toLong)
      mix(gq.terminal) += 1
      try {
        DisorderFuzz.check(spark, workDir, seed.toLong).foreach { d =>
          failures += s"seed $seed: $d\n--- pql:\n${gq.pql}\n"
        }
      } catch {
        case e: Exception =>
          failures +=
            s"seed $seed: ${e.getClass.getSimpleName}: ${e.getMessage}\n--- pql:\n${gq.pql}\n"
      }
    }
    info(s"$n seeds: " + mix.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", "))
    assert(failures.isEmpty,
      s"\n${failures.length} disorder differential failures (showing up to 5):\n" +
        failures.take(5).mkString("\n"))
  }
}
