package graft

import graft.fuzz.{PipelineGen, StreamFuzz}

/** Streaming differential fuzzing (round 18): seeded random
  * stateless-op chains composed with the streaming operator routes —
  * windowed summarize (bin → tumbling window, complete mode) and the
  * three streaming dedup kinds — asserting per seed that the gated
  * result over a one-file-per-trigger file stream equals the batch
  * run of the SAME query text, and (stateful terminals) that the
  * result is invariant to micro-batch partitioning. The gates mirror
  * the fixed stream_dedup_* entries: full rows where the output is
  * deterministic, digest/band SETS where the surviving representative
  * follows arrival order. See [[graft.fuzz.StreamFuzz]].
  *
  * Seed count: GRAFT_STREAMFUZZ_N (default 10 — each seed starts one
  * or two real StreamingQuery runs, so this is the most expensive
  * suite per seed; the smoke default keeps `sbt test` inside the
  * driver's verify window). The standalone campaign
  * (`graft.fuzz.StreamFuzz <sfDir> <n>`) runs the wider sweep
  * recorded in BASELINE. Reproduce one seed with
  * `PipelineGen.stream(seed)`.
  */
class StreamFuzzSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("seeded random streaming pipelines: batch == stream, partitioning-invariant") {
    val n = sys.env.getOrElse("GRAFT_STREAMFUZZ_N", "10").toInt
    val workDir =
      java.nio.file.Files.createTempDirectory("graft_streamfuzz_spec").toString
    StreamFuzz.prepare(spark, sfDir, workDir)

    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val mix = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    (1 to n).foreach { seed =>
      val gq = PipelineGen.stream(seed.toLong)
      mix(gq.terminal) += 1
      try {
        StreamFuzz.check(spark, workDir, seed.toLong).foreach { d =>
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
      s"\n${failures.length} streaming differential failures (showing up to 5):\n" +
        failures.take(5).mkString("\n"))
  }
}
