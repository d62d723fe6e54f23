package graft

/** Mirrors the driver's gates: the flagship entry returns rows, every
  * declared query key runs at sf0.001, and every oracle key has a
  * matching query (a dangling oracle would silently fail the round).
  */
class SparkEntrySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("bench keys exist in queries") {
    val missing = (SparkEntry.benchKeys ++ SparkEntry.opsBenchKeys).toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"bench keys without queries: $missing")
  }

  test("every declared query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
