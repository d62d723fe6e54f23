package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Sessionize, Streaming}

/** Sessionization: native session_window batch/stream parity, and
  * custom-state capped sessions (the semantics the built-in can't do).
  */
class SessionizeSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // u1: burst at 0-2, burst at 20-21 (gap 10m → two sessions)
  // u2: steady single session 5-7
  private val rows = Seq(
    ("u1", ts(0)), ("u1", ts(1)), ("u1", ts(2)),
    ("u2", ts(5)), ("u2", ts(7)),
    ("u1", ts(20)), ("u1", ts(21)),
    ("u2", ts(59)) // late watermark-advancing event
  )

  test("native session_window: batch sessions with 10m gap") {
    val out = Sessionize.gapSessions(rows.toDF("user", "ts"), "user", "ts", "10 minutes")
      .select("user", "session_start", "n_events").as[(String, Timestamp, Long)]
      .collect().toSet
    assert(out == Set(
      ("u1", ts(0), 3L), ("u1", ts(20), 2L), ("u2", ts(5), 2L), ("u2", ts(59), 1L)
    ))
  }

  test("native session_window: streaming append matches batch for finalized sessions") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    val stream = Streaming.withEventTime(ms.toDF.toDF("user", "ts"), "ts", "0 seconds")
    val q = Streaming.runToMemory(
      Sessionize.gapSessions(stream, "user", "ts", "10 minutes"),
      "sessions_stream",
      "append"
    )
    try {
      ms.addData(rows.take(5))
      q.processAllAvailable()
      ms.addData(rows.drop(5))
      q.processAllAvailable()
      val got = spark.table("sessions_stream")
        .select("user", "session_start", "n_events").as[(String, Timestamp, Long)]
        .collect().toSet
      // u2's minute-59 session is still open (watermark at 59); the rest finalized
      assert(got == Set(("u1", ts(0), 3L), ("u1", ts(20), 2L), ("u2", ts(5), 2L)))
    } finally q.stop()
  }

  test("capped sessions close at the duration cap on batch input") {
    // u3 fires every minute for 30 minutes; cap at 10 minutes, gap 5m
    val steady = (0 until 30).map(i => ("u3", ts(i)))
    val out = Sessionize.cappedSessions(steady.toDF("user", "ts"), "user", "ts",
        gapMs = 5 * 60 * 1000L, capMs = 10 * 60 * 1000L)
      .collect().sortBy(_.session_start.getTime)
    // batch: trailing session has no timeout to close it → only capped
    // ones emitted; each closes AT the first event reaching the cap, so
    // it holds exactly the 10 events of minutes [start, start+9]
    assert(out.length == 2, out.mkString("; "))
    assert(out.forall(_.capped))
    assert(out.map(_.session_start).sameElements(Array(ts(0), ts(10))))
    assert(out.forall(_.n_events == 10))
  }

  test("capped sessions: streaming emits gap-closed session via event-time timeout") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    val stream = Streaming.withEventTime(ms.toDF.toDF("user", "ts"), "ts", "0 seconds")
    val sessions = Sessionize.cappedSessions(stream, "user", "ts",
      gapMs = 10 * 60 * 1000L, capMs = 60 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("capped_stream").outputMode("append").start()
    try {
      ms.addData(Seq(("u1", ts(0)), ("u1", ts(1)), ("u1", ts(2))))
      q.processAllAvailable()
      ms.addData(Seq(("u2", ts(30)))) // watermark → 30 > 2 + 10 → u1 session times out
      q.processAllAvailable()
      val got = spark.table("capped_stream").as[Sessionize.Session].collect()
      assert(got.exists(s => s.key == "u1" && s.session_start == ts(0) && s.session_end == ts(2) && s.n_events == 3 && !s.capped))
    } finally q.stop()
  }
}
