package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Structured Streaming: the windowed aggregation runs as a real streaming
  * query (parquet source → memory sink) and matches the identical batch
  * transform; sessionization exercises flatMapGroupsWithState.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def batchEvents = SparkEntry.events(spark, sf0001)

  test("streaming windowed agg over the events table matches the batch result") {
    // stage the events as a stream source dir with a µs-timestamp copy
    val dir = "/tmp/graft-test/stream-src"
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = Streams.windowedAgg(Streams.readEventStream(spark, dir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("graft_win").start()
    try {
      q.processAllAvailable()
      // append mode only emits windows the watermark has passed; run a
      // second (empty) batch to advance it, then compare what was emitted
      val streamed = spark.table("graft_win")
      val batch = Streams.windowedAgg(batchEvents)
      val b = batch.collect().map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
      val s = streamed.collect().map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getDouble(4))).toMap
      // every emitted streaming window must equal its batch counterpart
      s.foreach { case (k, v) => assert(b(k) == v, s"window $k") }
      assert(batch.count() > 0)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replayed events") {
    val dir = "/tmp/graft-test/stream-dup"
    // write the same events TWICE (two files) — a replayed source
    batchEvents.write.mode("overwrite").parquet(dir)
    batchEvents.write.mode("append").parquet(dir)

    val deduped = Streams.dedupWithinWatermark(
      Streams.readEventStream(spark, dir), Seq("event_id"), "40 days")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup").start()
    try {
      q.processAllAvailable()
      val n = spark.table("graft_dedup").count()
      val expected = batchEvents.select("event_id").distinct().count()
      assert(n == expected, s"streamed $n vs distinct $expected")
    } finally q.stop()
  }

  test("sessionize splits user activity on 30-minute gaps with state") {
    implicit val s = spark
    val events = batchEvents.as[Streams.Event]
    val sessions = Streams.sessionize(events, gapMinutes = 30).collect()
    assert(sessions.nonEmpty)
    // session invariants
    sessions.foreach { ses =>
      assert(!ses.session_end.before(ses.session_start))
      assert(ses.n_events > 0)
    }
    // per-user totals preserved
    val byUser = sessions.groupBy(_.user_id).view.mapValues(_.map(_.n_events).sum).toMap
    val truth = batchEvents.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser == truth)
  }

  test("session_window gap boundary: exactly-gap spacing MERGES; beyond it splits") {
    // pins the inclusive boundary: +30:00.000 merges (same as the batch
    // sessionIds `gap > threshold` rule), +30:00.001 starts a new session
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 1.0),      // merges
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00.001"), 1.0)   // splits
    ).toDF("user_id", "ts", "value")
    val got = Streams.sessionWindowAgg(df).orderBy("user_id", "session_start").collect()
    assert(got.length == 3, got.mkString("; "))
    assert(got(0).getAs[Long]("n_events") == 2)
    assert(got(0).getAs[java.sql.Timestamp]("session_end").toString
      == "2024-01-01 01:00:00.0") // last event + gap
    assert(got(1).getAs[Long]("n_events") == 1 && got(2).getAs[Long]("n_events") == 1)
  }

  test("checkpoint recovery: a restarted query resumes state, no loss, no double-count") {
    // production concern the memory-sink tests can't see: the SAME
    // aggregation run as two separate query INSTANCES sharing one
    // checkpoint must equal the one-shot batch result — state (and source
    // offsets) recover from the checkpoint, new files are picked up, and
    // nothing is double-counted.
    val src = "/tmp/graft-test/stream-ckpt-src"
    val ckpt = "/tmp/graft-test/stream-ckpt"
    val out = "/tmp/graft-test/stream-ckpt-out"
    for (d <- Seq(src, ckpt, out))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    val half1 = batchEvents.filter(col("event_id") % 2 === 0)
    val half2 = batchEvents.filter(col("event_id") % 2 =!= 0)
    half1.write.parquet(src)

    def runOnce(): Unit = {
      val q = Streams.dedupWithinWatermark(
        Streams.readEventStream(spark, src), Seq("event_id"), "40 days")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt).format("parquet")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    }
    runOnce()                                  // instance 1: first half
    half2.write.mode("append").parquet(src)
    half1.write.mode("append").parquet(src)    // replay half1 → state must drop
    runOnce()                                  // instance 2: resumes from ckpt
    val got = spark.read.parquet(out)
    assert(got.count() == batchEvents.count(), "no loss, no double-count")
    assert(got.select("event_id").distinct().count() == batchEvents.count())
  }

  test("streaming session windows equal the batch session_window result") {
    val dir = "/tmp/graft-test/stream-sess"
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = Streams.sessionWindowAgg(
      Streams.readEventStream(spark, dir).select("user_id", "ts", "value"))
    spark.catalog.dropTempView("graft_sess")
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("graft_sess").start()
    try {
      q.processAllAvailable()
      val s = spark.table("graft_sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
          (r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4))).toMap
      val b = Streams.sessionWindowAgg(
        batchEvents.select("user_id", "ts", "value")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
          (r.getTimestamp(2).getTime, r.getLong(3), r.getLong(4))).toMap
      assert(s === b)
      assert(b.nonEmpty)
    } finally q.stop()
  }

  test("asofEnrich: strictly-before carry, (ts, event_id) tie-break, no-prior is None") {
    implicit val s = spark
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ev = Seq(
      Streams.AsofEvent(1L, ts(10), 7L, "view", 0L),       // before any purchase → None
      Streams.AsofEvent(2L, ts(20), 7L, "purchase", 100L),
      Streams.AsofEvent(3L, ts(20), 7L, "view", 0L),       // same ts, id 3 > 2 → sees purchase 2
      Streams.AsofEvent(4L, ts(30), 7L, "purchase", 200L),
      Streams.AsofEvent(5L, ts(30), 7L, "view", 0L),       // latest purchase wins (id 4)
      Streams.AsofEvent(6L, ts(40), 7L, "purchase", 300L),
      Streams.AsofEvent(7L, ts(40), 7L, "view", 0L),
      Streams.AsofEvent(8L, ts(5), 9L, "view", 0L)         // other user: isolated state
    ).toDS()
    val out = Streams.asofEnrich(ev).collect().map(o => o.view_id -> o).toMap
    assert(out(1L).src_id.isEmpty && out(1L).src_value_c.isEmpty)
    assert(out(3L).src_id.contains(2L) && out(3L).src_value_c.contains(100L))
    assert(out(5L).src_id.contains(4L) && out(5L).src_value_c.contains(200L))
    assert(out(7L).src_id.contains(6L) && out(7L).src_value_c.contains(300L))
    assert(out(8L).src_id.isEmpty)
    assert(out.size == 5) // purchases themselves emit nothing
  }
}
