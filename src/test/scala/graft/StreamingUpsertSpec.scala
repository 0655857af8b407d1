package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** foreachBatch keyed upsert: latest-wins merge into a parquet table,
  * idempotent under batch replay (the exactly-once story).
  */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val tableDir = "/tmp/graft-test/upsert-table"

  private def tableState(): Map[Long, (String, Long)] =
    spark.read.parquet(tableDir).collect()
      .map(r => r.getAs[Long]("k") -> ((r.getAs[String]("v"), r.getAs[Long]("seq")))).toMap

  test("streaming upsert: inserts, updates across batches, latest-wins inside a batch") {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(tableDir))

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("k", "v", "seq")
      .writeStream
      .foreachBatch(Streams.upsertSink(tableDir, Seq("k"), "seq") _)
      .option("checkpointLocation", "/tmp/graft-test/upsert-ckpt-" + System.nanoTime())
      .start()
    try {
      // batch 1: two keys, key 1 appears twice — seq 5 must win
      in.addData((1L, "a", 1L), (1L, "a5", 5L), (2L, "b", 1L))
      q.processAllAvailable()
      assert(tableState() == Map(1L -> (("a5", 5L)), 2L -> (("b", 1L))))

      // batch 2: update key 2, insert key 3; key 1 untouched
      in.addData((2L, "b9", 9L), (3L, "c", 2L))
      q.processAllAvailable()
      assert(tableState() == Map(
        1L -> (("a5", 5L)), 2L -> (("b9", 9L)), 3L -> (("c", 2L))))
    } finally q.stop()
  }

  test("monotone: an out-of-order batch with an older seq cannot regress the table") {
    val before = tableState()
    val stale = Seq((2L, "bOLD", 1L)).toDF("k", "v", "seq")
    Streams.upsertSink(tableDir, Seq("k"), "seq")(stale, batchId = 100L)
    assert(tableState() == before)
  }

  test("upsert merge is idempotent: replaying the same batch leaves the table unchanged") {
    val before = tableState()
    // replay batch 2's rows directly (what a post-crash foreachBatch does)
    val replay = Seq((2L, "b9", 9L), (3L, "c", 2L)).toDF("k", "v", "seq")
    Streams.upsertSink(tableDir, Seq("k"), "seq")(replay, batchId = 99L)
    assert(tableState() == before)
  }
}
