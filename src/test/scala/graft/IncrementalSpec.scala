package graft

import org.apache.spark.sql.functions._
import graft.sources.{Incremental, Layout}

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  test("processNew: first run takes all, re-run takes none, new file taken alone") {
    val dir = new java.io.File("/tmp/graft-test/incr-in")
    val ledger = "/tmp/graft-test/incr-ledger.txt"
    rm(dir); rm(new java.io.File(ledger)); dir.mkdirs()
    def drop(name: String, ids: Seq[Long]): Unit = {
      val tmp = s"/tmp/graft-test/incr-stage-$name"
      ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new java.io.File(dir, name).toPath)
      rm(new java.io.File(tmp))
    }
    drop("a.parquet", Seq(1L, 2L))
    drop("b.parquet", Seq(3L))

    var seenIds = Set.empty[Long]
    def run(): Int = Incremental.processNew(spark, dir.getPath, ledger) { df =>
      seenIds = seenIds ++ df.select("id").collect().map(_.getLong(0))
    }
    assert(run() == 2)
    assert(seenIds == Set(1L, 2L, 3L))
    // nothing new → process not called
    seenIds = Set.empty
    assert(run() == 0)
    assert(seenIds.isEmpty)
    // one new file → only its rows
    drop("c.parquet", Seq(9L))
    assert(run() == 1)
    assert(seenIds == Set(9L))
  }

  test("clusteringDepth: random layout is deep, range-compacted layout is ~1") {
    val li = SparkEntry.T(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    val messy = "/tmp/graft-test/depth-messy"
    val tidy = "/tmp/graft-test/depth-tidy"
    li.repartition(8).write.mode("overwrite").parquet(messy) // key ranges all overlap
    val deep = Layout.clusteringDepth(spark, messy, "l_orderkey")
    Layout.compact(spark, messy, tidy, targetBytes = 1L << 16, sortCols = Seq("l_orderkey"))
    val shallow = Layout.clusteringDepth(spark, tidy, "l_orderkey")
    info(f"depth: random $deep%.1f -> compacted $shallow%.1f")
    assert(deep > 4.0, s"random layout should be deep, got $deep")
    assert(shallow <= 1.5, s"range-compacted layout should be ~1, got $shallow")
  }
}
