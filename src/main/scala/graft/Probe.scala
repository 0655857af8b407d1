package graft

import org.apache.spark.sql.SparkSession

/** Plan/perf probe: `runMain graft.Probe <sfDir> <query> [explain]` —
  * times one query end-to-end (noop write) and optionally dumps the
  * formatted physical plan. Dev tool for the bench loop.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val doExplain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART", "134217728"))
      // match Bench's right-sized generated-class cache so probe timings
      // reflect the bench's steady state (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      if (doExplain) {
        println(s"===== $name plan:")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      // the query BUILDER runs inside the timed section: streaming queries
      // (stream_*) execute their whole job in the builder and return a
      // memory table, so timing only the final write would bill a
      // memory-scan instead of the real job
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
