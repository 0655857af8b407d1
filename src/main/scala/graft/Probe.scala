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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (doExplain) { println(s"===== $name plan:"); df.explain("formatted") }
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
