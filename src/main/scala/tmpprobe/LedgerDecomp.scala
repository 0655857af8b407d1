package tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LedgerDecomp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("ld")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.write.format("noop").mode("overwrite").save()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[decomp] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val path = s"/tmp/graft-decomp/ledger$round"
      val cohort = d.filter(col("doc_id") < 250)
      t("write")(graft.ext.LshIndex.write(cohort, "doc_id", "text", path))
      t("probe")(graft.ext.LshIndex.probePairs(spark, path,
        d.filter(col("doc_id") >= 250), "doc_id", "text", 0.5)
        .write.format("noop").mode("overwrite").save())
      t("append")(graft.ext.LshIndex.append(
        d.filter(col("doc_id") >= 250 && col("doc_id") < 350), "doc_id", "text", path))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
