package tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MinhashCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("mc")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Hashing.register(spark)
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    d.write.format("noop").mode("overwrite").save()
    val incoming = d.filter(col("doc_id") >= 250)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mc] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    println("[mc] n_incoming=" + incoming.count())
    for (_ <- 1 to 2) {
      t("minhash eval")(graft.ext.Par.fanOut(incoming).select(col("doc_id"),
        graft.functions.Hashing.textMinhash(col("text"), 3, 64).as("sig"))
        .filter(element_at(col("sig"), 1) =!= Long.MaxValue)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
