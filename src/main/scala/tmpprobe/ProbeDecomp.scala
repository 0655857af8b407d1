package tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeDecomp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("pd")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Hashing.register(spark)
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    d.write.format("noop").mode("overwrite").save()
    val path = "/tmp/graft-decomp/ledgerX"
    graft.ext.LshIndex.write(d.filter(col("doc_id") < 250), "doc_id", "text", path)
    val incoming = d.filter(col("doc_id") >= 250)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pd] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val (n, k, bands) = (3, 64, 16)
      val r = k / bands
      val sigs = graft.ext.Par.fanOut(incoming).select(col("doc_id").as("id"),
        graft.functions.Hashing.textMinhash(col("text"), n, k).as("sig"))
        .filter(element_at(col("sig"), 1) =!= Long.MaxValue)
      val probe = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * r + 1, lit(r))), b))))
        .select(col("id"), col("pos").as("band"), col("col").as("bkey"))
      val keys = t("keys collect")(probe.select("bkey").distinct().limit(100001)
        .collect().map(_.getLong(0)))
      val bandsDf = t("snap read bands")(graft.sources.Snapshots.read(spark, s"$path/bands").get)
      val sigsDf = t("snap read sigs")(graft.sources.Snapshots.read(spark, s"$path/sigs").get)
      val ledger0 = bandsDf.filter(col("bkey").isin(keys.map(java.lang.Long.valueOf): _*))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")
      val ledger = ledger0.withColumn("__bsize__", count(lit(1)).over(w))
        .filter(col("__bsize__") <= 2000)
        .select(col("id").as("id_old"), col("band"), col("bkey"))
      val pairs = t("pairs")(ledger
        .join(probe.select(col("id").as("id_new"), col("band"), col("bkey")), Seq("band", "bkey"))
        .select(col("id_old"), col("id_new")).distinct())
      val candIds = t("candIds collect")(ledger0.select("id").distinct().limit(100001)
        .collect().map(_.getLong(0)))
      val oldSigs = sigsDf.filter(col("id").isin(candIds.map(java.lang.Long.valueOf): _*))
        .select(col("id").as("id_old"), col("sig").as("sig_a"))
      val newSigs = sigs.select(col("id").as("id_new"), col("sig").as("sig_b"))
      t("estimation join")(pairs.join(oldSigs, Seq("id_old")).join(newSigs, Seq("id_new"))
        .select(col("id_old"), col("id_new"),
          graft.ext.Dedup.sigJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
