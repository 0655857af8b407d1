package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental batch processing with a file-ledger bookmark — the
  * "process only what's new" loop every scheduled pipeline runs, without
  * requiring a streaming runtime or a table format.
  *
  * The ledger is a plain text file of already-processed file names,
  * updated ATOMICALLY (write temp + rename) only after the caller's
  * action completes — so a crash mid-batch reprocesses the batch rather
  * than losing it (at-least-once; pair with an idempotent sink like
  * `Streams.upsertSink` for effective exactly-once — the same
  * contract Structured Streaming's file source keeps in its checkpoint,
  * reduced to its essentials).
  *
  * At 100 TB the thing to avoid is re-LISTING cost, not re-reading: the
  * listing is one directory scan; the new-file set is read as ONE
  * multi-path DataFrame so Spark plans a single scan over exactly the
  * new files.
  */
object Incremental {

  private def readLedger(ledger: java.io.File): Set[String] =
    if (!ledger.exists()) Set.empty
    else {
      val src = scala.io.Source.fromFile(ledger)
      try src.getLines().filter(_.nonEmpty).toSet finally src.close()
    }

  /** Run `process` over files in `inputDir` not yet in the ledger.
    * Returns the number of newly processed files (0 = nothing new,
    * `process` not invoked).
    */
  def processNew(spark: SparkSession, inputDir: String, ledgerPath: String)
                (process: DataFrame => Unit): Int = {
    val ledger = new java.io.File(ledgerPath)
    val seen = readLedger(ledger)
    val files = Option(new java.io.File(inputDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val fresh = files.filterNot(f => seen.contains(f.getName))
    if (fresh.isEmpty) return 0
    process(spark.read.parquet(fresh.map(_.getPath).toIndexedSeq: _*))
    val tmp = new java.io.File(ledgerPath + ".tmp")
    val w = new java.io.PrintWriter(tmp)
    try (seen ++ fresh.map(_.getName)).toSeq.sorted.foreach(w.println)
    finally w.close()
    if (!tmp.renameTo(ledger)) {
      ledger.delete()
      require(tmp.renameTo(ledger), s"could not commit ledger $ledgerPath")
    }
    fresh.length
  }
}
