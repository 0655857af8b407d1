package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Row-level deletion for persisted index artifacts — the "forget" path.
  *
  * A GDPR erasure against a 100 TB index cannot be a synchronous rewrite;
  * the standard shape (Delta deletion vectors, Lucene live-docs) is a
  * TOMBSTONE set consulted at read time and physically applied by the
  * next maintenance rewrite:
  *
  *  1. [[add]] appends the ids to a tiny `tombstones/` dataset (its own
  *     snapshot manifest — O(deleted) cost, atomic commit);
  *  2. probes anti-join their candidate stream against the (broadcast)
  *     tombstone set, so deleted ids stop matching IMMEDIATELY;
  *  3. compaction/retrain pass the anti-join as their rewrite transform,
  *     physically dropping the rows, then [[clear]] the set.
  *
  * Clearing after the purge is deliberately a separate commit: the
  * anti-join is idempotent, so a crash between purge and clear (or a
  * probe racing the pair) stays correct — tombstones for already-purged
  * ids filter nothing.
  */
object Tombstones {

  private def dir(root: String) = s"$root/tombstones"

  /** Record `ids` (any type; one column) as deleted. */
  def add(ids: DataFrame, root: String): Unit = {
    val spark = ids.sparkSession
    val one = ids.toDF("id").distinct()
    Snapshots.appendCommit(spark, dir(root)) { staging =>
      one.coalesce(1) // deletion batches are small by nature
        .write.parquet(staging)
    }
  }

  /** The live deleted-id set; None when nothing is tombstoned (the
    * common case — callers skip the anti-join entirely, keeping
    * delete-free plans unchanged).
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    Snapshots.read(spark, dir(root))

  /** Drop all tombstones (call only after a rewrite physically removed
    * the rows). Atomic: one empty-manifest commit.
    */
  def clear(spark: SparkSession, root: String): Unit =
    if (Snapshots.currentVersion(spark, dir(root)).nonEmpty) {
      Snapshots.commit(spark, dir(root), Nil)
      Snapshots.vacuum(spark, dir(root))
    }

  /** `df` minus tombstoned rows (on `idCol`); identity when the set is
    * empty. The tombstone side is broadcast — it is O(deleted this
    * cycle), never corpus-sized.
    */
  def filter(spark: SparkSession, root: String, df: DataFrame,
             idCol: String): DataFrame =
    read(spark, root) match {
      case Some(ts) =>
        df.join(broadcast(ts.select(col("id").as("__dead__"))),
          col(idCol) === col("__dead__"), "left_anti")
      case None => df
    }
}
