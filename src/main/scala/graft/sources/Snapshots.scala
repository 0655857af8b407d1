package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot/manifest layer for persisted index datasets — the
  * object-store-safe replacement for directory-swap compaction.
  *
  * Problem: `java.io.File.renameTo` swaps exist only on a local
  * filesystem (a 100 TB index lives on HDFS/S3), and ANY two-rename
  * directory swap has a window where no live directory exists — a
  * concurrent probe's `spark.read.parquet` fails in that window. The
  * standard fix (Delta/Iceberg's core idea, reduced to its minimum) is a
  * MANIFEST: readers never list the data directory; they resolve the
  * current manifest — one tiny immutable file whose creation is atomic —
  * and read exactly the files it names. Maintenance writes new data files
  * FIRST (invisible: nothing references them), then commits a new
  * manifest version; the commit IS the swap. Old files stay on disk until
  * [[vacuum]], so in-flight readers of the previous version keep working.
  *
  * Layout, per dataset rooted at `root` (e.g. `…/ledger/bands`):
  *   - `root/…parquet`              — data files (hive partition subdirs ok)
  *   - `root/_snapshots/v%09d.txt`  — manifest: one root-relative path per
  *     line; highest version = live. Written via temp file + rename (no
  *     overwrite), so a half-written manifest is never visible under a
  *     final name. Underscore-prefixed, so legacy plain-directory readers
  *     ignore it.
  *
  * Readers load the file list with `basePath = root`, so hive partition
  * columns (`cell=N`) and their planning-time pruning survive exactly as
  * with a directory scan.
  *
  * Concurrency contract: ONE maintenance writer at a time per root
  * (append/compact/vacuum are ingest-pipeline jobs) — ENFORCED as an
  * advisory lock by [[withWriterLock]], which every mutator here takes;
  * probes are lock-free and unlimited. Crash safety: the commit point is
  * a single rename — a crash before it leaves orphan data files (removed
  * by the next [[vacuum]]) and the old manifest live; a crash after it
  * leaves stale files (same cleanup). There is NO state in which a reader
  * resolves a partial file set.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API —
  * local, HDFS and S3A behave identically (on S3A the manifest rename is
  * a small-object copy; pair with a coordinator for multi-writer setups,
  * exactly as Delta requires there).
  */
object Snapshots {

  private val SnapDir = "_snapshots"
  private val VersionRe = """^v(\d{9})\.txt$""".r
  private val LockName = ".writer-lock"

  /** Stale-lock takeover age for [[withWriterLock]] (ms): a maintenance
    * op that holds a lock longer than this is presumed crashed and its
    * lock is stolen. Generous — maintenance jobs are minutes, not hours.
    */
  private val LockTtlMs: Long =
    sys.env.get("GRAFT_SNAPSHOT_LOCK_TTL_MS").map(_.toLong).getOrElse(30L * 60 * 1000)

  // re-entrancy: compactCommit runs vacuum inside its own lock; track the
  // roots the CURRENT THREAD already holds so nested acquisition is a no-op
  private val heldLocks = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue() = new java.util.HashSet[String]()
  }

  /** ENFORCE the single-maintenance-writer contract for `root` around
    * `body`: an advisory lock file under `_snapshots/`, acquired by
    * atomic create-no-overwrite (the same primitive the manifest commit
    * relies on), released in a finally, stolen after [[LockTtlMs]] if its
    * holder crashed. Two concurrent maintenance jobs on the same root now
    * fail fast (after a short bounded wait) instead of silently racing
    * their listing/commit sequences — accident PREVENTION; probes stay
    * lock-free and unlimited. This is deliberately advisory: true
    * multi-writer coordination on an object store whose create is not
    * atomic needs an external coordinator, exactly as Delta requires on
    * S3 — documented, not faked here.
    */
  def withWriterLock[A](spark: SparkSession, root: String)(body: => A): A = {
    val held = heldLocks.get()
    if (held.contains(root)) return body // re-entrant within the thread
    val (fs, rootP) = fsFor(spark, root)
    val snapP = new Path(rootP, SnapDir)
    fs.mkdirs(snapP)
    val lockP = new Path(snapP, LockName)
    val deadline = System.currentTimeMillis() + 10000 // bounded wait, then loud
    var acquired = false
    while (!acquired) {
      acquired =
        try { val out = fs.create(lockP, false); out.close(); true }
        catch { case _: java.io.IOException =>
          // steal if the holder looks dead (TTL on the lock file's mtime)
          val stale = try {
            System.currentTimeMillis() - fs.getFileStatus(lockP)
              .getModificationTime > LockTtlMs
          } catch { case _: java.io.FileNotFoundException => false }
          if (stale) fs.delete(lockP, false)
          false
        }
      if (!acquired) {
        require(System.currentTimeMillis() < deadline,
          s"snapshot writer lock busy at $lockP: another maintenance job " +
            "is running (single-maintenance-writer contract); retry later " +
            "or remove the lock if its holder crashed")
        Thread.sleep(100)
      }
    }
    held.add(root)
    try body
    finally {
      held.remove(root)
      try fs.delete(lockP, false) catch { case _: java.io.IOException => () }
    }
  }

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Highest committed manifest version under `root`, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, rootP) = fsFor(spark, root)
    val snapP = new Path(rootP, SnapDir)
    if (!fs.exists(snapP)) return None
    val versions = fs.listStatus(snapP).toSeq.flatMap(st =>
      st.getPath.getName match {
        case VersionRe(v) => Some(v.toLong)
        case _            => None
      })
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** Root-relative live file list of manifest version `v`. */
  def filesAt(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val (fs, rootP) = fsFor(spark, root)
    val in = fs.open(new Path(new Path(rootP, SnapDir), f"v$v%09d.txt"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Live file list (root-relative); None when no manifest exists yet
    * (legacy plain directory — callers fall back to a directory scan).
    */
  def currentFiles(spark: SparkSession, root: String): Option[Seq[String]] =
    currentVersion(spark, root).map(v => filesAt(spark, root, v))

  /** Commit `relFiles` as the next manifest version and return it.
    * Write-temp-then-rename: the version file appears atomically or not
    * at all. Single maintenance writer by contract.
    */
  def commit(spark: SparkSession, root: String, relFiles: Seq[String]): Long = {
    val (fs, rootP) = fsFor(spark, root)
    val snapP = new Path(rootP, SnapDir)
    fs.mkdirs(snapP)
    val next = currentVersion(spark, root).getOrElse(0L) + 1L
    val tmp = new Path(snapP, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(relFiles.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val finalP = new Path(snapP, f"v$next%09d.txt")
    require(fs.rename(tmp, finalP), s"snapshot commit failed: $tmp -> $finalP")
    next
  }

  /** Test hook: when set, receives the root of every [[listParquet]]
    * walk. SnapshotsSpec installs a recorder to PROVE the append path
    * performs no recursive listing of the index tree (only of its own
    * O(delta) staging directory).
    */
  @volatile private[graft] var listProbe: String => Unit = null

  /** Recursive root-relative listing of the data files under `root`
    * (hidden `_`/`.` entries excluded — manifests list data only).
    */
  def listParquet(spark: SparkSession, root: String): Seq[String] = {
    val probe = listProbe
    if (probe != null) probe(root)
    val (fs, rootP) = fsFor(spark, root)
    if (!fs.exists(rootP)) return Nil
    val rootUri = rootP.toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(rootP, true)
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      val rel = p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val hidden = rel.split('/').exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden && p.getName.endsWith(".parquet")) out += rel
    }
    out.toList.sorted
  }

  /** Ensure `root` has a manifest: bootstrap one from a directory listing
    * for datasets written before the snapshot layer existed. Returns the
    * live file list.
    */
  def bootstrap(spark: SparkSession, root: String): Seq[String] =
    currentFiles(spark, root).getOrElse {
      val listed = listParquet(spark, root)
      commit(spark, root, listed)
      listed
    }

  /** Build a DataFrame over an explicit manifest file list. Above 32
    * root paths Spark switches to a PARALLEL listing job
    * (`spark.sql.sources.parallelPartitionDiscovery.threshold`) — right
    * for an object store, where thousands of sequential driver HEADs
    * would dwarf one fleet job, but a pure ~1.2 s scheduling tax on a
    * local filesystem whose stats cost microseconds. Sidestep it for
    * local roots WITHOUT touching session state (mutating the session
    * conf — even restored in a finally — is visible to concurrent
    * planning in the same session): read in ≤32-path groups, each under
    * the sequential-listing threshold, and union. Filters and partition
    * pruning push into every branch identically, and the group count is
    * bounded (≤512 paths → ≤16 branches); past that bound the parallel
    * listing job is genuinely the faster choice even locally.
    */
  private def readFileList(spark: SparkSession, root: String,
                           paths: Seq[String]): DataFrame = {
    val (fs, _) = fsFor(spark, root)
    val local = fs.getScheme == "file"
    if (!local || paths.size <= 32)
      spark.read.option("basePath", root).parquet(paths: _*)
    else if (paths.size <= 512)
      paths.grouped(32)
        .map(g => spark.read.option("basePath", root).parquet(g: _*))
        .reduce(_ unionByName _)
    else spark.read.option("basePath", root).parquet(paths: _*)
  }

  /** Read the live snapshot of `root`. None when the live file set is
    * empty (parquet cannot infer a schema from zero files — callers keep
    * their typed degenerate paths). Falls back to a plain directory scan
    * when no manifest exists (legacy layout).
    *
    * Manifest-resolved reads are memoized per session through
    * [[SnapCache]]: re-opening an unchanged index skips the file-list
    * DataFrame construction (footer schema read + file stats) and costs
    * one tiny manifest read for the fingerprint check. The legacy
    * no-manifest path is never cached — nothing fingerprints it.
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentFiles(spark, root) match {
      case Some(files) if files.isEmpty => None
      case Some(_) =>
        SnapCache.cached(spark, s"snap-read:$root", Seq(root)) {
          val files = currentFiles(spark, root).get
          Some(readFileList(spark, root, files.map(f => s"$root/$f")))
        }
      case None =>
        if (listParquet(spark, root).isEmpty) None
        else Some(spark.read.parquet(root))
    }

  /** Incremental append, O(delta) end to end: run `write` against a
    * fresh hidden staging directory (the function receives its path and
    * must write ONE parquet dataset there — hive partition subdirs fine),
    * list ONLY that directory to learn what the commit wrote, move each
    * file into its final home under `root` (unique part-file names —
    * Spark embeds the write job's UUID — so moves cannot collide), and
    * commit manifest ∪ written.
    *
    * The index tree is NEVER walked: the one recursive listing is of the
    * just-written staging tree, so a micro-batch ingest against a
    * million-file index costs O(batch) filesystem calls, not an
    * O(index-files) LIST storm (the r9 version diffed a full recursive
    * listing against the manifest per append — quadratic across a
    * backfill, and it also resurrected crash-orphaned data files into the
    * live set; committing exactly what THIS commit wrote can't).
    *
    * Staging lives under `root/_staging-<uuid>` — underscore-hidden, so
    * readers and [[listParquet]] never see half-written files. The moves
    * are per-file renames: free on local/HDFS, a copy of the just-written
    * delta on S3A (still O(delta) bytes; the zero-copy upgrade there is a
    * manifest format that can reference files in nested commit
    * directories, which Spark's flat hive partition inference rules out —
    * mixed-depth file sets raise CONFLICTING_DIRECTORY_STRUCTURES).
    * Crash safety: a crash before the manifest commit leaves only
    * unreferenced files ([[vacuum]] removes them and any stray staging
    * dirs); the commit itself is the same single rename as ever.
    */
  def appendCommit(spark: SparkSession, root: String)(write: String => Unit): Long =
      withWriterLock(spark, root) {
    val before = bootstrap(spark, root) // manifest read; lists only on first touch
    val (fs, rootP) = fsFor(spark, root)
    val staging = new Path(rootP, s"_staging-${java.util.UUID.randomUUID()}")
    write(staging.toString)
    val written = listParquet(spark, staging.toString)
    written.foreach { rel =>
      val dst = new Path(rootP, rel)
      val parent = dst.getParent
      if (!fs.exists(parent)) fs.mkdirs(parent)
      require(fs.rename(new Path(staging, rel), dst),
        s"snapshot append move failed: $staging/$rel -> $dst")
    }
    fs.delete(staging, true)
    commit(spark, root, (before ++ written).distinct.sorted)
  }

  /** Compact the live files matching `subset` into ⌈bytes/targetBytes⌉
    * files (re-clustered on `sortCols` when given, re-partitioned into
    * hive dirs by `partitionBy` when given), commit the swap, and vacuum
    * with one version of grace. Readers see either the pre- or
    * post-compaction file set — never a mixture, never a missing
    * directory. `transform` rewrites the row set on the way through
    * (identity by default) — the hook tombstone PURGES ride on, since
    * physically dropping deleted rows is exactly a compaction that
    * filters. Returns (filesBefore, filesAfter) over the subset.
    */
  def compactCommit(spark: SparkSession, root: String,
                    subset: String => Boolean, targetBytes: Long,
                    sortCols: Seq[String] = Nil,
                    partitionBy: Seq[String] = Nil,
                    transform: DataFrame => DataFrame = identity): (Long, Long) =
      withWriterLock(spark, root) {
    import org.apache.spark.sql.functions.col
    require(targetBytes > 0, "targetBytes must be positive")
    val (fs, rootP) = fsFor(spark, root)
    val live = bootstrap(spark, root)
    val (oldSubset, kept) = live.partition(subset)
    if (oldSubset.isEmpty) return (0L, 0L)
    val totalBytes = oldSubset.map(f =>
      fs.getFileStatus(new Path(rootP, f)).getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = transform(readFileList(spark, root,
      oldSubset.map(f => s"$root/$f")))
    val rewritten =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    val before = listParquet(spark, root).toSet
    val w = rewritten.write.mode(org.apache.spark.sql.SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(root)
    val newFiles = listParquet(spark, root).filterNot(before)
    commit(spark, root, (kept ++ newFiles).sorted)
    vacuum(spark, root)
    (oldSubset.size.toLong, newFiles.size.toLong)
  }

  /** Delete data files referenced by NO kept manifest (keep = the live
    * version plus `grace` older ones — in-flight readers of the previous
    * version finish safely) and drop manifests older than the kept set.
    * Returns the number of data files deleted.
    */
  def vacuum(spark: SparkSession, root: String, grace: Int = 1): Long =
      withWriterLock(spark, root) {
    val (fs, rootP) = fsFor(spark, root)
    val snapP = new Path(rootP, SnapDir)
    if (!fs.exists(snapP)) return 0L
    val versions = fs.listStatus(snapP).toSeq.flatMap(st =>
      st.getPath.getName match {
        case VersionRe(v) => Some(v.toLong)
        case _            => None
      }).sorted.reverse
    if (versions.isEmpty) return 0L
    val keptVs = versions.take(1 + math.max(0, grace))
    val referenced = keptVs.flatMap(v => filesAt(spark, root, v)).toSet
    var deleted = 0L
    listParquet(spark, root).filterNot(referenced).foreach { rel =>
      if (fs.delete(new Path(rootP, rel), false)) deleted += 1
    }
    versions.drop(keptVs.length).foreach(v =>
      fs.delete(new Path(snapP, f"v$v%09d.txt"), false))
    // stray temp manifests from crashed commits
    fs.listStatus(snapP).foreach(st =>
      if (st.getPath.getName.startsWith(".tmp-")) fs.delete(st.getPath, false))
    // stray staging trees from crashed appendCommits (hidden from readers;
    // safe to remove here — vacuum is a maintenance call, and the
    // single-maintenance-writer contract means no append is in flight)
    fs.listStatus(rootP).foreach(st =>
      if (st.isDirectory && st.getPath.getName.startsWith("_staging-"))
        fs.delete(st.getPath, true))
    deleted
  }
}
