package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{LoadMode, TableRef}
import graft.operators.LoadOps

/** A parquet-directory warehouse: each table is `<root>/<schema>/<table>`,
  * giving the engine a native place to EXECUTE load semantics (the reference
  * delegates this step to Redshift; our engine runs it on Spark —
  * SURVEY.md §3.4).
  *
  * Merge atomicity without a transactional format (SURVEY.md §7.4): the
  * merged result is materialized to a fresh versioned directory, then the
  * live version pointer (a tiny `_VERSION` file) is swapped — readers see
  * old or new, never a mix.
  *
  * Concurrent writers are OPTIMISTIC, the reference's X2 philosophy
  * (core.ts:49-53 retries on Redshift serialization failure rather than
  * locking): every pointer swap is a compare-and-swap against the version
  * the operation's CONTENTS were computed from, taken under a short
  * create-exclusive `_COMMIT_LOCK` critical section (milliseconds — the
  * merge/write jobs run outside it). A writer that lost the race gets a
  * loud [[ParquetWarehouse.ConcurrentWriteException]] — its merge read a
  * base that is no longer current, so silently swapping would DROP the
  * winner's rows (lost update) — and [[ParquetWarehouse.loadWithRetry]]
  * (the committed load path) re-runs the whole load against the new
  * current version on the reference's backoff schedule, exactly the X2
  * loop. Version-dir
  * names are unique (millis + uuid), so the loser's materialized dir is
  * ordinary garbage for the retention sweep, never a torn table.
  *
  * Known optimism gap, documented not hidden: a file-granular INSERT
  * landing in the current version dir WHILE a concurrent upsert/compact
  * is already re-reading that same dir may miss the late files in the
  * merged result. The insert path re-checks the pointer after its append
  * and fails loudly when the swap already happened; the sub-second
  * in-flight window is closable only by holding the lock across whole
  * load jobs (pessimistic writer serialization) — the wrong trade for a
  * warehouse whose writers are rare and retryable. */
final class ParquetWarehouse(spark: SparkSession, root: String) {
  import ParquetWarehouse.ConcurrentWriteException

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def tableDir(t: TableRef): String =
    if (t.schema.isEmpty) s"$root/${t.table}" else s"$root/${t.schema}/${t.table}"

  private def versionFile(t: TableRef) = new Path(s"${tableDir(t)}/_VERSION")
  private def partitionFile(t: TableRef) = new Path(s"${tableDir(t)}/_PARTITIONING")

  private def currentVersion(t: TableRef): Option[String] = {
    val vf = versionFile(t)
    if (!fs.exists(vf)) None
    else {
      val in = fs.open(vf)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  private def setVersion(t: TableRef, v: String): Unit = {
    val tmp = new Path(s"${tableDir(t)}/_VERSION.next")
    val out = fs.create(tmp, true)
    try out.write(v.getBytes("UTF-8"))
    finally out.close()
    fs.delete(versionFile(t), false)
    fs.rename(tmp, versionFile(t)) // atomic pointer swap on HDFS-like FS
  }

  def exists(t: TableRef): Boolean = currentVersion(t).isDefined

  /** Modification time of the live version POINTER (not the data files)
    * as the filesystem reports it, or None when the table has no live
    * pointer. The pointer is committed last (create-then-swap), so this
    * is the commit time of the current generation — the signal
    * [[graft.io.ModelStore.gc]] keys its drop-safety re-check on.
    * Encapsulated here so a layout change can't silently strand gc on a
    * hand-derived path. */
  def versionMtime(t: TableRef): Option[Long] = {
    val vf = versionFile(t)
    // exists-then-stat is not atomic: a concurrent drop between the two
    // calls must read as "pointer gone" (None — the caller's skip
    // signal), not throw and abort the caller's whole sweep.
    try {
      if (fs.exists(vf)) Some(fs.getFileStatus(vf).getModificationTime)
      else None
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Partition columns declared at table creation (Hive-style layout —
    * the 100 TB data-skipping lever: a filter on a partition column prunes
    * whole directories before any IO). Persisted next to the version
    * pointer so every later load/compact keeps the layout. */
  def partitioning(t: TableRef): Seq[String] = {
    val pf = partitionFile(t)
    if (!fs.exists(pf)) Seq.empty
    else {
      val in = fs.open(pf)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .trim.split(',').toSeq.filter(_.nonEmpty)
      finally in.close()
    }
  }

  def table(t: TableRef): DataFrame =
    // mergeSchema: appended file sets may carry evolved (widened)
    // schemas — union the footer schemas so new columns surface as
    // nulls on old files (schema-evolution-on-read; the reference
    // delegates the same problem to Redshift's `columnMap 'auto'`,
    // utils.ts:34). Footer-schema merge is metadata-scale work.
    spark.read.option("mergeSchema", "true")
      .parquet(s"${tableDir(t)}/${currentVersion(t).getOrElse(
        throw new IllegalArgumentException(s"no such table: ${t.qualified}"))}")

  /** Run `body` holding the table's create-exclusive `_COMMIT_LOCK` —
    * the millisecond critical section that makes check-pointer-then-swap
    * atomic. Three hardenings over naive create/delete locking:
    *
    *   - **O_EXCL on local FS**: Hadoop `RawLocalFileSystem.create(…,
    *     overwrite = false)` is exists-check-then-create, NOT atomic —
    *     two local writers can both "create" the lock. For `file:`/
    *     schemeless paths the primitive is `java.nio.Files.createFile`
    *     (true O_EXCL); HDFS-like filesystems keep `fs.create` (atomic
    *     at the namenode).
    *   - **Ownership token**: each acquisition writes a unique token and
    *     re-reads it before entering the section — on any filesystem
    *     whose create-exclusive is still check-then-create, the last
    *     token written wins the file and ONLY that writer proceeds; the
    *     other treats its "successful" create as contention. Release
    *     re-verifies the token, so a writer whose lock was (mis-)stolen
    *     mid-hold never deletes the thief's live lock.
    *   - **Steal by rename, not delete**: a lock left by a crashed
    *     writer (it only ever guards a sub-second section) is presumed
    *     stale past [[ParquetWarehouse.LockStaleMs]] — but deleting it
    *     has a TOCTOU (the waiter could delete a lock another stealer
    *     just re-created). Rename is atomic on POSIX and HDFS: only the
    *     one waiter whose rename succeeds reaps the corpse; everyone
    *     then competes for a fresh create.
    *
    * Younger contention waits briefly, then fails loudly (retryable
    * [[ParquetWarehouse.ConcurrentWriteException]]) rather than wedging. */
  private[graft] def withCommitLock[A](t: TableRef)(body: => A): A = {
    val lock = new Path(s"${tableDir(t)}/_COMMIT_LOCK")
    fs.mkdirs(new Path(tableDir(t)))
    val token = java.util.UUID.randomUUID().toString
    var acquired = false
    var waitedMs = 0L
    while (!acquired) {
      if (tryCreateExclusive(lock, token) && readLockToken(lock).contains(token))
        acquired = true
      else {
        val age = try System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime
        // Lock vanished between create-fail and stat (owner released):
        // age 0 → no steal, immediate re-try of the create.
        catch { case _: java.io.FileNotFoundException => 0L }
        if (age > ParquetWarehouse.LockStaleMs) {
          val grave = new Path(s"${tableDir(t)}/_COMMIT_LOCK.stale." +
            java.util.UUID.randomUUID().toString.take(8))
          try { if (fs.rename(lock, grave)) fs.delete(grave, false) }
          catch { case _: java.io.IOException => () } // another stealer won
        } else if (waitedMs >= 2000)
          throw new ConcurrentWriteException(
            s"commit lock on ${t.qualified} held for ${waitedMs} ms by a " +
              s"live writer ($lock) — concurrent load in progress; retry")
        else { Thread.sleep(50); waitedMs += 50 }
      }
    }
    try body finally {
      if (readLockToken(lock).contains(token)) fs.delete(lock, false)
    }
  }

  /** Create the lock file exclusively and stamp it with `token`. Local
    * paths go through java.nio (O_EXCL); remote ones through the
    * filesystem's own create-exclusive. False = already held. */
  private def tryCreateExclusive(lock: Path, token: String): Boolean = {
    val uri = lock.toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      try {
        val p = java.nio.file.Paths.get(uri.getPath)
        java.nio.file.Files.createFile(p)
        java.nio.file.Files.write(p, token.getBytes("UTF-8"))
        true
      } catch { case _: java.io.IOException => false }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  private def readLockToken(lock: Path): Option[String] =
    try {
      val in = fs.open(lock)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Write a brand-new version dir (honoring the table's partition
    * layout) and compare-and-swap the pointer to it: the swap commits
    * only if the live version still equals `base` — the version this
    * df's contents were computed FROM (None = expected absent). A lost
    * race throws [[ParquetWarehouse.ConcurrentWriteException]] and
    * removes the orphaned dir; the caller retries against the new
    * current (the X2 loop).
    *
    * Retention: the immediately-replaced version is KEPT (deleted only
    * by the commit after next) so readers that resolved the pointer just
    * before the swap can still finish against the old file set — the
    * same reader-grace idea snapshot formats use. Disk cost is bounded
    * at one extra generation per table. */
  private def commitNewVersion(t: TableRef, df: DataFrame,
      base: Option[String]): Unit = {
    val v = s"v_${System.currentTimeMillis()}_${java.util.UUID.randomUUID().toString.take(8)}"
    val w = df.write.mode("errorifexists")
    val parts = partitioning(t)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .parquet(s"${tableDir(t)}/$v")
    // The locked section is ONLY read-pointer / CAS / write-pointer /
    // list — sub-millisecond metadata ops, which is what justifies the
    // 30 s staleness bound. Recursive deletes (the retention sweep and
    // the loser's orphan dir) can take arbitrarily long on an object
    // store, so they run OUTSIDE the lock: the sweep list is captured
    // under the lock (names that existed at swap time, minus the new
    // current and the reader-grace generation — a later commit always
    // mints a fresh unique name, so nothing captured can become live),
    // making the deferred deletes idempotent garbage collection.
    val sweep: Either[Option[String], Seq[String]] = withCommitLock(t) {
      val cur = currentVersion(t)
      if (cur != base) Left(cur)
      else {
        setVersion(t, v)
        Right(fs.listStatus(new Path(tableDir(t)))
          .filter(_.isDirectory).map(_.getPath.getName)
          .filter(n => n.startsWith("v_") && n != v && !base.contains(n))
          .toSeq)
      }
    }
    sweep match {
      case Left(cur) =>
        fs.delete(new Path(s"${tableDir(t)}/$v"), true) // orphan, not a lost table
        throw new ConcurrentWriteException(
          s"lost update on ${t.qualified}: computed from " +
            s"${base.getOrElse("<absent>")} but live version is " +
            s"${cur.getOrElse("<absent>")} — a concurrent writer " +
            "committed first; re-run the load against the new current")
      case Right(olds) =>
        olds.foreach(o => fs.delete(new Path(s"${tableDir(t)}/$o"), true))
    }
  }

  def create(t: TableRef, df: DataFrame, partitionBy: Seq[String] = Seq.empty): Unit = {
    require(!exists(t), s"table exists: ${t.qualified}")
    if (partitionBy.nonEmpty) {
      val out = fs.create(partitionFile(t), true)
      try out.write(partitionBy.mkString(",").getBytes("UTF-8"))
      finally out.close()
    }
    commitNewVersion(t, df, base = None)
  }

  /** Execute a load natively on Spark (L1/L2/L3 semantics via
    * [[graft.operators.LoadOps]]). */
  def load(mode: LoadMode, t: TableRef, staged: DataFrame, idField: String = "id"): Unit =
    mode match {
      case LoadMode.Insert =>
        // Append is file-granular: new parquet parts land inside the CURRENT
        // version dir — no rewrite of existing data (100 TB discipline).
        currentVersion(t) match {
          case Some(v) =>
            val w = staged.write.mode("append")
            val parts = partitioning(t)
            (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
              .parquet(s"${tableDir(t)}/$v")
            // Post-append race check: if a concurrent writer swapped the
            // pointer while we appended, our files landed in a RETIRED
            // generation (invisible, swept by the commit after next) —
            // fail loudly so the caller re-runs, never silently "loads"
            // rows no reader will see.
            val nowCur = currentVersion(t)
            if (nowCur != Some(v))
              throw new ConcurrentWriteException(
                s"lost append on ${t.qualified}: appended into $v but " +
                  s"live version is ${nowCur.getOrElse("<absent>")} — a " +
                  "concurrent writer swapped mid-append; re-run the load")
          case None => commitNewVersion(t, staged, base = None)
        }
      case LoadMode.TruncateInsert =>
        commitNewVersion(t, LoadOps.overwrite(staged),
          base = currentVersion(t))
      case LoadMode.Upsert =>
        currentVersion(t) match {
          case None => commitNewVersion(t, staged, base = None)
          case base @ Some(v) =>
            // Merge reads the PINNED base dir, not the live pointer: the
            // CAS below certifies exactly "merged from what is still
            // current", so the read and the check must name one version.
            val baseDf = spark.read.option("mergeSchema", "true")
              .parquet(s"${tableDir(t)}/$v")
            commitNewVersion(t, LoadOps.merge(baseDf, staged, idField), base)
        }
    }

  /** The reference's X2 conflict loop executed natively, end-to-end: run
    * [[load]], and when it loses a concurrent-writer race re-run the
    * WHOLE load against the new current version with the reference's
    * 1 s·3ⁿ backoff schedule (core.ts:49-53 re-runs the entire
    * transaction on a Redshift serialization failure; here the
    * retryable conflict class is [[ParquetWarehouse.ConcurrentWriteException]]).
    * Each retry re-resolves the live pointer, so an upsert re-merges
    * against the winner's committed state and an append re-lands its
    * files in the live generation — both racing writers' rows end up in
    * the table. `sleeper` is injectable so specs don't wait out the
    * schedule. */
  def loadWithRetry(mode: LoadMode, t: TableRef, staged: DataFrame,
      idField: String = "id", maxRetries: Int = 4,
      sleeper: Long => Unit = Thread.sleep): Unit = {
    var retry = 0
    var done = false
    while (!done) {
      try { load(mode, t, staged, idField); done = true }
      catch { case e: ConcurrentWriteException =>
        if (retry >= maxRetries) throw e
        sleeper(graft.exec.RetryingTxnRunner.backoffMs(retry))
        retry += 1
      }
    }
  }

  /** Small-file compaction: rewrite the current version into `nFiles`
    * part files and swap the pointer. Incremental appends (L1) accumulate
    * one file set per load job; at warehouse scale the read cost of many
    * small parquet files dominates — periodic compaction is the standard
    * remedy. Atomic like every other version swap: readers see the old
    * file set until the pointer moves. */
  /** All retained version ids, oldest first (the fixed-width millis
    * prefix makes lexicographic order chronological). The write path
    * retains exactly {current, previous}, so this is the time-travel
    * horizon: one generation back. */
  def versions(t: TableRef): Seq[String] =
    fs.listStatus(new Path(tableDir(t)))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("v_")).sorted.toSeq

  /** Time-travel read of a specific retained version (ids from
    * [[versions]]); the CURRENT pointer is untouched — this is a read,
    * not a rollback. */
  def tableAt(t: TableRef, version: String): DataFrame = {
    require(versions(t).contains(version),
      s"version $version not retained for ${t.qualified} " +
        s"(have: ${versions(t).mkString(",")})")
    spark.read.option("mergeSchema", "true")
      .parquet(s"${tableDir(t)}/$version")
  }

  /** Roll the CURRENT pointer back to the previous retained version (the
    * load-went-bad escape hatch; the bad version stays on disk until the
    * next commit's retention pass). */
  def rollback(t: TableRef): Unit = withCommitLock(t) {
    val cur = currentVersion(t).getOrElse(
      throw new IllegalArgumentException(s"no such table: ${t.qualified}"))
    val prev = versions(t).filter(_ != cur).lastOption.getOrElse(
      throw new IllegalStateException(
        s"no previous version retained for ${t.qualified}"))
    setVersion(t, prev)
  }

  /** VACUUM (the `VACUUM ... RETAIN 0` analog): immediately delete every
    * retained version EXCEPT current, reclaiming the previous
    * generation's storage at the cost of the rollback/time-travel
    * horizon. The write path already bounds retention at one generation
    * ([[commitNewVersion]]); this is the explicit storage-reclaim hook
    * for tables whose previous version is large and no longer needed. */
  def vacuum(t: TableRef): Unit = {
    val cur = currentVersion(t).getOrElse(
      throw new IllegalArgumentException(s"no such table: ${t.qualified}"))
    versions(t).filter(_ != cur)
      .foreach(o => fs.delete(new Path(s"${tableDir(t)}/$o"), true))
  }

  /** Current version + a read PINNED to it (one resolution serves both
    * the rewrite input and the CAS expectation — the compact/zorder
    * twin of the upsert path's pinned base). */
  private def pinnedRead(t: TableRef): (Option[String], DataFrame) = {
    val v = currentVersion(t).getOrElse(
      throw new IllegalArgumentException(s"no such table: ${t.qualified}"))
    (Some(v), spark.read.option("mergeSchema", "true")
      .parquet(s"${tableDir(t)}/$v"))
  }

  def compact(t: TableRef, nFiles: Int): Unit = {
    val (base, df) = pinnedRead(t)
    commitNewVersion(t, df.repartition(nFiles), base)
  }

  /** Z-order compaction (the OPTIMIZE ZORDER BY analog): rewrite the
    * current version clustered on the Morton interleave of two columns,
    * so file min/max stats prune range predicates on EITHER dimension
    * (see [[graft.operators.LayoutOps]]). Same atomic version swap as
    * [[compact]] — readers never see a half-written layout. */
  def compactZorder(t: TableRef, x: String, y: String, nFiles: Int,
      bits: Int = 16): Unit = {
    val (base, df) = pinnedRead(t)
    commitNewVersion(t, graft.operators.LayoutOps.zorder(
      df, org.apache.spark.sql.functions.col(x),
      org.apache.spark.sql.functions.col(y), nFiles, bits), base)
  }

  /** Data files of the live version (for file-count/size accounting).
    * Recursive: partitioned tables keep their parquet parts inside
    * partition subdirectories. */
  def dataFiles(t: TableRef): Seq[String] = {
    val v = currentVersion(t).getOrElse(
      throw new IllegalArgumentException(s"no such table: ${t.qualified}"))
    val it = fs.listFiles(new Path(s"${tableDir(t)}/$v"), true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) out += n
    }
    out.result()
  }

  def drop(t: TableRef): Unit = { fs.delete(new Path(tableDir(t)), true); () }

  /** Tables of a schema: child directories holding a _VERSION pointer
    * (half-created or foreign directories are ignored). Listing-only —
    * one FS list plus one existence probe per child. */
  def tables(schema: String): Seq[TableRef] = {
    val dir = new Path(if (schema.isEmpty) root else s"$root/$schema")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(st => TableRef(schema, st.getPath.getName))
      .filter(t => fs.exists(versionFile(t)))
  }
}

object ParquetWarehouse {

  /** A version swap (or file-granular append) lost a concurrent-writer
    * race: the operation's contents were computed from a base that is no
    * longer the live version, so committing would silently drop the
    * winner's rows. The resolution is the reference's X2 loop — re-run
    * the load against the new current version (the retryable-conflict
    * class, like Redshift's serializable-isolation failure). */
  final class ConcurrentWriteException(msg: String)
    extends RuntimeException(msg)

  /** Age past which a `_COMMIT_LOCK` is presumed crashed and stolen: the
    * lock only ever guards a sub-second pointer check-and-swap, never a
    * data write, so 30 s is 2+ orders above any live hold. */
  val LockStaleMs: Long = 30000L
}
