package graft.tools

import java.io.{File, PrintWriter}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.core.TableRef
import graft.io.ParquetWarehouse

/** Commit-lock stress probe — the stampede spec's scenario run N times
  * (default 60) as a checked tool: each round plants a crashed writer's
  * stale `_COMMIT_LOCK` and stampedes 6 real threads through
  * `withCommitLock`, asserting (a) mutual exclusion (never two holders),
  * (b) no contention error under a generous budget, (c) no lock residue.
  * Exits nonzero on any violation — a check, not a measurement.
  *
  * History, because this probe exists for a reason: the stampede spec
  * caught THREE successive steal designs losing the same race family
  * (~1-in-6 per 6-thread round) — delete-based steal (yanked a
  * recreated live lock), rename-restore steal (left the path empty long
  * enough to admit a third writer; its restore could also orphan a
  * fresh-looking lock into a 30 s wedge), and the first ticketed reap
  * (the staleness stat and the incarnation-identity stat were two
  * separate calls, so the ticket could name a FRESH incarnation —
  * caught by the env-gated GRAFT_LOCK_TRACE=1 interleaving log). The
  * shipped design — one stat for both decisions, O_EXCL per-incarnation
  * reap ticket, re-stat immediately before the delete — survives this
  * probe where all three predecessors failed within ~6 rounds.
  *
  * Usage: graft.tools.LockStressProbe [jsonOut] [rounds] */
object LockStressProbe {
  def main(args: Array[String]): Unit = {
    val jsonOut = args.headOption.getOrElse("LOCK_STRESS_PROBE.json")
    val rounds = if (args.length > 1) args(1).toInt else 60
    val spark = graft.ToolSession.local("8", logLevel = "ERROR")
    import spark.implicits._
    var worstMax = 0
    var errCount = 0
    val t0 = System.nanoTime()
    (1 to rounds).foreach { round =>
      val root = Files.createTempDirectory("lockstress").toString
      val wh = new ParquetWarehouse(spark, root)
      val t = TableRef("", "race")
      wh.create(t, Seq((1L, "base")).toDF("id", "v"))
      val lock = Paths.get(s"$root/race/_COMMIT_LOCK")
      Files.createFile(lock)
      lock.toFile.setLastModified(
        System.currentTimeMillis() - 2 * ParquetWarehouse.LockStaleMs)
      val active = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (1 to 6).map(i => new Thread(() =>
        try wh.withCommitLock(t, waitBudgetMs = 20000) {
          val a = active.incrementAndGet()
          maxActive.updateAndGet(m => math.max(m, a))
          Thread.sleep(20)
          active.decrementAndGet(); ()
        } catch { case e: Throwable => errs.add(e) }, s"W$round-$i"))
      threads.foreach(_.start()); threads.foreach(_.join())
      worstMax = math.max(worstMax, maxActive.get())
      errCount += errs.size()
      require(maxActive.get() == 1,
        s"round $round: ${maxActive.get()} writers inside the critical section")
      require(errs.isEmpty,
        s"round $round: contention failed to resolve: ${errs.peek()}")
      require(!Files.exists(lock), s"round $round: lock residue")
      // Temp roots accumulate ~1 tiny table per round; leave to /tmp.
    }
    val secs = (System.nanoTime() - t0) / 1e9

    // ---- Fence-window latency (r20, verdict ask #7): the documented
    // cross-node double-commit residual is the gap between the commit
    // fence's token re-read and the pointer rename
    // (withCommitLockFenced header). Measure exactly that sequence —
    // token read, tmp write, dest delete, rename (setVersion's ops) —
    // so CONTRACTS can bound the residual with a number instead of the
    // word "microseconds". A double commit additionally requires a
    // reaper to decide 30 s staleness AND a second writer to finish
    // its own CAS inside this window, so the measured p99 is the
    // window's SIZE, not its probability.
    val fenceRoot = Files.createTempDirectory("lockfence").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    val hfs = new org.apache.hadoop.fs.Path(fenceRoot).getFileSystem(hconf)
    val lockP = new org.apache.hadoop.fs.Path(s"$fenceRoot/_COMMIT_LOCK")
    val verP = new org.apache.hadoop.fs.Path(s"$fenceRoot/_VERSION")
    val tmpP = new org.apache.hadoop.fs.Path(s"$fenceRoot/_VERSION.next")
    def put(p: org.apache.hadoop.fs.Path, s: String): Unit = {
      val o = hfs.create(p, true); try o.write(s.getBytes("UTF-8")) finally o.close()
    }
    put(lockP, "tok-fence-probe")
    put(verP, "v_0")
    val nIters = 2000
    val lat = new Array[Double](nIters)
    (0 until nIters).foreach { i =>
      val s0 = System.nanoTime()
      val in = hfs.open(lockP)
      try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      put(tmpP, s"v_$i")
      hfs.delete(verP, false)
      hfs.rename(tmpP, verP)
      lat(i) = (System.nanoTime() - s0) / 1e3 // us
    }
    java.util.Arrays.sort(lat)
    val (fP50, fP99, fMax) =
      (lat(nIters / 2), lat(nIters * 99 / 100), lat(nIters - 1))

    println(s"\n## Commit-lock stampede stress: $rounds rounds x 6 threads, " +
      s"planted stale corpse each round\n")
    println("| check | measured | bound |")
    println("|---|---|---|")
    println(s"| max concurrent holders (worst round) | $worstMax | = 1 |")
    println(s"| contention errors | $errCount | = 0 |")
    println(f"| wall | $secs%.1f s | |")
    println(f"| fence-read-to-rename window ($nIters iters) | p50 $fP50%.0f / p99 $fP99%.0f / max $fMax%.0f us | the documented residual's SIZE |")
    val pw = new PrintWriter(new File(jsonOut))
    try pw.println(f"""{"rounds":$rounds,"threads":6,"worst_max_active":$worstMax,"errors":$errCount,"secs":$secs%.1f,"fence_window_iters":$nIters,"fence_window_us_p50":$fP50%.1f,"fence_window_us_p99":$fP99%.1f,"fence_window_us_max":$fMax%.1f}""")
    finally pw.close()
    System.err.println(s"wrote $jsonOut")
    spark.stop()
  }
}
