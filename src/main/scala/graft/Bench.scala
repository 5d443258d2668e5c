package graft

/** Benchmark main. Prints ONE final JSON line (the driver contract):
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"failed":[]}`.
  *
  * Methodology: each query runs `SPARK_GRAFT_BENCH_REPEATS` times
  * (default 3, matching the min-of-3 the round-close BENCH_DELTA
  * comparisons quote — the committed artifact and the quoted
  * methodology must agree) and reports the MIN — the first execution of a query
  * shape pays whole-stage-codegen compilation + JIT (measured 2-3x on
  * sub-second queries; round 4's "scd2_asof_lookup 2.1x regression" was
  * exactly this, on byte-identical code), so one-shot timings compare
  * noise, not plans.
  *
  * Output size: per-query seconds are rounded to 4 decimals, emitted in
  * small `bench_chunk` lines plus a top-10 summary line FIRST, and the
  * FINAL stdout line is the full total JSON with the COMPLETE per-query
  * map (also written to `SPARK_GRAFT_BENCH_OUT`, default
  * `BENCH_LOCAL.json`). The r12-r21 shape printed only the 10 slowest
  * on the total line out of fear the ~6 KB full map would outgrow the
  * driver's tail capture — but the driver's parser verifiably REQUIRES
  * the full map as the last line (BENCH_r20/r21 both landed
  * parsed:null on the 1.4 KB top-10 line, and the r21 tail shows the
  * capture window held it with room to spare), so the full-map line
  * goes last and the redundant early lines remain as insurance against
  * a head-side cut.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    // Dev-only subset filter (comma-separated names); the driver never
    // sets it, so round benches always cover the full suite. Set-but-
    // EMPTY counts as unset (matching run_bench.sh's `-z` check) — an
    // empty set would silently run zero queries while the shell treats
    // the run as full-suite and archives/diffs the stale reference.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val spark = ToolSession.local(cpus, logLevel = "WARN")
    // Warmup: absorb JVM/codegen/classloading startup so the first measured
    // query isn't charged for it.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val results: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
        val times = (1 to repeats).flatMap { _ =>
          val t0 = System.nanoTime()
          val res =
            try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
            catch { case e: Throwable =>
              if (!failures.contains(name)) {
                failures += name
                System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              }
              None
            }
          // Storage hygiene after EVERY repeat, outside the timed region
          // (see ToolSession.clearStorage — measured: repetition_scores
          // 1.38 s in-suite vs 0.32 s with a clean store, min-of-3
          // both). Per-repeat, not per-query: min-of-N usually selects
          // repeat 2+, and clearing only between queries would leave
          // those repeats running under the storage blocks repeat 1
          // leaked — the same suite-state bias this removes.
          ToolSession.clearStorage(spark)
          res
        }
        name -> (if (times.nonEmpty) times.min else 0.0)
      }
    def fmt(v: Double) = f"$v%.4f"
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // Pipeline vs contract split (r16 verdict ask #5): the recall/
    // evidence contract rows deliberately run truth pipelines (exact +
    // approximate + intersect), so as contracts accumulate the headline
    // increasingly measures the measurement. Both aggregates are
    // emitted so round-over-round comparisons can track shippable
    // operators separately from the measurement harness; the per-query
    // map stays unified (the regression gate diffs every row either way).
    val (contractRows, pipelineRows) =
      results.partition(r => SparkEntry.ContractQueries.contains(r._1))
    val pipelineTotal = pipelineRows.map(_._2).sum
    val contractTotal = contractRows.map(_._2).sum
    val splitFields =
      s""""pipeline_value":${fmt(pipelineTotal)},"n_pipeline":${pipelineRows.size},""" +
        s""""contract_value":${fmt(contractTotal)},"n_contracts":${contractRows.size}"""
    val qsAll = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // The FILE carries the full per-query map (the regression gate's
    // reference); the printed total line carries only the 10 slowest —
    // with 210+ queries the full map outgrew the driver's line capture
    // every round (BENCH_r{4..11}.json all landed parsed:null), and the
    // bench_chunk lines above already carry every timing.
    // n_queries lets the regression gate distinguish a genuine full map
    // from a truncated archive deterministically (len(queries) <
    // n_queries ⇒ refuse) even when BOTH inputs are truncated.
    val contractNames = contractRows.map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val fileLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","repeats":$repeats,"n_queries":${results.size},$splitFields,"contract_queries":$contractNames,"queries":$qsAll,"failed":$fails,"sf":"$sfDir"}"""
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val stdoutLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","repeats":$repeats,"n_queries":${results.size},$splitFields,"failed":$fails,"sf":"$sfDir","queries":$slowest}"""
    // Ordering (r21 verdict item 1): a compact top-10 summary prints
    // FIRST (survives a tail-side cut), the bench_chunk lines follow
    // (per-query timings survive a cut at either end), and the LAST
    // stdout line is the full-map total JSON — the shape the driver's
    // parser actually accepts. r12-r21 printed the top-10 line last and
    // the driver landed parsed:null every round; the r21 tail capture
    // demonstrably held ~1.4 KB of final line plus ~6 KB of chunks, so
    // the ~6 KB full-map line fits the window.
    println(stdoutLine)
    val chunks = results.grouped(25).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      val qs = c.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      println(s"""{"metric":"bench_chunk","part":${i + 1},"of":${chunks.size},"queries":$qs}""")
    }
    // Subset runs must not overwrite the full-suite map the regression
    // gate diffs against.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      fileLine.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    // THE driver contract line: full per-query map, printed last.
    println(fileLine)
    spark.stop()
  }
}
