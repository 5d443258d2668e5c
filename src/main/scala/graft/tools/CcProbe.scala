package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Adversarial-topology probe for [[DedupOps.connectedComponents]]: runs
  * the production CC loop on PLANTED worst-case graphs far beyond the
  * spec-sized fixtures and reports measured round counts against the
  * documented bound (rounds = JumpDelay + O(log2 diameter) + 1 detection
  * round under delayed pointer doubling).
  *
  * Shapes (all deterministic `spark.range` constructions, no RNG):
  *   - chain n    — path graph, diameter n-1: the neighbor-only killer
  *     (rounds = n there) and the shape the capped-LSH over-cap path
  *     emits for a degenerate mega-bucket. THE pointer-doubling test.
  *   - star n     — one hub, n leaves, diameter 2: converges inside the
  *     jump delay, AND stresses the `repartition(src)` hot key (half the
  *     symmetrized edges share src = hub) — the mega-cluster skew shape
  *     from CONTRACTS §4.
  *   - random n m — m hash-edges over n vertices (xxhash64 endpoints):
  *     many components of assorted shapes, the realistic mixed case.
  *
  * Usage: graft.tools.CcProbe [jsonOut] [maxChain]
  * Emits a paste-ready markdown table (stdout) + a JSON twin, and FAILS
  * (nonzero exit) if any measured round count exceeds the documented
  * bound or any component count is wrong — so the probe is a check, not
  * just a measurement. */
object CcProbe {

  /** `bound = None` marks a measurement-only row (random shape: true
    * diameter has no closed form, so there is nothing to check) — the
    * table prints '—' and the JSON emits null, so a reader can never
    * mistake the row for a verified bound. */
  private case class Probe(shape: String, n: Long, edges: Long,
      diameter: Long, rounds: Int, bound: Option[Int], secs: Double,
      comps: Long)

  /** Documented worst-case rounds for a given diameter: JumpDelay
    * neighbor-only rounds cover distance JumpDelay; each doubling round
    * then doubles the covered distance (coverage after k rounds =
    * JumpDelay·2^(k−JumpDelay)); +1 round of equal-checksum convergence
    * detection. Measured EXACT (not just an upper bound) on planted
    * chains from 2 k to 3.1 M links. */
  private def roundBound(diameter: Long): Int = {
    val d = DedupOps.JumpDelay
    if (diameter <= d) diameter.toInt + 1
    else {
      var k = d
      var covered = d.toLong
      while (covered < diameter && k < 64) { covered *= 2; k += 1 }
      // The k < 64 loop guard is an overflow backstop, not a formula
      // term: if it ever bit, the returned "bound" would be smaller
      // than the true formula value and a passing check would be
      // vacuous. No probed diameter can get near 2^61, but assert it
      // so the backstop can never silently weaken the check.
      require(covered >= diameter,
        s"roundBound saturated at k=64 for diameter=$diameter — " +
          "bound formula no longer covers this probe")
      k + 1
    }
  }

  private def run(spark: SparkSession, shape: String, n: Long,
      vertices: DataFrame, pairs: DataFrame, diameter: Long,
      expectComps: Option[Long], checkBound: Boolean = true): Probe = {
    val m = pairs.count()
    val t0 = System.nanoTime()
    val (labels, rounds) =
      DedupOps.connectedComponentsWithRounds(vertices, pairs, "doc_id")
    val comps = labels.agg(countDistinct(col("component"))).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    graft.ToolSession.clearStorage(spark)
    val bound = if (checkBound) Some(roundBound(diameter)) else None
    val ok = bound.forall(rounds <= _) && expectComps.forall(_ == comps)
    System.err.println(f"$shape%-7s n=$n%9d rounds=$rounds%2d " +
      f"bound=${bound.map(_.toString).getOrElse("-")}%s " +
      f"comps=$comps secs=$secs%7.2f ${if (ok) "ok" else "VIOLATION"}")
    bound.foreach(b => require(rounds <= b,
      s"$shape n=$n took $rounds rounds > documented bound $b"))
    expectComps.foreach(e => require(comps == e,
      s"$shape n=$n produced $comps components, expected $e"))
    Probe(shape, n, m, diameter, rounds, bound, secs, comps)
  }

  def main(args: Array[String]): Unit = {
    val jsonOut = args.headOption.getOrElse("CC_PROBE.json")
    val maxChain = if (args.length > 1) args(1).toLong else 1000000L
    val cpus = graft.ToolSession.cpus("32")
    val spark = graft.ToolSession.local(cpus)

    def chain(n: Long): Probe = run(spark, "chain", n,
      spark.range(1, n + 1).select(col("id").as("doc_id")),
      spark.range(1, n)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b")),
      diameter = n - 1, expectComps = Some(1L))

    def star(n: Long): Probe = run(spark, "star", n,
      spark.range(0, n + 1).select(col("id").as("doc_id")),
      spark.range(1, n + 1)
        .select(lit(0L).as("id_a"), col("id").as("id_b")),
      diameter = 2, expectComps = Some(1L))

    // Hash-random m edges over n vertices. True component count/diameter
    // aren't closed-form here, so this row is a measurement, not a
    // check: rounds are bounded only by the worst any n-vertex graph
    // can have (n-1), and the component count is reported as-is.
    // Label-EQUIVALENCE vs the neighbor-only reference on random
    // graphs is already a spec (OperatorsSpec), which is where that
    // correctness contract lives.
    def random(n: Long, m: Long): Probe = {
      val vertices = spark.range(0, n).select(col("id").as("doc_id"))
      val pairs = spark.range(0, m).select(
          pmod(xxhash64(col("id"), lit(1)), lit(n)).as("id_a"),
          pmod(xxhash64(col("id"), lit(2)), lit(n)).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      run(spark, "random", n, vertices, pairs,
        diameter = n - 1, expectComps = None, checkBound = false)
    }

    val chains =
      (Seq(2000L, 20000L, 200000L).filter(_ < maxChain) :+ maxChain).sorted
    val probes = chains.map(chain) :+ star(maxChain) :+
      random(maxChain / 2, maxChain / 2)
    spark.stop()

    println(s"\n## CC adversarial probe (production loop, JumpDelay=" +
      s"${DedupOps.JumpDelay}, maxIter default, local[$cpus])\n")
    println("| shape | n | edges | diameter | rounds | bound | secs |")
    println("|---|---|---|---|---|---|---|")
    probes.foreach { p =>
      val dia = if (p.shape == "random") "<= n-1" else p.diameter.toString
      val b = p.bound.map(_.toString).getOrElse("-")
      println(f"| ${p.shape} | ${p.n} | ${p.edges} | $dia | ${p.rounds} | $b | ${p.secs}%.2f |")
    }
    val json = probes.map { p =>
      val b = p.bound.map(_.toString).getOrElse("null")
      f"""{"shape":"${p.shape}","n":${p.n},"edges":${p.edges},"diameter":${p.diameter},"rounds":${p.rounds},"bound":$b,"secs":${p.secs}%.3f,"components":${p.comps}}"""
    }.mkString(",")
    val pw = new PrintWriter(new File(jsonOut))
    try pw.println(s"""{"jump_delay":${DedupOps.JumpDelay},"cpus":$cpus,"probes":[$json]}""")
    finally pw.close()
    System.err.println(s"wrote $jsonOut")
  }
}
