package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Adversarial SimHash near-dup probe — [[LshCapProbe]]'s twin for the
  * chunk-space banding, whose failure mode is WORSE than MinHash's:
  * the 12-bit chunk key space is fixed at 4×4096 values, so one
  * byte-identical mega-family lands ALL its members in the same 4
  * buckets and the uncapped (c, chunk) self-join is k²/2·4 pairs that
  * ALL pass the hamming filter (hamming = 0 — no downstream threshold
  * saves you, unlike MinHash where est-jaccard prunes cross-family
  * noise). Checked at ~100× the spec-fixture size:
  *
  *   1. candidate pairs stay LINEAR: each of the 4 over-cap buckets
  *      degrades to a (simhash, id)-ordered path ⇒ distinct pairs
  *      ≤ 4·(k−1) (≈ k−1 in practice: identical simhashes order
  *      identically in every chunk);
  *   2. every family edge carries hamming = 0 (within an
  *      identical-simhash run), surviving any maxHamming;
  *   3. [[DedupOps.connectedComponents]] still collapses the family to
  *      ONE component of size k (pointer doubling absorbs path depth);
  *   4. honest unique-text documents contribute only hash-coincidence
  *      candidates and land in singleton components;
  *   5. [[DedupOps.simhashBucketLedger]] reports exactly the 4
  *      over-cap buckets (the in-gate dormancy instrument, here
  *      proven to FIRE when it must).
  *
  * Usage: graft.tools.SimhashCapProbe [jsonOut] [k] [honest]
  * Emits a markdown table + JSON twin; FAILS (nonzero exit) on any
  * bound violation — a check, not just a measurement. */
object SimhashCapProbe {

  def main(args: Array[String]): Unit = {
    val jsonOut = args.headOption.getOrElse("SIMHASH_CAP_PROBE.json")
    val k = if (args.length > 1) args(1).toLong else 1000000L
    val honest = if (args.length > 2) args(2).toLong else 100000L
    val maxHamming = 3
    val cpus = graft.ToolSession.cpus("32")
    val spark = graft.ToolSession.local(cpus)

    // ids [0, k): one byte-identical family; ids [k, k+honest): unique
    // 12-word texts from hashed ids (distinct token multisets ⇒ simhash
    // collisions are genuine near-hash coincidences, reported as-is).
    val dup = spark.range(0, k).select(col("id").as("doc_id"),
      lit("the quick brown fox jumps over the lazy dog again and again")
        .as("text"))
    val hon = spark.range(k, k + honest).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit("w"), pmod(xxhash64(col("id"), lit(i)), lit(1000000L)))): _*)
        .as("text"))
    val corpus = dup.unionByName(hon)

    val t0 = System.nanoTime()
    val cand = DedupOps.simhashCandidates(corpus, "doc_id", "text", maxHamming)
      .localCheckpoint(true)
    val nCand = cand.count()
    val candSecs = (System.nanoTime() - t0) / 1e9
    val fam = cand.filter(col("id_a") < k && col("id_b") < k)
    val nFam = fam.count()
    require(nFam >= k - 1, s"family pairs $nFam < ${k - 1}: path disconnected")
    val maxFamHam = fam.agg(max(col("hamming"))).head().getInt(0)
    val nHon = cand.filter(col("id_a") >= k || col("id_b") >= k).count()

    val led = DedupOps.simhashBucketLedger(corpus, "doc_id", "text").head()
    val (nBuckets, maxBucket, nOverCap) =
      (led.getLong(0), led.getLong(1), led.getLong(2))

    val t1 = System.nanoTime()
    val (labels, rounds) = DedupOps.connectedComponentsWithRounds(
      corpus.select(col("doc_id")), cand, "doc_id")
    val sizes = labels.groupBy(col("component")).count()
    val famSize = sizes.agg(max(col("count"))).head().getLong(0)
    val nComps = sizes.count()
    val ccSecs = (System.nanoTime() - t1) / 1e9
    spark.stop()

    val pairBound = 4L * (k - 1)
    println(s"\n## SimHash cap + CC end-to-end adversarial probe " +
      s"(k=$k identical docs + $honest honest, SimMaxBucket=" +
      s"${DedupOps.SimMaxBucket}, 4x12-bit chunks, local[$cpus])\n")
    println("| check | measured | bound/expected | secs |")
    println("|---|---|---|---|")
    println(f"| candidate pairs (clique would be ${k * (k - 1) / 2}, ALL passing hamming<=$maxHamming) | $nCand | <= $pairBound (+ honest coincidences) | $candSecs%.2f |")
    println(s"| planted-family pairs | $nFam | >= ${k - 1} (path connectivity) | |")
    println(s"| max hamming on family edges | $maxFamHam | = 0 (identical-simhash runs) | |")
    println(s"| honest-side candidate pairs | $nHon | small (hash coincidences, reported) | |")
    println(s"| ledger over-cap buckets | $nOverCap (max pop $maxBucket of $nBuckets) | = 4 (the guard FIRES here) | |")
    println(f"| CC rounds over the capped path | $rounds | HookDelay + O(log2 n) | $ccSecs%.2f |")
    println(s"| largest component | $famSize | = $k (family intact) | |")
    println(s"| total components | $nComps | >= ${honest / 2} (honest mostly singleton) | |")

    require(nCand <= pairBound + 4L * honest,
      s"candidate stage emitted $nCand pairs > path bound $pairBound (+ coincidence allowance)")
    require(maxFamHam == 0, s"family edge hamming $maxFamHam != 0")
    require(nOverCap == 4L, s"ledger reported $nOverCap over-cap buckets != 4")
    // >= not ==: a 12-bit chunk has only 4096 values, so a few honest
    // docs legitimately share the family's chunk in some band (observed
    // +1 at the 20k smoke) — they enter the same path, get hamming-
    // filtered out, and never reach the family's component.
    require(maxBucket >= k, s"ledger max bucket $maxBucket < $k")
    require(famSize == k, s"family fragmented: largest component $famSize != $k")
    require(nComps >= honest / 2,
      s"$nComps components: honest docs improbably merged")

    val pw = new PrintWriter(new File(jsonOut))
    try pw.println(
      f"""{"k":$k,"honest":$honest,"sim_max_bucket":${DedupOps.SimMaxBucket},"max_hamming":$maxHamming,"candidates":$nCand,"pair_bound":$pairBound,"family_pairs":$nFam,"max_family_hamming":$maxFamHam,"honest_pairs":$nHon,"n_buckets":$nBuckets,"max_bucket":$maxBucket,"n_over_cap":$nOverCap,"cc_rounds":$rounds,"largest_component":$famSize,"components":$nComps,"cand_secs":$candSecs%.3f,"cc_secs":$ccSecs%.3f}""")
    finally pw.close()
    System.err.println(s"wrote $jsonOut")
  }
}
