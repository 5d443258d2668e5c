package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star extension): brute-force cosine
  * top-k as the exact baseline, and an IVF-style bucketed variant as the
  * scale path.
  *
  * Scale design (100 TB discipline):
  *   - The probe set is small and broadcast; the corpus is scanned ONCE.
  *     Scores are projected to (probe_id, vec_id, sim) before any shuffle —
  *     the 64-float vectors never travel.
  *   - Top-k uses `rank() ≤ k`, which Spark 3.5+/4.x plans as
  *     WindowGroupLimit: per-partition partial top-k BEFORE the shuffle,
  *     so the shuffled volume is O(probes·k·partitions), not O(probes·N).
  *   - IVF: coarse quantization against C centroids (a projection against
  *     a broadcast centroid array), then search only the nprobe nearest
  *     buckets — corpus fraction scanned ≈ nprobe/C.
  *
  * Determinism contract: the dot product is a sequential left fold over
  * explicitly double-cast elements (`aggregate(transform(...))`), the same
  * IEEE op sequence DuckDB's `list_reduce(list_transform(...))` executes —
  * so the oracle matches bit-for-bit, no tolerance needed.
  */
object SimilarityOps {

  /** Dot product of two float-array columns: the custom codegen'd
    * expression ([[graft.expressions.DotProductFloat]] — tight primitive
    * loop, no per-pair array allocation). Bit-identical to [[dotFold]]. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.GraftFunctions.dotF(a, b)

  /** Composed-builtin form of [[dot]] (sequential left fold over
    * double-cast elements): the reference semantics the custom expression
    * must match bit-for-bit, and the fallback if one prefers zero custom
    * Catalyst code. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors by cosine for each probe row.
    * `probes`/`corpus`: (id, vec). Ties break on neighbor id ascending. */
  def bruteForceKnn(
      probes: DataFrame, corpus: DataFrame, k: Int,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame = {
    // Norms are per-ROW quantities: compute them once per vector before
    // the pair join instead of twice per pair (bitwise-identical result,
    // the factoring doesn't change any IEEE op).
    val c = corpus.select(col(corpusId), col("vec"), norm(col("vec")).as("__nrm"))
    val p = probes.select(col(probeId), col("probe_vec"),
      norm(col("probe_vec")).as("__pnrm"))
    val scored = c.crossJoin(broadcast(p))
      .filter(col(probeId) =!= col(corpusId))
      .select(col(probeId), col(corpusId),
        (dot(col("probe_vec"), col("vec")) / (col("__pnrm") * col("__nrm"))).as("sim"))
    scored
      .withColumn("rank", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("sim").desc, col(corpusId))))
      .filter(col("rank") <= k)
  }

  /** Deterministic bounded centroid sample for IVF: ~`targetC` rows
    * REGARDLESS of corpus size. Sampling rate is `targetC / N` (via
    * md5-hash modulo with step = max(N div targetC, 1)), so the broadcast
    * centroid table and the O(N·C) nearest-centroid assignment stay
    * fixed-cost as the corpus grows — real IVF keeps C ≈ const (or √N);
    * a proportional sample (the old `id % 97`) makes assignment O(N²/97),
    * which at 100 TB broadcasts ~1% of the corpus. The corpus count is a
    * scalar subquery (broadcast single-row crossJoin), not a driver-side
    * `.count()`, so the result stays a pure lazy DataFrame.
    *
    * `targetC <= 0` selects the SCALE-AWARE target C = max(4, ⌈√N⌉),
    * derived from the same in-query count: IVF guidance is C ∝ √N so
    * the per-probe scan (≈ N·nprobe/C) and the broadcast centroid table
    * (C rows) grow together as √N instead of one of them exploding —
    * a pinned C at 100× data means 100×-fatter cells and near-full
    * scans per probe. √ and ⌈⌉ are IEEE-exact in both engines, so the
    * oracle reproduces the same C from the same count. */
  def ivfCentroids(
      corpus: DataFrame, targetC: Int,
      corpusId: String = "vec_id"): DataFrame = {
    val n = corpus.agg(count(lit(1)).as("__n"))
    val step =
      if (targetC > 0) expr(s"__n div $targetC")
      else expr("__n div greatest(cast(4 as bigint), " +
        "cast(ceil(sqrt(cast(__n as double))) as bigint))")
    corpus.crossJoin(broadcast(n))
      .filter(
        graft.expressions.GraftFunctions.md5PrefixLong(
            col(corpusId).cast("string"), 15) % greatest(step, lit(1L)) === 0L)
      .select(col(corpusId).as("cent_id"), col("vec").as("cent_vec"))
  }

  /** IVF-style ANN: a bounded deterministic centroid sample (~`targetC`
    * centroids — see [[ivfCentroids]]), assign corpus rows to their
    * nearest centroid bucket, then search only the `nprobe` buckets
    * nearest each probe. Corpus fraction scanned ≈ nprobe/targetC.
    * Returns the same shape as [[bruteForceKnn]]; recall < 1 by
    * construction (spec checks recall vs brute force; the DuckDB oracle
    * reproduces the exact bucketing, so correctness is hash-checked too). */
  def ivfKnn(
      probes: DataFrame, corpus: DataFrame, k: Int,
      centroidTarget: Int = 0, nprobe: Int = 3,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame = {
    val centroids = ivfCentroids(corpus, centroidTarget, corpusId)

    def nearestBuckets(df: DataFrame, idc: String, vecc: String, n: Int): DataFrame =
      df.crossJoin(broadcast(centroids))
        .select(df.columns.map(col) :+ col("cent_id") :+
          cosine(col(vecc), col("cent_vec")).as("csim"): _*)
        .withColumn("crank", rank().over(
          Window.partitionBy(col(idc)).orderBy(col("csim").desc, col("cent_id"))))
        .filter(col("crank") <= n)
        .drop("csim", "crank")

    val bucketed = nearestBuckets(
      corpus.withColumn("__nrm", norm(col("vec"))), corpusId, "vec", 1)
    val probeBuckets = nearestBuckets(
      probes.withColumn("__pnrm", norm(col("probe_vec"))), probeId, "probe_vec", nprobe)

    // No distinct needed: each corpus row lives in exactly one bucket
    // (crank=1), so (probe, vec) pairs are already unique.
    val scored = bucketed.join(broadcast(probeBuckets), Seq("cent_id"))
      .filter(col(probeId) =!= col(corpusId))
      .select(col(probeId), col(corpusId),
        (dot(col("probe_vec"), col("vec")) /
          (col("__pnrm") * col("__nrm"))).as("sim"))
    scored
      .withColumn("rank", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("sim").desc, col(corpusId))))
      .filter(col("rank") <= k)
  }

  /** Scale-aware exact-rerank depth statistics, derived in-query from
    * the corpus count (the [[ivfCentroids]] auto-C pattern applied to
    * the OTHER recall knob): one row
    * `(n_corpus, auto_c, auto_r_raw, auto_r)` where
    * `auto_r = max(AutoRerankFloor, (⌈√N⌉·4) div 3)`.
    *
    * Why this formula (the round-16 off-manifold ledger,
    * `ANN_OFFMANIFOLD_LEDGER.json` / SCALING.md): at auto-C the probed
    * CELL COUNT grows as √N, so the ADC shortlist competes with √N-many
    * near-tied cells and a FIXED rerank depth collapses off-manifold
    * recall across decades (measured 0.279 → 0.049 at 100× with
    * rerank 120). Rerank cost is probes × depth exact distances —
    * independent of corpus size — and the measured lever point
    * (rerank 600 at the 100× fixture, N = 200 k) recovered 3.0× the
    * recall (0.146 vs 0.049; 87% of the exact-in-cell ceiling at 1/5
    * its per-probe cost). `(⌈√N⌉·4) div 3` reproduces that point
    * (⌈√200000⌉ = 448 → 597) and stays at the floor for N ≤ 8,100, so
    * every gate-scale result is byte-identical to the previous fixed
    * default. √/⌈⌉ and integer div are IEEE-/integer-exact in DuckDB
    * too, so the arithmetic is oracle-pinned (gate row
    * `knn_pq_auto_rerank`). */
  def autoRerankStats(corpus: DataFrame): DataFrame =
    corpus.agg(count(lit(1)).as("n_corpus"))
      .withColumn("auto_c", expr("greatest(cast(4 as bigint), " +
        "cast(ceil(sqrt(cast(n_corpus as double))) as bigint))"))
      .withColumn("auto_r_raw", expr(
        "(cast(ceil(sqrt(cast(n_corpus as double))) as bigint) * 4) div 3"))
      .withColumn("auto_r",
        greatest(lit(AutoRerankFloor.toLong), col("auto_r_raw")))

  /** Exact-rerank floor: the fixed depth the gate scales ran before the
    * scale-aware default existed (24·k at k = 5) — [[autoRerankStats]]
    * returns exactly this for N ≤ 8,100, which keeps the auto default
    * byte-stable on every oracle-gated corpus. */
  val AutoRerankFloor = 120

  /** One-row `(auto_r)` frame for the `rerank <= 0` search paths —
    * broadcast-crossJoined into the shortlist filter so the depth is
    * derived from the SAME coded index the search scans (a pure lazy
    * scalar subquery, no driver-side count). */
  private def autoRerankOf(corpusCoded: DataFrame): DataFrame =
    autoRerankStats(corpusCoded).select(col("auto_r").as("__rr"))

  /** L2 rank-≤n nearest-centroid bucketing against a broadcast (trained)
    * centroid table — the shared coarse-quantization pass of every
    * trained-quantizer search ([[ivfKnnTrained]], [[ivfPqKnn]],
    * [[ivfPqResidualKnn]]): codegen [[graft.expressions.L2DistSq]]
    * kernel, (d2, cent_id) tie-break, rank-1 plans as partial
    * WindowGroupLimit. Keeps every input column plus `cent_id`. */
  private def l2Buckets(cents: DataFrame)(
      df: DataFrame, idc: String, vecc: String, n: Int): DataFrame =
    df.crossJoin(broadcast(cents))
      .select(df.columns.map(col) :+ col("cent_id") :+
        graft.expressions.GraftFunctions.l2DistSq(
          col(vecc), col("cent_vec")).as("__d2"): _*)
      .withColumn("__cr", rank().over(
        Window.partitionBy(col(idc)).orderBy(col("__d2"), col("cent_id"))))
      .filter(col("__cr") <= n)
      .drop("__d2", "__cr")

  /** IVF ANN over a TRAINED coarse quantizer ([[graft.operators
    * .ClusterOps.kmeans]] centroids) — the FAISS-style pairing: L2
    * nearest-centroid bucketing (the quantizer's own metric, via the
    * codegen [[graft.expressions.L2DistSq]] kernel), exact cosine
    * re-rank inside the `nprobe` probed buckets. Lloyd-refined
    * centroids track the corpus distribution, so buckets are balanced
    * where the hash-sample seeds of [[ivfKnn]] are arbitrary —
    * same output shape, higher recall at equal nprobe/C. */
  def ivfKnnTrained(
      probes: DataFrame, corpus: DataFrame, k: Int,
      centroids: DataFrame, nprobe: Int = 3,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame = {
    val cents = centroids.select(col("cent_id"), col("cent_vec"))
    val buckets = l2Buckets(cents) _
    val bucketed = buckets(
      corpus.withColumn("__nrm", norm(col("vec"))), corpusId, "vec", 1)
    val probeBuckets = buckets(
      probes.withColumn("__pnrm", norm(col("probe_vec"))),
      probeId, "probe_vec", nprobe)
    bucketed.join(broadcast(probeBuckets), Seq("cent_id"))
      .filter(col(probeId) =!= col(corpusId))
      .select(col(probeId), col(corpusId),
        (dot(col("probe_vec"), col("vec")) /
          (col("__pnrm") * col("__nrm"))).as("sim"))
      .withColumn("rank", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("sim").desc, col(corpusId))))
      .filter(col("rank") <= k)
  }

  /** Product-quantization sub-codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the vector space is
    * split into `m` contiguous `subDim`-wide subspaces and a small
    * k-means codebook (~`ks` codes) is trained per subspace — reusing
    * [[ClusterOps.kmeans]] on the sliced corpus with the same
    * hash-sampled seeding. Returns `(sub, cent_id, cent_vec)`.
    *
    * Scale: each subspace trainer is the kmeans pass (broadcast
    * centroids, fixed-point means); the trained codebook is m·ks rows —
    * always broadcastable. */
  def pqCodebooks(corpus: DataFrame, m: Int, subDim: Int, ks: Int,
      iters: Int, corpusId: String = "vec_id"): DataFrame =
    (0 until m).map { sub =>
      val sliced = corpus.select(col(corpusId),
        slice(col("vec"), sub * subDim + 1, subDim).as("vec"))
      val initial = ivfCentroids(sliced, ks, corpusId)
        .select(col("cent_id"),
          transform(col("cent_vec"), x => x.cast("double")).as("cent_vec"))
      ClusterOps.kmeans(sliced, initial, iters, corpusId)
        .select(lit(sub).as("sub"), col("cent_id"), col("cent_vec"))
    }.reduce(_ unionByName _)

  /** 8-bit-style PQ code assignment: each row's `m` subvectors mapped to
    * their nearest sub-centroid — a pure projection against the
    * broadcast codebook (rank-1 per (row, sub) plans as partial
    * WindowGroupLimit). Returns `(id, codes array)` with codes ordered
    * by subspace; the full float vector is REPLACED by m small ids,
    * which is the whole memory/IO point of PQ at 100 TB. */
  def pqCodes(corpus: DataFrame, codebooks: DataFrame, subDim: Int,
      corpusId: String = "vec_id"): DataFrame =
    corpus.crossJoin(broadcast(codebooks))
      .select(col(corpusId), col("sub"), col("cent_id"),
        graft.expressions.GraftFunctions.l2DistSq(
          slice(col("vec"), col("sub") * subDim + 1, lit(subDim)),
          col("cent_vec")).as("__d2"))
      .withColumn("__r", rank().over(
        Window.partitionBy(col(corpusId), col("sub"))
          .orderBy(col("__d2"), col("cent_id"))))
      .filter(col("__r") === 1)
      .groupBy(col(corpusId))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("cent_id")))),
        x => x.getField("cent_id")).as("codes"))

  /** The IVF-PQ coded INDEX — FAISS's "add" phase as a table:
    * `(id, cent_id, codes)` for every corpus vector. This is the
    * persisted-artifact half of PQ search ([[graft.io.ModelStore]]):
    * built once per corpus (one broadcast-quantizer pass), stored
    * columnar, and every later search touches only these m-code rows —
    * the full float vectors stay at rest until the final re-rank. */
  def ivfPqIndex(corpus: DataFrame, coarseCentroids: DataFrame,
      codebooks: DataFrame, subDim: Int,
      corpusId: String = "vec_id"): DataFrame =
    l2Buckets(coarseCentroids.select(col("cent_id"), col("cent_vec")))(
        corpus, corpusId, "vec", 1)
      .select(col(corpusId), col("cent_id"))
      .join(pqCodes(corpus, codebooks, subDim, corpusId), corpusId)

  /** INCREMENTAL index maintenance — FAISS's add() for continuous
    * ingest: code a batch of NEW vectors against the EXISTING trained
    * artifacts (coarse centroids + sub-codebooks — model-store reads)
    * and append to the persisted coded index. Nothing retrains and no
    * existing row is touched: per batch the corpus-scale work is ONE
    * broadcast-quantizer pass over the batch (the [[ivfPqIndex]]
    * projection), the continuous-ingest twin of
    * [[DedupOps.minhashCandidatesAgainst]]. Re-arriving ids keep their
    * existing coded row (replay idempotence — the same anti-join
    * [[DedupOps.incrementalComponents]] seeds with). Retraining happens
    * only when the corpus fingerprint moves (CONTRACTS §6); recall vs a
    * full rebuild is a measured spec, not a claim. */
  def ivfAppend(existingIndex: DataFrame, newVectors: DataFrame,
      coarseCentroids: DataFrame, codebooks: DataFrame, subDim: Int,
      corpusId: String = "vec_id"): DataFrame = {
    val fresh = newVectors.select(col(corpusId), col("vec"))
      .join(existingIndex.select(col(corpusId)), Seq(corpusId), "left_anti")
    existingIndex.unionByName(
      ivfPqIndex(fresh, coarseCentroids, codebooks, subDim, corpusId))
  }

  /** IVF-PQ ANN — the FAISS companion of [[ivfKnnTrained]]: coarse
    * buckets from the trained quantizer, candidate scoring by ASYMMETRIC
    * DISTANCE (per-probe lookup tables of probe-subvector→code
    * distances, summed over subspaces against each candidate's codes),
    * exact cosine re-rank ONLY on the `rerank` ADC-best candidates.
    *
    * Scale: the candidate stream carries `(cent_id, id, codes)` — never
    * the float vectors (codes are m ids vs 64 floats: ~16x less IO);
    * the probe LUTs are (probes · m · ks) doubles, broadcast; the exact
    * re-rank joins the corpus by id for probes·rerank rows only, with
    * the shortlist broadcast so the corpus never shuffles.
    *
    * Determinism: ADC folds subspace distances in subspace order from a
    * 0.0 seed (the oracle folds `list(d2c ORDER BY sub)` identically);
    * shortlist ties break (adc, id), final ties (sim desc, id).
    *
    * This entry point trains nothing and codes nothing: `corpusCoded` is
    * the prebuilt [[ivfPqIndex]] (read from the model store in
    * production); only the probe side is quantized at query time. */
  def ivfPqSearch(
      probes: DataFrame, corpus: DataFrame, corpusCoded: DataFrame, k: Int,
      coarseCentroids: DataFrame, codebooks: DataFrame,
      subDim: Int, nprobe: Int = 3, rerank: Int = 0,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame = {
    val cents = coarseCentroids.select(col("cent_id"), col("cent_vec"))
    val buckets = l2Buckets(cents) _

    // Probe side: nprobe buckets + the per-subspace distance LUT
    // (map cent_id -> d2, ordered into an array by subspace).
    // ONE aggregation builds the whole per-probe LUT array (r21 verdict
    // item 5): the previous two-level groupBy — (probeId, sub) maps,
    // then per-probeId collect — planned two Exchanges back to back
    // (the second re-shuffles the first's output because the hash
    // partitionings differ). Collect every (sub, code, d2c) triple in
    // one pass and assemble the sub-ordered map array as a projection;
    // the HOF assembly is interpreted but runs over probe-count ×
    // (m·ks) rows — bounded model-scale work, while the removed
    // Exchange was a per-query fixed stage. Map iteration order is
    // irrelevant downstream (maps are only read via element_at), and
    // the sub axis is sorted exactly as the old comparator sorted it.
    val lut = probes.crossJoin(broadcast(codebooks))
      .select(col(probeId), col("sub"), col("cent_id"),
        graft.expressions.GraftFunctions.l2DistSq(
          slice(col("probe_vec"), col("sub") * subDim + 1, lit(subDim)),
          col("cent_vec")).as("d2c"))
      .groupBy(col(probeId))
      .agg(collect_list(struct(col("sub"), col("cent_id"), col("d2c")))
        .as("__lst"))
      .select(col(probeId), expr(
        """transform(array_sort(array_distinct(transform(__lst, x -> x.sub))),
          |  s -> map_from_entries(transform(
          |    filter(__lst, x -> x.sub = s),
          |    x -> struct(x.cent_id, x.d2c))))"""
          .stripMargin).as("luts"))
    val probeBuckets = buckets(
        probes.select(col(probeId), col("probe_vec")), probeId, "probe_vec",
        nprobe)
      .select(col(probeId), col("cent_id"))
      .join(lut, probeId)

    val adcRanked = corpusCoded.join(broadcast(probeBuckets), Seq("cent_id"))
      .filter(col(probeId) =!= col(corpusId))
      .select(col(probeId), col(corpusId),
        aggregate(
          zip_with(col("codes"), col("luts"), (c, mp) => element_at(mp, c)),
          lit(0.0), (acc, x) => acc + x).as("adc"))
      .withColumn("__ar", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("adc"), col(corpusId))))
    // rerank <= 0 selects the scale-aware depth ([[autoRerankStats]]) —
    // the committed default: a fixed depth collapses off-manifold recall
    // as auto-C grows the cell count (the round-16 weak mark). The depth
    // arrives as a broadcast 1-row scalar (no driver count); the literal
    // path keeps the WindowGroupLimit partial top-R, the auto path
    // trades it for a post-window filter — bounded by the candidate set
    // being only ~nprobe·N/C ≈ nprobe·√N rows per probe to begin with.
    val shortlist = (if (rerank > 0) adcRanked.filter(col("__ar") <= rerank)
      else adcRanked.crossJoin(broadcast(autoRerankOf(corpusCoded)))
        .filter(col("__ar") <= col("__rr")))
      .select(col(probeId), col(corpusId))

    // Exact re-rank on the shortlist only: fetch the few full vectors by
    // id (shortlist broadcast — the corpus still never shuffles).
    val c = corpus.select(col(corpusId), col("vec"),
      norm(col("vec")).as("__nrm"))
    val p = probes.select(col(probeId), col("probe_vec"),
      norm(col("probe_vec")).as("__pnrm"))
    c.join(broadcast(shortlist), corpusId)
      .join(broadcast(p), probeId)
      .select(col(probeId), col(corpusId),
        (dot(col("probe_vec"), col("vec")) /
          (col("__pnrm") * col("__nrm"))).as("sim"))
      .withColumn("rank", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("sim").desc, col(corpusId))))
      .filter(col("rank") <= k)
  }

  /** Self-contained IVF-PQ (index built inline): [[ivfPqIndex]] +
    * [[ivfPqSearch]] composed — the spec/baseline form; production reads
    * the index from the model store instead. */
  def ivfPqKnn(
      probes: DataFrame, corpus: DataFrame, k: Int,
      coarseCentroids: DataFrame, codebooks: DataFrame,
      subDim: Int, nprobe: Int = 3, rerank: Int = 0,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame =
    ivfPqSearch(probes, corpus,
      ivfPqIndex(corpus, coarseCentroids, codebooks, subDim, corpusId),
      k, coarseCentroids, codebooks, subDim, nprobe, rerank, probeId, corpusId)

  /** Residual corpus w.r.t. the trained coarse quantizer:
    * `(id, cent_id, vec = raw − cent_vec)` — what residual sub-codebooks
    * train on and residual codes quantize (exact IEEE subtractions of
    * exactly-cast doubles, so the whole family stays oracle-hashable). */
  def residualCorpus(corpus: DataFrame, coarseCentroids: DataFrame,
      corpusId: String = "vec_id"): DataFrame = {
    val cents = coarseCentroids.select(col("cent_id"), col("cent_vec"))
    l2Buckets(cents)(corpus, corpusId, "vec", 1)
      .join(broadcast(cents), "cent_id")
      .select(col(corpusId), col("cent_id"),
        zip_with(col("vec"), col("cent_vec"),
          (x, c) => x.cast("double") - c).as("vec"))
  }

  /** Residual PQ sub-codebooks: [[pqCodebooks]] trained on
    * [[residualCorpus]] — the trained half of the residual IVFPQ
    * artifact pair (store with the coarse centroids they depend on). */
  def pqResidualCodebooks(corpus: DataFrame, coarseCentroids: DataFrame,
      m: Int, subDim: Int, ks: Int, iters: Int,
      corpusId: String = "vec_id"): DataFrame =
    pqCodebooks(
      residualCorpus(corpus, coarseCentroids, corpusId)
        .select(col(corpusId), col("vec")),
      m, subDim, ks, iters, corpusId)

  /** The residual IVF-PQ coded index: `(id, cent_id, codes)` where codes
    * quantize the residual — FAISS IVFPQ's add phase as a table. */
  def ivfPqResidualIndex(corpus: DataFrame, coarseCentroids: DataFrame,
      codebooks: DataFrame, subDim: Int,
      corpusId: String = "vec_id"): DataFrame = {
    val res = residualCorpus(corpus, coarseCentroids, corpusId)
    res.select(col(corpusId), col("cent_id"))
      .join(pqCodes(res.select(col(corpusId), col("vec")), codebooks,
        subDim, corpusId), corpusId)
  }

  /** RESIDUAL IVF-PQ — the full FAISS IVFPQ construction: sub-codebooks
    * quantize the residual `vec − coarse_centroid` instead of the raw
    * vector, which concentrates the quantized distribution around the
    * origin and buys accuracy at equal code budget; the probe's lookup
    * table is therefore PER COARSE BUCKET (the probe residual differs in
    * each probed cell). Same scale shape as [[ivfPqKnn]]: candidates
    * travel as codes, LUTs are (probes·nprobe·m·ks) doubles broadcast,
    * exact re-rank only on the ADC shortlist.
    *
    * Returns `(probe_id, corpus_id, sim, rank)`. Residuals are exact
    * IEEE subtractions of exactly-cast doubles, so the whole pipeline
    * stays oracle-hashable.
    *
    * Search-only (FAISS's query phase): `corpusCoded` is the prebuilt
    * [[ivfPqResidualIndex]] and `codebooks` the trained
    * [[pqResidualCodebooks]] — both model-store artifacts in production;
    * only the probe residuals and their per-cell LUTs are computed at
    * query time (probes are small). */
  def ivfPqResidualSearch(
      probes: DataFrame, corpus: DataFrame, corpusCoded: DataFrame, k: Int,
      coarseCentroids: DataFrame, codebooks: DataFrame,
      subDim: Int, nprobe: Int = 3, rerank: Int = 0,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame = {
    val cents = coarseCentroids.select(col("cent_id"), col("cent_vec"))
    val buckets = l2Buckets(cents) _
    def residual(vecc: String) =
      zip_with(col(vecc), col("cent_vec"),
        (x, c) => x.cast("double") - c)
    val books = codebooks

    // Probe residual PER PROBED CELL, then the per-(probe, cell) LUT.
    val probeRes = buckets(
        probes.select(col(probeId), col("probe_vec")), probeId, "probe_vec",
        nprobe)
      .join(broadcast(cents), "cent_id")
      .select(col(probeId), col("cent_id"), residual("probe_vec").as("prvec"))
    val lut = probeRes.crossJoin(broadcast(
        books.select(col("sub"), col("cent_id").as("code"), col("cent_vec")
          .as("sub_vec"))))
      .select(col(probeId), col("cent_id"), col("sub"), col("code"),
        graft.expressions.GraftFunctions.l2DistSq(
          slice(col("prvec"), col("sub") * subDim + 1, lit(subDim)),
          col("sub_vec")).as("d2c"))
      // Same single-aggregation LUT assembly as [[ivfPqSearch]] (r21
      // verdict item 5): one Exchange on (probeId, cent_id) instead of
      // two, map array assembled as a projection over the bounded
      // (nprobe·m·ks)-entry collect.
      .groupBy(col(probeId), col("cent_id"))
      .agg(collect_list(struct(col("sub"), col("code"), col("d2c")))
        .as("__lst"))
      .select(col(probeId), col("cent_id"), expr(
        """transform(array_sort(array_distinct(transform(__lst, x -> x.sub))),
          |  s -> map_from_entries(transform(
          |    filter(__lst, x -> x.sub = s),
          |    x -> struct(x.code, x.d2c))))"""
          .stripMargin).as("luts"))

    val adcRanked = corpusCoded.join(broadcast(lut), Seq("cent_id"))
      .filter(col(probeId) =!= col(corpusId))
      .select(col(probeId), col(corpusId),
        aggregate(
          zip_with(col("codes"), col("luts"), (c, mp) => element_at(mp, c)),
          lit(0.0), (acc, x) => acc + x).as("adc"))
      .withColumn("__ar", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("adc"), col(corpusId))))
    // Same scale-aware depth contract as [[ivfPqSearch]].
    val shortlist = (if (rerank > 0) adcRanked.filter(col("__ar") <= rerank)
      else adcRanked.crossJoin(broadcast(autoRerankOf(corpusCoded)))
        .filter(col("__ar") <= col("__rr")))
      .select(col(probeId), col(corpusId))

    val c = corpus.select(col(corpusId), col("vec"),
      norm(col("vec")).as("__nrm"))
    val p = probes.select(col(probeId), col("probe_vec"),
      norm(col("probe_vec")).as("__pnrm"))
    c.join(broadcast(shortlist), corpusId)
      .join(broadcast(p), probeId)
      .select(col(probeId), col(corpusId),
        (dot(col("probe_vec"), col("vec")) /
          (col("__pnrm") * col("__nrm"))).as("sim"))
      .withColumn("rank", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("sim").desc, col(corpusId))))
      .filter(col("rank") <= k)
  }

  /** Self-contained residual IVF-PQ (codebooks trained and index coded
    * inline): [[pqResidualCodebooks]] + [[ivfPqResidualIndex]] +
    * [[ivfPqResidualSearch]] composed — the spec/baseline form;
    * production reads both artifacts from the model store instead. */
  def ivfPqResidualKnn(
      probes: DataFrame, corpus: DataFrame, k: Int,
      coarseCentroids: DataFrame, m: Int, subDim: Int, ks: Int,
      subIters: Int, nprobe: Int = 3, rerank: Int = 0,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame = {
    val books = pqResidualCodebooks(corpus, coarseCentroids, m, subDim, ks,
      subIters, corpusId)
    ivfPqResidualSearch(probes, corpus,
      ivfPqResidualIndex(corpus, coarseCentroids, books, subDim, corpusId),
      k, coarseCentroids, books, subDim, nprobe, rerank, probeId, corpusId)
  }

  /** Exact all-pairs cosine near-duplicates over a (bounded) corpus:
    * the O(n²) ground-truth baseline that [[embeddingNearDup]]'s bucketed
    * candidates are measured against. Broadcast one side; only
    * (id_a, id_b, sim) leaves the join — vectors never shuffle. Use on
    * filtered/sampled subsets at scale, [[embeddingNearDup]] for the
    * full corpus. */
  def exactNearDup(
      corpus: DataFrame, threshold: Double,
      corpusId: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(corpusId), col("vec"), norm(col("vec")).as("__nrm"))
    c.as("x").join(broadcast(c.as("y")),
        col(s"x.$corpusId") < col(s"y.$corpusId"))
      .select(col(s"x.$corpusId").as("id_a"), col(s"y.$corpusId").as("id_b"),
        (dot(col("x.vec"), col("y.vec")) /
          (col("x.__nrm") * col("y.__nrm"))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Rank-1 nearest-centroid assignment: each corpus row tagged with its
    * closest centroid's `cent_id` (cosine, ties broken on cent_id). The
    * centroid side must be broadcast-sized ([[ivfCentroids]] bounds it);
    * the assignment is then a map-side O(N·C) pass — no shuffle of the
    * corpus. Shared by [[embeddingNearDup]] and [[semDedup]]. */
  def assignToCentroids(
      corpus: DataFrame, centroids: DataFrame,
      corpusId: String = "vec_id"): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .select(col(corpusId), col("vec"), col("cent_id"),
        cosine(col("vec"), col("cent_vec")).as("csim"))
      .withColumn("crank", rank().over(
        Window.partitionBy(col(corpusId)).orderBy(col("csim").desc, col("cent_id"))))
      .filter(col("crank") === 1)
      .select(col(corpusId), col("vec"), col("cent_id"))

  /** Embedding near-duplicate pairs: cosine ≥ threshold over candidate
    * pairs from coarse-bucket cohabitation (same IVF assignment) —
    * the embedding analogue of MinHash candidate generation. */
  def embeddingNearDup(
      corpus: DataFrame, threshold: Double, centroidTarget: Int = 0,
      corpusId: String = "vec_id"): DataFrame = {
    val centroids = ivfCentroids(corpus, centroidTarget, corpusId)
    val assigned = assignToCentroids(corpus, centroids, corpusId)
    assigned.as("x").join(assigned.as("y"),
        col("x.cent_id") === col("y.cent_id") &&
          col(s"x.$corpusId") < col(s"y.$corpusId"))
      .select(col(s"x.$corpusId").as("id_a"), col(s"y.$corpusId").as("id_b"),
        cosine(col("x.vec"), col("y.vec")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SemDeDup (semantic deduplication, Abbas et al. arXiv:2303.09540):
    * coarse-cluster the corpus by nearest deterministic centroid, then
    * WITHIN each cluster drop every vector whose cosine to a LOWER-id
    * cluster-mate reaches `threshold` — the paper's keep-lowest-index
    * rule, restated relationally. Returns the kept `(id, cent_id)` rows.
    *
    * The reference's merge semantics keep duplicates (SURVEY.md §2.3 L3);
    * this is the embedding-space analogue of the MinHash keep list —
    * pruning semantically-redundant training documents that exact and
    * lexical dedup cannot see.
    *
    * Scale: clustering bounds the pair space to Σ|cluster|² — the
    * published algorithm's shape. `centroidTarget` must grow with the
    * corpus (C ≈ √N keeps expected cluster size √N, i.e. pair work
    * O(N·√N) not O(N²)); the centroid side stays a broadcast either way
    * ([[ivfCentroids]]). The per-cluster join shuffles on `cent_id`, so
    * a pathological mega-cluster is the skew knob to watch — mitigate
    * with a larger C (finer clusters), exactly as the paper tunes k. */
  def semDedup(
      corpus: DataFrame, threshold: Double, centroidTarget: Int = 0,
      corpusId: String = "vec_id"): DataFrame = {
    val centroids = ivfCentroids(corpus, centroidTarget, corpusId)
    val assigned = assignToCentroids(corpus, centroids, corpusId)
      .withColumn("__nrm", norm(col("vec")))
    // Dropped = has ANY lower-id near-duplicate in its cluster. Expressed
    // as a pair semi-join so each survivor is decided independently (the
    // SemDeDup implementation's pairwise rule, not a chained greedy).
    val dropped = assigned.as("x").join(assigned.as("y"),
        col("x.cent_id") === col("y.cent_id") &&
          col(s"y.$corpusId") < col(s"x.$corpusId"))
      .filter((dot(col("x.vec"), col("y.vec")) /
        (col("x.__nrm") * col("y.__nrm"))) >= threshold)
      .select(col(s"x.$corpusId").as(corpusId))
      .distinct()
    assigned.join(dropped, Seq(corpusId), "left_anti")
      .select(col(corpusId), col("cent_id"))
  }

  /** Deterministic random-hyperplane coefficients for [[lshKnn]]: 64
    * pseudo-uniform floats in [-1, 1) per plane, derived from md5 of
    * (plane, component) — reproducible across runs/sessions with no RNG
    * state. */
  def lshPlanes(nPlanes: Int, dim: Int = 64): Array[Array[Float]] =
    Array.tabulate(nPlanes, dim) { (p, j) =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$p:$j")
          .substring(0, 15), 16)
      ((h % 2000001L) - 1000000L) / 1000000.0f
    }

  /** LSH-bucketed ANN (random hyperplanes — the signed-projection
    * family): bucket = the P sign bits of the vector against P fixed
    * hyperplanes; candidates = corpus rows sharing the probe's bucket or
    * any 1-bit-flip neighbor (multiprobe), exact cosine re-rank ≤ k.
    * Complements [[ivfKnn]]: no centroid pass over the corpus at all —
    * bucketing is a pure projection, so it composes with streaming
    * ingest (bucket on write, search on read). Corpus fraction touched
    * ≈ (P+1)/2^P. */
  def lshKnn(
      probes: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 8,
      probeId: String = "probe_id", corpusId: String = "vec_id"): DataFrame = {
    val planes = lshPlanes(nPlanes)
    def bucketOf(vecc: Column): Column =
      (0 until nPlanes).map { p =>
        shiftleft(when(dot(vecc, typedLit(planes(p))) > 0.0, 1L)
          .otherwise(0L), p)
      }.reduce(_ bitwiseOR _)

    val bucketed = corpus
      .select(col(corpusId), col("vec"), norm(col("vec")).as("__nrm"),
        bucketOf(col("vec")).as("bucket"))
    // Multiprobe: the probe's own bucket plus every 1-bit flip.
    val probeBuckets = probes
      .select(col(probeId), col("probe_vec"),
        norm(col("probe_vec")).as("__pnrm"),
        bucketOf(col("probe_vec")).as("b0"))
      .withColumn("bucket", explode(array(
        (col("b0") +: (0 until nPlanes).map(p =>
          col("b0").bitwiseXOR(lit(1L << p)))): _*)))
      .drop("b0")
    bucketed.join(broadcast(probeBuckets), Seq("bucket"))
      .filter(col(probeId) =!= col(corpusId))
      .select(col(probeId), col(corpusId),
        (dot(col("probe_vec"), col("vec")) /
          (col("__pnrm") * col("__nrm"))).as("sim"))
      .withColumn("rank", rank().over(
        Window.partitionBy(col(probeId)).orderBy(col("sim").desc, col(corpusId))))
      .filter(col("rank") <= k)
      .drop("rank")
  }
}
