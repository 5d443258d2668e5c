package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's algorithm) — the coarse
  * quantizer trainer behind IVF ANN ([[SimilarityOps.ivfKnn]]) and
  * SemDeDup-style cluster pruning ([[SimilarityOps.semDedup]]): those ops
  * take any centroid table; a hash sample ([[SimilarityOps.ivfCentroids]])
  * seeds it, and a few Lloyd iterations tighten the buckets so nprobe
  * scans touch less of the corpus.
  *
  * Scale design (100 TB discipline):
  *   - Per iteration the corpus is touched exactly twice, both times
  *     WITHOUT a corpus shuffle: assignment is a broadcast-centroid
  *     map-side pass; the centroid update aggregates (C·dim) cells with
  *     map-side partial aggregation (posexplode shuffles only the
  *     pre-aggregated per-partition partials).
  *   - Iteration count is a fixed parameter (the usual 5-20), so the
  *     plan is a bounded unrolled chain; `localCheckpoint` every few
  *     rounds would cap lineage for large `iters` (the CC loop in
  *     [[DedupOps.connectedComponents]] shows the pattern).
  *   - Determinism (and hence oracle-checkability) is engineered: L2
  *     distances are sequential left folds (same IEEE op order in both
  *     engines), ties break on cent_id, and the per-dimension mean is
  *     computed in 2^24 fixed point — integer sums are associative, so
  *     the result is independent of partitioning; the ONLY float ops
  *     are per-row multiplies and one exact final division per cell.
  *   - Empty clusters drop out (standard Lloyd-with-drop); k shrinks
  *     monotonically, deterministically on both engines.
  */
object ClusterOps {

  /** Fixed-point scale for centroid means (2^24: float components keep
    * their full 24-bit mantissa). */
  val MeanFp = 16777216L

  /** One Lloyd iteration. `corpus`: `(id, vec array<float|double>)`;
    * `centroids`: `(cent_id, cent_vec array<double>, ...)`. Returns the
    * updated `(cent_id, n_members, cent_vec array<double>)`. */
  def kmeansIterate(corpus: DataFrame, centroids: DataFrame,
      corpusId: String = "vec_id"): DataFrame = {
    // Codegen'd kernel; bit-identical to the composed
    // aggregate(zip_with(...)) fold (see L2DistSq's contract + spec) —
    // the interpreted-HOF form costs ~3x on the N*C assignment pass.
    val d2 = graft.expressions.GraftFunctions.l2DistSq(
      col("vec"), col("cent_vec"))
    val assigned = corpus
      .crossJoin(broadcast(centroids.select(col("cent_id"), col("cent_vec"))))
      .select(col(corpusId), col("vec"), col("cent_id"), d2.as("__d2"))
      .withColumn("__r", rank().over(
        Window.partitionBy(col(corpusId)).orderBy(col("__d2"), col("cent_id"))))
      .filter(col("__r") === 1)
    assigned
      .select(col("cent_id"), posexplode(col("vec")).as(Seq("pos", "comp")))
      .groupBy(col("cent_id"), col("pos"))
      .agg(count(lit(1)).as("__n"),
        sum(floor(col("comp").cast("double") * MeanFp).cast("long")).as("__s"))
      .withColumn("__m_fp", expr("__s div __n"))
      .groupBy(col("cent_id"))
      .agg(min(col("__n")).as("n_members"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("__m_fp")))),
          x => x.getField("__m_fp").cast("double") / lit(MeanFp.toDouble))
          .as("cent_vec"))
  }

  /** Final cluster assignment against a (refined) centroid table — the
    * per-row output a curation pipeline consumes (SemDeDup buckets,
    * IVF postings, per-cluster sampling quotas): nearest centroid by
    * (d2, cent_id), one broadcast map-side pass. */
  def kmeansAssign(corpus: DataFrame, centroids: DataFrame,
      corpusId: String = "vec_id"): DataFrame =
    corpus
      .crossJoin(broadcast(centroids.select(col("cent_id"), col("cent_vec"))))
      .select(col(corpusId), col("cent_id"),
        graft.expressions.GraftFunctions.l2DistSq(
          col("vec"), col("cent_vec")).as("d2"))
      .withColumn("__r", rank().over(
        Window.partitionBy(col(corpusId)).orderBy(col("d2"), col("cent_id"))))
      .filter(col("__r") === 1)
      .select(col(corpusId), col("cent_id"), col("d2"))

  /** `iters` Lloyd iterations from `initial` centroids (e.g. an
    * [[SimilarityOps.ivfCentroids]] hash sample, components widened to
    * double). */
  def kmeans(corpus: DataFrame, initial: DataFrame, iters: Int,
      corpusId: String = "vec_id"): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    (1 to iters).foldLeft(
      initial.select(col("cent_id"), col("cent_vec"),
        lit(-1L).as("n_members"))) {
      (cents, _) => kmeansIterate(corpus, cents, corpusId)
        .select(col("cent_id"), col("cent_vec"), col("n_members"))
    }
  }
}
