package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{hash60, normalized, tokens, wordBigrams}

/** TRAINED document-quality classifier — the fastText-shaped upgrade of
  * the hand-tuned heuristic gate ([[graft.functions.TextFunctions
  * .qualityScore]]): hashed bag of word 1-/2-grams → logistic
  * regression, trained full-batch and DISTRIBUTED (each step is one
  * feature-join aggregation; model state is a `NumBuckets`-row
  * broadcast table).
  *
  * Determinism contract (the kmeans/BPE fixed-point pattern): the whole
  * recurrence is INTEGER arithmetic in Q16 (65536 == 1.0) — the
  * logistic is the hard sigmoid `clamp(1/2 + z/4, 0, 1)`, i.e.
  * `clamp(32768 + z div 4, 0, 65536)` with truncating division
  * (Spark `div` == DuckDB `//` toward zero, verified on negatives) —
  * so training replays exactly as an unrolled CTE chain and the
  * trained weights are oracle-hashable longs. No transcendentals
  * anywhere (ln/exp differ across engines in the last bit).
  *
  * Scale: features are one corpus projection (tokenize + hash + count);
  * each training step shuffles per-doc partial sums once (map-side
  * combine on both aggregations) and broadcasts the 64-row weight
  * table; `steps` is a small constant. Weights persist in the
  * [[graft.io.ModelStore]] — train once, gate everywhere. */
object QualityModelOps {

  /** Feature-space size (hash buckets) — small so the model table stays
    * trivially broadcastable and the oracle CTE chain readable. */
  val NumBuckets = 64
  /** Q16 fixed-point one. */
  val One = 65536L
  /** Hard-sigmoid slope divisor: p = clamp(1/2 + z/4, 0, 1). */
  val SigmoidDiv = 4
  /** Learning-rate divisor: w -= g div (LearnDiv * n). */
  val LearnDiv = 4

  /** Hashed bag-of-n-grams: `(id, bucket, x)` — counts of word unigrams
    * AND bigrams hashed into [[NumBuckets]] (single-token docs count
    * their token twice, mirroring [[wordBigrams]]' degenerate case —
    * deterministic and mirrored in the oracle), plus an INTERCEPT
    * feature at bucket −1 (x = 1 per doc) so the decision boundary can
    * recalibrate away from the hash-collision noise floor. Pure
    * projection + two-level aggregation. */
  def hashedFeatures(docs: DataFrame, id: String, text: String): DataFrame =
    // The whole bag collapses per document BEFORE any shuffle: one
    // codegen pass over the gram array ([[graft.expressions
    // .BucketCountsMd5]] — bucket = pmod(hash60(g), NumBuckets)
    // bit-identically), so the exchange carries <= NumBuckets rows per
    // doc instead of one row per gram OCCURRENCE. The earlier two-level
    // groupBy form shuffled the exploded grams — the single biggest
    // shuffle of the quality pipeline (1.37 s -> the bench delta on
    // quality_model_filter).
    docs.select(col(id), posexplode(graft.expressions.GraftFunctions
        .bucketCounts(concat(tokens(normalized(col(text))),
          wordBigrams(col(text))), NumBuckets)))
      .filter(col("col") > 0)
      .select(col(id), col("pos").cast("long").as("bucket"),
        col("col").as("x"))
      .unionByName(docs.select(col(id), lit(-1L).as("bucket"),
        lit(1L).as("x")))

  /** Full-batch hard-sigmoid logistic regression over hashed features:
    * returns the trained Q16 weight table `(bucket, w)`.
    *
    * Per step (all integer):
    *   z_d   = Σ_j x_dj · w_j                     (Q16)
    *   p_d   = clamp(32768 + z_d div 4, 0, 65536) (Q16 hard sigmoid)
    *   r_d   = p_d − y_d · 65536                  (Q16 residual)
    *   g_j   = Σ_d x_dj · r_d
    *   w_j  −= g_j div (LearnDiv · n)
    */
  def train(spark: SparkSession, features: DataFrame, labels: DataFrame,
      id: String, steps: Int): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val n = labels.count()
    // n = 0 would make the weight update `g div 0` — NULL in Spark —
    // and silently train an all-null weight table.
    require(n > 0, "need at least one labeled document to train")
    val w0 = spark.range(-1L, NumBuckets.toLong)
      .select(col("id").as("bucket"), lit(0L).as("w"))
      .localCheckpoint(true)
    (1 to steps).foldLeft(w0) { (w, _) =>
      val z = features.join(broadcast(w), "bucket")
        .groupBy(col(id))
        .agg(sum(col("x") * col("w")).as("z"))
      val r = labels.join(z, id)
        .select(col(id),
          (least(greatest(lit(One / 2) + expr(s"z div $SigmoidDiv"),
            lit(0L)), lit(One)) - col("y") * One).as("r"))
      val g = features.join(r, id)
        .groupBy(col("bucket"))
        .agg(sum(col("x") * col("r")).as("g"))
      w.join(g, Seq("bucket"), "left")
        .select(col("bucket"),
          expr(s"w - (coalesce(g, 0L) div ${LearnDiv * n}L)").as("w"))
        .localCheckpoint(true)
    }
  }

  /** Q16 score of each document under a trained weight table:
    * `(id, score)` with `score = Σ_j x_dj · w_j`; the gate keeps
    * `score >= 0` (hard-sigmoid p >= 1/2 up to the truncation
    * granularity — the rule both engines state identically). */
  def scores(features: DataFrame, weights: DataFrame, id: String): DataFrame =
    features.join(broadcast(weights), "bucket")
      .groupBy(col(id))
      .agg(sum(col("x") * col("w")).as("score"))
}
