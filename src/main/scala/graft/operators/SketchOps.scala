package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count / percentile sketches, in two determinism classes.
  *
  * The KMV (k-minimum-values / bottom-k) family is the oracle-able form:
  * both engines compute the same md5-derived 60-bit hashes, keep the k
  * smallest, and derive the estimate with pure integer arithmetic — so
  * the result is bit-identical across Spark and DuckDB (the
  * Bar-Yossef et al. 2002 estimator, restated without floating point).
  * KMV merge is exactly lossless: bottom-k of a union of per-partition
  * bottom-k's equals bottom-k of the union, which is what makes the
  * rollup twin a faithful "merge daily partials without re-scanning
  * history" demonstration.
  *
  * The HLL / approx_percentile family delegates to Spark's built-in
  * sketches (DataSketches HLL, KLL-style quantiles). Those have no
  * cross-engine-exact restatement, so they live here as library ops with
  * tolerance specs rather than oracle-hashed gate queries.
  *
  * Scale notes: the bottom-k pass is a distinct + rank ≤ k per group —
  * the rank plans as a partial WindowGroupLimit, so each map partition
  * forwards at most k rows per group to the single shuffle; the estimate
  * agg sees ≤ k·groups rows. Nothing here materializes on the driver.
  */
object SketchOps {

  /** 2^60 — the hash domain: 15 hex chars of md5 (matches the oracle's
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`). */
  val HashDomain: Long = 1L << 60

  /** 60-bit uniform hash of any column, identical in Spark and DuckDB. */
  def hash60(c: Column): Column =
    graft.expressions.GraftFunctions.md5PrefixLong(c.cast("string"), 15)

  /** Per-group bottom-k distinct hashes of `value`: (group*, hkey) with
    * ≤ k rows per group. The distinct collapses duplicate values before
    * the rank, so the window input is the DISTINCT hash multiset — the
    * KMV sketch state. */
  def kmvBottomK(df: DataFrame, group: Seq[Column], value: Column,
      k: Int): DataFrame = {
    // NULL values don't count as distinct (count-distinct semantics in
    // both engines) — and must not reach the rank window, where Spark's
    // NULLS FIRST would burn a sketch slot DuckDB's NULLS LAST wouldn't.
    val hashed = df.where(value.isNotNull)
      .select(group :+ hash60(value).as("hkey"): _*).distinct()
    // Partition by the PROJECTED names: a group expression (e.g. a
    // date_trunc) no longer resolves against the post-select schema.
    val names = hashed.columns.dropRight(1).map(col).toIndexedSeq
    hashed
      .withColumn("__rk",
        rank().over(Window.partitionBy(names: _*).orderBy(col("hkey"))))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Integer KMV estimate from a sketch's row count and k-th minimum:
    * exact count when the group has fewer than k distinct values, else
    * `(k-1) * (2^60 div kth)` — the (k-1)/h_k estimator with the
    * normalization done in truncating integer division (both engines
    * truncate toward zero), so no float ever enters the oracle hash. */
  def kmvEstimate(nKept: Column, kth: Column, k: Int): Column =
    when(nKept < k, nKept)
      .otherwise(lit(k - 1L) *
        call_function("div", lit(HashDomain), kth))

  /** KMV MERGE in sketch-row form: dedup a (possibly oversized) union of
    * partial sketches `(group*, hkey)` and re-take bottom-k per group —
    * what a warehouse PERSISTS between batches (≤ k rows per group,
    * lossless to merge again later). */
  def kmvMergeSketch(sketch: DataFrame, group: Seq[Column],
      k: Int): DataFrame =
    sketch.distinct()
      .withColumn("__rk",
        rank().over(Window.partitionBy(group: _*).orderBy(col("hkey"))))
      .filter(col("__rk") <= k)
      .drop("__rk")

  /** Estimate from sketch rows (group*, hkey): already-hashed space —
    * merges ([[kmvMergeSketch]]) then derives the estimate. */
  def kmvEstimateSketch(sketch: DataFrame, group: Seq[Column],
      k: Int): DataFrame =
    kmvMergeSketch(sketch, group, k)
      .groupBy(group: _*)
      .agg(count(lit(1)).as("__n_kept"), max(col("hkey")).as("kth"))
      .select(group :+ kmvEstimate(col("__n_kept"), col("kth"), k)
        .as("users_est"): _*)

  /** Distinct-count estimate per group: groups + `users_est`. One
    * estimator body ([[kmvEstimateSketch]]) serves both the direct and
    * the merge path; the extra dedup/rank inside it is a no-op on an
    * already-bottom-k sketch (≤ k·groups rows). */
  def kmvDistinct(df: DataFrame, group: Seq[Column], value: Column,
      k: Int): DataFrame = {
    val sketch = kmvBottomK(df, group, value, k)
    kmvEstimateSketch(sketch,
      sketch.columns.dropRight(1).map(col).toIndexedSeq, k)
  }

  /** Mergeable-sketch rollup — THE re-aggregation pattern at 100 TB:
    * build one bottom-k partial per (group, day), then merge the
    * partials up to per-group totals WITHOUT touching raw rows again
    * (daily partials are what a warehouse persists; re-scanning history
    * to count distincts is the anti-pattern). KMV merge = distinct-union
    * the partials' hashes and re-take bottom-k — exactly lossless, and
    * the merge input is ≤ k rows per day. */
  def kmvRollup(df: DataFrame, group: Column, day: Column, value: Column,
      k: Int): DataFrame = {
    val daily = kmvBottomK(df, Seq(group, day.as("day")), value, k)
    val groupName = daily.columns.head // group's output name
    // Merge IN THE SAME HASH SPACE (no re-hash): union the partials'
    // hkeys and re-take bottom-k — bottom-k(∪ bottom-k(day)) ==
    // bottom-k(∪ day), the exact-losslessness the rollup spec asserts.
    val merged = kmvEstimateSketch(
      daily.select(col(groupName), col("hkey")), Seq(col(groupName)), k)
    val nDays = daily.select(col(groupName), col("day")).distinct()
      .groupBy(col(groupName)).agg(count(lit(1)).as("n_days"))
    merged.join(broadcast(nDays), groupName)
  }

  /** Deterministic hash-sampled exact percentiles: keep the 1-in-`mod`
    * hash sample of rows (sampling key = a row id, so the sample is the
    * SAME set in both engines), then exact interpolated percentiles on
    * the sample. The 100 TB shape: the full-data sort a true percentile
    * needs is replaced by a sample small enough to aggregate exactly —
    * and unlike a sketch, the result is reproducible bit-for-bit. */
  def sampledPercentiles(df: DataFrame, group: Column, rowId: Column,
      value: Column, mod: Int, ps: Seq[(Double, String)]): DataFrame =
    df.filter(hash60(rowId) % mod === 0)
      .groupBy(group)
      .agg(ps.head match { case (p, n) => percentile(value, lit(p)).as(n) },
        ps.tail.map { case (p, n) => percentile(value, lit(p)).as(n) }: _*)

  // ---- approximate twins (tolerance-spec'd; no cross-engine oracle) ----

  /** HyperLogLog approximate distinct per group (Spark built-in). */
  def approxDistinct(df: DataFrame, group: Column, value: Column): DataFrame =
    df.groupBy(group).agg(approx_count_distinct(value).as("approx_users"))

  /** DataSketches-HLL daily partials merged to per-group totals. */
  def hllRollup(df: DataFrame, group: Column, day: Column,
      value: Column): DataFrame =
    df.groupBy(group, day.as("day"))
      .agg(hll_sketch_agg(value).as("sk"))
      .groupBy(group)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("users_est"),
        count(lit(1)).as("n_days"))

  /** KLL/GK-style approximate grouped percentiles (Spark built-in). */
  def approxPercentiles(df: DataFrame, group: Column, value: Column,
      accuracy: Int, ps: Seq[(Double, String)]): DataFrame =
    df.groupBy(group)
      .agg(ps.head match { case (p, n) =>
          percentile_approx(value, lit(p), lit(accuracy)).as(n) },
        ps.tail.map { case (p, n) =>
          percentile_approx(value, lit(p), lit(accuracy)).as(n) }: _*)
}
