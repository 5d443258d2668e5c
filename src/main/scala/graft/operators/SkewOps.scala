package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling operators (100 TB discipline): when one key holds a
  * disproportionate share of the rows, a plain hash shuffle sends that
  * whole share to one reducer. Salting splits each hot key across
  * `salts` sub-keys, re-merging afterwards — bounded per-task input at
  * the cost of one extra (tiny) aggregation or a `salts`× dim-side
  * replication.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * operators cover the cases it does not: skewed AGGREGATION keys, and
  * plans where the skewed side must stay hash-partitioned.
  */
object SkewOps {

  /** Skew diagnostic: the top-N heaviest keys with their share of all
    * rows — the measurement that decides WHETHER to salt and with how
    * many salts (a key at share s needs ~s * totalRows / targetRowsPerTask
    * salts). One agg + a tiny top-N + a broadcast scalar; the fact table
    * is scanned once. */
  def keyHistogram(df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column, topN: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("__total"))
    counts.orderBy(col("n_rows").desc, col("key")).limit(topN)
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_rows"),
        (col("n_rows").cast("double") / col("__total").cast("double"))
          .as("share"))
  }

  /** Two-phase salted sum/count aggregation: phase 1 aggregates
    * (key, salt) — at most `salts` cells per hot key per reducer —
    * phase 2 merges the per-salt partials. Sums stay DECIMAL through
    * both phases (decimal addition is associative, so the result is
    * bit-identical to the unsalted aggregation), cast to double once at
    * the end. `salt` must be a deterministic column, e.g.
    * `pmod(col("some_id"), lit(salts))`. */
  def saltedSumCount(df: DataFrame, key: Column, keyName: String,
      salt: Column, value: Column): DataFrame =
    df.groupBy(key.as(keyName), salt.as("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value.cast("decimal(18,6)")).as("__s"))
      .groupBy(col(keyName))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).cast("double").as("sum_value"))

  /** Bloom-prefiltered join: when the build side is selective but too
    * large (or too late in the plan) for Spark's automatic runtime
    * filter, build a Bloom filter over its join keys DISTRIBUTED (one
    * partial-aggregated pass — only the ~numBits/8-byte sketch reaches
    * the driver), then probe it on the big side BEFORE the shuffle.
    * Rows that can't match never leave their input partition; the final
    * equi-join removes the false positives, so the result is
    * row-identical to `big.join(small, key)`. This is the manual form
    * of Spark's `InjectRuntimeFilter` bloom (same
    * `BloomFilterAggregate`/`BloomFilterMightContain` machinery),
    * usable where the optimizer declines (non-equi pre-conditions,
    * reused filters, filter-then-join-later pipelines).
    *
    * Eager: building the sketch runs a Spark job when called.
    * `expectedItems`/`numBits` size the sketch (bits ≈ 7.3×items for
    * ~3% fp — fp only costs shuffled-then-dropped rows, never
    * correctness). */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1L << 17, numBits: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftshim.GraftColumns.{column, expression}
    val h = xxhash64(col(key))
    val bloomBytes = small.select(column(
        new BloomFilterAggregate(expression(h),
          Literal(expectedItems), Literal(numBits))
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val prefiltered = big.filter(column(BloomFilterMightContain(
      Literal.create(bloomBytes,
        org.apache.spark.sql.types.BinaryType), expression(h))))
    prefiltered.join(small, key)
  }

  /** Salted equi-join for a skewed fact side against a small dim side:
    * the dim is replicated `salts`× (explode over the salt range), the
    * fact gets a deterministic salt in [0, salts), and the join runs on
    * (key, salt) — so a hot key's rows spread over `salts` reducers
    * instead of one. Result is row-identical to `fact.join(dim, key)`.
    * `factSalt` must be deterministic per row (e.g. pmod of a row id). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, factSalt: Column): DataFrame =
    fact.withColumn("__salt", pmod(factSalt, lit(salts)).cast("int"))
      .join(dim.withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1)))), Seq(key, "__salt"))
      .drop("__salt")
}
