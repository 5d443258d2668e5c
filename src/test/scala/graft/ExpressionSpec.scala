package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** Custom Catalyst expression specs: the codegen'd dot product must be
  * bit-identical to the composed-builtin fold (the oracle determinism
  * contract) and register cleanly for SQL via GraftExtensions. */
class ExpressionSpec extends AnyFunSuite with SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("graft_dot is bit-identical to the composed fold on real embeddings") {
    val emb = Tables(spark, sf, "embeddings").limit(200)
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("idb"), col("embedding").as("b")))
      .filter(col("ida") < col("idb")).limit(5000)
    val both = pairs.select(
      SimilarityOps.dot(col("a"), col("b")).as("native"),
      SimilarityOps.dotFold(col("a"), col("b")).as("fold"))
    val diff = both.filter(
      col("native") =!= col("fold") ||
      col("native").isNull =!= col("fold").isNull).count()
    assert(diff == 0)
  }

  test("graft_dot null/length semantics match the fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),   // 11.0
      (Array(1.0f), Array(1.0f, 2.0f))          // length mismatch -> null
    ).toDF("a", "b")
    val rows = df.select(SimilarityOps.dot(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))

    val withNull = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 1.0f)))
      .toDF("a", "b")
      .select(SimilarityOps.dot(col("a"), col("b"))).collect()
    assert(withNull(0).isNullAt(0))
  }

  test("graft_dot is usable from SQL after registration") {
    graft.expressions.GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .collect()(0).getDouble(0)
    assert(out == 11.0)
    // The session-construction path injects the same builder.
    new graft.expressions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
