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

  test("graft_l2_dist_sq is bit-identical to the composed fold, both widths") {
    import graft.expressions.GraftFunctions
    val emb = Tables(spark, sf, "embeddings").limit(100)
    def fold(x: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, c, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, v) => acc + v)
    // float vec vs double centroid (the k-means shape)…
    val cents = emb.select(col("vec_id").as("cid"),
      transform(col("embedding"), v => v.cast("double")).as("c"))
    val pairs = emb.select(col("vec_id"), col("embedding").as("x"))
      .crossJoin(cents.limit(8))
    val d1 = pairs.select(
        GraftFunctions.l2DistSq(col("x"), col("c")).as("native"),
        fold(col("x"), col("c")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(d1 == 0)
    // …and double vs double (iteration 2+).
    val dd = cents.select(col("cid"), col("c").as("x"))
      .crossJoin(cents.limit(8))
    val d2 = dd.select(
        GraftFunctions.l2DistSq(col("x"), col("c")).as("native"),
        fold(col("x"), col("c")).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(d2 == 0)
    // Length mismatch -> null (the fold's zip_with would truncate, the
    // kernel refuses — matching DotProductFloat's contract).
    import spark.implicits._
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0))).toDF("x", "c")
      .select(GraftFunctions.l2DistSq(col("x"), col("c"))).collect()
    assert(bad(0).isNullAt(0))
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

  test("sorted_intersect_count matches array_intersect on random sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map { _ =>
      val a = rnd.shuffle((1L to 200L).toList).take(rnd.nextInt(100) + 1).distinct.sorted
      val b = rnd.shuffle((1L to 200L).toList).take(rnd.nextInt(100) + 1).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        graft.expressions.GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("c1"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("c2"))
      .filter(col("c1") =!= col("c2")).count()
    assert(diff == 0)
  }

  test("Opaque blocks predicate pushdown into a join condition") {
    import spark.implicits._
    val l = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val r = Seq((1L, 1L), (2L, 2L)).toDF("rid", "w")
    def planOf(c: org.apache.spark.sql.Column): String =
      l.join(r, col("id") === col("rid"))
        .select(col("id"), c.as("x"))
        .filter(col("x") > 5)
        .queryExecution.optimizedPlan.toString
    // Without the barrier the filter folds into the join.
    val bare = planOf(col("v") * col("w"))
    assert(!bare.contains("Filter ("), bare)
    // With Opaque, a Filter node survives above the projection.
    val walled = planOf(graft.expressions.GraftFunctions.opaque(col("v") * col("w")))
    assert(walled.contains("Filter"), walled)
    // And the result is unchanged.
    val out = l.join(r, col("id") === col("rid"))
      .select(col("id"),
        graft.expressions.GraftFunctions.opaque(col("v") * col("w")).as("x"))
      .filter(col("x") > 5).collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(out == Set((1L, 10L), (2L, 40L)))
  }

  test("NgramHashes matches the declarative xxhash64 + rotl7-xor form") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d", "e", "f")),
      (2L, Seq("a", "b", "c")),        // exactly n tokens -> 1 gram
      (3L, Seq("x", "y")),             // fewer than n -> empty
      (4L, Seq.empty[String])).toDF("id", "toks")
    val n = 3
    def rotl7(c: org.apache.spark.sql.Column) =
      shiftleft(c, 7).bitwiseOR(shiftrightunsigned(c, 57))
    val th = transform(col("toks"), t => xxhash64(t))
    val m = greatest(size(col("toks")) - (n - 1), lit(0))
    val reference = (2 to n).foldLeft(slice(th, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(th, lit(k), m), (a, b) => rotl7(a).bitwiseXOR(b))
    }
    val rows = docs.select(col("id"),
        graft.expressions.GraftFunctions.ngramHashes(col("toks"), n).as("fast"),
        reference.as("ref"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    rows.foreach { case (id, fast, ref) =>
      assert(fast == ref, s"doc $id: $fast != $ref")
    }
    assert(rows.find(_._1 == 1L).get._2.length == 4)
    assert(rows.find(_._1 == 3L).get._2.isEmpty)
    assert(rows.find(_._1 == 4L).get._2.isEmpty)
    // Order sensitivity: reversed window hashes differently.
    val rev = docs.filter(col("id") === 2L)
      .select(graft.expressions.GraftFunctions.ngramHashes(reverse(col("toks")), n))
      .collect()(0).getSeq[Long](0)
    assert(rev != rows.find(_._1 == 2L).get._2)
  }

  test("StringSetHitCount matches the filter-HOF form on real documents") {
    import graft.functions.TextFunctions
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val toks = TextFunctions.tokens(lower(col("text")))
    val dict = array(TextFunctions.StopEn.map(lit): _*)
    val reference = size(filter(toks, t => array_contains(dict, t)))
    val rows = docs.select(col("doc_id"),
        graft.expressions.GraftFunctions
          .hitCount(toks, TextFunctions.StopEn).as("fast"),
        reference.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"doc ${r.getLong(0)}: ${r.getInt(1)} != ${r.getInt(2)}"))
    assert(rows.exists(_.getInt(1) > 0), "no stopword hits in the corpus?")
    // Null semantics: null array -> null; null elements not counted
    // (the HOF's array_contains(dict, null) is null == filter-false).
    import spark.implicits._
    val edge = Seq((1L, Seq("the", null, "zzz")), (2L, null))
      .toDF("id", "toks")
      .select(col("id"), graft.expressions.GraftFunctions
        .hitCount(col("toks"), TextFunctions.StopEn).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(edge(1L) == 1 && edge(2L) == -1)
  }

  test("RegexpCountAll matches size(regexp_extract_all) on real documents") {
    import graft.functions.TextFunctions
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val reference = size(regexp_extract_all(col("text"),
      lit(TextFunctions.BpeTokenRe), lit(0)))
    val rows = docs.select(col("doc_id"),
        graft.expressions.GraftFunctions
          .regexpCount(col("text"), TextFunctions.BpeTokenRe).as("fast"),
        reference.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"doc ${r.getLong(0)}: ${r.getInt(1)} != ${r.getInt(2)}"))
    assert(rows.exists(_.getInt(1) > 0))
    // Null text -> null; empty text -> 0 matches.
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, null), (3L, "ab1 2c!"))
      .toDF("id", "s")
      .select(col("id"), graft.expressions.GraftFunctions
        .regexpCount(col("s"), TextFunctions.BpeTokenRe).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(edge(1L) == 0 && edge(2L) == -1 && edge(3L) == 5)
  }

  test("WordBigramStrings matches the zip_with form on real documents") {
    import graft.functions.TextFunctions.{normalized, tokens}
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val toks = tokens(normalized(col("text")))
    val n = size(toks)
    val reference = when(n <= 1, toks).otherwise(
      zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
    val rows = docs.select(col("doc_id"),
        graft.expressions.GraftFunctions.wordBigramStrings(toks).as("fast"),
        reference.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
      s"doc ${r.getLong(0)} bigram drift"))
    assert(rows.exists(_.getSeq[String](1).length > 1))
    // Degenerate + null semantics: <=1 token returns the tokens; null
    // neighbors null the pair; null array -> null.
    import spark.implicits._
    val edge = Seq(
        (1L, Seq("only")), (2L, Seq.empty[String]),
        (3L, Seq("a", null, "c")), (4L, null))
      .toDF("id", "toks")
      .select(col("id"), graft.expressions.GraftFunctions
        .wordBigramStrings(col("toks")).as("bg"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(edge(1L) == Seq("only"))
    assert(edge(2L) == Seq.empty[String])
    assert(edge(3L) == Seq(null, null))
    assert(edge(4L) == null)
  }

  test("Md5PrefixLong is bit-identical to conv(substring(md5)) — both widths") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    for (n <- Seq(12, 15)) {
      val rows = docs.select(col("doc_id"),
          graft.expressions.GraftFunctions
            .md5PrefixLong(col("text"), n).as("fast"),
          conv(substring(md5(col("text")), 1, n), 16, 10).cast("long")
            .as("ref"))
        .collect()
      rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)} width $n: ${r.getLong(1)} != ${r.getLong(2)}"))
    }
    // Null in, null out; empty string hashes like md5('').
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, null)).toDF("id", "s")
      .select(col("id"),
        graft.expressions.GraftFunctions.md5PrefixLong(col("s"), 15).as("h"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("r"))
      .collect()
    edge.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2))
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2))
    }
  }

  test("ArrayDropByMd5Prefix matches the filter/array_contains form") {
    import graft.functions.TextFunctions.{hash60, normalized, tokens}
    val docs = Tables(spark, sf("sf0.001"), "documents")
    // Dictionary: hashes of a planted tile + some organic tokens, handed
    // to the kernel UNSORTED (it must sort internally).
    val dictWords = Seq("the", "data", "zz-never-present")
    val dict = dictWords.map(w =>
      graft.expressions.Md5PrefixLong.hashPrefix(
        org.apache.spark.unsafe.types.UTF8String.fromString(w), 15)).reverse.toArray
    val toks = tokens(normalized(col("text")))
    val litDict = array(dict.map(lit).toIndexedSeq: _*)
    val rows = docs.select(col("doc_id"),
        graft.expressions.GraftFunctions
          .dropByMd5Prefix(toks, dict, 15).as("fast"),
        filter(toks, t => !array_contains(litDict, hash60(t))).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
      s"doc ${r.getLong(0)} kernel drift"))
    // The dictionary actually bites somewhere in the corpus.
    val dropped = docs.select(
      (size(toks) - size(graft.expressions.GraftFunctions
        .dropByMd5Prefix(toks, dict, 15))).as("d"))
      .agg(sum(col("d"))).collect()(0).getLong(0)
    assert(dropped > 0, "dictionary never matched — test is vacuous")
    // Edge semantics: null array -> null; null elements dropped (the
    // HOF form's array_contains(dict, null) is null -> filtered out);
    // empty dict keeps everything non-null.
    import spark.implicits._
    val edge = Seq((1L, Seq("the", null, "keep")), (2L, null))
      .toDF("id", "toks")
      .select(col("id"),
        graft.expressions.GraftFunctions
          .dropByMd5Prefix(col("toks"), dict, 15).as("kept"),
        graft.expressions.GraftFunctions
          .dropByMd5Prefix(col("toks"), Array.empty[Long], 15).as("all"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) (null, null)
         else (r.getSeq[String](1), r.getSeq[String](2)))).toMap
    assert(edge(1L) == (Seq("keep"), Seq("the", "keep")))
    assert(edge(2L) == ((null, null)))
  }

  test("every kernel codegen-COMPILES over non-nullable children (no silent fallback)") {
    import graft.expressions.GraftFunctions._
    // Codegen compile failures normally DEGRADE silently (interpreted
    // fallback, correctness intact, kernel perf gone) — CODEGEN_ONLY +
    // fallback=false make them throw. Non-nullable children matter:
    // nullSafeCodeGen then omits the `boolean isNull_N` declaration, so
    // a kernel whose result code assigns ev.isNull must declare itself
    // nullable or the generated class does not compile (the
    // DotProductFloat/L2DistSq bug this spec pins).
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // Children must be NON-NULLABLE but NOT foldable — all-literal
      // arrays constant-fold at optimization time (interpreted eval) and
      // codegen never sees the kernel, making the gate vacuous. Deriving
      // every value from range's non-nullable `id` keeps the branch under
      // test (no isNull declaration) while forcing real code generation.
      val idf = col("id").cast("float")
      val ids = concat(lit("a"), col("id"))
      val fv = array(idf + 1.0f, idf + 2.0f)
      val dv = array(col("id").cast("double") + 1.0, col("id").cast("double") + 2.0)
      val lv = array(col("id") + 3L, col("id") + 5L)
      val sv = array(lit("a"), ids, concat(ids, lit(" b")))
      val out = spark.range(1).select(
          dotF(fv, fv).as("dot"),
          l2DistSq(fv, dv).as("l2"),
          sortedIntersectCount(lv, lv).as("ic"),
          delNeighborhood(ids).as("dn"),
          opaque(ids).as("op"),
          ngramHashes(sv, 2).as("ng"),
          hitCount(sv, Seq("a", "zz")).as("hc"),
          regexpCount(concat(ids, lit(" bb a")), "a").as("rc"),
          wordBigramStrings(sv).as("bg"),
          md5PrefixLong(ids, 15).as("h60"),
          bucketCounts(sv, 16).as("bc"),
          dropByMd5Prefix(sv, Array(graft.expressions.Md5PrefixLong.hashPrefix(
            org.apache.spark.unsafe.types.UTF8String.fromString("a"), 15)), 15)
            .as("drop"))
        .collect()(0)
      assert(out.getDouble(0) == 5.0)       // id=0: 1*1 + 2*2
      assert(out.getDouble(1) == 0.0)
      assert(out.getLong(2) == 2L)
      assert(out.getSeq[Long](10).sum == 3L)               // 3 grams bucketed
      assert(out.getSeq[String](11) == Seq("a0", "a0 b"))  // "a" dropped
    } finally {
      def restore(k: String, v: Option[String]) =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore("spark.sql.codegen.factoryMode", prevFactory)
      restore("spark.sql.codegen.fallback", prevFallback)
    }
  }

  test("BucketCountsMd5 matches the explode/groupBy composed form") {
    import graft.expressions.GraftFunctions
    import graft.functions.TextFunctions.{hash60, normalized, tokens, wordBigrams}
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val grams = concat(tokens(normalized(col("text"))), wordBigrams(col("text")))
    val composed = docs.select(col("doc_id"), explode(grams).as("g"))
      .groupBy(col("doc_id"), pmod(hash60(col("g")), lit(64L)).as("bucket"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val kernel = docs.select(col("doc_id"),
        posexplode(GraftFunctions.bucketCounts(grams, 64)))
      .filter(col("col") > 0)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getLong(2)).toMap
    assert(kernel == composed)
    // Null array -> null (posexplode drops it); null ELEMENTS skipped.
    import spark.implicits._
    val edge = Seq((1L, Seq("a", null, "a")), (2L, null))
      .toDF("id", "toks")
      .select(col("id"), GraftFunctions.bucketCounts(col("toks"), 4).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).sum)).toMap
    assert(edge(1L) == 2L && edge(2L) == null)
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
