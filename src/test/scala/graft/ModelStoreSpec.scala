package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.io.ModelStore

/** Trained-artifact store: train-once semantics, corpus fingerprinting,
  * versioned retrain. */
class ModelStoreSpec extends AnyFunSuite with SparkSuite {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_models_$tag").toString

  test("getOrTrain trains exactly once per (artifact, corpus fingerprint)") {
    import spark.implicits._
    val store = ModelStore(spark, freshRoot("once"))
    val trains = new AtomicInteger(0)
    def train = { trains.incrementAndGet(); Seq((1, "a"), (2, "b")).toDF("k", "v") }
    val fp = "fp16aaaaaaaaaaaa"
    val first = store.getOrTrain("toy", fp)(train).collect().toSet
    val second = store.getOrTrain("toy", fp)(train).collect().toSet
    assert(trains.get() == 1, "second call must read the persisted artifact")
    assert(first == second)
    // A different corpus fingerprint is a different artifact: retrains.
    store.getOrTrain("toy", "fp16bbbbbbbbbbbb")(train)
    assert(trains.get() == 2)
    // A fresh store instance over the same root still sees it (the memo
    // is the filesystem, not the JVM).
    val again = ModelStore(spark, store.root)
    assert(again.exists("toy", fp))
    assert(again.getOrTrain("toy", fp)(train).collect().toSet == first)
    assert(trains.get() == 2)
  }

  test("fingerprint: stable on unchanged corpus, moves when a file changes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    val p = s"$dir/t.parquet"
    Seq((1, "x"), (2, "y")).toDF("id", "s").write.mode("overwrite").parquet(p)
    val fp1 = ModelStore.fingerprint(spark, Seq(p))
    val fp2 = ModelStore.fingerprint(spark, Seq(p))
    assert(fp1 == fp2)
    assert(fp1.length == 16)
    Thread.sleep(5) // ensure mtime can move
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "s")
      .write.mode("overwrite").parquet(p)
    val fp3 = ModelStore.fingerprint(spark, Seq(p))
    assert(fp3 != fp1, "rewritten corpus must change the fingerprint")
    // Absent path fingerprints deterministically instead of throwing.
    val fpAbsent = ModelStore.fingerprint(spark, Seq(s"$dir/nope.parquet"))
    assert(fpAbsent.length == 16)
  }

  test("gc sweeps artifacts of dead corpus fingerprints, keeps live ones") {
    import spark.implicits._
    val store = ModelStore(spark, freshRoot("gc"))
    // Real fingerprints are md5Hex.take(16) — 16 lowercase hex chars.
    val (live, stale) = ("00a1b2c3d4e5f601", "ffeeddccbbaa9988")
    def df = Seq((1, "a")).toDF("k", "v")
    store.getOrTrain("dict", live)(df)
    store.getOrTrain("dict", stale)(df)
    store.getOrTrain("index", stale)(df)
    // A table whose "fingerprint" is not 16-hex (e.g. created by foreign
    // tooling under models/) must never be swept, whatever liveFps says.
    store.getOrTrain("legacy", "snapshot")(df)
    val liveRows = store.getOrTrain("dict", live)(sys.error("trained")).collect().toSeq
    // Default-margin pass first: the spec creates and sweeps within one
    // clock tick, so the 60 s skew margin (correctly) treats these
    // just-committed artifacts as concurrent — and the report must SAY
    // so, not present the no-op as nothing-to-collect.
    val deferred = store.gc(Set(live))
    assert(deferred.dropped.isEmpty)
    assert(deferred.skippedConcurrent.toSet ==
      Set(("dict", stale), ("index", stale)),
      s"in-margin stale artifacts must be reported as skipped, got $deferred")
    assert(store.exists("dict", stale), "deferred artifact must survive")
    val dropped = store.gc(Set(live), skewMarginMs = 0L).dropped
    assert(dropped.toSet == Set(("dict", stale), ("index", stale)),
      s"gc must sweep exactly the stale fingerprint's artifacts, got $dropped")
    assert(!store.exists("dict", stale) && !store.exists("index", stale))
    assert(store.exists("legacy", "snapshot"),
      "non-hex-fingerprint table must survive gc")
    // The live artifact is untouched: still present, same bytes, and
    // getOrTrain still reads it instead of retraining.
    assert(store.exists("dict", live))
    assert(store.getOrTrain("dict", live)(sys.error("must not retrain"))
      .collect().toSeq == liveRows)
    // Idempotent: a second sweep with the same live set drops nothing —
    // and reports nothing skipped either (genuinely clean store).
    val again = store.gc(Set(live), skewMarginMs = 0L)
    assert(again.dropped.isEmpty && again.skippedConcurrent.isEmpty)
  }

  test("retrain commits a new version; previous generation time-travels") {
    import spark.implicits._
    val store = ModelStore(spark, freshRoot("ver"))
    val fp = "fp16cccccccccccc"
    store.getOrTrain("m", fp)(Seq((1, 10L)).toDF("k", "n"))
    val v1 = store.versions("m", fp)
    assert(v1.size == 1)
    store.retrain("m", fp)(Seq((1, 11L), (2, 12L)).toDF("k", "n"))
    val v2 = store.versions("m", fp)
    assert(v2.size == 2 && v2.head == v1.head)
    assert(store.getOrTrain("m", fp)(sys.error("must not retrain"))
      .count() == 2)
  }
}
