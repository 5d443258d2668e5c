package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media payloads
  * ride as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batch-wise over partitions.
  *
  * The decode step itself is a STUB (no image/audio codecs in this
  * environment — deterministic fake features derived from the bytes); the
  * Spark-side plumbing is real and tested: schema, batch shape,
  * partition-wise execution, and the metadata/projection path.
  *
  * Scale design: payload bytes are only materialized inside the partition
  * iterator (`mapPartitions`), never shuffled — all wide transforms are on
  * the narrow metadata/feature columns. Batch size bounds peak memory per
  * task the same way Arrow batch size does for vectorized Python UDFs.
  */
object MultimodalOps {

  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a binary payload + deterministic metadata struct to each row
    * (here the "media" is the utf-8 bytes of a text column — the plumbing
    * is format-agnostic). Pure projection. */
  def withBinaryColumn(df: DataFrame, textCol: String): DataFrame = {
    val bytes = encode(col(textCol), "utf-8")
    val n = octet_length(bytes).cast("long")
    df.withColumn("payload", bytes)
      .withColumn("meta", struct(
        lit("fake/rgb8").as("format"),
        (n % 640 + 16).cast("int").as("width"),
        ((n * 7) % 480 + 16).cast("int").as("height"),
        n.as("n_bytes")))
  }

  val FeatureDim = 16

  /** Batch-wise "decode + feature extraction" over partitions — the Scala
    * analogue of a vectorized (mapInPandas-style) UDF: rows are pulled in
    * batches of `batchSize`, each batch is "decoded" together, and only
    * the narrow feature vector leaves the iterator.
    *
    * STUB decode: a real deployment would decode `payload` with an image
    * codec here; this environment has none, so features are a
    * deterministic byte-value histogram (16 buckets, L1-normalized) —
    * stable across partitionings and runs. */
  def decodeFeatures(df: DataFrame, idCol: String, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(idCol).cast("long"), col("payload"))
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rdd = in.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // One "decode" per batch (codec setup amortized across the batch,
        // like Arrow-batch Python UDFs).
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Double](FeatureDim)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) / (256 / FeatureDim)) += 1.0; i += 1 }
          val total = math.max(bytes.length.toDouble, 1.0)
          Row(id, hist.map(_ / total).toIndexedSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for "video" payloads: every `every`-th fixed-size
    * chunk of the payload becomes a frame row (id, frame_no, frame_bytes).
    * Pure projection + explode — the payload is sliced, never shuffled
    * whole. */
  def frameSample(df: DataFrame, idCol: String, frameBytes: Int, every: Int): DataFrame = {
    val nFrames = floor(octet_length(col("payload")) / lit(frameBytes)).cast("int")
    df.select(col(idCol),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(every))).as("frame_no"),
        col("payload"))
      .select(col(idCol), col("frame_no"),
        expr(s"substring(payload, frame_no * $frameBytes + 1, $frameBytes)").as("frame_bytes"))
  }

  /** Sliding-window chunking for "audio" payloads: windows of
    * `windowBytes` advancing by `strideBytes` (overlapping when stride <
    * window — the ASR-style segmentation shape). Emits (id, chunk_idx,
    * chunk_off, chunk_len); the last chunk is short. Integer arithmetic
    * only, so it oracles exactly; the payload itself is sliced lazily by
    * downstream consumers (same pattern as [[frameSample]]) and never
    * shuffled whole. */
  def audioChunks(df: DataFrame, idCol: String,
      windowBytes: Int, strideBytes: Int): DataFrame = {
    require(strideBytes > 0 && windowBytes >= strideBytes,
      s"need windowBytes >= strideBytes > 0, got $windowBytes/$strideBytes")
    val len = octet_length(col("payload")).cast("long")
    // ceil(len / stride) chunks: every offset k*stride < len.
    val nChunks = ((len + strideBytes - 1) / strideBytes).cast("long")
    df.select(col(idCol), len.as("__len"),
        explode(sequence(lit(0L), greatest(nChunks - 1, lit(0L)))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * strideBytes).as("chunk_off"),
        least(lit(windowBytes.toLong),
          col("__len") - col("chunk_idx") * strideBytes).as("chunk_len"))
      // len=0 payloads still explode one row (sequence(0,0)) with
      // chunk_len=0 — drop it so chunk count is exactly ceil(len/stride).
      .filter(col("chunk_len") > 0)
  }

  /** REAL nearest-neighbor pixel resize on the opaque payload: the bytes
    * are read as a `srcW`-wide 8-bit grayscale raster (rows = n_bytes
    * div srcW, the tail partial row dropped) and sampled to dstW x dstH
    * with the standard floor(dst·src/dstDim) index map — the actual
    * kernel a thumbnail pass runs, on real bytes, no codec needed. Pure
    * projection over exact integer arithmetic (byte values come from
    * hex-pair parsing, index math is integer division of non-negative
    * ints — the double-division-then-truncate form equals `div` because
    * IEEE division is correctly rounded), so the DuckDB oracle
    * reproduces the resized raster bit-for-bit. Output keeps the
    * digest + exact mean, not the raster, so only narrow rows shuffle. */
  def resizeNearest(df: DataFrame, idCol: String,
      srcW: Int, dstW: Int, dstH: Int): DataFrame = {
    val hexs = hex(col("payload"))
    val srcH = (octet_length(col("payload")).cast("long") / srcW).cast("long")
    val px = transform(sequence(lit(0), lit(dstW * dstH - 1)), i => {
      val r = (i.cast("long") / dstW).cast("long")
      val c = pmod(i, lit(dstW)).cast("long")
      val srcR = ((r * col("__src_h")).cast("double") / dstH).cast("long")
      val srcC = ((c * srcW).cast("double") / dstW).cast("long")
      val idx = srcR * srcW + srcC
      conv(substring(col("__hex"), (idx * 2 + 1).cast("int"), lit(2)), 16, 10)
        .cast("int")
    })
    df.filter(octet_length(col("payload")) >= srcW)
      .withColumn("__hex", hexs).withColumn("__src_h", srcH)
      .withColumn("__px", px)
      .select(col(idCol), lit(dstW).as("dst_w"), lit(dstH).as("dst_h"),
        md5(array_join(transform(col("__px"), v => v.cast("string")), ","))
          .as("raster_md5"),
        (aggregate(col("__px"), lit(0L), (a, v) => a + v).cast("double") /
          lit((dstW * dstH).toDouble)).as("mean_px"))
  }

  /** Metadata-level "resize": recompute the declared dimensions; the
    * payload is untouched (a real resize happens inside decodeFeatures'
    * batch loop). */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h).cast("double"))
    df.withColumn("meta", struct(
      col("meta.format").as("format"),
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col("meta.n_bytes").as("n_bytes")))
  }
}
