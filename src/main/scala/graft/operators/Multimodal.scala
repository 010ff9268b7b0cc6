package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2d.42 — multimodal (image/audio/video) columns as opaque binary
  * payloads plus a typed metadata struct, with a batched per-partition
  * "decode / feature-extract" stage.
  *
  * The Spark-side plumbing is real — schema contract, partition sizing,
  * batched iteration, output schema — while the codec itself is a STUB
  * (`FakeCodec`): this container has no image/audio libraries, so the stub
  * derives deterministic pseudo-features from the bytes. Swapping in a real
  * decoder is a one-function change behind the same batch interface.
  */
object Multimodal {

  /** Canonical multimodal schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB codec — stands in for image decode / resample / feature extract.
    * Deterministic in the payload bytes so tests are stable. Real decoders
    * implement the same (payload, meta) => features contract, batch-wise.
    */
  /** Frame-sampling geometry for "video" payloads: fixed FrameBytes-byte
    * frames, every FrameStride-th frame sampled (a real pipeline decodes
    * only the sampled frames — the point of sampling is exactly that the
    * full decode never happens). A trailing partial frame is a frame.
    * Declared BEFORE `pack`: the oracle SQL interpolates them at object
    * initialization, and a later-declared val would read as 0 there.
    */
  val FrameBytes = 64
  val FrameStride = 4

  object FakeCodec {
    val FeatureDim = 8
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[(Long, Long, String, Array[Float])] =
      batch.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val md = java.security.MessageDigest.getInstance("MD5").digest(b)
        val checksum = md.map("%02x".format(_)).mkString
        // pseudo-feature: bucketed byte histogram, normalized
        val hist = new Array[Float](FeatureDim)
        b.foreach(x => hist((x & 0xff) % FeatureDim) += 1f)
        val n = math.max(b.length, 1).toFloat
        (id, b.length.toLong, checksum, hist.map(_ / n))
      }
  }

  /** Build a deterministic synthetic media table from `documents` (binary
    * payload = UTF-8 text bytes) — the stand-in for reading real media files.
    */
  def syntheticMedia(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.load(spark, sfDir, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("format"),
        lit(null).cast("integer").as("width"),
        lit(null).cast("integer").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Oracle-checked query entry: the full binary → batched-decode →
    * features pipeline over the synthetic media table. The synthetic
    * payloads are UTF-8 text bytes, so DuckDB can independently recompute
    * every output column in SQL — md5 checksum, byte length, and the
    * per-bucket byte histogram the stub codec's feature vector encodes
    * (bucket counts are recovered exactly from the normalized float32
    * features: count/n round-trips through float32 for any document under
    * ~10^5 bytes). The oracle histograms the text's actual UTF-8 BYTES
    * (hex(encode(text)) sliced two hex digits at a time), matching the
    * codec's byte-wise view for any content — a character-indexed oracle
    * would silently diverge on the first non-ASCII document. Array cells
    * stay out of the output (the driver's pandas row-sort cannot order
    * them) — each bucket is its own BIGINT column.
    */
  val pack: Seq[graft.Q] = Seq(
    graft.Q("q_multimodal_features", {
      val sums = (0 until FakeCodec.FeatureDim).map(i =>
        s"CAST(SUM(CASE WHEN bucket = $i THEN 1 ELSE 0 END) AS BIGINT) AS h$i")
        .mkString(",\n        |    ")
      val coal = (0 until FakeCodec.FeatureDim)
        .map(i => s"COALESCE(h$i, 0) AS h$i").mkString(", ")
      s"""WITH m AS (
        |  SELECT doc_id AS media_id, text, strlen(text) AS nb,
        |    hex(encode(text)) AS hx
        |  FROM documents),
        |b AS (
        |  SELECT media_id,
        |    CAST('0x' || substr(hx, 2 * i + 1, 2) AS INT) % ${FakeCodec.FeatureDim} AS bucket
        |  FROM m, UNNEST(range(0, nb)) AS u(i)),
        |hist AS (
        |  SELECT media_id,
        |    $sums
        |  FROM b GROUP BY media_id)
        |SELECT m.media_id, CAST(m.nb AS BIGINT) AS n_bytes,
        |  md5(m.text) AS checksum,
        |  CAST(${FakeCodec.FeatureDim} AS BIGINT) AS feature_dim,
        |  $coal
        |FROM m LEFT JOIN hist USING (media_id)
        |ORDER BY media_id""".stripMargin
    })((s, dir) => {
      val feats = extractFeatures(syntheticMedia(s, dir))
      val hs = (0 until FakeCodec.FeatureDim).map(i =>
        round(element_at(col("feature"), i + 1).cast("double")
          * greatest(col("n_bytes"), lit(1L))).cast("long").as(s"h$i"))
      feats.select(Seq(col("media_id"), col("n_bytes"), col("checksum"),
        size(col("feature")).cast("long").as("feature_dim")) ++ hs: _*)
        .orderBy("media_id")
    }),

    // 42b. FRAME SAMPLING — the video-shaped half of the multimodal
    // plumbing: fixed 64-byte frames, every 4th frame sampled, per-frame
    // "decode" = exact unsigned-byte sum (the stub; a real decoder keeps
    // the batch contract and touches ONLY sampled offsets — the point of
    // frame sampling at 100 TB is that the full decode never runs). The
    // oracle recomputes frame geometry and byte sums from the payload hex
    // independently, so the batched mapPartitions path is byte-exact.
    graft.Q("q_multimodal_frames", {
      val fb = FrameBytes
      val st = FrameStride
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, strlen(text) AS nb, hex(encode(text)) AS hx,
         |    (strlen(text) + ${fb - 1}) // $fb AS n_frames
         |  FROM documents),
         |b AS (
         |  SELECT media_id,
         |    CAST('0x' || substr(hx, 2 * i + 1, 2) AS INT) AS byte,
         |    i // $fb AS frame,
         |    ((n_frames - 1) // $st) * $st AS last_s
         |  FROM m, UNNEST(range(0, nb)) AS u(i)),
         |agg AS (
         |  SELECT media_id,
         |    CAST(SUM(CASE WHEN frame % $st = 0 THEN byte ELSE 0 END) AS BIGINT) AS sampled_sum,
         |    CAST(SUM(CASE WHEN frame = 0 THEN byte ELSE 0 END) AS BIGINT) AS first_frame_sum,
         |    CAST(SUM(CASE WHEN frame = last_s THEN byte ELSE 0 END) AS BIGINT) AS last_sampled_sum
         |  FROM b GROUP BY media_id)
         |SELECT m.media_id,
         |  CAST(m.n_frames AS BIGINT) AS n_frames,
         |  CAST(CASE WHEN m.n_frames = 0 THEN 0
         |    ELSE (m.n_frames + ${st - 1}) // $st END AS BIGINT) AS n_sampled,
         |  COALESCE(a.sampled_sum, 0) AS sampled_sum,
         |  COALESCE(a.first_frame_sum, 0) AS first_frame_sum,
         |  COALESCE(a.last_sampled_sum, 0) AS last_sampled_sum
         |FROM m LEFT JOIN agg a USING (media_id)
         |ORDER BY media_id""".stripMargin
    })((s, dir) =>
      sampleFrames(syntheticMedia(s, dir)).orderBy("media_id")))

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("n_sampled", LongType, nullable = false),
    StructField("sampled_sum", LongType, nullable = false),
    StructField("first_frame_sum", LongType, nullable = false),
    StructField("last_sampled_sum", LongType, nullable = false)))

  /** STUB frame extractor — stands in for video frame decode: per sampled
    * frame the "decode" is an exact unsigned-byte sum (deterministic, so
    * DuckDB recomputes it from the payload hex). Real decoders keep the
    * same batch contract and only ever touch the sampled offsets.
    */
  object FrameCodec {
    def sampleBatch(batch: Seq[(Long, Array[Byte])])
        : Seq[(Long, Long, Long, Long, Long, Long)] =
      batch.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val nFrames = (b.length + FrameBytes - 1) / FrameBytes
        def frameSum(i: Int): Long = {
          var s = 0L
          var j = i * FrameBytes
          val end = math.min(j + FrameBytes, b.length)
          while (j < end) { s += (b(j) & 0xff); j += 1 }
          s
        }
        val sampled = 0 until nFrames by FrameStride
        val lastS = if (sampled.isEmpty) -1 else sampled.last
        (id, nFrames.toLong, sampled.size.toLong,
          sampled.map(frameSum).sum,
          if (nFrames > 0) frameSum(0) else 0L,
          if (lastS >= 0) frameSum(lastS) else 0L)
      }
  }

  /** Batched frame-sampling stage — same mapPartitions plumbing as
    * [[extractFeatures]], different codec.
    */
  def sampleFrames(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { chunk =>
          val batch = chunk.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
          FrameCodec.sampleBatch(batch).map { case (id, nf, ns, ss, fs, ls) =>
            Row(id, nf, ns, ss, fs, ls)
          }
        }
      }(enc)
  }

  /** The decode stage: batched mapPartitions over (media_id, payload).
    * Batching amortizes per-call codec setup exactly like a Pandas-UDF
    * batch would; `batchSize` bounds peak memory per task.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { chunk =>
          val batch = chunk.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
          FakeCodec.decodeBatch(batch).map { case (id, n, sum, feat) =>
            Row(id, n, sum, feat.toSeq)
          }
        }
      }(enc)
  }
}
