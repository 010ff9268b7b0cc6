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

  /** Audio-shaped geometry: OVERLAPPING analysis windows (AudioWin bytes
    * every AudioHop — the RMS-envelope/onset shape, distinct from the
    * video frames' disjoint tiling). A window exists for every start
    * offset k·hop < payload length; the tail window truncates. Declared
    * before `pack` (oracle-SQL init-order rule).
    */
  val AudioWin = 32
  val AudioHop = 16

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
      sampleFrames(syntheticMedia(s, dir)).orderBy("media_id")),

    // 42c. WINDOWED ENERGY ANALYSIS — the audio-shaped third of the
    // multimodal plumbing (image histogram 42, video frames 42b):
    // overlapping 32-byte windows every 16 bytes over the "PCM" payload,
    // per-window "energy" = exact unsigned-byte sum (the stub; a real
    // analyzer — RMS, onset, VAD — keeps the same batch contract), per
    // media the window count, the PEAK window (argmax, lowest index on
    // ties), its energy, and the mean window energy in exact milli. The
    // oracle regenerates the overlapping-window geometry and byte sums
    // from the payload hex independently.
    graft.Q("q_multimodal_audio", {
      val wn = AudioWin
      val hp = AudioHop
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, strlen(text) AS nb, hex(encode(text)) AS hx
         |  FROM documents),
         |w AS (
         |  SELECT media_id, k, k * $hp AS st, LEAST(k * $hp + $wn, nb) AS en, hx
         |  FROM m, UNNEST(range(0, (nb + ${hp - 1}) // $hp)) AS u(k)),
         |e0 AS (
         |  SELECT media_id, k, CAST('0x' || substr(hx, 2 * j + 1, 2) AS INT) AS byte
         |  FROM w, UNNEST(range(st, en)) AS v(j)),
         |e AS (
         |  SELECT media_id, k, CAST(SUM(byte) AS BIGINT) AS energy
         |  FROM e0 GROUP BY 1, 2),
         |agg AS (
         |  SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |    CAST(MAX(energy) AS BIGINT) AS peak_energy,
         |    CAST(SUM(energy) AS BIGINT) AS tot
         |  FROM e GROUP BY media_id),
         |pk AS (
         |  SELECT e.media_id, CAST(MIN(e.k) AS BIGINT) AS peak_window
         |  FROM e JOIN agg ON e.media_id = agg.media_id AND e.energy = agg.peak_energy
         |  GROUP BY e.media_id)
         |SELECT m.media_id,
         |  COALESCE(a.n_windows, 0) AS n_windows,
         |  COALESCE(p.peak_window, -1) AS peak_window,
         |  COALESCE(a.peak_energy, 0) AS peak_energy,
         |  CAST(COALESCE(a.tot * 1000 // nullif(a.n_windows, 0), 0) AS BIGINT) AS mean_energy_milli
         |FROM m LEFT JOIN agg a USING (media_id) LEFT JOIN pk p USING (media_id)
         |ORDER BY media_id""".stripMargin
    })((s, dir) =>
      analyzeWindows(syntheticMedia(s, dir)).orderBy("media_id")))

  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_windows", LongType, nullable = false),
    StructField("peak_window", LongType, nullable = false),
    StructField("peak_energy", LongType, nullable = false),
    StructField("mean_energy_milli", LongType, nullable = false)))

  /** STUB audio analyzer — per overlapping window the "analysis" is an
    * exact unsigned-byte sum; real RMS/onset/VAD analyzers keep the same
    * (payload ⇒ per-window features ⇒ summary) batch contract.
    */
  object AudioCodec {
    def analyzeBatch(batch: Seq[(Long, Array[Byte])])
        : Seq[(Long, Long, Long, Long, Long)] =
      batch.map { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val nw = (b.length + AudioHop - 1) / AudioHop
        if (nw == 0) (id, 0L, -1L, 0L, 0L)
        else {
          var tot = 0L; var peak = Long.MinValue; var peakK = -1L
          var k = 0
          while (k < nw) {
            var s = 0L
            var j = k * AudioHop
            val end = math.min(j + AudioWin, b.length)
            while (j < end) { s += (b(j) & 0xff); j += 1 }
            tot += s
            if (s > peak) { peak = s; peakK = k.toLong }
            k += 1
          }
          (id, nw.toLong, peakK, peak, tot * 1000 / nw)
        }
      }
  }

  /** Batched windowed-energy stage — same mapPartitions plumbing as
    * [[extractFeatures]]/[[sampleFrames]], audio-shaped codec.
    */
  def analyzeWindows(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = RowEncoder.encoderFor(audioSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { chunk =>
          val batch = chunk.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
          AudioCodec.analyzeBatch(batch).map { case (id, nw, pk, pe, me) =>
            Row(id, nw, pk, pe, me)
          }
        }
      }(enc)
  }

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
