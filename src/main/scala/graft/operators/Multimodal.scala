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
    }))

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
