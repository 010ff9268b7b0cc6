package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("synthetic media table carries the canonical binary+meta schema") {
    val media = Multimodal.syntheticMedia(spark, TestSpark.sf)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.select("meta.format").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("text/plain"))
  }

  test("batched feature extraction produces one row per media with stable checksums") {
    val media = Multimodal.syntheticMedia(spark, TestSpark.sf).limit(20)
    val feats = Multimodal.extractFeatures(media, batchSize = 7)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getSeq[Float](3).length == Multimodal.FakeCodec.FeatureDim))
    // checksum must equal a directly computed md5 of the payload
    val one = media.orderBy("media_id").limit(1).collect()(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(one.getAs[Array[Byte]]("payload")).map("%02x".format(_)).mkString
    val got = feats.filter(feats("media_id") === one.getLong(0))
      .collect()(0).getString(2)
    assert(got == expected)
  }

  test("windowed energy analysis handles empty, sub-window and exact payloads") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = Seq(
      Row(1L, Array.empty[Byte], null),                 // no windows at all
      Row(2L, Array[Byte](10), null),                   // one truncated window
      Row(3L, Array.fill[Byte](Multimodal.AudioHop * 2)(1), null),
      Row(4L, null, null))                              // null payload = empty
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("payload", BinaryType, nullable = true),
        StructField("meta", StringType, nullable = true))))
    val out = Multimodal.analyzeWindows(media).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((0L, -1L, 0L, 0L)))
    assert(out(4L) == ((0L, -1L, 0L, 0L)))
    assert(out(2L) == ((1L, 0L, 10L, 10000L)))
    // 32 bytes of 1: windows at 0 (full 32 bytes) and 16 (16-byte tail) —
    // peak is window 0 with energy 32, mean = (32+16)*1000/2
    assert(out(3L) == ((2L, 0L, 32L, 24000L)), out(3L).toString)
  }
}
