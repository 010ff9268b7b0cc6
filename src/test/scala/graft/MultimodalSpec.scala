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
}
