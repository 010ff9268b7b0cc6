package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Standing indexes are build-once/probe-many parquet tables, so their root
  * must be SHARED storage on a cluster — a driver-local `/tmp` only works
  * in single-JVM mode (executors would write to their own disks and the
  * driver read would see a torn table). Tables.indexRoot resolves:
  * conf > env > corpus-sibling (non-local scheme) > tmpdir.
  */
class IndexRootSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("resolution order: conf beats default; non-local corpus co-locates; local falls back to tmpdir") {
    spark.conf.unset("spark.graft.index.root")
    // local-path corpus, nothing set: the single-JVM tmpdir fallback
    assert(Tables.indexRoot(spark, "/data/sf1") ==
      System.getProperty("java.io.tmpdir"))
    // non-local scheme proves shared storage: index co-locates with corpus
    assert(Tables.indexRoot(spark, "hdfs://nn/warehouse/corpus") ==
      "hdfs://nn/warehouse/corpus/_graft_index")
    assert(Tables.indexRoot(spark, "s3a://bucket/corpus/") ==
      "s3a://bucket/corpus/_graft_index")
    // explicit conf wins over everything
    spark.conf.set("spark.graft.index.root", "hdfs://nn/shared/idx")
    try assert(Tables.indexRoot(spark, "/data/sf1") == "hdfs://nn/shared/idx")
    finally spark.conf.unset("spark.graft.index.root")
  }

  test("an unwritable index root fails with guidance, not a raw IO stack") {
    // permission-shaped failures rewrap with the override knobs named...
    val e = intercept[IllegalStateException] {
      Tables.indexWrite("s3a://curated/corpus/_graft_index") {
        throw new java.io.IOException(
          "java.nio.file.AccessDeniedException: s3a://curated/corpus: " +
            "Access Denied (Service: S3)")
      }
    }
    assert(e.getMessage.contains("spark.graft.index.root") &&
      e.getMessage.contains("GRAFT_INDEX_ROOT"), e.getMessage)
    // ...unrelated failures pass through untouched
    intercept[ArithmeticException] {
      Tables.indexWrite("/x")(throw new ArithmeticException("task failure"))
    }
    // end-to-end: a root whose parent is a plain FILE cannot take a write
    // (the closest root-proof unwritable location — the test runs as a
    // user permission bits cannot stop); a cold index build against it
    // must surface the guidance, not a bare Mkdirs error
    val f = Files.createTempFile("graft_notdir", ".blk")
    spark.conf.set("spark.graft.index.root", s"$f/idx")
    try {
      val dir = Files.createTempDirectory("graft_roc").toString
      Tables.load(spark, TestSpark.sf, "documents").limit(20)
        .write.parquet(s"$dir/documents.parquet")
      val e2 = intercept[IllegalStateException] {
        graft.operators.Dedup.corpusSigs(spark, dir).count()
      }
      assert(e2.getMessage.contains("GRAFT_INDEX_ROOT"), e2.getMessage)
    } finally spark.conf.unset("spark.graft.index.root")
  }

  test("overridden root: index builds under it and probes bit-identically") {
    val root = Files.createTempDirectory("graft_idx_root")
    spark.conf.unset("spark.graft.index.root")
    try {
      // baseline under the default root (warm or cold, same bytes)
      val base = graft.operators.Dedup.corpusSigs(spark, TestSpark.sf)
        .orderBy("doc_id").collect()
      spark.conf.set("spark.graft.index.root", root.toString)
      val under = graft.operators.Dedup.corpusSigs(spark, TestSpark.sf)
        .orderBy("doc_id").collect()
      // the index landed under the override, stamp-keyed as before
      val names = scala.util.Using.resource(Files.list(root))(
        _.iterator().asScala.map(_.getFileName.toString).toList)
      assert(names.exists(_.startsWith("graft_sigs_")), names.mkString(","))
      assert(under.sameElements(base))
    } finally {
      spark.conf.unset("spark.graft.index.root")
      scala.util.Using.resource(Files.walk(root))(
        _.iterator().asScala.toSeq).reverse.foreach(Files.deleteIfExists(_))
    }
  }
}
