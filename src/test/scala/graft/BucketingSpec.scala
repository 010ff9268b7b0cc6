package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4 co-location: bucketing both join sides on the join key lets
  * the join run shuffle-free — the big-fact ⋈ big-fact answer at 100 TB,
  * where neither side broadcasts and a repartition of either is the
  * dominant cost.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var whPath: Option[java.nio.file.Path] = None
    try {
      val wh = Files.createTempDirectory("bucketwh")
      whPath = Some(wh)
      val orders = Tables.load(spark, TestSpark.sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val lineitem = Tables.load(spark, TestSpark.sf, "lineitem")
        .select("l_orderkey", "l_quantity")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and it computes the right thing
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      // DROP TABLE leaves external (path-backed) data behind — delete it
      whPath.foreach { root =>
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(Files.walk(root))(_.iterator().asScala.toSeq).reverse
          .foreach(Files.deleteIfExists(_))
      }
    }
  }
}
