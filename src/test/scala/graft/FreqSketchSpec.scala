package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FreqSketch, MisraGriesTopK}

/** Misra-Gries sketch guarantees (functions/FreqSketch.scala), driven
  * through the real distributed aggregate so update, merge, serialize and
  * deserialize are all on the exercised path (many input partitions force
  * partial-aggregate merges across executor threads).
  */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Zipf-ish crafted stream: item "hot_i" appears 1000/i times for
    * i = 1..8 (so counts 1000, 500, 333, ...), plus a long tail of
    * singletons. Documents are 10-token arrays, shuffled deterministically.
    */
  private def craftedDocs(tail: Int): (Seq[Seq[String]], Map[String, Long]) = {
    val hot = (1 to 8).flatMap(i => Seq.fill(1000 / i)(s"hot_$i"))
    val cold = (0 until tail).map(i => s"tail_$i")
    val all = new scala.util.Random(42).shuffle((hot ++ cold).toVector)
    val docs = all.grouped(10).map(_.toSeq).toSeq
    val truth = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    (docs, truth)
  }

  private def sketchOf(docs: Seq[Seq[String]], k: Int): Map[String, Long] = {
    FreqSketch.register(spark)
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      docs.map(d => Row(d)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("toks",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))
      .repartition(7) // force cross-partition merges
    val rows = df.agg(expr("mg_topk(toks, " + k + ")").as("sk"))
      .head().getSeq[Row](0)
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("candidate set contains every item with count > n/k, estimates undercount by <= n/k") {
    val k = 50
    val (docs, truth) = craftedDocs(tail = 4000)
    val n = truth.values.sum
    val sk = sketchOf(docs, k)
    val heavy = truth.filter { case (_, c) => c > n / k }
    assert(heavy.nonEmpty, "crafted stream lost its heavy hitters")
    heavy.foreach { case (item, c) =>
      assert(sk.contains(item), s"heavy item $item (count $c, n/k ${n / k}) missing from sketch")
    }
    sk.foreach { case (item, est) =>
      val c = truth(item)
      assert(est <= c, s"$item overestimated: est $est > true $c")
      assert(c - est <= n / k, s"$item undercounted past n/k: true $c, est $est, n/k ${n / k}")
    }
  }

  test("sketch size stays below 2k regardless of distinct-item count") {
    val k = 20
    val (docs, _) = craftedDocs(tail = 20000)
    val sk = sketchOf(docs, k)
    assert(sk.size < 2 * k, s"sketch grew to ${sk.size} entries for k=$k")
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = MisraGriesTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(null), 8)
    val buf = scala.collection.mutable.HashMap(
      "alpha" -> 3L, "βeta" -> 7L, "" -> 1L, "tab\tchar" -> 2L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("mg_topk rejects a non-literal k") {
    FreqSketch.register(spark)
    val df = spark.range(1).select(array(lit("a")).as("toks"), lit(3).as("k"))
    val e = intercept[Exception] { df.agg(expr("mg_topk(toks, k)")).head() }
    assert(e.getMessage.contains("mg_topk"))
  }
}
