package graft

import graft.model.RelGraph
import graft.operators.Subset
import graft.sources.Jdbc
import java.nio.file.Files
import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite

/** Real rows through JDBC both ways, against an embedded Apache Derby
  * database (ships with the Spark distribution) with FOREIGN KEY
  * constraints ENABLED — the round-trip §2e.43/44 could not exercise while
  * only option assembly was tested: extract from parquet → load over JDBC
  * in [[Jdbc.loadOrder]] (parents first, the portable analogue of the
  * reference's disable-FK-checks insert) → partitioned read back.
  */
class JdbcRoundTripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDb(): String = {
    val dir = Files.createTempDirectory("graft-derby").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  private def ddl(url: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE region (
        r_regionkey INT PRIMARY KEY, r_name VARCHAR(64))""")
      st.execute("""CREATE TABLE nation (
        n_nationkey INT PRIMARY KEY, n_name VARCHAR(64),
        n_regionkey INT REFERENCES region(r_regionkey))""")
      st.execute("""CREATE TABLE customer (
        c_custkey BIGINT PRIMARY KEY, c_name VARCHAR(64),
        c_nationkey INT REFERENCES nation(n_nationkey),
        c_acctbal DOUBLE, c_mktsegment VARCHAR(16))""")
      st.close()
    } finally conn.close()
  }

  private def extraction() = {
    val spec = graft.spec.SpecJson.parse(
      """
        |from: customer
        |where:
        |  c_mktsegment: BUILDING
        |limit: 7
        |include: [region]
        |""".stripMargin)
    Subset.extract(spark, TestSpark.sf, spec).tables
  }

  test("FK-ordered load into Derby with constraints on, partitioned read back") {
    val url = freshDb()
    ddl(url)
    val tables = extraction()
    val order = Jdbc.loadOrder(RelGraph.tpch, tables.keySet)
    assert(order == Seq("region", "nation", "customer"),
      "parents must precede children")
    order.foreach(n => Jdbc.write(tables(n), url, n, batchSize = 100))

    // plain read back: every table round-trips row-for-row
    for (n <- order) {
      val back = Jdbc.read(spark, Jdbc.ReadSpec(url, n))
      assert(back.count() == tables(n).count(), s"$n count")
    }
    // content check on the root table (column order via select)
    val sent = tables("customer").select("c_custkey", "c_name", "c_mktsegment")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val got = Jdbc.read(spark, Jdbc.ReadSpec(url, "customer"))
      .select("c_custkey", "c_name", "c_mktsegment")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(got.toSeq == sent.toSeq)

    // partitioned read: range-split on the PK covers all rows exactly once
    val part = Jdbc.read(spark, Jdbc.ReadSpec(url, "customer",
      partitionColumn = Some("c_custkey"),
      lowerBound = Some(0L), upperBound = Some(100000L), numPartitions = 4))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == tables("customer").count())

    // predicate-sharded read: one partition per predicate, disjoint union
    val pred = Jdbc.read(spark, Jdbc.ReadSpec(url, "customer",
      predicates = Seq("MOD(c_custkey, 2) = 0", "MOD(c_custkey, 2) <> 0")))
    assert(pred.rdd.getNumPartitions == 2)
    assert(pred.count() == tables("customer").count())
  }

  test("reflected type hints flow from live catalog metadata into dumped DDL") {
    import graft.sources.SqlDump
    val url = freshDb()
    ddl(url)
    val hints = Jdbc.reflectHints(url, "customer")
    // Derby reports VARCHAR(64)/VARCHAR(16) via COLUMN_SIZE
    assert(hints("c_name").length.contains(64L))
    assert(hints("c_mktsegment").length.contains(16L))
    assert(!hints.contains("c_acctbal"), "DOUBLE carries no hints")

    val df = Jdbc.withHints(
      Subset.extract(spark, TestSpark.sf, graft.spec.SpecJson.parse(
        "from: customer\nlimit: 3")).tables("customer"), hints)
    val out = SqlDump.ddl("customer", df, Seq("c_custkey"), Nil, SqlDump.MySql)
    assert(out.contains("`c_name` VARCHAR(64)"))
    assert(out.contains("`c_mktsegment` VARCHAR(16)"))
  }

  test("loading a child before its parent violates the FK constraint") {
    val url = freshDb()
    ddl(url)
    val tables = extraction()
    // customer references nation; with an empty nation table Derby must
    // reject the insert — proving the constraints the load order exists for
    val e = intercept[Exception] {
      Jdbc.write(tables("customer"), url, "customer", batchSize = 100)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && m.toLowerCase.contains("foreign key")),
      s"expected a FK violation, got: ${messages(e).mkString(" | ")}")
  }
}
