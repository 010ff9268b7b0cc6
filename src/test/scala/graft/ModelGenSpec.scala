package graft

import graft.model.RelGraph
import graft.sources.{ModelGen, SqlDump}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ModelGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.sf

  test("scala type and name mapping") {
    assert(ModelGen.className("lineitem") == "Lineitem")
    assert(ModelGen.className("order_line") == "OrderLine")
    assert(ModelGen.fieldName("l_orderkey") == "lOrderkey")
    assert(ModelGen.scalaType(ArrayType(FloatType)) == "Seq[Float]")
    assert(ModelGen.scalaType(DecimalType(12, 2)) == "java.math.BigDecimal")
    val nullable = StructField("name", StringType, nullable = true)
    assert(ModelGen.fieldDecl(nullable).trim == "name: Option[String]")
    val notNull = StructField("id", LongType, nullable = false)
    assert(ModelGen.fieldDecl(notNull).trim == "id: Long")
    // Scala keywords and non-identifier names must backtick-escape
    assert(ModelGen.fieldName("type") == "`type`")
    assert(ModelGen.fieldName("2fa_code") == "`2faCode`")
    assert(ModelGen.className("2fa") == "`2fa`")
    assert(ModelGen.fieldName("l_orderkey") == "lOrderkey")
  }

  test("case class carries PK and relationship docs from the graph") {
    val schema = spark.read.parquet(s"$sfDir/orders.parquet").schema
    val src = ModelGen.caseClass("orders", schema, RelGraph.tpch)
    assert(src.contains("final case class Orders("))
    assert(src.contains("PK (o_orderkey)"))
    assert(src.contains("many-to-one: o_custkey -> customer(c_custkey)"))
    assert(src.contains("one-to-many: lineitem.l_orderkey -> orders(o_orderkey)"))
    assert(src.contains("oOrderkey:"))
  }

  test("module emits every class plus the registry and parses as one unit") {
    val catalog = Tables.relational.map { t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").schema
    }
    val src = ModelGen.module("graft.generated", catalog, RelGraph.tpch)
    assert(src.startsWith("package graft.generated"))
    Tables.relational.foreach { t =>
      assert(src.contains(s"final case class ${ModelGen.className(t)}("), t)
    }
    assert(src.contains("\"orders\" -> (\"Orders\", Seq(\"o_orderkey\"))"))
    // balanced braces/parens — cheap structural sanity for generated source
    assert(src.count(_ == '(') == src.count(_ == ')'))
    assert(src.count(_ == '{') == src.count(_ == '}'))
  }

  test("ddl script orders parents before children with FK clauses") {
    val catalog = Tables.relational.map { t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").schema
    }.toMap
    val script = ModelGen.ddlScript(catalog, RelGraph.tpch, SqlDump.Ansi)
    val pos = Tables.relational.map(t => t -> script.indexOf(s"CREATE TABLE $t ")).toMap
    pos.foreach { case (t, p) => assert(p >= 0, s"missing CREATE TABLE $t") }
    assert(pos("region") < pos("nation"))
    assert(pos("nation") < pos("customer"))
    assert(pos("customer") < pos("orders"))
    assert(pos("orders") < pos("lineitem"))
    assert(script.contains(
      "FOREIGN KEY (l_orderkey) REFERENCES orders (o_orderkey)"))
    // a catalog slice drops FK clauses pointing outside it
    val slice = ModelGen.ddlScript(
      Map("lineitem" -> catalog("lineitem")), RelGraph.tpch)
    assert(!slice.contains("REFERENCES orders"))

    // tables outside the relation graph still get DDL (synthesized PK),
    // matching the classes module() emits for them
    val offGraph = ModelGen.ddlScript(
      Map("audit_log" -> StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("what", StringType, nullable = true)))),
      RelGraph.tpch)
    assert(offGraph.contains("CREATE TABLE audit_log "))
    assert(offGraph.contains("PRIMARY KEY (id)"))
  }

  test("writeModule round-trips to disk") {
    val dir = java.nio.file.Files.createTempDirectory("modelgen").toString
    val catalog = Seq("region" ->
      spark.read.parquet(s"$sfDir/region.parquet").schema)
    ModelGen.writeModule(s"$dir/gen/Models.scala", "graft.generated",
      catalog, RelGraph.tpch)
    val written = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/gen/Models.scala")), "UTF-8")
    assert(written.contains("final case class Region("))
  }
}
