package graft

import graft.spec._
import org.scalatest.funsuite.AnyFunSuite

class SpecJsonSpec extends AnyFunSuite {

  test("full YAML spec parses with dbcut keys and defaults") {
    val s = SpecJson.parse(
      """
        |from: customer
        |where:
        |  $or:
        |    - c_mktsegment: BUILDING
        |    - c_acctbal: {$gte: 100, $lt: 200}
        |order-by: [-c_acctbal, c_custkey]
        |offset: 5
        |limit: 20
        |join_depth: 3
        |backref_depth: 1
        |backref_limit: 7
        |exclude: lineitem
        |""".stripMargin)
    assert(s.from == "customer")
    assert(s.orderBy == Seq(OrderKey("c_acctbal", desc = true), OrderKey("c_custkey")))
    assert(s.offset.contains(5L) && s.limit.contains(20L))
    assert(s.joinDepth == 3 && s.backrefDepth == 1 && s.backrefLimit.contains(7L))
    assert(s.exclude == Seq("lineitem"))
    val Or(Seq(Pred("c_mktsegment", "eq", "BUILDING"), And(ps))) = s.where.get
    assert(ps.toSet == Set(Pred("c_acctbal", "gte", 100L), Pred("c_acctbal", "lt", 200L)))
  }

  test("defaults mirror dbcut configuration") {
    val s = SpecJson.parse("from: nation")
    assert(s.limit.contains(10L) && s.backrefLimit.contains(10L))
    assert(s.joinDepth == 5 && s.backrefDepth == 2)
  }

  test("explicit null limit means unlimited; include lifts depths") {
    val s = SpecJson.parse("from: nation\nlimit: null\ninclude: [region]")
    assert(s.limit.isEmpty)
    assert(s.joinDepth == Int.MaxValue && s.backrefDepth == Int.MaxValue)
  }

  test("JSON is accepted (YAML superset) and canonical form is stable") {
    val a = SpecJson.parse("""{"from": "orders", "where": {"o_orderkey": {"$in": [1, 2]}}}""")
    val b = SpecJson.parse("from: orders\nwhere:\n  o_orderkey: {$in: [1, 2]}\n")
    assert(SpecJson.canonical(a) == SpecJson.canonical(b))
    assert(SpecJson.canonical(a).startsWith("""{"from":"orders""""))
  }

  test("bare list value is an implicit $in") {
    val s = SpecJson.parse("from: nation\nwhere:\n  n_nationkey: [1, 2, 3]\n")
    assert(s.where.contains(Pred("n_nationkey", "in", Seq(1L, 2L, 3L))))
  }

  test("null eq/neq compile to IS NULL / IS NOT NULL; empty $and is true") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, Some("x")), (2L, None: Option[String])).toDF("k", "v")
    def rows(c: Cond): Set[Long] =
      df.filter(FilterCompiler.compile(c, col)).select("k")
        .as[Long].collect().toSet
    // SQLAlchemy `col == None` semantics: null matches the null row, not
    // the never-true `= NULL`
    assert(rows(Pred("v", "eq", null)) == Set(2L))
    assert(rows(Pred("v", "neq", null)) == Set(1L))
    assert(rows(And(Nil)) == Set(1L, 2L)) // empty conjunction: no constraint
    assert(rows(Or(Nil)) == Set.empty)    // empty disjunction: admits nothing
  }
}
