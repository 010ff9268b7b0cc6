package graft

import graft.model.RelGraph
import graft.operators.Subset
import graft.spec.SpecJson
import org.scalatest.funsuite.AnyFunSuite

class SubsetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("plan builds the expected mixed tree for the full-closure spec") {
    val spec = SpecJson.parse(
      "from: customer\nlimit: 10\njoin_depth: 5\nbackref_depth: 2\nbackref_limit: 5\n")
    val p = Subset.plan(spec, RelGraph.tpch)
    val edges = p.edges.map(e => (e.from, e.to, e.backref)).toSet
    // note: no supplier→nation edge — it is the reverse of the
    // nation→supplier backref and edges are never re-traversed backwards;
    // the phase-3 re-closure still pulls those nations (oracle-verified)
    assert(edges == Set(
      ("customer", "nation", false), ("customer", "orders", true),
      ("nation", "region", false), ("nation", "supplier", true),
      ("orders", "lineitem", true),
      ("lineitem", "part", false), ("lineitem", "supplier", false)))
    assert(p.renderTree.contains("customer"))
    assert(p.renderTree.contains("backref"))
  }

  test("exclude prunes subtrees; include keeps only the direct path") {
    val ex = Subset.plan(
      SpecJson.parse("from: customer\nexclude: [lineitem, supplier]\n"), RelGraph.tpch)
    assert(!ex.tables.contains("lineitem") && !ex.tables.contains("supplier"))

    val inc = Subset.plan(
      SpecJson.parse("from: customer\ninclude: [region]\n"), RelGraph.tpch)
    assert(inc.tables.toSet == Set("customer", "nation", "region"))
  }

  test("backref depth zero stops child traversal") {
    val p = Subset.plan(
      SpecJson.parse("from: customer\nbackref_depth: 0\njoin_depth: 5\n"), RelGraph.tpch)
    assert(p.tables.toSet == Set("customer", "nation", "region"))
  }

  test("dotted filters sharing an FK-path prefix join each hop once") {
    import org.apache.spark.sql.functions._
    // nation.* and region.* from customer both walk customer→nation:
    // re-joining nation under the same alias used to throw
    // AMBIGUOUS_REFERENCE for any spec like this
    val spec = SpecJson.parse(
      """
        |from: customer
        |limit: null
        |where:
        |  $and:
        |    - nation.n_name: {$like: 'NATION_1%'}
        |    - region.r_name: {$like: 'A%'}
        |""".stripMargin)
    val got = Subset.applyRootQuery(spark, TestSpark.sf, spec, RelGraph.tpch)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    // independent recomputation with explicit single joins
    val want = Tables.load(spark, TestSpark.sf, "customer")
      .join(Tables.load(spark, TestSpark.sf, "nation")
        .filter(col("n_name").like("NATION_1%")),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.load(spark, TestSpark.sf, "region")
        .filter(col("r_name").like("A%")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty, s"got ${got.size} want ${want.size}")
  }

  test("extraction maintains referential integrity on real data") {
    val spec = SpecJson.parse(
      "from: customer\nwhere:\n  c_mktsegment: BUILDING\nlimit: 8\n" +
        "join_depth: 5\nbackref_depth: 2\nbackref_limit: 4\n")
    val e = Subset.extract(spark, TestSpark.sf, spec)
    val t = e.tables
    assert(t("customer").count() == 8)

    def keys(tbl: String, c: String): Set[Long] =
      t(tbl).select(c).collect().map(_.getAs[Number](0).longValue()).toSet
    // every FK of every selected row resolves inside the extraction
    assert(keys("orders", "o_custkey").subsetOf(keys("customer", "c_custkey")))
    assert(keys("lineitem", "l_orderkey").subsetOf(keys("orders", "o_orderkey")))
    assert(keys("lineitem", "l_partkey").subsetOf(keys("part", "p_partkey")))
    assert(keys("lineitem", "l_suppkey").subsetOf(keys("supplier", "s_suppkey")))
    assert(keys("customer", "c_nationkey").subsetOf(keys("nation", "n_nationkey")))
    assert(keys("supplier", "s_nationkey").subsetOf(keys("nation", "n_nationkey")))
    assert(keys("nation", "n_regionkey").subsetOf(keys("region", "r_regionkey")))
    // backref cap respected
    val maxPerCust = t("orders").groupBy("o_custkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
    assert(maxPerCust <= 4)
  }

  test("bloom-pruned closure extracts exactly the same subset") {
    // unbounded spec (no root limit → key sides are not broadcast) so the
    // bloom path actually engages on every single-column join edge
    val yaml = "from: customer\nwhere:\n  c_mktsegment: MACHINERY\nlimit: null\n" +
      "join_depth: 5\nbackref_depth: 1\nbackref_limit: 3\n"
    val plain = Subset.extract(spark, TestSpark.sf, SpecJson.parse(yaml))
    val bloomed = Subset.extract(spark, TestSpark.sf, SpecJson.parse(yaml),
      bloomPrune = true)
    val a = Subset.summary(plain).collect().map(_.toSeq).toSet
    val b = Subset.summary(bloomed).collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }
}
