package graft

import graft.sources.Job
import graft.spec.SpecJson
import org.scalatest.funsuite.AnyFunSuite

class JobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val configYaml =
    """
      |only_tables: []
      |queries:
      |  - from: customer
      |    where:
      |      c_mktsegment: BUILDING
      |    limit: 3
      |    join_depth: 1
      |    backref_depth: 0
      |  - from: supplier
      |    limit: 2
      |    join_depth: 1
      |    backref_depth: 0
      |""".stripMargin

  test("multi-query job merges per-table results with PK dedup") {
    val cfg = Job.parseConfig(configYaml)
    assert(cfg.queries.map(_.from) == Seq("customer", "supplier"))
    val merged = Job.run(spark, TestSpark.sf, cfg)
    // both queries pull nations (of customers and of suppliers) — merged once
    assert(merged.contains("customer") && merged.contains("supplier"))
    val n = merged("nation")
    assert(n.count() == n.select("n_nationkey").distinct().count())
  }

  test("global_exclude merges into every query; the table never loads") {
    val cfg = Job.parseConfig(
      """
        |global_exclude: [nation]
        |queries:
        |  - from: customer
        |    limit: 3
        |    join_depth: 5
        |    backref_depth: 0
        |    exclude: [orders]
        |  - from: supplier
        |    limit: 2
        |    join_depth: 5
        |    backref_depth: 0
        |""".stripMargin)
    // folded into each query's exclude, deduped against per-query entries
    assert(cfg.queries.map(_.exclude.sorted) ==
      Seq(Seq("nation", "orders"), Seq("nation")))
    val merged = Job.run(spark, TestSpark.sf, cfg)
    assert(merged.contains("customer") && merged.contains("supplier"))
    assert(!merged.contains("nation") && !merged.contains("region"),
      s"globally excluded table (and its only path to region) must not load: ${merged.keys}")
    // scalar form is accepted like the per-query key
    assert(Job.parseConfig(
      "global_exclude: nation\nqueries:\n  - from: region\n")
      .queries.head.exclude == Seq("nation"))
  }

  test("only_tables filters by root; last_only keeps the final query") {
    val cfg = Job.parseConfig(configYaml)
    assert(Job.selectQueries(cfg.copy(onlyTables = Seq("supplier"))).map(_.from) ==
      Seq("supplier"))
    assert(Job.selectQueries(cfg.copy(lastOnly = true)).map(_.from) == Seq("supplier"))
    assert(Job.selectQueries(cfg.copy(onlyTables = Seq("nope"))).isEmpty)
  }

  test("YAML echo round-trips and extraction reports phase timings") {
    val spec = SpecJson.parse(
      """
        |from: customer
        |where:
        |  $or:
        |    - c_mktsegment: BUILDING
        |    - c_acctbal: {$gte: 100}
        |order-by: [-c_acctbal, c_custkey]
        |offset: 2
        |limit: 4
        |exclude: [lineitem]
        |""".stripMargin)
    assert(SpecJson.parse(SpecJson.toYaml(spec)) == spec)
    val unlimited = SpecJson.parse("from: nation\nlimit: null\ninclude: [region]\n")
    assert(SpecJson.parse(SpecJson.toYaml(unlimited)) == unlimited)

    val e = graft.operators.Subset.extract(spark, TestSpark.sf,
      SpecJson.parse("from: nation\nlimit: 3\njoin_depth: 1\nbackref_depth: 0\n"))
    assert(e.phaseMillis.keySet.intersect(Set("plan", "root", "reclosure")).size == 3)
    assert(e.phaseMillis.values.forall(_ >= 0))
  }
}
