package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2e.49 — dbcut `inspect`'s two-sided view: per-table row counts in
  * the SOURCE and the DESTINATION plus their diff
  * (`/root/reference/dbcut/cli/operations.py:190-228` prints exactly this
  * table after a load). The one-sided count_all is q_inspect_counts in
  * Relational.scala; this operator compares two catalogs.
  */
object Inspect {

  /** Per-table src/dest counts + diff. Each side is a single-row count
    * aggregate (map-side partial, metadata-cheap on parquet); the union of
    * per-table rows is tiny. Tables absent from `dest` report 0 — the
    * destination simply doesn't have them yet.
    */
  def diff(src: Map[String, DataFrame], dest: Map[String, DataFrame]): DataFrame = {
    require(src.nonEmpty, "inspect diff needs at least one source table")
    src.keys.toSeq.sorted.map { n =>
      val s = src(n).agg(count(lit(1)).as("src_rows"))
      val d = dest.get(n) match {
        case Some(df) => df.agg(count(lit(1)).as("dest_rows"))
        case None => src(n).sparkSession.range(1).select(lit(0L).as("dest_rows"))
      }
      s.crossJoin(d).select(
        lit(n).as("tbl"), col("src_rows"), col("dest_rows"),
        (col("src_rows") - col("dest_rows")).as("diff"))
    }.reduce(_ unionByName _)
  }

  /** The q_subset_exclude extraction replayed as an inspect diff: source =
    * the full relational catalog, destination = the extraction result. The
    * oracle recomputes the same closure in SQL (CTEs mirror
    * SpecQueries.q_subset_exclude) and diffs against full-table counts.
    */
  val pack: Seq[Q] = Seq(
    Q("q_inspect_diff", {
      val destSql = Map(
        "customer" -> "SELECT count(*) FROM root",
        "orders" -> "SELECT count(*) FROM ord",
        "nation" -> "SELECT count(*) FROM nat",
        "region" -> "SELECT count(*) FROM reg")
      val rows = Tables.relational.sorted.map { n =>
        val dest = destSql.getOrElse(n, "SELECT 0")
        s"""SELECT '$n' AS tbl,
           |    CAST((SELECT count(*) FROM $n) AS BIGINT) AS src_rows,
           |    CAST(($dest) AS BIGINT) AS dest_rows,
           |    CAST((SELECT count(*) FROM $n) - ($dest) AS BIGINT) AS diff""".stripMargin
      }.mkString("\n  UNION ALL ")
      s"""WITH root AS (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey LIMIT 10),
         |ord AS (SELECT * FROM (
         |  SELECT o.*, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
         |  FROM orders o WHERE o_custkey IN (SELECT c_custkey FROM root)) WHERE rn <= 5),
         |nat AS (SELECT * FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM root)),
         |reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nat))
         |SELECT * FROM (
         |  $rows
         |) ORDER BY tbl""".stripMargin
    })((s, dir) => {
      val spec = graft.spec.SpecJson.parse(
        """
          |from: customer
          |where:
          |  c_mktsegment: BUILDING
          |limit: 10
          |join_depth: 5
          |backref_depth: 2
          |backref_limit: 5
          |exclude: [lineitem, supplier]
          |""".stripMargin)
      val e = Subset.extract(s, dir, spec)
      val src = Tables.relational.map(n => n -> Tables.load(s, dir, n)).toMap
      diff(src, e.tables).orderBy("tbl")
    }))
}
