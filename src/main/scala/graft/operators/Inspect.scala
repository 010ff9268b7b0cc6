package graft.operators

import graft.{Q, Tables}
import graft.model.RelGraph
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    require(src.nonEmpty || dest.nonEmpty,
      "inspect diff needs at least one table")
    val spark = (src.values ++ dest.values).head.sparkSession
    def zero = spark.range(1)
    // BOTH key sets: a table only the destination has (drift the inspect
    // exists to surface) must still get a row, with src_rows = 0
    (src.keySet ++ dest.keySet).toSeq.sorted.map { n =>
      val s = src.get(n) match {
        case Some(df) => df.agg(count(lit(1)).as("src_rows"))
        case None => zero.select(lit(0L).as("src_rows"))
      }
      val d = dest.get(n) match {
        case Some(df) => df.agg(count(lit(1)).as("dest_rows"))
        case None => zero.select(lit(0L).as("dest_rows"))
      }
      s.crossJoin(d).select(
        lit(n).as("tbl"), col("src_rows"), col("dest_rows"),
        (col("src_rows") - col("dest_rows")).as("diff"))
    }.reduce(_ unionByName _)
  }

  /** Referential-integrity audit: for every FK edge present in `tables`,
    * the number of child rows whose FK is non-null but matches no parent —
    * the invariant the whole subset-extraction engine exists to preserve,
    * checkable against any catalog (a source, or a destination after a
    * load). One left-anti join per edge, counts unioned; each anti-join is
    * a broadcast/shuffled hash join on the FK key, never a product.
    */
  def orphans(tables: Map[String, DataFrame], graph: RelGraph): DataFrame = {
    val rows = for {
      (name, meta) <- graph.tables.toSeq.sortBy(_._1)
      if tables.contains(name)
      fk <- meta.fks.sortBy(_.parent)
      if tables.contains(fk.parent)
    } yield {
      val child = tables(name)
      val parent = tables(fk.parent)
      val cond = fk.childCols.zip(fk.parentCols)
        .map { case (c, p) => child(c) === parent(p) }.reduce(_ && _)
      val nonNull = fk.childCols.map(child(_).isNotNull).reduce(_ && _)
      child.filter(nonNull).join(parent, cond, "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(s"$name->${fk.parent}").as("edge"), col("n_orphans"))
    }
    require(rows.nonEmpty, "no FK edges between the given tables")
    rows.reduce(_ unionByName _)
  }

  /** Declarative data-quality rules (the Deequ/dbt-tests staple): each
    * rule reports its violation count and pass/fail over one catalog
    * table. Evaluation is pass-minimal, not rule-minimal:
    *   - every row-local rule (not-null, accepted-values, arbitrary
    *     predicate) folds into ONE aggregate — one scan however many
    *     rules;
    *   - each uniqueness rule is one groupBy on its key (counting keys
    *     seen more than once);
    *   - each referential rule is one left-anti join against the parent.
    * At 100 TB the row-local batch dominates the rule list and stays a
    * single scan; this is the pre-commit gate that pairs with
    * [[schemaDiff]] (metadata) before a load publishes.
    */
  sealed trait DqRule { def name: String }
  final case class DqNotNull(colName: String) extends DqRule {
    def name = s"not_null($colName)"
  }
  final case class DqAccepted(colName: String, values: Seq[String]) extends DqRule {
    def name = s"accepted_values($colName)"
  }
  final case class DqCheck(label: String, predicate: Column) extends DqRule {
    def name = s"check($label)"
  }
  final case class DqUnique(cols: Seq[String]) extends DqRule {
    def name = s"unique(${cols.mkString(",")})"
  }
  final case class DqRef(fkCols: Seq[String], parent: DataFrame,
                         pkCols: Seq[String], parentName: String) extends DqRule {
    def name = s"ref(${fkCols.mkString(",")}->$parentName)"
  }

  def dqChecks(df: DataFrame, rules: Seq[DqRule]): DataFrame = {
    require(rules.nonEmpty, "dqChecks needs at least one rule")
    val rowLocal: Seq[(String, Column)] = rules.collect {
      case r: DqNotNull => r.name -> col(r.colName).isNull
      case r: DqAccepted =>
        r.name -> !col(r.colName).isin(r.values: _*)
      case r: DqCheck => r.name -> !coalesce(r.predicate, lit(false))
    }
    val localCounts: Seq[DataFrame] =
      if (rowLocal.isEmpty) Nil
      else {
        val aggs = rowLocal.zipWithIndex.map { case ((_, bad), i) =>
          // coalesce: SUM over an EMPTY table is NULL — a freshly cleared
          // destination must report 0 violations, not NPE the caller
          coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"__v$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Seq(one.select(explode(array(rowLocal.zipWithIndex.map {
          case ((name, _), i) =>
            struct(lit(name).as("rule"), col(s"__v$i").as("n_violations"))
        }: _*)).as("r")).select("r.*"))
      }
    val others: Seq[DataFrame] = rules.collect {
      case r: DqUnique =>
        df.groupBy(r.cols.map(col): _*).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
      case r: DqRef =>
        val nonNull = r.fkCols.map(col(_).isNotNull).reduce(_ && _)
        val cond = r.fkCols.zip(r.pkCols)
          .map { case (f, p) => df(f) === r.parent(p) }.reduce(_ && _)
        df.filter(nonNull).join(r.parent, cond, "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
    }
    (localCounts ++ others).reduce(_ unionByName _)
      .select(col("rule"), col("n_violations"),
        (col("n_violations") === 0).as("passed"))
  }

  /** Schema drift between two catalogs — the companion of [[diff]] (row
    * counts) and Lakehouse.rowDiff (row contents) at the METADATA level:
    * per (table, column) rows for added/removed columns and type changes,
    * plus whole tables present on one side only. Pure driver-side schema
    * work (parquet footers) — zero data scanned at any table size, so an
    * ingestion pipeline can gate on drift before committing a 100 TB load.
    */
  def schemaDiff(src: Map[String, DataFrame], dest: Map[String, DataFrame]): DataFrame = {
    require(src.nonEmpty || dest.nonEmpty, "schemaDiff needs at least one table")
    val spark = (src.values ++ dest.values).head.sparkSession
    import spark.implicits._
    val rows = (src.keySet ++ dest.keySet).toSeq.sorted.flatMap { tbl =>
      (src.get(tbl), dest.get(tbl)) match {
        case (Some(_), None) => Seq((tbl, "", "table_removed", "", ""))
        case (None, Some(_)) => Seq((tbl, "", "table_added", "", ""))
        case (Some(a), Some(b)) =>
          val at = a.schema.fields.map(f => f.name -> f.dataType.sql).toMap
          val bt = b.schema.fields.map(f => f.name -> f.dataType.sql).toMap
          (at.keySet ++ bt.keySet).toSeq.sorted.flatMap { c =>
            (at.get(c), bt.get(c)) match {
              case (Some(t1), None) => Seq((tbl, c, "col_removed", t1, ""))
              case (None, Some(t2)) => Seq((tbl, c, "col_added", "", t2))
              case (Some(t1), Some(t2)) if t1 != t2 =>
                Seq((tbl, c, "type_changed", t1, t2))
              case _ => Nil
            }
          }
        case (None, None) => Nil
      }
    }
    rows.toDF("tbl", "col", "change", "src_type", "dest_type")
  }

  /** Long-format column profile: per column, row/null/distinct counts —
    * the quick data-quality read a pipeline runs before committing to a
    * 100 TB job. TWO table scans total regardless of column count (the
    * naive per-column form pays one scan PER column — 4× the read for a
    * 4-column profile):
    *   pass 1 — the row count and EVERY column's null count in one
    *     aggregate (all map-side partial, one scan);
    *   pass 2 — exact distincts for ALL columns at once: one scan fans
    *     each row out as (col_name, value) pairs and the count-distinct
    *     partitions by (col_name, value), so no reducer sees more than one
    *     column's one value. This is the same row-multiplication shape as
    *     Catalyst's Expand rewrite for multi-column countDistinct, but
    *     over just the profiled columns and emitting long format directly.
    * Distinctness is compared on the canonical string form — exact for
    * integral/string/date/timestamp columns; a float column (where equal
    * values can print differently, e.g. -0.0) should profile via the raw
    * type or HLL instead.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val nullAggs = cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"))
    val counts = df
      .agg(count(lit(1)).as("n_rows"), nullAggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        col(s"__null_$c").as("n_null"))): _*)).as("kv"))
      .select("kv.*")
    val kv = df
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("kv"))
      .select("kv.*")
    val distincts = kv.filter(col("v").isNotNull)
      .groupBy(col("col_name"))
      .agg(countDistinct(col("v")).as("n_distinct"))
    counts.join(distincts, Seq("col_name"), "left")
      // BOTH derived counts coalesce: SUM over an empty table is NULL,
      // so an empty profile must report n_null=0, not NPE the caller
      // (the dqChecks rule)
      .select(col("col_name"), col("n_rows"),
        coalesce(col("n_null"), lit(0L)).as("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
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
    }),

    // RI audit over the full source catalog — every FK edge, zero orphans
    // expected on the synthetic data (the operator's sensitivity to REAL
    // orphans is proven separately in InspectSpec on corrupted tables).
    // The oracle is generated from the SAME RelGraph metadata, so the edge
    // list can never drift between engines.
    Q("q_ri_orphans", {
      val edges = for {
        (name, meta) <- RelGraph.tpch.tables.toSeq.sortBy(_._1)
        if Tables.relational.contains(name)
        fk <- meta.fks.sortBy(_.parent)
      } yield {
        val notNull = fk.childCols.map(c => s"c.$c IS NOT NULL").mkString(" AND ")
        val eq = fk.childCols.zip(fk.parentCols)
          .map { case (cc, pc) => s"p.$pc = c.$cc" }.mkString(" AND ")
        s"""SELECT '$name->${fk.parent}' AS edge,
           |  CAST((SELECT COUNT(*) FROM $name c WHERE $notNull
           |        AND NOT EXISTS (SELECT 1 FROM ${fk.parent} p WHERE $eq)) AS BIGINT) AS n_orphans"""
          .stripMargin
      }
      edges.mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY edge")
    })((s, dir) => {
      val tables = Tables.relational.map(n => n -> Tables.load(s, dir, n)).toMap
      orphans(tables, RelGraph.tpch).orderBy("edge")
    }),

    // §2e.49e — declarative data-quality gate over orders: row-local rules
    // in ONE aggregate scan, uniqueness one groupBy, referential one
    // anti-join. The synthetic data passes every rule; InspectSpec proves
    // violation SENSITIVITY on corrupted tables.
    Q("q_dq_checks",
      """SELECT rule, n_violations, n_violations = 0 AS passed FROM (
        |SELECT 'accepted_values(o_orderstatus)' AS rule,
        |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |FROM orders
        |UNION ALL
        |SELECT 'check(positive_total)',
        |  CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'not_null(o_custkey)',
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'ref(o_custkey->customer)',
        |  CAST((SELECT COUNT(*) FROM orders o WHERE o_custkey IS NOT NULL
        |        AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        |UNION ALL
        |SELECT 'unique(o_orderkey)',
        |  CAST(COALESCE((SELECT SUM(c - 1) FROM (
        |    SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) t WHERE c > 1), 0) AS BIGINT)
        |) ORDER BY rule""".stripMargin)(
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders")
        val customer = Tables.load(s, dir, "customer")
        dqChecks(orders, Seq(
          DqNotNull("o_custkey"),
          DqAccepted("o_orderstatus", Seq("O", "F", "P")),
          DqCheck("positive_total", col("o_totalprice") > 0),
          DqUnique(Seq("o_orderkey")),
          DqRef(Seq("o_custkey"), customer, Seq("c_custkey"), "customer")))
          .orderBy("rule")
      }),

    // column profile of the documents table (row/null/distinct per column)
    Q("q_profile", {
      val cols = Seq("doc_id", "lang", "source", "text")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
           |FROM documents""".stripMargin)
        .mkString("SELECT * FROM (\n", "\nUNION ALL ", "\n) ORDER BY col_name")
    })((s, dir) =>
      profile(Tables.load(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "text")).orderBy("col_name")))
}
