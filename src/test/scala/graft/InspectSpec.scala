package graft

import graft.model.{FK, RelGraph, TableMeta}
import graft.operators.Inspect
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The RI audit must detect actual orphans — the registered query sees only
  * clean data (zero rows everywhere), so sensitivity is proven here on a
  * deliberately corrupted catalog.
  */
class InspectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val graph = RelGraph(Map(
    "p" -> TableMeta("p", Seq("pid")),
    "c" -> TableMeta("c", Seq("cid"), Seq(FK(Seq("pref"), "p", Seq("pid"))))))

  test("orphans counts non-null FK values without a parent, per edge") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pid")
    // 10 -> ok, 20 -> ok, 99/98 -> orphans, null -> NOT an orphan
    val child = Seq(
      (10L, Some(1L)), (20L, Some(2L)), (30L, Some(99L)), (40L, Some(98L)),
      (50L, None: Option[Long]))
      .toDF("cid", "pref")
    val out = Inspect.orphans(Map("p" -> parent, "c" -> child), graph).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "c->p")
    assert(out(0).getLong(1) == 2L)
  }

  test("orphans on the clean relational catalog is all zeros") {
    val tables = Tables.relational
      .map(n => n -> Tables.load(spark, TestSpark.sf, n)).toMap
    val rows = Inspect.orphans(tables, RelGraph.tpch).collect()
    assert(rows.length == 7) // the 7 FK edges of the star schema
    assert(rows.forall(_.getLong(1) == 0L),
      rows.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
  }

  test("profile reports rows, nulls, and distincts per column") {
    import spark.implicits._
    val df = Seq(("a", Some(1)), ("a", None), ("b", Some(2)))
      .toDF("k", "v")
    val rows = Inspect.profile(df, Seq("k", "v"))
      .orderBy("col_name").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq(("k", 3L, 0L, 2L), ("v", 3L, 1L, 2L)))
  }

  test("dqChecks counts each violation kind on a corrupted table") {
    import spark.implicits._
    import graft.operators.Inspect._
    val parent = Seq(Tuple1(1L), Tuple1(2L)).toDF("pk")
    val df = Seq(
      (Some(1L), Some("A"), Some(10.0), 100L),  // clean
      (None, Some("A"), Some(10.0), 101L),      // null fk
      (Some(9L), Some("A"), Some(10.0), 102L),  // orphan fk
      (Some(2L), Some("Z"), Some(10.0), 103L),  // bad status
      (Some(2L), Some("A"), Some(-1.0), 104L),  // check fails
      (Some(2L), Some("A"), None, 105L),        // check NULL -> fails
      (Some(2L), Some("A"), Some(10.0), 100L))  // duplicate key 100
      .toDF("fk", "status", "amount", "k")
    val got = dqChecks(df, Seq(
      DqNotNull("fk"),
      DqAccepted("status", Seq("A", "B")),
      DqCheck("amount_pos", col("amount") > 0),
      DqUnique(Seq("k")),
      DqRef(Seq("fk"), parent, Seq("pk"), "parent")))
      .orderBy("rule")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("accepted_values(status)", 1L, false),
      ("check(amount_pos)", 2L, false),
      ("not_null(fk)", 1L, false),
      ("ref(fk->parent)", 1L, false),
      ("unique(k)", 1L, false)))
    // a clean slice passes everything
    val clean = dqChecks(df.filter(col("k") === 100L && col("fk") === 1L),
      Seq(DqNotNull("fk"), DqUnique(Seq("k"))))
      .as[(String, Long, Boolean)].collect()
    assert(clean.forall(_._3))
  }

  test("schemaDiff flags added/removed columns, type changes, and tables") {
    import spark.implicits._
    val srcT = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val destT = Seq((1L, 1, true)).toDF("id", "score", "flag")
    val src = Map("t" -> srcT, "gone" -> srcT)
    val dest = Map("t" -> destT, "fresh" -> destT)
    val got = Inspect.schemaDiff(src, dest)
      .orderBy("tbl", "col")
      .as[(String, String, String, String, String)].collect().toSeq
    assert(got == Seq(
      ("fresh", "", "table_added", "", ""),
      ("gone", "", "table_removed", "", ""),
      ("t", "flag", "col_added", "", "BOOLEAN"),
      ("t", "name", "col_removed", "STRING", ""),
      ("t", "score", "type_changed", "DOUBLE", "INT")))
  }
}
