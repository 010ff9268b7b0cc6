package graft

import graft.operators.Lakehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-input semantics for the lakehouse mutation operators — the
  * branch cases the synthetic-table oracles can't isolate: NULL value
  * transitions, deletes of unmatched keys, single-row dimensions.
  */
class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mergeUpsert applies D/U/I and ignores deletes of unmatched keys") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")
    val changes = Seq(
      (2L, "D", "x"),  // delete existing
      (3L, "U", "c2"), // update existing
      (4L, "U", "d"),  // insert new
      (9L, "D", "x"))  // delete of a key not in base: no-op, must NOT insert
      .toDF("k", "op", "new_v")
    val out = Lakehouse.mergeUpsert(base, changes, "k", Seq("v"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "a", "base"), (3L, "c2", "upd"), (4L, "d", "ins")))
  }

  test("mergeUpsert carries NULL values faithfully in all branches") {
    val base = Seq((1L, Some("a")), (2L, None)).toDF("k", "v")
    val changes = Seq(
      (1L, "U", None: Option[String]), // update TO null
      (3L, "U", Some("z")))
      .toDF("k", "op", "new_v")
    val out = Lakehouse.mergeUpsert(base, changes, "k", Seq("v"))
      .orderBy("k").as[(Long, Option[String], String)].collect().toSeq
    assert(out == Seq((1L, None, "upd"), (2L, None, "base"),
      (3L, Some("z"), "ins")))
  }

  test("mergeUpsert applies new values for any non-delete op (I/U alike)") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((2L, "I", "b"), (1L, "I", "a2"))
      .toDF("k", "op", "new_v")
    val out = Lakehouse.mergeUpsert(base, changes, "k", Seq("v"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "a2", "upd"), (2L, "b", "ins")))
  }

  test("scd2 treats NULL as a real value: opens/closes NULL intervals") {
    val log = Seq(
      (1L, 1L, Some("a"), 100L),
      (1L, 2L, None: Option[String], 200L), // a -> NULL opens a NULL run
      (1L, 3L, None: Option[String], 300L), // same NULL: no new version
      (1L, 4L, Some("a"), 400L),            // NULL -> a closes it
      (2L, 5L, None: Option[String], 150L)) // first row NULL still opens v1
      .toDF("user_id", "event_id", "event_type", "us")
    val out = Lakehouse.scd2(log, "user_id", "event_type", col("us"))
      .orderBy("user_id", "version")
      .select("user_id", "version", "event_type", "valid_from_us")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "<null>" else r.getString(2), r.getLong(3)))
    assert(out == Seq(
      (1L, 1L, "a", 100L), (1L, 2L, "<null>", 200L), (1L, 3L, "a", 400L),
      (2L, 1L, "<null>", 150L)))
  }

  test("scd2 builds closed intervals and one open current row per key") {
    val log = Seq(
      (10L, 1L, "free", 100L), (10L, 2L, "free", 200L),
      (10L, 3L, "pro", 300L), (10L, 4L, "free", 400L),
      (20L, 5L, "pro", 150L))
      .toDF("user_id", "event_id", "event_type", "us")
    val out = Lakehouse.scd2(log, "user_id", "event_type", col("us"))
      .orderBy("user_id", "version")
      .select("user_id", "version", "event_type", "valid_from_us",
        "valid_to_us", "is_current")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(out == Seq(
      (10L, 1L, "free", 100L, 300L, false),
      (10L, 2L, "pro", 300L, 400L, false),
      (10L, 3L, "free", 400L, -1L, true),
      (20L, 1L, "pro", 150L, -1L, true)))
  }

  test("rowDiff classifies added/removed/changed incl. NULL transitions") {
    val v1 = Seq((1L, Some("a"), Some(10L)), (2L, Some("b"), Some(20L)),
      (3L, Some("c"), None: Option[Long]), (4L, Some("d"), Some(40L)))
      .toDF("k", "s", "n")
    val v2 = Seq((1L, Some("a"), Some(10L)),            // unchanged: absent
      (2L, None: Option[String], Some(20L)),            // b -> NULL: changed
      (3L, Some("c"), Some(30L)),                       // NULL -> 30: changed
      (5L, Some("e"), Some(50L)))                       // new key: added
      .toDF("k", "s", "n")
    val out = Lakehouse.rowDiff(v1, v2, "k", Seq("s", "n"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (2L, "changed", "s"), (3L, "changed", "n"),
      (4L, "removed", ""), (5L, "added", "")))
  }
}
