package graft

import graft.sources.Recorder
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** VCR record/replay fixtures (sources/Record.scala — the reference's
  * contrib recorder workflow, `record.py:13-127`): record once against the
  * live source, replay forever with the source offline, under ONCE/ALL/
  * NONE write-protect modes.
  */
class RecordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-rec").toString

  test("record then replay: hit never evaluates the body, result is exact") {
    import spark.implicits._
    val dir = tmp()
    val data = Seq((1L, "a", Option(2.5)), (2L, "b", None), (3L, "c\nnl", Option(-1.0)))
    // session 1: empty cassette, ONCE -> records
    Recorder.using(spark, "fix1", Recorder.Once, dir) { rec =>
      assert(!rec.writeProtected)
      val out = rec.query("q1")(data.toDF("k", "v", "x"))
      assert(out.count() == 3)
    }
    assert(Files.isRegularFile(Paths.get(dir, "fix1.json")))
    // session 2: non-empty cassette, ONCE -> write-protected replay; the
    // body THROWS, proving a hit never executes (source can be offline)
    Recorder.using(spark, "fix1", Recorder.Once, dir) { rec =>
      assert(rec.writeProtected)
      val replay = rec.query("q1")(sys.error("replay must not execute"))
      assert(replay.as[(Long, String, Option[Double])].collect().toSet ==
        data.toSet, "replay must be bit-faithful incl. NULLs and newlines")
      // names+types round-trip exactly; nullability relaxes to nullable
      // (inherent to the JSON fixture path, values above prove fidelity)
      assert(replay.schema.map(f => (f.name, f.dataType)) ==
        data.toDF("k", "v", "x").schema.map(f => (f.name, f.dataType)))
      // a statement NOT in the cassette raises instead of recording
      val e = intercept[IllegalStateException](
        rec.query("novel")(data.toDF("k", "v", "x")))
      assert(e.getMessage.contains("fix1"))
    }
  }

  test("NONE never records; ALL clears and re-records") {
    import spark.implicits._
    val dir = tmp()
    // NONE on an empty cassette: pure replay, any query raises
    Recorder.using(spark, "fix2", Recorder.None_, dir) { rec =>
      assert(rec.writeProtected)
      intercept[IllegalStateException](rec.query("q")(Seq(1).toDF("a")))
    }
    Recorder.using(spark, "fix2", Recorder.Once, dir) { rec =>
      rec.query("q")(Seq(1).toDF("a"))
    }
    // NONE with the cassette present replays fine
    Recorder.using(spark, "fix2", Recorder.None_, dir) { rec =>
      assert(rec.query("q")(sys.error("no")).as[Int].collect().toSeq == Seq(1))
    }
    // ALL wipes and re-records even though the cassette exists
    Recorder.using(spark, "fix2", Recorder.All, dir) { rec =>
      assert(!rec.writeProtected)
      assert(rec.query("q")(Seq(7).toDF("a")).as[Int].head() == 7)
    }
    Recorder.using(spark, "fix2", Recorder.None_, dir) { rec =>
      assert(rec.query("q")(sys.error("no")).as[Int].collect().toSeq == Seq(7))
    }
  }

  test("iteration keying: the same statement twice is two ordered records") {
    import spark.implicits._
    val dir = tmp()
    Recorder.using(spark, "fix3", Recorder.Once, dir) { rec =>
      rec.query("same")(Seq("first").toDF("v"))
      rec.query("same")(Seq("second").toDF("v"))
    }
    Recorder.using(spark, "fix3", Recorder.Once, dir) { rec =>
      assert(rec.query("same")(sys.error("no")).as[String].head() == "first")
      assert(rec.query("same")(sys.error("no")).as[String].head() == "second")
    }
  }

  test("CLI --record: load replays from the cassette with the source gone") {
    val work = tmp()
    // a movable copy of the source: replay must not need it
    val src = s"$work/src"
    Files.createDirectories(Paths.get(src))
    Seq("region", "nation", "customer").foreach { t =>
      Tables.load(spark, TestSpark.sf, t).write.parquet(s"$src/$t.parquet")
    }
    val cfgPath = Paths.get(work, "graft.yml")
    Files.writeString(cfgPath,
      s"""databases:
         |  source_dir: $src
         |  destination_dir: $work/dest
         |queries:
         |  - from: customer
         |    limit: 4
         |    join_depth: 5
         |    backref_depth: 0
         |""".stripMargin)
    val args = Seq("-c", cfgPath.toString, "--quiet",
      "--record", "cli_fix", "--record-dir", s"$work/records", "load")
    val out1 = Cli.run(spark, Cli.parseArgs(args))
    assert(out1.exists(l => l.startsWith("load:") && l.contains("customer=4")))
    assert(Files.isRegularFile(Paths.get(s"$work/records/cli_fix.json")))
    // kill the source; replay (ONCE, cassette present) still loads
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(Paths.get(src)))(s =>
      s.iterator().asScala.toSeq).reverse.foreach(Files.deleteIfExists(_))
    val out2 = Cli.run(spark, Cli.parseArgs(args))
    assert(out2.exists(l => l.startsWith("load:") && l.contains("customer=4")),
      out2.mkString("\n"))
    // a PURE replay must not rewrite the committed cassette (pretty-print
    // churn, crash-truncation risk): bytes and mtime stay identical
    val cassette = Paths.get(s"$work/records/cli_fix.json")
    val before = (Files.getLastModifiedTime(cassette), Files.size(cassette))
    Cli.run(spark, Cli.parseArgs(args))
    assert((Files.getLastModifiedTime(cassette), Files.size(cassette)) ==
      before, "pure replay dirtied the cassette")
  }

  test("CLI query:<name> --record replays a registered query with the corpus deleted") {
    val work = tmp()
    val src = s"$work/src"
    Files.createDirectories(Paths.get(src))
    // q1_agg reads only lineitem
    Tables.load(spark, TestSpark.sf, "lineitem")
      .write.parquet(s"$src/lineitem.parquet")
    val cfgPath = Paths.get(work, "graft.yml")
    Files.writeString(cfgPath,
      s"""databases:
         |  source_dir: $src
         |  destination_dir: $work/dest
         |queries:
         |  - from: lineitem
         |""".stripMargin)
    val args = Seq("-c", cfgPath.toString, "--quiet",
      "--record", "qfix", "--record-dir", s"$work/records", "query:q1_agg")
    val out1 = Cli.run(spark, Cli.parseArgs(args))
    assert(out1.exists(_.startsWith("query q1_agg: 6 rows")), out1.mkString("\n"))
    // the corpus is GONE; the registered query still answers from the
    // cassette — any q_* result can ship as an offline CI fixture
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(Paths.get(src)))(s =>
      s.iterator().asScala.toSeq).reverse.foreach(Files.deleteIfExists(_))
    val out2 = Cli.run(spark, Cli.parseArgs(args))
    assert(out2.exists(_.startsWith("query q1_agg: 6 rows")), out2.mkString("\n"))
    // and the replayed ROWS are byte-faithful, not just countable
    val rec = new sources.Recorder(spark, "qfix",
      sources.Recorder.None_, s"$work/records")
    val replayed = sources.Recorder.registeredQuery(rec, "q1_agg", src)
      .collect().map(_.toSeq).toSet
    assert(replayed.nonEmpty && replayed.exists(_.nonEmpty))
  }

  test("chained recorded commands share ONE cassette session") {
    // a per-command Recorder would break the chain: command 2 would hit
    // the write-protected cassette command 1 just saved (ONCE) or clear
    // it (ALL). One session = iteration-keyed entries, replayed in order.
    val work = tmp()
    val src = s"$work/src"
    Files.createDirectories(Paths.get(src))
    Tables.load(spark, TestSpark.sf, "lineitem")
      .write.parquet(s"$src/lineitem.parquet")
    val cfgPath = Paths.get(work, "graft.yml")
    Files.writeString(cfgPath,
      s"""databases:
         |  source_dir: $src
         |  destination_dir: $work/dest
         |queries:
         |  - from: lineitem
         |""".stripMargin)
    val args = Seq("-c", cfgPath.toString, "--quiet",
      "--record", "chainfx", "--record-dir", s"$work/records",
      "query:q1_agg", "query:q1_agg")
    val out1 = Cli.run(spark, Cli.parseArgs(args))
    assert(out1.count(_.startsWith("query q1_agg: 6 rows")) == 2,
      out1.mkString("\n"))
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(Paths.get(src)))(s =>
      s.iterator().asScala.toSeq).reverse.foreach(Files.deleteIfExists(_))
    val out2 = Cli.run(spark, Cli.parseArgs(args))
    assert(out2.count(_.startsWith("query q1_agg: 6 rows")) == 2,
      out2.mkString("\n"))
  }

  test("a MIXED extraction+query cassette replays both (extraction filters its own events)") {
    // the CLI's advertised chain shape: one shared recorder across
    // `load query:q1_agg`. Replaying the extraction must drive ONLY the
    // cassette's table: events — replaying the query: event there would
    // fabricate a bogus table AND burn its iteration slot, so the real
    // query replay missed and threw (the pre-fix behavior)
    val work = tmp()
    val src = s"$work/src"
    Files.createDirectories(Paths.get(src))
    Tables.load(spark, TestSpark.sf, "lineitem")
      .write.parquet(s"$src/lineitem.parquet")
    val cfgPath = Paths.get(work, "graft.yml")
    Files.writeString(cfgPath,
      s"""databases:
         |  source_dir: $src
         |  destination_dir: $work/dest
         |queries:
         |  - from: lineitem
         |    join_depth: 0
         |    backref_depth: 0
         |""".stripMargin)
    val args = Seq("-c", cfgPath.toString, "--quiet",
      "--record", "mixedfx", "--record-dir", s"$work/records",
      "load", "query:q1_agg")
    val out1 = Cli.run(spark, Cli.parseArgs(args))
    assert(out1.exists(_.startsWith("query q1_agg: 6 rows")),
      out1.mkString("\n"))
    // source gone: both commands must replay from the one cassette
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(Paths.get(src)))(s =>
      s.iterator().asScala.toSeq).reverse.foreach(Files.deleteIfExists(_))
    scala.util.Using.resource(Files.walk(Paths.get(s"$work/dest")))(s =>
      s.iterator().asScala.toSeq).reverse.foreach(Files.deleteIfExists(_))
    val out2 = Cli.run(spark, Cli.parseArgs(args))
    assert(out2.exists(_.startsWith("query q1_agg: 6 rows")),
      out2.mkString("\n"))
    // the replayed extraction produced the real table, not a bogus
    // "query:…"-named one
    val dest = Paths.get(s"$work/dest")
    val written = scala.util.Using.resource(Files.list(dest))(s =>
      s.iterator().asScala.map(_.getFileName.toString).toSet)
    assert(written.exists(_.contains("lineitem")) &&
      !written.exists(_.contains("query")), s"dest held $written")
  }
}
