package graft

import graft.operators.{Multimodal, Subset}
import graft.sources.{Export, QueryCache, SqlDump}
import graft.spec.SpecJson
import org.apache.spark.sql.SparkSession

/** End-to-end walkthrough of the library surface: extract a subset with the
  * YAML query language, cache it, export it (parquet / JSON / SQL dump), run
  * the multimodal feature stage, and drive the streaming twin over a file
  * stream. `runMain graft.Demo <sfDir> <outDir>`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. declarative extraction, straight from the reference's query language
    val spec = SpecJson.parse(
      """
        |from: customer
        |where:
        |  c_mktsegment: BUILDING
        |limit: 5
        |join_depth: 5
        |backref_depth: 2
        |backref_limit: 3
        |""".stripMargin)
    val (tables, cacheHit) = QueryCache.extract(spark, sfDir, spec, s"$outDir/cache")
    println(s"[demo] extraction (cacheHit=$cacheHit):")
    tables.toSeq.sortBy(_._1).foreach { case (n, df) =>
      println(f"[demo]   $n%-10s ${df.count()}%6d rows")
    }
    val (_, cacheHit2) = QueryCache.extract(spark, sfDir, spec, s"$outDir/cache")
    println(s"[demo] second run cacheHit=$cacheHit2")

    // 2. exports
    val e = Subset.extract(spark, sfDir, spec)
    println("[demo] relation tree:\n" + e.plan.renderTree)
    val pq = Export.parquet(e, s"$outDir/parquet")
    val js = Export.json(e, s"$outDir/json")
    SqlDump.dump("customer", e.tables("customer"), s"$outDir/dump_customer",
      pk = Seq("c_custkey"))
    println(s"[demo] exports: ${pq.size} parquet dirs, ${js.size} json dirs, 1 sql dump")
    spark.read.text(s"$outDir/dump_customer").collect()
      .take(3).foreach(r => println("[demo] sql> " + r.getString(0).take(120)))

    // 3. multimodal feature stage
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, sfDir))
    println(s"[demo] multimodal features: ${feats.count()} rows, " +
      s"schema=${feats.schema.map(_.name).mkString(",")}")

    // 4. streaming twin over a real file stream
    // stage the batch data as the stream's input files (the file-stream
    // source validates the path at declaration time)
    Tables.load(spark, sfDir, "events").limit(2000)
      .write.mode("overwrite").parquet(s"$outDir/events_stream/")
    val batchSchema = Tables.load(spark, sfDir, "events").schema
    val stream = spark.readStream.schema(batchSchema)
      .parquet(s"$outDir/events_stream/")
    val q = streaming.Events.windowedAgg(stream)
      .writeStream.format("memory").queryName("demo_windows")
      .outputMode("complete").start()
    q.processAllAvailable()
    val n = spark.sql("SELECT count(*) FROM demo_windows").collect()(0).getLong(0)
    val top = spark.sql(
      "SELECT * FROM demo_windows ORDER BY minute_start, event_type LIMIT 3").collect()
    q.stop()
    println(s"[demo] streaming windows: $n aggregated rows; first: " +
      top.map(_.toString).mkString(" | "))

    // 5. multi-query job config (dbcut's query list + only-tables/last-only)
    val job = sources.Job.parseConfig(
      """
        |queries:
        |  - from: customer
        |    where:
        |      c_mktsegment: MACHINERY
        |    limit: 3
        |    join_depth: 1
        |    backref_depth: 0
        |  - from: supplier
        |    limit: 2
        |    join_depth: 2
        |    backref_depth: 0
        |""".stripMargin)
    val merged = sources.Job.run(spark, sfDir, job)
    println("[demo] job merge: " + merged.toSeq.sortBy(_._1)
      .map { case (n, df) => s"$n=${df.count()}" }.mkString(", "))
    println("[demo] normalized spec echo:\n" + graft.spec.SpecJson.toYaml(spec))

    println("[demo] OK")
    spark.stop()
  }

}
