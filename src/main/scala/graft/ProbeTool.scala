package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement main for optimization work: times primitive plan
  * shapes against the same session config as Bench so per-query cost can
  * be decomposed (scan vs shuffle vs expression vs sort vs scheduling).
  * Not part of the driver contract.
  */
object ProbeTool {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timeIt(name: String, reps: Int = 5)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name: ${ts.map(t => f"$t%.3f").mkString(", ")} s")
    }

    val li = () => Tables.load(spark, sfDir, "lineitem")
    // empty job scheduling floor: 32 tasks doing nothing
    timeIt("empty_32_tasks")(spark.range(0, 32, 1, 32).select(lit(1).as("x")))
    timeIt("scan_only")(li())
    timeIt("scan_count_agg")(li().groupBy().agg(count(lit(1))))
    timeIt("groupby_sum_double")(li().groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity"), count(lit(1))))
    timeIt("groupby_sum_decimal")(li().groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast("decimal(18,2)")), count(lit(1))))
    timeIt("q1_shape_micros")(li().groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum(Q.micros($"l_quantity")).as("a"),
           sum(Q.micros($"l_extendedprice")).as("b"),
           sum((($"l_extendedprice".cast("decimal(18,2)") *
             (lit(1) - $"l_discount").cast("decimal(4,2)")) * 1000000).cast("long")).as("c"),
           count(lit(1)).as("d"))
      .orderBy($"l_returnflag", $"l_linestatus"))
    timeIt("q1_full")(SparkEntry.queries("q1_agg")(spark, sfDir))
    timeIt("shuffle_600k")(li().repartition(32, $"l_orderkey"))
    spark.stop()
  }
}
