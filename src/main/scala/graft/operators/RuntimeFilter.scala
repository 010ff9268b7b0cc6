package graft.operators

import graft.{Q, Tables}
import graft.functions.Bloom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual runtime join filtering (SURVEY §2c.24n / §4).
  *
  * The 100 TB shape this exists for: a huge fact table must be semi-joined
  * against a key set that is small-ish but above the broadcast threshold
  * (dbcut's closure key sets, a dedup drop list, a decontamination doc set).
  * A plain shuffle semi-join shuffles EVERY fact row; Spark's automatic
  * runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter`) only
  * fires on join patterns the optimizer can prove, not on a key set produced
  * by a previous job. This operator is the explicit form: build a compact
  * bloom over the keys (distributed, driver holds only the bitset), probe it
  * as a codegen'd scan-side predicate, then exact-join only the survivors —
  * the fact shuffle shrinks by the true selectivity (plus the fpp tax),
  * while false positives are removed by the exact join, so the result is
  * provably identical to the plain semi-join and a plain `IN` oracle checks
  * it.
  */
object RuntimeFilter {

  /** Semi-join `fact ⋉ keys` with a bloom pre-filter on the fact scan.
    * Result is IDENTICAL to `fact.join(keys, factKey === keyCol,
    * "left_semi")` — the bloom only cuts how many fact rows reach the join.
    * Key columns must be integral (probed as BIGINT).
    */
  def bloomPrunedSemiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
                          keyCol: String, fpp: Double = 0.03,
                          expectedItems: Option[Long] = None): DataFrame = {
    val distinctKeys = keys.select(col(keyCol)).na.drop().distinct()
    // Sizing: any UPPER bound on the distinct key count works — the bitset
    // just comes out a bit larger (lower fpp), and the exact join removes
    // false positives either way, so the result is bound-independent.
    // Callers that know a cheap bound (parquet footer row count of the key
    // table) pass it and save the sizing job + scan; otherwise one count
    // job sizes exactly. The build job itself always scans the key side.
    val n = expectedItems.getOrElse(distinctKeys.count())
    val bf = Bloom.build(distinctKeys, keyCol, n, fpp)
    fact.filter(Bloom.mightContain(col(factKey), bf))
      .join(distinctKeys, col(factKey) === col(keyCol), "left_semi")
  }

  val pack: Seq[Q] = Seq(
    // 24n. bloom-pruned semi-join: lineitem against the suppliers of 5
    // nations (~20% selectivity — the bloom drops ~80% of the fact before
    // any shuffle). The oracle is the PLAIN `IN` subquery: the hash match
    // proves the bloom path changes nothing but the scan volume.
    Q("q_bloom_join",
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)(
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val keys = Tables.load(s, dir, "supplier")
          .filter(col("s_nationkey") < 5).select("s_suppkey")
        // footer row count of the whole key table upper-bounds the filtered
        // distinct keys — metadata-only sizing, one job fewer
        val bound = Tables.footerRowCount(s, Tables.path(dir, "supplier"))
        bloomPrunedSemiJoin(li, keys, "l_suppkey", "s_suppkey",
          expectedItems = Some(math.max(1L, bound)))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
          .orderBy("l_returnflag")
      }))
}
