package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` as a native codegen predicate — the probe half
  * of a manual runtime filter (the explicit form of Spark's
  * `spark.sql.optimizer.runtime.bloomFilter`, for key sets the optimizer
  * cannot see, e.g. a subset-closure key set computed by a previous job).
  *
  * The filter ships to executors once (task-serialized with the expression /
  * codegen reference array, like a broadcast literal); each probe is one
  * `mightContainLong` call inside whole-stage codegen — no join, no shuffle,
  * no false negatives. False positives are expected and harmless: the caller
  * must re-check survivors with an exact join (see
  * `RuntimeFilter.bloomPrunedSemiJoin`).
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects BIGINT, got ${child.dataType}")
  }

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(filterBytes)

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}

object Bloom {

  /** Build a bloom filter over a BIGINT key column, distributed: per-partition
    * filters merged pairwise (`treeAggregate`), only the final bitset reaches
    * the driver. Sizing is the caller's contract: `expectedKeys` at `fpp`
    * costs `optimalNumOfBits/8` bytes (1M keys @ 3% ≈ 0.9 MB; 100M keys @ 5%
    * ≈ 74 MB — at that scale raise fpp: the exact re-check absorbs any
    * false-positive rate, a bigger fpp only prunes a little less).
    */
  def build(keys: DataFrame, keyCol: String, expectedKeys: Long, fpp: Double): BloomFilter = {
    val zero = BloomFilter.create(math.max(expectedKeys, 1L), fpp)
    keys.select(col(keyCol).cast("long")).na.drop()
      .rdd.map(_.getLong(0))
      .treeAggregate(zero)(
        (f, v) => { f.putLong(v); f },
        (a, b) => { a.mergeInPlace(b); a })
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Probe column: true iff `key` might be in the filter (never false for a
    * key that was put). `key` is cast to BIGINT to match `build`'s putLong.
    */
  def mightContain(key: Column, bf: BloomFilter): Column =
    GraftSqlBridge.column(
      BloomMightContainLong(GraftSqlBridge.expression(key.cast("long")), serialize(bf)))
}
