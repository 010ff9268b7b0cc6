package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native Catalyst aggregate
  * (`mg_topk(tokens, k)`): a MERGEABLE fixed-size summary of a token
  * stream's heavy hitters — the 100 TB alternative to `GROUP BY token`
  * when the key space is unbounded and only the frequent tail matters.
  *
  * Guarantees (Misra & Gries 1982; merge bound per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): after any sequence of updates and
  * pairwise merges over a stream of n tokens,
  *   - every item with true count > n/k is present in the sketch, and
  *   - each reported estimate undercounts its true count by at most n/k.
  * So the sketch's candidate set is a SUPERSET of the true heavy hitters;
  * a second pass that exact-counts only the ≤ k-1 candidates turns it into
  * an exact answer (see q_heavy_hitters).
  *
  * Input is the per-document token ARRAY, not an exploded token stream:
  * the sketch consumes each document's tokens in one `update` call, so the
  * corpus never materializes one-row-per-token anywhere — per-partition
  * sketches of ≤ 2k entries flow map-side into one tiny reduce.
  *
  * Implementation: classic MG with the amortized batch prune — the buffer
  * grows to 2k entries, then shrinks to < k by subtracting the k-th
  * largest count from everything (items with count ≥ n/k can lose at most
  * n/k total across all prunes, preserving the bound) — so update cost is
  * amortized O(1) per token, not O(k).
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, s"mg_topk needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Subtract the k-th largest count from every entry, drop the ≤ 0 rest.
    * Only called when the buffer holds ≥ 2k entries, so the O(m log m)
    * sort amortizes over the ≥ k misses that grew it.
    */
  private def prune(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size >= k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val kth = counts(counts.length - k) // k-th largest
      buf.filterInPlace((_, c) => c > kth)
      buf.mapValuesInPlace((_, c) => c - kth)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) {
          val t = a.getUTF8String(i).toString
          buf.update(t, buf.getOrElse(t, 0L) + 1L)
          if (buf.size >= 2 * k) prune(buf)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size >= 2 * k) prune(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic presentation order given the buffer contents
    val rows = buf.toArray.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
}

object FreqSketch {
  /** SQL builder shared by the session-registry and the extensions
    * registration paths — one arity/literal check, not two copies.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"mg_topk requires 2 arguments (tokens, k), got ${exprs.length}")
    val k = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => sys.error(s"mg_topk: k must be an int literal, got $other")
    }
    MisraGriesTopK(exprs.head, k).toAggregateExpression()
  }

  /** Register `mg_topk(array<string>, k)` so `expr(...)` strings can use
    * it. `k` must be an integer literal. Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_topk", fromExprs, "built-in")
}
