package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints as ONE native expression: token array → k-gram
  * md5 prefixes → sliding-window minima → distinct, fused in a single
  * primitive pass per row. The composed Column form (wordNgrams →
  * transform(md5) → arrays_zip slices → least) costs three higher-order
  * functions that evaluate interpreted AND re-inline their whole subtree
  * into every downstream reference when CollapseProject merges projections
  * — the 30× plan blowup recorded in SURVEY §7d. A single expression node
  * evaluates once per reference by construction, stays inside whole-stage
  * codegen (the generated code is one static call — no fallback row
  * materialization), and is STREAM-SAFE: no localCheckpoint barrier, so
  * the streaming winnowing twin can share it verbatim.
  *
  * Bit-compatibility contract (pinned in DedupSpec against the composed
  * form): gram = tokens joined by one space; hash = first 16 lowercase
  * hex chars of md5(UTF-8 bytes) — identical to Spark's `md5` and
  * DuckDB's `md5`; window min = lexicographic (hex is ASCII, so
  * UTF8String binary order ≡ String order); distinct keeps first
  * occurrence. Fewer than k tokens or fewer than w grams → empty array.
  * Null tokens (containsNull inputs are accepted): any gram touching a
  * null is skipped deterministically — remaining grams window as if the
  * null grams never existed; all-null or too-few-surviving-grams → empty.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow_fps needs k,w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps expects array<string> tokens, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFps.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** The fused pass (also the codegen target — generated code calls this
    * static method, keeping the surrounding operators in whole-stage
    * codegen with one invoke per row).
    */
  def compute(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val m0 = n - k + 1 // gram count before null filtering
    if (m0 < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[String](m0)
    var m = 0 // grams kept (containsNull inputs: a gram touching a null
              // token is skipped deterministically instead of NPE-ing)
    var i = 0
    while (i < m0) {
      val sb = new java.lang.StringBuilder
      var j = 0
      var hasNull = false
      while (j < k && !hasNull) {
        if (tokens.isNullAt(i + j)) hasNull = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
        }
        j += 1
      }
      if (!hasNull) {
      md.reset()
      val dig = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 16 hex chars = first 8 digest bytes, lowercase — identical
      // to substr(md5(x), 1, 16) in Spark and DuckDB
      val hex = new Array[Char](16)
      var b = 0
      while (b < 8) {
        hex(2 * b) = hexDigits((dig(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(dig(b) & 0xf)
        b += 1
      }
      hashes(m) = new String(hex)
      m += 1
      }
      i += 1
    }
    if (m < w) return new GenericArrayData(Array.empty[Any])
    // sliding-window minima, distinct by first occurrence
    val seen = new java.util.LinkedHashSet[String]
    var j = 0
    while (j <= m - w) {
      var mn = hashes(j)
      var t = j + 1
      while (t < j + w) {
        if (hashes(t).compareTo(mn) < 0) mn = hashes(t)
        t += 1
      }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Column sugar + SQL registration. */
  def winnowFps(tokens: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WinnowFps(org.apache.spark.sql.GraftSqlBridge.expression(tokens), k, w))

  /** A foldable, non-null integer argument validated with a readable
    * error (FreqSketch's literal rule): a bare `eval(null)` NPEs on a
    * NULL literal and throws Spark's raw cannot-evaluate error on a
    * column argument.
    */
  private[functions] def intLitArg(fn: String, name: String,
                                   e: Expression): Int = {
    require(e.foldable,
      s"$fn: argument '$name' must be a literal integer, got ${e.sql}")
    val v = e.eval(null)
    require(v != null, s"$fn: argument '$name' must not be NULL")
    v.asInstanceOf[Number].intValue
  }

  /** SQL builder shared by the session-registry and the extensions
    * registration paths — one arity/literal check, not two copies.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"winnow_fps requires 3 arguments (tokens, k, w), got ${exprs.length}")
    WinnowFps(exprs(0), intLitArg("winnow_fps", "k", exprs(1)),
      intLitArg("winnow_fps", "w", exprs(2)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps", fromExprs, "built-in")
}

/** Word n-grams of a token array as ONE native codegen expression — the
  * hot front half of every gram-based operator (dup-gram coverage,
  * decontamination, repetition, chunk/substring dedup). The composed form
  * (slice × n → arrays_zip → transform(concat_ws)) allocates n slice
  * arrays plus a zip-struct array per row and evaluates interpreted;
  * this is one primitive pass per row that stays inside whole-stage
  * codegen (same design as [[WinnowFps]], which fuses grams+hash+minima
  * for the winnowing-specific pipeline).
  *
  * Bit-compatibility contract (pinned in QualitySpec against the
  * composed form): gram = n tokens joined by one space; fewer than n
  * tokens → empty array; null elements are skipped within their gram
  * exactly like `concat_ws` (null-safe, not null-propagating); a null
  * input array → null (the composed form's `when` guard maps it to
  * empty — callers that need that coalesce, and the shared
  * `TextAnalysis.wordNgrams` wrapper does).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2, s"word_ngrams needs n >= 2, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects array<string> tokens, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  private val Space = UTF8String.fromString(" ")

  /** One pass: n-token windows joined by a single space. Null tokens are
    * skipped within their gram (concat_ws semantics).
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val total = tokens.numElements()
    val m = total - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        window(j) = if (tokens.isNullAt(i + j)) null
                    else tokens.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column sugar. */
  def wordNgrams(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      WordNgrams(org.apache.spark.sql.GraftSqlBridge.expression(tokens), n))

  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"word_ngrams requires 2 arguments (tokens, n), got ${exprs.length}")
    WordNgrams(exprs(0), WinnowFps.intLitArg("word_ngrams", "n", exprs(1)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_ngrams", fromExprs, "built-in")
}
