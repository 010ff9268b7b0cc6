package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (WordPiece/MaxMatch
  * inference) over a whole token array as ONE native expression —
  * "tokenizer application at scale": the vocabulary is MODEL STATE (a
  * bounded table collected once, like the k-means centroids), the encode
  * is a per-row primitive pass inside whole-stage codegen, and 100 TB of
  * text tokenizes as a pure map with zero shuffles.
  *
  * Semantics (mirrored exactly by the DuckDB oracle of
  * q_subword_tokenize): per token, repeatedly emit the LONGEST vocab
  * entry that prefixes the remaining text (ties impossible — equal-length
  * candidates matching the same prefix are the same string) and advance
  * past it; all positions/lengths count Unicode CODE POINTS, never bytes
  * or UTF-16 units (DuckDB's substr/length are code-point-based, and the
  * corpus has multi-byte text). A position with no vocab match emits its
  * single code point as a fallback piece — unreachable when the vocab
  * contains every corpus character, but the expression must never drop
  * data. Null tokens are skipped; a null token ARRAY is null.
  *
  * The vocab child must be FOLDABLE (a literal array): the matcher —
  * vocab hash set bucketed by piece length — builds once per operator
  * (interpreted: lazy val; codegen: a reference object baked in at
  * compile time), not per row.
  */
case class WpEncodeAll(tokens: Expression, vocab: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = vocab

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (tokens.dataType, vocab.dataType) match {
      case _ if !vocab.foldable =>
        TypeCheckFailure("wp_encode_all requires a literal (foldable) vocab")
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckSuccess
      case (l, r) =>
        TypeCheckFailure(
          s"wp_encode_all expects (array<string>, array<string>), got ($l, $r)")
    }
  }

  @transient private lazy val matcher: WpMatcher = WpEncodeAll.matcherFor(
    vocab.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(toks: Any, vocabIgnored: Any): Any =
    matcher.encodeAll(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // vocab is foldable: bake the BUILT matcher into the generated class
    // instead of re-evaluating the literal array per row
    val m = ctx.addReferenceObj("wpMatcher", matcher, classOf[WpMatcher].getName)
    nullSafeCodeGen(ctx, ev, (toks, _) => s"${ev.value} = $m.encodeAll($toks);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WpEncodeAll =
    copy(tokens = newLeft, vocab = newRight)
}

/** The greedy matcher: vocab set + max piece length (in code points). */
final class WpMatcher(vocabStrings: Array[String]) extends Serializable {

  private val set = {
    val s = new java.util.HashSet[String](vocabStrings.length * 2)
    vocabStrings.foreach(v => if (v != null && v.nonEmpty) s.add(v))
    s
  }
  private val maxLen = {
    var m = 1
    vocabStrings.foreach(v =>
      if (v != null) m = math.max(m, v.codePointCount(0, v.length)))
    m
  }

  def encodeAll(toks: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      if (!toks.isNullAt(t)) encodeInto(toks.getUTF8String(t).toString, out)
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeInto(word: String, out: java.util.ArrayList[Any]): Unit = {
    // code-point array: DuckDB substr/length semantics, surrogate-safe
    val cps = word.codePoints().toArray
    var pos = 0
    while (pos < cps.length) {
      var len = math.min(maxLen, cps.length - pos)
      var piece: String = null
      while (piece == null && len >= 1) {
        val cand = new String(cps, pos, len)
        if (set.contains(cand)) piece = cand else len -= 1
      }
      if (piece == null) { // fallback: single code point (vocab gap)
        piece = new String(cps, pos, 1)
        len = 1
      }
      out.add(UTF8String.fromString(piece))
      pos += len
    }
  }
}

object WpEncodeAll {

  private[functions] def matcherFor(vocab: ArrayData): WpMatcher = {
    val arr = new Array[String](vocab.numElements())
    var i = 0
    while (i < arr.length) {
      arr(i) = if (vocab.isNullAt(i)) null else vocab.getUTF8String(i).toString
      i += 1
    }
    new WpMatcher(arr)
  }

  /** Column sugar over a driver-collected vocabulary (bounded model
    * state, like the k-means centroids).
    */
  def wpEncodeAll(tokens: Column, vocab: Seq[String]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    org.apache.spark.sql.GraftSqlBridge.column(WpEncodeAll(
      org.apache.spark.sql.GraftSqlBridge.expression(tokens),
      org.apache.spark.sql.GraftSqlBridge.expression(
        array(vocab.map(lit): _*))))
  }

  def fromExprs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"wp_encode_all requires 2 arguments (tokens, vocab), got ${exprs.length}")
    WpEncodeAll(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wp_encode_all", fromExprs, "built-in")
}
