package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text: STRING, n: INT literal) -> ARRAY<STRING>` —
  * the DISTINCT word n-grams of a document in first-occurrence order,
  * bit-identical to the higher-order formulation
  * `array_distinct(transform(sequence(1, size(ws)-(n-1)),
  *                           i -> concat_ws(' ', slice(ws, i, n))))`
  * with `ws = split(text, ' ')` (fewer than n words -> empty array;
  * the HOF pipeline never sees that case because callers pre-filter).
  *
  * Why native: the HOF chain is the single hottest scan of the dedup
  * family (q35/q36/q68 all start from it) and none of it is codegen'd —
  * higher-order functions are CodegenFallback, so every row pays
  * interpreted lambda dispatch per shingle plus a token array, a slice
  * array and a concat per n-gram. This expression exploits that a
  * space-joined slice of a space-split string IS a byte slice of the
  * original: one scan finds the 0x20 word boundaries (in UTF-8 a 0x20
  * byte can only be the space character — no multibyte sequence
  * contains it), and each shingle is copied once, directly from the
  * source bytes, into a dedup set. No tokens, no lambdas, no joins.
  *
  * Split semantics matched exactly: Spark's `split(text, ' ', -1)`
  * keeps empty tokens (leading, embedded and trailing), so consecutive
  * spaces yield empty words and the reconstructed byte slice preserves
  * them verbatim (ShinglesSpec pins those cases against the HOF chain).
  */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {

  // evaluated, not pattern-matched: a foldable non-Literal (1+2 — the
  // analyzer runs before constant folding) or a NULL literal must fail
  // type-check cleanly, never throw out of analysis
  private lazy val nOpt: Option[Int] =
    if (right.foldable && right.dataType == IntegerType)
      Option(right.eval()).map(_.asInstanceOf[Int])
    else None
  private lazy val n: Int = nOpt.get

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_shingles requires a STRING argument, got ${left.dataType.simpleString}"
      )
    else if (!right.foldable || right.dataType != IntegerType || nOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure("word_shingles n must be a non-NULL INT literal")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"word_shingles n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(text: Any, nArg: Any): Any =
    WordShingles.compute(text.asInstanceOf[UTF8String], n)

  // one static call from generated code — the loop itself is JIT-hot
  // shared code, and the expression stays inside whole-stage codegen
  // (no CodegenFallback row boxing)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (text, _) => s"${ev.value} = graft.functions.WordShingles.compute($text, $n);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingles {

  /** Word-start byte offsets of `b` (split on the 0x20 byte), or null
    * when there are fewer than n words. */
  private def wordStarts(b: Array[Byte], n: Int): Array[Int] = {
    var spaces = 0
    var i = 0
    while (i < b.length) {
      if (b(i) == 0x20) spaces += 1
      i += 1
    }
    val words = spaces + 1
    if (words < n) return null
    val starts = new Array[Int](words)
    var w = 1
    i = 0
    while (i < b.length) {
      if (b(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts
  }

  /** Distinct word n-grams of `s` as byte slices between space
    * boundaries, first-occurrence order. Public + static-shaped: called
    * from generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val starts = wordStarts(b, n)
    if (starts == null) return new GenericArrayData(Array.empty[Any])
    val words = starts.length
    val m = words - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String](Math.min(m * 2, 1 << 16))
    var k = 0
    while (k < m) {
      val from = starts(k)
      val until = if (k + n < words) starts(k + n) - 1 else b.length
      seen.add(UTF8String.fromBytes(b, from, until - from))
      k += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-grams (non-distinct, in order) — the occurrence-count
    * sibling used by repetition statistics. Public + static-shaped:
    * called from generated code. */
  def computeAll(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val starts = wordStarts(b, n)
    if (starts == null) return new GenericArrayData(Array.empty[Any])
    val words = starts.length
    val m = words - n + 1
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val from = starts(k)
      val until = if (k + n < words) starts(k + n) - 1 else b.length
      out(k) = UTF8String.fromBytes(b, from, until - from)
      k += 1
    }
    new GenericArrayData(out)
  }

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("word_shingles"),
        new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "word_shingles takes (text, n)")
          WordShingles(children.head, children(1))
        }
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("word_ngrams"),
        new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "word_ngrams takes (text, n)")
          WordNgrams(children.head, children(1))
        }
      )
    )
  }
}

/** `word_ngrams(text: STRING, n: INT literal) -> ARRAY<STRING>` — ALL
  * word n-grams in order (non-distinct), bit-identical to
  * `transform(sequence(1, size(ws)-(n-1)), i -> concat_ws(' ', slice(ws, i, n)))`
  * over `ws = split(text, ' ')` when the text has >= n words (empty
  * array below that — callers that keep the HOF's sequence(1,0)
  * descending-quirk rows must pre-filter, as q91 always did). Same
  * byte-slice scan as [[WordShingles]], without the dedup — consumers
  * COUNT occurrences (repetition/boilerplate stats), so duplicates must
  * survive. */
case class WordNgrams(left: Expression, right: Expression) extends BinaryExpression {

  // see WordShingles.nOpt: evaluated, not pattern-matched
  private lazy val nOpt: Option[Int] =
    if (right.foldable && right.dataType == IntegerType)
      Option(right.eval()).map(_.asInstanceOf[Int])
    else None
  private lazy val n: Int = nOpt.get

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires a STRING argument, got ${left.dataType.simpleString}"
      )
    else if (!right.foldable || right.dataType != IntegerType || nOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure("word_ngrams n must be a non-NULL INT literal")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"word_ngrams n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(text: Any, nArg: Any): Any =
    WordShingles.computeAll(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (text, _) => s"${ev.value} = graft.functions.WordShingles.computeAll($text, $n);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
