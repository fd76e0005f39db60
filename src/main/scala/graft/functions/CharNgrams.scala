package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngrams(text: STRING, n: INT literal) -> ARRAY<STRING>` — ALL
  * (non-distinct, in order) code-point n-grams of a string,
  * bit-identical to the higher-order chain used for language-ID
  * bigrams:
  * `filter(zip_with(split(t, ''), slice(split(t, ''), 2, size(...)),
  *                  (a, b) -> concat(a, b)), x -> x IS NOT NULL)`
  * generalized to n. Spark's zero-width split advances by CODE POINT
  * (it never splits inside a surrogate pair), so each n-gram here is
  * the byte slice covering n consecutive UTF-8 sequences — one
  * boundary walk per row instead of three interpreted split()
  * materializations plus a lambda dispatch per character
  * (higher-order functions are CodegenFallback).
  *
  * Unlike `word_shingles` this is NOT deduplicated: consumers count
  * occurrences (profile learning, repetition stats), so every n-gram
  * must appear as many times as it occurs.
  */
case class CharNgrams(left: Expression, right: Expression) extends BinaryExpression {

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
        s"char_ngrams requires a STRING argument, got ${left.dataType.simpleString}"
      )
    else if (!right.foldable || right.dataType != IntegerType || nOpt.isEmpty)
      TypeCheckResult.TypeCheckFailure("char_ngrams n must be a non-NULL INT literal")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"char_ngrams n must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(text: Any, nArg: Any): Any =
    CharNgrams.compute(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (text, _) => s"${ev.value} = graft.functions.CharNgrams.compute($text, $n);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharNgrams {

  /** All code-point n-grams of `s` as byte slices; one UTF-8 boundary
    * walk. Public + static-shaped: called from generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    // code-point start offsets (a UTF-8 continuation byte is 10xxxxxx)
    var cps = 0
    var i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) cps += 1
      i += 1
    }
    if (cps < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](cps + 1)
    var k = 0
    i = 0
    while (i < b.length) {
      if ((b(i) & 0xC0) != 0x80) { starts(k) = i; k += 1 }
      i += 1
    }
    starts(cps) = b.length
    val m = cps - n + 1
    val out = new Array[Any](m)
    k = 0
    while (k < m) {
      out(k) = UTF8String.fromBytes(b, starts(k), starts(k + n) - starts(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        new FunctionIdentifier("char_ngrams"),
        new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "char_ngrams takes (text, n)")
          CharNgrams(children.head, children(1))
        }
      )
    )
}
