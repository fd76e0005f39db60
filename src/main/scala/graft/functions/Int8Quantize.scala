package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: int8 symmetric quantization stats of a
  * FLOAT vector in two fused passes, with whole-stage codegen
  * (`doGenCode`) — the single-expression form of q119's five-HOF chain
  * (`aggregate` for the max-abs scale, `transform` for the codes, then
  * `aggregate`/`array_min`/`array_max`/`filter` reductions), which
  * walks the vector seven times through interpreted lambda dispatch and
  * materializes the intermediate code array per row. This walks the
  * floats twice (scale pass, code pass), allocation-free except the
  * 5-field result row, and stays inside the surrounding
  * WholeStageCodegen span.
  *
  * Bit-compatibility contract with the HOF chain (pinned by
  * Int8QuantizeSpec): the scale is `max(max_i |double(x_i)|, 1e-30)`
  * with the same double arithmetic, each code is
  * `(int) round_half_up(double(x_i) * 127 / mx)` where round_half_up is
  * EXACTLY Spark's `round()` on DOUBLE — `BigDecimal.valueOf(v)
  * .setScale(0, HALF_UP)` (decimal-string based, ties away from zero) —
  * not `Math.round` (floor(x+0.5), which differs on negative halves and
  * on doubles like 0.49999999999999994 where adding 0.5 rounds up).
  *
  * Corner cases: empty vector → NULL (no scale exists; the HOF chain
  * would raise on `element_at(q, 1)` under ANSI — NULL is the
  * data-cleaning-friendly answer), NULL element → NULL (the HOF fold
  * null-poisons; a silent 0 would admit a plausible-but-wrong code for
  * a corrupt row), NaN/Infinity element → NULL (the HOF chain under
  * ANSI would FAIL the whole job at the NaN→int cast, and
  * `BigDecimal.valueOf` would throw here — a corrupt vector must cost
  * one row, never the query).
  *
  * Bound: `q_sum` accumulates int8 codes (|q| ≤ 127) in a 32-bit Int —
  * deliberately matching the HOF chain's `aggregate(q, 0, ...)` for
  * bit-compatibility — so it wraps silently for vectors longer than
  * ~2^24 (~16.9M) elements. Embedding dims are orders of magnitude
  * below that; widening to Long would desynchronize the oracle and is
  * only worth doing alongside it.
  *
  * Registered as SQL function `int8_quantize_stats` via
  * SparkSessionExtensions (GraftSession) — preference order (b) of the
  * build brief.
  */
case class Int8QuantizeStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"int8_quantize_stats requires ARRAY<FLOAT>, got ${other.simpleString}"
      )
  }

  override val dataType: DataType = StructType(
    Seq(
      StructField("q0", IntegerType, nullable = false),
      StructField("q_sum", IntegerType, nullable = false),
      StructField("q_min", IntegerType, nullable = false),
      StructField("q_max", IntegerType, nullable = false),
      StructField("n_sat", IntegerType, nullable = false)
    )
  )

  override def nullable: Boolean = true

  override def prettyName: String = "int8_quantize_stats"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    var mx = 1e-30
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = math.abs(a.getFloat(i).toDouble)
      if (v.isNaN || v.isInfinite) return null
      if (v > mx) mx = v
      i += 1
    }
    var q0 = 0; var sum = 0; var min = Int.MaxValue; var max = Int.MinValue; var sat = 0
    i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble * 127.0 / mx
      val q = java.math.BigDecimal
        .valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .doubleValue()
        .toInt
      if (i == 0) q0 = q
      sum += q
      if (q < min) min = q
      if (q > max) max = q
      if (q == 127 || q == -127) sat += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](q0, sum, min, max, sat))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val mx = ctx.freshName("mx")
        val v = ctx.freshName("v")
        val d = ctx.freshName("d")
        val q = ctx.freshName("q")
        val q0 = ctx.freshName("q0")
        val sum = ctx.freshName("sum")
        val min = ctx.freshName("min")
        val max = ctx.freshName("max")
        val sat = ctx.freshName("sat")
        s"""
        |int $n = $a.numElements();
        |if ($n == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $mx = 1e-30;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    double $v = java.lang.Math.abs((double) $a.getFloat($i));
        |    if (java.lang.Double.isNaN($v) || java.lang.Double.isInfinite($v)) {
        |      ${ev.isNull} = true; break;
        |    }
        |    if ($v > $mx) $mx = $v;
        |  }
        |  if (!${ev.isNull}) {
        |    int $q0 = 0; int $sum = 0; int $min = Integer.MAX_VALUE;
        |    int $max = Integer.MIN_VALUE; int $sat = 0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      double $d = ((double) $a.getFloat($i)) * 127.0 / $mx;
        |      int $q = (int) java.math.BigDecimal.valueOf($d)
        |        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
        |      if ($i == 0) $q0 = $q;
        |      $sum += $q;
        |      if ($q < $min) $min = $q;
        |      if ($q > $max) $max = $q;
        |      if ($q == 127 || $q == -127) $sat++;
        |    }
        |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |      new Object[]{java.lang.Integer.valueOf($q0), java.lang.Integer.valueOf($sum),
        |                   java.lang.Integer.valueOf($min), java.lang.Integer.valueOf($max),
        |                   java.lang.Integer.valueOf($sat)});
        |  }
        |}
        """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8QuantizeStats {

  /** Extension installer: `builder.withExtensions(Int8QuantizeStats.install)`. */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        new FunctionIdentifier("int8_quantize_stats"),
        new ExpressionInfo(classOf[Int8QuantizeStats].getName, "int8_quantize_stats"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "int8_quantize_stats takes exactly 1 array<float> argument")
          Int8QuantizeStats(children.head)
        }
      )
    )
}
