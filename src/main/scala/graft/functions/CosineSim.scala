package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity of two DOUBLE arrays in
  * a single fused loop, with whole-stage codegen (`doGenCode`).
  *
  * The built-in alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * ...)` plus two norm aggregates — allocates an intermediate array per
  * row and walks each input three times through lambda dispatch. This
  * expression walks both arrays once, allocation-free, and stays inside
  * the surrounding WholeStageCodegen span. Accumulation order is
  * index-ascending, matching the higher-order formulation, so results
  * are bit-identical with `dot/(sqrt(nx)*sqrt(ny))` computed that way
  * on well-formed inputs (equal length, nonzero norm).
  *
  * Corner cases deliberately DIVERGE from the HOF toward safety:
  * mismatched lengths → NULL (a truncated score would mask embedding
  * corruption; zip_with would null-poison the fold anyway), a NULL
  * element in either array → NULL (matching the HOF, whose fold
  * null-poisons — reading the slot as 0.0 would admit a
  * plausible-but-wrong score for a corrupt row), and zero norm → NULL
  * rather than NaN (cosine is undefined there, and NaN sorts ABOVE
  * every real score in a descending Spark window — a corrupt row would
  * top every top-k).
  *
  * Registered as SQL function `cosine_sim` via SparkSessionExtensions
  * (GraftSession) — preference order (b) of the build brief: a custom
  * Expression where built-ins exist but cost more, no custom plan nodes
  * needed.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two ARRAY<DOUBLE> arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})"
      )
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        // freshName on every local: fixed names collide (Janino
        // "Redefinition of local variable") when the expression appears
        // more than once in one codegen context, silently falling back
        // to interpreted eval.
        val n   = ctx.freshName("n")
        val i   = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val nx  = ctx.freshName("nx")
        val ny  = ctx.freshName("ny")
        val xi  = ctx.freshName("xi")
        val yi  = ctx.freshName("yi")
        s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $n = $a.numElements();
        |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    double $xi = $a.getDouble($i);
        |    double $yi = $b.getDouble($i);
        |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |  }
        |  if (${ev.isNull} || $nx == 0.0 || $ny == 0.0) {
        |    ${ev.isNull} = true;
        |  } else {
        |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        |  }
        |}
        """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Extension installer: `builder.withExtensions(CosineSim.install)`. */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        new FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "cosine_sim takes exactly 2 array<double> arguments")
          CosineSim(children.head, children(1))
        }
      )
    )
}
