package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: modular polynomial rolling hash of a
  * string — `fold(acc, c) = (acc*31 + c) mod 1e9+7` over CODE POINTS,
  * bit-identical to the higher-order formulation
  * `aggregate(transform(split(text, ''), c -> ascii(c)), 0, ...)`:
  * Spark's zero-width `split('')` advances by code point (it never
  * splits inside a surrogate pair) and `ascii` returns the full code
  * point of the leading character, which is why this eval uses
  * `codePointAt`/`charCount` — a UTF-16 `charAt` loop would DIVERGE
  * from the HOF on astral characters (RollingHashSpec pins the emoji
  * case). One fused allocation-free loop inside whole-stage codegen
  * instead of materializing a char array and an int array per row and
  * dispatching two lambdas per character.
  *
  * Second engine-native SQL function (after `cosine_sim`) — preference
  * order (b) of the build brief: a custom Expression where built-ins
  * exist but cost more.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"rolling_hash requires a STRING argument, got ${other.simpleString}"
        )
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = Math.floorMod(acc * 31L + cp.toLong, 1000000007L)
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => {
        val str = ctx.freshName("str")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
        |java.lang.String $str = $c.toString();
        |long ${ev.value}Acc = 0L;
        |int $i = 0;
        |while ($i < $str.length()) {
        |  int $cp = $str.codePointAt($i);
        |  ${ev.value}Acc =
        |    java.lang.Math.floorMod(${ev.value}Acc * 31L + (long) $cp, 1000000007L);
        |  $i += java.lang.Character.charCount($cp);
        |}
        |${ev.value} = ${ev.value}Acc;
        """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        new FunctionIdentifier("rolling_hash"),
        new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "rolling_hash takes exactly 1 string argument")
          RollingHash(children.head)
        }
      )
    )
}
