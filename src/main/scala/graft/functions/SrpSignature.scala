package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd signed-random-projection signature half:
  * `srp_sig(embedding, offset)` folds hyperplanes `offset .. offset+31`
  * (MSB-first) over the vector, emitting a 32-bit signature in a BIGINT.
  *
  * Why a custom Expression (guide preference (b)): the equivalent nested
  * higher-order fold — `aggregate(sequence(0,31), ..., aggregate(sequence(
  * 1, size(e)), ...))` — is interpreted, costing ~2·10⁴ boxed lambda
  * evaluations per row (measured 3.3 s over the sf0.1 corpus vs ~0.1 s for
  * this kernel). The loop here is 32×dim fused multiply-adds inside
  * whole-stage codegen.
  *
  * Semantics are IDENTICAL to the fold the DuckDB oracle replays
  * (operators/Similarity.scala `srpSigD`): hyperplane component
  * hp(b,i) = ((b·8191 + i)·2654435761 mod 2³¹)/2³¹ − 0.5 — exact in
  * BIGINT (max ~7·10¹⁴) and exact in double (power-of-two division);
  * projection accumulates left-to-right over dims in double; bit b set
  * iff the projection is ≥ 0. Null arrays propagate null.
  */
case class SrpSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, int), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_sig"

  override def nullSafeEval(a: Any, o: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val off = o.asInstanceOf[Int]
    val t = elem(left.dataType).get
    val n = x.numElements()
    var sig = 0L
    var b = off
    while (b < off + 32) {
      var acc = 0.0
      var i = 1
      while (i <= n) {
        val h = ((b * 8191L + i) * 2654435761L) % 2147483648L
        val v = t match {
          case FloatType => x.getFloat(i - 1).toDouble
          case _         => x.getDouble(i - 1)
        }
        acc += v * (h.toDouble / 2147483648.0 - 0.5)
        i += 1
      }
      sig = sig * 2 + (if (acc >= 0.0) 1L else 0L)
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, off) => {
      val (i, b, n, acc, h, sig) = (ctx.freshName("i"), ctx.freshName("b"),
        ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("h"),
        ctx.freshName("sig"))
      val getV = elem(left.dataType).get match {
        case FloatType => s"(double) $x.getFloat($i - 1)"
        case _         => s"$x.getDouble($i - 1)"
      }
      s"""
         |int $n = $x.numElements();
         |long $sig = 0L;
         |for (int $b = $off; $b < $off + 32; $b++) {
         |  double $acc = 0.0;
         |  for (int $i = 1; $i <= $n; $i++) {
         |    long $h = (($b * 8191L + $i) * 2654435761L) % 2147483648L;
         |    $acc += $getV * (((double) $h) / 2147483648.0 - 0.5);
         |  }
         |  $sig = $sig * 2 + ($acc >= 0.0 ? 1L : 0L);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpSignature =
    copy(left = newLeft, right = newRight)
}
