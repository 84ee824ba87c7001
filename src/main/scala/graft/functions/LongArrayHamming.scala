package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** `long_array_hamming(a, b)` — Σ popcount(a[i] ^ b[i]) over the common
  * prefix of two `array<bigint>` columns: the Hamming distance between
  * two multi-word bit signatures.
  *
  * Third member of the signature-kernel family ([[LongArrayDot]],
  * [[LongArrayPopcntAnd]]): the verify step of every banded
  * bit-signature join — perceptual-hash bands, multi-word SimHash —
  * executed once per candidate pair, so it must stay a tight codegen'd
  * loop inside the enclosing whole-stage-compiled filter rather than an
  * explode + join or a chain of per-word expressions.
  */
case class LongArrayHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_hamming"
  // null ELEMENT in either signature word => null result
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongArrayHamming {
  import org.apache.spark.sql.graftx.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(LongArrayHamming(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
