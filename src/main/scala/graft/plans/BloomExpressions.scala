package graft.plans

import java.lang.{Long => JLong}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Probe side of [[graft.functions.Bloom]]: `bloom_might_contain(bits, h)`.
  *
  * Mirrors the build-side index arithmetic EXACTLY (see the Bloom scaladoc:
  * Kirsch–Mitzenmacher double hashing, `m` = 64·length(bits)); a Bloom
  * probe that derived indices any other way would return false negatives,
  * which is the one thing a Bloom filter must never do. Codegen'd so the
  * probe sits inside whole-stage codegen on the scan it prefilters — a
  * bit-test per probe, no boxing, early exit on the first clear bit.
  */
object BloomExpressions {

  case class BloomMightContain(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

    override def dataType: DataType = BooleanType

    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs (array<bigint>, bigint), got ($l, $r)")
    }

    override def nullSafeEval(bitsAny: Any, hAny: Any): Any = {
      val bits = bitsAny.asInstanceOf[ArrayData]
      val h = hAny.asInstanceOf[Long]
      val m = bits.numElements().toLong << 6
      val h2 = JLong.rotateLeft(h, 31) | 1L
      var i = 0
      while (i < k) {
        val idx = Math.floorMod(h + i.toLong * h2, m)
        if (((bits.getLong((idx >>> 6).toInt) >>> (idx & 63L)) & 1L) == 0L) return false
        i += 1
      }
      true
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (bits, h) => {
        val m = ctx.freshName("m")
        val h2 = ctx.freshName("h2")
        val i = ctx.freshName("i")
        val idx = ctx.freshName("idx")
        s"""
           |final long $m = (long) $bits.numElements() << 6;
           |final long $h2 = java.lang.Long.rotateLeft($h, 31) | 1L;
           |${ev.value} = true;
           |for (int $i = 0; $i < $k; $i++) {
           |  final long $idx = java.lang.Math.floorMod($h + (long) $i * $h2, $m);
           |  if ((($bits.getLong((int) ($idx >>> 6)) >>> ($idx & 63L)) & 1L) == 0L) {
           |    ${ev.value} = false;
           |    break;
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomMightContain =
      copy(left = newLeft, right = newRight)
  }

  /** Column form: membership probe of `hash` against `bits`. */
  def mightContain(bits: Column, hash: Column, k: Int): Column =
    ColumnGlue.column(BloomMightContain(
      ColumnGlue.expression(bits), ColumnGlue.expression(hash), k))
}
