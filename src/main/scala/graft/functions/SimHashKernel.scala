package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Compiled 32-bit SimHash kernel: one pass over the token-hash array with a
  * 32-counter accumulator — bit j of the sketch is set iff more than half
  * the hashes have bit j set.
  *
  * Replaces the 32-term when/filter expression tree (each term re-scanned
  * the array interpreted — ~32×|tokens| closure dispatches per row). Math is
  * identical (`2·ones_j > m`), so the `d3`/`d5` oracles are unchanged;
  * equality with the HOF form is asserted in `DedupSpec`. */
object SimHashKernel {

  /** Static entry shared by interpreted eval and generated code. */
  def simhash32(hs: ArrayData): Long = {
    val m = hs.numElements()
    val cnt = new Array[Int](32)
    var i = 0
    while (i < m) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 32) {
        cnt(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 32) {
      if (2 * cnt(j) > m) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  case class SimHash32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<BIGINT>, got $t")
    }
    override def nullSafeEval(a: Any): Any =
      simhash32(a.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.SimHashKernel.simhash32($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhash_32(hs: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(hs)))
}
