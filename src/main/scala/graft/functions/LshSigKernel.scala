package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Compiled multi-table sign-LSH signatures: ARRAY<DOUBLE> embedding →
  * ARRAY<BIGINT> of per-table bucket signatures, all tables × planes × dims
  * in one fused loop over a flattened literal weight matrix.
  *
  * Replaces tables×planes separate DotProduct expressions — whose generated
  * code was large enough to dominate cold-start JIT — with a single static
  * call. Same math (ascending-index double fold per plane, bit p set iff
  * dot ≥ 0), so bucket assignments are unchanged. */
object LshSigKernel {

  /** weights laid out [table][plane*dims + dim]. */
  def signatures(emb: ArrayData, weights: Array[Array[Double]], planes: Int): ArrayData = {
    val dims = emb.numElements()
    val tables = weights.length
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val w = weights(t)
      var sig = 0L
      var p = 0
      while (p < planes) {
        var d = 0.0
        val off = p * dims
        var i = 0
        while (i < dims) { d += emb.getDouble(i) * w(off + i); i += 1 }
        if (d >= 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  case class LshSigs(child: Expression, tables: Int, planes: Int, dims: Int)
      extends UnaryExpression {
    @transient private lazy val weights: Array[Array[Double]] =
      Array.tabulate(tables) { t =>
        (0 until planes).flatMap(p =>
          graft.ops.SimilarityOps.planeWeights(t * 1000 + p, dims)).toArray
      }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expected ARRAY<DOUBLE>, got $t")
    }
    override def nullSafeEval(a: Any): Any =
      signatures(a.asInstanceOf[ArrayData], weights, planes)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val wRef = ctx.addReferenceObj("lshWeights", weights, "double[][]")
        s"${ev.value} = graft.functions.LshSigKernel.signatures($a, $wRef, $planes);"
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def lsh_sigs(emb: Column, tables: Int, planes: Int, dims: Int): Column =
    Bridge.column(LshSigs(Bridge.expression(emb), tables, planes, dims))
}
