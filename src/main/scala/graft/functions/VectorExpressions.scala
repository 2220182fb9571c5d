package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, DoubleType}

/** Native Catalyst vector kernels with whole-stage codegen — the hot path of
  * similarity search. Spark's higher-order functions (`zip_with` +
  * `aggregate`) express the same math but evaluate interpreted, with a
  * closure call and boxed accumulator per element; these emit a tight
  * primitive loop into the generated stage instead (~10× on 64-dim arrays).
  *
  * Numerics are IDENTICAL to the HOF formulation and the DuckDB oracle:
  * ascending-index left fold in double for every accumulator, final
  * `dot / sqrt(na * nb)` — so swapping them in changes no query result bit.
  *
  * Null/length semantics match `zip_with`-based code on well-formed input:
  * null array → null result; mismatched lengths → null (zip_with would pad
  * with nulls and poison the sum to null); array elements must be non-null.
  */
object VectorExpressions {

  private def checkVecInputs(children: Expression*): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected ARRAY<DOUBLE> inputs, got ${children.map(_.dataType).mkString(", ")}")

  /** Σ aᵢ·bᵢ over two ARRAY<DOUBLE> columns. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(left, right)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var dot = 0.0
        var i = 0
        while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
        dot
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $acc += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ aᵢ² (squared L2 norm) of an ARRAY<DOUBLE> column. */
  case class VecNorm2(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(child)

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val i = ctx.freshName("i")
        val v = ctx.freshName("v")
        s"""
           |double $acc = 0.0;
           |int $n = $a.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $a.getDouble($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Single-pass cosine similarity: dot, ‖a‖², ‖b‖² in one loop, then
    * `dot / sqrt(na*nb)` — for pair queries where norms aren't reusable. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(left, right)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = x.numElements()
      if (n != y.numElements()) null
      else {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val xv = x.getDouble(i); val yv = y.getDouble(i)
          dot += xv * yv; na += xv * xv; nb += yv * yv
          i += 1
        }
        dot / math.sqrt(na * nb)
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $x = $a.getDouble($i);
           |    double $y = $b.getDouble($i);
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |  ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Sakoe-Chiba band-1 DTW between two 8-point z-normalized windows —
    * the native codegen twin of q79c's fold-expressed DP
    * ([[graft.queries.RelationalQueries]], `sparkDtwExpr`). Arithmetic is
    * IDENTICAL to the higher-order aggregate both engines run: the same
    * 3-state recurrence
    *   lo' = d(i,i−1) + min(mid, lo)
    *   mid' = d(i,i)  + min(hi, lo', mid)
    *   hi'  = i<8 ? d(i,i+1) + min(mid', hi) : ∞
    * seeded (∞, d(1,1), d(1,2)+d(1,1)), answer = final mid. min picks one
    * operand exactly and every addition pairs the same two values, so the
    * result is BIT-identical to the interpreted fold (pinned in
    * `PropertySpec`) — swapping it in changes no oracle bit. The win is
    * evaluation strategy only: a tight primitive loop in the generated
    * stage instead of 7 interpreted named_struct constructions per pair
    * (measured ~1 ms/pair interpreted at sf0.1 — the q79c hot loop).
    * Inputs must be 8-element ARRAY<DOUBLE>; anything else → null (the
    * fold would produce garbage on ≠8 silently — null is stricter). */
  case class BandedDtw8(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(left, right)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (x.numElements() != 8 || y.numElements() != 8) null
      else {
        @inline def d(i: Int, j: Int): Double = {
          val t = x.getDouble(i - 1) - y.getDouble(j - 1); t * t
        }
        var lo = Double.PositiveInfinity
        var mid = d(1, 1)
        var hi = d(1, 2) + d(1, 1)
        var i = 2
        while (i <= 8) {
          val nlo = d(i, i - 1) + math.min(mid, lo)
          val nmid = d(i, i) + math.min(hi, math.min(nlo, mid))
          val nhi = if (i < 8) d(i, i + 1) + math.min(nmid, hi)
            else Double.PositiveInfinity
          lo = nlo; mid = nmid; hi = nhi
          i += 1
        }
        mid
      }
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (lo, mid, hi) = (ctx.freshName("lo"), ctx.freshName("mid"),
          ctx.freshName("hi"))
        val (nlo, nmid, nhi) = (ctx.freshName("nlo"), ctx.freshName("nmid"),
          ctx.freshName("nhi"))
        val (i, t) = (ctx.freshName("i"), ctx.freshName("t"))
        def d(ii: String, jj: String) =
          s"($t = $a.getDouble(($ii) - 1) - $b.getDouble(($jj) - 1)) * $t"
        s"""
           |if ($a.numElements() != 8 || $b.numElements() != 8) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $t;
           |  double $lo = Double.POSITIVE_INFINITY;
           |  double $mid = ${d("1", "1")};
           |  double $hi = (${d("1", "2")}) + (${d("1", "1")});
           |  for (int $i = 2; $i <= 8; $i++) {
           |    double $nlo = (${d(i, s"$i - 1")}) + Math.min($mid, $lo);
           |    double $nmid = (${d(i, i)})
           |      + Math.min($hi, Math.min($nlo, $mid));
           |    double $nhi = ($i < 8)
           |      ? (${d(i, s"$i + 1")}) + Math.min($nmid, $hi)
           |      : Double.POSITIVE_INFINITY;
           |    $lo = $nlo; $mid = $nmid; $hi = $nhi;
           |  }
           |  ${ev.value} = $mid;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // Column-API surface
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def vec_norm2(a: Column): Column =
    Bridge.column(VecNorm2(Bridge.expression(a)))
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def banded_dtw8(a: Column, b: Column): Column =
    Bridge.column(BandedDtw8(Bridge.expression(a), Bridge.expression(b)))
}
