package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The composable form (`zip_with` + `aggregate`, Similarity.scala) walks
  * the arrays three times and materializes an intermediate product array
  * per row pair; these fused expressions make one pass with three scalar
  * accumulators and generate straight-line Java inside whole-stage codegen.
  * Arithmetic is the identical sequential fold, so results are
  * bit-for-bit the same as the composable form (and the DuckDB oracle).
  *
  * Preference order per SURVEY.md §7.3: compose built-ins first (done),
  * then a custom `Expression` with `doGenCode` where the hot path warrants
  * it (here), full plans/strategies only for whole-operator semantics
  * (not needed).
  */
object VectorExpressions {

  /** dot(a, b): single-pass fused multiply-add over ArrayType(Double). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** cosine(a, b) = dot / sqrt(norm2(a) * norm2(b)) in ONE pass with three
    * accumulators. Accumulation order matches the composable form exactly.
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i)
        val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / math.sqrt(na * nb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $a.getDouble($i);
           |  double $yi = $b.getDouble($i);
           |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |}
           |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** norm2(a) = Σ aᵢ² in one pass — the target of the FuseSelfDot
    * optimizer rule (DotProduct(x, x) → Norm2(x)): reads the array once
    * instead of twice, identical accumulation order → identical bits.
    */
  case class Norm2(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_norm2"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0
      var i = 0
      while (i < x.numElements()) { val xi = x.getDouble(i); s += xi * xi; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val xi = ctx.freshName("xi")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $xi = $a.getDouble($i);
           |  $s += $xi * $xi;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def dotNative(a: Column, b: Column): Column =
    GraftBridge.toColumn(DotProduct(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  def cosineNative(a: Column, b: Column): Column =
    GraftBridge.toColumn(CosineSim(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
