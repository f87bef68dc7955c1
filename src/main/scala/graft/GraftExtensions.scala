package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.VectorExpressions.{CosineSim, DotProduct, Norm2}

/** Optimizer rule: a self dot-product reads its array argument twice;
  * Norm2 reads it once with the same accumulation order (bit-identical
  * result). Runs in the user-provided optimizer batch, after Catalyst's
  * own rewrites.
  */
object FuseSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(l, r) if l.deterministic && l.fastEquals(r) => Norm2(l)
    }
}

/** SparkSessionExtensions entry point: registers the native vector
  * expressions as SQL functions, so `spark.sql("... graft_cosine(a, b)")`
  * plans the fused codegen'd expression — the standard way to ship custom
  * Catalyst pieces to SQL users (`--conf
  * spark.sql.extensions=graft.GraftExtensions`, or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`).
  *
  * This is SURVEY.md §7.3's escalation ladder, rung 3: compose built-ins →
  * custom Expression with doGenCode → REGISTER it session-wide. (Rung 4 —
  * custom LogicalPlan/Strategy — stays unneeded: every operator's
  * semantics fit relational plans Catalyst already optimizes.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseSelfDot)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_dot(a, b) takes two array<double> args")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_cosine(a, b) takes two array<double> args")
        CosineSim(args(0), args(1))
      }))
  }
}
