package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate over a pre-built Bloom filter.
  *
  * A Scala UDF probe would break the whole-stage-codegen span around the
  * ingest filter (and box every row); this expression generates a direct
  * `mightContainBinary` call on the filter object instead, which rides to
  * executors in the codegen reference array (the task-binary broadcast) —
  * no explicit SparkContext.broadcast needed. Probing the UTF8String's
  * bytes is hash-identical to `mightContainString` (both hash the UTF-8
  * encoding), so it matches filters built by `stat.bloomFilter` on a
  * string column.
  *
  * Same preference ladder as [[VectorExpressions]]: built-ins can't
  * express a sketch probe, a custom `Expression` with `doGenCode` can.
  */
object SketchExpressions {

  case class BloomMightContain(child: Expression, bloom: BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_might_contain"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a STRING probe key, got ${child.dataType.sql}")

    override def nullSafeEval(v: Any): Any =
      bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainBinary($v.getBytes());")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
