package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{ColumnBridge, DeclaredInputTypes}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native, codegen'd Catalyst expression.
  *
  * The filter (spark-sketch's `BloomFilter`, Serializable) rides inside
  * the expression tree: it ships to executors once per stage with the
  * task binary broadcast — not per row, not per task — which is the
  * same transport Spark's own runtime row-level bloom filters use for
  * their pushed-down probe side. Evaluation fuses into whole-stage
  * codegen, so the probe adds two xxhash passes per row inside the
  * scan's generated loop, before any exchange.
  */
object BloomExprs {

  case class BloomMightContainLong(child: Expression, filter: BloomFilter)
      extends UnaryExpression with DeclaredInputTypes {
    override def dataType: DataType = BooleanType
    override def declaredInputTypes: Seq[DataType] = Seq(LongType)
    override def prettyName: String = "bloom_might_contain"

    protected override def nullSafeEval(v: Any): Any =
      filter.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
      copy(child = newChild)
  }

  /** True when `key` might be in `filter` (no false negatives). */
  def mightContainLong(key: Column, filter: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), filter))
}
