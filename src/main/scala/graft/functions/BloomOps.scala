package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filter, str)`: membership probe of a STRING column
  * against a pre-built [[BloomFilter]], inside whole-stage codegen.
  *
  * The use case is the 100 TB decontamination pre-filter: when the held-out
  * gram set is too large to broadcast as an exact hash relation, a
  * fixed-size bloom (built once with `df.stat.bloomFilter`, shipped to
  * executors through the expression's reference array) prunes the training
  * gram stream BEFORE the exact join. No false negatives, so an exact join
  * over the survivors returns the identical result for ANY filter
  * contents; false positives only cost pruning efficiency. This mirrors
  * Spark's own runtime row-level filtering (`BloomFilterMightContain`),
  * reimplemented here against a driver-built sketch of an arbitrary frame.
  *
  * Bytes probed are the UTF-8 bytes of the value — the same encoding
  * `stat.bloomFilter` inserts for string columns (`putString` delegates to
  * the UTF-8 `putBinary`), so probe and build agree byte-for-byte.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());"
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object BloomOps {
  def mightContain(filter: BloomFilter, c: Column): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), filter))
}
