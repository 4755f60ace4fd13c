package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a native codegen
  * expression: `bloom.mightContainLong(key)` inlined into whole-stage
  * codegen, so the probe rides the parquet scan stage — rows that cannot
  * join are dropped BEFORE the shuffle, which is the entire point of a
  * Bloom-pruned join (see [[graft.operators.Scale.bloomPruneJoin]]).
  *
  * The filter travels as its serialized bytes (the expression tree is
  * shipped to every executor with the plan) and is deserialized once per
  * JVM-side instantiation, never per row. No false negatives by Bloom
  * construction — a `false` here is PROOF the key has no match — so a
  * subsequent exact join keeps results exact regardless of the
  * false-positive rate.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter goes into the codegen references array (the
    // same pattern Spark's own runtime-filter probe uses): one object per
    // task, a bitset probe per row
    val b = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$b.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
