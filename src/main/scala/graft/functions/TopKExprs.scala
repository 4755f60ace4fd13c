package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native kernels for the binarized-vector family and the bounded top-k
  * aggregate. Mirrors the reference's compression-curve intent (float →
  * int8 → 1-bit sign masks; cf. the bitpack scoring path in the reference
  * engine's vector index) as Catalyst-native, codegen'd operators.
  */
object BitAlgos {
  /** Pack `len` sign bits of `arr[start .. start+len)` into a long:
    * bit j set iff element start+j is non-null, in range, and > 0 —
    * byte-identical to the builtin composition
    * `Σ_j when(element_at(arr, start+j+1) > 0, 1L << j).otherwise(0L)`
    * (null / out-of-range element ⇒ bit 0).
    */
  def packSigns(arr: ArrayData, start: Int, len: Int, isFloat: Boolean): Long = {
    val n = arr.numElements()
    var mask = 0L
    var i = 0
    while (i < len) {
      val idx = start + i
      if (idx < n && !arr.isNullAt(idx)) {
        val pos = if (isFloat) arr.getFloat(idx) > 0f else arr.getDouble(idx) > 0d
        if (pos) mask |= (1L << i)
      }
      i += 1
    }
    mask
  }
}

/** Codegen'd sign-mask packer over array<float>/array<double>: one JVM
  * loop per row instead of 2×32 chained `when(element_at…)` branches
  * (the r10 form, which both bloated the generated method and evaluated
  * `element_at` with per-call bound checks). NULL array ⇒ NULL mask.
  */
case class PackSignBits(child: Expression, start: Int, len: Int)
    extends UnaryExpression {
  require(len >= 1 && len <= 64, s"len must be in [1,64], got $len")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"PackSignBits needs array<float|double>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    BitAlgos.packSigns(input.asInstanceOf[ArrayData], start, len, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BitAlgos.packSigns($c, $start, $len, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): PackSignBits =
    copy(child = newChild)
}

/** Bounded top-k aggregate: keeps the k SMALLEST values of `child` under
  * the type's natural (for structs: lexicographic) ordering and returns
  * them as an ascending array. This is the aggregate path for grouped
  * top-n: partial aggregation bounds every map task's state AND the
  * shuffle payload to k rows per (task × key) — unlike the
  * `row_number() OVER (PARTITION BY key)` form, which shuffles the whole
  * input and sorts each key's full partition (the 100 TB failure shape
  * when keys are few and groups are huge). Descending dimensions are the
  * caller's job: negate numeric order columns before building the struct.
  *
  * Nulls are skipped on update (a null score can't rank); merge-side
  * buffers are bounded by construction. k is driver-checked small — the
  * buffer is O(k), never O(group).
  */
case class TopK(child: Expression, k: Int,
                mutableAggBufferOffset: Int = 0,
                inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[Any]]
    with UnaryLike[Expression] {
  require(k >= 1 && k <= 10000, s"k must be in [1,10000], got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // unorderable child types (maps) must fail at ANALYSIS time as a type
  // error, not at executor runtime inside getInterpretedOrdering
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  // max-heap of the k smallest: root is the current worst survivor
  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](k + 1, ordering.reverse)

  private def offer(buf: java.util.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) buf.add(v)
    else if (ordering.lt(v, buf.peek())) { buf.poll(); buf.add(v) }
  }

  override def update(buf: java.util.PriorityQueue[Any], input: InternalRow)
      : java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copy before buffering: eval may return a view into a reused row
    if (v != null) offer(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Any],
                     other: java.util.PriorityQueue[Any])
      : java.util.PriorityQueue[Any] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr, ordering.asInstanceOf[Ordering[AnyRef]]
      .asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr)
  }

  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] =
    serProjection(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val buf = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType,
      (_, v) => if (v != null) buf.add(InternalRow.copyValue(v)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopK =
    copy(child = newChild)
  override def prettyName: String = "graft_top_k"
}
