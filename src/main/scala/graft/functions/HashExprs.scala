package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot dedup hashes. The builtin
  * compositions in graft.text.TextOps (array aggregate/transform lambdas)
  * are portable but run interpreted — higher-order functions have no
  * codegen. These expressions compute the IDENTICAL values (byte-for-byte
  * the same md5-hex algorithms, verified by HashExprsSpec against the
  * builtin forms) in one JVM call per row inside whole-stage codegen —
  * the difference between interpreter-bound and scan-bound at 100 TB.
  */
object HashAlgos {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf); out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 32-bit SimHash: one +1/−1 vote per md5 hex nibble's high bit —
    * exactly TextOps.simhash32's semantics.
    */
  def simhash32(arr: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val md = digest.get(); md.reset()
        val d = md.digest(s.getBytes)
        var j = 0
        while (j < 32) {
          val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
          votes(j) += (if ((nib & 8) != 0) 1 else -1)
          j += 1
        }
      } else {
        // match the builtin form exactly: md5(NULL) propagates NULL into
        // the when(...).otherwise(-1) branch, i.e. a NULL token votes -1
        // on all 32 bits (byte-equivalence is spec-checked).
        var j = 0
        while (j < 32) { votes(j) -= 1; j += 1 }
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) h |= 1L << j; j += 1 }
    h
  }

  /** 64-bit SimHash: TWO votes per md5 hex nibble (bits 8 and 4), so the
    * 32 nibbles yield 64 independent votes. The wider hash exists for
    * BLOCK-SPACE, not precision: pigeonhole blocking on a 32-bit hash has
    * only 2^8 values per 4-way block, so bucket occupancy — and the
    * within-bucket O(occupancy²) candidate join — grows linearly with the
    * corpus (measured superlinear wall-clock past ~10k docs, see
    * docs/SCALING.md); 16-bit blocks give 2^16 values per block and push
    * the same saturation out by 256×.
    */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val md = digest.get(); md.reset()
        val d = md.digest(s.getBytes)
        var j = 0
        while (j < 64) {
          val k = j >> 1
          val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
          val mask = if ((j & 1) == 0) 8 else 4
          votes(j) += (if ((nib & mask) != 0) 1 else -1)
          j += 1
        }
      } else {
        var j = 0
        while (j < 64) { votes(j) -= 1; j += 1 }
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) h |= 1L << j; j += 1 }
    h
  }

  /** MinHash component: lexicographic min of md5(prefix‖shingle) hex —
    * exactly TextOps.minhash's semantics. Null for empty/all-null input.
    */
  def minhash(arr: ArrayData, prefix: UTF8String): UTF8String = {
    val n = arr.numElements()
    val pb = prefix.getBytes
    var min: String = null
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val md = digest.get(); md.reset()
        md.update(pb)
        val h = hex(md.digest(s.getBytes))
        if (min == null || h.compareTo(min) < 0) min = h
      }
      i += 1
    }
    if (min == null) null else UTF8String.fromString(min)
  }
}

case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.simhash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class MinHash(child: Expression, seed: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  private lazy val prefix = UTF8String.fromString(s"s$seed")
  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.minhash(input.asInstanceOf[ArrayData], prefix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("prefix", prefix, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.HashAlgos.minhash($c, $p);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHash =
    copy(child = newChild)
}

/** Column-level entry points for the native expressions. */
object native {
  import org.apache.spark.sql.graft.bridge
  private def toCol(e: Expression): Column = bridge.column(e)
  private def toExpr(c: Column): Expression = bridge.expression(c)
  def simhash32(tokens: Column): Column = toCol(SimHash32(toExpr(tokens)))
  def simhash64(tokens: Column): Column = toCol(SimHash64(toExpr(tokens)))
  /** Codegen'd Σ a(i)·b(i) over two array<double> columns — identical
    * values and null semantics to `aggregate(zip_with(a, b, _*_), 0.0, _+_)`.
    */
  def dotD(a: Column, b: Column): Column = toCol(DotProductD(toExpr(a), toExpr(b)))
  /** Codegen'd Σ (a(i)−b(i))² — the cell-distance kernel. */
  def dist2D(a: Column, b: Column): Column = toCol(L2Dist2D(toExpr(a), toExpr(b)))
  def minhash(shingles: Column, seed: Int): Column = toCol(MinHash(toExpr(shingles), seed))
  /** `true` iff `key` MIGHT be in `bloom` (built over integral values, e.g.
    * `df.stat.bloomFilter`); `false` is definite absence. Integral keys are
    * widened to long to match the filter's `putLong` domain.
    */
  def bloomMightContain(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    toCol(BloomMightContainLong(toExpr(key.cast("long")), bos.toByteArray))
  }
  /** Codegen'd sign-mask pack: bit j of the result ⇔ vec[start+j] > 0
    * (null/out-of-range element ⇒ 0; NULL array ⇒ NULL). One JVM loop
    * per row vs 32 chained `when(element_at…)`s.
    */
  def packSigns(vec: Column, start: Int, len: Int): Column =
    toCol(PackSignBits(toExpr(vec), start, len))
  /** Bounded top-k aggregate: the k smallest values of `c` (struct ⇒
    * lexicographic) as an ascending array; O(k) state per task × key.
    */
  def topK(c: Column, k: Int): Column =
    toCol(TopK(toExpr(c), k).toAggregateExpression())
  def minhashSignature(shingles: Column, k: Int): Seq[Column] =
    (0 until k).map(s => minhash(shingles, s).as(s"mh$s"))
  /** yyyyMMdd int → DATE, NULL on any invalid value (see [[YyyymmddToDate]]). */
  def yyyymmddToDate(c: Column): Column = toCol(YyyymmddToDate(toExpr(c.cast("int"))))
  // NULL components (empty shingle set) null the whole band — `concat`
  // propagation, matching TextOps.lshBands and ANSI `||`; a NULL band
  // never equijoins, so short docs can't form a hot bucket.
  def lshBands(shingles: Column, k: Int, rowsPerBand: Int): Seq[Column] = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    import org.apache.spark.sql.functions.{concat, lit}
    (0 until k / rowsPerBand).map { b =>
      val parts = (0 until rowsPerBand).map(r => minhash(shingles, b * rowsPerBand + r))
      concat(parts.flatMap(p => Seq(p, lit("|"))).dropRight(1): _*).as(s"band$b")
    }
  }
}
