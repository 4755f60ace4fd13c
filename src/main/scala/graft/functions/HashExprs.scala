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

  /** Every n-gram span's 60-bit md5-prefix hash of a token array in ONE
    * call — the decontamination/span-dedup hot loop (t23/t25/t32/t44)
    * without materializing a single n-gram STRING: for each window of n
    * tokens the digest is fed the tokens' UTF-8 bytes joined by single
    * spaces (identical bytes to md5(array_join(slice(toks,i,n), ' '));
    * null elements are skipped with their separator, array_join's
    * documented rule), and the first 15 hex digits are returned as an
    * unsigned 60-bit long — value-equivalent to
    * `conv(substring(md5(span), 1, 15), 16, 10) :: long`
    * (byte-equivalence spec-checked in HashExprsSpec). Fewer than n
    * tokens yields an empty array, matching wordNgrams.
    */
  def spanHashes60(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements() - n + 1
    val out = if (cnt <= 0) Array.empty[Long] else new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val md = digest.get(); md.reset()
      var first = true
      var j = 0
      while (j < n) {
        val s = arr.getUTF8String(i + j)
        if (s != null) {
          if (!first) md.update(' '.toByte)
          md.update(s.getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The whole k-seed MinHash SIGNATURE from the raw TOKEN array in one
    * call: each n-gram shingle's bytes are assembled ONCE (tokens
    * joined by single spaces — array_join's byte stream, nulls skipped
    * with their separator) and digested k times under the k seed
    * prefixes ("s0".."s{k-1}"), tracking the lexicographic hex minimum
    * per seed. Value-identical to k independent
    * `TextOps.minhash(wordNgrams(toks, n), seed)` columns
    * (HashExprsSpec pins it) but with no interpreted shingle lambda, no
    * shingle-string materialization, and one token-array scan instead
    * of k. Fewer than n tokens (no shingles) yields all-null elements,
    * matching array_min over an empty transform.
    */
  def minhashSig(arr: ArrayData, n: Int, k: Int): ArrayData = {
    val cnt = arr.numElements() - n + 1
    val mins = new Array[String](k)
    if (cnt > 0) {
      val md = digest.get()
      val prefixes = Array.tabulate(k)(s => s"s$s".getBytes("UTF-8"))
      var i = 0
      while (i < cnt) {
        var len = 0; var m = 0; var j = 0
        while (j < n) {
          val s = arr.getUTF8String(i + j)
          if (s != null) { len += s.numBytes() + (if (m > 0) 1 else 0); m += 1 }
          j += 1
        }
        val buf = new Array[Byte](len)
        var off = 0; var first = true; j = 0
        while (j < n) {
          val s = arr.getUTF8String(i + j)
          if (s != null) {
            if (!first) { buf(off) = ' '; off += 1 }
            val b = s.getBytes
            System.arraycopy(b, 0, buf, off, b.length); off += b.length
            first = false
          }
          j += 1
        }
        var seed = 0
        while (seed < k) {
          md.reset()
          md.update(prefixes(seed))
          md.update(buf)
          val h = hex(md.digest())
          if (mins(seed) == null || h.compareTo(mins(seed)) < 0) mins(seed) = h
          seed += 1
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(m => if (m == null) null else UTF8String.fromString(m))
        .asInstanceOf[Array[Any]])
  }

  /** All character trigrams of a string in one call — CHAR-indexed
    * (UTF8String.substring), value-identical to
    * `transform(sequence(1, length(s) - 2), i -> substr(s, i, 3))`
    * with the under-3-chars empty-array guard folded in.
    */
  def charTrigrams(s: UTF8String): ArrayData = {
    val n = s.numChars()
    val cnt = if (n < 3) 0 else n - 2
    val out = new Array[Any](cnt)
    var i = 0
    while (i < cnt) { out(i) = s.substring(i, i + 3); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

case class SpanHashes60(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.spanHashes60(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.spanHashes60($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): SpanHashes60 =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.minhashSig(input.asInstanceOf[ArrayData], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.minhashSig($c, $n, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashAlgos.charTrigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.charTrigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
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
  /** Codegen'd n-gram 60-bit span hashes of a token array — see
    * [[HashAlgos.spanHashes60]].
    */
  def spanHashes60(tokens: Column, n: Int): Column =
    toCol(SpanHashes60(toExpr(tokens), n))
  /** Codegen'd char-trigram array — see [[HashAlgos.charTrigrams]];
    * NULL input propagates NULL (wrap in coalesce for the empty-array
    * convention).
    */
  def charTrigrams(text: Column): Column =
    toCol(CharTrigrams(toExpr(text)))
  /** `true` iff `key` MIGHT be in `bloom` (built over integral values, e.g.
    * `df.stat.bloomFilter`); `false` is definite absence. Integral keys are
    * widened to long to match the filter's `putLong` domain.
    */
  def bloomMightContain(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    toCol(BloomMightContainLong(toExpr(key.cast("long")), bos.toByteArray))
  }
  /** Distributed Bloom BUILD aggregate over a long key — serialized
    * filter bytes per group (see [[BloomBuild]]).
    */
  def bloomBuild(key: Column, expectedItems: Long, fpp: Double): Column =
    toCol(BloomBuild(toExpr(key.cast("long")), expectedItems, fpp)
      .toAggregateExpression())
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
  /** The full k-seed signature from raw TOKENS in one codegen call (see
    * [[HashAlgos.minhashSig]]): one shingle-byte assembly per n-gram, k
    * digests, no interpreted lambda. Materialize it as a column and
    * slice bands with [[lshBandsFromSig]] so it computes once per row.
    */
  def minhashSigArr(tokens: Column, n: Int, k: Int): Column =
    toCol(MinHashSig(toExpr(tokens), n, k))
  /** [[lshBands]] over a MATERIALIZED [[minhashSigArr]] column — same
    * band values and null propagation (a null component nulls the
    * band) as the per-seed form.
    */
  def lshBandsFromSig(sig: Column, k: Int, rowsPerBand: Int): Seq[Column] = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    import org.apache.spark.sql.functions.{concat, element_at, lit}
    (0 until k / rowsPerBand).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1))
      concat(parts.flatMap(p => Seq(p, lit("|"))).dropRight(1): _*).as(s"band$b")
    }
  }
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
