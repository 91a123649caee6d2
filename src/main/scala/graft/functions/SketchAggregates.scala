package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sketch aggregates (SURVEY §2.L: custom `TypedImperativeAggregate`
  * — not needed for the reference surface, used as the fast path for the
  * §2.K extensions). The column-wise formulations (64 separate min()/sum()
  * aggregates) allocate 64 agg buffers and re-evaluate a hash expression
  * per slot; these keep one primitive-array buffer per group and hash once
  * per input.
  *
  * Hash contract ([[NeutralHash]]): slot i's hash of shingle s is
  * `lower64(s) + i * upper64(s)` (two-hash Carter-Wegman over ONE md5
  * digest, natural 64-bit wrap-around), compared UNSIGNED. An external
  * engine replays it as
  * `(md5_number_lower(s)::HUGEINT + i * md5_number_upper(s)::HUGEINT)
  *  % 2^64` — which is how the DuckDB oracle for q_dedup_minhash verifies
  * the whole sketch, not just its row count. */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_agg needs a string input, got ${other.sql}")
    }

  // "empty" slot = unsigned max (all slots compare unsigned)
  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(-1L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // one md5 per shingle; slot hashes derive arithmetically
      val (lo, hi) = NeutralHash.both64(v.asInstanceOf[UTF8String])
      var h = lo
      var i = 0
      while (i < numHashes) {
        if (java.lang.Long.compareUnsigned(h, buf(i)) < 0) buf(i) = h
        h += hi // slot i+1 = lo + (i+1)*hi, 64-bit wrap
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (java.lang.Long.compareUnsigned(b(i), a(i)) < 0) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

/** SimHash bit-vote accumulator: buffer = 64 signed counters updated from
  * one [[NeutralHash.lower64]] (md5) per input word; eval packs the sign
  * bits into the long signature. Identical to 64
  * `sum(when(bit set, 1, -1))` columns over `md5_number_lower(w)` — which
  * is how the DuckDB oracle for q_dedup_simhash replays it. */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash_agg needs a string input, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = NeutralHash.lower64(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) != 0L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

/** Bounded min-heap buffer for [[TopKAgg]]: root = the WORST kept element,
  * so a better candidate replaces the root in O(log k). Rank order:
  * higher score wins, ties broken by smaller id (the window formulation's
  * `ORDER BY score DESC, id ASC`). */
final class TopKBuffer(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true when (s1,i1) ranks BELOW (s2,i2). */
  @inline private def below(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size; scores(i) = s; ids(i) = id; size += 1
      // sift up: the heap keeps every parent ranked below (worse than) its
      // children, so a new leaf that ranks below its parent bubbles up
      while (i > 0 && below(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (below(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var worst = i
        if (l < size && below(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < size && below(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == i) done = true else { swap(i, worst); i = worst }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** (score desc, id asc) — the emit order. */
  def sortedPairs: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortBy { case (s, id) => (-s, id) }
}

/** Per-group top-k as ONE bounded-buffer aggregate instead of a window
  * sort: `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` must
  * shuffle and fully SORT every group; this keeps a k-element heap per
  * group with map-side partial aggregation, so the shuffle carries at most
  * k rows per group per mapper and nothing is ever sorted but the final k.
  * The 100 TB difference: top-3-per-customer over 10^10 rows shuffles
  * ~3·groups rows instead of 10^10, and no executor materializes a full
  * group. Emits `array<struct<score double, id long>>` in rank order. */
case class TopKAgg(
    scoreChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreChild, idChild)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (scoreChild.dataType != org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg score must be double (cast it), got ${scoreChild.dataType.sql}")
    else if (idChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg id must be bigint, got ${idChild.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreChild.eval(input)
    val id = idChild.eval(input)
    if (s != null && id != null)
      buf.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreChild = newChildren(0), idChild = newChildren(1))
}

/** KMV (k-minimum-values) distinct-count sketch over the neutral md5
  * hash — the ENGINE-NEUTRAL alternative to HLL approx_count_distinct:
  * because the k smallest distinct hash values are a deterministic
  * function of the input set, an external SQL engine replays the whole
  * estimate (DuckDB: the k-th smallest DISTINCT `md5_number_lower`, then
  * `(k-1) * 2^64 / kth`), which no engine-specific HLL register layout
  * allows. Estimator (Bar-Yossef et al. 2002): with fewer than k
  * distinct hashes seen the sketch IS exact (estimate = size); past it,
  * est = (k-1) * 2^64 / unsigned(kth-min). The k-th min converts to
  * double by ONE correctly-rounded step (BigDecimal), matching the
  * external engine's single u64→double conversion bit-for-bit.
  *
  * Buffer = size-k max-at-root heap of UNSIGNED longs holding the k
  * smallest distinct hashes; one md5 per row, O(log k) on the rare
  * sub-root insert, O(k) duplicate scan only for candidate inserts.
  * Map-side partial aggregation merges heaps. */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct needs a string input, got ${other.sql}")
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(NeutralHash.lower64(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.hashes(i)); i += 1 }
    a
  }

  override def eval(buf: KmvBuffer): Any =
    if (buf.size < buf.k) buf.size.toDouble
    else {
      // kth-min as unsigned, converted in ONE correctly-rounded step
      val u = new java.math.BigDecimal(
        java.lang.Long.toUnsignedString(buf.kthMin)).doubleValue()
      (buf.k - 1).toDouble * 18446744073709551616.0 / u
    }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 8)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hashes(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val buf = new KmvBuffer(kk)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren.head)
}

/** KMV sketch VALUE aggregate — same buffer discipline as
  * [[KmvDistinctAgg]] but eval returns the sketch itself (the k smallest
  * distinct unsigned md5 hashes, ascending, as DECIMAL(20,0)) instead of
  * collapsing it to one estimate. The point is SET ALGEBRA: KMV sketches
  * are mergeable and composable (Beyer et al., SIGMOD 2007) — the k
  * smallest of the union of two sketches is a valid sketch of the union,
  * and the fraction of that merged sketch present in both sides estimates
  * the Jaccard coefficient, so union / intersection cardinalities between
  * segments ship as k·16-byte rows, never re-scanning either side.
  * DECIMAL(20,0) (not LongType) so the unsigned ordering survives into
  * plain `array_sort` / comparison semantics on the SQL surface AND an
  * external engine's `md5_number_lower` (a UBIGINT/HUGEINT) compares
  * identically — the same engine-neutrality argument as [[KmvDistinctAgg]].
  * Scale: one corpus scan builds every segment's sketch with map-side
  * partial merge; all pairwise set arithmetic happens on k-sized arrays. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  private val elemType = org.apache.spark.sql.types.DecimalType(20, 0)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elemType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch needs a string input, got ${other.sql}")
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(NeutralHash.lower64(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.hashes(i)); i += 1 }
    a
  }

  override def eval(buf: KmvBuffer): Any = {
    val vs = java.util.Arrays.copyOf(buf.hashes, buf.size)
    // ascending UNSIGNED: flip the sign bit, sort signed, values decode
    // back on conversion (toUnsignedString reads the raw bits)
    val flipped = vs.map(_ ^ Long.MinValue).sorted
    new GenericArrayData(flipped.map { f =>
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(
          java.lang.Long.toUnsignedString(f ^ Long.MinValue)), 20, 0)
    })
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 8)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.hashes(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val buf = new KmvBuffer(kk)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

/** Max-at-root heap of the k smallest DISTINCT unsigned longs. */
final class KmvBuffer(val k: Int) extends Serializable {
  val hashes = new Array[Long](k)
  var size = 0

  @inline private def gtU(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) > 0

  def kthMin: Long = hashes(0) // root = largest kept = k-th smallest

  def add(h: Long): Unit = {
    if (size < k) {
      // linear duplicate scan — the buffer is small and warmup-only
      var i = 0
      while (i < size) { if (hashes(i) == h) return; i += 1 }
      hashes(size) = h; size += 1
      var c = size - 1
      while (c > 0 && gtU(hashes(c), hashes((c - 1) / 2))) {
        val t = hashes(c); hashes(c) = hashes((c - 1) / 2); hashes((c - 1) / 2) = t
        c = (c - 1) / 2
      }
    } else if (gtU(hashes(0), h)) {
      var i = 0
      while (i < size) { if (hashes(i) == h) return; i += 1 }
      hashes(0) = h
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = 2 * c + 2
        var big = c
        if (l < size && gtU(hashes(l), hashes(big))) big = l
        if (r < size && gtU(hashes(r), hashes(big))) big = r
        if (big == c) done = true
        else { val t = hashes(c); hashes(c) = hashes(big); hashes(big) = t; c = big }
      }
    }
  }
}

object SketchAggregates {
  def minhashAgg(shingle: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashAgg(GraftSqlBridge.expression(shingle), numHashes)
        .toAggregateExpression())

  def simhashAgg(word: Column): Column =
    GraftSqlBridge.column(
      SimHashAgg(GraftSqlBridge.expression(word)).toAggregateExpression())

  /** Per-group top-k by (score desc, id asc): `topKAgg(score, id, 3)`. */
  def topKAgg(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(score), GraftSqlBridge.expression(id), k)
        .toAggregateExpression())

  /** Engine-neutral approximate distinct count (KMV over md5). */
  def kmvDistinct(value: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvDistinctAgg(GraftSqlBridge.expression(value), k)
        .toAggregateExpression())

  /** The KMV sketch itself (k smallest distinct md5 hashes, ascending,
    * DECIMAL(20,0)) — the mergeable form for cross-segment set algebra. */
  def kmvSketch(value: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvSketchAgg(GraftSqlBridge.expression(value), k)
        .toAggregateExpression())
}
