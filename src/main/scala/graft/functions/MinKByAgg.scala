package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded max-heap of full rows for [[MinKByAgg]]: keeps the k SMALLEST
  * rows under `cmp`; the heap root ranks last among the kept rows, so a
  * candidate that beats the root replaces it in O(log k) and every other
  * candidate is rejected after one comparison. Rows stored here must
  * already be defensive copies — the heap holds them across input rows. */
final class MinKRowBuffer(val k: Int, cmp: Ordering[InternalRow]) {
  val rows = new Array[InternalRow](k)
  var size = 0

  /** One-comparison admission test on a row that is NOT yet copied. */
  @inline def wouldAdd(row: InternalRow): Boolean =
    size < k || cmp.compare(row, rows(0)) < 0

  @inline private def swap(a: Int, b: Int): Unit = {
    val t = rows(a); rows(a) = rows(b); rows(b) = t
  }

  def add(row: InternalRow): Unit = {
    if (size < k) {
      rows(size) = row
      var i = size; size += 1
      while (i > 0 && cmp.compare(rows(i), rows((i - 1) / 2)) > 0) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (cmp.compare(row, rows(0)) < 0) {
      rows(0) = row
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var big = i
        if (l < size && cmp.compare(rows(l), rows(big)) > 0) big = l
        if (r < size && cmp.compare(rows(r), rows(big)) > 0) big = r
        if (big == i) done = true else { swap(i, big); i = big }
      }
    }
  }

  /** Kept rows in ascending `cmp` order — the emit order. */
  def sortedRows: Array[InternalRow] = {
    val out = new Array[InternalRow](size)
    System.arraycopy(rows, 0, out, 0, size)
    java.util.Arrays.sort(out, cmp)
    out
  }
}

/** Per-group "first k rows by an ordering, carrying an arbitrary payload"
  * as ONE bounded-heap aggregate — the generalization of [[TopKAgg]] from
  * (double, long) to struct-typed sort key and payload.
  *
  * The window formulation
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * must shuffle EVERY candidate row to its group's reducer and sort the
  * whole group before discarding all but k. This keeps a k-element heap
  * per group with map-side partial aggregation, so the shuffle carries at
  * most k rows per group per mapper and nothing is ever sorted but the
  * final k. The 100 TB difference is the capped range join
  * ([[graft.operators.RangeJoin.binnedRangeJoinCapped]]): the candidate
  * pair set grows ~n²·window/span (1.39 G pairs at sf5 — BASELINE.md) while
  * the capped output is k·|left|; the window shuffled all pairs, the heap
  * shuffles ≤ k per left key per mapper.
  *
  * Child is `struct(o: struct<...>, p: struct<...>)`: `o` is the sort key
  * (compared ascending, field order significant, nulls first — exactly the
  * window's multi-column `ORDER BY o.* ASC` contract, so an external SQL
  * engine replays the selection with that window), `p` the payload emitted
  * as `array<struct>` in ascending `o` order. Ties in `o` beyond k are
  * broken arbitrarily — callers wanting full determinism make `o` a total
  * order (the capped range join folds every right column into it).
  *
  * `wholeRow = true` is the fused form for the common "sort key IS the
  * payload" case ([[MinKByAgg.minKRowsAgg]]): the child is ONE struct
  * compared field-by-field ascending and emitted as-is. The pair form
  * evaluates two CreateStructs per candidate row and stores both in the
  * heap; at millions of candidate rows per task (the capped range join's
  * regime) the fused form halves per-row construction, comparison
  * indirection, and buffer bytes.
  */
case class MinKByAgg(
    child: Expression,
    k: Int,
    wholeRow: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKRowBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  @transient private lazy val childType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val ordType =
    if (wholeRow) childType else childType(0).dataType.asInstanceOf[StructType]
  @transient private lazy val payloadType =
    if (wholeRow) childType else childType(1).dataType.asInstanceOf[StructType]
  @transient private lazy val ordOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ordType)
  @transient private lazy val rowCmp: Ordering[InternalRow] =
    if (wholeRow) new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ordOrdering.compare(a, b)
    } else new Ordering[InternalRow] {
      private val n = ordType.length
      override def compare(a: InternalRow, b: InternalRow): Int =
        ordOrdering.compare(a.getStruct(0, n), b.getStruct(0, n))
    }
  @transient private lazy val serProj = UnsafeProjection.create(childType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if wholeRow =>
      if (RowOrdering.isOrderable(s)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"min_k_rows_agg row struct is not orderable: ${s.sql}")
    case s: StructType if s.length == 2 =>
      (s(0).dataType, s(1).dataType) match {
        case (o: StructType, _: StructType) if RowOrdering.isOrderable(o) =>
          TypeCheckResult.TypeCheckSuccess
        case (o: StructType, _: StructType) =>
          TypeCheckResult.TypeCheckFailure(
            s"min_k_by_agg sort key is not orderable: ${o.sql}")
        case _ =>
          TypeCheckResult.TypeCheckFailure(
            "min_k_by_agg child must be struct(o: struct, p: struct), got " +
              s.sql)
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_k_by_agg child must be struct(o: struct, p: struct), got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(payloadType, containsNull = false)

  override def createAggregationBuffer(): MinKRowBuffer =
    new MinKRowBuffer(k, rowCmp)

  override def update(buf: MinKRowBuffer, input: InternalRow): MinKRowBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // admission-test BEFORE the defensive copy: past capacity, the
      // common case is rejection after one struct comparison, zero alloc
      if (buf.wouldAdd(row)) buf.add(row.copy())
    }
    buf
  }

  override def merge(a: MinKRowBuffer, b: MinKRowBuffer): MinKRowBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.rows(i)); i += 1 }
    a
  }

  override def eval(buf: MinKRowBuffer): Any = {
    if (wholeRow) {
      new GenericArrayData(buf.sortedRows.map(r => r.copy(): Any))
    } else {
      val n = payloadType.length
      new GenericArrayData(
        buf.sortedRows.map(r => r.getStruct(1, n).copy(): Any))
    }
  }

  override def serialize(buf: MinKRowBuffer): Array[Byte] = {
    val recs = new Array[Array[Byte]](buf.size)
    var total = 8
    var i = 0
    while (i < buf.size) {
      val u = serProj(buf.rows(i))
      recs(i) = java.util.Arrays.copyOf(u.getBytes, u.getSizeInBytes)
      total += 4 + recs(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.k); bb.putInt(buf.size)
    i = 0
    while (i < buf.size) { bb.putInt(recs(i).length); bb.put(recs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKRowBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt; val n = bb.getInt
    val buf = new MinKRowBuffer(kk, rowCmp)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(childType.length)
      row.pointTo(arr, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKByAgg =
    copy(child = newChildren.head)
}

object MinKByAgg {
  /** Per-group first-k: `array<struct p>` of the k smallest `ord` structs,
    * ascending. `ord` fields compare in declaration order, nulls first —
    * the semantics of `row_number() OVER (ORDER BY ord.* ASC) <= k`. */
  def minKByAgg(ord: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(
      MinKByAgg(
        GraftSqlBridge.expression(struct(ord.as("o"), payload.as("p"))), k)
        .toAggregateExpression())

  /** Fused form: the k smallest ROWS under the row struct's own
    * field-by-field ascending order, emitted as-is — one CreateStruct
    * per candidate row instead of the pair form's two, for the hot
    * "sort key is the payload" case. */
  def minKRowsAgg(row: Column, k: Int): Column =
    GraftSqlBridge.column(
      MinKByAgg(GraftSqlBridge.expression(row), k, wholeRow = true)
        .toAggregateExpression())
}
