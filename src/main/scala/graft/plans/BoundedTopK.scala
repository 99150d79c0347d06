package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortDirection, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k as a [[TypedImperativeAggregate]].
  *
  * `child` is a struct of the retained row (payload, plus any computed
  * sort keys as leading fields); the buffer keeps at most `k` rows,
  * ordered by the `sortOrdinals` fields under the given directions.
  * `eval` emits the survivors best-first as an `array<struct>`.
  *
  * This is the aggregation form of `filter(row_number() over w <= k)`: a
  * Window must sort every group in full — at 100 TB that is a total
  * shuffle-sort of the table — while this aggregate is O(n log k) per
  * partition with map-side partial combine (only ≤k rows per group cross
  * the wire). [[RewriteRankFilterToTopK]] rewrites eligible Window plans
  * onto it automatically.
  *
  * Hot-path design: once the heap is full, the overwhelmingly common case
  * is rejection, so `update` first evaluates only the bare sort-key
  * expressions (`keyExprs`, bound to the input row) and compares them
  * against the current worst row through per-key monomorphic orderings —
  * no struct is built and nothing is copied unless the row is accepted.
  * Sort keys that are plain payload columns are addressed by ordinal
  * rather than duplicated into extra struct fields, so the serialized
  * partial buffers stay as narrow as the input rows.
  *
  * Reference anchor: the curated-flow "first row per group" and top-k
  * idioms (`/root/reference/code/04_fts_curated_flows.R:87-88`,
  * `code/10_global_cva_analysis.R:305-324`) — same semantics, bounded
  * memory.
  *
  * @param keyExprs     the window's sort-key expressions over the input
  *                     row, 1:1 with `sortOrdinals`.
  * @param sortOrdinals struct-field ordinal of each sort key.
  * @param directions   per sort key: (ascending?, nullsFirst?) matching
  *                     the window's `SortOrder`s.
  */
case class BoundedTopK(
    child: Expression,
    keyExprs: Seq[Expression],
    k: Int,
    sortOrdinals: Seq[Int],
    directions: Seq[(Boolean, Boolean)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  require(k >= 1, s"k must be >= 1, got $k")
  require(sortOrdinals.length == directions.length)
  require(keyExprs.length == directions.length)

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** Best-first ordering over the sort-key fields (heap + merge path). */
  @transient private lazy val ordering: Ordering[InternalRow] = {
    val sortOrders = directions.zip(sortOrdinals).map { case ((asc, nullsFirst), i) =>
      val field = structType(i)
      val dir: SortDirection = if (asc) Ascending else Descending
      val nulls = if (nullsFirst) NullsFirst else NullsLast
      SortOrder(BoundReference(i, field.dataType, field.nullable), dir, nulls, Seq.empty)
    }
    new InterpretedOrdering(sortOrders)
  }

  /** Per-key value orderings, resolved once (reject fast path). */
  @transient private lazy val keyOrderings: Array[Ordering[Any]] =
    sortOrdinals.map(i => TypeUtils.getInterpretedOrdering(structType(i).dataType)).toArray
  @transient private lazy val keyArr: Array[Expression] = keyExprs.toArray
  @transient private lazy val ordArr: Array[Int] = sortOrdinals.toArray
  @transient private lazy val dirArr: Array[(Boolean, Boolean)] = directions.toArray

  /** Does the input row sort strictly before the buffer's worst row?
    * Mirrors [[InterpretedOrdering]]: null ordering is direction-
    * independent; non-null comparisons flip under Descending. */
  private def inputBeatsWorst(input: InternalRow, worst: InternalRow): Boolean = {
    var i = 0
    while (i < keyArr.length) {
      val a = keyArr(i).eval(input)
      val field = structType(ordArr(i))
      val b = if (worst.isNullAt(ordArr(i))) null else worst.get(ordArr(i), field.dataType)
      val (asc, nullsFirst) = dirArr(i)
      val c =
        if (a == null && b == null) 0
        else if (a == null) { if (nullsFirst) -1 else 1 }
        else if (b == null) { if (nullsFirst) 1 else -1 }
        else {
          val raw = keyOrderings(i).compare(a, b)
          if (asc) raw else -raw
        }
      if (c != 0) return c < 0
      i += 1
    }
    false // ties keep the incumbent — row_number's arbitrary tie order
  }

  /** Deep-copies a struct value out of whatever reused buffer produced it
    * (vectorized parquet vectors, unsafe rows) before it outlives the
    * current input row. */
  @transient private lazy val toUnsafe: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    // head = WORST surviving row, so a full buffer evicts in O(log k)
    new java.util.PriorityQueue[InternalRow](k, ordering.reverse)

  override def update(
      buf: java.util.PriorityQueue[InternalRow],
      input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    // row_number() counts every row, including all-null sort keys
    if (buf.size < k) {
      buf.add(toUnsafe(child.eval(input).asInstanceOf[InternalRow]).copy())
    } else if (inputBeatsWorst(input, buf.peek())) {
      buf.poll()
      buf.add(toUnsafe(child.eval(input).asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[InternalRow],
      other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    // rows in `other` are already standalone copies (update/deserialize)
    val it = other.iterator()
    while (it.hasNext) {
      val row = it.next()
      if (buf.size < k) { buf.add(row) }
      else if (ordering.lt(row, buf.peek())) { buf.poll(); buf.add(row) }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size)
    // drain worst-first, fill back-to-front → array is best-first
    var i = arr.length - 1
    while (i >= 0) { arr(i) = buf.poll(); i -= 1 }
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val bytes = toUnsafe(it.next()).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, size)
      buf.add(row) // deserialized buffers hold ≤ k rows already
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child +: keyExprs
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head, keyExprs = newChildren.tail)
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bounded_top_k"
}
