package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Buffer for [[BoundedTopKDoubles]]: a flat primitive max-heap of the k
  * best doubles (root = worst survivor) plus a null tally capped at k —
  * row_number never needs more than k of the all-tying nulls. 8 bytes per
  * buffered value, no per-row objects: ~30× lighter than the generic
  * [[BoundedTopK]]'s UnsafeRow queue, which is what lets the rewrite's
  * memory gate admit sketch-sized k (e.g. KMV k=256) without opening the
  * OOM vector the row-count gate exists to close. */
final class DoubleTopK(val k: Int) {
  val heap = new Array[Double](k)
  var size = 0
  var nulls = 0
}

/** [[BoundedTopK]] specialized to the single-double payload (after
  * [[RewriteRankFilterToTopK]] re-routes partition keys around the
  * buffer, a `row_number() over (partition by g order by u) <= k` on a
  * (g, u) projection buffers ONLY u — the KMV/sketch shape). Emits the
  * same `array<struct>` contract as the generic aggregate so the
  * posexplode plumbing downstream is identical.
  *
  * Ordering is java.lang.Double.compare (NaN greatest, -0.0 < 0.0) and
  * the null block sits at the end the window's null ordering dictates.
  * One documented divergence from Spark's SQL comparison
  * (SQLOrderingUtil.compareDoubles treats -0.0 == 0.0): at the k
  * boundary this heap can keep a different ±0.0 representative than the
  * window/sort plan would — benign, because ±0.0 are a row_number TIE
  * under SQL ordering and the tie survivor is nondeterministic in the
  * sort plan too; normalize -0.0 on insert if bit-exact parity with a
  * specific sort run is ever needed. Other ties likewise keep an
  * arbitrary survivor — row_number's own nondeterminism under ties.
  */
case class BoundedTopKDoubles(
    child: Expression,
    k: Int,
    asc: Boolean,
    nullsFirst: Boolean,
    fieldName: String,
    fieldNullable: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleTopK] {

  require(k >= 1, s"k must be >= 1, got $k")

  /** > 0 ⇔ a sorts strictly WORSE than b under the window's direction. */
  @inline private def worse(a: Double, b: Double): Int = {
    val c = java.lang.Double.compare(a, b)
    if (asc) c else -c
  }

  override def createAggregationBuffer(): DoubleTopK = new DoubleTopK(k)

  private def insert(buf: DoubleTopK, v: Double): Unit = {
    val h = buf.heap
    if (buf.size < k) {
      var i = buf.size
      h(i) = v
      buf.size += 1
      while (i > 0 && worse(h(i), h((i - 1) / 2)) > 0) {
        val p = (i - 1) / 2
        val t = h(p); h(p) = h(i); h(i) = t
        i = p
      }
    } else if (worse(v, h(0)) < 0) {
      h(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < k && worse(h(l), h(m)) > 0) m = l
        if (r < k && worse(h(r), h(m)) > 0) m = r
        if (m == i) done = true
        else {
          val t = h(m); h(m) = h(i); h(i) = t
          i = m
        }
      }
    }
  }

  override def update(buf: DoubleTopK, input: InternalRow): DoubleTopK = {
    val v = child.eval(input)
    if (v == null) { if (buf.nulls < k) buf.nulls += 1 }
    else insert(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: DoubleTopK, other: DoubleTopK): DoubleTopK = {
    buf.nulls = math.min(k, buf.nulls + other.nulls)
    var i = 0
    while (i < other.size) { insert(buf, other.heap(i)); i += 1 }
    buf
  }

  override def eval(buf: DoubleTopK): Any = {
    // best-first: the null block per the window's null ordering, the kept
    // doubles in direction order; at most k rows total
    val vals = java.util.Arrays.copyOf(buf.heap, buf.size)
    java.util.Arrays.sort(vals) // Double.compare order, ascending
    val total = math.min(k, buf.nulls + buf.size)
    val out = new Array[Any](total)
    var w = 0
    def emitNulls(limit: Int): Unit = {
      var i = 0
      while (i < limit && w < total) {
        out(w) = new GenericInternalRow(Array[Any](null)); w += 1; i += 1
      }
    }
    def emitVals(): Unit = {
      var j = 0
      while (j < vals.length && w < total) {
        val v = if (asc) vals(j) else vals(vals.length - 1 - j)
        out(w) = new GenericInternalRow(Array[Any](v)); w += 1; j += 1
      }
    }
    if (nullsFirst) { emitNulls(buf.nulls); emitVals() }
    else { emitVals(); emitNulls(buf.nulls) }
    new GenericArrayData(out)
  }

  override def serialize(buf: DoubleTopK): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 8 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    out.writeInt(buf.nulls)
    var i = 0
    while (i < buf.size) { out.writeDouble(buf.heap(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DoubleTopK = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    buf.nulls = in.readInt()
    var i = 0
    // a serialized buffer already satisfies the heap property it was
    // built under; restore verbatim
    while (i < n) { buf.heap(i) = in.readDouble(); i += 1 }
    buf.size = n
    buf
  }

  override def dataType: DataType =
    ArrayType(StructType(Seq(StructField(fieldName, DoubleType, fieldNullable))),
      containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKDoubles =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bounded_top_k_doubles"
}
