package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.DeclaredInputTypes
import org.apache.spark.sql.types.{DataType, DoubleType, MapType}

/** Streaming numeric histogram — the Ben-Haim & Yom-Tov algorithm
  * (JMLR 11, 2010, "A Streaming Parallel Decision Tree Algorithm"),
  * which is also what backs Trino's `numeric_histogram(buckets, value
  * [, weight])` (the reference delegates the name to the remote
  * engine; Trino docs, aggregate functions). Bins are (position,
  * weight) pairs kept sorted by position; inserting past the bucket
  * budget merges the two CLOSEST adjacent bins into their weighted
  * mean. The sketch is mergeable — a merge replays the other
  * histogram's bins, so Spark's partial aggregation (map-side
  * combine, then final merge) works unchanged and the driver never
  * sees row data. Output is map(bin position → total weight).
  *
  * Estimates depend on insertion order (like Trino's), so tests pin
  * the invariants — total weight, bin count ≤ budget, positions
  * inside [min, max] — not exact bin placement.
  */
object HistogramExprs {

  /** Mutable bin store: parallel arrays sorted by position, one spare
    * slot so add() can insert before compacting. */
  final class Bins(val max: Int) {
    var n: Int = 0
    val pos = new Array[Double](max + 1)
    val wt = new Array[Double](max + 1)

    def add(x: Double, w: Double): Unit = {
      if (w <= 0) return
      // binary search for the insertion point (first index with pos >= x)
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (pos(mid) < x) lo = mid + 1 else hi = mid
      }
      if (lo < n && pos(lo) == x) { wt(lo) += w; return }
      System.arraycopy(pos, lo, pos, lo + 1, n - lo)
      System.arraycopy(wt, lo, wt, lo + 1, n - lo)
      pos(lo) = x
      wt(lo) = w
      n += 1
      if (n > max) compactOnce()
    }

    /** Merge the two closest adjacent bins into their weighted mean. */
    private def compactOnce(): Unit = {
      var best = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < n - 1) {
        val gap = pos(i + 1) - pos(i)
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val w = wt(best) + wt(best + 1)
      pos(best) = (pos(best) * wt(best) + pos(best + 1) * wt(best + 1)) / w
      wt(best) = w
      System.arraycopy(pos, best + 2, pos, best + 1, n - best - 2)
      System.arraycopy(wt, best + 2, wt, best + 1, n - best - 2)
      n -= 1
    }

    def mergeFrom(other: Bins): Unit = {
      var i = 0
      while (i < other.n) { add(other.pos(i), other.wt(i)); i += 1 }
    }

    def serialized: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 16 * n)
      bb.putInt(max).putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(pos(i)).putDouble(wt(i)); i += 1 }
      bb.array()
    }
  }

  object Bins {
    def deserialize(bytes: Array[Byte]): Bins = {
      val bb = ByteBuffer.wrap(bytes)
      val b = new Bins(bb.getInt)
      val n = bb.getInt
      var i = 0
      // positions arrive sorted and distinct (the serialized store's
      // invariant), so writing them straight back preserves it
      while (i < n) { b.pos(i) = bb.getDouble; b.wt(i) = bb.getDouble; i += 1 }
      b.n = n
      b
    }
  }

  /** `numeric_histogram(buckets, x[, w])` → map<double,double>. */
  case class NumericHistogramAgg(child: Expression, weight: Expression, buckets: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Bins] with DeclaredInputTypes {
    require(buckets >= 2, "numeric_histogram bucket count must be at least 2")

    override def prettyName: String = "numeric_histogram"
    override def children: Seq[Expression] = Seq(child, weight)
    override def declaredInputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
    override def dataType: DataType =
      MapType(DoubleType, DoubleType, valueContainsNull = false)
    override def nullable: Boolean = true

    override def createAggregationBuffer(): Bins = new Bins(buckets)

    override def update(buf: Bins, input: InternalRow): Bins = {
      val v = child.eval(input)
      val w = weight.eval(input)
      if (v != null && w != null)
        buf.add(v.asInstanceOf[Double], w.asInstanceOf[Double])
      buf
    }

    override def merge(buf: Bins, other: Bins): Bins = { buf.mergeFrom(other); buf }

    override def eval(buf: Bins): Any =
      if (buf.n == 0) null
      else new ArrayBasedMapData(
        new GenericArrayData(buf.pos.take(buf.n).map(x => x: Any)),
        new GenericArrayData(buf.wt.take(buf.n).map(x => x: Any)))

    override def serialize(buf: Bins): Array[Byte] = buf.serialized
    override def deserialize(bytes: Array[Byte]): Bins = Bins.deserialize(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): NumericHistogramAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): NumericHistogramAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): NumericHistogramAgg =
      copy(child = newChildren(0), weight = newChildren(1))
  }
}
