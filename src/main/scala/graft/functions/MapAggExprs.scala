package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Map-building aggregates for the Trino dialect surface
  * (`histogram(x)` and `multimap_agg(k, v)`, Trino docs: aggregate
  * functions; the reference delegates both to the remote engine).
  *
  * Spark has no built-in map-valued GROUP BY aggregate that groups
  * WITHIN the aggregate — `map_from_entries(collect_list(...))` keeps
  * duplicates, and a two-level GROUP BY changes the query shape. Both
  * are TypedImperativeAggregates: per-partition hash maps, merged in
  * the final aggregation (map-side partials — the same distribution
  * story as the sketch aggregates), so result size is bounded by the
  * group's distinct-key count, never the row count.
  *
  * Buffers hold CATALYST values (UTF8String, boxed primitives, Decimal
  * — all Serializable/Externalizable) copied out of the reused input
  * row via `InternalRow.copyValue`. Map key order is pinned by the
  * string form of the key so output is deterministic across runs and
  * partitionings (maps are unit-pinned, never oracle-hashed:
  * OutputTypingSpec bans map columns from oracle rows).
  */
object MapAggExprs {

  private def ser(m: AnyRef): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(m); oos.close()
    bos.toByteArray
  }

  private def deser[T](bytes: Array[Byte]): T = {
    val ois = new ObjectInputStream(new ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[T] finally ois.close()
  }

  private def sortedKeys(keys: Iterable[Any]): Array[Any] =
    keys.toArray.sortBy(k => if (k == null) "" else k.toString)

  /** `histogram(x)` → MAP(x, BIGINT): per-value counts (NULLs skipped,
    * like Trino). */
  case class HistogramAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
      with UnaryLike[Expression] {
    override def prettyName: String = "histogram"
    override def dataType: DataType =
      MapType(child.dataType, LongType, valueContainsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
      mutable.HashMap.empty

    override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val k = InternalRow.copyValue(v)
        buf.update(k, buf.getOrElse(k, 0L) + 1L)
      }
      buf
    }

    override def merge(buf: mutable.HashMap[Any, Long], other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
      other.foreach { case (k, n) => buf.update(k, buf.getOrElse(k, 0L) + n) }
      buf
    }

    override def eval(buf: mutable.HashMap[Any, Long]): Any = {
      val keys = sortedKeys(buf.keys)
      new ArrayBasedMapData(
        new GenericArrayData(keys),
        new GenericArrayData(keys.map(buf(_))))
    }

    override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = ser(buf)
    override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] =
      deser(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): HistogramAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): HistogramAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): HistogramAgg =
      copy(child = newChild)
  }

  /** `multimap_agg(k, v)` → MAP(k, ARRAY(v)): values grouped per key in
    * encounter order within a partition; cross-partition order follows
    * merge order (Trino's is likewise unspecified). NULL keys skipped;
    * NULL values kept (Trino shape). */
  case class MultimapAgg(left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]]
      with BinaryLike[Expression] {
    override def prettyName: String = "multimap_agg"
    override def dataType: DataType = MapType(left.dataType,
      ArrayType(right.dataType, containsNull = true), valueContainsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] =
      mutable.LinkedHashMap.empty

    override def update(
        buf: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]],
        input: InternalRow): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
      val k = left.eval(input)
      if (k != null) {
        val kc = InternalRow.copyValue(k)
        val v = right.eval(input)
        val vc = if (v == null) null else InternalRow.copyValue(v)
        buf.getOrElseUpdate(kc, mutable.ArrayBuffer.empty) += vc
      }
      buf
    }

    override def merge(
        buf: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]],
        other: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] = {
      other.foreach { case (k, vs) =>
        buf.getOrElseUpdate(k, mutable.ArrayBuffer.empty) ++= vs
      }
      buf
    }

    override def eval(buf: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Any = {
      val keys = sortedKeys(buf.keys)
      new ArrayBasedMapData(
        new GenericArrayData(keys),
        new GenericArrayData(keys.map(k => new GenericArrayData(buf(k).toArray): Any)))
    }

    override def serialize(buf: mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]]): Array[Byte] =
      ser(buf)
    override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, mutable.ArrayBuffer[Any]] =
      deser(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): MultimapAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MultimapAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MultimapAgg =
      copy(left = newLeft, right = newRight)
  }

  /** `map_union(m)` → MAP(K, V): union of the input maps; the
    * FIRST-seen value wins on key collision (Trino leaves the winner
    * unspecified — first-seen is deterministic per partition order;
    * output keys sorted like the other map aggregates). NULL maps
    * skipped; NULL values kept. */
  case class MapUnionAgg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Any]]
      with UnaryLike[Expression] {
    override def prettyName: String = "map_union"
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = false

    private lazy val mapType = child.dataType.asInstanceOf[MapType]

    override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
      mutable.LinkedHashMap.empty

    override def update(buf: mutable.LinkedHashMap[Any, Any], input: InternalRow): mutable.LinkedHashMap[Any, Any] = {
      val m = child.eval(input)
      if (m != null) {
        val md = m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val keys = md.keyArray()
        val vals = md.valueArray()
        var i = 0
        while (i < md.numElements()) {
          val k = InternalRow.copyValue(keys.get(i, mapType.keyType))
          if (!buf.contains(k)) {
            val v = if (vals.isNullAt(i)) null
                    else InternalRow.copyValue(vals.get(i, mapType.valueType))
            buf.update(k, v)
          }
          i += 1
        }
      }
      buf
    }

    override def merge(buf: mutable.LinkedHashMap[Any, Any], other: mutable.LinkedHashMap[Any, Any]): mutable.LinkedHashMap[Any, Any] = {
      other.foreach { case (k, v) => if (!buf.contains(k)) buf.update(k, v) }
      buf
    }

    override def eval(buf: mutable.LinkedHashMap[Any, Any]): Any = {
      val keys = sortedKeys(buf.keys)
      new ArrayBasedMapData(
        new GenericArrayData(keys),
        new GenericArrayData(keys.map(buf(_))))
    }

    override def serialize(buf: mutable.LinkedHashMap[Any, Any]): Array[Byte] = ser(buf)
    override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Any] =
      deser(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): MapUnionAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MapUnionAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MapUnionAgg =
      copy(child = newChild)
  }
}
