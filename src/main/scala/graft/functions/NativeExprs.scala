package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot per-row loops of the
  * LLM-pipeline operators (MinHash, SimHash, SRP, dot products).
  *
  * The same semantics are expressible with higher-order functions
  * (transform/aggregate/zip_with), but those evaluate interpreted with a
  * per-element closure and an allocation per step — at 100 TB (or even
  * sf0.1) the signature computation dominates the whole dedup pipeline.
  * A single expression evaluating a tight primitive loop over ArrayData
  * is 1-2 orders of magnitude faster and keeps the operator a pure
  * per-row projection (no shuffle, no driver involvement).
  *
  * Each expression is deterministic and null-intolerant; inputs come
  * from Spark's own xxhash64/split/transform pipeline stages.
  */
object NativeExprs {

  /** MinHash signature: out(s) = min over elements e of
    * xxh64(xxh64(e, 42), seed=s), for s in [0, numHashes). */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](numHashes)
      var s = 0
      while (s < numHashes) {
        var m = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = XXH64.hashLong(s.toLong, XXH64.hashLong(arr.getLong(i), 42L))
          if (h < m) m = h
          i += 1
        }
        out(s) = m
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash over an array of 64-bit token hashes: per bit, sum
    * +1/-1 by the token's bit value; emit the sign bits packed. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Signed-random-projection signature: `bits` sign bits of dot(v, p_b)
    * packed into a BIGINT, where plane component p_b[i] is a
    * deterministic hash of (b, i) mapped to [-1, 1). */
  case class SRPSig(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "srp_sig"

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var sig = 0L
      var b = 0
      while (b < bits) {
        var s = 0.0
        var i = 0
        while (i < n) {
          val h = XXH64.hashLong(i.toLong, XXH64.hashLong(b.toLong, 42L))
          s += arr.getFloat(i).toDouble * (h.toDouble / Long.MaxValue.toDouble)
          i += 1
        }
        if (s > 0.0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    override protected def withNewChildInternal(newChild: Expression): SRPSig =
      copy(child = newChild)
  }

  /** Dot product of two float arrays in double (elementwise upcast,
    * index-order accumulation — same math as the zip_with/aggregate
    * composition, minus the per-element allocation). */
  case class DotF(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dotf"

    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotF =
      copy(left = newLeft, right = newRight)
  }

  // ---- Column API ----

  def minhashSig(shingleHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingleHashes), numHashes))

  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  def srpSig(vec: Column, bits: Int): Column =
    ColumnBridge.column(SRPSig(ColumnBridge.expression(vec), bits))

  def dotf(a: Column, b: Column): Column =
    ColumnBridge.column(DotF(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
