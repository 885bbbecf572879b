package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridge, DeclaredInputTypes}
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
      extends UnaryExpression with CodegenFallback with DeclaredInputTypes {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // declared types matter: these are SQL-reachable via execute_query, and
    // an undeclared array<double> would be misread via getLong on unsafe rows
    override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(LongType))
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
      extends UnaryExpression with CodegenFallback with DeclaredInputTypes {
    override def dataType: DataType = LongType
    override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(LongType))
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
      extends UnaryExpression with CodegenFallback with DeclaredInputTypes {
    override def dataType: DataType = LongType
    override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
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
    * composition, minus the per-element allocation). Implements
    * doGenCode, so it fuses into whole-stage codegen instead of
    * breaking the span like a fallback expression would. */
  case class DotF(left: Expression, right: Expression)
      extends BinaryExpression with DeclaredInputTypes {
    override def dataType: DataType = DoubleType
    override def declaredInputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
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

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotF =
      copy(left = newLeft, right = newRight)
  }

  /** Distinct xxhash64 values of the k-token shingles of a token array:
    * hash of "tok_i tok_i+1 … tok_i+k-1" (space-joined, Spark xxhash64
    * seed 42 — identical to xxhash64(concat_ws(" ", slice(toks,i,k))))
    * for i in [1, max(n-k+1, 1)]. One native pass replaces the
    * interpreted transform+slice+concat_ws window walk. */
  case class ShingleHash(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback with DeclaredInputTypes {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def declaredInputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def prettyName: String = "shingle_hash"

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val windows = math.max(n - (k - 1), 1)
      val seen = new java.util.LinkedHashSet[java.lang.Long](windows * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < windows) {
        sb.setLength(0)
        var j = i
        val end = math.min(i + k, n)
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(arr.getUTF8String(j).toString)
          j += 1
        }
        seen.add(XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString), 42L))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var m = 0
      while (it.hasNext) { out(m) = it.next(); m += 1 }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): ShingleHash =
      copy(child = newChild)
  }

  /** Count of common elements of two SORTED long arrays (merge scan —
    * no per-pair hash set). The pairwise intersection inside blocked
    * n-gram dedup is the block-quadratic hot loop; Spark's
    * array_intersect builds a hash set per evaluation. Inputs must be
    * sorted ascending and distinct (array_sort(array_distinct(...))). */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with DeclaredInputTypes {
    override def dataType: DataType = IntegerType
    override def declaredInputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def prettyName: String = "sorted_intersect_count"

    protected override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0
      var j = 0
      var c = 0
      while (i < nx && j < ny) {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $nx = $a.numElements();
           |int $ny = $b.numElements();
           |int $i = 0; int $j = 0; int $c = 0;
           |while ($i < $nx && $j < $ny) {
           |  long $xv = $a.getLong($i);
           |  long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; }
           |  else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /** One-pass text statistics: struct(n_chars, n_words, n_alpha,
    * n_space, n_stop) where words are maximal non-whitespace runs,
    * alpha counts ASCII letters, space counts ' ' and stopword hits
    * compare lowercased tokens against a fixed list — the same values
    * the regex/split/filter composition computes in five passes. */
  case class TextStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression with CodegenFallback with DeclaredInputTypes {
    override def declaredInputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = StructType(Seq(
      StructField("n_chars", IntegerType, nullable = false),
      StructField("n_words", IntegerType, nullable = false),
      StructField("n_alpha", IntegerType, nullable = false),
      StructField("n_space", IntegerType, nullable = false),
      StructField("n_stop", IntegerType, nullable = false)))
    override def prettyName: String = "text_stats"

    private val stopSet = stopwords.toSet

    protected override def nullSafeEval(input: Any): Any = {
      val s = input.toString
      val n = s.length
      var alpha = 0
      var space = 0
      var words = 0
      var stop = 0
      var i = 0
      val tok = new java.lang.StringBuilder(16)
      def flush(): Unit = if (tok.length > 0) {
        words += 1
        if (stopSet.contains(tok.toString.toLowerCase(java.util.Locale.ROOT))) stop += 1
        tok.setLength(0)
      }
      // whitespace = Java regex \s (the split the oracle mirrors)
      def isWs(c: Char): Boolean =
        c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
      while (i < n) {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1
        if (c == ' ') space += 1
        if (isWs(c)) flush() else tok.append(c)
        i += 1
      }
      flush()
      org.apache.spark.sql.catalyst.InternalRow(n, words, alpha, space, stop)
    }

    override protected def withNewChildInternal(newChild: Expression): TextStats =
      copy(child = newChild)
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

  def shingleHash(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(tokens), k))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def textStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text), stopwords))
}
