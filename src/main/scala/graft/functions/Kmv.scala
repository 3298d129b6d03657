package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV / bottom-k theta sketch — the ORIGINAL theta-sketch construction
  * (k minimum distinct hash values; estimate = (k−1)/θ), kept fully
  * engine-portable: the hash is md5-derived (same trick as the MinHash/SimHash
  * pipeline), every estimate is a fixed sequence of IEEE-double ops, and the
  * sketch VALUE is just the sorted bottom-k hash array — so unlike the
  * DataSketches HLL/CPC/theta aggregates in [[Sketches]] (whose internal
  * murmur hashing is library-private), KMV results are bit-reproducible in
  * DuckDB SQL and the whole family is DuckDB-oracle-checkable (q62).
  *
  * Reference parity: prob-set-cardinality + theta set operations
  * (reference src/tech/v3/dataset/reductions/apache_data_sketch.clj) — same
  * semantics (mergeable distinct-count sketch with union/intersection
  * estimates), portable formulation.
  *
  * Scale shape: TypedImperativeAggregate with an O(k) TreeSet buffer —
  * partial sketches merge at shuffle boundaries exactly like Spark's own
  * HLL++; bytes ∝ k, never ∝ n. Set-op estimates run driver-side on the
  * collected O(k) arrays (not a data collect).
  */
object Kmv {

  val DefaultK = 1024

  /** Hash domain is [0, 2^60) — 15 md5 hex digits (TextDedup.h60). */
  val ThetaMaxRaw: Long = 1L << 60
  private val TwoPow60: Double = math.pow(2.0, 60)

  type Buf = java.util.TreeSet[java.lang.Long]

  case class KmvSketchAgg(
      child: Expression,
      k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] with UnaryLike[Expression] {
    require(k >= 2, s"kmv_sketch needs k >= 2, got $k")

    override def createAggregationBuffer(): Buf = new java.util.TreeSet[java.lang.Long]()

    private def add(b: Buf, h: Long): Unit =
      if (b.size < k) { b.add(h); () }
      else if (h < b.last) { if (b.add(h)) b.pollLast(); () }

    override def update(b: Buf, row: InternalRow): Buf = {
      val v = child.eval(row)
      if (v != null) add(b, v.asInstanceOf[Long])
      b
    }

    override def merge(b: Buf, o: Buf): Buf = {
      val it = o.iterator()
      while (it.hasNext) add(b, it.next())
      b
    }

    override def eval(b: Buf): Any = {
      val out = new Array[Long](b.size)
      val it = b.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(b: Buf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.size)
      bb.putInt(b.size)
      val it = b.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { b.add(bb.getLong); i += 1 }
      b
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
      copy(child = c)
    override def prettyName: String = "kmv_sketch"
  }

  /** Array-input twin of [[KmvSketchAgg]] (r19): folds WHOLE sorted-hash
    * arrays into the same O(k) TreeSet buffer — the iterative graph
    * sketches (harmonic centrality, neighborhood function) previously
    * EXPLODED each ball into k rows purely to feed the scalar aggregate,
    * paying a k× row fan-out per round in the hot path. Identical buffer,
    * merge, and eval ⇒ bit-identical sketch values; only the input arity
    * changes. Early-exit: a ball's hashes arrive sorted ascending, so
    * once one element is rejected (≥ buffer max with a full buffer) the
    * rest of that array cannot enter either. */
  case class KmvSketchArrAgg(
      child: Expression,
      k: Int = DefaultK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buf] with UnaryLike[Expression] {
    require(k >= 2, s"kmv_sketch_arr needs k >= 2, got $k")

    override def createAggregationBuffer(): Buf = new java.util.TreeSet[java.lang.Long]()

    private def add(b: Buf, h: Long): Boolean =
      if (b.size < k) { b.add(h); true }
      else if (h < b.last) { if (b.add(h)) b.pollLast(); true }
      else false

    override def update(b: Buf, row: InternalRow): Buf = {
      val v = child.eval(row)
      if (v != null) {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val n = arr.numElements()
        var i = 0
        var live = true
        while (i < n && live) { live = add(b, arr.getLong(i)); i += 1 }
      }
      b
    }

    override def merge(b: Buf, o: Buf): Buf = {
      val it = o.iterator()
      while (it.hasNext) {
        val h = it.next(); if (b.size < k) b.add(h)
        else if (h < b.last) { if (b.add(h)) b.pollLast() }
      }
      b
    }

    override def eval(b: Buf): Any = {
      val out = new Array[Long](b.size)
      val it = b.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(b: Buf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.size)
      bb.putInt(b.size)
      val it = b.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { b.add(bb.getLong); i += 1 }
      b
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): KmvSketchArrAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketchArrAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KmvSketchArrAgg =
      copy(child = c)
    override def prettyName: String = "kmv_sketch_arr"
  }

  /** θ in raw hash units: the k-th smallest hash, or the full domain when the
    * sketch holds fewer than k values (then it IS the exact distinct set). */
  def thetaRaw(bottomK: Array[Long], k: Int): Long =
    if (bottomK.length < k) ThetaMaxRaw else bottomK(k - 1)

  /** Distinct estimate: exact when |sketch| < k, else (k−1)/θ. */
  def estimate(bottomK: Array[Long], k: Int): Double =
    if (bottomK.length < k) bottomK.length.toDouble
    else (k - 1).toDouble * TwoPow60 / bottomK(k - 1).toDouble

  /** Intersection estimate: common hashes below θ = min(θa, θb), scaled. */
  def intersectEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(thetaRaw(a, k), thetaRaw(b, k))
    var i = 0; var j = 0; var common = 0L
    while (i < a.length && j < b.length && a(i) < th && b(j) < th) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { common += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    common.toDouble * TwoPow60 / th.toDouble
  }

  /** Union estimate: KMV sketches are mergeable — the bottom-k of A ∪ B is
    * contained in bottomK(A) ∪ bottomK(B). */
  def unionEstimate(a: Array[Long], b: Array[Long], k: Int): Double = {
    val merged = new java.util.TreeSet[java.lang.Long]()
    a.foreach(merged.add(_)); b.foreach(merged.add(_))
    val arr = new Array[Long](math.min(merged.size, k))
    val it = merged.iterator()
    var i = 0
    while (i < arr.length) { arr(i) = it.next(); i += 1 }
    // exactness check needs the true merged distinct size, not the capped one
    if (merged.size < k) merged.size.toDouble
    else (k - 1).toDouble * TwoPow60 / arr(k - 1).toDouble
  }

  /** Register `kmv_sketch(hashCol [, k])` and `kmv_sketch_arr(arrCol [, k])`
    * on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", { es =>
        val k = if (es.length > 1) es(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"kmv_sketch k must be an int literal, got $other")
        } else DefaultK
        KmvSketchAgg(es.head, k).toAggregateExpression()
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch_arr", { es =>
        val k = if (es.length > 1) es(1) match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"kmv_sketch_arr k must be an int literal, got $other")
        } else DefaultK
        KmvSketchArrAgg(es.head, k).toAggregateExpression()
      }, "scala_udf")
  }
}
