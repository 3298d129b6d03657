package graft.functions

import org.apache.datasketches.frequencies
import org.apache.datasketches.hll.{HllSketch, Union}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DataSketches-backed approximate aggregates (reference parity: the
  * reference's prob-set-cardinality / prob-quantile wrap the SAME Apache
  * DataSketches library — reference src/tech/v3/dataset/reductions/
  * apache_data_sketch.clj:90-132 and reductions.clj:210-252).
  *
  * Implemented as `TypedImperativeAggregate`: the sketch object lives in
  * executor memory during partial aggregation and is serialized only at
  * shuffle boundaries — the exact design Spark uses for its own HLL++, and
  * the correct scale behavior (mergeable partial sketches, bytes ∝ k not n).
  *
  * Exposed to queries via the session function registry:
  * `Sketches.register(spark)` then `expr("hll_distinct(x)")` /
  * `expr("kll_quantile(x, 0.5)")`.
  */
object Sketches {

  private val DefaultLgK = 12 // ≈ reference default lgK=12 → k=4096
  private val DefaultKllK = 200
  private val DefaultFreqLgK = 12 // maxMapSize 4096 → maxError ≲ 3.5·n/4096

  case class HllDistinct(
      child: Expression,
      lgK: Int = DefaultLgK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Union = new Union(lgK)

    override def update(b: Union, row: InternalRow): Union = {
      val v = child.eval(row)
      if (v != null) v match {
        case s: UTF8String => b.update(s.toString)
        case d: Double => b.update(d)
        case f: Float => b.update(f.toDouble)
        case l: Long => b.update(l)
        case i: Int => b.update(i.toLong)
        case o => b.update(o.toString)
      }
      b
    }

    override def merge(b: Union, o: Union): Union = {
      b.update(o.getResult); b
    }

    override def eval(b: Union): Any = math.round(b.getResult.getEstimate)

    override def serialize(b: Union): Array[Byte] =
      b.getResult.toCompactByteArray

    override def deserialize(bytes: Array[Byte]): Union = {
      val u = new Union(lgK)
      u.update(HllSketch.heapify(Memory.wrap(bytes)))
      u
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): HllDistinct =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): HllDistinct =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): HllDistinct =
      copy(child = c)
    override def prettyName: String = "hll_distinct"
  }

  case class KllQuantile(
      child: Expression,
      quantile: Double,
      k: Int = DefaultKllK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(b: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
      val v = child.eval(row)
      if (v != null) v match {
        case d: Double => b.update(d)
        case f: Float => b.update(f.toDouble)
        case l: Long => b.update(l.toDouble)
        case i: Int => b.update(i.toDouble)
        case d: Decimal => b.update(d.toDouble) // Spark Decimal is not a java.lang.Number
        case n: Number => b.update(n.doubleValue())
        case _ => ()
      }
      b
    }

    override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
      b.merge(o); b
    }

    override def eval(b: KllDoublesSketch): Any =
      if (b.isEmpty) null else b.getQuantile(quantile)

    override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def withNewMutableAggBufferOffset(o: Int): KllQuantile =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllQuantile =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): KllQuantile =
      copy(child = c)
    override def prettyName: String = "kll_quantile"
  }

  /** CPC sketch distinct-count aggregate — the reference's third
    * DataSketches cardinality family (apache_data_sketch.clj:309-317).
    * CPC trades a little merge cost for the best accuracy-per-stored-byte
    * of the three (better than HLL at equal serialized size), which is the
    * right sketch to PERSIST per partition/day and re-merge later. Buffer is
    * the updatable CpcSketch; merges go through CpcUnion (the only merge
    * path the library exposes — allocation per merge is fine, merges are
    * O(partitions), not O(rows)). */
  case class CpcDistinct(
      child: Expression,
      lgK: Int = DefaultLgK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.cpc.CpcSketch]
    with UnaryLike[Expression] {
    import org.apache.datasketches.cpc.{CpcSketch, CpcUnion}

    override def createAggregationBuffer(): CpcSketch = new CpcSketch(lgK)

    override def update(b: CpcSketch, row: InternalRow): CpcSketch = {
      val v = child.eval(row)
      if (v != null) v match {
        case s: UTF8String => b.update(s.toString)
        case d: Double => b.update(d)
        case f: Float => b.update(f.toDouble)
        case l: Long => b.update(l)
        case i: Int => b.update(i.toLong)
        case o => b.update(o.toString)
      }
      b
    }

    override def merge(b: CpcSketch, o: CpcSketch): CpcSketch = {
      val u = new CpcUnion(lgK)
      u.update(b); u.update(o)
      u.getResult
    }

    override def eval(b: CpcSketch): Any = math.round(b.getEstimate)

    override def serialize(b: CpcSketch): Array[Byte] = b.toByteArray

    override def deserialize(bytes: Array[Byte]): CpcSketch =
      CpcSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): CpcDistinct =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CpcDistinct =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CpcDistinct =
      copy(child = c)
    override def prettyName: String = "cpc_distinct"
  }

  /** Theta sketch aggregate → serialized sketch bytes (reference theta
    * support, apache_data_sketch.clj). Unlike HLL, theta sketches support
    * SET OPERATIONS on the results: estimate unions/intersections of group
    * cardinalities downstream via [[thetaEstimate]]/[[thetaIntersectEstimate]]. */
  case class ThetaSketchAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
    with UnaryLike[Expression] {
    import org.apache.datasketches.theta.{SetOperation, Sketches => TS, Union => TUnion}

    override def createAggregationBuffer(): TUnion =
      SetOperation.builder().buildUnion()

    override def update(b: TUnion, row: InternalRow): TUnion = {
      val v = child.eval(row)
      if (v != null) v match {
        case s: UTF8String => b.update(s.toString)
        case d: Double => b.update(d)
        case l: Long => b.update(l)
        case i: Int => b.update(i.toLong)
        case o => b.update(o.toString)
      }
      b
    }

    override def merge(b: TUnion, o: TUnion): TUnion = {
      b.union(o.getResult); b
    }

    override def eval(b: TUnion): Any = b.getResult.toByteArray

    override def serialize(b: TUnion): Array[Byte] =
      b.getResult.toByteArray

    override def deserialize(bytes: Array[Byte]): TUnion = {
      val u = SetOperation.builder().buildUnion()
      u.union(TS.wrapSketch(Memory.wrap(bytes)))
      u
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
      copy(child = c)
    override def prettyName: String = "theta_sketch"
  }

  /** Driver-side estimates over serialized theta sketches (sketch bytes are
    * tiny — O(k); collecting them is not a data collect). */
  def thetaEstimate(bytes: Array[Byte]): Double =
    org.apache.datasketches.theta.Sketches.wrapSketch(Memory.wrap(bytes))
      .getEstimate

  def thetaIntersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    import org.apache.datasketches.theta.{SetOperation, Sketches => TS}
    val in = SetOperation.builder().buildIntersection()
    in.intersect(TS.wrapSketch(Memory.wrap(a)))
    in.intersect(TS.wrapSketch(Memory.wrap(b)))
    in.getResult.getEstimate
  }

  def thetaUnionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    import org.apache.datasketches.theta.{SetOperation, Sketches => TS}
    val u = SetOperation.builder().buildUnion()
    u.union(TS.wrapSketch(Memory.wrap(a)))
    u.union(TS.wrapSketch(Memory.wrap(b)))
    u.getResult.getEstimate
  }

  /** Frequent-items (heavy hitters) sketch aggregate → serialized sketch
    * bytes. Space-Saving/Misra-Gries family via DataSketches ItemsSketch:
    * one pass, O(maxMapSize) memory, mergeable partials, and the
    * NO_FALSE_NEGATIVES guarantee — every item with true count above
    * `getMaximumError` is present in the sketch. That guarantee is what
    * makes [[heavyHittersExact]] exact at scale: sketch pass finds a
    * complete candidate set, a second pass counts only those candidates. */
  case class FreqSketchAgg(
      child: Expression,
      lgMaxMapSize: Int = DefaultFreqLgK,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[frequencies.ItemsSketch[String]]
    with UnaryLike[Expression] {
    import org.apache.datasketches.common.ArrayOfStringsSerDe

    // The child MUST already be a string: items are sketched via the
    // EXTERNAL string form, and heavyHittersExact's recount filter matches
    // on it. The registry's freq_sketch wraps the child in Cast(_, String)
    // (resolved by the analyzer, incl. timezone for timestamps); enforcing
    // StringType here makes any direct construction that skips the cast
    // fail analysis loudly instead of silently sketching internal values
    // (e.g. epoch-day ints for dates).
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_sketch items must be STRING, got ${child.dataType.sql}: " +
            "wrap the child in CAST(x AS STRING) (the graft registry does " +
            "this automatically)")

    private def serDe = new ArrayOfStringsSerDe()

    override def createAggregationBuffer(): frequencies.ItemsSketch[String] =
      new frequencies.ItemsSketch[String](1 << lgMaxMapSize)

    override def update(b: frequencies.ItemsSketch[String], row: InternalRow)
        : frequencies.ItemsSketch[String] = {
      val v = child.eval(row)
      if (v != null) b.update(v.toString)
      b
    }

    override def merge(b: frequencies.ItemsSketch[String],
        o: frequencies.ItemsSketch[String]): frequencies.ItemsSketch[String] = {
      b.merge(o); b
    }

    override def eval(b: frequencies.ItemsSketch[String]): Any =
      b.toByteArray(serDe)

    override def serialize(b: frequencies.ItemsSketch[String]): Array[Byte] =
      b.toByteArray(serDe)

    override def deserialize(bytes: Array[Byte]): frequencies.ItemsSketch[String] =
      frequencies.ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
      copy(child = c)
    override def prettyName: String = "freq_sketch"
  }

  /** Driver-side view of a serialized frequent-items sketch: (item,
    * estimate, lowerBound, upperBound) rows plus (streamLength, maxError). */
  def freqItems(bytes: Array[Byte])
      : (Seq[(String, Long, Long, Long)], Long, Long) = {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.ErrorType
    val sk = frequencies.ItemsSketch.getInstance(
      Memory.wrap(bytes), new ArrayOfStringsSerDe())
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES).toSeq.map(r =>
      (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
    (rows, sk.getStreamLength, sk.getMaximumError)
  }

  /** Register `hll_distinct(col)` and `kll_quantile(col, q)` on the session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("hll_distinct",
      es => HllDistinct(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("kll_quantile", { es =>
      val q = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
          v.doubleValue()
        case org.apache.spark.sql.catalyst.expressions.Literal(d: Decimal, _) =>
          d.toDouble
        case other => throw new IllegalArgumentException(
          s"kll_quantile rank must be a literal, got $other")
      }
      KllQuantile(es.head, q).toAggregateExpression()
    }, "scala_udf")
    reg.createOrReplaceTempFunction("theta_sketch",
      es => ThetaSketchAgg(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("cpc_distinct",
      es => CpcDistinct(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("freq_sketch", { es =>
      val lg =
        if (es.size < 2) DefaultFreqLgK
        else es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"freq_sketch lgMaxMapSize must be an int literal, got $other")
        }
      // Cast to string so sketch items are EXTERNAL values for every child
      // type (a DateType child would otherwise sketch epoch-day ints via
      // v.toString, and heavyHittersExact's string recount filter would
      // never match them). String→string cast is a no-op.
      FreqSketchAgg(org.apache.spark.sql.catalyst.expressions.Cast(
        es.head, StringType), lg).toAggregateExpression()
    }, "scala_udf")
  }
}
