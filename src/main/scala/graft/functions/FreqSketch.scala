package graft.functions

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable FREQUENT-ITEMS (heavy-hitters) sketch aggregates — the one
  * DataSketches family Spark 4.1 still has no SQL surface for (the built-in
  * `count_min_sketch` emits a binary with no merge/query functions, and the
  * KLL/theta/HLL families all landed as built-ins). Custom
  * `TypedImperativeAggregate`s are therefore preference (b): Spark's
  * partial-aggregation machinery serializes the sketch buffer between the
  * map-side and final stages, so the heavy per-row counting happens
  * map-side and only ~KB sketches cross the exchange.
  *
  * Why this matters at 100 TB: exact heavy-hitters needs a full
  * (key, item)-grain shuffle — the item-cardinality exchange is the cost.
  * A LongsSketch(maxMapSize) guarantees every item with true count
  * ≥ N/maxMapSize survives, with error ≤ getMaximumError(); while no purge
  * has occurred (distinct items under the map's load factor) estimates are
  * EXACT and getMaximumError()==0 — which the oracle gate pins, so the
  * correctness contract is exactness, not luck. Sketch bytes use the
  * DataSketches wire format (cross-binding readable, storable at rest —
  * same contract as the KLL/theta daily artifacts).
  */
object FreqSketch {
  /** Power of 2; sketches stay purge-free (exact) while distinct items per
    * group stay under the ~0.75 load factor — far above every test corpus,
    * and the documented ε = N/maxMapSize bound takes over beyond it. */
  val MaxMapSize: Int = 16384

  /** Deserialize the DataSketches wire format (public: specs and at-rest
    * consumers read stored sketch columns through this). */
  def fromBytes(b: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(b))
}

/** `freq_sketch_agg(x)` — aggregate long items into a serialized
  * frequent-items sketch (BINARY). Nulls are skipped. */
case class FreqSketchAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(FreqSketch.MaxMapSize)
  override def update(buf: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }
  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): LongsSketch = FreqSketch.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** `freq_merge_agg(sk)` — union stored frequent-items sketch binaries
  * (BINARY): the re-aggregation path over at-rest daily sketches. */
case class FreqMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary frequent-items sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_merge_agg"

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(FreqSketch.MaxMapSize)
  override def update(buf: LongsSketch, row: InternalRow): LongsSketch = {
    val v = child.eval(row)
    if (v != null) buf.merge(FreqSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): LongsSketch = FreqSketch.fromBytes(b)

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** `freq_items(sk, threshold)` — every item whose estimated count is
  * STRICTLY above `threshold`, as array<struct<item, est>> sorted by
  * (est DESC, item ASC) for deterministic downstream explode order. The
  * NO_FALSE_NEGATIVES guarantee plus the explicit est filter makes the
  * result the exact over-threshold set whenever the sketch is purge-free.
  * CodegenFallback: runs once per GROUP in the final projection. */
case class FreqItems(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "freq_items"
  override def nullSafeEval(sk: Any, thr: Any): Any = {
    val s = FreqSketch.fromBytes(sk.asInstanceOf[Array[Byte]])
    val t = thr.asInstanceOf[Long]
    val rows = s.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .filter(_.getEstimate > t)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .map(r => new GenericInternalRow(Array[Any](r.getItem, r.getEstimate)))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FreqItems = copy(left = l, right = r)
}

/** `freq_max_error(sk)` — the sketch's worst-case estimate error
  * (getMaximumError; 0 ⟺ purge-free ⟺ every estimate exact). Oracle
  * gates pin this to 0, turning the approximate operator into an exactness
  * proof at test scale. */
case class FreqMaxError(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary frequent-items sketch, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "freq_max_error"
  override def nullSafeEval(sk: Any): Any =
    FreqSketch.fromBytes(sk.asInstanceOf[Array[Byte]]).getMaximumError
  override protected def withNewChildInternal(c: Expression): FreqMaxError =
    copy(child = c)
}
