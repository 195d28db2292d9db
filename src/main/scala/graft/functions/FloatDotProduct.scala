package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two `array<float>` / `array<double>`
  * columns (any mix) with double accumulation in index order.
  *
  * Why a custom Expression (guide preference (b) after composing built-ins):
  * the built-in composition `aggregate(zip_with(a, b, (x,y) -> ...), ...)`
  * allocates a boxed intermediate array and evaluates two lambda closures
  * per element — per-row allocation in the hottest ANN loop. This kernel is
  * a tight primitive loop over the two `ArrayData` buffers, fully inside
  * whole-stage codegen (~3-4× faster at 64 dims, see SimilaritySpec).
  * Double arrays are accepted because trained IVF centroids are per-cluster
  * MEANS (doubles) dotted against float embeddings every probe.
  *
  * Semantics are IDENTICAL to the fold the oracle uses: left-to-right over
  * indices, each element widened to double, one running accumulator — so
  * DuckDB's `list_reduce` fold reproduces results bit-for-bit.
  * Array-length mismatch truncates to the shorter (like `zip_with`); null
  * arrays propagate null (nullIntolerant); null ELEMENTS are not expected
  * (embeddings are dense) and read as 0.0 per ArrayData semantics.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql]);
  // validate the two array inputs directly.
  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "float_dot"

  private def get(x: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => x.getFloat(i).toDouble
    case _         => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elem(left.dataType).get, elem(right.dataType).get)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      def acc(v: String, t: DataType) = t match {
        case FloatType => s"(double) $v.getFloat($i)"
        case _         => s"$v.getDouble($i)"
      }
      val xe = acc(x, elem(left.dataType).get)
      val ye = acc(y, elem(right.dataType).get)
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double acc_${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  acc_${ev.value} += $xe * $ye;
         |}
         |${ev.value} = acc_${ev.value};
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native SQL functions. */
object GraftFunctions {
  /** Idempotent; makes `float_dot(a, b)` / `simhash64(arr)` available to
    * spark.sql/expr. Skips re-registration when already present — every
    * query constructor calls this, and re-replacing per query costs
    * registry churn + a WARN per function per query. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(new org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot"))) {
      reg.createOrReplaceTempFunction(
        "float_dot", exprs => FloatDotProduct(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "simhash64", exprs => SimHash64(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "srp_sig", exprs => SrpSignature(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "freq_sketch_agg", exprs => FreqSketchAgg(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "freq_merge_agg", exprs => FreqMergeAgg(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "freq_items", exprs => FreqItems(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "freq_max_error", exprs => FreqMaxError(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "sorted_intersect_count",
        exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "kafka_batch_encode", exprs => KafkaBatchEncode(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "kafka_batch_decode", exprs => KafkaBatchDecode(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "xlsx_records", exprs => XlsxRecords(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "avro_ocf_encode", exprs => AvroOcfEncode(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "avro_ocf_decode", exprs => AvroOcfDecode(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "xml_encode", exprs => XmlEncode(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "xml_records", exprs => XmlRecords(exprs(0), exprs(1)), "built-in")
    }
  }
}

/** Session-extension registration — the production path: a cluster enables
  * graft's functions for every session via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), the same mechanism the
  * reference's Delta deployment used for its extension
  * (ref: spark/Dockerfile:15-16, rewrite_delta_dag.py:38-39). The Verify and
  * Bench mains build their sessions through this. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("srp_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SrpSignature].getName, "srp_sig"),
      (exprs: Seq[Expression]) => SrpSignature(exprs(0), exprs(1))))
    // frequent-items sketch family (FreqSketch) — no Spark built-in exists
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("freq_sketch_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FreqSketchAgg].getName, "freq_sketch_agg"),
      (exprs: Seq[Expression]) => FreqSketchAgg(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("freq_merge_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FreqMergeAgg].getName, "freq_merge_agg"),
      (exprs: Seq[Expression]) => FreqMergeAgg(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("freq_items"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FreqItems].getName, "freq_items"),
      (exprs: Seq[Expression]) => FreqItems(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("freq_max_error"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FreqMaxError].getName, "freq_max_error"),
      (exprs: Seq[Expression]) => FreqMaxError(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    // Kafka RecordBatch v2 wire framing (streaming/KafkaFraming.scala)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("kafka_batch_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[KafkaBatchEncode].getName, "kafka_batch_encode"),
      (exprs: Seq[Expression]) => KafkaBatchEncode(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("kafka_batch_decode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[KafkaBatchDecode].getName, "kafka_batch_decode"),
      (exprs: Seq[Expression]) => KafkaBatchDecode(exprs.head)))
    // native XLSX ingest (sources/Xlsx.scala — JDK zip + StAX, no POI jar)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("xlsx_records"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[XlsxRecords].getName, "xlsx_records"),
      (exprs: Seq[Expression]) => XlsxRecords(exprs.head)))
    // Avro Object Container File codec (sources/AvroOcf.scala — from-scratch
    // wire format, avro-java interop spec-proved)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("avro_ocf_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[AvroOcfEncode].getName, "avro_ocf_encode"),
      (exprs: Seq[Expression]) => AvroOcfEncode(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("avro_ocf_decode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[AvroOcfDecode].getName, "avro_ocf_decode"),
      (exprs: Seq[Expression]) => AvroOcfDecode(exprs(0), exprs(1))))
    // XML corpus codec (sources/XmlCorpus.scala — JDK StAX, no extra jar)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("xml_encode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[XmlEncode].getName, "xml_encode"),
      (exprs: Seq[Expression]) => XmlEncode(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("xml_records"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[XmlRecords].getName, "xml_records"),
      (exprs: Seq[Expression]) => XmlRecords(exprs(0), exprs(1))))
    // P11 session-role column masking as a resolution rule (see MaskingRule).
    e.injectResolutionRule(session => graft.mask.MaskingRule(session))
    // Lakehouse SQL DML: DELETE/UPDATE/MERGE on graft-catalog tables lower
    // to the TxnTable engines; OPTIMIZE/VACUUM parse via the extension
    // (graft/sql/GraftDml.scala).
    e.injectResolutionRule(session => graft.sql.GraftDmlRule(session))
    e.injectPlannerStrategy(session => graft.sql.GraftDmlStrategy(session))
    e.injectParser((session, delegate) =>
      new graft.sql.GraftSqlParser(session, delegate))
  }
}
