package graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroOcf

/** From-scratch Avro Object Container File codec vs the OFFICIAL avro-java
  * library (on the Spark classpath): byte-level interop in BOTH directions
  * — files our writer emits parse with avro-java's DataFileReader, and
  * files avro-java writes (null AND deflate codecs, its random sync
  * marker) parse with our decoder. Plus the loud-failure contracts and the
  * distributed SQL surface. */
class AvroOcfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val st = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("flag", BooleanType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))

  private def row(id: Long, name: String, score: Double, flag: Boolean,
      payload: Array[Byte], vec: Array[Float]): InternalRow =
    InternalRow(id, if (name == null) null else UTF8String.fromString(name),
      score, flag, payload, new GenericArrayData(vec.map(f => f: Any)))

  // negative longs (zigzag), unicode + empty strings, nulls on both
  // nullable fields, extreme doubles, empty arrays/bytes
  private val rows = Seq(
    row(0L, "plain", 1.5, flag = true, Array[Byte](1, 2, 3), Array(0.25f, -0.5f)),
    row(-1L, "héllо 世界", -0.0, flag = false, Array.empty[Byte], Array.empty[Float]),
    row(Long.MinValue + 1, null, Double.MaxValue, flag = true, null, Array(1e-30f)),
    row(Long.MaxValue, "", Double.MinPositiveValue, flag = false, Array[Byte](-128, 127),
      Array(Float.MaxValue)))

  test("our encode → our decode round-trips every edge row bit-exactly") {
    val bytes = AvroOcf.encodeFile(st, rows.iterator)
    val back = AvroOcf.decodeFile(st, bytes)
    assert(back.length == rows.length)
    rows.zip(back).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert((a.isNullAt(1) && b.isNullAt(1)) ||
        a.getUTF8String(1) == b.getUTF8String(1))
      assert(java.lang.Double.doubleToLongBits(a.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(2)))
      assert(a.getBoolean(3) == b.getBoolean(3))
      assert((a.isNullAt(4) && b.isNullAt(4)) ||
        java.util.Arrays.equals(a.getBinary(4), b.getBinary(4)))
      assert(a.getArray(5).toFloatArray().sameElements(b.getArray(5).toFloatArray()))
    }
  }

  test("re-encoding identical input yields identical bytes (pinned sync marker)") {
    val a = AvroOcf.encodeFile(st, rows.iterator)
    val b = AvroOcf.encodeFile(st, rows.iterator)
    assert(java.util.Arrays.equals(a, b))
  }

  test("interop A: avro-java's DataFileReader parses a file our writer emitted") {
    val bytes = AvroOcf.encodeFile(st, rows.iterator)
    val schema = new org.apache.avro.Schema.Parser().parse(AvroOcf.schemaJson(st))
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord](schema))
    val recs = reader.iterator().asScala.toVector
    reader.close()
    assert(recs.length == rows.length)
    assert(recs(0).get("id") == 0L)
    assert(recs(0).get("name").toString == "plain")
    assert(recs(1).get("id") == -1L)
    assert(recs(1).get("name").toString == "héllо 世界")
    assert(recs(1).get("score") == -0.0)
    assert(recs(2).get("name") == null)
    assert(recs(2).get("payload") == null)
    assert(recs(3).get("score") == Double.MinPositiveValue)
    val vec0 = recs(0).get("vec").asInstanceOf[java.util.List[Float]].asScala
    assert(vec0 == Seq(0.25f, -0.5f))
    val pay3 = recs(3).get("payload").asInstanceOf[java.nio.ByteBuffer]
    assert(pay3.remaining() == 2 && pay3.get(0) == -128 && pay3.get(1) == 127)
  }

  private def avroJavaWrite(codec: Option[org.apache.avro.file.CodecFactory]): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(AvroOcf.schemaJson(st))
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    codec.foreach(w.setCodec)
    w.create(schema, out)
    rows.foreach { r =>
      val rec = new GenericData.Record(schema)
      rec.put("id", r.getLong(0))
      rec.put("name", if (r.isNullAt(1)) null else r.getUTF8String(1).toString)
      rec.put("score", r.getDouble(2))
      rec.put("flag", r.getBoolean(3))
      rec.put("payload",
        if (r.isNullAt(4)) null else java.nio.ByteBuffer.wrap(r.getBinary(4)))
      rec.put("vec", r.getArray(5).toFloatArray().map(f => f: java.lang.Float).toList.asJava)
      w.append(rec)
      w.sync() // several data blocks — our reader must walk block boundaries
    }
    w.close()
    out.toByteArray
  }

  test("interop B: our decoder parses avro-java output (null codec, multi-block)") {
    val back = AvroOcf.decodeFile(st, avroJavaWrite(None))
    assert(back.length == rows.length)
    assert(back(1).getUTF8String(1).toString == "héllо 世界")
    assert(back(2).isNullAt(1) && back(2).isNullAt(4))
    assert(back(3).getLong(0) == Long.MaxValue)
    assert(back(0).getArray(5).toFloatArray().sameElements(Array(0.25f, -0.5f)))
  }

  test("interop C: our decoder inflates avro-java's deflate codec") {
    val bytes = avroJavaWrite(Some(org.apache.avro.file.CodecFactory.deflateCodec(6)))
    val back = AvroOcf.decodeFile(st, bytes)
    assert(back.length == rows.length)
    assert(back(1).getUTF8String(1).toString == "héllо 世界")
    assert(java.lang.Double.doubleToLongBits(back(1).getDouble(2)) ==
      java.lang.Double.doubleToLongBits(-0.0))
  }

  test("loud failures: bad magic, schema mismatch, unsupported codec") {
    val good = AvroOcf.encodeFile(st, rows.iterator)
    val corrupt = good.clone(); corrupt(0) = 'X'
    intercept[IllegalArgumentException](AvroOcf.decodeFile(st, corrupt))
    val wrong = StructType(Seq(StructField("id", LongType, nullable = false)))
    intercept[IllegalArgumentException](AvroOcf.decodeFile(wrong, good))
  }

  test("SQL surface: encode/decode expressions round-trip distributed") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, s"n$i", i * 0.5)).toDF("id", "name", "score")
      .groupBy(org.apache.spark.sql.functions.expr("id % 7").as("g"))
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct($"id", $"name", $"score"))).as("recs"))
      .selectExpr("avro_ocf_encode(recs) AS f")
      .selectExpr("explode(avro_ocf_decode(f, 'id BIGINT, name STRING, score DOUBLE')) AS r")
      .selectExpr("r.id AS id", "r.name AS name", "r.score AS score")
    assert(df.count() == 300)
    assert(df.agg(org.apache.spark.sql.functions.sum($"id")).head.getLong(0) == 300L * 301 / 2)
    assert(df.filter($"name" === "n42" && $"score" === 21.0).count() == 1)
  }
}
