package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apache Avro Object Container File codec, built from scratch against the
  * PUBLIC Avro 1.x specification (file magic `Obj\x01`, metadata map with
  * `avro.schema`/`avro.codec`, 16-byte sync marker, zigzag-varint binary
  * encoding) — the interchange format the reference's lake zone would
  * exchange with Kafka Connect / Debezium deployments (the reference reads
  * its CDC feed through Kafka; Avro OCF is that ecosystem's at-rest
  * serialization; ref: spark/SaveDelta.scala:104-112 consumes the topic
  * this format archives). No spark-avro module ships in this container, so
  * like the XLSX (ECMA-376) and Kafka RecordBatch v2 codecs this speaks
  * the wire format directly; AvroOcfSpec proves byte-level interop against
  * the official avro-java library (present on the Spark classpath) in BOTH
  * directions, including its deflate-compressed output.
  *
  * Scale shape: one OCF blob is encoded/decoded per ROW of a grouped
  * relation via the `avro_ocf_encode`/`avro_ocf_decode` expressions
  * (functions/AvroOcfExpr.scala), so a 100 TB corpus's files are produced
  * where the groups live — never on the driver.
  *
  * Supported Catalyst subset: flat structs of boolean/int/long/float/
  * double/string/binary plus arrays of those scalars; nullable fields map
  * to Avro unions `["null", T]`. Deterministic output: records are written
  * in input order, one data block per file, sync marker = md5(schema JSON)
  * — re-encoding identical input yields identical bytes (avro-java
  * randomizes the sync; only OUR writer pins it, readers never care).
  */
object AvroOcf {

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  // --- varint primitives (Avro zigzag-varint, same wire form as Kafka's) ---

  private[sources] def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63) // zigzag
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private[sources] def readVarLong(b: ByteBuffer): Long = {
    var x = 0L; var shift = 0; var cur = 0L
    do {
      cur = b.get() & 0xffL
      x |= (cur & 0x7f) << shift
      shift += 7
      if (shift > 70) throw new IllegalArgumentException("avro varint too long")
    } while ((cur & 0x80) != 0)
    (x >>> 1) ^ -(x & 1L) // un-zigzag
  }

  private def writeBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
  }

  private def readBytesV(b: ByteBuffer): Array[Byte] = {
    val n = readVarLong(b)
    require(n >= 0 && n <= b.remaining(), s"avro bytes length $n out of range")
    val a = new Array[Byte](n.toInt); b.get(a); a
  }

  // --- schema JSON (emit + parse via Jackson, which spark-sql ships) ---

  /** Avro primitive name for a Catalyst scalar. */
  private def avroPrim(t: DataType): String = t match {
    case BooleanType => "boolean"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "bytes"
    case other => throw new IllegalArgumentException(
      s"avro_ocf: unsupported scalar ${other.simpleString}")
  }

  private def catalystPrim(name: String): DataType = name match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "bytes" => BinaryType
    case other => throw new IllegalArgumentException(s"avro_ocf: unsupported avro type '$other'")
  }

  /** Emit the Avro record-schema JSON for a flat Catalyst struct. */
  def schemaJson(st: StructType): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("type", "record"); root.put("name", "row")
    val fields = root.putArray("fields")
    st.fields.foreach { f =>
      val fn = fields.addObject()
      fn.put("name", f.name)
      def typeNode(t: DataType): Either[String, ObjectNode] = t match {
        case ArrayType(et, _) =>
          val a = m.createObjectNode(); a.put("type", "array"); a.put("items", avroPrim(et))
          Right(a)
        case scalar => Left(avroPrim(scalar))
      }
      if (f.nullable) {
        val u = m.createArrayNode()
        u.add("null")
        typeNode(f.dataType) match {
          case Left(s) => u.add(s)
          case Right(n) => u.add(n)
        }
        val _ = fn.replace("type", u)
      } else typeNode(f.dataType) match {
        case Left(s) => fn.put("type", s)
        case Right(n) => val _ = fn.replace("type", n)
      }
    }
    m.writeValueAsString(root)
  }

  /** Parse an Avro record-schema JSON back to the Catalyst struct it maps
    * to under this codec's subset. Fails loudly outside the subset. */
  def parseSchemaJson(json: String): StructType = {
    val root = new ObjectMapper().readTree(json)
    require(root.path("type").asText() == "record",
      s"avro_ocf: expected a record schema, got ${root.path("type")}")
    val fields = root.path("fields") match {
      case a: ArrayNode => a
      case _ => throw new IllegalArgumentException("avro_ocf: record schema without fields")
    }
    val out = Array.newBuilder[StructField]
    fields.forEach { f =>
      val name = f.path("name").asText()
      val t = f.path("type")
      def oneType(n: com.fasterxml.jackson.databind.JsonNode): DataType =
        if (n.isTextual) catalystPrim(n.asText())
        else if (n.isObject && n.path("type").asText() == "array")
          ArrayType(catalystPrim(n.path("items").asText()), containsNull = false)
        else throw new IllegalArgumentException(s"avro_ocf: unsupported type node $n")
      if (t.isArray) { // union — only ["null", T] supported
        require(t.size() == 2 && t.get(0).asText() == "null",
          s"avro_ocf: only [\"null\", T] unions supported, got $t")
        out += StructField(name, oneType(t.get(1)), nullable = true)
      } else out += StructField(name, oneType(t), nullable = false)
    }
    StructType(out.result())
  }

  // --- record body encode/decode against a Catalyst struct ---

  private def writeValue(out: ByteArrayOutputStream, t: DataType, row: InternalRow,
      i: Int): Unit = t match {
    case BooleanType => out.write(if (row.getBoolean(i)) 1 else 0)
    case IntegerType => writeVarLong(out, row.getInt(i).toLong)
    case LongType => writeVarLong(out, row.getLong(i))
    case FloatType =>
      val bits = java.lang.Float.floatToIntBits(row.getFloat(i))
      out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
      out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
    case DoubleType =>
      var bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
      var k = 0
      while (k < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; k += 1 }
    case StringType => writeBytes(out, row.getUTF8String(i).getBytes)
    case BinaryType => writeBytes(out, row.getBinary(i))
    case ArrayType(et, _) =>
      val arr = row.getArray(i)
      val n = arr.numElements()
      if (n > 0) {
        writeVarLong(out, n.toLong)
        var j = 0
        while (j < n) { writeArrayElem(out, et, arr, j); j += 1 }
      }
      writeVarLong(out, 0L) // block terminator
    case other => throw new IllegalArgumentException(
      s"avro_ocf: unsupported type ${other.simpleString}")
  }

  private def writeArrayElem(out: ByteArrayOutputStream, t: DataType, arr: ArrayData,
      j: Int): Unit = t match {
    case BooleanType => out.write(if (arr.getBoolean(j)) 1 else 0)
    case IntegerType => writeVarLong(out, arr.getInt(j).toLong)
    case LongType => writeVarLong(out, arr.getLong(j))
    case FloatType =>
      val bits = java.lang.Float.floatToIntBits(arr.getFloat(j))
      out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
      out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
    case DoubleType =>
      var bits = java.lang.Double.doubleToLongBits(arr.getDouble(j))
      var k = 0
      while (k < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; k += 1 }
    case StringType => writeBytes(out, arr.getUTF8String(j).getBytes)
    case BinaryType => writeBytes(out, arr.getBinary(j))
    case other => throw new IllegalArgumentException(
      s"avro_ocf: unsupported array element ${other.simpleString}")
  }

  private def readValue(b: ByteBuffer, t: DataType): Any = t match {
    case BooleanType => b.get() != 0
    case IntegerType => readVarLong(b).toInt
    case LongType => readVarLong(b)
    case FloatType =>
      val bits = (b.get() & 0xff) | ((b.get() & 0xff) << 8) |
        ((b.get() & 0xff) << 16) | ((b.get() & 0xff) << 24)
      java.lang.Float.intBitsToFloat(bits)
    case DoubleType =>
      var bits = 0L; var k = 0
      while (k < 8) { bits |= (b.get() & 0xffL) << (8 * k); k += 1 }
      java.lang.Double.longBitsToDouble(bits)
    case StringType => UTF8String.fromBytes(readBytesV(b))
    case BinaryType => readBytesV(b)
    case ArrayType(et, _) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
      var n = readVarLong(b)
      while (n != 0) {
        if (n < 0) { n = -n; readVarLong(b): Unit } // sized block form: skip byte count
        var j = 0L
        while (j < n) { buf += readValue(b, et); j += 1 }
        n = readVarLong(b)
      }
      new GenericArrayData(buf.toArray)
    case other => throw new IllegalArgumentException(
      s"avro_ocf: unsupported type ${other.simpleString}")
  }

  // --- OCF file assembly ---

  /** Encode rows (as Catalyst InternalRows of `st`) into one complete OCF. */
  def encodeFile(st: StructType, rows: Iterator[InternalRow]): Array[Byte] = {
    val json = schemaJson(st)
    val sync = java.security.MessageDigest.getInstance("MD5").digest(json.getBytes(UTF_8))
    val body = new ByteArrayOutputStream()
    var count = 0L
    rows.foreach { row =>
      var i = 0
      while (i < st.length) {
        val f = st.fields(i)
        if (f.nullable) {
          if (row.isNullAt(i)) writeVarLong(body, 0L)
          else { writeVarLong(body, 1L); writeValue(body, f.dataType, row, i) }
        } else {
          require(!row.isNullAt(i), s"avro_ocf: null in non-nullable field ${f.name}")
          writeValue(body, f.dataType, row, i)
        }
        i += 1
      }
      count += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    writeVarLong(out, 2L) // metadata map: one block of 2 entries
    writeBytes(out, "avro.schema".getBytes(UTF_8)); writeBytes(out, json.getBytes(UTF_8))
    writeBytes(out, "avro.codec".getBytes(UTF_8)); writeBytes(out, "null".getBytes(UTF_8))
    writeVarLong(out, 0L) // map terminator
    out.write(sync, 0, 16)
    if (count > 0) {
      val b = body.toByteArray
      writeVarLong(out, count); writeVarLong(out, b.length.toLong)
      out.write(b, 0, b.length); out.write(sync, 0, 16)
    }
    out.toByteArray
  }

  /** Erase nullability/containsNull for the schema-on-read compatibility
    * check: the FILE's unions govern how bytes parse; the declared type
    * only has to agree on field names, order, and underlying types. */
  private def erased(st: StructType): Seq[(String, DataType)] =
    st.fields.toSeq.map { f =>
      f.name -> (f.dataType match {
        case ArrayType(et, _) => ArrayType(et, containsNull = false)
        case t => t
      })
    }

  /** Decode a complete OCF into rows, checking the embedded schema is
    * compatible with the declared one (schema-on-read contract — a silent
    * mismatch would misparse every record). The file schema's unions drive
    * the parse; nullability declared by the caller is advisory. Handles
    * the `null` and `deflate` codecs (raw RFC 1951 streams, inflated with
    * the JDK) and multi-block files. */
  def decodeFile(expected: StructType, bytes: Array[Byte]): Seq[InternalRow] = {
    val b = ByteBuffer.wrap(bytes)
    val magic = new Array[Byte](4); b.get(magic)
    require(java.util.Arrays.equals(magic, Magic), "avro_ocf: bad file magic")
    var schema: String = null; var codec = "null"
    var n = readVarLong(b)
    while (n != 0) {
      if (n < 0) { n = -n; readVarLong(b): Unit } // sized block form
      var j = 0L
      while (j < n) {
        val k = new String(readBytesV(b), UTF_8)
        val v = readBytesV(b)
        if (k == "avro.schema") schema = new String(v, UTF_8)
        else if (k == "avro.codec") codec = new String(v, UTF_8)
        j += 1
      }
      n = readVarLong(b)
    }
    require(schema != null, "avro_ocf: file has no avro.schema")
    val fileSchema = parseSchemaJson(schema)
    require(erased(fileSchema) == erased(expected),
      s"avro_ocf: file schema ${fileSchema.simpleString} incompatible with " +
        s"declared ${expected.simpleString}")
    require(codec == "null" || codec == "deflate", s"avro_ocf: unsupported codec '$codec'")
    val sync = new Array[Byte](16); b.get(sync)

    val rows = Seq.newBuilder[InternalRow]
    while (b.remaining() > 0) {
      val cnt = readVarLong(b)
      val size = readVarLong(b)
      require(size >= 0 && size <= b.remaining(), s"avro_ocf: block size $size out of range")
      val block = new Array[Byte](size.toInt); b.get(block)
      val data = if (codec == "deflate") inflateRaw(block) else block
      val db = ByteBuffer.wrap(data)
      var r = 0L
      while (r < cnt) {
        val vals = new Array[Any](fileSchema.length)
        var i = 0
        while (i < fileSchema.length) {
          val f = fileSchema.fields(i)
          if (f.nullable) {
            val branch = readVarLong(db)
            vals(i) = if (branch == 0L) null else readValue(db, f.dataType)
          } else vals(i) = readValue(db, f.dataType)
          i += 1
        }
        rows += InternalRow.fromSeq(vals.toIndexedSeq)
        r += 1
      }
      val blockSync = new Array[Byte](16); b.get(blockSync)
      require(java.util.Arrays.equals(blockSync, sync), "avro_ocf: sync marker mismatch")
    }
    rows.result()
  }

  private def inflateRaw(deflated: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // nowrap: avro deflate is raw RFC 1951
    try {
      inf.setInput(deflated)
      val out = new ByteArrayOutputStream(deflated.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) throw new IllegalArgumentException(
          "avro_ocf: truncated deflate block")
        out.write(buf, 0, k)
      }
      out.toByteArray
    } finally inf.end()
  }
}
