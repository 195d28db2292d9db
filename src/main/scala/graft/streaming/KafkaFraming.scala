package graft.streaming

import java.nio.ByteBuffer

/** Kafka RecordBatch v2 wire codec — the PUBLIC on-wire/on-disk framing
  * every Kafka consumer decodes (magic 2, CRC32C over the
  * attributes→records section, zigzag-varint record fields; format per
  * the Apache Kafka protocol guide / `DefaultRecordBatch` spec).
  *
  * Why this exists: the container resolves no Kafka jars (connector AND
  * broker are offline-unresolvable — documented in
  * `sources/Sources.scala` S1), so the network path cannot execute. The
  * FRAMING, however, is pure bytes: this codec lets the engine produce
  * and consume real Kafka-framed record batches — segment-dump replay,
  * tiered-storage reads, golden-byte tests — with the exact bit layout a
  * broker emits, and it is what the oracle-gated `q_kafka_roundtrip`
  * (encode → decode over the events table) executes distributed via the
  * `kafka_batch_encode` / `kafka_batch_decode` expressions.
  *
  * Compression: NONE (attributes 0) and GZIP (attributes 1 — the codec
  * the JDK ships, so no jar needed; the compressed region is the records
  * payload after the `count` field, per the protocol). Snappy/LZ4/ZSTD
  * are exactly the jar surface that is offline-blocked, and the decoder
  * REJECTS those loudly rather than mis-parsing them.
  */
object KafkaFraming {

  /** One decoded record (key/value may be null — Kafka tombstones). */
  final case class KRecord(offset: Long, timestampMs: Long,
                           key: Array[Byte], value: Array[Byte])

  private def writeVarLong(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63) // zigzag
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def readVarLong(b: ByteBuffer): Long = {
    var x = 0L; var shift = 0
    var cur = b.get()
    while ((cur & 0x80) != 0) {
      x |= (cur & 0x7fL) << shift; shift += 7; cur = b.get()
    }
    x |= (cur & 0x7fL) << shift
    (x >>> 1) ^ -(x & 1L) // un-zigzag
  }

  /** Encode ONE uncompressed RecordBatch v2. `recs` are (timestampMs, key,
    * value) in offset order (offsetDelta = position); null key/value encode
    * as length −1. baseTimestamp is the batch minimum, as producers emit. */
  def encodeBatch(baseOffset: Long,
                  recs: Seq[(Long, Array[Byte], Array[Byte])],
                  gzip: Boolean = false): Array[Byte] = {
    require(recs.nonEmpty, "empty batch")
    val baseTs = recs.iterator.map(_._1).min
    val maxTs = recs.iterator.map(_._1).max
    val recBytes = new java.io.ByteArrayOutputStream()
    recs.iterator.zipWithIndex.foreach { case ((ts, k, v), i) =>
      val r = new java.io.ByteArrayOutputStream()
      r.write(0) // record attributes (unused)
      writeVarLong(r, ts - baseTs)
      writeVarLong(r, i.toLong)
      if (k == null) writeVarLong(r, -1L)
      else { writeVarLong(r, k.length.toLong); r.write(k) }
      if (v == null) writeVarLong(r, -1L)
      else { writeVarLong(r, v.length.toLong); r.write(v) }
      writeVarLong(r, 0L) // header count
      val rb = r.toByteArray
      writeVarLong(recBytes, rb.length.toLong)
      recBytes.write(rb)
    }
    val rb =
      if (!gzip) recBytes.toByteArray
      else { // GZIP wraps the records payload only; count stays plaintext
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(recBytes.toByteArray); gz.close()
        bos.toByteArray
      }
    // CRC32C section: attributes .. records
    val sec = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + rb.length)
    sec.putShort(if (gzip) 1 else 0) // attributes: codec bits 0-2, CreateTime
    sec.putInt(recs.size - 1)       // lastOffsetDelta
    sec.putLong(baseTs)
    sec.putLong(maxTs)
    sec.putLong(-1L)                // producerId (non-transactional)
    sec.putShort(-1)                // producerEpoch
    sec.putInt(-1)                  // baseSequence
    sec.putInt(recs.size)
    sec.put(rb)
    val secArr = sec.array()
    val crc = new java.util.zip.CRC32C
    crc.update(secArr)
    val batchLength = 4 + 1 + 4 + secArr.length // leaderEpoch+magic+crc+section
    val out = ByteBuffer.allocate(8 + 4 + batchLength)
    out.putLong(baseOffset)
    out.putInt(batchLength)
    out.putInt(-1)                  // partitionLeaderEpoch
    out.put(2.toByte)               // magic v2
    out.putInt(crc.getValue.toInt)
    out.put(secArr)
    out.array()
  }

  /** Decode every RecordBatch v2 in `bytes` (a segment chunk may hold many
    * batches back-to-back). Validates magic and CRC32C; rejects compressed
    * batches. Throws IllegalArgumentException on any corruption — a codec
    * must fail loudly, not yield garbage rows. */
  def decode(bytes: Array[Byte]): Seq[KRecord] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = Seq.newBuilder[KRecord]
    while (buf.remaining() >= 12) {
      val baseOffset = buf.getLong
      val batchLength = buf.getInt
      require(batchLength >= 9 && batchLength <= buf.remaining(),
        s"bad batchLength $batchLength")
      buf.getInt // partitionLeaderEpoch — not covered by CRC
      val magic = buf.get()
      require(magic == 2, s"unsupported magic $magic (RecordBatch v2 only)")
      val crcStored = buf.getInt
      val sec = new Array[Byte](batchLength - 9)
      buf.get(sec)
      val crc = new java.util.zip.CRC32C
      crc.update(sec)
      require(crc.getValue.toInt == crcStored, "CRC32C mismatch")
      val sb0 = ByteBuffer.wrap(sec)
      val attributes = sb0.getShort
      val codec = attributes & 0x07
      require(codec == 0 || codec == 1,
        s"codec $codec batch — snappy/lz4/zstd are offline-blocked, refusing to mis-parse")
      sb0.getInt  // lastOffsetDelta
      val baseTs = sb0.getLong
      sb0.getLong // maxTimestamp
      sb0.getLong; sb0.getShort; sb0.getInt // producer id / epoch / baseSequence
      val count = sb0.getInt
      val sb =
        if (codec == 0) sb0
        else { // GZIP: inflate the records payload that follows `count`
          val packed = new Array[Byte](sb0.remaining()); sb0.get(packed)
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(packed))
          ByteBuffer.wrap(gz.readAllBytes())
        }
      var i = 0
      while (i < count) {
        readVarLong(sb) // record length (redundant with field walk)
        sb.get()        // record attributes
        val tsDelta = readVarLong(sb)
        val offDelta = readVarLong(sb)
        val kLen = readVarLong(sb).toInt
        val k = if (kLen < 0) null
                else { val a = new Array[Byte](kLen); sb.get(a); a }
        val vLen = readVarLong(sb).toInt
        val v = if (vLen < 0) null
                else { val a = new Array[Byte](vLen); sb.get(a); a }
        var h = readVarLong(sb).toInt
        while (h > 0) { // skip headers: key (non-null) + value
          val hk = readVarLong(sb).toInt; sb.position(sb.position() + hk)
          val hv = readVarLong(sb).toInt
          if (hv > 0) sb.position(sb.position() + hv)
          h -= 1
        }
        out += KRecord(baseOffset + offDelta, baseTs + tsDelta, k, v)
        i += 1
      }
    }
    out.result()
  }
}
