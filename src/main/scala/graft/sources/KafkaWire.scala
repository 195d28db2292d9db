package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka WIRE PROTOCOL codec + minimal consumer client, pure JDK.
  *
  * The container resolves no Kafka jar (connector or client), but the
  * protocol itself is public (Apache Kafka protocol guide): size-prefixed
  * frames, a fixed request header (api_key, api_version, correlation_id,
  * client_id), and per-API big-endian schemas. This module speaks exactly
  * the four APIs a consumer needs, at fixed pre-flexible versions (no
  * tagged fields — simplest on-the-wire layout that still carries
  * RecordBatch v2):
  *
  *  - ApiVersions v0 (key 18) — the handshake every client opens with;
  *  - Metadata    v0 (key 3)  — topic → partition → leader discovery;
  *  - ListOffsets v1 (key 2)  — earliest (−2) / latest (−1) offsets;
  *  - Fetch       v4 (key 1)  — the first Fetch version that returns
  *    magic-2 RecordBatch frames (KIP-98), decoded by
  *    [[graft.streaming.KafkaFraming]].
  *
  * [[Client]] is what the `kafka-lite` streaming source
  * ([[KafkaLite]]) runs on driver (offset discovery) and executors
  * (partition fetch) — the same topology as the real connector, one
  * socket per task. The test tree's broker stub serves the same codec
  * from the other side, so a spec drives the full consumer path over a
  * real TCP socket with zero external jars.
  */
object KafkaWire {

  val ApiFetch: Short = 1
  val ApiListOffsets: Short = 2
  val ApiMetadata: Short = 3
  val ApiApiVersions: Short = 18

  // timestamps with protocol meaning for ListOffsets
  val OffsetLatest: Long = -1L
  val OffsetEarliest: Long = -2L

  /** Big-endian writer for one frame body. */
  final class Out {
    private val b = new ByteArrayOutputStream()
    def i8(v: Int): Out = { b.write(v & 0xff); this }
    def i16(v: Int): Out = { b.write((v >> 8) & 0xff); b.write(v & 0xff); this }
    def i32(v: Int): Out = { i16(v >> 16); i16(v); this }
    def i64(v: Long): Out = { i32((v >> 32).toInt); i32(v.toInt); this }
    def str(s: String): Out = { val a = s.getBytes(UTF_8); i16(a.length); b.write(a, 0, a.length); this }
    def nullableStr(s: String): Out = if (s == null) i16(-1) else str(s)
    def bytes(a: Array[Byte]): Out =
      if (a == null) i32(-1) else { i32(a.length); b.write(a, 0, a.length); this }
    def arr[T](xs: Seq[T])(f: T => Unit): Out = { i32(xs.size); xs.foreach(f); this }
    def toBytes: Array[Byte] = b.toByteArray
  }

  /** Big-endian reader over one frame body. */
  final class In(buf: ByteBuffer) {
    def i8: Int = buf.get().toInt
    def i16: Int = buf.getShort.toInt
    def i32: Int = buf.getInt
    def i64: Long = buf.getLong
    def str: String = {
      val n = i16
      require(n >= 0, s"null string where non-null expected")
      val a = new Array[Byte](n); buf.get(a); new String(a, UTF_8)
    }
    def nullableStr: String = {
      val n = i16
      if (n < 0) null else { val a = new Array[Byte](n); buf.get(a); new String(a, UTF_8) }
    }
    def bytes: Array[Byte] = {
      val n = i32
      if (n < 0) null else { val a = new Array[Byte](n); buf.get(a); a }
    }
    def arr[T](f: => T): Seq[T] = Seq.fill(i32)(f)
  }

  def writeFrame(out: DataOutputStream, payload: Array[Byte]): Unit = {
    out.writeInt(payload.length); out.write(payload); out.flush()
  }
  def readFrame(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    require(n >= 0 && n <= (64 << 20), s"bad frame size $n")
    val a = new Array[Byte](n); in.readFully(a); a
  }

  final case class PartitionMeta(leaderHost: String, leaderPort: Int, partitions: Seq[Int])
  final case class FetchResult(highWatermark: Long, recordSet: Array[Byte])

  /** One consumer connection. Not thread-safe — one per task, like a real
    * consumer's network client. */
  final class Client(host: String, port: Int, clientId: String = "graft-kafka-lite")
      extends AutoCloseable {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val out = new DataOutputStream(sock.getOutputStream)
    private val in = new DataInputStream(sock.getInputStream)
    private var corr = 0

    private def call(apiKey: Short, apiVersion: Short)(body: Out => Unit): In = {
      corr += 1
      val o = new Out
      o.i16(apiKey).i16(apiVersion).i32(corr).nullableStr(clientId)
      body(o)
      writeFrame(out, o.toBytes)
      val r = new In(ByteBuffer.wrap(readFrame(in)))
      val seen = r.i32
      require(seen == corr, s"correlation mismatch: sent $corr got $seen")
      r
    }

    /** ApiVersions v0 handshake → (apiKey, minVersion, maxVersion). */
    def apiVersions(): Seq[(Int, Int, Int)] = {
      val r = call(ApiApiVersions, 0)(_ => ())
      val err = r.i16
      require(err == 0, s"ApiVersions error $err")
      r.arr((r.i16, r.i16, r.i16))
    }

    /** Metadata v0 for one topic → leader address + partition ids. */
    def metadata(topic: String): PartitionMeta = {
      val r = call(ApiMetadata, 0) { o =>
        o.arr(Seq(topic))(t => { o.str(t); () })
      }
      val brokers = r.arr { val id = r.i32; val h = r.str; val p = r.i32; (id, h, p) }
      val topics = r.arr {
        val terr = r.i16
        val name = r.str
        val parts = r.arr {
          val perr = r.i16; val pid = r.i32; val leader = r.i32
          r.arr(r.i32); r.arr(r.i32) // replicas, isr
          (perr, pid, leader)
        }
        (terr, name, parts)
      }
      val (terr, _, parts) = topics.head
      require(terr == 0, s"Metadata topic error $terr")
      parts.foreach { case (perr, pid, _) =>
        require(perr == 0, s"Metadata partition $pid error $perr")
      }
      val leaderId = parts.head._3
      val (_, h, p) = brokers.find(_._1 == leaderId).getOrElse(brokers.head)
      PartitionMeta(h, p, parts.map(_._2).sorted)
    }

    /** ListOffsets v1: timestamp −1 → log-end offset, −2 → log start. */
    def listOffset(topic: String, partition: Int, timestamp: Long): Long = {
      val r = call(ApiListOffsets, 1) { o =>
        o.i32(-1) // replica_id: ordinary consumer
        o.arr(Seq(topic)) { t =>
          o.str(t)
          o.arr(Seq(partition)) { p => o.i32(p); o.i64(timestamp); () }
        }
      }
      val topics = r.arr {
        val name = r.str
        val parts = r.arr {
          val pid = r.i32; val err = r.i16; val ts = r.i64; val off = r.i64
          (pid, err, ts, off)
        }
        (name, parts)
      }
      val (_, err, _, off) = topics.head._2.head
      require(err == 0, s"ListOffsets error $err")
      off
    }

    /** Fetch v4 from `offset` → (high watermark, raw RecordBatch v2 bytes).
      * The record set decodes with [[graft.streaming.KafkaFraming.decode]]. */
    def fetch(topic: String, partition: Int, offset: Long,
              maxBytes: Int = 4 << 20): FetchResult = {
      val r = call(ApiFetch, 4) { o =>
        o.i32(-1)       // replica_id
        o.i32(500)      // max_wait_ms
        o.i32(1)        // min_bytes
        o.i32(maxBytes) // max_bytes
        o.i8(0)         // isolation_level: read_uncommitted
        o.arr(Seq(topic)) { t =>
          o.str(t)
          o.arr(Seq(partition)) { p => o.i32(p); o.i64(offset); o.i32(maxBytes); () }
        }
      }
      r.i32 // throttle_time_ms
      val topics = r.arr {
        val name = r.str
        val parts = r.arr {
          val pid = r.i32; val err = r.i16; val hw = r.i64; val lso = r.i64
          r.arr { r.i64; r.i64 } // aborted_transactions (empty for us)
          val recs = r.bytes
          (pid, err, hw, lso, recs)
        }
        (name, parts)
      }
      val (_, err, hw, _, recs) = topics.head._2.head
      require(err == 0, s"Fetch error $err")
      FetchResult(hw, if (recs == null) Array.emptyByteArray else recs)
    }

    override def close(): Unit = { sock.close() }
  }
}
