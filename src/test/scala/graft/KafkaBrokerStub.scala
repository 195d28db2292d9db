package graft

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import graft.sources.KafkaWire
import graft.sources.KafkaWire.{In, Out}
import graft.streaming.KafkaFraming

/** In-process Kafka broker stub: a real TCP server speaking exactly the
  * protocol slice [[KafkaWire]]'s client consumes — ApiVersions v0,
  * Metadata v0, ListOffsets v1, Fetch v4 — serving RecordBatch v2 frames
  * encoded by [[KafkaFraming]]. Test double for the offline-blocked
  * broker: the CONSUMER path under test is all production code. */
final class KafkaBrokerStub extends AutoCloseable {
  private val server = new ServerSocket(0)
  val host = "127.0.0.1"
  val port: Int = server.getLocalPort

  // per (topic, partition): committed batches (baseOffset, wireBytes, count)
  private val logs =
    scala.collection.mutable.Map[(String, Int), Vector[(Long, Array[Byte], Int)]]()
  @volatile var apiVersionsCalls = 0
  @volatile var fetchCalls = 0
  /** Fault injection: the next N Fetch requests get their connection
    * dropped mid-request instead of a response — the restart-mid-fetch
    * case the consumer's reconnect path must absorb. */
  @volatile var dropNextFetches = 0

  def logEnd(topic: String, partition: Int): Long = synchronized {
    logs.getOrElse((topic, partition), Vector.empty).lastOption
      .map { case (b, _, n) => b + n }.getOrElse(0L)
  }

  /** Append one producer batch; records are (timestampMs, key, value).
    * `gzip = true` commits a GZIP-compressed RecordBatch v2 frame — what a
    * compression-enabled producer writes. */
  def append(topic: String, partition: Int,
             recs: Seq[(Long, Array[Byte], Array[Byte])],
             gzip: Boolean = false): Unit = synchronized {
    val base = logEnd(topic, partition)
    val bytes = KafkaFraming.encodeBatch(base, recs, gzip)
    logs((topic, partition)) =
      logs.getOrElse((topic, partition), Vector.empty) :+ ((base, bytes, recs.size))
  }

  private val acceptor = new Thread(() => {
    try while (true) {
      val s = server.accept()
      val t = new Thread(() => serve(s))
      t.setDaemon(true)
      t.start()
    } catch { case _: Throwable => () } // server closed
  }, "kafka-stub-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try while (true) {
      val req = new In(ByteBuffer.wrap(KafkaWire.readFrame(in)))
      val apiKey = req.i16
      val apiVersion = req.i16
      val corr = req.i32
      req.nullableStr // client_id
      val o = new Out
      o.i32(corr)
      (apiKey, apiVersion) match {
        case (18, 0) => apiVersions(o)
        case (3, 0)  => metadata(req, o)
        case (2, 1)  => listOffsets(req, o)
        case (1, 4)  =>
          if (dropNextFetches > 0) { dropNextFetches -= 1; return } // mid-fetch hangup
          fetch(req, o)
        case (k, v)  => sys.error(s"stub: unsupported api $k v$v")
      }
      KafkaWire.writeFrame(out, o.toBytes)
    } catch {
      case _: EOFException | _: SocketException => () // client hung up
    } finally sock.close()
  }

  private def apiVersions(o: Out): Unit = {
    apiVersionsCalls += 1
    o.i16(0) // error_code
    o.arr(Seq((1, 4, 4), (2, 1, 1), (3, 0, 0), (18, 0, 0))) {
      case (k, mn, mx) => o.i16(k); o.i16(mn); o.i16(mx); ()
    }
  }

  private def metadata(req: In, o: Out): Unit = {
    val topics = req.arr(req.str)
    o.arr(Seq((0, host, port))) { case (id, h, p) => o.i32(id); o.str(h); o.i32(p); () }
    o.arr(topics) { t =>
      o.i16(0) // topic error
      o.str(t)
      val parts = synchronized(logs.keys.filter(_._1 == t).map(_._2).toSeq.sorted) match {
        case Nil => Seq(0)
        case ps  => ps
      }
      o.arr(parts) { p =>
        o.i16(0); o.i32(p); o.i32(0)       // error, partition, leader
        o.arr(Seq(0))(r => { o.i32(r); () }) // replicas
        o.arr(Seq(0))(r => { o.i32(r); () }) // isr
        ()
      }
      ()
    }
  }

  private def listOffsets(req: In, o: Out): Unit = {
    req.i32 // replica_id
    val topics = req.arr {
      val t = req.str
      val parts = req.arr { val p = req.i32; val ts = req.i64; (p, ts) }
      (t, parts)
    }
    o.arr(topics) { case (t, parts) =>
      o.str(t)
      o.arr(parts) { case (p, ts) =>
        val off = ts match {
          case KafkaWire.OffsetLatest   => logEnd(t, p)
          case KafkaWire.OffsetEarliest =>
            synchronized(logs.getOrElse((t, p), Vector.empty)
              .headOption.map(_._1).getOrElse(0L))
          case other => sys.error(s"stub: by-timestamp lookup unsupported ($other)")
        }
        o.i32(p); o.i16(0); o.i64(ts); o.i64(off)
        ()
      }
      ()
    }
  }

  private def fetch(req: In, o: Out): Unit = {
    fetchCalls += 1
    req.i32; req.i32; req.i32; req.i32; req.i8 // replica, wait, min, max, isolation
    val topics = req.arr {
      val t = req.str
      val parts = req.arr { val p = req.i32; val off = req.i64; val mx = req.i32; (p, off, mx) }
      (t, parts)
    }
    o.i32(0) // throttle_time_ms
    o.arr(topics) { case (t, parts) =>
      o.str(t)
      o.arr(parts) { case (p, off, mx) =>
        val leo = logEnd(t, p)
        val batches = synchronized(logs.getOrElse((t, p), Vector.empty))
          .filter { case (b, _, n) => b + n > off } // holds ≥1 record ≥ off
        val buf = new java.io.ByteArrayOutputStream()
        var taken = 0
        batches.foreach { case (_, bytes, _) =>
          if (taken == 0 || buf.size() + bytes.length <= mx) { buf.write(bytes); taken += 1 }
        }
        o.i32(p); o.i16(0); o.i64(leo); o.i64(leo) // error, hw, lso
        o.arr(Seq.empty[Long])(_ => ())            // aborted_transactions
        o.bytes(buf.toByteArray)
        ()
      }
      ()
    }
  }

  override def close(): Unit = server.close()
}
