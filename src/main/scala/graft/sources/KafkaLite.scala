package graft.sources

import java.util.{Map => JMap}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.streaming.KafkaFraming

/** `kafka-lite` — a Structured Streaming micro-batch source that consumes
  * a Kafka topic over the REAL wire protocol ([[KafkaWire]]: ApiVersions
  * handshake, Metadata, ListOffsets, Fetch v4 returning RecordBatch v2
  * frames) with zero Kafka jars. Output schema matches the stock
  * connector (key, value, topic, partition, offset, timestamp,
  * timestampType), so downstream CDC plumbing
  * ([[graft.streaming.CdcIngest]]) is source-agnostic.
  *
  * Execution topology mirrors the real connector: the DRIVER polls
  * ListOffsets for the log-end offset each micro-batch and plans one
  * input partition per topic-partition with an [start, end) offset range;
  * each EXECUTOR task opens its own socket to the partition leader and
  * fetches exactly its range. Offsets are the checkpoint state (json), so
  * restart/replay semantics are the standard exactly-once-source
  * contract. At scale nothing on the driver is O(rows) — it ships two
  * longs per partition per batch.
  *
  * Options: `bootstrap` (host:port), `topic`, `partition` (default: all
  * partitions from Metadata), `maxBytesPerFetch`.
  */
class KafkaLiteProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kafka-lite"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaLite.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new KafkaLiteTable(properties)
}

object KafkaLite {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("timestampType", IntegerType, nullable = false)))

  final case class Conf(host: String, port: Int, topic: String,
                        partition: Option[Int], maxBytes: Int)

  def conf(properties: JMap[String, String]): Conf = {
    def opt(k: String): Option[String] = Option(properties.get(k))
    val bootstrap = opt("bootstrap").getOrElse(
      sys.error("kafka-lite: option 'bootstrap' (host:port) is required"))
    val Array(h, p) = bootstrap.split(":", 2)
    Conf(h, p.toInt,
      opt("topic").getOrElse(sys.error("kafka-lite: option 'topic' is required")),
      opt("partition").map(_.toInt),
      opt("maxBytesPerFetch").map(_.toInt).getOrElse(4 << 20))
  }
}

final class KafkaLiteTable(properties: JMap[String, String])
    extends Table with SupportsRead {
  private val c = KafkaLite.conf(properties)
  override def name(): String = s"kafka-lite:${c.topic}"
  override def schema(): StructType = KafkaLite.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaLite.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaLiteStream(c)
      }
    }
}

/** Per-partition offsets as checkpointable state. */
final case class KafkaLiteOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")
}
object KafkaLiteOffset {
  def fromJson(json: String): KafkaLiteOffset = KafkaLiteOffset(
    json.trim.stripPrefix("{").stripSuffix("}").split(",").filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
      }.toMap)
}

final class KafkaLiteStream(c: KafkaLite.Conf) extends MicroBatchStream {
  // driver-side control connection, opened on first use; the ApiVersions
  // handshake runs once here, exactly like a real consumer's bootstrap
  private lazy val client: KafkaWire.Client = {
    val cl = new KafkaWire.Client(c.host, c.port)
    val apis = cl.apiVersions().map(_._1).toSet
    require(Set(1, 2, 3).subsetOf(apis.map(identity)),
      s"broker lacks required APIs (have $apis)")
    cl
  }
  private lazy val partitions: Seq[Int] =
    c.partition.map(Seq(_)).getOrElse(client.metadata(c.topic).partitions)

  private def offsetsAt(ts: Long): KafkaLiteOffset =
    KafkaLiteOffset(partitions.map(p => p -> client.listOffset(c.topic, p, ts)).toMap)

  override def initialOffset(): Offset = offsetsAt(KafkaWire.OffsetEarliest)
  override def latestOffset(): Offset = offsetsAt(KafkaWire.OffsetLatest)
  override def deserializeOffset(json: String): Offset = KafkaLiteOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = client.close()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaLiteOffset].offsets
    val e = end.asInstanceOf[KafkaLiteOffset].offsets
    e.toSeq.sorted.flatMap { case (p, hi) =>
      val lo = s.getOrElse(p, 0L)
      if (hi > lo) Some(KafkaLitePartition(c.host, c.port, c.topic, p, lo, hi, c.maxBytes))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new KafkaLiteReader(partition.asInstanceOf[KafkaLitePartition])
    }
}

final case class KafkaLitePartition(host: String, port: Int, topic: String,
                                    partition: Int, start: Long, end: Long,
                                    maxBytes: Int) extends InputPartition

/** Executor-side reader: its own socket, Fetch v4 loop over [start, end),
  * frames decoded by the RecordBatch v2 codec. Fails loudly if the broker
  * cannot serve the planned range (data loss), never silently skips. */
final class KafkaLiteReader(p: KafkaLitePartition)
    extends PartitionReader[InternalRow] {
  private var client = new KafkaWire.Client(p.host, p.port)
  private var pos = p.start
  private var queue: Iterator[KafkaFraming.KRecord] = Iterator.empty
  private var current: KafkaFraming.KRecord = _

  /** Fetch with RECONNECT on connection loss (broker restart, LB churn):
    * a fetch at an offset is idempotent, so dropping the socket and
    * re-issuing the same request is exactly what the stock consumer's
    * network client does. Bounded — a persistently dead broker still
    * fails the task loudly. */
  private def fetchReconnecting(off: Long): KafkaWire.FetchResult = {
    var attempt = 0
    while (true) {
      // the reconnect's own `new Client` (TCP connect) must fail INSIDE the
      // try — a connect-refused during a broker restart counts against the
      // attempt budget like any fetch failure, it doesn't escape the loop
      try {
        if (client == null) client = new KafkaWire.Client(p.host, p.port)
        return client.fetch(p.topic, p.partition, off, p.maxBytes)
      } catch { case e: java.io.IOException =>
        attempt += 1
        if (client != null)
          try client.close() catch { case _: Throwable => () }
        client = null
        if (attempt > 5) throw e
        // exponential backoff so the budget spans a realistic restart
        // window (~0.1+0.2+0.4+0.8+1.6 ≈ 3 s) instead of microseconds
        Thread.sleep(100L << (attempt - 1))
      }
    }
    sys.error("unreachable")
  }

  override def next(): Boolean = {
    while (!queue.hasNext && pos < p.end) {
      val res = fetchReconnecting(pos)
      val recs = KafkaFraming.decode(res.recordSet)
        .filter(r => r.offset >= pos && r.offset < p.end)
      require(recs.nonEmpty,
        s"kafka-lite: broker returned no records for planned range " +
          s"[$pos, ${p.end}) of ${p.topic}-${p.partition} — data loss")
      pos = recs.map(_.offset).max + 1
      queue = recs.iterator
    }
    if (queue.hasNext) { current = queue.next(); true } else false
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](
    current.key, current.value, UTF8String.fromString(p.topic),
    p.partition, current.offset, current.timestampMs * 1000L, 0))

  override def close(): Unit = client.close()
}
