package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (builder mandate): media payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batch-wise over partitions. The decode step itself is STUBBED — this
  * container ships no image/audio codecs — behind [[MediaDecoder]]:
  * [[FakeDecoder]] is the deterministic test implementation, [[CodecDecoder]]
  * is the marked not-implemented production seam. Everything around the stub
  * (binary schema, metadata extraction, batched partition-wise execution,
  * feature output shape) is real and oracle-/spec-tested.
  *
  * Scale: media bytes never shuffle — metadata extraction is a narrow
  * projection in the scan stage, and feature extraction is `mapPartitions`
  * (the Scala analogue of `mapInPandas`: one decoder instance per partition,
  * records streamed through in batches, not row-at-a-time closures). At
  * 100 TB the binary column lives in its own parquet column chunks, so
  * metadata-only queries never read the payload bytes at all — columnar
  * pruning does the heavy lifting.
  */
object Multimodal {

  /** A media record: payload + typed metadata (doc_id keys back to the
    * source table; media_type is synthesized deterministically here since
    * the testdata has no real media). */
  case class MediaRecord(doc_id: Long, media_type: String, n_bytes: Long,
                         checksum: String, content: Array[Byte])

  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           feature_norm: Double)

  /** Batch decoder seam. One instance is created per partition — the shape a
    * JNI/codec binding needs (expensive init amortized across the batch). */
  trait MediaDecoder extends Serializable {
    def decode(rec: MediaRecord): MediaFeatures
  }

  /** Deterministic fake decode: "dimensions" derived from the checksum —
    * stands in for a real codec so the distributed plumbing is testable. */
  object FakeDecoder extends MediaDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val h = java.lang.Long.parseLong(r.checksum.substring(0, 12), 16)
      MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
        width = (h % 1920).toInt + 1,
        height = ((h >> 16) % 1080).toInt + 1,
        n_frames = if (r.media_type == "video") ((h >> 32) % 300).toInt + 1 else 1,
        feature_norm = (h % 1000000L) / 1000000.0)
    }
  }

  /** Production seam: requires image/audio libraries absent from this
    * container — deliberately not implemented (see module doc). */
  object CodecDecoder extends MediaDecoder {
    def decode(r: MediaRecord): MediaFeatures =
      throw new UnsupportedOperationException(
        "real media decode requires codec libraries not present in this build; " +
          "use FakeDecoder for tests or bind a codec here")
  }

  /** documents → media records: text bytes stand in for the media payload;
    * media_type is a deterministic hash-based mix of image/audio/video. */
  def asMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      // md5-derived so the DuckDB oracle reproduces the same assignment
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (expr("cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 4), 16, 10) as int)") % 3 + 1).cast("int")).as("media_type"),
      length($"text".cast("binary")).cast("long").as("n_bytes"),
      md5($"text".cast("binary")).as("checksum"),
      $"text".cast("binary").as("content"))
  }

  /** Metadata-only query — never touches the payload column at execution
    * time (columnar pruning drops `content` from the scan). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    asMedia(s, dir).drop("content")
  val mediaMetaSql: String =
    """SELECT doc_id,
      |       CASE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 3
      |            WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS checksum
      |FROM documents
      |""".stripMargin

  /** Feature extraction: partition-wise batch decode through the decoder
    * seam. The fake decode is closed-form over the checksum, so the oracle
    * reproduces it in SQL — the hash check proves the typed `mapPartitions`
    * path (encoders, per-partition decoder instances, batch streaming)
    * preserves every value, which is exactly the plumbing a real codec
    * would flow through. */
  def extractFeatures(s: SparkSession, dir: String,
                      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import s.implicits._
    asMedia(s, dir).as[MediaRecord].mapPartitions { it =>
      // one decoder per partition; records stream through in order
      it.map(decoder.decode)
    }
  }

  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(s, dir).toDF()
  val mediaFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 3
      |              WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |         octet_length(encode(text)) AS n_bytes,
      |         ('0x' || substr(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents
      |)
      |SELECT doc_id, media_type, n_bytes,
      |       CAST(h % 1920 + 1 AS INTEGER) AS width,
      |       CAST((h >> 16) % 1080 + 1 AS INTEGER) AS height,
      |       CAST(CASE WHEN media_type = 'video' THEN (h >> 32) % 300 + 1 ELSE 1 END AS INTEGER) AS n_frames,
      |       (h % 1000000) / 1000000.0 AS feature_norm
      |FROM m
      |""".stripMargin

  /** Frame sampling: every k-th fixed-size chunk of the payload — pure byte
    * plumbing (the video-frame-sample shape) as a typed Dataset map. The
    * chunk arithmetic is closed-form over the payload length, so the oracle
    * checks the byte plumbing exactly. */
  def frameSample(s: SparkSession, dir: String, frameBytes: Int = 16, k: Int = 4): DataFrame = {
    import s.implicits._
    asMedia(s, dir).as[MediaRecord].map { r =>
      val frames = r.content.grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % k == 0 => chunk }
        .toArray
      (r.doc_id, frames.length.toLong, frames.map(_.length.toLong).sum)
    }.toDF("doc_id", "n_sampled_frames", "sampled_bytes")
  }
  val frameSampleSql: String =
    """WITH m AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents),
      |c AS (SELECT doc_id, len, (len + 15) // 16 AS nchunks FROM m)
      |SELECT doc_id,
      |       CAST(CASE WHEN len = 0 THEN 0 ELSE (nchunks + 3) // 4 END AS BIGINT) AS n_sampled_frames,
      |       CAST(CASE WHEN len = 0 THEN 0
      |                 WHEN (nchunks - 1) % 4 = 0
      |                   THEN 16 * ((nchunks + 3) // 4) - (16 - (((len - 1) % 16) + 1))
      |                 ELSE 16 * ((nchunks + 3) // 4) END AS BIGINT) AS sampled_bytes
      |FROM c
      |""".stripMargin

  /** Exact payload dedup + storage-savings report — metadata-only: groups
    * on the scan-computed checksum, so payload bytes are never read or
    * shuffled (the first pass every media-corpus pipeline runs; at 100 TB
    * the reclaimed bytes line-item is what justifies it). */
  def mediaDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaMeta(s, dir)
      .groupBy($"checksum")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
        min($"n_bytes").as("nb"))
      .selectExpr("checksum", "keep_id", "n_copies",
        "(n_copies - 1) * nb AS bytes_saved")
  }
  val mediaDedupSql: String =
    """SELECT md5(text) AS checksum, min(doc_id) AS keep_id,
      |       count(*) AS n_copies,
      |       (count(*) - 1) * CAST(min(octet_length(encode(text))) AS BIGINT) AS bytes_saved
      |FROM documents GROUP BY md5(text)
      |""".stripMargin

  /** Shard fan-out per modality — same role (and default) as the token
    * shard planner's NShards; at real scale set to corpus_bytes /
    * target_shard_bytes. The oracle SQL interpolates the same constant. */
  private val NMediaShards = 8

  /** Byte-balanced media shard plan — the webdataset/tar packing layout:
    * the same bucketed round-robin as the token shard planner (windows by
    * (media_type, power-of-two size bucket) — no global sort), balancing
    * payload BYTES per output shard within each modality. */
  def mediaShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy($"media_type", expr("length(bin(n_bytes))"))
      .orderBy($"n_bytes".desc, $"doc_id".asc)
    mediaMeta(s, dir)
      .withColumn("shard", (row_number().over(w) - 1) % NMediaShards)
      .groupBy($"media_type", $"shard")
      .agg(count(lit(1)).as("n_files"), sum($"n_bytes").cast("long").as("n_bytes"))
      .select($"media_type", $"shard".cast("long").as("shard"), $"n_files", $"n_bytes")
  }
  val mediaShardsSql: String =
    s"""WITH m AS (
       |${mediaMetaSql.trim}
       |),
       |assigned AS (
       |  SELECT media_type, doc_id, n_bytes,
       |         (row_number() OVER (PARTITION BY media_type, length(bin(n_bytes))
       |                             ORDER BY n_bytes DESC, doc_id ASC) - 1) % $NMediaShards AS shard
       |  FROM m)
       |SELECT media_type, CAST(shard AS BIGINT) AS shard, count(*) AS n_files,
       |       CAST(sum(n_bytes) AS BIGINT) AS n_bytes
       |FROM assigned GROUP BY media_type, shard
       |""".stripMargin

  /** Container-header metadata sniffing — REAL byte algebra, no codec: the
    * payloads are genuine PNG and WAV container prefixes (synthesized
    * deterministically per doc in BOTH engines, then round-tripped through
    * actual BINARY), and the parse side is exactly what runs on authentic
    * files: magic-byte format detection (PNG signature / RIFF+WAVE),
    * big-endian IHDR width/height at bytes 17–24, little-endian fmt-chunk
    * channels (23–24) and sample rate (25–28). This is the ingest triage
    * pass a 100 TB media corpus runs FIRST — a narrow scan-stage
    * projection over the payload's first bytes (parquet page-level lazy
    * materialization keeps it cheap), no decode, no shuffle of bytes. */
  def mediaSniff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val built = Tables.documents(s, dir).selectExpr(
      "doc_id",
      "doc_id % 1600 + 16 AS w", "doc_id % 900 + 9 AS hh",
      "doc_id % 2 + 1 AS ch",
      """element_at(array(8000L, 16000L, 22050L, 44100L, 48000L),
        |CAST(doc_id % 5 + 1 AS INT)) AS sr""".stripMargin)
      .selectExpr("doc_id",
        """unhex(CASE WHEN doc_id % 2 = 0
          |  THEN concat('89504E470D0A1A0A', '0000000D', '49484452',
          |              lpad(hex(w), 8, '0'), lpad(hex(hh), 8, '0'))
          |  ELSE concat('52494646', '00000000', '57415645', '666D7420',
          |              '10000000', '0100', lpad(hex(ch), 2, '0'), '00',
          |              concat(substr(lpad(hex(sr), 8, '0'), 7, 2),
          |                     substr(lpad(hex(sr), 8, '0'), 5, 2),
          |                     substr(lpad(hex(sr), 8, '0'), 3, 2),
          |                     substr(lpad(hex(sr), 8, '0'), 1, 2)))
          |END) AS content""".stripMargin)
    sniffParse(built)
  }

  /** The header parse itself, applicable to ANY (doc_id, content: binary)
    * relation — including authentic files (MediaSniffSpec feeds it real
    * ImageIO PNG and AudioSystem WAV bytes). Only the payload's first
    * bytes are touched. */
  def sniffParse(df: DataFrame): DataFrame = {
    def u(p: Int, l: Int) = s"CAST(conv(substr(hx, $p, $l), 16, 10) AS BIGINT)"
    df.selectExpr("doc_id", "hex(content) AS hx").selectExpr(
      "doc_id",
      """CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'png'
        |     WHEN substr(hx, 1, 8) = '52494646'
        |          AND substr(hx, 17, 8) = '57415645' THEN 'wav'
        |     ELSE 'bin' END AS fmt""".stripMargin,
      s"CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN ${u(33, 8)} END AS width",
      s"CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN ${u(41, 8)} END AS height",
      s"CASE WHEN substr(hx, 1, 8) = '52494646' THEN ${u(45, 2)} + 256 * ${u(47, 2)} END AS channels",
      s"""CASE WHEN substr(hx, 1, 8) = '52494646'
         |  THEN ${u(49, 2)} + 256 * ${u(51, 2)}
         |       + 65536 * ${u(53, 2)} + 16777216 * ${u(55, 2)} END AS sample_rate""".stripMargin)
  }
  val mediaSniffSql: String = {
    def u(p: Int, l: Int) = s"('0x' || substr(hx, $p, $l))::BIGINT"
    s"""WITH built AS (
       |  SELECT doc_id,
       |         doc_id % 1600 + 16 AS w, doc_id % 900 + 9 AS hh,
       |         doc_id % 2 + 1 AS ch,
       |         CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS sr
       |  FROM documents),
       |payload AS (
       |  SELECT doc_id,
       |         unhex(CASE WHEN doc_id % 2 = 0
       |           THEN concat('89504E470D0A1A0A', '0000000D', '49484452',
       |                       lpad(hex(w), 8, '0'), lpad(hex(hh), 8, '0'))
       |           ELSE concat('52494646', '00000000', '57415645', '666D7420',
       |                       '10000000', '0100', lpad(hex(ch), 2, '0'), '00',
       |                       substr(lpad(hex(sr), 8, '0'), 7, 2)
       |                       || substr(lpad(hex(sr), 8, '0'), 5, 2)
       |                       || substr(lpad(hex(sr), 8, '0'), 3, 2)
       |                       || substr(lpad(hex(sr), 8, '0'), 1, 2))
       |         END) AS content
       |  FROM built),
       |hexed AS (SELECT doc_id, hex(content) AS hx FROM payload)
       |SELECT doc_id,
       |       CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN 'png'
       |            WHEN substr(hx, 1, 8) = '52494646'
       |                 AND substr(hx, 17, 8) = '57415645' THEN 'wav'
       |            ELSE 'bin' END AS fmt,
       |       CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN ${u(33, 8)} END AS width,
       |       CASE WHEN substr(hx, 1, 16) = '89504E470D0A1A0A' THEN ${u(41, 8)} END AS height,
       |       CASE WHEN substr(hx, 1, 8) = '52494646' THEN ${u(45, 2)} + 256 * ${u(47, 2)} END AS channels,
       |       CASE WHEN substr(hx, 1, 8) = '52494646'
       |            THEN ${u(49, 2)} + 256 * ${u(51, 2)}
       |                 + 65536 * ${u(53, 2)} + 16777216 * ${u(55, 2)} END AS sample_rate
       |FROM hexed
       |""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta"     -> mediaMeta _,
    "q_media_features" -> mediaFeatures _,
    "q_frame_sample"   -> ((s: SparkSession, d: String) => frameSample(s, d)),
    "q_media_dedup"    -> mediaDedup _,
    "q_media_shards"   -> mediaShards _,
    "q_media_sniff"    -> mediaSniff _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_media_meta"     -> mediaMetaSql,
    "q_media_features" -> mediaFeaturesSql,
    "q_frame_sample"   -> frameSampleSql,
    "q_media_dedup"    -> mediaDedupSql,
    "q_media_shards"   -> mediaShardsSql,
    "q_media_sniff"    -> mediaSniffSql,
  )
}
