package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Minimal log-structured table format over parquet — the executable
  * analogue of the Delta features the offline container blocks (the
  * delta-spark jar is unresolvable; see [[graft.streaming.CdcIngest]]'s
  * format seam). The protocol SHAPE follows the public lakehouse-log
  * design (Delta/Iceberg papers): an ordered `_txn_log/<version>.json`
  * of add/remove FILE ACTIONS is the table's source of truth — readers
  * list the log, fold actions into a snapshot, and read only live files.
  * That one idea buys, and this module implements:
  *
  *  - **snapshot isolation**: a commit is one atomically-renamed log file;
  *    readers never see half a commit;
  *  - **time travel** ([[readVersion]]): fold actions only up to v;
  *  - **OPTIMIZE** ([[optimize]]): rewrite small files into compacted
  *    ones and commit remove+add — contents identical, history intact
  *    (older versions still resolve to the removed files until vacuumed);
  *  - **VACUUM** ([[vacuum]]): delete files unreferenced by any retained
  *    version — after which too-old time travel FAILS LOUDLY instead of
  *    returning partial data;
  *  - **history** ([[history]]): the commit audit table.
  *
  * Scale notes. Data files are written by Spark (distributed, any size);
  * only the ACTION METADATA passes through the driver, exactly as in the
  * production systems (a log entry is O(files touched), not O(rows)).
  * Atomic rename is the local-FS/HDFS commit primitive; on S3-class
  * stores the rename becomes a conditional put — the one seam to swap.
  * Single-writer: concurrent commits would need the conditional-put CAS
  * loop; readers are always safe.
  */
object TxnTable {

  private val actionSchema = StructType(Seq(
    StructField("version", LongType),
    StructField("op", StringType),
    StructField("action", StringType), // add | remove
    StructField("file", StringType),   // path relative to table root
    StructField("bytes", LongType)))

  private def logDir(root: String): Path = Paths.get(root, "_txn_log")
  private def deltaDir(root: String): Path = Paths.get(root, "_delta_log")

  private def versions(root: String): Seq[Long] = {
    val d = logDir(root)
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
  }

  /** Latest committed version, −1 for an empty/new table. */
  def latestVersion(root: String): Long = versions(root).lastOption.getOrElse(-1L)

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  /** Write one commit atomically: actions → tmp json → rename into place.
    * After the `_txn_log` rename lands (the commit point), the same commit
    * is mirrored as a public Delta-protocol `_delta_log/<v>.json` entry —
    * see [[deltaCommit]]. */
  private def commit(root: String, version: Long, op: String,
                     adds: Seq[(String, Long)], removes: Seq[String],
                     schemaJson: Option[String] = None,
                     dataChange: Boolean = true,
                     txn: Option[(String, Long)] = None): Unit = {
    Files.createDirectories(logDir(root))
    val lines =
      adds.map { case (f, b) =>
        s"""{"version":$version,"op":"${esc(op)}","action":"add","file":"${esc(f)}","bytes":$b}"""
      } ++ removes.map { f =>
        s"""{"version":$version,"op":"${esc(op)}","action":"remove","file":"${esc(f)}","bytes":0}"""
      }
    val tmp = logDir(root).resolve(s".$version.json.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    val dst = logDir(root).resolve(f"$version%020d.json")
    require(!Files.exists(dst), s"version $version already committed (single-writer contract)")
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    deltaCommit(root, version, op, adds, removes, schemaJson, dataChange, txn)
  }

  /** Deterministic table id for the Delta metaData action (stable across
    * commits; derived from the table root, not wall-clock). */
  private def tableId(root: String): String =
    java.util.UUID.nameUUIDFromBytes(("graft-txn:" + root).getBytes(UTF_8)).toString

  /** Mirror a committed version into the OPEN Delta transaction protocol
    * (delta.io PROTOCOL.md): newline-delimited JSON actions in
    * `_delta_log/%020d.json`. Version 0 carries `protocol` (reader 1 /
    * writer 2 — no advanced table features used) and `metaData` with the
    * Spark schema JSON as `schemaString` (the Delta schema serialization IS
    * the Spark StructType JSON shape). Data files stay where [[commit]] put
    * them — `add.path` is root-relative with subdirectories, which the
    * protocol allows. OPTIMIZE commits carry `dataChange:false` so
    * downstream streams skip them; idempotent appends carry the `txn`
    * action with the dedup token as `appId`. Writing the format needs no
    * jar; external readers (delta-spark, DuckDB delta, Trino) fold the
    * same actions this module's `_txn_log` fold uses, so snapshots agree —
    * DeltaLogSpec proves the fold equivalence version by version. */
  private def deltaCommit(root: String, version: Long, op: String,
                          adds: Seq[(String, Long)], removes: Seq[String],
                          schemaJson: Option[String], dataChange: Boolean,
                          txn: Option[(String, Long)]): Unit = {
    Files.createDirectories(deltaDir(root))
    val now = System.currentTimeMillis()
    val head =
      (if (version == 0L) Seq(
        s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"${tableId(root)}","format":{"provider":"parquet","options":{}},"schemaString":"${esc(schemaJson.getOrElse(sys.error("first commit must carry a schema")))}","partitionColumns":[],"configuration":{},"createdTime":$now}}""")
      else Seq.empty) ++
      txn.map { case (app, v) => s"""{"txn":{"appId":"${esc(app)}","version":$v}}""" }.toSeq ++
      Seq(s"""{"commitInfo":{"timestamp":$now,"operation":"${esc(op)}"}}""")
    val lines = head ++
      removes.map { f =>
        s"""{"remove":{"path":"${esc(f)}","deletionTimestamp":$now,"dataChange":$dataChange}}"""
      } ++
      adds.map { case (f, b) =>
        val mt = Files.getLastModifiedTime(Paths.get(root, f)).toMillis
        s"""{"add":{"path":"${esc(f)}","partitionValues":{},"size":$b,"modificationTime":$mt,"dataChange":$dataChange}}"""
      }
    val tmp = deltaDir(root).resolve(s".$version.json.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, deltaDir(root).resolve(f"$version%020d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeDataFiles(df: DataFrame, root: String, version: Long): Seq[(String, Long)] = {
    val sub = s"data/v$version"
    val dst = Paths.get(root, sub)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dst.toString)
    Files.list(dst).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .map(n => (s"$sub/$n", Files.size(dst.resolve(n))))
      .toSeq.sorted
  }

  /** Append `df` as a new commit; returns the committed version. */
  def append(df: DataFrame, root: String): Long = {
    val v = latestVersion(root) + 1
    commit(root, v, "append", writeDataFiles(df, root, v), Seq.empty,
      schemaJson = Some(df.schema.json))
    v
  }

  /** Idempotent append: commits `df` tagged with `token` unless a commit
    * bearing the same token already exists, in which case that version is
    * returned and NOTHING is written — the txnAppId/txnVersion exactly-once
    * pattern with the commit log as the dedup ledger. This is what lets a
    * restarted streaming query redeliver a micro-batch harmlessly (see
    * [[graft.streaming.TxnSink]]). */
  def appendOnce(df: DataFrame, root: String, token: String): Long = {
    val op = s"append#$token"
    actions(root, -1L).find(_._2 == op) match {
      case Some((v, _, _, _, _)) => v
      case None =>
        val v = latestVersion(root) + 1
        commit(root, v, op, writeDataFiles(df, root, v), Seq.empty,
          schemaJson = Some(df.schema.json), txn = Some((token, v)))
        v
    }
  }

  /** Replace the table contents with `df` (the batch overwrite sink shape,
    * ref SaveDelta batch path): adds the new files, removes every
    * previously-live one — in ONE commit, so readers flip atomically and
    * the pre-overwrite version remains time-travelable. */
  def overwrite(df: DataFrame, root: String): Long = {
    val v = latestVersion(root) + 1
    commit(root, v, "overwrite", writeDataFiles(df, root, v),
      liveFiles(root, v - 1).map(_._1), schemaJson = Some(df.schema.json))
    v
  }

  /** MERGE INTO (keyed upsert, copy-on-write): apply `delta` to the
    * current snapshot — delta rows whose key matches an existing row
    * REPLACE it, the rest INSERT — in ONE commit. The Delta-lake merge
    * mechanics, not an overwrite in disguise: only the live files that
    * actually CONTAIN a matched key are rewritten (their unmatched rows
    * copied forward + every delta row); untouched files stay in place, so
    * a merge that hits one hot partition of a 100 TB table rewrites that
    * partition, not the table. File attribution rides `_metadata.file_path`
    * (no extra scan); the touched-file list is O(files) driver metadata,
    * same as the commit itself, and AQE broadcasts the delta key set when
    * it is small (the typical CDC upsert batch). Pre-merge versions stay time-travelable.
    * `delta` must carry distinct keys (the upsert set) and the table
    * schema. */
  def merge(spark: SparkSession, delta: DataFrame, root: String,
            keys: Seq[String]): Long = {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val live = liveFiles(root, v - 1)
    val cols = delta.columns.toSeq
    val cur = spark.read.parquet(live.map { case (f, _) =>
      Paths.get(root, f).toString }: _*)
      .select(col("_metadata.file_path").as("_file"), struct(cols.map(col): _*).as("_r"))
    val dKeys = delta.select(keys.map(col): _*).distinct()
    val onKeys = keys.map(k => col(s"_r.$k") === dKeys(k)).reduce(_ && _)
    // touched = live files containing at least one delta key — O(files) rows
    val touchedUris = cur.join(dKeys, onKeys, "left_semi")
      .select(col("_file")).distinct().collect().map(_.getString(0)).toSeq.sorted
    val touchedRel = live.map(_._1).filter(f => touchedUris.exists(_.endsWith(f)))
    val carried =
      if (touchedRel.isEmpty) delta
      else {
        cur.filter(col("_file").isin(touchedUris: _*))
          .join(dKeys, onKeys, "left_anti")
          .select(cols.map(c => col(s"_r.$c").as(c)): _*)
          .unionByName(delta)
      }
    commit(root, v, "merge", writeDataFiles(carried, root, v), touchedRel,
      schemaJson = Some(delta.schema.json))
    v
  }

  /** Log actions up to and including `asOf` (whole log when < 0). */
  private def actions(root: String, asOf: Long): Seq[(Long, String, String, String, Long)] = {
    val vs = versions(root).filter(v => asOf < 0 || v <= asOf)
    vs.flatMap { v =>
      Files.readAllLines(logDir(root).resolve(f"$v%020d.json")).asScala.map { line =>
        // fixed field order written by [[commit]]; parsed positionally
        val ver = line.split("\"version\":")(1).takeWhile(_ != ',').toLong
        def str(k: String) = line.split(s""""$k":"""")(1).takeWhile(_ != '"')
        val bytes = line.split("\"bytes\":")(1).takeWhile(c => c.isDigit).toLong
        (ver, str("op"), str("action"), str("file"), bytes)
      }
    }
  }

  private def liveFiles(root: String, asOf: Long): Seq[(String, Long)] = {
    val acts = actions(root, asOf)
    val removed = acts.collect { case (_, _, "remove", f, _) => f }.toSet
    acts.collect { case (_, _, "add", f, b) if !removed.contains(f) => (f, b) }
  }

  /** Read the latest snapshot. */
  def read(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, -1L)

  /** Time travel: the table exactly as of commit `asOf` (−1 = latest).
    * Fails loudly if a needed file was vacuumed away. */
  def readVersion(spark: SparkSession, root: String, asOf: Long): DataFrame = {
    val last = latestVersion(root)
    require(last >= 0, s"$root is not a TxnTable (no _txn_log)")
    require(asOf <= last, s"version $asOf does not exist (latest $last)")
    val files = liveFiles(root, asOf)
    val missing = files.filterNot { case (f, _) => Files.exists(Paths.get(root, f)) }
    require(missing.isEmpty,
      s"version ${if (asOf < 0) last else asOf} references vacuumed files: " +
        missing.map(_._1).mkString(", "))
    // every commit adds at least one part file (Spark writes schema-bearing
    // empty parts), so a resolvable version always has files
    require(files.nonEmpty, s"no live files at version $asOf")
    spark.read.parquet(files.map { case (f, _) => Paths.get(root, f).toString }: _*)
  }

  /** OPTIMIZE: rewrite every live file smaller than `smallBytes` into
    * `targetPartitions` compacted files; one commit of remove+add. Contents
    * are bit-identical (no ordering guarantee — parquet tables are
    * unordered sets); history stays time-travelable until [[vacuum]]. */
  def optimize(spark: SparkSession, root: String,
               smallBytes: Long = 8L << 20, targetPartitions: Int = 1): Long = {
    val v = latestVersion(root) + 1
    val small = liveFiles(root, v - 1).filter(_._2 < smallBytes)
    require(small.nonEmpty, "nothing to optimize")
    val df = spark.read.parquet(
      small.map { case (f, _) => Paths.get(root, f).toString }: _*)
    val adds = writeDataFiles(df.repartition(targetPartitions), root, v)
    commit(root, v, "optimize", adds, small.map(_._1), dataChange = false)
    v
  }

  /** VACUUM: physically delete files not referenced by any version >
    * `retainAfter`. Time travel to ≤ `retainAfter` then fails loudly. */
  def vacuum(root: String, retainAfter: Long): Seq[String] = {
    val keep = (math.max(retainAfter + 1, 0L) to latestVersion(root))
      .flatMap(v => liveFiles(root, v).map(_._1)).toSet
    val all = actions(root, -1L).collect { case (_, _, "add", f, _) => f }.distinct
    val victims = all.filterNot(keep.contains)
      .filter(f => Files.exists(Paths.get(root, f)))
    victims.foreach(f => Files.delete(Paths.get(root, f)))
    victims
  }

  /** Commit audit: one row per action, the DESCRIBE HISTORY analogue. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    actions(root, -1L)
      .map { case (v, op, a, f, b) => (v, op, a, f, b) }
      .toDF("version", "op", "action", "file", "bytes")
  }
}
