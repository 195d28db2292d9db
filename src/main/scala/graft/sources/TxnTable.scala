package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction => UFn}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
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
  * The commit point is a hard-link CAS (fail-if-exists, see [[commit]]);
  * on S3-class stores it becomes a conditional put — the one seam to
  * swap. MULTI-WRITER safe: data files live in writer-private directories
  * and become visible only through a won version claim; losers rebase on
  * the new snapshot and retry ([[casRetry]]), losers' never-referenced
  * files are vacuum-swept orphans. Readers are always safe.
  */
object TxnTable {

  private val actionSchema = StructType(Seq(
    StructField("version", LongType),
    StructField("op", StringType),
    StructField("action", StringType), // add | remove
    StructField("file", StringType),   // path relative to table root
    StructField("bytes", LongType)))

  /** One `add` action: a data file plus its per-file column statistics —
    * the metadata data skipping folds over. `stats` is the Delta-shaped
    * JSON `{"numRecords":N,"minValues":{…},"maxValues":{…},"nullCount":{…}}`
    * (absent for pre-stats commits; readers must treat absence as
    * "cannot prune"). Numeric/boolean min-max are exact decimal numbers,
    * strings are JSON strings — the encodings the open Delta protocol uses,
    * so the `_delta_log` mirror carries the identical payload. Temporal
    * columns are left out of stats (their protocol encoding is a rendered
    * string; pruning on them can be added by widening `statsEligible`). */
  /** `baseRowId`: the file's first fresh ROW ID under row tracking
    * (row_id = baseRowId + physical row index, unless the file carries a
    * materialized id column — see [[readWithRowIds]]). None on untracked
    * tables and on adds [[commit]] has not stamped yet. */
  final case class AddFile(file: String, bytes: Long, stats: Option[String],
                           partitionValues: Map[String, String] = Map.empty,
                           bloom: Option[String] = None,
                           dv: Option[DeletionVectors.DvDescriptor] = None,
                           baseRowId: Option[Long] = None)

  /** Per-file stats decoded for pruning. Map values: BigDecimal | String |
    * Boolean | null (all-null column). A column absent from the maps means
    * "unknown" (ineligible type) — never prune on it. */
  final case class FileStats(numRecords: Long,
                             minV: Map[String, Any], maxV: Map[String, Any],
                             nullC: Map[String, Long],
                             blooms: Map[String, (Int, Array[Long])] = Map.empty)

  // ---- minimal JSON codec for the stats payload ---------------------------
  // The stats object is machine-written by THIS module (strings, exact
  // decimal numbers, bools, nulls, one level of nesting), so a tiny
  // recursive-descent parser is enough — no library, deterministic.
  private object MiniJson {
    def escape(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case '\n' => "\\n"; case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    final class P(val s: String) { var i = 0
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      def expect(c: Char): Unit = { ws(); require(s.charAt(i) == c, s"expected $c at $i in $s"); i += 1 }
    }
    def parse(s: String): Any = { val p = new P(s); value(p) }
    private def value(p: P): Any = { p.ws(); p.s.charAt(p.i) match {
      case '{' => obj(p)
      case '[' => arr(p)
      case '"' => str(p)
      case 't' => p.i += 4; true
      case 'f' => p.i += 5; false
      case 'n' => p.i += 4; null
      case _ => num(p)
    }}
    private def arr(p: P): Seq[Any] = {
      p.expect('['); p.ws()
      if (p.s.charAt(p.i) == ']') { p.i += 1; return Seq.empty }
      val b = Seq.newBuilder[Any]
      var more = true
      while (more) {
        b += value(p); p.ws()
        if (p.s.charAt(p.i) == ',') p.i += 1 else more = false
      }
      p.expect(']'); b.result()
    }
    private def obj(p: P): Map[String, Any] = {
      p.expect('{'); p.ws()
      if (p.s.charAt(p.i) == '}') { p.i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var more = true
      while (more) {
        p.ws(); val k = str(p); p.expect(':'); b += (k -> value(p)); p.ws()
        if (p.s.charAt(p.i) == ',') p.i += 1 else more = false
      }
      p.expect('}'); b.result()
    }
    private def str(p: P): String = {
      p.expect('"'); val sb = new StringBuilder
      while (p.s.charAt(p.i) != '"') {
        if (p.s.charAt(p.i) == '\\') {
          p.s.charAt(p.i + 1) match {
            case 'n' => sb.append('\n'); p.i += 2
            case 'r' => sb.append('\r'); p.i += 2
            case 't' => sb.append('\t'); p.i += 2
            case 'u' => sb.append(Integer.parseInt(p.s.substring(p.i + 2, p.i + 6), 16).toChar); p.i += 6
            case c => sb.append(c); p.i += 2
          }
        } else { sb.append(p.s.charAt(p.i)); p.i += 1 }
      }
      p.i += 1; sb.toString
    }
    private def num(p: P): BigDecimal = {
      val st = p.i
      while (p.i < p.s.length && "+-0123456789.eE".indexOf(p.s.charAt(p.i)) >= 0) p.i += 1
      BigDecimal(p.s.substring(st, p.i))
    }
  }

  private[sources] def decodeStats(json: String): FileStats = {
    val m = MiniJson.parse(json).asInstanceOf[Map[String, Any]]
    FileStats(
      m("numRecords").asInstanceOf[BigDecimal].toLongExact,
      m.getOrElse("minValues", Map.empty).asInstanceOf[Map[String, Any]],
      m.getOrElse("maxValues", Map.empty).asInstanceOf[Map[String, Any]],
      m.getOrElse("nullCount", Map.empty).asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[BigDecimal].toLongExact })
  }

  private def logDir(root: String): Path = Paths.get(root, "_txn_log")
  private def deltaDir(root: String): Path = Paths.get(root, "_delta_log")

  /** Files.list with DETERMINISTIC close: the JDK stream holds an open
    * directory fd until closed, and GC-lazy reclamation let a long test
    * suite hit EMFILE (error=24) — every directory listing in this module
    * therefore materializes eagerly and closes before returning. Log/data
    * directories are O(files) small; the eager Seq is never the cost. */
  private def listClosed(d: Path): java.util.stream.Stream[Path] = {
    val s = java.nio.file.Files.list(d)
    try {
      val all = s.iterator().asScala.toVector
      java.util.Arrays.stream(all.toArray)
    } finally s.close()
  }

  /** Files.walk with deterministic close — see [[listClosed]]. */
  private def walkClosed(d: Path): java.util.stream.Stream[Path] = {
    val s = java.nio.file.Files.walk(d)
    try {
      val all = s.iterator().asScala.toVector
      java.util.Arrays.stream(all.toArray)
    } finally s.close()
  }

  /** Resolve a log file entry against the table root. Entries are
    * normally root-relative; a SHALLOW CLONE's version 0 re-adds the
    * source's files by ABSOLUTE path (the Delta clone shape), which
    * resolves as itself. */
  private[sources] def filePath(root: String, f: String): Path = {
    val p = Paths.get(f)
    if (p.isAbsolute) p else Paths.get(root, f)
  }

  private def versions(root: String): Seq[Long] = {
    val d = logDir(root)
    if (!Files.isDirectory(d)) Seq.empty
    else listClosed(d).iterator().asScala
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
  /** One add action as a log line. stats/partitionValues/bloom ride
    * base64-encoded so nested-JSON quoting never leaks into the line
    * grammar; the `_delta_log` mirror carries the same payloads in the
    * protocol's native form. Shared by [[commit]] and the `_txn_log`
    * checkpoint writer, so a checkpointed add re-parses identically. */
  private def addLine(version: Long, op: String, a: AddFile): String = {
    def b64(s: String): String =
      java.util.Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
    val partJson = a.partitionValues.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s""""${MiniJson.escape(k)}":"${MiniJson.escape(v)}"""" }
      .mkString("{", ",", "}")
    val stField = a.stats.map(j => s""","stats64":"${b64(j)}"""").getOrElse("")
    val pField = if (a.partitionValues.isEmpty) ""
      else s""","part64":"${b64(partJson)}""""
    val bField = a.bloom.map(j => s""","bloom64":"${b64(j)}"""").getOrElse("")
    val dField = a.dv.map(d => s""","dv64":"${b64(dvJson(d))}"""").getOrElse("")
    val rField = a.baseRowId.map(r => s""","baseRowId":$r""").getOrElse("")
    s"""{"version":$version,"op":"${esc(op)}","action":"add","file":"${esc(a.file)}","bytes":${a.bytes}$stField$pField$bField$dField$rField}"""
  }

  /** Spec-shaped deletionVector descriptor JSON (identical bytes in the
    * internal log's dv64 payload and the `_delta_log` mirror). */
  private def dvJson(d: DeletionVectors.DvDescriptor): String =
    s"""{"storageType":"${esc(d.storageType)}","pathOrInlineDv":"${esc(d.pathOrInlineDv)}","offset":${d.offset},"sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""

  private def parseDvJson(j: String): DeletionVectors.DvDescriptor = {
    val m = MiniJson.parse(j).asInstanceOf[Map[String, Any]]
    DeletionVectors.DvDescriptor(
      m("storageType").asInstanceOf[String],
      m("pathOrInlineDv").asInstanceOf[String],
      m.get("offset").map(_.asInstanceOf[BigDecimal].toIntExact).getOrElse(0),
      m("sizeInBytes").asInstanceOf[BigDecimal].toIntExact,
      m("cardinality").asInstanceOf[BigDecimal].toLongExact)
  }

  private[sources] def commit(root: String, version: Long, op: String,
                     adds: Seq[AddFile], removes: Seq[String],
                     schemaJson: Option[String] = None,
                     dataChange: Boolean = true,
                     txn: Option[(String, Long)] = None,
                     partCols: Seq[String] = Nil,
                     cdc: Seq[AddFile] = Nil,
                     extraConfig: Option[Map[String, String]] = None,
                     removeDvs: Map[String, DeletionVectors.DvDescriptor] = Map.empty): Unit = {
    Files.createDirectories(logDir(root))
    // ROW TRACKING: when enabled (possibly by THIS commit's extraConfig),
    // every not-yet-stamped add gets a fresh baseRowId block off the
    // folded high-water mark, and the commit records the advanced mark.
    // Re-adds (DV commits, restore, clone) arrive pre-stamped and keep
    // their ids — that is the stability contract.
    val effCfg = extraConfig.getOrElse(readTableConfig(root))
    val (stamped, hwmOpt) =
      if (adds.isEmpty || !effCfg.get("delta.enableRowTracking").contains("true"))
        (adds, None)
      else {
        val prior = foldState(root, version - 1).hwm
        // pre-stamped adds (re-adds, a CLONE's inherited ids) first raise
        // the mark — fresh blocks must never collide with ids that arrived
        // stamped from a log this table's own hwm lines never covered
        val preMax = adds.flatMap(a => a.baseRowId.map(_ +
          math.max(a.stats.map(decodeStats(_).numRecords).getOrElse(0L), 1L)))
          .maxOption.getOrElse(0L)
        var hwm = math.max(prior, preMax)
        val out = adds.map { a =>
          if (a.baseRowId.isDefined) a
          else {
            val n = a.stats.map(decodeStats(_).numRecords).getOrElse(sys.error(
              s"row tracking needs per-file stats; ${a.file} has none"))
            val s = a.copy(baseRowId = Some(hwm)); hwm += math.max(n, 1L); s
          }
        }
        (out, if (hwm > prior) Some(hwm) else None)
      }
    // removes BEFORE adds (the mirror's order too): a merge-on-read commit
    // removes and re-adds the SAME path (new deletion vector), and the
    // line-ordered fold must land on the re-add. A remove of a DV-carrying
    // instance names the descriptor it tombstones — strict protocol
    // readers reconcile adds/removes by (path, dvId), not path alone.
    val lines =
      removes.map { f =>
        val dField = removeDvs.get(f)
          .map(d => s""","dv64":"${java.util.Base64.getEncoder.encodeToString(dvJson(d).getBytes(UTF_8))}"""")
          .getOrElse("")
        s"""{"version":$version,"op":"${esc(op)}","action":"remove","file":"${esc(f)}","bytes":0$dField}"""
      } ++ stamped.map(addLine(version, op, _)) ++ cdc.map { a =>
        s"""{"version":$version,"op":"${esc(op)}","action":"cdc","file":"${esc(a.file)}","bytes":${a.bytes}}"""
      } ++ hwmOpt.map(h =>
        s"""{"version":$version,"op":"hwm","action":"hwm","file":"","bytes":$h}""").toSeq
    // version claim is a true compare-and-set: the content is fully
    // written to a writer-private tmp file, then HARD-LINKED into place —
    // link(2) fails atomically if the version exists, where rename(2)
    // silently REPLACES it (the classic lost-commit race). On S3-class
    // stores this link is a conditional put (If-None-Match) — the one
    // primitive to swap.
    val tmp = logDir(root).resolve(
      s".$version-${java.util.UUID.randomUUID().toString.take(8)}.json.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    val dst = logDir(root).resolve(f"$version%020d.json")
    try Files.createLink(dst, tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new ConcurrentCommitException(root, version)
    }
    Files.deleteIfExists(tmp)
    deltaCommit(root, version, op, stamped, removes, schemaJson, dataChange, txn,
      partCols, cdc, extraConfig, removeDvs, hwmOpt)
    if (version > 0 && version % CheckpointInterval == 0)
      writeTxnCheckpoint(root, version)
  }

  // ---- _txn_log checkpoints -------------------------------------------------
  // The same O(versions) critique the Delta mirror faced applies to this
  // module's OWN fold: without a checkpoint, every snapshot read parses
  // every commit file since version 0 — at 100k commits the log, not the
  // data, becomes the read bottleneck. Every CheckpointInterval commits
  // the winner writes `<v>.ckpt`: the full fold state at v (live adds
  // with their stats/bloom payloads, the idempotent-append token ledger,
  // the current schema + partition columns), so any read at asOf ≥ some
  // checkpoint folds ONE checkpoint + the tail. Older time travel still
  // folds from the nearest earlier checkpoint (or 0). Checkpoints are
  // derived state — deleting one only slows reads, never changes them.

  private def ckptPath(root: String, v: Long): Path =
    logDir(root).resolve(f"$v%020d.ckpt")

  private def ckptVersions(root: String): Seq[Long] = {
    val d = logDir(root)
    if (!Files.isDirectory(d)) Seq.empty
    else listClosed(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".ckpt"))
      .map(_.stripSuffix(".ckpt").toLong).toSeq.sorted
  }

  /** Ops carrying an idempotence token in the dedup ledger: tagged
    * appends ([[appendOnce]]) and tagged merges ([[mergeDvOnce]]). */
  private def tokenOp(op: String): Boolean =
    op.startsWith("append#") || op.startsWith("merge-dv#")

  /** The complete fold at one version: live adds, the idempotence-token
    * ledger, and the row-id high-water mark (next fresh row id; 0 when
    * row tracking never assigned any). */
  private final case class FoldedState(live: Seq[AddFile],
                                       tokens: Map[String, Long], hwm: Long)

  /** Fold state at `upTo` — seeds from the newest checkpoint ≤ upTo, then
    * folds only the tail. `hwm` lines ride `bytes` (a file-less marker
    * action, like token lines): the high-water mark must survive
    * [[expireLog]] and vacuumed history, or freed ids would be REUSED and
    * break row-id stability — so it folds as a max, never recomputed from
    * the (possibly truncated) add set. */
  private def foldState(root: String, upTo: Long): FoldedState = {
    val ck = ckptVersions(root).filter(_ <= upTo).lastOption
    val live = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    val tokens = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var hwm = 0L
    ck.foreach { v =>
      Files.readAllLines(ckptPath(root, v)).asScala.foreach { line =>
        val m = MiniJson.parse(line).asInstanceOf[Map[String, Any]]
        m("action").asInstanceOf[String] match {
          case "add" =>
            val a = parseAddFields(m)
            live(a.file) = a
          case "token" =>
            tokens(m("op").asInstanceOf[String]) =
              m("version").asInstanceOf[BigDecimal].toLongExact
          case "hwm" =>
            hwm = math.max(hwm, m("bytes").asInstanceOf[BigDecimal].toLongExact)
          case _ => () // meta — consumed by readMeta's short-circuit
        }
      }
    }
    versions(root).filter(v => v > ck.getOrElse(-1L) && v <= upTo)
      .foreach { v =>
        parseLog(root, v).foreach {
          case Action(_, op, "add", a) =>
            live(a.file) = a
            if (tokenOp(op)) tokens(op) = v
          case Action(_, op, "remove", a) =>
            live.remove(a.file)
            if (tokenOp(op)) tokens(op) = v
          case Action(_, _, "hwm", a) =>
            hwm = math.max(hwm, a.bytes)
          case _ => ()
        }
      }
    FoldedState(live.values.toSeq, tokens.toMap, hwm)
  }

  /** (checkpoint version used, tail commit files folded) for a read at
    * `asOf` — the observability hook the checkpoint spec gates on. */
  private[graft] def foldReport(root: String, asOf: Long = -1L): (Option[Long], Int) = {
    val upTo = if (asOf < 0) latestVersion(root) else asOf
    val ck = ckptVersions(root).filter(_ <= upTo).lastOption
    (ck, versions(root).count(v => v > ck.getOrElse(-1L) && v <= upTo))
  }

  private def writeTxnCheckpoint(root: String, version: Long): Unit = {
    val st = foldState(root, version)
    val (live, tokens) = (st.live, st.tokens)
    val metaLine = readMeta(root, version).map { case (schema, pcs) =>
      def b64(s: String) =
        java.util.Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
      val s64 = b64(schema.json)
      val p64 = b64(pcs.map(c => s""""${MiniJson.escape(c)}"""")
        .mkString("[", ",", "]"))
      val c64 = b64(readTableConfig(root).toSeq.sortBy(_._1)
        .map { case (k, v) =>
          s""""${MiniJson.escape(k)}":"${MiniJson.escape(v)}"""" }
        .mkString("{", ",", "}"))
      s"""{"version":$version,"op":"meta","action":"meta","file":"","bytes":0,"schema64":"$s64","parts64":"$p64","config64":"$c64"}"""
    }.toSeq
    val lines = metaLine ++
      live.map(addLine(version, "checkpoint", _)) ++
      tokens.toSeq.sortBy(_._2).map { case (op, v) =>
        s"""{"version":$v,"op":"${esc(op)}","action":"token","file":"","bytes":0}""" } ++
      (if (st.hwm > 0)
        Seq(s"""{"version":$version,"op":"hwm","action":"hwm","file":"","bytes":${st.hwm}}""")
      else Seq.empty)
    val tmp = logDir(root).resolve(
      s".$version-${java.util.UUID.randomUUID().toString.take(8)}.ckpt.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    // derived state: lose the race, keep the winner's (identical) fold
    try Files.createLink(ckptPath(root, version), tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    Files.deleteIfExists(tmp)
  }

  /** Decode the AddFile fields of a parsed add-action line. */
  private def parseAddFields(m: Map[String, Any]): AddFile = {
    def b64(k: String): Option[String] = m.get(k).map(s =>
      new String(java.util.Base64.getDecoder.decode(s.asInstanceOf[String]), UTF_8))
    val pvs = b64("part64").map(j =>
      MiniJson.parse(j).asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> v.asInstanceOf[String] })
      .getOrElse(Map.empty[String, String])
    AddFile(m("file").asInstanceOf[String],
      m("bytes").asInstanceOf[BigDecimal].toLongExact,
      b64("stats64"), pvs, b64("bloom64"),
      b64("dv64").map(parseDvJson),
      m.get("baseRowId").map(_.asInstanceOf[BigDecimal].toLongExact))
  }

  /** Another writer claimed this version first; the caller rebases on the
    * new snapshot and retries (appends) or re-runs its read-modify-write
    * body (merge/delete/overwrite/optimize) — see [[casRetry]]. */
  final class ConcurrentCommitException(root: String, version: Long)
    extends RuntimeException(
      s"version $version of $root was committed concurrently")

  /** Re-run `body` (which recomputes latest+1 and its snapshot basis each
    * attempt) until its commit wins the version CAS. Orphaned data files a
    * losing attempt wrote are unreferenced by any log entry, invisible to
    * readers, and reclaimed by [[vacuum]] — the same garbage story as the
    * open formats. */
  private[sources] def casRetry[T](what: String)(body: => T): T = {
    var attempts = 0
    while (true) {
      try return body
      catch { case _: ConcurrentCommitException =>
        attempts += 1
        require(attempts < 64, s"$what lost the commit race $attempts times")
      }
    }
    sys.error("unreachable")
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
                          adds: Seq[AddFile], removes: Seq[String],
                          schemaJson: Option[String], dataChange: Boolean,
                          txn: Option[(String, Long)],
                          partCols: Seq[String] = Nil,
                          cdc: Seq[AddFile] = Nil,
                          extraConfig: Option[Map[String, String]] = None,
                          removeDvs: Map[String, DeletionVectors.DvDescriptor] = Map.empty,
                          hwm: Option[Long] = None): Unit = {
    Files.createDirectories(deltaDir(root))
    // MONOTONIC commit timestamps (Delta's inCommitTimestamp semantics):
    // timestampAsOf time travel scans commitInfo stamps newest-first and
    // early-exits on the first hit — a wall clock that regressed between
    // writers (skew, NTP step) would silently resolve the WRONG version.
    // Stamp max(now, previous + 1): strictly increasing at any commit
    // rate, one tiny prior-file read per commit.
    val now = {
      val wall = System.currentTimeMillis()
      if (version == 0L) wall
      else try math.max(wall, commitTimestamp(root, version - 1) + 1)
      catch { case _: Exception => wall } // prior mirror expired: keep wall
    }
    val pcJson = partCols.map(c => s""""${esc(c)}"""").mkString("[", ",", "]")
    // a metaData action rides version 0, any commit whose schema shape
    // evolved, and any configuration change (constraints) — latest-wins
    // fold on the read side, per the protocol
    val emitMeta = version == 0L || extraConfig.isDefined || schemaJson.exists { j =>
      readMeta(root).exists { case (cur, _) =>
        !sameShape(cur, DataType.fromJson(j).asInstanceOf[StructType]) }
    }
    // configuration survives re-emission: a schema evolution must not drop
    // the table's constraints
    val config = extraConfig.getOrElse(
      if (version == 0L) Map.empty[String, String] else readTableConfig(root))
    val configJson = config.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    // CHECK constraints require writer feature level 3 (delta.io
    // PROTOCOL.md); the commit that first sets one upgrades the protocol.
    // Deletion vectors are a TABLE FEATURE: reader 3 / writer 7 with
    // explicit readerFeatures/writerFeatures. Feature state is derived
    // from the FOLDED config (already in hand — O(1)): once
    // delta.enableDeletionVectors landed, every later protocol emission
    // keeps the feature lists, so a later constraint commit can never
    // fold-downgrade the protocol below what the DV files require.
    val needsWriter3 = extraConfig.exists(_.keys.exists(_.startsWith("delta.constraints.")))
    val dvActive = adds.exists(_.dv.isDefined) ||
      config.get("delta.enableDeletionVectors").contains("true")
    // name-mode column mapping needs reader 2 / writer 5 (legacy levels);
    // under table features it must be LISTED alongside deletionVectors.
    // typeWidening exists ONLY as a table feature (no legacy level), so a
    // widened table emits the feature protocol even without DVs.
    val mappingActive = config.get("delta.columnMapping.mode").contains("name")
    val wideningActive = config.get("delta.enableTypeWidening").contains("true")
    val genActive = config.get("graft.generatedColumns").exists(_.nonEmpty)
    val rowTrackingActive = config.get("delta.enableRowTracking").contains("true")
    val constraintsActive =
      config.keys.exists(_.startsWith("delta.constraints.")) || needsWriter3
    val featureProtocol = {
      val dvF = if (dvActive) Seq("deletionVectors") else Nil
      val mapF = if (mappingActive) Seq("columnMapping") else Nil
      val wideF = if (wideningActive) Seq("typeWidening") else Nil
      val rf = dvF ++ mapF ++ wideF
      val wf = dvF ++ mapF ++ wideF ++
        (if (constraintsActive) Seq("checkConstraints") else Nil) ++
        (if (genActive) Seq("generatedColumns") else Nil) ++
        // rowTracking + domainMetadata are WRITER features (a reader that
        // ignores baseRowId still reads the rows)
        (if (rowTrackingActive) Seq("rowTracking", "domainMetadata") else Nil)
      def arr(fs: Seq[String]) = fs.map(f => s""""$f"""").mkString("[", ",", "]")
      if (rf.isEmpty)
        s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":${arr(wf)}}}"""
      else
        s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":${arr(rf)},"writerFeatures":${arr(wf)}}}"""
    }
    // legacy protocol levels are cumulative: mapping 2/5 ⊇ generated 1/4 ⊇
    // constraints 1/3 ⊇ base 1/2 — a commit that activates any of them
    // emits the MAX the folded config requires
    val legacyWriter = Seq(2, if (constraintsActive) 3 else 2,
      if (genActive) 4 else 2, if (mappingActive) 5 else 2).max
    val legacyReader = if (mappingActive) 2 else 1
    val head =
      (if ((dvActive || wideningActive || rowTrackingActive) &&
        (adds.exists(_.dv.isDefined) || needsWriter3 || extraConfig.isDefined))
        Seq(featureProtocol)
      else if (version == 0L)
        Seq(s"""{"protocol":{"minReaderVersion":$legacyReader,"minWriterVersion":$legacyWriter}}""")
      else if (legacyWriter > 2 && extraConfig.isDefined)
        Seq(s"""{"protocol":{"minReaderVersion":$legacyReader,"minWriterVersion":$legacyWriter}}""")
      else if (needsWriter3)
        Seq(s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""")
      else Seq.empty) ++
      (if (emitMeta) Seq(
        s"""{"metaData":{"id":"${tableId(root)}","format":{"provider":"parquet","options":{}},"schemaString":"${esc(schemaJson.getOrElse(sys.error("first commit must carry a schema")))}","partitionColumns":$pcJson,"configuration":$configJson,"createdTime":$now}}""")
      else Seq.empty) ++
      txn.map { case (app, v) => s"""{"txn":{"appId":"${esc(app)}","version":$v}}""" }.toSeq ++
      Seq(s"""{"commitInfo":{"timestamp":$now,"operation":"${esc(op)}"}}""")
    val lines = head ++
      removes.map { f =>
        val dvF = removeDvs.get(f)
          .map(d => s""","deletionVector":${dvJson(d)}""").getOrElse("")
        s"""{"remove":{"path":"${esc(f)}","deletionTimestamp":$now,"dataChange":$dataChange$dvF}}"""
      } ++
      adds.map { a =>
        val mt = Files.getLastModifiedTime(filePath(root, a.file)).toMillis
        val stField = a.stats.map(j => s""","stats":"${esc(j)}"""").getOrElse("")
        val dvField = a.dv.map(d => s""","deletionVector":${dvJson(d)}""").getOrElse("")
        // row tracking per the protocol: the add's fresh-id base and the
        // version whose commit assigned it
        val rField = a.baseRowId.map(r =>
          s""","baseRowId":$r,"defaultRowCommitVersion":$version""").getOrElse("")
        val pv = a.partitionValues.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
          .mkString("{", ",", "}")
        s"""{"add":{"path":"${esc(a.file)}","partitionValues":$pv,"size":${a.bytes},"modificationTime":$mt,"dataChange":$dataChange$stField$dvField$rField}}"""
      } ++
      // the row-id high-water mark is DOMAIN METADATA per the protocol —
      // the one piece of row-tracking state adds alone cannot carry
      // (vacuumed history must never recycle ids)
      hwm.map(h =>
        s"""{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\\"rowIdHighWaterMark\\":${h - 1}}","removed":false}}""").toSeq ++
      // change-data files (the protocol's AddCDCFile): CDF readers fold
      // these from the version-range commit JSONs — per the protocol they
      // do NOT enter checkpoints, so writeDeltaCheckpoint skips them
      cdc.map { a =>
        s"""{"cdc":{"path":"${esc(a.file)}","partitionValues":{},"size":${a.bytes},"dataChange":false}}"""
      }
    val tmp = deltaDir(root).resolve(s".$version.json.tmp")
    Files.write(tmp, lines.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, deltaDir(root).resolve(f"$version%020d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    if (version > 0 && version % CheckpointInterval == 0)
      writeDeltaCheckpoint(root, version)
  }

  /** Commits between Delta checkpoint parquet files. */
  private[sources] val CheckpointInterval = 10L

  /** Write a PROTOCOL.md checkpoint: one parquet file holding the complete
    * replay state at `version` (latest protocol + metaData, per-appId txn
    * high-water marks, every live add, current remove tombstones), plus the
    * `_last_checkpoint` pointer. External readers then fold O(1) checkpoint
    * rows + the JSON tail after it instead of every commit since version 0
    * — without this, a 100k-commit table's LOG becomes the read bottleneck.
    * The state is reconstructed by folding the mirror's own JSON (never the
    * private `_txn_log`), so the checkpoint can only contain what an
    * external reader would have computed itself. Checkpoint actions carry
    * `dataChange:false` per the protocol. The pointer is written LAST and
    * atomically: a crash mid-checkpoint leaves the previous pointer intact
    * and readers just fold a longer tail.
    *
    * The fold SEEDS from the newest prior checkpoint parquet (exactly like
    * an external reader would) and replays only the JSON tail after it.
    * Without the seed, the first checkpoint-boundary commit after
    * [[expireLog]] — which deletes the JSONs below the previous checkpoint
    * — would find no protocol/metaData line at all, or worse, silently
    * drop every live add recorded only in the expired JSONs. */
  private def writeDeltaCheckpoint(root: String, version: Long): Unit = {
    val spark = org.apache.spark.sql.SparkSession.getActiveSession.getOrElse(return)
    val d = deltaDir(root)
    var protocol: Map[String, Any] = null
    var metaData: Map[String, Any] = null
    val txns = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val adds = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Any]]
    val tombs = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Any]]
    // latest-wins per domain (the protocol's domainMetadata fold rule)
    val domains = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Any]]
    // -- seed from the newest prior checkpoint, if any ---------------------
    val priorCp = listClosed(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".checkpoint.parquet"))
      .map(_.stripSuffix(".checkpoint.parquet").toLong).filter(_ < version)
      .maxOption
    priorCp.foreach { cv =>
      def bd(l: Any): Any = l match {
        case l: java.lang.Long    => BigDecimal(l.longValue)
        case i: java.lang.Integer => BigDecimal(i.intValue)
        case _                    => null
      }
      def noNull(m: Map[String, Any]): Map[String, Any] =
        m.filter(_._2 != null)
      spark.read.parquet(d.resolve(f"$cv%020d.checkpoint.parquet").toString)
        .collect().foreach { r =>
          def optField(row: org.apache.spark.sql.Row, name: String): Option[Any] =
            if (row.schema != null && row.schema.fieldNames.contains(name) &&
              !row.isNullAt(row.fieldIndex(name)))
              Some(row.get(row.fieldIndex(name)))
            else None
          if (!r.isNullAt(r.fieldIndex("protocol"))) {
            val p = r.getStruct(r.fieldIndex("protocol"))
            protocol = Map(
              "minReaderVersion" -> bd(p.get(0)),
              "minWriterVersion" -> bd(p.get(1))) ++
              optField(p, "readerFeatures").map(f =>
                "readerFeatures" -> (f.asInstanceOf[scala.collection.Seq[String]]
                  .toSeq.map(x => x: Any): Any)) ++
              optField(p, "writerFeatures").map(f =>
                "writerFeatures" -> (f.asInstanceOf[scala.collection.Seq[String]]
                  .toSeq.map(x => x: Any): Any))
          }
          if (!r.isNullAt(r.fieldIndex("metaData"))) {
            val m = r.getStruct(r.fieldIndex("metaData"))
            metaData = noNull(Map(
              "id" -> m.get(0), "name" -> m.get(1), "description" -> m.get(2),
              "schemaString" -> m.get(4),
              "partitionColumns" ->
                (if (m.isNullAt(5)) null else m.getSeq[String](5).toSeq),
              "configuration" ->
                (if (m.isNullAt(6)) null else m.getMap[String, String](6).toMap),
              "createdTime" -> bd(m.get(7))))
          }
          if (!r.isNullAt(r.fieldIndex("txn"))) {
            val t = r.getStruct(r.fieldIndex("txn"))
            txns(t.getString(0)) = t.getLong(1)
          }
          if (!r.isNullAt(r.fieldIndex("add"))) {
            val a = r.getStruct(r.fieldIndex("add"))
            val dvSeed = optField(a, "deletionVector").map { d0 =>
              val d = d0.asInstanceOf[org.apache.spark.sql.Row]
              "deletionVector" -> (Map(
                "storageType" -> d.getString(0),
                "pathOrInlineDv" -> d.getString(1),
                "sizeInBytes" -> bd(d.get(3)),
                "cardinality" -> bd(d.get(4))) ++
                (if (d.isNullAt(2)) Map.empty[String, Any]
                 else Map("offset" -> bd(d.get(2)))): Any)
            }
            adds(a.getString(0)) = noNull(Map(
              "path" -> a.getString(0),
              "partitionValues" ->
                (if (a.isNullAt(1)) Map.empty[String, Any]
                 else a.getMap[String, String](1).toMap),
              "size" -> bd(a.get(2)), "modificationTime" -> bd(a.get(3)),
              "stats" -> a.get(5)) ++ dvSeed ++
              optField(a, "baseRowId").map("baseRowId" -> bd(_)) ++
              optField(a, "defaultRowCommitVersion")
                .map("defaultRowCommitVersion" -> bd(_)))
          }
          if (r.schema.fieldNames.contains("domainMetadata") &&
            !r.isNullAt(r.fieldIndex("domainMetadata"))) {
            val dm = r.getStruct(r.fieldIndex("domainMetadata"))
            domains(dm.getString(0)) = Map(
              "domain" -> dm.getString(0),
              "configuration" -> dm.getString(1),
              "removed" -> dm.getBoolean(2))
          }
          if (!r.isNullAt(r.fieldIndex("remove"))) {
            val t = r.getStruct(r.fieldIndex("remove"))
            val path = t.getString(0)
            adds.remove(path)
            // the tombstone's deletionVector (the instance it superseded)
            // must survive the seed: strict readers reconcile by (path,
            // dvId) and a dropped descriptor would break that after
            // expireLog removes the JSON that carried it
            val dvSeed = optField(t, "deletionVector").map { d0 =>
              val d = d0.asInstanceOf[org.apache.spark.sql.Row]
              "deletionVector" -> (Map(
                "storageType" -> d.getString(0),
                "pathOrInlineDv" -> d.getString(1),
                "sizeInBytes" -> bd(d.get(3)),
                "cardinality" -> bd(d.get(4))) ++
                (if (d.isNullAt(2)) Map.empty[String, Any]
                 else Map("offset" -> bd(d.get(2)))): Any)
            }
            tombs(path) = noNull(Map(
              "path" -> path, "deletionTimestamp" -> bd(t.get(1))) ++ dvSeed)
          }
        }
    }
    // -- fold only the JSON tail after the seed ----------------------------
    val vs = listClosed(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .filter(v => v <= version && v > priorCp.getOrElse(-1L)).toSeq.sorted
    vs.foreach { v =>
      Files.readAllLines(d.resolve(f"$v%020d.json")).asScala.foreach { line =>
        val m = MiniJson.parse(line).asInstanceOf[Map[String, Any]]
        m.get("protocol").foreach(p => protocol = p.asInstanceOf[Map[String, Any]])
        m.get("metaData").foreach(p => metaData = p.asInstanceOf[Map[String, Any]])
        m.get("txn").foreach { p => val t = p.asInstanceOf[Map[String, Any]]
          txns(t("appId").asInstanceOf[String]) =
            t("version").asInstanceOf[BigDecimal].toLongExact }
        m.get("add").foreach { p => val a = p.asInstanceOf[Map[String, Any]]
          val path = a("path").asInstanceOf[String]
          adds(path) = a; tombs.remove(path) }
        m.get("remove").foreach { p => val r = p.asInstanceOf[Map[String, Any]]
          val path = r("path").asInstanceOf[String]
          adds.remove(path); tombs(path) = r }
        m.get("domainMetadata").foreach { p =>
          val dm = p.asInstanceOf[Map[String, Any]]
          domains(dm("domain").asInstanceOf[String]) = dm }
      }
    }
    import org.apache.spark.sql.Row
    def lng(m: Map[String, Any], k: String): java.lang.Long =
      m.get(k).map(v => java.lang.Long.valueOf(
        v.asInstanceOf[BigDecimal].toLongExact)).orNull
    def str(m: Map[String, Any], k: String): String =
      m.get(k).map(_.asInstanceOf[String]).orNull
    def strSeq(m: Map[String, Any], k: String): Seq[String] =
      m.get(k).map(_.asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])).orNull
    def dvRow(m: Map[String, Any]): Row =
      m.get("deletionVector").map { d0 =>
        val d = d0.asInstanceOf[Map[String, Any]]
        Row(str(d, "storageType"), str(d, "pathOrInlineDv"),
          d.get("offset").map(x =>
            Integer.valueOf(x.asInstanceOf[BigDecimal].toIntExact)).orNull,
          Integer.valueOf(d("sizeInBytes").asInstanceOf[BigDecimal].toIntExact),
          java.lang.Long.valueOf(d("cardinality").asInstanceOf[BigDecimal].toLongExact))
      }.orNull
    val rows: Seq[Row] =
      Seq(Row(null, null, null, null,
        Row(Integer.valueOf(protocol("minReaderVersion").asInstanceOf[BigDecimal].toIntExact),
            Integer.valueOf(protocol("minWriterVersion").asInstanceOf[BigDecimal].toIntExact),
            strSeq(protocol, "readerFeatures"),
            strSeq(protocol, "writerFeatures")), null)) ++
      Seq(Row(null, null, null,
        Row(str(metaData, "id"), str(metaData, "name"), str(metaData, "description"),
          Row("parquet", Map.empty[String, String]),
          str(metaData, "schemaString"),
          metaData.getOrElse("partitionColumns", Seq.empty).asInstanceOf[Seq[Any]]
            .map(_.asInstanceOf[String]),
          // the real configuration (delta.constraints.* etc.) must survive
          // into the checkpoint — after expireLog removes the
          // metaData-bearing JSONs it is the only copy an external reader
          // ever sees
          metaData.getOrElse("configuration", Map.empty)
            .asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> v.asInstanceOf[String] },
          lng(metaData, "createdTime")),
        null, null)) ++
      txns.toSeq.map { case (app, v) =>
        Row(Row(app, java.lang.Long.valueOf(v), null), null, null, null, null, null) } ++
      adds.values.toSeq.map { a =>
        Row(null,
          Row(str(a, "path"),
            a.getOrElse("partitionValues", Map.empty).asInstanceOf[Map[String, Any]]
              .map { case (k, v) => k -> v.asInstanceOf[String] },
            lng(a, "size"), lng(a, "modificationTime"),
            java.lang.Boolean.FALSE, str(a, "stats"), dvRow(a),
            lng(a, "baseRowId"), lng(a, "defaultRowCommitVersion")),
          null, null, null, null) } ++
      tombs.values.toSeq.map { r =>
        Row(null, null,
          Row(str(r, "path"), lng(r, "deletionTimestamp"), java.lang.Boolean.FALSE,
            dvRow(r)),
          null, null, null) } ++
      domains.values.toSeq.map { dm =>
        Row(null, null, null, null, null,
          Row(dm("domain").asInstanceOf[String],
            dm("configuration").asInstanceOf[String],
            java.lang.Boolean.valueOf(
              dm.get("removed").exists(_ == true)))) }
    val cpSchema = StructType(Seq(
      StructField("txn", StructType(Seq(
        StructField("appId", StringType), StructField("version", LongType),
        StructField("lastUpdated", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType),
        StructField("deletionVector", StructType(Seq(
          StructField("storageType", StringType),
          StructField("pathOrInlineDv", StringType),
          StructField("offset", IntegerType),
          StructField("sizeInBytes", IntegerType),
          StructField("cardinality", LongType)))),
        StructField("baseRowId", LongType),
        StructField("defaultRowCommitVersion", LongType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType),
        StructField("deletionVector", StructType(Seq(
          StructField("storageType", StringType),
          StructField("pathOrInlineDv", StringType),
          StructField("offset", IntegerType),
          StructField("sizeInBytes", IntegerType),
          StructField("cardinality", LongType))))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType),
        StructField("description", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", MapType(StringType, StringType))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("domainMetadata", StructType(Seq(
        StructField("domain", StringType),
        StructField("configuration", StringType),
        StructField("removed", BooleanType))))))
    val tmpDir = d.resolve(s".cp-$version")
    spark.createDataFrame(rows.asJava, cpSchema).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
    val part = listClosed(tmpDir).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error("checkpoint write produced no parquet part"))
    Files.move(part, d.resolve(f"$version%020d.checkpoint.parquet"),
      StandardCopyOption.ATOMIC_MOVE)
    walkClosed(tmpDir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    val ptrTmp = d.resolve(s"._last_checkpoint.tmp")
    Files.write(ptrTmp,
      s"""{"version":$version,"size":${rows.size}}""".getBytes(UTF_8))
    Files.move(ptrTmp, d.resolve("_last_checkpoint"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def statsEligible(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType => true
    case _ => false
  }

  /** JSON-encode one stat value (String | Boolean | BigDecimal | null). */
  private def statJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + MiniJson.escape(s) + "\""
    case b: Boolean => b.toString
    case d: java.math.BigDecimal => d.toPlainString
    case n => n.toString
  }

  /** Three-way compare in stat-value space (both sides String | Boolean |
    * java.math.BigDecimal); strings in UTF8 binary order. */
  private def statOrd(a: Any, b: Any): Int = (a, b) match {
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: String, y: String) =>
      UTF8String.fromString(x).compareTo(UTF8String.fromString(y))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case _ => sys.error(s"incomparable stats $a / $b")
  }

  /** Per-file column stats straight from the parquet FOOTER — O(footer)
    * driver metadata I/O, no Spark job, which is what keeps every commit's
    * stats cost proportional to file COUNT, not data size, at 100 TB.
    * Parquet chunk statistics are bounds by contract (binary truncation
    * rounds min down and max up), and bounds are exactly what pruning
    * needs. A column any row group lacks stats for is left out (= never
    * pruned on); numRecords is always exact. */
  private def footerStats(p: Path, schema: StructType): String = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri),
      new org.apache.hadoop.conf.Configuration()))
    try {
      val blocks = rd.getFooter.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val mins = Map.newBuilder[String, Any]
      val maxs = Map.newBuilder[String, Any]
      val nulls = Map.newBuilder[String, Long]
      for (f <- schema.fields if statsEligible(f.dataType)) {
        val chunks = blocks.map(b =>
          b.getColumns.asScala.find(_.getPath.toDotString == f.name))
        if (chunks.nonEmpty && chunks.forall(_.isDefined)) {
          val sts = chunks.flatten.map(_.getStatistics)
          if (sts.forall(s => s != null && s.isNumNullsSet)) {
            val nullTotal = sts.map(_.getNumNulls).sum
            nulls += f.name -> nullTotal
            val valued = sts.filter(_.hasNonNullValue)
            val allNullChunksProven = // chunks without values are all-null
              sts.zip(blocks).forall { case (s, b) =>
                s.hasNonNullValue || s.getNumNulls == b.getRowCount }
            if (valued.isEmpty && nullTotal == numRecords) {
              mins += f.name -> null; maxs += f.name -> null
            } else if (valued.nonEmpty && allNullChunksProven) {
              val vs = valued.map(s => (statValue(f.dataType, s.genericGetMin),
                statValue(f.dataType, s.genericGetMax)))
              if (vs.forall { case (a, b) => a != null && b != null }) {
                mins += f.name -> vs.map(_._1).reduce((a, b) => if (statOrd(a, b) <= 0) a else b)
                maxs += f.name -> vs.map(_._2).reduce((a, b) => if (statOrd(a, b) >= 0) a else b)
              }
            }
          }
        }
      }
      def obj(m: Map[String, Any]) = m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${MiniJson.escape(k)}":${statJson(v)}""" }
        .mkString("{", ",", "}")
      s"""{"numRecords":$numRecords,"minValues":${obj(mins.result())},""" +
        s""""maxValues":${obj(maxs.result())},""" +
        s""""nullCount":${obj(nulls.result().map { case (k, v) =>
          k -> (java.math.BigDecimal.valueOf(v): Any) })}}"""
    } finally rd.close()
  }

  /** Decode a footer min/max into stat-value space for the Spark type;
    * null = undecodable (NaN, unexpected physical type) → drop the column. */
  private def statValue(dt: DataType, v: Any): Any = (dt, v) match {
    case (StringType, b: org.apache.parquet.io.api.Binary) => b.toStringUsingUTF8
    case (BooleanType, b: java.lang.Boolean) => b
    case (d: DecimalType, i: java.lang.Integer) =>
      java.math.BigDecimal.valueOf(i.longValue, d.scale)
    case (d: DecimalType, l: java.lang.Long) =>
      java.math.BigDecimal.valueOf(l.longValue, d.scale)
    case (d: DecimalType, b: org.apache.parquet.io.api.Binary) =>
      new java.math.BigDecimal(new java.math.BigInteger(b.getBytes), d.scale)
    case (FloatType, f: java.lang.Float) =>
      if (f.isNaN || f.isInfinite) null else new java.math.BigDecimal(f.toString)
    case (DoubleType, dd: java.lang.Double) =>
      if (dd.isNaN || dd.isInfinite) null else new java.math.BigDecimal(dd.toString)
    case (_: NumericType, n: Number) => new java.math.BigDecimal(n.toString)
    case _ => null
  }

  /** Writer-private data directory: named for the version the writer was
    * AIMING at plus a random tag, so concurrent writers never collide on a
    * path and a commit that loses the version CAS can rebase and point its
    * log entry at the files it already wrote. Files only become visible
    * through a committed log entry; never-committed ones are orphans that
    * [[vacuum]] sweeps. */
  private def dataSub(version: Long): String =
    s"data/v$version-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Write per-commit CHANGE-DATA files (table columns + `_change_type`)
    * under `cdc/v<version>-<tag>` — the persisted row-level diff an
    * incremental CDF consumer reads instead of re-diffing snapshots. No
    * stats (never pruned on; read whole by version). */
  private[sources] def writeCdcFiles(df0: DataFrame, root: String, version: Long): Seq[AddFile] = {
    // change files carry the STABLE physical names, exactly like data
    // files — a post-rename cdc file written under the new logical name
    // would read back null through every physical-name-resolving consumer
    // (the txn-tail change feed); readers re-attach the logical names of
    // their own range end. `_change_type` is a feed column, never mapped.
    val mapping = readMeta(root).map(m => colMapping(m._1)).getOrElse(Map.empty)
    val df = if (mapping.isEmpty) df0
      else df0.select(df0.columns.toSeq.map(c =>
        col(c).as(mapping.getOrElse(c, c))): _*)
    val sub = s"cdc/v$version-${java.util.UUID.randomUUID().toString.take(8)}"
    val dst = Paths.get(root, sub)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dst.toString)
    listClosed(dst).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .toSeq.sorted
      .map(n => AddFile(s"$sub/$n", Files.size(dst.resolve(n)), None))
  }

  /** Write `df` under a fresh [[dataSub]] dir; stats come off each file's
    * footer (see [[footerStats]] — no second scan). `check = false` skips
    * CHECK-constraint validation (layout-only rewrites of already-valid
    * rows — OPTIMIZE/ZORDER — must not pay a validation pass). */
  private[sources] def writeDataFiles(df0: DataFrame, root: String, version: Long,
                             check: Boolean = true,
                             mappingOverride: Option[Map[String, String]] = None): Seq[AddFile] = {
    if (check) validateConstraints(df0, root)
    // under column mapping the FILES carry the stable physical names (the
    // logical batch columns rename just before the write); stats therefore
    // key by physical name, matching what pruning translates to.
    // `mappingOverride` carries the POST-evolution mapping when the batch
    // introduces new columns to a mapped table — those must land under
    // their fresh physical names, which the current metadata cannot know.
    val mapping = mappingOverride.getOrElse(
      readMeta(root).map(m => colMapping(m._1)).getOrElse(Map.empty))
    val df = if (mapping.isEmpty) df0
      else df0.select(df0.columns.toSeq.map(c =>
        col(c).as(mapping.getOrElse(c, c))): _*)
    val sub = dataSub(version)
    val dst = Paths.get(root, sub)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dst.toString)
    val names = listClosed(dst).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
      .toSeq.sorted
    // footer reads are independent metadata I/O — fan out across the
    // common pool; a commit's stats latency stays O(files / cores)
    val stats = new java.util.concurrent.ConcurrentHashMap[String, String]()
    names.asJava.parallelStream()
      .forEach(n => stats.put(n, footerStats(dst.resolve(n), df.schema)))
    names.map(n => AddFile(s"$sub/$n", Files.size(dst.resolve(n)),
      Some(stats.get(n))))
  }

  /** Append `df` as a new commit; returns the committed version. Safe
    * under CONCURRENT writers: the data files are written once (appends
    * are snapshot-independent), then the version claim retries the CAS
    * until it lands on a fresh latest+1. The batch schema must match the
    * table's (names + types; order and nullability free) — for widening
    * batches use [[appendEvolve]]. */
  /** CREATE an empty table: a v0 commit fixing the schema (and, when
    * `partCols` is non-empty, the hive partition layout every later append
    * must match). One schema-bearing empty part file keeps the snapshot
    * readable from birth (a zero-row scan, not an error) — the CREATE
    * TABLE half of the SQL surface's CTAS. */
  def create(spark: SparkSession, root: String, schema: StructType,
             partCols: Seq[String] = Nil): Long = {
    require(latestVersion(root) < 0, s"$root already has a _txn_log")
    require(partCols.forall(schema.fieldNames.contains),
      s"partition columns ${partCols.mkString(",")} must exist in the schema")
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      .repartition(1)
    val adds = writeDataFiles(empty, root, 0, check = false)
    commit(root, 0, "create", adds, Seq.empty,
      schemaJson = Some(schema.json), partCols = partCols)
    0L
  }

  def append(df: DataFrame, root: String): Long =
    appendImpl(df, root, evolve = false)

  /** Append with SCHEMA EVOLUTION (the mergeSchema shape): new columns
    * extend the table schema (a metaData action records the evolved shape
    * at this commit — latest-wins on read, old versions keep theirs under
    * time travel), columns the batch omits read back as null from the
    * unified-schema scan, and type changes are refused. */
  def appendEvolve(df: DataFrame, root: String): Long =
    appendImpl(df, root, evolve = true)

  /** Unify the batch schema with the table's current one. `evolve = false`
    * refuses any shape drift; `evolve = true` widens (new columns append,
    * type changes are refused). Recomputed per CAS attempt — see
    * [[appendImpl]]. */
  private def unifiedSchema(root: String, batch: StructType,
                            evolve: Boolean, what: String): StructType =
    readMeta(root) match {
      case None => batch
      case Some((cur, _)) if sameShape(cur, batch) => cur
      case Some((cur, _)) =>
        require(evolve,
          s"$what batch schema ${batch.simpleString} does not match table " +
            s"schema ${cur.simpleString}; use appendEvolve to widen")
        val curTypes = cur.fields.map(f => f.name -> f.dataType).toMap
        batch.fields.foreach { f =>
          curTypes.get(f.name).foreach { dt =>
            require(dt == f.dataType,
              s"column ${f.name}: type change $dt -> ${f.dataType} is not " +
                "supported in an append; widen the TABLE first with " +
                "widenColumn (metadata-only), then append the wide batch")
          }
        }
        StructType(cur.fields ++
          batch.fields.filterNot(f => curTypes.contains(f.name))
            .map(_.copy(nullable = true)))
    }

  /** Under name-mode column mapping, brand-new columns an evolution adds
    * get FRESH physical names off the maxColumnId counter — a re-added
    * column NEVER reuses a dropped column's physical name, so old files'
    * stale values cannot leak into it (the column-mapping protocol's
    * no-reuse rule). Identity tables pass through untouched. */
  private def stampEvolved(root: String,
                           schema: StructType): (StructType, Option[Map[String, String]]) = {
    val cfg = readTableConfig(root)
    if (!cfg.get("delta.columnMapping.mode").contains("name")) (schema, None)
    else if (schema.fields.forall(_.metadata.contains(PhysNameKey))) (schema, None)
    else {
      var id = cfg.get("delta.columnMapping.maxColumnId")
        .map(_.toLong).getOrElse(schema.fields.length.toLong)
      val out = StructType(schema.fields.map { f =>
        if (f.metadata.contains(PhysNameKey)) f
        else {
          id += 1
          f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(PhysNameKey, s"col-$id").putLong(ColIdKey, id).build())
        }
      })
      (out, Some(cfg + ("delta.columnMapping.maxColumnId" -> id.toString)))
    }
  }

  private def appendImpl(df: DataFrame, root: String, evolve: Boolean): Long = {
    requireUnpartitioned(root, "plain append")
    // the mapping for NEW columns must be fixed BEFORE the files write —
    // they land under their fresh physical names
    val (unifiedPre, _) = stampEvolved(root,
      unifiedSchema(root, df.schema, evolve, "append"))
    val batchCols = df.columns.toSet
    val adds = writeDataFiles(df, root, latestVersion(root) + 1,
      mappingOverride = Some(colMapping(unifiedPre)))
    casRetry("append") {
      // the unified schema is recomputed INSIDE the retry body: a lost CAS
      // means another writer (possibly an evolving append) advanced the
      // table, and committing a schema unified against the pre-race
      // metadata would re-emit the stale shape as latest and regress the
      // evolution for every later read
      val (unified, cfgUp) = stampEvolved(root,
        unifiedSchema(root, df.schema, evolve, "append"))
      require(
        colMapping(unified).view.filterKeys(batchCols).toMap ==
          colMapping(unifiedPre).view.filterKeys(batchCols).toMap,
        "a concurrent schema change remapped this batch's columns between " +
          "write and commit; retry the append")
      val v = latestVersion(root) + 1
      commit(root, v, "append", adds, Seq.empty,
        schemaJson = Some(unified.json), extraConfig = cfgUp)
      v
    }
  }

  /** Append into a HIVE-PARTITIONED layout (`data/vN/col=value/part…`):
    * every add action records its partitionValues (custom log and Delta
    * mirror alike), and reads prune on them BEFORE stats — the coarse
    * 100 TB knife (a day-partitioned table's time-range query touches the
    * matching directories' files only, by metadata fold alone). The first
    * commit fixes the partition columns (recorded in the mirror's metaData
    * action); later appends must match them. Partition column stats live
    * in partitionValues, data-column stats in the footers — exactly the
    * protocol's split. */
  def appendPartitioned(df: DataFrame, root: String,
                        partCols: Seq[String]): Long = {
    require(partCols.nonEmpty, "appendPartitioned needs partition columns")
    require(partCols.forall(df.columns.contains),
      s"partition columns ${partCols.mkString(",")} must exist in the schema")
    val adds = writePartitionedFiles(df, root, latestVersion(root) + 1, partCols)
    casRetry("appendPartitioned") {
      val v = latestVersion(root) + 1
      if (v > 0) readMeta(root).foreach { case (_, pcs) =>
        require(pcs == partCols,
          s"table is partitioned by ${pcs.mkString(",")}, got ${partCols.mkString(",")}")
      }
      // the batch frame has no column-mapping metadata — inherit the
      // table's per-field metadata (stable physical names) or a renamed
      // table's next partitioned append would wipe the mapping
      val schemaOut = readMeta(root).map(_._1) match {
        case Some(cur) =>
          StructType(df.schema.fields.map(f =>
            cur.fields.find(_.name == f.name)
              .map(o => f.copy(metadata = o.metadata)).getOrElse(f)))
        case None => df.schema
      }
      commit(root, v, "append", adds, Seq.empty,
        schemaJson = Some(schemaOut.json), partCols = partCols)
      v
    }
  }

  private[sources] def writePartitionedFiles(df0: DataFrame, root: String, version: Long,
                                    partCols: Seq[String],
                                    check: Boolean = true): Seq[AddFile] = {
    if (check) validateConstraints(df0, root)
    // data columns rename logical → physical under column mapping, exactly
    // like the flat writer; partition columns never rename (renameColumn
    // refuses them — their name is the directory encoding), so partitionBy
    // keys are untouched
    val mapping = readMeta(root).map(m => colMapping(m._1)).getOrElse(Map.empty)
    val df = if (mapping.isEmpty) df0
      else df0.select(df0.columns.toSeq.map(c =>
        col(c).as(mapping.getOrElse(c, c))): _*)
    val sub = dataSub(version)
    val dst = Paths.get(root, sub)
    df.write.partitionBy(partCols: _*).mode(SaveMode.ErrorIfExists)
      .parquet(dst.toString)
    // partition columns are path-encoded, not stored in the files
    val dataSchema = StructType(
      df.schema.fields.filterNot(f => partCols.contains(f.name)))
    val rels = walkClosed(dst).iterator().asScala
      .filter { p => val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith(".") }
      .map(p => dst.relativize(p).toString)
      .toSeq.sorted
    val stats = new java.util.concurrent.ConcurrentHashMap[String, String]()
    rels.asJava.parallelStream()
      .forEach(r => stats.put(r, footerStats(dst.resolve(r), dataSchema)))
    rels.map { r =>
      val pvs = r.split('/').init.map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"unexpected non-partition dir in $r")
        unescapePartValue(kv.substring(0, i)) -> unescapePartValue(kv.substring(i + 1))
      }.toMap
      AddFile(s"$sub/$r", Files.size(dst.resolve(r)), Some(stats.get(r)), pvs)
    }
  }

  /** Undo Hive-style %XX path escaping of partition names/values. */
  private def unescapePartValue(s: String): String = {
    if (!s.contains('%')) s
    else {
      val sb = new StringBuilder; var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '%' && i + 3 <= s.length) {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
  }

  /** Idempotent append: commits `df` tagged with `token` unless a commit
    * bearing the same token already exists, in which case that version is
    * returned and NOTHING is written — the txnAppId/txnVersion exactly-once
    * pattern with the commit log as the dedup ledger. This is what lets a
    * restarted streaming query redeliver a micro-batch harmlessly (see
    * [[graft.streaming.TxnSink]]). */
  def appendOnce(df: DataFrame, root: String, token: String,
                 partCols: Seq[String] = Nil): Long = {
    // tokens embed in one NDJSON log line: quotes/backslashes round-trip
    // through esc()+MiniJson, but raw control characters would split the
    // line — refuse them at the door
    require(token.forall(c => c >= ' '),
      s"appendOnce token must not contain control characters: ${token.trim}")
    // the table's layout wins; partCols only seeds a FIRST commit (the
    // streaming-sink path: batch 0 creates the partitioned table)
    val pcs = readMeta(root).map(_._2).getOrElse(partCols)
    require(partCols.isEmpty || pcs == partCols,
      s"table is partitioned by ${pcs.mkString(",")}, got ${partCols.mkString(",")}")
    val op = s"append#$token"
    // the dedup ledger rides checkpoints too (token lines), so redelivery
    // detection folds checkpoint + tail, never the whole history
    def existing: Option[Long] =
      foldState(root, latestVersion(root)).tokens.get(op)
    existing.getOrElse {
      val adds =
        if (pcs.isEmpty) writeDataFiles(df, root, latestVersion(root) + 1)
        else writePartitionedFiles(df, root, latestVersion(root) + 1, pcs)
      casRetry("appendOnce") {
        // exactly-once hinges on the ledger check and the version claim
        // sharing ONE snapshot: pin v FIRST, check the token at v−1, then
        // CAS exactly v. Checking the ledger "at latest" instead is a
        // TOCTOU — a racer committing the same token between the check and
        // the claim lands the token TWICE at consecutive versions (caught
        // live by the concurrent-appendOnce spec). If the racer claims v
        // first, our CAS fails and the retry sees their token.
        val v = latestVersion(root) + 1
        foldState(root, v - 1).tokens.get(op).getOrElse {
          // same rebase rule as appendImpl: a mismatched batch must not
          // silently become the table's latest metaData
          val unified = unifiedSchema(root, df.schema, evolve = false, "appendOnce")
          commit(root, v, op, adds, Seq.empty,
            schemaJson = Some(unified.json), txn = Some((token, v)),
            partCols = pcs)
          v
        }
      }
    }
  }

  /** Replace the table contents with `df` (the batch overwrite sink shape,
    * ref SaveDelta batch path): adds the new files, removes every
    * previously-live one — in ONE commit, so readers flip atomically and
    * the pre-overwrite version remains time-travelable. */
  def overwrite(df: DataFrame, root: String): Long = casRetry("overwrite") {
    val pcs = readMeta(root).map(_._2).getOrElse(Seq.empty)
    val v = latestVersion(root) + 1
    require(pcs.forall(df.columns.contains),
      s"overwrite batch must carry the partition columns ${pcs.mkString(",")}")
    val adds =
      if (pcs.isEmpty) writeDataFiles(df, root, v)
      else writePartitionedFiles(df, root, v, pcs)
    // keep column-mapping metadata (stable physical names / ids) across an
    // overwrite: matching columns inherit the table's field metadata, so
    // the just-written physically-named files stay readable
    val schemaOut = readMeta(root).map(_._1) match {
      case Some(cur) if sameShape(cur, df.schema) => cur
      case Some(cur) =>
        StructType(df.schema.fields.map(f =>
          cur.fields.find(_.name == f.name)
            .map(o => f.copy(metadata = o.metadata)).getOrElse(f)))
      case None => df.schema
    }
    val dropped = liveAdds(root, v - 1)
    commit(root, v, "overwrite", adds,
      dropped.map(_.file), schemaJson = Some(schemaOut.json),
      partCols = pcs, removeDvs = dvTombstones(dropped))
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
            keys: Seq[String], cdf: Boolean = false): Long = casRetry("merge") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    // a delta narrower than an evolved table would silently drop the new
    // columns from the carried rows — refuse shape drift here
    readMeta(root).foreach { case (cur, _) =>
      require(sameShape(cur, delta.schema),
        s"merge delta schema ${delta.schema.simpleString} must match the " +
          s"table schema ${cur.simpleString}") }
    val pcs = readMeta(root).map(_._2).getOrElse(Seq.empty)
    val live = liveAdds(root, v - 1)
    // partition pruning of the candidate set: when every partition column
    // is a merge key, a file whose partitionValues tuple never appears in
    // the delta cannot contain a matched key — whole untouched partitions
    // drop out of the scan by metadata alone (the 100 TB shape: a
    // day-keyed upsert touches its days' directories, not the table)
    val candidates =
      if (pcs.nonEmpty && pcs.forall(keys.contains)) {
        val dTuples = delta
          .select(pcs.map(c => col(c).cast("string")): _*).distinct()
          .collect().map(r => pcs.indices.map(i =>
            if (r.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__" else r.getString(i)).toList)
          .toSet
        live.filter(a => dTuples.contains(pcs.map(c =>
          a.partitionValues.getOrElse(c, "")).toList))
      } else live
    val cols = delta.columns.toSeq
    val cur = readFilesTagged(spark, root, candidates, v - 1)
      .select(col("_file"), struct(cols.map(col): _*).as("_r"))
    val dKeys = delta.select(keys.map(col): _*).distinct()
    val onKeys = keys.map(k => col(s"_r.$k") === dKeys(k)).reduce(_ && _)
    // touched = live files containing at least one delta key — O(files) rows
    val touchedRel =
      if (candidates.isEmpty) Seq.empty[String]
      else cur.join(dKeys, onKeys, "left_semi")
        .select(col("_file")).distinct().collect().map(_.getString(0)).toSeq.sorted
    val carried =
      if (touchedRel.isEmpty) delta
      else {
        cur.filter(col("_file").isin(touchedRel: _*))
          .join(dKeys, onKeys, "left_anti")
          .select(cols.map(c => col(s"_r.$c").as(c)): _*)
          .unionByName(delta)
      }
    // cdf = true persists this commit's row-level changes as change-data
    // files (the streaming-CDF write side — [[changeFeedIncremental]]
    // reads them): matched keys whose row actually changed emit
    // update pre/post images, unmatched delta rows emit inserts.
    // Opt-in: a merge without CDF consumers pays nothing extra.
    val cdcAdds =
      if (!cdf) Seq.empty[AddFile]
      else {
        val changes =
          if (touchedRel.isEmpty) delta.withColumn("_change_type", lit("insert"))
          else {
            val old = cur.filter(col("_file").isin(touchedRel: _*))
              .select(col("_r").as("_o"))
            val nsj = delta.select(struct(cols.map(col): _*).as("_n"))
            val on = keys.map(k => col(s"_o.$k") === col(s"_n.$k")).reduce(_ && _)
            val joined = old.join(nsj, on, "full_outer")
              // carried rows (_n null) and no-op updates stay silent
              .filter(col("_o").isNull ||
                (col("_n").isNotNull && !(col("_o") <=> col("_n"))))
            joined.select(explode(
              when(col("_o").isNull,
                array(struct(col("_n").as("r"), lit("insert").as("t"))))
              .otherwise(array(
                struct(col("_o").as("r"), lit("update_preimage").as("t")),
                struct(col("_n").as("r"), lit("update_postimage").as("t"))))).as("e"))
              .select(cols.map(c => col(s"e.r.$c")) :+
                col("e.t").as("_change_type"): _*)
          }
        writeCdcFiles(changes, root, v)
      }
    val adds =
      if (pcs.isEmpty) writeDataFiles(carried, root, v)
      else writePartitionedFiles(carried, root, v, pcs)
    // commit the TABLE's schema (same shape was required above): the
    // delta frame has no column-mapping metadata to preserve
    val schemaOut = readMeta(root).map(_._1).getOrElse(delta.schema)
    val touchedSet = touchedRel.toSet
    commit(root, v, "merge", adds, touchedRel,
      schemaJson = Some(schemaOut.json), partCols = pcs, cdc = cdcAdds,
      removeDvs = dvTombstones(candidates.filter(a => touchedSet(a.file))))
    v
  }

  /** MULTI-CLAUSE MERGE — the full SQL semantics over an arbitrary join
    * condition: conditional WHEN MATCHED UPDATE/DELETE, conditional WHEN
    * NOT MATCHED INSERT, WHEN NOT MATCHED BY SOURCE UPDATE/DELETE (see
    * [[MergeClause]]). `condition` and every clause expression reference
    * the two sides through `targetAlias`/`sourceAlias` (e.g.
    * `col("t.id") === col("s.id")`). `mor = false` rewrites touched files
    * copy-on-write; `mor = true` marks replaced rows in deletion-vector
    * bitmaps and spills only images + inserts to new files (files past
    * `rewriteFraction` cumulative deletion rewrite clean instead).
    * `cdf = true` persists per-clause change files. ONE commit either
    * way; SQL `MERGE INTO` on a graft-catalog table lowers here. Design
    * and scale notes: [[MergeMulti]]. */
  def mergeMulti(spark: SparkSession, root: String, source: DataFrame,
                 condition: Column,
                 matched: Seq[MergeClause] = Nil,
                 notMatched: Seq[MergeClause] = Nil,
                 notMatchedBySource: Seq[MergeClause] = Nil,
                 targetAlias: String = "t", sourceAlias: String = "s",
                 cdf: Boolean = false, mor: Boolean = false,
                 rewriteFraction: Double = 0.1,
                 driverDvBudgetBytes: Long = DvDriverBudgetBytes): Long =
    MergeMulti.run(spark, root, source, condition, targetAlias, sourceAlias,
      matched, notMatched, notMatchedBySource, cdf, mor, rewriteFraction,
      driverDvBudgetBytes)

  /** MERGE-ON-READ MERGE: the keyed upsert of [[merge]] with [[deleteDv]]'s
    * write-amplification fix composed in. Rows a delta key REPLACES are
    * DV-MARKED in place (their file re-adds unchanged with a new deletion
    * vector); every delta row — replacement images and fresh inserts alike
    * — lands in NEW files. A CDC-style merge touching 1% of the rows in
    * many files therefore commits a few bitmaps plus the delta's own bytes
    * where copy-on-write [[merge]] rewrites every touched file whole — at
    * 100 TB that difference IS the merge cost. Files whose CUMULATIVE
    * deleted fraction (existing DV + newly matched rows) reaches
    * `rewriteFraction` take the copy-on-write path right here instead (the
    * [[purgeDeletes]] threshold reused: past that mass a rewrite is
    * cheaper than carrying the bitmap, and handling it in the merge means
    * the commit never manufactures purge-bait). Same contract as [[merge]]
    * otherwise: `delta` carries distinct keys and the table schema, ONE
    * commit, whole-partition pruning when every partition column is a
    * merge key, `cdf = true` persists row-level change files, pre-merge
    * versions stay time-travelable. Bitmaps build distributed and stream
    * to the driver under `driverDvBudgetBytes` ([[collectDvBlobs]]). */
  def mergeDv(spark: SparkSession, delta: DataFrame, root: String,
              keys: Seq[String], cdf: Boolean = false,
              rewriteFraction: Double = 0.1,
              driverDvBudgetBytes: Long = DvDriverBudgetBytes): Long = casRetry("mergeDv") {
    mergeDvBody(spark, delta, root, keys, cdf, rewriteFraction,
      driverDvBudgetBytes, op = "merge-dv", token = None)
  }

  /** IDEMPOTENT merge-on-read merge: [[mergeDv]] tagged with `token` — a
    * commit bearing the same token already in the ledger returns that
    * version and writes NOTHING. The exactly-once upsert twin of
    * [[appendOnce]]: a restarted streaming query redelivering micro-batch
    * N merges it zero times more, which is what lets
    * [[graft.streaming.TxnUpsertSink]] land a CDC changelog as keyed
    * upserts with exactly-once CONTENT. The token ledger rides the same
    * checkpointed fold as appendOnce's (`merge-dv#` ops), so redelivery
    * detection stays O(checkpoint + tail) at any history length. */
  def mergeDvOnce(spark: SparkSession, delta: DataFrame, root: String,
                  keys: Seq[String], token: String, cdf: Boolean = false,
                  rewriteFraction: Double = 0.1,
                  driverDvBudgetBytes: Long = DvDriverBudgetBytes): Long = {
    require(token.forall(c => c >= ' '),
      s"mergeDvOnce token must not contain control characters: ${token.trim}")
    val op = s"merge-dv#$token"
    def existing: Option[Long] =
      foldState(root, latestVersion(root)).tokens.get(op)
    existing.getOrElse(casRetry("mergeDvOnce") {
      // the same token may have won a concurrent race — re-check inside
      // the CAS loop so redelivery never double-merges
      existing.getOrElse(mergeDvBody(spark, delta, root, keys, cdf,
        rewriteFraction, driverDvBudgetBytes, op, Some(token)))
    })
  }

  private def mergeDvBody(spark: SparkSession, delta: DataFrame, root: String,
                          keys: Seq[String], cdf: Boolean,
                          rewriteFraction: Double,
                          driverDvBudgetBytes: Long,
                          op: String, token: Option[String]): Long = {
    require(rewriteFraction > 0 && rewriteFraction <= 1,
      s"rewriteFraction must be in (0,1], got $rewriteFraction")
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    // exactly-once: the token-ledger check shares THIS claim's snapshot
    // (v − 1) — checking "at latest" outside would be the appendOnce
    // TOCTOU, where a racer's commit between check and claim lands the
    // same token twice. If a racer claims v first, our CAS fails and the
    // retry re-enters here seeing their token.
    if (token.isDefined) {
      val prior = foldState(root, v - 1).tokens.get(op)
      if (prior.isDefined) return prior.get
    }
    readMeta(root).foreach { case (cur, _) =>
      require(sameShape(cur, delta.schema),
        s"mergeDv delta schema ${delta.schema.simpleString} must match the " +
          s"table schema ${cur.simpleString}") }
    val pcs = readMeta(root).map(_._2).getOrElse(Seq.empty)
    val live = liveAdds(root, v - 1)
    val candidates =
      if (pcs.nonEmpty && pcs.forall(keys.contains)) {
        val dTuples = delta
          .select(pcs.map(c => col(c).cast("string")): _*).distinct()
          .collect().map(r => pcs.indices.map(i =>
            if (r.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__" else r.getString(i)).toList)
          .toSet
        live.filter(a => dTuples.contains(pcs.map(c =>
          a.partitionValues.getOrElse(c, "")).toList))
      } else live
    val cols = delta.columns.toSeq
    val dKeys = delta.select(keys.map(col): _*).distinct()
    if (candidates.isEmpty) {
      // nothing can match: the whole delta is an insert batch
      val cdcAdds =
        if (!cdf) Seq.empty[AddFile]
        else writeCdcFiles(delta.withColumn("_change_type", lit("insert")), root, v)
      val adds =
        if (pcs.isEmpty) writeDataFiles(delta, root, v)
        else writePartitionedFiles(delta, root, v, pcs)
      val schemaOut = readMeta(root).map(_._1).getOrElse(delta.schema)
      commit(root, v, op, adds, Seq.empty,
        schemaJson = Some(schemaOut.json), partCols = pcs, cdc = cdcAdds,
        txn = token.map(t => (t, v)))
      return v
    }
    val cur = readFilesTagged(spark, root, candidates, v - 1, rowIndex = true)
      .select(col("_file"), col("_ri"), struct(cols.map(col): _*).as("_r"))
    val onKeys = keys.map(k => col(s"_r.$k") === dKeys(k)).reduce(_ && _)
    // per-file bitmaps of the REPLACED positions — O(files) driver metadata
    // (the same shape as the commit itself), rows never leave the executors
    val matched = collectDvBlobs(
      cur.join(dKeys, onKeys, "left_semi")
        .select(col("_file").cast("string"), col("_ri").cast("long")),
      "mergeDv", driverDvBudgetBytes).sortBy(_._1)
    val byFile = candidates.map(a => (a.file, a)).toMap
    // lightly-hit files keep their bytes and gain a bitmap; files past the
    // threshold (counting what earlier DVs already shaved) rewrite clean
    val (dvSide, cowSide) = matched.partition { case (f, _, card) =>
      val a = byFile(f)
      val old = a.dv.map(_.cardinality).getOrElse(0L)
      a.stats.map(decodeStats(_).numRecords) match {
        case Some(n) if n > 0 => (old + card).toDouble / n < rewriteFraction
        case _                => false // stats-less: rewrite to be safe
      }
    }
    val cowFiles = cowSide.map(_._1)
    val carried =
      if (cowFiles.isEmpty) delta
      else cur.filter(col("_file").isin(cowFiles: _*))
        .join(dKeys, onKeys, "left_anti")
        .select(cols.map(c => col(s"_r.$c").as(c)): _*)
        .unionByName(delta)
    val touchedAll = matched.map(_._1)
    val cdcAdds =
      if (!cdf) Seq.empty[AddFile]
      else {
        val changes =
          if (touchedAll.isEmpty) delta.withColumn("_change_type", lit("insert"))
          else {
            val old = cur.filter(col("_file").isin(touchedAll: _*))
              .select(col("_r").as("_o"))
            val nsj = delta.select(struct(cols.map(col): _*).as("_n"))
            val on = keys.map(k => col(s"_o.$k") === col(s"_n.$k")).reduce(_ && _)
            val joined = old.join(nsj, on, "full_outer")
              .filter(col("_o").isNull ||
                (col("_n").isNotNull && !(col("_o") <=> col("_n"))))
            joined.select(explode(
              when(col("_o").isNull,
                array(struct(col("_n").as("r"), lit("insert").as("t"))))
              .otherwise(array(
                struct(col("_o").as("r"), lit("update_preimage").as("t")),
                struct(col("_n").as("r"), lit("update_postimage").as("t"))))).as("e"))
              .select(cols.map(c => col(s"e.r.$c")) :+
                col("e.t").as("_change_type"): _*)
          }
        writeCdcFiles(changes, root, v)
      }
    val dvMerged = dvSide.map { case (f, blob, _) =>
      val bm = DeletionVectors.RoaringBitmapArray.deserialize(blob)
      val a = byFile(f)
      a.dv.foreach(d => bm.or(DeletionVectors.readBitmap(root, d)))
      (a, bm)
    }
    val dvReadds =
      if (dvMerged.isEmpty) Seq.empty[AddFile]
      else DeletionVectors.writeDescriptors(root, dvMerged.map(_._2))
        .zip(dvMerged).map { case (d, (a, _)) => a.copy(dv = Some(d)) }
    val dataAdds =
      if (pcs.isEmpty) writeDataFiles(carried, root, v)
      else writePartitionedFiles(carried, root, v, pcs)
    val schemaOut = readMeta(root).map(_._1).getOrElse(delta.schema)
    // the first DV use flips the table feature on, exactly like deleteDv
    val cfg = readTableConfig(root)
    val withCfg =
      if (dvReadds.isEmpty || cfg.get("delta.enableDeletionVectors").contains("true")) None
      else Some(cfg + ("delta.enableDeletionVectors" -> "true"))
    val touchedSet = touchedAll.toSet
    commit(root, v, op, dataAdds ++ dvReadds, touchedAll.sorted,
      schemaJson = Some(schemaOut.json), partCols = pcs, cdc = cdcAdds,
      extraConfig = withCfg, txn = token.map(t => (t, v)),
      removeDvs = dvTombstones(candidates.filter(a => touchedSet(a.file))))
    v
  }

  /** One parsed log action. */
  private final case class Action(version: Long, op: String, action: String,
                                  add: AddFile)

  /** Parse one committed version's log file. Each line is a flat JSON
    * object written by [[commit]]; parsed with [[MiniJson]] so escaped
    * quotes/backslashes in caller-supplied op tokens round-trip exactly
    * (a positional split would truncate at the first embedded quote and
    * silently corrupt the idempotent-append dedup ledger). */
  private def parseLog(root: String, v: Long): Seq[Action] =
    Files.readAllLines(logDir(root).resolve(f"$v%020d.json")).asScala.toSeq.map { line =>
      val m = MiniJson.parse(line).asInstanceOf[Map[String, Any]]
      Action(m("version").asInstanceOf[BigDecimal].toLongExact,
        m("op").asInstanceOf[String], m("action").asInstanceOf[String],
        parseAddFields(m))
    }

  /** Log actions up to and including `asOf` (whole log when < 0). */
  private def actions(root: String, asOf: Long): Seq[Action] =
    versions(root).filter(v => asOf < 0 || v <= asOf).flatMap(parseLog(root, _))

  /** One committed version's (op, added files, change-data files,
    * rewrites-data?) — the streaming tail's planning unit. A version with
    * removes under a data-changing op REWRITES rows; an append-only
    * consumer must balk, a change-feed consumer reads the cdc files. */
  private[sources] def commitActions(root: String, v: Long): (String, Seq[AddFile], Seq[AddFile], Boolean) = {
    val acts = parseLog(root, v)
    val op = acts.headOption.map(_.op).getOrElse("?")
    (op,
      acts.collect { case Action(_, _, "add", a) => a },
      acts.collect { case Action(_, _, "cdc", a) => a },
      acts.exists(_.action == "remove"))
  }

  /** Table schema + partition columns for external consumers (the tail
    * source); see [[readMeta]]. */
  private[sources] def tableMeta(root: String): Option[(StructType, Seq[String])] =
    readMeta(root)

  private def liveFiles(root: String, asOf: Long): Seq[(String, Long)] =
    liveAdds(root, asOf).map(a => (a.file, a.bytes))

  /** Test observability: the live adds with their stats/bloom/DV payloads. */
  private[graft] def liveAddsForTest(root: String, asOf: Long = -1L): Seq[AddFile] =
    liveAdds(root, asOf)

  private[sources] def liveAdds(root: String, asOf: Long): Seq[AddFile] = {
    // SEQUENTIAL reconciliation in version order (the protocol rule): a
    // remove cancels the add before it, and a LATER re-add resurrects the
    // file — which is exactly what a metadata-only [[restore]] commits.
    // (An all-time remove set would wrongly kill resurrected files.)
    // Seeded from the newest checkpoint ≤ asOf, so the fold is
    // O(checkpoint + tail), not O(versions) — see [[foldState]].
    val upTo = if (asOf < 0) latestVersion(root) else asOf
    foldState(root, upTo).live
  }

  /** Table metadata from the `_delta_log` mirror's metaData actions — the
    * mirror doubles as the metadata store, exactly as in the open
    * protocol. LATEST-WINS fold over versions ≤ `asOf` (schema evolution
    * re-emits metaData at the evolving commit; older versions keep their
    * own schema under time travel). None for pre-mirror tables. */
  private[sources] def readMeta(root: String, asOf: Long = -1L): Option[(StructType, Seq[String])] = {
    val d = deltaDir(root)
    if (!Files.isDirectory(d)) return None
    // short-circuit via the _txn_log checkpoint's meta line: only the
    // commits AFTER the newest checkpoint ≤ asOf can carry newer metaData,
    // so a no-evolution 100k-commit table reads the tail + one line, not
    // every commit since version 0
    val ck = ckptVersions(root).filter(v => asOf < 0 || v <= asOf).lastOption
    val vs = listClosed(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .filter(v => (asOf < 0 || v <= asOf) && v > ck.getOrElse(-1L)).toSeq.sorted
    val fromTail = vs.reverseIterator.flatMap { v =>
      Files.readAllLines(d.resolve(f"$v%020d.json")).asScala
        .find(_.startsWith("""{"metaData":""")).map { line =>
          val m = MiniJson.parse(line).asInstanceOf[Map[String, Any]]("metaData")
            .asInstanceOf[Map[String, Any]]
          val schema = DataType.fromJson(m("schemaString").asInstanceOf[String])
            .asInstanceOf[StructType]
          val pcs = m.getOrElse("partitionColumns", Seq.empty)
            .asInstanceOf[Seq[Any]].map(_.asInstanceOf[String])
          (schema, pcs)
        }
    }.nextOption()
    fromTail.orElse(ck.flatMap { v =>
      Files.readAllLines(ckptPath(root, v)).asScala
        .find(_.contains(""""action":"meta"""")).map { line =>
          val m = MiniJson.parse(line).asInstanceOf[Map[String, Any]]
          def dec(k: String) = new String(
            java.util.Base64.getDecoder.decode(m(k).asInstanceOf[String]), UTF_8)
          val schema = DataType.fromJson(dec("schema64")).asInstanceOf[StructType]
          val pcs = MiniJson.parse(dec("parts64")).asInstanceOf[Seq[Any]]
            .map(_.asInstanceOf[String])
          (schema, pcs)
        }
    })
  }

  /** Latest metaData configuration (latest-wins fold, like [[readMeta]]).
    * Short-circuits through the `_txn_log` checkpoint's config64. */
  private[sources] def readTableConfig(root: String): Map[String, String] = {
    val d = deltaDir(root)
    if (!Files.isDirectory(d)) return Map.empty
    val ck = ckptVersions(root).lastOption
    val vs = listClosed(d).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .filter(_ > ck.getOrElse(-1L)).toSeq.sorted
    val fromTail = vs.reverseIterator.flatMap { v =>
      Files.readAllLines(d.resolve(f"$v%020d.json")).asScala
        .find(_.startsWith("""{"metaData":""")).map { line =>
          MiniJson.parse(line).asInstanceOf[Map[String, Any]]("metaData")
            .asInstanceOf[Map[String, Any]]
            .getOrElse("configuration", Map.empty).asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> v.asInstanceOf[String] }
        }
    }.nextOption()
    fromTail.orElse(ck.flatMap { v =>
      Files.readAllLines(ckptPath(root, v)).asScala
        .find(_.contains(""""action":"meta"""")).map { line =>
          val m = MiniJson.parse(line).asInstanceOf[Map[String, Any]]
          m.get("config64").map(s => MiniJson.parse(new String(
            java.util.Base64.getDecoder.decode(s.asInstanceOf[String]), UTF_8))
            .asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> v.asInstanceOf[String] })
            .getOrElse(Map.empty[String, String])
        }
    }).getOrElse(Map.empty)
  }

  private val ConstraintPrefix = "delta.constraints."

  /** The table's CHECK constraints (name → SQL expression). */
  def constraints(root: String): Map[String, String] =
    readTableConfig(root).collect {
      case (k, v) if k.startsWith(ConstraintPrefix) =>
        k.stripPrefix(ConstraintPrefix) -> v
    }

  /** ADD a CHECK constraint: validates the CURRENT snapshot satisfies
    * `exprSql` (Delta's rule — a constraint the data already violates is
    * refused), then commits it as metaData configuration
    * (`delta.constraints.<name>`, writer feature level 3 per the
    * protocol). Every subsequent data write validates its batch; a
    * violating batch is refused BEFORE anything commits. NULL passes, as
    * in SQL CHECK. */
  def setConstraint(spark: SparkSession, root: String,
                    name: String, exprSql: String): Long = casRetry("setConstraint") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val bad = read(spark, root)
      .filter(coalesce(expr(exprSql).cast("boolean"), lit(true)) === lit(false))
      .limit(1).count()
    require(bad == 0,
      s"existing rows violate CHECK constraint $name ($exprSql); not adding")
    val (schema, pcs) = readMeta(root).getOrElse(
      sys.error(s"$root has no metaData to attach a constraint to"))
    val cfg = readTableConfig(root) + (ConstraintPrefix + name -> exprSql)
    commit(root, v, s"set-constraint#$name", Seq.empty, Seq.empty,
      schemaJson = Some(schema.json), dataChange = false, partCols = pcs,
      extraConfig = Some(cfg))
    v
  }

  /** DROP a CHECK constraint (metadata-only commit). */
  def dropConstraint(root: String, name: String): Long = casRetry("dropConstraint") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    require(constraints(root).contains(name), s"no CHECK constraint $name")
    val (schema, pcs) = readMeta(root).getOrElse(sys.error("no metaData"))
    commit(root, v, s"drop-constraint#$name", Seq.empty, Seq.empty,
      schemaJson = Some(schema.json), dataChange = false, partCols = pcs,
      extraConfig = Some(readTableConfig(root) - (ConstraintPrefix + name)))
    v
  }

  /** Refuse a batch that violates any CHECK constraint — ONE combined
    * pass naming every violated constraint, run BEFORE the data files are
    * written so a bad batch never commits (and never orphans files). */
  private[sources] def validateConstraints(df: DataFrame, root: String): Unit = {
    val cs = constraints(root)
    // generated columns validate like constraints: one combined pass,
    // null-safe equality (g <=> expr), refused before anything commits
    val gens = readMeta(root).map(m => generationMap(m._1)).getOrElse(Map.empty)
      .filter { case (g, _) => df.columns.contains(g) }
    if (cs.isEmpty && gens.isEmpty) return
    val flags = cs.toSeq.sortBy(_._1).map { case (n, ex) =>
      when(coalesce(expr(ex).cast("boolean"), lit(true)) === lit(false), lit(n))
    } ++ gens.toSeq.sortBy(_._1).map { case (g, ex) =>
      when(!(col(g) <=> expr(ex)), lit(s"generated($g)"))
    }
    val bad = df
      .select(filter(array(flags: _*), c => c.isNotNull).as("violated"))
      .filter(size(col("violated")) > 0)
      .limit(1).collect()
    require(bad.isEmpty,
      s"batch violates CHECK constraint(s) / generation rule(s) " +
        s"${bad.head.getSeq[String](0).mkString(", ")} — nothing was committed")
  }

  /** Same column names and types, order- and nullability-insensitive. */
  private def sameShape(a: StructType, b: StructType): Boolean =
    a.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq ==
      b.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq

  // ---- column mapping (metadata-only rename) --------------------------------
  // The open protocol's name-mode column mapping
  // (delta.columnMapping.mode=name): parquet files keep a STABLE physical
  // column name recorded in per-field schema metadata; a logical rename
  // only rewrites the schemaString — zero data bytes at any table size.
  // physicalName defaults to the field name when no mapping metadata is
  // present, so pre-mapping tables and files cost nothing.

  private val PhysNameKey = "delta.columnMapping.physicalName"
  private val ColIdKey = "delta.columnMapping.id"

  private[sources] def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey)
    else f.name

  /** logical → physical map, EMPTY when the identity holds (fast path). */
  private[sources] def colMapping(schema: StructType): Map[String, String] =
    schema.fields.iterator.map(f => f.name -> physicalName(f))
      .filter { case (l, p) => l != p }.toMap

  /** Rewrite predicate attribute names logical → physical so file-stats /
    * bloom pruning keys match what the footers were written with. */
  private def mapPredNames(e: Expression,
                           nameMap: Map[String, String]): Expression =
    if (nameMap.isEmpty) e
    else e.transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        if nameMap.contains(a.name) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq(nameMap(a.name)))
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
        if nameMap.contains(a.name) => a.withName(nameMap(a.name))
    }

  /** RENAME a column — metadata-only (no data rewrite). The first rename
    * upgrades the table to name-mode column mapping: every field is
    * stamped with its CURRENT name as `physicalName` plus a stable column
    * id (existing files already carry those physical names, so they keep
    * reading), the config records the mode, and the mirror protocol
    * upgrades to reader 2 / writer 5 (the mapping level, delta.io
    * PROTOCOL.md). Refused for partition columns (their name is
    * path-encoded in the hive layout), for columns referenced by CHECK
    * constraints (the stored SQL would silently stop matching rows), and
    * for collisions. Time travel below the rename reads with that
    * version's own names. */
  def renameColumn(spark: SparkSession, root: String,
                   oldName: String, newName: String): Long = casRetry("renameColumn") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val (schema, pcs) = readMeta(root).getOrElse(
      sys.error(s"$root has no metaData to rename in"))
    require(schema.fieldNames.contains(oldName), s"no column $oldName")
    require(!schema.fieldNames.contains(newName),
      s"column $newName already exists")
    // a hive layout path-encodes partition column NAMES — renaming one
    // would orphan every existing directory; data columns rename fine
    // (both writers and both readers speak physical names)
    require(!pcs.contains(oldName),
      s"renaming partition column $oldName is not supported (path-encoded)")
    val offending = constraints(root).filter { case (_, sql) =>
      sql.matches(s"(?s).*\\b${java.util.regex.Pattern.quote(oldName)}\\b.*") }
    require(offending.isEmpty,
      s"column $oldName is referenced by CHECK constraint(s) " +
        s"${offending.keys.mkString(", ")}; drop them first")
    // a generation expression stores its SOURCE column by name — renaming
    // the source would silently break the rule (and its derived pruning)
    val genOffending = generationMap(schema).filter { case (_, sql) =>
      sql.matches(s"(?s).*\\b${java.util.regex.Pattern.quote(oldName)}\\b.*") }
    require(genOffending.isEmpty,
      s"column $oldName is referenced by generation expression(s) of " +
        s"${genOffending.keys.mkString(", ")}")
    val stamped = StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      val b = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
      if (!f.metadata.contains(PhysNameKey)) b.putString(PhysNameKey, f.name)
      if (!f.metadata.contains(ColIdKey)) b.putLong(ColIdKey, i + 1L)
      f.copy(metadata = b.build())
    })
    val renamed = StructType(stamped.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    // config that NAMES columns renames with them: a stale
    // delta.clusteringColumns entry would make the next optimizeCluster
    // pass fail on a column that no longer exists
    val cfg0 = readTableConfig(root)
    val cfg1 = cfg0.get(ClusteringKey) match {
      case Some(cols) => cfg0 + (ClusteringKey ->
        cols.split(',').map(c => if (c == oldName) newName else c).mkString(","))
      case None => cfg0
    }
    val cfg = cfg1 +
      ("delta.columnMapping.mode" -> "name") +
      ("delta.columnMapping.maxColumnId" -> renamed.fields.length.toString)
    commit(root, v, s"rename-column#$oldName", Seq.empty, Seq.empty,
      schemaJson = Some(renamed.json), dataChange = false, partCols = pcs,
      extraConfig = Some(cfg))
    v
  }

  /** DROP a column — metadata-only (zero data bytes rewritten), the
    * column-mapping twin of [[renameColumn]]: the first drop upgrades the
    * table to name-mode mapping (every remaining field keeps its CURRENT
    * name as its stable physical name), then the schema simply loses the
    * field. Existing files keep the dropped column's bytes — invisible to
    * every read (scans project the logical schema only) and reclaimed by
    * the next rewrite; time travel below the drop RESTORES the column
    * (each version reads under its own schema). A later re-add of the
    * same logical name gets a FRESH physical name ([[stampEvolved]]), so
    * the old bytes can never leak into it. Refused for partition columns
    * (path-encoded), clustering columns, columns referenced by CHECK
    * constraints or generation expressions, and the last column. */
  def dropColumn(spark: SparkSession, root: String,
                 colName: String): Long = casRetry("dropColumn") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val (schema, pcs) = readMeta(root).getOrElse(
      sys.error(s"$root has no metaData to drop from"))
    require(schema.fieldNames.contains(colName), s"no column $colName")
    require(schema.fields.length > 1, s"cannot drop the last column $colName")
    require(!pcs.contains(colName),
      s"dropping partition column $colName is not supported (path-encoded)")
    val cfg0 = readTableConfig(root)
    require(!cfg0.get(ClusteringKey).exists(_.split(',').contains(colName)),
      s"column $colName is a clustering column; clear clustering first")
    val offending = constraints(root).filter { case (_, sql) =>
      sql.matches(s"(?s).*\\b${java.util.regex.Pattern.quote(colName)}\\b.*") }
    require(offending.isEmpty,
      s"column $colName is referenced by CHECK constraint(s) " +
        s"${offending.keys.mkString(", ")}; drop them first")
    val genOffending = generationMap(schema).filter { case (n, sql) =>
      n == colName ||
        sql.matches(s"(?s).*\\b${java.util.regex.Pattern.quote(colName)}\\b.*") }
    require(genOffending.isEmpty,
      s"column $colName is part of generation expression(s) of " +
        s"${genOffending.keys.mkString(", ")}")
    val stamped = StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      val b = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
      if (!f.metadata.contains(PhysNameKey)) b.putString(PhysNameKey, f.name)
      if (!f.metadata.contains(ColIdKey)) b.putLong(ColIdKey, i + 1L)
      f.copy(metadata = b.build())
    })
    val dropped = StructType(stamped.fields.filterNot(_.name == colName))
    val maxId = stamped.fields.map(_.metadata.getLong(ColIdKey)).max
      .max(cfg0.get("delta.columnMapping.maxColumnId").map(_.toLong).getOrElse(0L))
    val cfg = cfg0 +
      ("delta.columnMapping.mode" -> "name") +
      ("delta.columnMapping.maxColumnId" -> maxId.toString)
    commit(root, v, s"drop-column#$colName", Seq.empty, Seq.empty,
      schemaJson = Some(dropped.json), dataChange = false, partCols = pcs,
      extraConfig = Some(cfg))
    v
  }

  // ---- type widening (metadata-only type evolution) --------------------------
  // The open protocol's typeWidening table feature: a column that outgrows
  // its type changes by SCHEMA METADATA ALONE — existing files keep their
  // narrow physical type and the parquet readers up-convert at scan time
  // (Spark's readers promote int→long / float→double / decimal scale-ups
  // natively), new files write the wide type. Without this, the first
  // INT column to cross 2^31 on a long-lived table forces a full rewrite —
  // at 100 TB the same class of cost deletion vectors eliminate for DELETE.

  /** The widenings the parquet scan applies losslessly at read time. */
  private[graft] def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType)            => true
    case (IntegerType, LongType)                        => true
    case (FloatType, DoubleType)                        => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale &&
        (t.precision > f.precision || t.scale > f.scale)
    case _ => false
  }

  /** Per-field metadata key recording this column's type-change history
    * (the mirror analogue of Delta's `delta.typeChanges`). */
  private val TypeChangesKey = "delta.typeChanges"

  /** WIDEN a column's type — metadata-only (zero data bytes rewritten).
    * Allowed changes are the lossless promotions the parquet readers apply
    * at scan time ([[widens]]): byte→short→int→long, float→double, and
    * decimal precision/scale growth that keeps every old value exact.
    * The field records its change history under `delta.typeChanges`, the
    * config records `delta.enableTypeWidening`, and the mirror protocol
    * lists the typeWidening table feature. Appends after the widen must
    * carry the WIDE type; time travel below it keeps the narrow type
    * (each version reads under its own schema). Refused for partition
    * columns (their values are path-encoded under the narrow parse) and
    * for any non-widening change — the add-only evolution rule stands for
    * everything else. */
  def widenColumn(spark: SparkSession, root: String,
                  colName: String, to: DataType): Long = casRetry("widenColumn") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val (schema, pcs) = readMeta(root).getOrElse(
      sys.error(s"$root has no metaData to widen in"))
    val f = schema.fields.find(_.name == colName).getOrElse(
      sys.error(s"no column $colName"))
    require(!pcs.contains(colName),
      s"widening partition column $colName is not supported (path-encoded)")
    require(widens(f.dataType, to),
      s"column $colName: ${f.dataType.simpleString} -> ${to.simpleString} " +
        "is not a supported lossless widening")
    val history = (if (f.metadata.contains(TypeChangesKey))
      f.metadata.getString(TypeChangesKey).stripSuffix("]") + ","
    else "[") +
      s"""{"fromType":"${f.dataType.typeName}","toType":"${to.typeName}"}]"""
    val widened = StructType(schema.fields.map { g =>
      if (g.name != colName) g
      else g.copy(dataType = to, metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(g.metadata).putString(TypeChangesKey, history).build())
    })
    val cfg = readTableConfig(root) + ("delta.enableTypeWidening" -> "true")
    commit(root, v, s"widen-column#$colName", Seq.empty, Seq.empty,
      schemaJson = Some(widened.json), dataChange = false, partCols = pcs,
      extraConfig = Some(cfg))
    v
  }

  /** Declare `colName` as GENERATED: `colName <=> (exprSql)` must hold on
    * every row — validated on the CURRENT snapshot first (a rule the data
    * already violates is refused, Delta's contract), then on every
    * subsequent batch alongside the CHECK constraints. The payoff is
    * [[deriveGenConjuncts]]: for the monotonic forms (`src div N`,
    * `date_format(src, 'yyyy[-MM[-dd]]')`, `substring(src, 1, n)`) a
    * predicate on the SOURCE column prunes the generated column's
    * PARTITIONS — `ts >= X` drops day directories the user never named.
    * Records Delta's generationExpression field metadata + legacy writer
    * version 4 in the mirror. */
  def setGeneratedColumn(spark: SparkSession, root: String,
                         colName: String, exprSql: String): Long = casRetry("setGeneratedColumn") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val (schema, pcs) = readMeta(root).getOrElse(
      sys.error(s"$root has no metaData to declare a generated column in"))
    require(schema.fieldNames.contains(colName), s"no column $colName")
    require(!exprSql.matches(s"(?s).*\\b${java.util.regex.Pattern.quote(colName)}\\b.*"),
      s"generation expression for $colName must not reference itself")
    val bad = read(spark, root)
      .filter(!(col(colName) <=> expr(exprSql))).limit(1).count()
    require(bad == 0,
      s"existing rows violate $colName = $exprSql; not declaring")
    val stamped = StructType(schema.fields.map { f =>
      if (f.name != colName) f
      else f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putString(GenExprKey, exprSql).build())
    })
    val gens = (generationMap(stamped).keys.toSeq.sorted).mkString(",")
    val cfg = readTableConfig(root) + ("graft.generatedColumns" -> gens)
    commit(root, v, s"set-generated#$colName", Seq.empty, Seq.empty,
      schemaJson = Some(stamped.json), dataChange = false, partCols = pcs,
      extraConfig = Some(cfg))
    v
  }

  private def requireUnpartitioned(root: String, what: String): Unit =
    readMeta(root).foreach { case (_, pcs) =>
      require(pcs.isEmpty,
        s"$what on a PARTITIONED TxnTable is not supported " +
          s"(partition columns: ${pcs.mkString(", ")})")
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
    val adds = liveAdds(root, asOf)
    val missing = adds.filterNot(a => Files.exists(filePath(root, a.file)))
    require(missing.isEmpty,
      s"version ${if (asOf < 0) last else asOf} references vacuumed files: " +
        missing.map(_.file).mkString(", "))
    // every commit adds at least one part file (Spark writes schema-bearing
    // empty parts), so a resolvable version always has files
    require(adds.nonEmpty, s"no live files at version $asOf")
    readFiles(spark, root, adds, asOf)
  }

  /** SHALLOW CLONE: create a new table at `dstRoot` whose version 0
    * re-adds the SOURCE's live files by ABSOLUTE path — zero data bytes
    * copied or read; stats, bloom indexes, schema, and constraints carry
    * over, so the clone prunes like the source from birth. The clone then
    * evolves INDEPENDENTLY: copy-on-write rewrites land under the clone's
    * own root, and neither writes nor [[vacuum]] through the clone ever
    * touch the source (vacuum skips absolute entries). The usual
    * dev/test-sandbox shape: branch a 100 TB table in O(files) metadata.
    * PARTITIONED sources clone too: every re-add carries its
    * partitionValues, the clone's metaData records the partition columns,
    * and reads group by the SOURCE's version directories (each group's
    * basePath re-attaches the path-encoded columns) — so the clone prunes
    * partitions exactly like the source from birth. Source files vacuumed
    * AWAY later make the clone's reads fail loudly, exactly like the
    * source's own too-old time travel (pin the source's retention
    * accordingly). */
  def cloneShallow(srcRoot: String, dstRoot: String): Long = {
    require(latestVersion(srcRoot) >= 0, s"$srcRoot is not a TxnTable (no _txn_log)")
    require(latestVersion(dstRoot) < 0, s"$dstRoot already has a _txn_log")
    val (schema, pcs) = readMeta(srcRoot).getOrElse(
      sys.error(s"$srcRoot has no metaData to clone"))
    val srcAbs = Paths.get(srcRoot).toAbsolutePath
    val adds = liveAdds(srcRoot, -1L)
      .map { a =>
        // a deletion-vector sidecar lives under the SOURCE root; the
        // clone's descriptor must say so explicitly (storageType "p",
        // absolute path — the protocol's cross-root DV reference), or the
        // relative "u" form would resolve under the clone and dangle
        val dv = a.dv.map {
          case d if d.storageType == "u" =>
            d.copy(storageType = "p",
              pathOrInlineDv = d.resolveFile(srcRoot).toAbsolutePath.toString)
          case d => d
        }
        a.copy(file = srcAbs.resolve(a.file).toString, dv = dv)
      }
    commit(dstRoot, 0L, "clone", adds, Seq.empty,
      schemaJson = Some(schema.json), partCols = pcs,
      extraConfig = Some(readTableConfig(srcRoot)))
    0L
  }

  /** Resolve a wall-clock timestamp (epoch ms) to the LATEST version whose
    * commit landed at or before it — `timestampAsOf` time travel. The
    * timestamp of record is the mirror's commitInfo (what external readers
    * see). Fails loudly for instants before the first commit. */
  def versionAsOf(root: String, tsMillis: Long): Long = {
    val vs = versions(root)
    require(vs.nonEmpty, s"$root is not a TxnTable (no _txn_log)")
    // commitInfo stamps come off one writer-side clock and are read
    // newest-first; the scan stops at the first (= latest) hit, so the
    // common "read the table as of just now" costs one file
    vs.reverseIterator.find(v => commitTimestamp(root, v) <= tsMillis)
      .getOrElse(sys.error(
        s"no commit at or before $tsMillis (first commit at " +
          s"${commitTimestamp(root, vs.head)})"))
  }

  private def commitTimestamp(root: String, v: Long): Long =
    Files.readAllLines(deltaDir(root).resolve(f"$v%020d.json")).asScala
      .find(_.startsWith("""{"commitInfo":"""))
      .map(l => MiniJson.parse(l).asInstanceOf[Map[String, Any]]("commitInfo")
        .asInstanceOf[Map[String, Any]]("timestamp")
        .asInstanceOf[BigDecimal].toLongExact)
      .getOrElse(sys.error(s"version $v has no commitInfo"))

  /** Time travel by TIMESTAMP: the table as of the last commit ≤ `tsMillis`. */
  def readTimestamp(spark: SparkSession, root: String, tsMillis: Long): DataFrame =
    readVersion(spark, root, versionAsOf(root, tsMillis))

  /** DESCRIBE HISTORY: one row per retained commit, newest first —
    * version, commit timestamp (the mirror's commitInfo, what external
    * readers see), operation, and action counts. Pure metadata fold,
    * O(retained versions) like Delta's own; history below [[expireLog]]'s
    * horizon is gone with its commits, exactly like time travel. (The
    * per-ACTION audit dump is [[history]].) */
  def historySummary(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    require(latestVersion(root) >= 0, s"$root is not a TxnTable (no _txn_log)")
    versions(root).map { v =>
      val acts = parseLog(root, v)
      val op = acts.headOption.map(_.op).getOrElse(
        // metadata-only commits (rename, constraint) write no actions in
        // the private log; the operation of record is the mirror's
        mirrorOperation(root, v).getOrElse("?"))
      (v, new java.sql.Timestamp(commitTimestamp(root, v)), op,
        acts.count(_.action == "add"), acts.count(_.action == "remove"),
        acts.count(_.action == "cdc"))
    }.sortBy(-_._1)
      .toDF("version", "timestamp", "operation", "num_added_files",
        "num_removed_files", "num_change_files")
  }

  private def mirrorOperation(root: String, v: Long): Option[String] =
    Files.readAllLines(deltaDir(root).resolve(f"$v%020d.json")).asScala
      .find(_.startsWith("""{"commitInfo":"""))
      .flatMap(l => MiniJson.parse(l).asInstanceOf[Map[String, Any]]("commitInfo")
        .asInstanceOf[Map[String, Any]].get("operation").map(_.asInstanceOf[String]))

  private def fileNameOf(f: String): String = {
    val i = f.lastIndexOf('/')
    if (i < 0) f else f.substring(i + 1)
  }

  /** file → descriptor for the DV-carrying members of a remove set, so
    * the mirror's remove actions name the instance they tombstone. */
  private[sources] def dvTombstones(adds: Seq[AddFile]): Map[String, DeletionVectors.DvDescriptor] =
    adds.flatMap(a => a.dv.map(a.file -> _)).toMap

  /** The hive-layout scan group of a log entry: its `data/<vN-uuid>`
    * version directory, resolved against whichever root the path lives
    * under — the table's own for relative entries, the SOURCE's for a
    * shallow clone's absolute re-adds. Each group scans with this as
    * `basePath` so partition discovery re-attaches the path-encoded
    * columns. (Partition dirs are `name=value`, so a bare `data` ancestor
    * is unambiguous.) */
  private def versionDirOf(root: String, f: String): String = {
    var p = filePath(root, f).toAbsolutePath
    while (p.getParent != null && (p.getParent.getFileName == null ||
      p.getParent.getFileName.toString != "data")) p = p.getParent
    require(p.getParent != null, s"no data/ ancestor in log entry $f")
    p.toString
  }

  /** Merge-on-read row filter: drop rows a live add's deletion vector
    * marks. None when no add carries a DV — non-DV tables pay zero (no
    * metadata column, no probe, unchanged plan). Keyed by parquet file
    * NAME (`_metadata.file_name`) — Spark part names embed a UUID, so the
    * key is unique across version dirs and even across a clone's absolute
    * re-adds. The probe is a codegen'd O(1) bitmap lookup per row
    * ([[graft.functions.DvRowDeleted]]); deleted positions never join or
    * shuffle, which is what keeps a 10M-row DV as cheap as a 10-row one. */
  private def dvAliveFilter(spark: SparkSession, root: String,
                            adds: Seq[AddFile]): Option[Column] = {
    val dvAdds = adds.filter(_.dv.isDefined)
    if (dvAdds.isEmpty) None
    else {
      val blobs = dvAdds.map { a =>
        fileNameOf(a.file) -> DeletionVectors.readDvData(root, a.dv.get)
      }.toMap
      val lookup = new graft.functions.DvLookup(
        spark.sparkContext.broadcast(blobs))
      Some(org.apache.spark.sql.GraftColumnExpr.column(
        org.apache.spark.sql.catalyst.expressions.Not(
          graft.functions.DvRowDeleted(
            org.apache.spark.sql.GraftColumnExpr.expr(col("_metadata.file_name")),
            org.apache.spark.sql.GraftColumnExpr.expr(col("_metadata.row_index")),
            lookup))))
    }
  }

  /** Read a set of live files, partition-aware: on a partitioned table the
    * files group by their version directory and each group reads with that
    * directory as `basePath`, so Spark's partition discovery re-attaches
    * the path-encoded columns under the metaData schema's types; groups
    * union by name. Unpartitioned tables take the single flat scan.
    * Deletion-vector adds filter their marked rows out INSIDE each scan
    * (the metadata columns don't survive a union). */
  /** An add whose deletion vector covers EVERY physical row is logically
    * empty — scanning it buys nothing (a fully-deleted 1 GB file would
    * still decode end-to-end just to probe every row away). */
  private def fullyDeleted(a: AddFile): Boolean =
    a.dv.exists(d => a.stats.exists(s =>
      decodeStats(s).numRecords == d.cardinality))

  private def readFiles(spark: SparkSession, root: String,
                        adds0: Seq[AddFile], asOf: Long = -1L): DataFrame = {
    // drop logically-empty files, keeping one if EVERYTHING is deleted
    // (its probe yields zero rows but the scan stays schema-correct)
    val kept = adds0.filterNot(fullyDeleted)
    val adds = if (kept.nonEmpty) kept else adds0.take(1)
    val files = adds.map(_.file)
    val alive = dvAliveFilter(spark, root, adds)
    def dvf(df: DataFrame): DataFrame = alive.map(df.filter).getOrElse(df)
    readMeta(root, asOf) match {
      case Some((schema, pcs)) if pcs.nonEmpty =>
        // data columns scan under their PHYSICAL names (partition columns
        // never rename — their name IS the directory encoding)
        val phys = StructType(schema.fields.map(f =>
          f.copy(name = physicalName(f))))
        files.groupBy(versionDirOf(root, _)).toSeq.sortBy(_._1)
          .map { case (vDir, fs) =>
            dvf(spark.read.schema(phys)
              .option("basePath", vDir)
              .parquet(fs.map(f => filePath(root, f).toString): _*))
              .select(schema.fields.toSeq.map(f =>
                col(physicalName(f)).as(f.name)): _*)
          }.reduce(_ unionByName _)
      case Some((schema, _)) =>
        // unified-schema scan: files an evolution predates simply lack the
        // new columns and read back null for them. Under column mapping
        // the scan uses the files' PHYSICAL names and the select re-attaches
        // the logical ones — still one scan, zero extra I/O.
        val phys = StructType(schema.fields.map(f =>
          f.copy(name = physicalName(f), nullable = true)))
        val scan = dvf(spark.read.schema(phys)
          .parquet(files.map(f => filePath(root, f).toString): _*))
        if (colMapping(schema).isEmpty) scan
        else scan.select(schema.fields.toSeq.map(f =>
          col(physicalName(f)).as(f.name)): _*)
      case None =>
        dvf(spark.read.parquet(files.map(f => filePath(root, f).toString): _*))
    }
  }

  // ---- row tracking (stable row ids) ------------------------------------------
  // The protocol's rowTracking feature: every row gets a STABLE id —
  // fresh files get a baseRowId block off a never-reused high-water mark
  // (row_id = baseRowId + physical row index), and rewrites that must
  // preserve identity MATERIALIZE the ids into a hidden column. The
  // 100 TB payoff is lineage: dedup decisions, quality labels, and
  // incremental downstream state can key on a row forever, across
  // compaction, clustering, purge, and merge-on-read DML (whose untouched
  // files keep ids by construction — the bitmap marks positions, the
  // file's identity never moves).

  /** The materialized-row-id physical column name (recorded in config as
    * delta.rowTracking.materializedRowIdColumnName). Hidden: never part
    * of the logical schema, ignored by every explicit-schema scan. */
  private val RowIdCol = "_graft_row_id"

  private def rowTrackingOn(root: String): Boolean =
    readTableConfig(root).get("delta.enableRowTracking").contains("true")

  /** ENABLE row tracking: one metadata-only commit that re-adds every
    * live file (the [[commit]] stamper assigns each its baseRowId block)
    * and records the feature config. Idempotent; time travel below the
    * enable has no row ids. */
  def enableRowTracking(spark: SparkSession, root: String): Long = casRetry("enableRowTracking") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val cfg = readTableConfig(root)
    if (cfg.get("delta.enableRowTracking").contains("true")) return v - 1
    val (schema, pcs) = readMeta(root).getOrElse(
      sys.error(s"$root has no metaData to enable row tracking on"))
    val live = liveAdds(root, v - 1)
    val newCfg = cfg + ("delta.enableRowTracking" -> "true") +
      ("delta.rowTracking.materializedRowIdColumnName" -> RowIdCol)
    commit(root, v, "enable-row-tracking",
      adds = live.map(_.copy(baseRowId = None)), removes = live.map(_.file).sorted,
      schemaJson = Some(schema.json), dataChange = false, partCols = pcs,
      extraConfig = Some(newCfg), removeDvs = dvTombstones(live))
    v
  }

  /** Snapshot read with the stable `_row_id` column: materialized ids win
    * (files a layout rewrite carried forward), else baseRowId + the
    * physical row index. Deletion vectors compose (marked rows vanish,
    * their ids simply go unused). */
  def readWithRowIds(spark: SparkSession, root: String, asOf: Long = -1L): DataFrame = {
    require(rowTrackingOn(root),
      s"$root does not track row ids (call enableRowTracking first)")
    val last = latestVersion(root)
    require(last >= 0, s"$root is not a TxnTable (no _txn_log)")
    require(asOf <= last, s"version $asOf does not exist (latest $last)")
    val adds = liveAdds(root, asOf)
    require(adds.nonEmpty, s"no live files at version $asOf")
    readFilesRowId(spark, root, adds, asOf)
  }

  /** The layout-rewrite read: when row tracking is on, rows come back
    * WITH their ids materialized under [[RowIdCol]], so the rewrite's
    * output files preserve identity; otherwise a plain [[readFiles]]. */
  private def readFilesPreservingIds(spark: SparkSession, root: String,
                                     adds: Seq[AddFile], asOf: Long): DataFrame =
    if (!rowTrackingOn(root)) readFiles(spark, root, adds, asOf)
    else readFilesRowId(spark, root, adds, asOf)
      .withColumnRenamed("_row_id", RowIdCol)

  private def readFilesRowId(spark: SparkSession, root: String,
                             adds0: Seq[AddFile], asOf: Long): DataFrame = {
    import spark.implicits._
    val kept = adds0.filterNot(fullyDeleted)
    val adds = if (kept.nonEmpty) kept else adds0.take(1)
    val alive = dvAliveFilter(spark, root, adds)
    def dvf(df: DataFrame): DataFrame = alive.map(df.filter).getOrElse(df)
    val (schema, pcs) = readMeta(root, asOf).getOrElse(
      sys.error(s"$root has no metaData"))
    // the scan schema carries the hidden materialized column as nullable:
    // files without it (fresh appends) read null and fall back to
    // baseRowId + row_index
    val phys = StructType(schema.fields.map(f =>
      f.copy(name = physicalName(f), nullable = true)) :+
      StructField(RowIdCol, LongType, nullable = true))
    val sel = schema.fields.toSeq.map(f => col(physicalName(f)).as(f.name)) ++ Seq(
      col(RowIdCol).as("_mat_id"),
      col("_metadata.file_name").as("_fn"),
      col("_metadata.row_index").as("_rix"))
    val scanned =
      if (pcs.nonEmpty)
        adds.map(_.file).groupBy(versionDirOf(root, _)).toSeq.sortBy(_._1)
          .map { case (vDir, fs) =>
            dvf(spark.read.schema(phys)
              .option("basePath", vDir)
              .parquet(fs.map(f => filePath(root, f).toString): _*))
              .select(sel: _*)
          }.reduce(_ unionByName _)
      else
        dvf(spark.read.schema(phys)
          .parquet(adds.map(f => filePath(root, f.file).toString): _*))
          .select(sel: _*)
    // per-file fresh-id base, broadcast — O(files) rows, never data-sized
    val baseDf = adds.map(a =>
      (fileNameOf(a.file), a.baseRowId.getOrElse(-1L))).toDF("_fn2", "_base")
    scanned.join(broadcast(baseDf), col("_fn") === col("_fn2"), "left")
      .withColumn("_row_id",
        coalesce(col("_mat_id"), when(col("_base") >= 0L, col("_base") + col("_rix"))))
      .drop("_mat_id", "_fn", "_fn2", "_rix", "_base")
  }

  /** [[readFiles]] plus a `_file` column carrying each row's source file as
    * a ROOT-RELATIVE path (the commit log's file key) — the attribution
    * column copy-on-write MERGE/DELETE group their touched-file analysis
    * on. The `_metadata.file_path` URI must be captured INSIDE each scan
    * (it does not survive a union of per-partition-group scans) and is
    * normalized to the log's key space right there, so every downstream
    * comparison is an exact Set lookup — no O(live × touched) suffix
    * scans on the driver. */
  private[sources] def readFilesTagged(spark: SparkSession, root: String,
                              adds0: Seq[AddFile], asOf: Long,
                              rowIndex: Boolean = false): DataFrame = {
    val kept = adds0.filterNot(fullyDeleted)
    val adds = if (kept.nonEmpty) kept else adds0.take(1)
    val files = adds.map(_.file)
    val alive = dvAliveFilter(spark, root, adds)
    def dvf(df: DataFrame): DataFrame = alive.map(df.filter).getOrElse(df)
    val rootAbs = Paths.get(root).toAbsolutePath.toString
    // file_path is a file: URI whose slash count varies by renderer
    // (Hadoop says file:/p, java.nio file:///p) — collapse the scheme to a
    // bare absolute path first, then strip the table root
    val relExpr = regexp_replace(
      regexp_replace(col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"),
      "^" + java.util.regex.Pattern.quote(rootAbs) + "/", "")
    // merge-on-read DELETE needs each row's physical position too
    val extra = relExpr.as("_file") +:
      (if (rowIndex) Seq(col("_metadata.row_index").as("_ri")) else Nil)
    readMeta(root, asOf) match {
      case Some((schema, pcs)) if pcs.nonEmpty =>
        val phys = StructType(schema.fields.map(f =>
          f.copy(name = physicalName(f))))
        files.groupBy(versionDirOf(root, _)).toSeq.sortBy(_._1)
          .map { case (vDir, fs) =>
            dvf(spark.read.schema(phys)
              .option("basePath", vDir)
              .parquet(fs.map(f => filePath(root, f).toString): _*))
              .select(schema.fields.toSeq.map(f =>
                col(physicalName(f)).as(f.name)) ++ extra: _*)
          }.reduce(_ unionByName _)
      case Some((schema, _)) =>
        val phys = StructType(schema.fields.map(f =>
          f.copy(name = physicalName(f), nullable = true)))
        dvf(spark.read.schema(phys)
          .parquet(files.map(f => filePath(root, f).toString): _*))
          .select(schema.fields.toSeq.map(f =>
            col(physicalName(f)).as(f.name)) ++ extra: _*)
      case None =>
        dvf(spark.read.parquet(files.map(f => filePath(root, f).toString): _*))
          .select(col("*") +: extra: _*)
    }
  }

  /** OPTIMIZE: rewrite every live file smaller than `smallBytes` into
    * compacted files; one commit of remove+add. Contents are bit-identical
    * (no ordering guarantee — parquet tables are unordered sets); history
    * stays time-travelable until [[vacuum]]. On a PARTITIONED table the
    * compaction respects the layout: the small files read back WITH their
    * path-encoded columns, co-locate per partition value, and rewrite
    * under fresh `col=value` directories in ONE partitionBy job — the
    * small-file hygiene pass a streaming-fed hive layout needs, and the
    * partition a file belongs to never changes. */
  def optimize(spark: SparkSession, root: String,
               smallBytes: Long = 8L << 20, targetPartitions: Int = 1): Long = casRetry("optimize") {
    val v = latestVersion(root) + 1
    val pcs = readMeta(root).map(_._2).getOrElse(Seq.empty)
    val small = liveAdds(root, v - 1).filter(_.bytes < smallBytes)
    require(small.nonEmpty, "nothing to optimize")
    val df = readFilesPreservingIds(spark, root, small, v - 1)
    val adds =
      if (pcs.isEmpty) writeDataFiles(df.repartition(targetPartitions), root, v,
        check = false)
      else writePartitionedFiles(
        df.repartition(targetPartitions, pcs.map(col): _*), root, v, pcs,
        check = false)
    commit(root, v, "optimize", adds, small.map(_.file), dataChange = false,
      partCols = pcs, removeDvs = dvTombstones(small))
    v
  }

  /** REORG PURGE (Delta's `REORG TABLE … APPLY (PURGE)` analogue):
    * materialize deletion vectors back into clean files, but ONLY where it
    * pays — files whose deleted fraction is at least `minDeletedFraction`
    * rewrite (through the DV-aware read, so the marked rows vanish and the
    * sidecar drops); lightly-shaved files keep their cheap bitmap. This is
    * the missing third of the MoR lifecycle: [[deleteDv]] defers the
    * rewrite, the scan probe pays a little per read, and purge reclaims
    * space + probe cost once the deleted mass is worth a write. At 100 TB
    * the threshold IS the knob: purge at 2% rewrites 50× more bytes than
    * the deletes shaved; purge at 30–50% amortizes. Layout-only commit
    * (dataChange:false); the freed DV sidecars age out via [[vacuum]]. */
  def purgeDeletes(spark: SparkSession, root: String,
                   minDeletedFraction: Double = 0.1): Long = casRetry("purgeDeletes") {
    require(minDeletedFraction > 0 && minDeletedFraction <= 1,
      s"minDeletedFraction must be in (0,1], got $minDeletedFraction")
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val pcs = readMeta(root).map(_._2).getOrElse(Seq.empty)
    val heavy = liveAdds(root, v - 1).filter { a =>
      a.dv.exists { d =>
        // physical row count from the add's stats; a stats-less DV'd add
        // (shouldn't exist — deleteDv carries stats over) purges to be safe
        a.stats.map(decodeStats(_).numRecords) match {
          case Some(n) if n > 0 => d.cardinality.toDouble / n >= minDeletedFraction
          case _                => true
        }
      }
    }
    if (heavy.isEmpty) return v - 1 // nothing worth rewriting; no commit
    val df = readFilesPreservingIds(spark, root, heavy, v - 1) // DV-aware: marked rows gone
    val adds =
      if (pcs.isEmpty) writeDataFiles(df, root, v, check = false)
      else writePartitionedFiles(df, root, v, pcs, check = false)
    commit(root, v, "purge-deletes", adds, heavy.map(_.file),
      dataChange = false, partCols = pcs, removeDvs = dvTombstones(heavy))
    v
  }

  /** OPTIMIZE ZORDER BY: rewrite the live files CLUSTERED on the Morton
    * interleave of two integral columns ([[graft.operators.ZOrder]]), so
    * every file's (x, y) stats box is a small rectangle and 2-D slice
    * predicates prune files the way 1-D sorts only prune their own column.
    * Same contract as [[optimize]]: contents identical (tables are
    * unordered sets), one remove+add commit, `dataChange:false`, history
    * time-travelable until vacuum. Values are masked into `bits` bits for
    * the clustering key only — correctness never depends on the layout. */
  def optimizeZorder(spark: SparkSession, root: String,
                     xCol: String, yCol: String,
                     targetPartitions: Int, bits: Int = 16): Long =
    optimizeZorderBy(spark, root, Seq(xCol, yCol), targetPartitions, bits)

  /** N-column ZORDER (Delta allows any number; n·bits must fit a BIGINT —
    * lower `bits` for more dimensions). */
  def optimizeZorderBy(spark: SparkSession, root: String, zCols: Seq[String],
                       targetPartitions: Int, bits: Int = 16): Long = casRetry("optimizeZorder") {
    val v = latestVersion(root) + 1
    val pcs = readMeta(root).map(_._2).getOrElse(Seq.empty)
    val live = liveAdds(root, v - 1)
    require(live.nonEmpty, "nothing to optimize")
    val mask = (1L << bits) - 1
    val z = expr(graft.operators.ZOrder.zExprSparkN(
      zCols.map(c => s"(CAST($c AS BIGINT) & $mask)"), bits))
    val df = readFilesPreservingIds(spark, root, live, v - 1)
    // on a partitioned table the hive layout stays the outer key: rows
    // range-cluster on (partition cols, z) so each partition directory's
    // files get tight z-rectangles and no row changes partition
    val keyCols = pcs.map(col) :+ z
    val clustered = df.repartitionByRange(targetPartitions, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val adds =
      if (pcs.isEmpty) writeDataFiles(clustered, root, v, check = false)
      else writePartitionedFiles(clustered, root, v, pcs, check = false)
    commit(root, v, "optimize-zorder", adds, live.map(_.file), dataChange = false,
      removeDvs = dvTombstones(live),
      partCols = pcs)
    v
  }

  // ---- liquid clustering (incremental z-order maintenance) -------------------
  // The OPTIMIZE ZORDER model rewrites the WHOLE table per pass — correct,
  // but at 100 TB a nightly full rewrite is exactly the write-amplification
  // class DVs and MoR merge just eliminated. The liquid-clustering shape
  // fixes the maintenance cost: the table DECLARES its clustering columns
  // once (metadata), and each OPTIMIZE pass clusters ONLY the files that
  // arrived since the last pass — appends land unclustered, the pass folds
  // them into z-ordered files, already-clustered bytes never rewrite. Cost
  // per pass is proportional to the NEW data, not the table.

  private val ClusteringKey = "delta.clusteringColumns"
  private val ClusteringBitsKey = "graft.clustering.bits"

  /** Declare the table's clustering columns — metadata-only, like Delta's
    * `CLUSTER BY`. Numeric columns only (the Morton interleave masks each
    * to `bits` bits; clustering is layout, never correctness). */
  def setClustering(spark: SparkSession, root: String,
                    cols: Seq[String], bits: Int = 16): Long = casRetry("setClustering") {
    require(cols.nonEmpty, "setClustering needs at least one column")
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val (schema, pcs) = readMeta(root).getOrElse(
      sys.error(s"$root has no metaData to cluster"))
    cols.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        sys.error(s"no column $c"))
      require(f.dataType.isInstanceOf[NumericType],
        s"clustering column $c: ${f.dataType.simpleString} is not numeric")
      require(!pcs.contains(c),
        s"$c is a partition column — already the coarse layout key")
    }
    val cfg = readTableConfig(root) +
      (ClusteringKey -> cols.mkString(",")) +
      (ClusteringBitsKey -> bits.toString)
    commit(root, v, s"set-clustering#${cols.mkString(",")}", Seq.empty, Seq.empty,
      schemaJson = Some(schema.json), dataChange = false, partCols = pcs,
      extraConfig = Some(cfg))
    v
  }

  /** The declared clustering columns (empty when never set). */
  def clusteringColumns(root: String): Seq[String] =
    readTableConfig(root).get(ClusteringKey)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)

  /** INCREMENTAL clustering pass: z-order-rewrite ONLY the live files a
    * previous pass did not produce (attribution by each file's add-action
    * op). Appends since the last pass fold into clustered files; bytes a
    * prior pass already placed never rewrite — the pass costs O(new
    * data). Reads through deletion vectors (marked rows vanish, sidecars
    * drop), respects the hive layout (clusters within partitions), and
    * commits `dataChange:false` so streams skip it. No unclustered file →
    * NO commit. After [[expireLog]] truncates the op attribution below a
    * checkpoint, old files may re-cluster ONCE — wasted bytes, never
    * wrong bytes. Returns the committed (or current) version. */
  def optimizeCluster(spark: SparkSession, root: String,
                      targetPartitions: Int = 1): Long = casRetry("optimizeCluster") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val zCols = clusteringColumns(root)
    require(zCols.nonEmpty,
      s"$root has no clustering columns (declare them with setClustering)")
    val bits = readTableConfig(root).get(ClusteringBitsKey)
      .map(_.toInt).getOrElse(16)
    val pcs = readMeta(root).map(_._2).getOrElse(Seq.empty)
    val clustered = actions(root, v - 1).collect {
      case Action(_, op, "add", a) if op == "optimize-cluster" => a.file
    }.toSet
    val stale = liveAdds(root, v - 1).filterNot(a => clustered(a.file))
    if (stale.isEmpty) return v - 1 // fully clustered; no commit
    val mask = (1L << bits) - 1
    // ONE clustering column is a plain range sort (no interleave needed);
    // two or more take the Morton key
    val z = if (zCols.size == 1) col(zCols.head)
      else expr(graft.operators.ZOrder.zExprSparkN(
        zCols.map(c => s"(CAST($c AS BIGINT) & $mask)"), bits))
    val df = readFilesPreservingIds(spark, root, stale, v - 1) // DV-aware: marked rows gone
    val keyCols = pcs.map(col) :+ z
    val out = df.repartitionByRange(targetPartitions, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val adds =
      if (pcs.isEmpty) writeDataFiles(out, root, v, check = false)
      else writePartitionedFiles(out, root, v, pcs, check = false)
    commit(root, v, "optimize-cluster", adds, stale.map(_.file),
      dataChange = false, partCols = pcs, removeDvs = dvTombstones(stale))
    v
  }

  /** VACUUM: physically delete files not referenced by any version >
    * `retainAfter` — both files a retained remove superseded AND orphans a
    * losing CAS attempt wrote but never committed (referenced by no log
    * entry, so invisible to every reader). Time travel to ≤ `retainAfter`
    * then fails loudly. As in the open formats, vacuuming while a writer
    * is mid-commit can sweep that writer's not-yet-committed files — run
    * it with a retention window in shared settings. */
  /** `dryRun = true` reports every file vacuum WOULD delete without
    * touching one byte — the sanity check an operator runs before
    * pointing a retention window at a 100 TB table. */
  def vacuum(root: String, retainAfter: Long,
             dryRun: Boolean = false): Seq[String] = {
    val latest = latestVersion(root)
    // the CURRENT snapshot is always retained (Delta's rule): a
    // retainAfter at or past latest would otherwise compute an empty
    // keep-set and delete every live file of a table the log still serves
    val firstKept = math.max(math.min(retainAfter, latest - 1) + 1, 0L)
    val keep = (firstKept to latest)
      .flatMap(v => liveFiles(root, v).map(_._1)).toSet
    val all = actions(root, -1L).collect { case Action(_, _, "add", a) => a.file }.distinct
    // change-data files age with their commit: a CDF range read reaches
    // only retained versions, so cdc files of vacuumed-away versions go too
    val cdcVictims = versions(root).filter(_ < firstKept)
      .flatMap(v => parseLog(root, v).collect {
        case Action(_, _, "cdc", a) => a.file })
    // absolute entries are a shallow clone's references INTO its source —
    // vacuum through the clone must never reclaim the source's bytes
    val victims = (all.filterNot(keep.contains) ++ cdcVictims)
      .filterNot(f => Paths.get(f).isAbsolute)
      .filter(f => Files.exists(Paths.get(root, f)))
    if (!dryRun) victims.foreach(f => Files.delete(Paths.get(root, f)))
    // after expireLog, adds referenced only by a checkpoint are absent
    // from the remaining commit files — the keep-set guards them from the
    // orphan sweep (an orphan is on disk AND referenced by nothing)
    val everAdded = all.toSet ++ keep ++
      actions(root, -1L).collect { case Action(_, _, "cdc", a) => a.file }
    val orphans = Seq("data", "cdc").flatMap { sub =>
      val d = Paths.get(root, sub)
      if (!Files.isDirectory(d)) Seq.empty[String]
      else walkClosed(d).iterator().asScala
        .filter { p => val n = p.getFileName.toString
          n.endsWith(".parquet") && !n.startsWith(".") }
        .map(p => Paths.get(root).relativize(p).toString)
        .filterNot(everAdded.contains).toSeq
    }
    if (!dryRun) orphans.foreach(f => Files.delete(Paths.get(root, f)))
    // deletion-vector files age like data files: a DV referenced only by
    // vacuumed-away versions (a later deleteDv superseded it, or the file
    // was compacted) is reclaimed; DVs any retained version references
    // stay. Absolute ("p") and inline ("i") descriptors never resolve to
    // a relative path here, mirroring the clone rule above.
    def dvRel(d: DeletionVectors.DvDescriptor): Option[String] =
      if (d.storageType != "u") None
      else Some(Paths.get(root).toAbsolutePath
        .relativize(d.resolveFile(root).toAbsolutePath).toString)
    val allDv = actions(root, -1L)
      .collect { case Action(_, _, "add", a) => a.dv }
      .flatten.flatMap(dvRel).distinct
    val keepDv = (firstKept to latest)
      .flatMap(v => liveAdds(root, v).flatMap(_.dv).flatMap(dvRel)).toSet
    val dvVictims = allDv.filterNot(keepDv.contains)
      .filter(f => Files.exists(Paths.get(root, f)))
    if (!dryRun) dvVictims.foreach(f => Files.delete(Paths.get(root, f)))
    val dvDir = Paths.get(root, "dv")
    val dvOrphans =
      if (!Files.isDirectory(dvDir)) Seq.empty[String]
      else walkClosed(dvDir).iterator().asScala
        .filter { p => val n = p.getFileName.toString
          n.endsWith(".bin") && !n.startsWith(".") }
        .map(p => Paths.get(root).relativize(p).toString)
        .filterNot((allDv.toSet ++ keepDv).contains).toSeq
    if (!dryRun) dvOrphans.foreach(f => Files.delete(Paths.get(root, f)))
    victims ++ orphans ++ dvVictims ++ dvOrphans
  }

  /** EXPIRE the log below the newest `_txn_log` checkpoint — the
    * bounded-metadata half of the lifecycle (VACUUM bounds data files,
    * this bounds commit files; Delta's log-retention analogue). Deletes
    * every commit file, old checkpoint, and mirror JSON below it. Reads
    * at or above the checkpoint are unaffected (they seed from it —
    * including the appendOnce token ledger and the table schema); time
    * travel below it fails loudly afterwards, like vacuumed versions.
    * Mirror JSONs are expired only when the mirror's own checkpoint
    * parquet exists at that version, so an external reader always keeps a
    * complete fold. Run [[vacuum]] for the expired versions'
    * now-unreferenced data files. */
  def expireLog(root: String): Seq[String] = {
    val cv = ckptVersions(root).lastOption.getOrElse(sys.error(
      s"$root has no checkpoint yet (one lands every $CheckpointInterval commits)"))
    val victims = Seq.newBuilder[String]
    versions(root).filter(_ < cv).foreach { v =>
      Files.delete(logDir(root).resolve(f"$v%020d.json"))
      victims += f"_txn_log/$v%020d.json"
    }
    ckptVersions(root).filter(_ < cv).foreach { v =>
      Files.delete(ckptPath(root, v))
      victims += f"_txn_log/$v%020d.ckpt"
    }
    val mirrorCp = deltaDir(root).resolve(f"$cv%020d.checkpoint.parquet")
    if (Files.exists(mirrorCp)) {
      val d = deltaDir(root)
      listClosed(d).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          (n.endsWith(".json") && n.stripSuffix(".json").toLong < cv) ||
            (n.endsWith(".checkpoint.parquet") &&
              n.stripSuffix(".checkpoint.parquet").toLong < cv)
        }.toSeq.foreach { p =>
          Files.delete(p)
          victims += s"_delta_log/${p.getFileName}"
        }
    }
    victims.result()
  }

  // ---- metadata data skipping ----------------------------------------------
  // The 100 TB read path: before any parquet footer is opened, fold the
  // commit log's per-file min/max/nullCount against the predicate's
  // conjuncts and drop every file that PROVABLY contains no matching row.
  // Pruning is advisory-safe: kept files still pass through the real
  // `.filter(pred)`, so a conjunct the pruner does not understand costs
  // I/O, never correctness.

  private def conjuncts(e: Expression): Seq[Expression] = normalize(e) match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** A Column built from the fluent API converts to
    * `UnresolvedFunction("and" | ">=" | "in" | …)` nodes (the Connect-era
    * node shape); a Column lifted off a resolved plan converts to the
    * binary catalyst operators directly. Fold the former into the latter so
    * one matcher serves both. */
  private def normalize(c: Expression): Expression = c match {
    case f: UFn =>
      val a = f.arguments
      (f.nameParts.last.toLowerCase, a.size) match {
        case ("and", 2)       => And(normalize(a(0)), normalize(a(1)))
        case ("=" | "==", 2)  => EqualTo(a(0), a(1))
        case (">", 2)         => GreaterThan(a(0), a(1))
        case (">=", 2)        => GreaterThanOrEqual(a(0), a(1))
        case ("<", 2)         => LessThan(a(0), a(1))
        case ("<=", 2)        => LessThanOrEqual(a(0), a(1))
        case ("in", n) if n >= 2 => In(a.head, a.tail)
        case ("isnull", 1)    => IsNull(a(0))
        case ("isnotnull", 1) => IsNotNull(a(0))
        case _ => c
      }
    case _ => c
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def litNum(l: Literal): Option[BigDecimal] = l.value match {
    case i: java.lang.Integer => Some(BigDecimal(i.intValue))
    case j: java.lang.Long    => Some(BigDecimal(j.longValue))
    case s: java.lang.Short   => Some(BigDecimal(s.intValue))
    case b: java.lang.Byte    => Some(BigDecimal(b.intValue))
    case f: java.lang.Float   =>
      if (f.isNaN || f.isInfinite) None else Some(BigDecimal(f.toString))
    case d: java.lang.Double  =>
      if (d.isNaN || d.isInfinite) None else Some(BigDecimal(d.toString))
    case d: Decimal           => Some(BigDecimal(d.toJavaBigDecimal))
    case _ => None
  }

  /** Exact three-way compare of a decoded stat value against a predicate
    * literal; None = incomparable (never prune on it). Numerics compare in
    * BigDecimal (no double rounding can mis-skip a file), strings in
    * UTF8String binary order — the same order Spark's min/max used. */
  private def cmpStat(statV: Any, l: Literal): Option[Int] = (statV, l.value) match {
    case (null, _) | (_, null) => None
    case (b: BigDecimal, _)    => litNum(l).map(b.compare)
    case (s: String, u: UTF8String) => Some(UTF8String.fromString(s).compareTo(u))
    case (b: java.lang.Boolean, v: java.lang.Boolean) => Some(b.compareTo(v))
    case (PartVal(s), u: UTF8String) => Some(UTF8String.fromString(s).compareTo(u))
    case (PartVal(s), _) if litNum(l).isDefined =>
      // a path-encoded partition value probed by a numeric literal: a
      // PartVal is a POINT (min = max = the value), so parsing it
      // numerically is exact when it parses and harmless when it doesn't.
      // (Never do this for real string-column stats: their lexicographic
      // min/max need not bracket the numeric range.)
      try Some(BigDecimal(s.trim).compare(litNum(l).get))
      catch { case _: NumberFormatException => None }
    case _ => None
  }

  /** A partition value folded into FileStats — string-typed in the path,
    * point-ranged by construction. */
  private final case class PartVal(s: String)

  /** Skip when the [min,max] range of `name` proves the comparison can
    * never hold; `skipWhen(cmp(min,lit), cmp(max,lit))`. A column whose
    * stats are (null,null) is all-null in this file, and no comparison
    * matches a null — skip. A column ABSENT from the maps is unknown. */
  private def rangeSkip(st: FileStats, name: String, l: Literal)
                       (skipWhen: (Option[Int], Option[Int]) => Boolean): Boolean =
    (st.minV.get(name), st.maxV.get(name)) match {
      case (Some(null), Some(null)) => true
      case (Some(mn), Some(mx)) => skipWhen(cmpStat(mn, l), cmpStat(mx, l))
      case _ => false
    }

  private def eqSkips(st: FileStats, n: String, l: Literal): Boolean =
    rangeSkip(st, n, l)((cm, cx) => cm.exists(_ > 0) || cx.exists(_ < 0))

  /** True when this conjunct alone proves the file holds no matching row. */
  private def skipConjunct(c0: Expression, st: FileStats): Boolean = {
    if (st.numRecords == 0L) return true
    // range proof OR bloom proof — either suffices for = and IN
    def eqOrBloomSkips(n: String, l: Literal): Boolean =
      eqSkips(st, n, l) || bloomExcludes(st, n, l)
    normalize(c0) match {
      case EqualTo(a, l: Literal) => attrName(a).exists(eqOrBloomSkips(_, l))
      case EqualTo(l: Literal, a) => attrName(a).exists(eqOrBloomSkips(_, l))
      case GreaterThan(a, l: Literal) => // rows need max > lit
        attrName(a).exists(n => rangeSkip(st, n, l)((_, cx) => cx.exists(_ <= 0)))
      case GreaterThan(l: Literal, a) => // lit > attr ≡ attr < lit
        attrName(a).exists(n => rangeSkip(st, n, l)((cm, _) => cm.exists(_ >= 0)))
      case GreaterThanOrEqual(a, l: Literal) =>
        attrName(a).exists(n => rangeSkip(st, n, l)((_, cx) => cx.exists(_ < 0)))
      case GreaterThanOrEqual(l: Literal, a) =>
        attrName(a).exists(n => rangeSkip(st, n, l)((cm, _) => cm.exists(_ > 0)))
      case LessThan(a, l: Literal) =>
        attrName(a).exists(n => rangeSkip(st, n, l)((cm, _) => cm.exists(_ >= 0)))
      case LessThan(l: Literal, a) =>
        attrName(a).exists(n => rangeSkip(st, n, l)((_, cx) => cx.exists(_ <= 0)))
      case LessThanOrEqual(a, l: Literal) =>
        attrName(a).exists(n => rangeSkip(st, n, l)((cm, _) => cm.exists(_ > 0)))
      case LessThanOrEqual(l: Literal, a) =>
        attrName(a).exists(n => rangeSkip(st, n, l)((_, cx) => cx.exists(_ < 0)))
      case In(a, ls) if ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
        attrName(a).exists(n =>
          ls.forall(l => eqOrBloomSkips(n, l.asInstanceOf[Literal])))
      case IsNull(a) =>
        attrName(a).exists(n => st.nullC.get(n).contains(0L))
      case IsNotNull(a) =>
        attrName(a).exists(n => st.nullC.get(n).contains(st.numRecords))
      case _ => false
    }
  }

  /** Fold an add's path-encoded partitionValues into its FileStats as
    * point ranges (min = max = value): every value in the file IS the
    * partition value, so the same conjunct machinery prunes partitions and
    * data columns alike. The Hive null marker becomes an all-null column. */
  private def withPartitionStats(st: FileStats,
                                 pvs: Map[String, String]): FileStats =
    if (pvs.isEmpty) st
    else pvs.foldLeft(st) { case (s, (k, v)) =>
      if (v == "__HIVE_DEFAULT_PARTITION__")
        s.copy(minV = s.minV + (k -> null), maxV = s.maxV + (k -> null),
          nullC = s.nullC + (k -> s.numRecords))
      else
        s.copy(minV = s.minV + (k -> PartVal(v)), maxV = s.maxV + (k -> PartVal(v)),
          nullC = s.nullC + (k -> 0L))
    }

  private def decodeBloom(json: String): Map[String, (Int, Array[Long])] = {
    val m = MiniJson.parse(json).asInstanceOf[Map[String, Any]]
    val mBits = m("mBits").asInstanceOf[BigDecimal].toIntExact
    m.getOrElse("cols", Map.empty).asInstanceOf[Map[String, Any]].map {
      case (c, b64) =>
        val bytes = java.util.Base64.getDecoder.decode(b64.asInstanceOf[String])
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val arr = Array.fill(bytes.length / 8)(bb.getLong)
        c -> (mBits, arr)
    }
  }

  // ---- generated columns (derived partition pruning) -------------------------
  // The day-partitioned-by-timestamp shape: `day` is DECLARED as
  // `date_format(ts, 'yyyy-MM-dd')` (field metadata, Delta's
  // generationExpression), writes must satisfy the generation rule, and —
  // the point at 100 TB — a predicate on `ts` alone prunes the `day`
  // DIRECTORIES: for the monotonic generation forms below, `ts >= lo`
  // implies `day >= F(lo)`, so the pruner derives the partition conjunct
  // the user never wrote. Derivation is advisory-safe like all pruning
  // (survivors still run the real filter); unsupported forms derive
  // nothing and cost only I/O.

  private val GenExprKey = "delta.generationExpression"

  /** genCol → generation SQL, from field metadata. */
  private def generationMap(schema: StructType): Map[String, String] =
    schema.fields.iterator.filter(_.metadata.contains(GenExprKey))
      .map(f => f.name -> f.metadata.getString(GenExprKey)).toMap

  /** A parsed monotonic generation form: maps a source-column literal to
    * the generated column's literal. */
  private sealed trait GenForm { def src: String; def apply(l: Literal): Option[Literal] }
  private final case class GenDiv(src: String, n: Long) extends GenForm {
    def apply(l: Literal): Option[Literal] =
      litNum(l).filter(_.isWhole).map(v =>
        Literal(v.toLongExact / n, LongType)) // trunc toward zero = Spark div
  }
  private final case class GenDateFmt(src: String, pat: String) extends GenForm {
    def apply(l: Literal): Option[Literal] = l.value match {
      case micros: java.lang.Long if l.dataType.isInstanceOf[TimestampType] =>
        val ldt = java.time.LocalDateTime.ofInstant(
          java.time.Instant.EPOCH.plus(micros.longValue,
            java.time.temporal.ChronoUnit.MICROS), java.time.ZoneOffset.UTC)
        Some(Literal(UTF8String.fromString(
          ldt.format(java.time.format.DateTimeFormatter.ofPattern(pat))), StringType))
      case days: java.lang.Integer if l.dataType == DateType =>
        Some(Literal(UTF8String.fromString(
          java.time.LocalDate.ofEpochDay(days.longValue)
            .format(java.time.format.DateTimeFormatter.ofPattern(pat))), StringType))
      case _ => None
    }
  }
  private final case class GenSubstr(src: String, n: Int) extends GenForm {
    def apply(l: Literal): Option[Literal] = l.value match {
      case u: UTF8String =>
        Some(Literal(UTF8String.fromString(u.toString.take(n)), StringType))
      case _ => None
    }
  }

  private val DivRe = """(?i)^\s*(\w+)\s+div\s+(\d+)\s*$""".r
  // only ISO prefixes are monotonic in string order; 'MM-dd' alone is not
  private val DateFmtRe =
    """(?i)^\s*date_format\(\s*(\w+)\s*,\s*'(yyyy(?:-MM(?:-dd)?)?)'\s*\)\s*$""".r
  private val SubstrRe =
    """(?i)^\s*substring\(\s*(\w+)\s*,\s*1\s*,\s*(\d+)\s*\)\s*$""".r

  private def parseGenForm(sql: String): Option[GenForm] = sql match {
    case DivRe(src, n) if n.toLong > 0 => Some(GenDiv(src, n.toLong))
    case DateFmtRe(src, pat)           => Some(GenDateFmt(src, pat))
    case SubstrRe(src, n)              => Some(GenSubstr(src, n.toInt))
    case _                             => None
  }

  /** Conjuncts on GENERATED columns derived from conjuncts on their
    * source columns. `F` is monotone non-decreasing for every supported
    * form, so `src ≥ lo ⇒ gen ≥ F(lo)` (strict compares relax to ≥/≤ —
    * F collapses distinct sources to one generated value). */
  private def deriveGenConjuncts(schema: StructType, cs: Seq[Expression],
                                 nameMap: Map[String, String]): Seq[Expression] = {
    val gens = generationMap(schema)
    if (gens.isEmpty) return Seq.empty
    val forms = gens.toSeq.flatMap { case (g, sql) =>
      parseGenForm(sql).map { f =>
        (nameMap.getOrElse(f.src, f.src),
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            Seq(nameMap.getOrElse(g, g))), f)
      }
    }
    if (forms.isEmpty) return Seq.empty
    def derived(src: String, mk: GenForm => Option[Expression]): Seq[Expression] =
      forms.collect { case (s, _, f) if s == src => mk(f) }.flatten
    cs.flatMap { c =>
      def gAttr(f: GenForm) = forms.find(_._3 eq f).get._2
      normalize(c) match {
        case EqualTo(a, l: Literal) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(EqualTo(gAttr(f), _))))
        case EqualTo(l: Literal, a) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(EqualTo(gAttr(f), _))))
        case GreaterThan(a, l: Literal) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(GreaterThanOrEqual(gAttr(f), _))))
        case GreaterThanOrEqual(a, l: Literal) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(GreaterThanOrEqual(gAttr(f), _))))
        case LessThan(a, l: Literal) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(LessThanOrEqual(gAttr(f), _))))
        case LessThanOrEqual(a, l: Literal) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(LessThanOrEqual(gAttr(f), _))))
        case GreaterThan(l: Literal, a) => // lit > src ≡ src < lit
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(LessThanOrEqual(gAttr(f), _))))
        case GreaterThanOrEqual(l: Literal, a) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(LessThanOrEqual(gAttr(f), _))))
        case LessThan(l: Literal, a) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(GreaterThanOrEqual(gAttr(f), _))))
        case LessThanOrEqual(l: Literal, a) =>
          attrName(a).toSeq.flatMap(derived(_, f => f(l).map(GreaterThanOrEqual(gAttr(f), _))))
        case In(a, ls) if ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
          attrName(a).toSeq.flatMap(derived(_, f => {
            val mapped = ls.map(l => f(l.asInstanceOf[Literal]))
            if (mapped.forall(_.isDefined)) Some(In(gAttr(f), mapped.map(_.get)))
            else None
          }))
        case _ => Seq.empty
      }
    }
  }

  /** (kept, skipped) partition of `adds` under `pred`'s provable conjuncts. */
  private[sources] def pruneAdds(adds: Seq[AddFile], pred: Column,
                        nameMap: Map[String, String] = Map.empty,
                        genSchema: Option[StructType] = None): (Seq[AddFile], Seq[AddFile]) = {
    val cs0 = conjuncts(mapPredNames(
      org.apache.spark.sql.GraftColumnExpr.expr(pred), nameMap))
    val cs = cs0 ++ genSchema.map(deriveGenConjuncts(_, cs0, nameMap))
      .getOrElse(Seq.empty)
    adds.partition { a =>
      a.stats.map { j =>
        withPartitionStats(decodeStats(j), a.partitionValues)
          .copy(blooms = a.bloom.map(decodeBloom).getOrElse(Map.empty))
      } match {
        case None => true
        case Some(st) => !cs.exists(skipConjunct(_, st))
      }
    }
  }

  /** Snapshot read with log-level data skipping: files whose stats prove
    * `pred` cannot match are never opened; the survivors still run through
    * the real filter, so pruning can only save I/O, never change rows. */
  def readWhere(spark: SparkSession, root: String, pred: Column,
                asOf: Long = -1L): DataFrame = {
    val last = latestVersion(root)
    require(last >= 0, s"$root is not a TxnTable (no _txn_log)")
    require(asOf <= last, s"version $asOf does not exist (latest $last)")
    val adds = liveAdds(root, asOf)
    val meta = readMeta(root, asOf)
    val nameMap = meta.map(m => colMapping(m._1)).getOrElse(Map.empty)
    val (kept0, _) = pruneAdds(adds, pred, nameMap, genSchema = meta.map(_._1))
    // keep one file when everything pruned: a schema-bearing empty scan
    val kept = if (kept0.nonEmpty) kept0 else adds.take(1)
    val missing = kept.filterNot(a => Files.exists(filePath(root, a.file)))
    require(missing.isEmpty, s"readWhere references vacuumed files: " +
      missing.map(_.file).mkString(", "))
    readFiles(spark, root, kept, asOf).filter(pred)
  }

  /** (filesRead, filesSkipped) the pruner would choose for `pred` — the
    * observability hook the skipping specs and audits gate on. */
  def skippingReport(root: String, pred: Column, asOf: Long = -1L): (Int, Int) = {
    val meta = readMeta(root, asOf)
    val (kept, skipped) = pruneAdds(liveAdds(root, asOf), pred,
      meta.map(m => colMapping(m._1)).getOrElse(Map.empty),
      genSchema = meta.map(_._1))
    (kept.size, skipped.size)
  }

  // ---- per-file Bloom indexes ----------------------------------------------
  // Point lookups on high-cardinality UNSORTED keys are the pruning class
  // min/max cannot serve: every file's range spans everything, yet each
  // file holds almost none of the keys. A small per-file Bloom filter
  // (k=4 bit positions carved from one xxhash64) answers "can this file
  // contain v?" with no false negatives, so = and IN conjuncts skip the
  // files that provably lack the key — the open formats' bloom index,
  // folded into the same conjunct machinery.

  private val BloomK = 4

  /** The k bit positions for a 64-bit hash in an m-bit filter — 16-bit
    * slices of the hash, identical arithmetic on the build (SQL) and probe
    * (driver) sides. */
  private def bloomBits(h: Long, mBits: Int): Seq[Int] =
    (0 until BloomK).map { i =>
      val p = (h >>> (i * 16)) % mBits
      (if (p < 0) p + mBits else p).toInt
    }

  /** Driver-side xxhash64 matching Spark's `xxhash64(col)` (seed 42);
    * BloomSpec pins the equivalence against the SQL function. */
  private def sparkHash(l: Literal): Option[Long] = l.value match {
    case j: java.lang.Long => Some(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(j.longValue, 42L))
    case i: java.lang.Integer => Some(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i.intValue, 42L))
    case u: UTF8String => Some(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
    case _ => None
  }

  /** True when the file's Bloom for `name` PROVES `l` is absent. */
  private def bloomExcludes(st: FileStats, name: String, l: Literal): Boolean =
    st.blooms.get(name).exists { case (m, words) =>
      sparkHash(l).exists { h =>
        bloomBits(h, m).exists(p => (words(p >>> 6) & (1L << (p & 63))) == 0L)
      }
    }

  /** Append with per-file Bloom indexes over `bloomCols` (LongType,
    * IntegerType or StringType key columns). The build is ONE distributed
    * pass over the just-written files — per row, k (word, bit) pairs;
    * per (file, word), a `bit_or` — so O(files × mBits/64) words reach
    * the driver, never rows. The filters ride the custom log's add
    * actions only (the `_delta_log` mirror stays protocol-clean; Delta
    * keeps bloom indexes outside stats too). */
  def appendBloom(df: DataFrame, root: String,
                  bloomCols: Seq[String], mBits: Int = 8192,
                  partCols: Seq[String] = Nil): Long = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    bloomCols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == LongType || dt == IntegerType || dt == StringType,
        s"bloom column $c: $dt is not a supported key type (long/int/string)")
    }
    // the table's layout wins: an existing partitioned table fixes the
    // partition columns; partCols only seeds a FIRST commit
    val pcs = readMeta(root).map(_._2).getOrElse(partCols)
    require(partCols.isEmpty || pcs == partCols,
      s"table is partitioned by ${pcs.mkString(",")}, got ${partCols.mkString(",")}")
    require(pcs.forall(c => !bloomCols.contains(c)),
      "partition columns already prune exactly; bloom-index data columns only")
    val base =
      if (pcs.isEmpty) writeDataFiles(df, root, latestVersion(root) + 1)
      else writePartitionedFiles(df, root, latestVersion(root) + 1, pcs)
    val spark = df.sparkSession
    val subDir = base.head.file.split('/').take(2).mkString("/")
    val written = spark.read.schema(df.schema)
      .option("basePath", Paths.get(root, subDir).toString)
      .parquet(Paths.get(root, subDir).toString)
    val words = mBits / 64
    val perFile: Map[String, Map[String, Array[Long]]] = bloomCols.map { c =>
      val entries = written
        .select(col("_metadata.file_path").as("__f"), xxhash64(col(c)).as("__h"))
        .select(col("__f"), explode(expr(
          s"""transform(sequence(0, ${BloomK - 1}), i ->
             |pmod(shiftrightunsigned(__h, i * 16), $mBits))""".stripMargin)).as("__p"))
        .groupBy(col("__f"), (col("__p") / 64).cast("int").as("__w"))
        .agg(expr("bit_or(shiftleft(1L, CAST(__p % 64 AS INT)))").as("__mask"))
        .collect()
      val byFile = entries.groupBy(_.getString(0)).map { case (uri, rows) =>
        val arr = new Array[Long](words)
        rows.foreach(r => arr(r.getInt(1)) |= r.getLong(2))
        uri.substring(uri.lastIndexOf('/') + 1) -> arr
      }
      c -> byFile
    }.foldLeft(Map.empty[String, Map[String, Array[Long]]]) { case (acc, (c, byFile)) =>
      byFile.foldLeft(acc) { case (a, (f, arr)) =>
        a + (f -> (a.getOrElse(f, Map.empty) + (c -> arr)))
      }
    }
    def b64(arr: Array[Long]): String = {
      val bb = java.nio.ByteBuffer.allocate(arr.length * 8)
      arr.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
    val adds = base.map { a =>
      val name = a.file.substring(a.file.lastIndexOf('/') + 1)
      val bl = perFile.getOrElse(name, Map.empty)
      if (bl.isEmpty) a
      else a.copy(bloom = Some(
        s"""{"mBits":$mBits,"cols":{${bl.toSeq.sortBy(_._1).map { case (c, arr) =>
          s""""${MiniJson.escape(c)}":"${b64(arr)}"""" }.mkString(",")}}}"""))
    }
    casRetry("appendBloom") {
      // same rebase rule as appendImpl: refuse shape drift instead of
      // letting this commit's metaData silently replace the read schema
      val unified = unifiedSchema(root, df.schema, evolve = false, "appendBloom")
      val v = latestVersion(root) + 1
      commit(root, v, "append", adds, Seq.empty,
        schemaJson = Some(unified.json), partCols = pcs)
      v
    }
  }

  /** DELETE WHERE (copy-on-write): remove every row matching `pred` in ONE
    * commit. Two-stage file pruning keeps the rewrite proportional to the
    * data actually hit: stats skipping first (files whose min/max prove no
    * match are never even scanned), then a scan of the candidates finds the
    * files that truly CONTAIN a match — only those are rewritten, with
    * their surviving rows (`pred` false or null) copied forward. Untouched
    * files stay in place; pre-delete versions stay time-travelable. */
  def delete(spark: SparkSession, root: String, pred: Column,
             cdf: Boolean = false): Long = casRetry("delete") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val meta = readMeta(root)
    val pcs = meta.map(_._2).getOrElse(Seq.empty)
    val adds = liveAdds(root, v - 1)
    // on a partitioned table [[pruneAdds]] already prunes whole partitions:
    // partitionValues fold in as point stats, so a partition-equality
    // conjunct drops every other directory before any footer is touched
    val (candidates, _) = pruneAdds(adds, pred,
      meta.map(m => colMapping(m._1)).getOrElse(Map.empty),
      genSchema = meta.map(_._1))
    val touchedRel =
      if (candidates.isEmpty) Seq.empty[String]
      else {
        val cur = readFilesTagged(spark, root, candidates, v - 1)
        val touched = cur.filter(pred).select("_file").distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        if (touched.isEmpty) Seq.empty[String]
        else {
          val inTouched = cur.filter(col("_file").isin(touched: _*))
          val carried = inTouched
            .filter(!coalesce(pred, lit(false)))
            .drop("_file")
          // cdf = true persists the deleted rows as change-data files
          val cdcAdds =
            if (!cdf) Seq.empty[AddFile]
            else writeCdcFiles(
              inTouched.filter(coalesce(pred, lit(false))).drop("_file")
                .withColumn("_change_type", lit("delete")), root, v)
          // survivors were already valid — a delete introduces no rows,
          // so the constraint pass is skipped like OPTIMIZE's
          val rewritten =
            if (pcs.isEmpty) writeDataFiles(carried, root, v, check = false)
            else writePartitionedFiles(carried, root, v, pcs, check = false)
          commit(root, v, "delete", rewritten, touched, partCols = pcs,
            cdc = cdcAdds,
            removeDvs = dvTombstones(
              candidates.filter(a => touched.contains(a.file))))
          touched
        }
      }
    if (touchedRel.isEmpty) // no row matched: still a (file-free) commit,
      commit(root, v, "delete", Seq.empty, Seq.empty) // so the op is audited
    v
  }

  /** MERGE-ON-READ DELETE via deletion vectors: matching rows are MARKED
    * deleted in per-file bitmaps ([[DeletionVectors]]) — the touched data
    * files are re-added unchanged with a `deletionVector` descriptor, and
    * every read filters the marked positions out with an O(1)-per-row
    * probe. This is the write-amplification fix copy-on-write [[delete]]
    * lacks: deleting 0.1% of a 1 GB file commits a few-KB bitmap instead
    * of rewriting the gigabyte — at 100 TB the difference IS the DELETE
    * cost. Trade-off: reads carry the probe until [[optimize]] compacts
    * the file (compaction reads through the DV and drops it).
    *
    * Bitmaps are built DISTRIBUTED: each executor group folds its file's
    * matched row positions into a roaring bitmap; only the serialized
    * bitmaps (KBs) reach the driver, never row data. A file with an
    * existing DV gets the union (already-marked rows can't re-match — the
    * matching scan reads through the current DVs). Stats carry over
    * unchanged: min/max/null bounds stay valid (possibly loose) over the
    * surviving rows, numRecords becomes an upper bound — pruning remains
    * sound. The commit removes and re-adds the SAME path; the fold lands
    * on the re-add (removes order before adds). First use records
    * `delta.enableDeletionVectors=true` and upgrades the mirror protocol
    * to reader 3 / writer 7 with the deletionVectors feature, per the
    * public Delta protocol. `cdf = true` additionally persists the
    * deleted rows as change-data files for the incremental feed. */
  /** Default driver-side budget for per-commit DV blobs (256 MB). The
    * commit is driver-side metadata, so SOME driver residency is inherent
    * — the budget turns "a predicate touching millions of files silently
    * balloons the driver" into a loud, actionable failure instead. */
  private[sources] val DvDriverBudgetBytes: Long = 256L << 20

  /** Fold (file, rowIndex) matches into per-file roaring bitmaps on the
    * EXECUTORS and stream only the serialized blobs to the driver —
    * partition by partition via toLocalIterator, aborting loudly the
    * moment the accumulated bytes cross `budget` (never after the heap is
    * already gone). Shared by [[deleteDv]] and [[mergeDv]]. */
  private[sources] def collectDvBlobs(matched: DataFrame, what: String,
                             budget: Long): Seq[(String, Array[Byte], Long)] = {
    import org.apache.spark.sql.Encoders
    val ds = matched
      .as(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroups { (f, it) =>
        val b = new DeletionVectors.RoaringBitmapArray
        it.foreach(t => b.add(t._2))
        (f, b.serialize(), b.cardinality)
      }(Encoders.tuple(Encoders.STRING, Encoders.BINARY, Encoders.scalaLong))
    val buf = Seq.newBuilder[(String, Array[Byte], Long)]
    var total = 0L
    var n = 0
    val it = ds.toLocalIterator()
    while (it.hasNext) {
      val t = it.next()
      total += t._2.length; n += 1
      require(total <= budget,
        s"$what: deletion-vector blobs for $n+ touched files exceed the " +
          s"driver budget ($total > $budget bytes) — narrow the predicate, " +
          "raise driverDvBudgetBytes, or use the copy-on-write path")
      buf += t
    }
    buf.result()
  }

  def deleteDv(spark: SparkSession, root: String, pred: Column,
               cdf: Boolean = false,
               driverDvBudgetBytes: Long = DvDriverBudgetBytes): Long = casRetry("deleteDv") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val meta = readMeta(root)
    val pcs = meta.map(_._2).getOrElse(Seq.empty)
    val adds = liveAdds(root, v - 1)
    val (candidates, _) = pruneAdds(adds, pred,
      meta.map(m => colMapping(m._1)).getOrElse(Map.empty),
      genSchema = meta.map(_._1))
    val committed =
      if (candidates.isEmpty) false
      else {
        val cur = readFilesTagged(spark, root, candidates, v - 1,
          rowIndex = true)
        val matched = cur.filter(pred)
          .select(col("_file").cast("string"), col("_ri").cast("long"))
        val perFile = collectDvBlobs(matched, "deleteDv", driverDvBudgetBytes)
        if (perFile.isEmpty) false
        else {
          val byFile = candidates.map(a => (a.file, a)).toMap
          val merged = perFile.sortBy(_._1).map { case (f, blob, _) =>
            val bm = DeletionVectors.RoaringBitmapArray.deserialize(blob)
            val a = byFile(f)
            a.dv.foreach(d => bm.or(DeletionVectors.readBitmap(root, d)))
            (a, bm)
          }
          val descs = DeletionVectors.writeDescriptors(root, merged.map(_._2))
          val newAdds = merged.zip(descs).map { case ((a, _), d) =>
            a.copy(dv = Some(d)) }
          val cdcAdds =
            if (!cdf) Seq.empty[AddFile]
            else writeCdcFiles(
              cur.filter(col("_file").isin(perFile.map(_._1).toSeq: _*))
                .filter(coalesce(pred, lit(false)))
                .drop("_file", "_ri")
                .withColumn("_change_type", lit("delete")), root, v)
          // schema + config ride the commit so the first DV use records
          // delta.enableDeletionVectors (idempotent afterwards)
          val cfg = readTableConfig(root)
          val (schemaJson, withCfg) =
            if (cfg.get("delta.enableDeletionVectors").contains("true"))
              (None, None)
            else (readMeta(root).map(_._1.json),
              Some(cfg + ("delta.enableDeletionVectors" -> "true")))
          commit(root, v, "delete-dv", newAdds, newAdds.map(_.file),
            schemaJson = schemaJson, partCols = pcs, cdc = cdcAdds,
            extraConfig = withCfg,
            removeDvs = dvTombstones(merged.map(_._1)))
          true
        }
      }
    if (!committed) // no row matched: still a (file-free) commit,
      commit(root, v, "delete-dv", Seq.empty, Seq.empty) // audited
    v
  }

  /** Apply an UPDATE's SET map to a row frame: assigned columns take
    * their expression (over the OLD row), cast back to the table type so
    * `set cents = cents * 2` can never silently widen the schema;
    * everything else passes through. Shared by [[update]]/[[updateDv]]. */
  private def applySet(df: DataFrame, schema: StructType,
                       set: Map[String, Column]): DataFrame = {
    set.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"UPDATE sets unknown column $c"))
    df.select(schema.fields.toSeq.map { f =>
      set.get(f.name).map(_.cast(f.dataType).as(f.name)).getOrElse(col(f.name))
    }: _*)
  }

  /** UPDATE WHERE (copy-on-write): rows matching `pred` get the `set`
    * expressions applied (each a Column over the OLD row), in ONE commit.
    * Same two-stage pruning as [[delete]]: stats skip the candidates,
    * then only files truly CONTAINING a match rewrite — their unmatched
    * rows copied forward beside the updated images, inside their
    * partition. NULL-predicate rows do not match (SQL UPDATE). Updated
    * images re-validate CHECK constraints (an update can break what the
    * original append proved); a violating update refuses BEFORE anything
    * commits. `cdf = true` persists update pre/post image change files. */
  def update(spark: SparkSession, root: String, pred: Column,
             set: Map[String, Column], cdf: Boolean = false): Long = casRetry("update") {
    require(set.nonEmpty, "UPDATE needs at least one SET column")
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val meta = readMeta(root)
    val pcs = meta.map(_._2).getOrElse(Seq.empty)
    set.keys.foreach(c => require(!pcs.contains(c),
      s"UPDATE of partition column $c is not supported (rows would have " +
        "to move directories — delete + append instead)"))
    val schema = meta.map(_._1).getOrElse(
      sys.error(s"$root has no metaData to update"))
    val adds = liveAdds(root, v - 1)
    val (candidates, _) = pruneAdds(adds, pred,
      meta.map(m => colMapping(m._1)).getOrElse(Map.empty),
      genSchema = meta.map(_._1))
    val touchedRel =
      if (candidates.isEmpty) Seq.empty[String]
      else {
        val cur = readFilesTagged(spark, root, candidates, v - 1)
        val touched = cur.filter(pred).select("_file").distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        if (touched.isEmpty) Seq.empty[String]
        else {
          val inTouched = cur.filter(col("_file").isin(touched: _*))
            .drop("_file")
          val hit = coalesce(pred, lit(false))
          val updated = applySet(inTouched.filter(hit), schema, set)
          val carried = inTouched.filter(!hit)
          val cdcAdds =
            if (!cdf) Seq.empty[AddFile]
            else writeCdcFiles(
              inTouched.filter(hit)
                .withColumn("_change_type", lit("update_preimage"))
                .unionByName(updated
                  .withColumn("_change_type", lit("update_postimage"))),
              root, v)
          // carried rows were already valid; only the updated images need
          // the constraint pass — validate them alone, then write both
          // without a second pass
          validateConstraints(updated, root)
          val out = carried.unionByName(updated)
          val rewritten =
            if (pcs.isEmpty) writeDataFiles(out, root, v, check = false)
            else writePartitionedFiles(out, root, v, pcs, check = false)
          commit(root, v, "update", rewritten, touched, partCols = pcs,
            cdc = cdcAdds,
            removeDvs = dvTombstones(
              candidates.filter(a => touched.contains(a.file))))
          touched
        }
      }
    if (touchedRel.isEmpty) // no row matched: still a (file-free) commit,
      commit(root, v, "update", Seq.empty, Seq.empty) // so the op is audited
    v
  }

  /** MERGE-ON-READ UPDATE via deletion vectors: rows matching `pred` are
    * DV-MARKED in their files and their UPDATED IMAGES (the `set`
    * expressions over the old row) land in NEW files — updating 0.1% of
    * the rows spread over many gigabyte files commits a few-KB bitmap
    * plus the images' own bytes, where copy-on-write [[update]] rewrites
    * every touched file whole. Files whose cumulative deleted fraction
    * (existing DV + newly matched) reaches `rewriteFraction` take the
    * copy-on-write path in the same commit (the [[purgeDeletes]]
    * threshold reused — no purge-bait left behind). Updated images
    * re-validate CHECK constraints before anything commits; `cdf = true`
    * persists pre/post image change files; bitmaps stream to the driver
    * under `driverDvBudgetBytes` ([[collectDvBlobs]]). */
  def updateDv(spark: SparkSession, root: String, pred: Column,
               set: Map[String, Column], cdf: Boolean = false,
               rewriteFraction: Double = 0.1,
               driverDvBudgetBytes: Long = DvDriverBudgetBytes): Long = casRetry("updateDv") {
    require(set.nonEmpty, "UPDATE needs at least one SET column")
    require(rewriteFraction > 0 && rewriteFraction <= 1,
      s"rewriteFraction must be in (0,1], got $rewriteFraction")
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    val meta = readMeta(root)
    val pcs = meta.map(_._2).getOrElse(Seq.empty)
    set.keys.foreach(c => require(!pcs.contains(c),
      s"UPDATE of partition column $c is not supported (rows would have " +
        "to move directories — delete + append instead)"))
    val schema = meta.map(_._1).getOrElse(
      sys.error(s"$root has no metaData to update"))
    val adds = liveAdds(root, v - 1)
    val (candidates, _) = pruneAdds(adds, pred,
      meta.map(m => colMapping(m._1)).getOrElse(Map.empty),
      genSchema = meta.map(_._1))
    val committed =
      if (candidates.isEmpty) false
      else {
        val cur = readFilesTagged(spark, root, candidates, v - 1,
          rowIndex = true)
        val hit = coalesce(pred, lit(false))
        val perFile = collectDvBlobs(
          cur.filter(hit).select(col("_file").cast("string"), col("_ri").cast("long")),
          "updateDv", driverDvBudgetBytes).sortBy(_._1)
        if (perFile.isEmpty) false
        else {
          val byFile = candidates.map(a => (a.file, a)).toMap
          val (dvSide, cowSide) = perFile.partition { case (f, _, card) =>
            val a = byFile(f)
            val old = a.dv.map(_.cardinality).getOrElse(0L)
            a.stats.map(decodeStats(_).numRecords) match {
              case Some(n) if n > 0 => (old + card).toDouble / n < rewriteFraction
              case _                => false // stats-less: rewrite to be safe
            }
          }
          val touchedAll = perFile.map(_._1)
          val inTouched = cur.filter(col("_file").isin(touchedAll: _*))
            .drop("_file", "_ri")
          val updated = applySet(inTouched.filter(hit), schema, set)
          validateConstraints(updated, root)
          val carried = {
            val cowFiles = cowSide.map(_._1)
            if (cowFiles.isEmpty) updated
            else cur.filter(col("_file").isin(cowFiles: _*)).filter(!hit)
              .drop("_file", "_ri").unionByName(updated)
          }
          val cdcAdds =
            if (!cdf) Seq.empty[AddFile]
            else writeCdcFiles(
              inTouched.filter(hit)
                .withColumn("_change_type", lit("update_preimage"))
                .unionByName(updated
                  .withColumn("_change_type", lit("update_postimage"))),
              root, v)
          val dvMerged = dvSide.map { case (f, blob, _) =>
            val bm = DeletionVectors.RoaringBitmapArray.deserialize(blob)
            val a = byFile(f)
            a.dv.foreach(d => bm.or(DeletionVectors.readBitmap(root, d)))
            (a, bm)
          }
          val dvReadds =
            if (dvMerged.isEmpty) Seq.empty[AddFile]
            else DeletionVectors.writeDescriptors(root, dvMerged.map(_._2))
              .zip(dvMerged).map { case (d, (a, _)) => a.copy(dv = Some(d)) }
          val dataAdds =
            if (pcs.isEmpty) writeDataFiles(carried, root, v, check = false)
            else writePartitionedFiles(carried, root, v, pcs, check = false)
          val cfg = readTableConfig(root)
          val withCfg =
            if (dvReadds.isEmpty ||
              cfg.get("delta.enableDeletionVectors").contains("true")) None
            else Some(cfg + ("delta.enableDeletionVectors" -> "true"))
          val touchedSet = touchedAll.toSet
          commit(root, v, "update-dv", dataAdds ++ dvReadds, touchedAll.sorted,
            schemaJson = Some(schema.json), partCols = pcs, cdc = cdcAdds,
            extraConfig = withCfg,
            removeDvs = dvTombstones(candidates.filter(a => touchedSet(a.file))))
          true
        }
      }
    if (!committed) // no row matched: still a (file-free) commit,
      commit(root, v, "update-dv", Seq.empty, Seq.empty) // audited
    v
  }

  /** Change data feed between two committed versions: the keyed row-level
    * diff an incremental consumer applies to stay in sync. Emits the table
    * columns plus `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage (the open CDF vocabulary); unchanged rows emit
    * nothing. Computed as a key-shuffled full-outer join of the two
    * snapshots — the backfill path that needs no stored change files; a
    * streaming CDF would persist per-commit change files at write time
    * (the [[commit]] seam to extend). `keys` must be unique per snapshot. */
  def changeFeed(spark: SparkSession, root: String, fromV: Long, toV: Long,
                 keys: Seq[String]): DataFrame = {
    val o = readVersion(spark, root, fromV)
    val n = readVersion(spark, root, toV)
    val cols = n.columns.toSeq
    val os = o.select(struct(cols.map(col): _*).as("_o"))
    val ns = n.select(struct(cols.map(col): _*).as("_n"))
    val on = keys.map(k => col(s"_o.$k") === col(s"_n.$k")).reduce(_ && _)
    val changed = os.join(ns, on, "full_outer")
      .filter(col("_o").isNull || col("_n").isNull || !(col("_o") <=> col("_n")))
    val events = changed.select(explode(
      when(col("_o").isNull,
        array(struct(col("_n").as("r"), lit("insert").as("t"))))
      .when(col("_n").isNull,
        array(struct(col("_o").as("r"), lit("delete").as("t"))))
      .otherwise(array(
        struct(col("_o").as("r"), lit("update_preimage").as("t")),
        struct(col("_n").as("r"), lit("update_postimage").as("t"))))).as("e"))
    events.select(cols.map(c => col(s"e.r.$c")) :+ col("e.t").as("_change_type"): _*)
  }

  /** INCREMENTAL change data feed over (fromV, toV]: one row per change
    * per COMMIT (table columns + `_change_type` + `_commit_version`),
    * assembled from O(delta) metadata + files — never a snapshot diff:
    *
    *  - append commits synthesize `insert` rows from their own add files;
    *  - merge/delete commits written with `cdf = true` read their
    *    persisted change-data files;
    *  - merge-on-read deletes ([[deleteDv]]) synthesize their deletes
    *    from the BITMAP DELTA (new DV minus the tombstoned instance's) —
    *    O(touched files), no change files needed;
    *  - layout-only commits (OPTIMIZE / ZORDER) emit nothing;
    *  - a row-rewriting commit WITHOUT change files (overwrite, restore,
    *    non-CDF merge/delete): with `keys` provided, DEGRADES to
    *    [[changeFeed]]'s keyed snapshot diff for just that one version
    *    (cost proportional to the two adjacent snapshots, not the range)
    *    — the output then carries a `_change_mode` column
    *    (`cdf`/`append`/`snapshot_diff`) so consumers can see which
    *    commits were reconstructed; without `keys` it fails loudly, as a
    *    consumer with no row identity cannot diff.
    *
    * This is the read side of the streaming-CDF contract: a downstream
    * incremental consumer tails versions and applies exactly each commit's
    * effects, at a cost proportional to what changed. Frames from before a
    * schema evolution are null-backfilled to the widest schema in the
    * range (`unionByName(allowMissingColumns)`). */
  /** The rows one delete-dv commit marked, synthesized from the bitmap
    * delta between each re-added file's new DV and the removed instance's
    * old one (the tombstone carries it). Reads only the touched files and
    * emits only delta-marked positions — the O(delta) CDF merge-on-read
    * deletes get for free, no stored change files. None for a no-match
    * audit commit. */
  /** file → serialized delta bitmap (new DV minus the tombstoned one) of
    * one delete-dv commit — the positions that commit deleted. Shared by
    * the batch CDF and the txn-tail streaming source. */
  private[sources] def dvDeltaBlobs(root: String, v: Long): Map[String, Array[Byte]] = {
    val acts = parseLog(root, v)
    val newAdds = acts.collect { case Action(_, _, "add", a) => a }
    val oldDv = acts.collect { case Action(_, _, "remove", a) => a.file -> a.dv }.toMap
    newAdds.flatMap { a =>
      a.dv.map { d =>
        val bm = DeletionVectors.readBitmap(root, d)
        oldDv.get(a.file).flatten.foreach(od =>
          bm.andNot(DeletionVectors.readBitmap(root, od)))
        a.file -> bm.serialize()
      }
    }.toMap
  }

  private def dvDeltaRows(spark: SparkSession, root: String, v: Long,
                          acts: Seq[Action]): Option[DataFrame] = {
    val newAdds = acts.collect { case Action(_, _, "add", a) => a }
    if (newAdds.isEmpty) return None
    val deltaBlobs = dvDeltaBlobs(root, v)
      .map { case (f, blob) => fileNameOf(f) -> blob }
    if (deltaBlobs.isEmpty) return None
    // scan the touched files WITHOUT their current DVs: the delta rows are
    // deleted now, so the usual alive filter would drop exactly the rows
    // this feed must emit
    val bare = newAdds.map(_.copy(dv = None))
    val taggedScan = readFilesTagged(spark, root, bare, v, rowIndex = true)
    val lookup = new graft.functions.DvLookup(
      spark.sparkContext.broadcast(deltaBlobs))
    val marked = org.apache.spark.sql.GraftColumnExpr.column(
      graft.functions.DvRowDeleted(
        org.apache.spark.sql.GraftColumnExpr.expr(
          regexp_extract(col("_file"), "[^/]+$", 0)),
        org.apache.spark.sql.GraftColumnExpr.expr(col("_ri")), lookup))
    Some(taggedScan.filter(marked).drop("_file", "_ri")
      .withColumn("_change_type", lit("delete"))
      .withColumn("_commit_version", lit(v)))
  }

  def changeFeedIncremental(spark: SparkSession, root: String,
                            fromV: Long, toV: Long,
                            keys: Seq[String] = Seq.empty): DataFrame = {
    require(fromV < toV, s"empty version range ($fromV, $toV]")
    require(toV <= latestVersion(root), s"version $toV does not exist")
    // Frames from different versions union BY NAME — across a RENAME that
    // would silently emit BOTH the old and the new column, each half-null,
    // though they are the same physical column. Project every frame to the
    // RANGE-END logical names through PHYSICAL identity first: a field's
    // physicalName is stable across renames (it defaults to the name for
    // never-renamed columns), so pre-rename `cents` re-labels to `amount`
    // and the feed stays one seamless column. Columns added after v stay
    // absent and null-backfill as before.
    val toPhysToLogical = readMeta(root, toV).map(_._1.fields.iterator
      .map(f => physicalName(f) -> f.name).toMap).getOrElse(Map.empty)
    // change-data files carry PHYSICAL names (like data files) — re-attach
    // the range end's logical names directly off the stable identity
    def physToRangeEnd(df: DataFrame): DataFrame = {
      val renames = df.columns.iterator
        .flatMap(c => toPhysToLogical.get(c).filter(_ != c).map(c -> _)).toMap
      if (renames.isEmpty) df
      else df.select(df.columns.toSeq.map(c =>
        renames.get(c).map(col(c).as(_)).getOrElse(col(c))): _*)
    }
    def toRangeEndNames(df: DataFrame, v: Long): DataFrame = {
      if (toPhysToLogical.isEmpty) return df
      val renames = readMeta(root, v).map(_._1.fields.iterator.flatMap { f =>
        toPhysToLogical.get(physicalName(f)).filter(_ != f.name).map(f.name -> _)
      }.toMap).getOrElse(Map.empty)
      if (renames.isEmpty) df
      else df.select(df.columns.toSeq.map(c =>
        renames.get(c).map(col(c).as(_)).getOrElse(col(c))): _*)
    }
    val perVersion = versions(root).filter(v => v > fromV && v <= toV).flatMap { v =>
      val acts = parseLog(root, v)
      val op = acts.headOption.map(_.op).getOrElse("?")
      val cdcFiles = acts.collect { case Action(_, _, "cdc", a) => a.file }
      val addFiles = acts.collect { case Action(_, _, "add", a) => a }
      val hasRemove = acts.exists(_.action == "remove")
      val layoutOnly = op == "optimize" || op == "optimize-zorder" ||
        op == "optimize-cluster" || op == "purge-deletes" ||
        op == "enable-row-tracking" // metadata re-adds: zero row changes
      def tagged(df: DataFrame, mode: String): DataFrame =
        if (keys.isEmpty) df else df.withColumn("_change_mode", lit(mode))
      val frame: Option[DataFrame] =
      if (layoutOnly || acts.isEmpty) None
      else if (cdcFiles.nonEmpty)
        Some(tagged(physToRangeEnd(
          spark.read.parquet(cdcFiles.map(f => filePath(root, f).toString): _*))
            .withColumn("_commit_version", lit(v)), "cdf"))
      else if (op == "delete-dv")
        // a merge-on-read delete needs NO stored change files: the rows it
        // deleted are exactly the bitmap DELTA (new DV minus the removed
        // instance's DV) of each re-added file — read just those files and
        // keep only delta-marked positions. O(touched files), like cdf.
        dvDeltaRows(spark, root, v, acts).map(df => tagged(df, "dv_delta"))
      else if (!hasRemove && (op == "append" || op.startsWith("append#")))
        Some(tagged(readFiles(spark, root, addFiles, v)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(v)), "append"))
      else if (addFiles.isEmpty && !hasRemove) None // audited no-op commit
      else if (keys.nonEmpty)
        Some(tagged(changeFeed(spark, root, v - 1, v, keys)
          .withColumn("_commit_version", lit(v)), "snapshot_diff"))
      else sys.error(
        s"version $v ($op) rewrites rows without change files; " +
          "pass keys= for a per-version snapshot-diff fallback, " +
          "use changeFeed's snapshot diff, or commit with cdf = true")
      frame.map(toRangeEndNames(_, v))
    }
    require(perVersion.nonEmpty, s"no data-changing commits in ($fromV, $toV]")
    perVersion.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** RESTORE the table to the contents of `toVersion` — a PURE METADATA
    * commit: the restored version's files are re-added (with their
    * original stats/partitionValues/blooms) and the current extras
    * removed; not one byte of data is read or written, which is what
    * makes rollback instant at any table size. History keeps advancing
    * (the restore is itself a new version; the bad versions remain
    * auditable and time-travelable until vacuum). Fails loudly if the
    * target version's files were already vacuumed. */
  def restore(spark: SparkSession, root: String, toVersion: Long): Long = casRetry("restore") {
    val v = latestVersion(root) + 1
    require(v > 0, s"$root is not a TxnTable (no _txn_log)")
    require(toVersion >= 0 && toVersion < v,
      s"cannot restore to version $toVersion (latest ${v - 1})")
    val want = liveAdds(root, toVersion)
    val missing = want.filterNot(a => Files.exists(filePath(root, a.file)))
    require(missing.isEmpty,
      s"restore target $toVersion references vacuumed files: " +
        missing.map(_.file).mkString(", "))
    val curAdds = liveAdds(root, v - 1)
    val curByFile = curAdds.map(a => a.file -> a).toMap
    val wantFiles = want.map(_.file).toSet
    // re-add on ANY difference in the add's state, not just path presence:
    // the same file can be live on both sides with DIFFERENT deletion
    // vectors (a deleteDv between the target and now) — a path-only check
    // would silently keep the current DV and the restore would lie. The
    // superseded instance is explicitly removed first (strict protocol
    // readers reconcile by (path, dvId)), with its descriptor on the
    // tombstone.
    val readds = want.filterNot(a => curByFile.get(a.file).contains(a))
    val dropped = (curByFile.keySet -- wantFiles).toSeq ++
      readds.map(_.file).filter(curByFile.contains)
    commit(root, v, s"restore#$toVersion",
      adds = readds,
      removes = dropped.sorted,
      removeDvs = dvTombstones(dropped.flatMap(curByFile.get)))
    v
  }

  /** Live-file inventory as of a version — the `.files` metadata-table
    * analogue: one row per live file with size, row count, partition
    * values, and the raw stats payload. Pure log fold, no data I/O. */
  /** SYMLINK MANIFEST export (the Hive `SymlinkTextInputFormat` layout
    * the open lakehouse formats generate for Presto/Trino/Athena-class
    * readers): `_symlink_format_manifest/[col=val/...]manifest` text
    * files, one line per live data file's absolute `file:` URI. An
    * external engine that cannot fold the transaction log reads the
    * manifest instead and sees exactly the current snapshot — partition
    * dirs mirror the hive layout so partition pruning still works.
    * FULL regeneration each call (stale manifests are how external
    * readers see ghosts — the old tree is removed first); rerun after
    * every commit that should be visible externally. REFUSED while any
    * live file carries a deletion vector: a manifest can only point at
    * whole files, so exporting one would resurrect deleted rows — run
    * [[purgeDeletes]]/[[optimize]] first (the Delta contract). Returns
    * the manifest files written, root-relative. */
  def generateManifest(root: String): Seq[String] = {
    val last = latestVersion(root)
    require(last >= 0, s"$root is not a TxnTable (no _txn_log)")
    val live = liveAdds(root, last)
    val withDv = live.filter(_.dv.exists(_.cardinality > 0))
    require(withDv.isEmpty,
      s"generateManifest: ${withDv.size} live file(s) carry deletion " +
        "vectors — a symlink manifest cannot express row-level deletes " +
        "and would resurrect them; run purgeDeletes (REORG) first")
    val (_, pcs) = readMeta(root).getOrElse((StructType(Nil), Seq.empty))
    val base = Paths.get(root, "_symlink_format_manifest")
    // full regeneration: remove the previous tree so dropped partitions
    // cannot linger as ghost manifests
    if (Files.isDirectory(base))
      walkClosed(base).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    // a partitioned file's manifest directory is its own hive-encoded
    // `col=val` path segments (written by the partitioned writer); flat
    // tables get the single root manifest
    val groups = live
      .filter(a => !a.stats.exists(decodeStats(_).numRecords == 0L))
      .groupBy { a =>
        if (pcs.isEmpty) ""
        else a.file.split('/').filter(_.contains('=')).mkString("/")
      }
    groups.toSeq.sortBy(_._1).map { case (dir, adds) =>
      val d = if (dir.isEmpty) base else base.resolve(dir)
      Files.createDirectories(d)
      val lines = adds.map(a =>
        filePath(root, a.file).toAbsolutePath.toUri.toString).sorted
      Files.write(d.resolve("manifest"),
        lines.mkString("\n").getBytes(UTF_8))
      Paths.get(root).relativize(d.resolve("manifest")).toString
    }
  }

  def files(spark: SparkSession, root: String, asOf: Long = -1L): DataFrame = {
    import spark.implicits._
    liveAdds(root, asOf).map { a =>
      val n = a.stats.map(decodeStats(_).numRecords)
      (a.file, a.bytes, n.getOrElse(-1L),
        a.partitionValues, a.stats.orNull, a.bloom.isDefined,
        a.dv.map(_.cardinality).getOrElse(0L), a.baseRowId.getOrElse(-1L))
    }.toDF("file", "bytes", "num_records", "partition_values", "stats",
      "has_bloom", "dv_cardinality", "base_row_id")
  }

  /** One-row table summary — the DESCRIBE DETAIL analogue. */
  def detail(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val adds = liveAdds(root, -1L)
    val (schema, pcs) = readMeta(root).getOrElse((StructType(Nil), Seq.empty))
    Seq((latestVersion(root), adds.size.toLong, adds.map(_.bytes).sum,
      adds.flatMap(a => a.stats.map(decodeStats(_).numRecords)).sum,
      pcs.mkString(","), schema.simpleString))
      .toDF("version", "num_files", "size_bytes", "num_records",
        "partition_columns", "schema")
  }

  /** Commit audit: one row per action, the DESCRIBE HISTORY analogue.
    * `ts_millis` is the mirror's commitInfo timestamp (null when a
    * version's mirror entry is unavailable). */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val ts: Map[Long, Option[Long]] = versions(root).map { v =>
      v -> (try Some(commitTimestamp(root, v)) catch { case _: Exception => None })
    }.toMap
    actions(root, -1L)
      .map(x => (x.version, ts.getOrElse(x.version, None),
        x.op, x.action, x.add.file, x.add.bytes, x.add.stats.orNull))
      .toDF("version", "ts_millis", "op", "action", "file", "bytes", "stats")
  }
}
