package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TxnTable

/** MODEL-BASED check of the whole table format: a seeded random sequence
  * of append / overwrite / merge / delete / optimize / zorder ops runs
  * against both the real TxnTable and a trivial in-memory keyed model;
  * after every op the snapshot must equal the model, after the whole run
  * every historical version must time-travel to its model state, random
  * range reads must agree with the model filter through the pruning read
  * path, and a final vacuum must not change the latest snapshot. Layout
  * ops (optimize, zorder) must be invisible throughout. This is the
  * cross-feature interaction net the per-feature specs cannot cast. */
class TxnTableModelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def toDf(rows: Map[Long, Long]) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  private def snap(root: String, asOf: Long = -1L): Map[Long, Long] =
    TxnTable.readVersion(spark, root, asOf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("25 random ops match an in-memory model at every version") {
    import spark.implicits._
    val root = Files.createTempDirectory("txn_model").toString
    val rnd = new scala.util.Random(42)
    var nextId = 0L
    def freshRows(n: Int): Map[Long, Long] =
      (0 until n).map { _ => nextId += 1; nextId -> rnd.nextLong(1000000) }.toMap
    // the value column's CURRENT logical name — a rename op toggles it,
    // stressing name-mode column mapping INTERLEAVED with every DML shape
    var valCol = "v"
    def vdf(rows: Map[Long, Long]) = rows.toSeq.toDF("id", valCol)

    // model(i) = table contents as of version i
    val model = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
    def cur: Map[Long, Long] = model.lastOption.getOrElse(Map.empty)

    val seed = freshRows(50)
    TxnTable.append(vdf(seed).coalesce(2), root)
    model += seed

    val ops = scala.collection.mutable.ArrayBuffer("append(seed)")
    var tracked = false
    for (step <- 1 to 24) {
      // midway, ROW TRACKING switches on — every later op (including
      // CoW rewrites, MoR DML, renames, clustering) must keep ids unique
      // and one-per-row, which is the invariant the per-step check gates
      if (step == 12) {
        TxnTable.enableRowTracking(spark, root)
        model += cur; ops += "enableRowTracking"; tracked = true
      }
      rnd.nextInt(12) match {
        case 0 => // append fresh rows
          val rows = freshRows(20 + rnd.nextInt(30))
          TxnTable.append(vdf(rows).coalesce(1 + rnd.nextInt(2)), root)
          model += cur ++ rows; ops += s"append(${rows.size})"
        case 1 => // overwrite with a fresh set
          val rows = freshRows(30 + rnd.nextInt(20))
          TxnTable.overwrite(vdf(rows), root)
          model += rows; ops += s"overwrite(${rows.size})"
        case 2 => // keyed merge: update a sample of existing + insert fresh
          val updates = rnd.shuffle(cur.keys.toSeq).take(cur.size / 3)
            .map(k => k -> rnd.nextLong(1000000)).toMap
          val inserts = freshRows(10)
          TxnTable.merge(spark, vdf(updates ++ inserts), root, Seq("id"))
          model += cur ++ updates ++ inserts
          ops += s"merge(u=${updates.size},i=${inserts.size})"
        case 3 => // range delete (copy-on-write)
          val ks = cur.keys.toSeq.sorted
          val lo = ks(rnd.nextInt(ks.size)); val hi = lo + rnd.nextInt(40)
          TxnTable.delete(spark, root, col("id") >= lo && col("id") <= hi)
          model += cur.filterNot { case (k, _) => k >= lo && k <= hi }
          ops += s"delete[$lo,$hi]"
        case 4 =>
          TxnTable.optimize(spark, root, targetPartitions = 1 + rnd.nextInt(2))
          model += cur; ops += "optimize"
        case 5 =>
          TxnTable.optimizeZorder(spark, root, "id", valCol,
            targetPartitions = 1 + rnd.nextInt(3))
          model += cur; ops += "zorder"
        case 6 => // range delete (merge-on-read, deletion vectors)
          val ks = cur.keys.toSeq.sorted
          val lo = ks(rnd.nextInt(ks.size)); val hi = lo + rnd.nextInt(40)
          TxnTable.deleteDv(spark, root, col("id") >= lo && col("id") <= hi)
          model += cur.filterNot { case (k, _) => k >= lo && k <= hi }
          ops += s"deleteDv[$lo,$hi]"
        case 7 => // REORG purge: layout-only, may be a no-op (no commit)
          val before = TxnTable.latestVersion(root)
          val after = TxnTable.purgeDeletes(spark, root, minDeletedFraction = 0.05)
          if (after > before) { model += cur; ops += "purge" }
          else ops += "purge(noop)"
        case 8 => // keyed merge-on-read: DV-mark replaced rows, delta in new files
          val updates = rnd.shuffle(cur.keys.toSeq).take(cur.size / 4)
            .map(k => k -> rnd.nextLong(1000000)).toMap
          val inserts = freshRows(5 + rnd.nextInt(10))
          TxnTable.mergeDv(spark, vdf(updates ++ inserts), root, Seq("id"),
            rewriteFraction = 0.3 + rnd.nextDouble() * 0.7)
          model += cur ++ updates ++ inserts
          ops += s"mergeDv(u=${updates.size},i=${inserts.size})"
        case 9 => // range UPDATE, randomly copy-on-write or merge-on-read
          val ks = cur.keys.toSeq.sorted
          val lo = ks(rnd.nextInt(ks.size)); val hi = lo + rnd.nextInt(40)
          val pred = col("id") >= lo && col("id") <= hi
          val setV = Map(valCol -> (col(valCol) + 1000000L))
          val mor = rnd.nextBoolean()
          if (mor) TxnTable.updateDv(spark, root, pred, setV,
            rewriteFraction = 0.3 + rnd.nextDouble() * 0.7)
          else TxnTable.update(spark, root, pred, setV)
          model += cur.map { case (k, v) =>
            k -> (if (k >= lo && k <= hi) v + 1000000L else v) }
          ops += s"${if (mor) "updateDv" else "update"}[$lo,$hi]"
        case 10 => // metadata-only RENAME of the value column (toggles)
          val next = if (valCol == "v") "w" else "v"
          TxnTable.renameColumn(spark, root, valCol, next)
          valCol = next
          model += cur; ops += s"rename(->$valCol)"
        case 11 => // liquid clustering: declare once, incremental passes after
          if (TxnTable.clusteringColumns(root).isEmpty) {
            TxnTable.setClustering(spark, root, Seq("id"))
            model += cur; ops += "setClustering"
          }
          val before = TxnTable.latestVersion(root)
          val after = TxnTable.optimizeCluster(spark, root,
            targetPartitions = 1 + rnd.nextInt(2))
          if (after > before) { model += cur; ops += "cluster" }
          else ops += "cluster(noop)"
      }
      if (tracked) {
        val rids = TxnTable.readWithRowIds(spark, root)
          .select("_row_id").collect().map(_.getLong(0))
        assert(rids.length == cur.size && rids.distinct.length == rids.length,
          s"row ids must stay unique one-per-row after step $step: ${ops.last}")
      }
      assert(snap(root) == cur, s"snapshot diverged after step $step: ${ops.last}")
      // a pruning read must agree with the model filter
      val ks = cur.keys.toSeq.sorted
      if (ks.nonEmpty) {
        val lo = ks(rnd.nextInt(ks.size)); val hi = lo + rnd.nextInt(60)
        val got = TxnTable.readWhere(spark, root, col("id") >= lo && col("id") <= hi)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == cur.filter { case (k, _) => k >= lo && k <= hi },
          s"readWhere diverged after step $step on [$lo,$hi]")
      }
    }
    // every version in history time-travels to its model state
    for (v <- model.indices)
      assert(snap(root, v.toLong) == model(v),
        s"version $v diverged (op ${ops(v)})")
    // vacuum to the latest only: snapshot unchanged, old travel fails loudly
    val latest = TxnTable.latestVersion(root)
    TxnTable.vacuum(root, retainAfter = latest - 1)
    assert(snap(root) == cur, "vacuum must not change the latest snapshot")
  }

  test("PARTITIONED table: 25 random ops including restore match the model") {
    import spark.implicits._
    val root = Files.createTempDirectory("txn_model_part").toString
    val rnd = new scala.util.Random(7)
    var nextId = 0L
    def shard(k: Long): String = s"s${k % 4}"
    def fresh(n: Int): Map[Long, Long] =
      (0 until n).map { _ => nextId += 1; nextId -> rnd.nextLong(1000000) }.toMap
    def toPDf(rows: Map[Long, Long]) =
      rows.toSeq.map { case (k, v) => (k, v, shard(k)) }.toDF("id", "v", "shard")
    def psnap(asOf: Long = -1L): Map[Long, (Long, String)] =
      TxnTable.readVersion(spark, root, asOf).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    def asModel(rows: Map[Long, Long]): Map[Long, (Long, String)] =
      rows.map { case (k, v) => k -> ((v, shard(k))) }

    val model = scala.collection.mutable.ArrayBuffer.empty[Map[Long, Long]]
    def cur: Map[Long, Long] = model.lastOption.getOrElse(Map.empty)
    val seed = fresh(60)
    TxnTable.appendPartitioned(toPDf(seed).coalesce(2), root, Seq("shard"))
    model += seed
    val ops = scala.collection.mutable.ArrayBuffer("append(seed)")

    for (step <- 1 to 24) {
      rnd.nextInt(6) match {
        case 0 =>
          val rows = fresh(15 + rnd.nextInt(25))
          TxnTable.appendPartitioned(toPDf(rows).coalesce(1), root, Seq("shard"))
          model += cur ++ rows; ops += s"append(${rows.size})"
        case 1 => // partition-keyed merge: keys ⊇ partition cols
          val updates = rnd.shuffle(cur.keys.toSeq).take(cur.size / 3)
            .map(k => k -> rnd.nextLong(1000000)).toMap
          val inserts = fresh(8)
          TxnTable.merge(spark, toPDf(updates ++ inserts), root,
            Seq("id", "shard"), cdf = rnd.nextBoolean())
          model += cur ++ updates ++ inserts
          ops += s"merge(u=${updates.size},i=${inserts.size})"
        case 2 => // id-range delete across partitions
          val ks = cur.keys.toSeq.sorted
          val lo = ks(rnd.nextInt(ks.size)); val hi = lo + rnd.nextInt(30)
          TxnTable.delete(spark, root, col("id") >= lo && col("id") <= hi,
            cdf = rnd.nextBoolean())
          model += cur.filterNot { case (k, _) => k >= lo && k <= hi }
          ops += s"delete[$lo,$hi]"
        case 3 => // shard-scoped delete: the partition-pruned rewrite path
          val sh = s"s${rnd.nextInt(4)}"
          val ks = cur.keys.toSeq.sorted
          val lo = ks(rnd.nextInt(ks.size)); val hi = lo + rnd.nextInt(50)
          TxnTable.delete(spark, root,
            col("shard") === sh && col("id") >= lo && col("id") <= hi)
          model += cur.filterNot { case (k, _) =>
            shard(k) == sh && k >= lo && k <= hi }
          ops += s"delete($sh,[$lo,$hi])"
        case 4 =>
          TxnTable.optimize(spark, root, targetPartitions = 1 + rnd.nextInt(2))
          model += cur; ops += "optimize"
        case 5 => // metadata-only rollback to a random earlier version
          val t = rnd.nextInt(model.size)
          TxnTable.restore(spark, root, t.toLong)
          model += model(t); ops += s"restore($t)"
      }
      assert(psnap() == asModel(cur),
        s"partitioned snapshot diverged after step $step: ${ops.last}")
      // a partition-pruned range read agrees with the model filter
      if (cur.nonEmpty) {
        val sh = s"s${rnd.nextInt(4)}"
        val ks = cur.keys.toSeq.sorted
        val lo = ks(rnd.nextInt(ks.size)); val hi = lo + rnd.nextInt(60)
        val got = TxnTable.readWhere(spark, root,
          col("shard") === sh && col("id") >= lo && col("id") <= hi)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == cur.filter { case (k, _) =>
          shard(k) == sh && k >= lo && k <= hi },
          s"partitioned readWhere diverged after step $step ($sh,[$lo,$hi])")
      }
    }
    for (v <- model.indices)
      assert(psnap(v.toLong) == asModel(model(v)),
        s"partitioned version $v diverged (op ${ops(v)})")
  }

  test("concurrent mixed writers: merges rebase through the CAS and nothing is lost") {
    import spark.implicits._
    val root = Files.createTempDirectory("txn_race").toString
    // seed: 4 writer lanes × 20 keys, value 0
    val lanes = 4
    val seed = (0 until lanes).flatMap(l =>
      (0 until 20).map(i => (l * 100L + i) -> 0L)).toMap
    TxnTable.append(toDf(seed), root)
    // each lane concurrently (a) merges ITS OWN keys to value lane+1 and
    // (b) appends 5 fresh lane-tagged rows — losers must rebase and re-run
    // their read-modify-write bodies, so no lane's effect can vanish
    val pool = java.util.concurrent.Executors.newFixedThreadPool(lanes)
    val futs = (0 until lanes).map { l =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          val updates = (0 until 20).map(i => (l * 100L + i) -> (l + 1L)).toMap
          TxnTable.merge(spark, toDf(updates), root, Seq("id"))
          val fresh = (0 until 5).map(i => (1000L + l * 10 + i) -> (l + 1L)).toMap
          TxnTable.append(toDf(fresh), root)
        }
      })
    }
    futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    // versions are dense 0..8 (1 seed + 4 merges + 4 appends, any order)
    assert(TxnTable.latestVersion(root) == 8L)
    val got = snap(root)
    val want = (0 until lanes).flatMap { l =>
      (0 until 20).map(i => (l * 100L + i) -> (l + 1L)) ++
        (0 until 5).map(i => (1000L + l * 10 + i) -> (l + 1L))
    }.toMap
    assert(got == want, "a racing writer's effect was lost or duplicated")
  }
}
