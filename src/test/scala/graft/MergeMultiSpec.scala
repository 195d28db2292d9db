package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import graft.sources.{MergeClause, TxnTable}
import graft.sources.MergeClause._

/** Multi-clause MERGE semantics: clause ordering, conditional
  * update/delete/insert, NOT MATCHED BY SOURCE, the cardinality guard,
  * copy-on-write vs merge-on-read file behavior, and per-clause CDF. */
class MergeMultiSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tbl(): String = Files.createTempDirectory("mm_tbl").toString

  private def target(root: String): Unit = {
    import spark.implicits._
    // ids 1..10, val = id*10, grp = even/odd
    TxnTable.append((1 to 10).map(i =>
      (i.toLong, i * 10L, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "v", "grp").repartition(3), root)
  }

  private def src() = {
    import spark.implicits._
    // ids 5..14, sval = id*1000
    (5 to 14).map(i => (i.toLong, i * 1000L)).toDF("id", "sval")
  }

  private def rows(root: String): Map[Long, (Long, String)] =
    TxnTable.read(spark, root).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) Long.MinValue else r.getLong(1)), r.getString(2))).toMap

  test("all five clause kinds compose, first-match-wins within a group") {
    val root = tbl(); target(root)
    TxnTable.mergeMulti(spark, root, src(),
      condition = col("t.id") === col("s.id"),
      matched = Seq(
        // first clause claims even matched rows, second the rest
        Update(Some(col("t.grp") === "even"),
          Map("v" -> (col("s.sval") + col("t.v")))),
        Delete(Some(col("s.sval") > 8000L)), // odd matched with sval>8000
        Update(None, Map("v" -> lit(-1L)))), // remaining odd matched
      notMatched = Seq(
        Insert(Some(col("s.id") <= 12L),
          Map("id" -> col("s.id"), "v" -> col("s.sval"),
            "grp" -> lit("new"))),
        Insert(None, Map("id" -> col("s.id"), "grp" -> lit("tail")))),
      notMatchedBySource = Seq(
        Delete(Some(col("t.id") === 1L)),
        Update(Some(col("t.id") === 2L), Map("grp" -> lit("stale")))))
    val got = rows(root)
    // matched evens 6,8,10: v = sval + old v
    assert(got(6L) == (6060L, "even") && got(8L) == (8080L, "even") &&
      got(10L) == (10100L, "even"))
    // matched odds with sval>8000: 9 deleted; 5,7 -> v=-1
    assert(!got.contains(9L))
    assert(got(5L)._1 == -1L && got(7L)._1 == -1L)
    // not matched 11,12 insert with grp=new; 13,14 hit INSERT * and its
    // missing-column check would have thrown — the conditional routed
    // them to clause 1 only for id<=12, so 13,14 must NOT exist...
    assert(got.get(11L).contains((11000L, "new")))
    assert(got.get(12L).contains((12000L, "new")))
    // 13,14 fell through to the unconditional tail insert (v null)
    val tail = TxnTable.read(spark, root).filter(col("grp") === "tail")
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).sortBy(_._1)
    assert(tail.toSeq == Seq((13L, true), (14L, true)))
    // by-source: 1 deleted, 2 got grp=stale, 3,4 untouched
    assert(!got.contains(1L))
    assert(got(2L) == (20L, "stale"))
    assert(got(3L) == (30L, "odd") && got(4L) == (40L, "even"))
  }

  test("INSERT * falls through when an earlier conditional insert matches") {
    import spark.implicits._
    val root = tbl(); target(root)
    // source carries exactly the table columns so INSERT * is legal
    val s2 = (9 to 12).map(i => (i.toLong, i * 1000L, "star"))
      .toDF("id", "v", "grp")
    TxnTable.mergeMulti(spark, root, s2,
      condition = col("t.id") === col("s.id"),
      notMatched = Seq(
        Insert(Some(col("s.id") === 11L),
          Map("id" -> col("s.id"), "grp" -> lit("explicit"))),
        InsertAll(None)))
    val got = rows(root)
    assert(got(11L)._2 == "explicit")
    assert(got(11L)._1 == Long.MinValue) // unmentioned column inserts NULL
    assert(got(12L) == (12000L, "star"))
    // matched rows (9, 10) untouched: no matched clauses
    assert(got(9L) == (90L, "odd") && got(10L) == (100L, "even"))
  }

  test("cardinality guard: duplicate source matches fail loudly") {
    import spark.implicits._
    val root = tbl(); target(root)
    val dup = Seq((5L, 1L), (5L, 2L)).toDF("id", "k")
    val e = intercept[IllegalArgumentException] {
      TxnTable.mergeMulti(spark, root, dup,
        condition = col("t.id") === col("s.id"),
        matched = Seq(Delete(None)))
    }
    assert(e.getMessage.contains("matched multiple source rows"))
    // insert-only merges tolerate duplicate matches (nothing rewrites)
    TxnTable.mergeMulti(spark, root, dup,
      condition = col("t.id") === col("s.id"),
      notMatched = Seq(Insert(None, Map("id" -> col("s.k")))))
    assert(rows(root).size == 10) // both dup rows matched; no inserts
  }

  test("copy-on-write rewrites only files containing applying rows") {
    import spark.implicits._
    val root = tbl()
    // range-clustered: ids 1..100 in 5 disjoint files
    TxnTable.append((1 to 100).map(i => (i.toLong, i * 10L, "g"))
      .toDF("id", "v", "grp").repartitionByRange(5, col("id")), root)
    val before = FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSet
    TxnTable.mergeMulti(spark, root,
      Seq((3L, 1L)).toDF("id", "k"),
      condition = col("t.id") === col("s.id"),
      matched = Seq(Update(None, Map("v" -> lit(0L)))))
    val after = FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSet
    // exactly one new rewrite dir; the other four files untouched
    assert(before.subsetOf(after))
    val report = TxnTable.files(spark, root).collect().map(_.getString(0))
    assert(report.count(f => before.exists(_.toString.endsWith(f))) == 4,
      report.mkString(","))
    assert(TxnTable.read(spark, root).filter(col("id") === 3L)
      .head.getLong(1) == 0L)
    assert(TxnTable.read(spark, root).count() == 100L)
  }

  test("merge-on-read: lightly-hit files take DVs, images land in new files") {
    import spark.implicits._
    val root = tbl()
    TxnTable.append((1 to 100).map(i => (i.toLong, i * 10L, "g"))
      .toDF("id", "v", "grp").repartitionByRange(4, col("id")), root)
    val before = FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p -> Files.getLastModifiedTime(p)).toMap
    TxnTable.mergeMulti(spark, root,
      (1 to 8).map(i => (i * 10L, i * 100000L)).toDF("id", "nv"),
      condition = col("t.id") === col("s.id"),
      matched = Seq(
        Update(Some(col("s.nv") <= 500000L), Map("v" -> col("s.nv"))),
        Delete(None)),
      notMatched = Seq(Insert(None,
        Map("id" -> col("s.id"), "v" -> col("s.nv"), "grp" -> lit("ins")))),
      mor = true, rewriteFraction = 0.5)
    val after = FsTest.walk(Paths.get(root, "data")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p -> Files.getLastModifiedTime(p)).toMap
    assert(before.forall { case (p, t) => after.get(p).contains(t) },
      "MoR merge must not rewrite lightly-hit files")
    val got = rows(root)
    // ids 10..50 updated to nv; 60,70,80 deleted; nothing inserted (all matched)
    (1 to 5).foreach(i => assert(got(i * 10L)._1 == i * 100000L))
    Seq(60L, 70L, 80L).foreach(id => assert(!got.contains(id)))
    assert(got.size == 97)
    // and DVs are live in the snapshot
    assert(TxnTable.liveAddsForTest(root).exists(_.dv.isDefined))
  }

  test("CDF records the right change type per clause, both flavors") {
    import spark.implicits._
    for (mor <- Seq(false, true)) {
      val root = tbl(); target(root)
      TxnTable.mergeMulti(spark, root, src(),
        condition = col("t.id") === col("s.id"),
        matched = Seq(
          Update(Some(col("t.grp") === "even"), Map("v" -> col("s.sval"))),
          Delete(None)),
        notMatched = Seq(Insert(Some(col("s.id") <= 11L),
          Map("id" -> col("s.id"), "v" -> col("s.sval"), "grp" -> lit("n")))),
        notMatchedBySource = Seq(Delete(Some(col("t.id") === 1L))),
        cdf = true, mor = mor)
      val feed = TxnTable.changeFeedIncremental(spark, root, 0L, 1L)
      val byType = feed.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // evens 6,8,10 update (pre+post), odds 5,7,9 delete, id 1 by-source
      // delete, id 11 insert
      assert(byType.get("update_preimage").contains(3L), s"mor=$mor $byType")
      assert(byType.get("update_postimage").contains(3L), s"mor=$mor $byType")
      assert(byType.get("delete").contains(4L), s"mor=$mor $byType")
      assert(byType.get("insert").contains(1L), s"mor=$mor $byType")
      // post-state identical across flavors
      val got = rows(root)
      assert(got(6L)._1 == 6000L && got(8L)._1 == 8000L && got(10L)._1 == 10000L)
      assert(Seq(5L, 7L, 9L, 1L).forall(!got.contains(_)))
      assert(got(11L) == (11000L, "n"))
      assert(got.size == 7)
    }
  }

  test("by-source-only merge classifies every target row without O(table) state") {
    import spark.implicits._
    val root = tbl(); target(root)
    TxnTable.mergeMulti(spark, root,
      (5 to 7).map(i => Tuple1(i.toLong)).toDF("id"),
      condition = col("t.id") === col("s.id"),
      notMatchedBySource = Seq(Delete(None)))
    // only rows present in the source survive
    assert(rows(root).keySet == Set(5L, 6L, 7L))
  }

  test("by-source-only merge: multi-matched carried rows commit exactly once") {
    import spark.implicits._
    val root = tbl(); target(root)
    // ids 5,6 each match THREE source rows; no MATCHED clause exists, so
    // the cardinality guard does not run — the rewrite must still carry
    // each matched target row once, not once per source match
    val dup = (5 to 6).flatMap(i => (1 to 3).map(k => (i.toLong, k.toLong)))
      .toDF("id", "k")
    TxnTable.mergeMulti(spark, root, dup,
      condition = col("t.id") === col("s.id"),
      notMatchedBySource = Seq(
        Delete(Some(col("t.id") === 1L)),
        Update(Some(col("t.id") === 2L), Map("v" -> lit(999L)))))
    val got = TxnTable.read(spark, root).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(got.values.forall(_ == 1), s"duplicated carried rows: $got")
    assert(!got.contains(1L) && got.keySet == (2L to 10L).toSet)
    assert(rows(root)(2L)._1 == 999L)
    assert(rows(root)(5L) == (50L, "odd") && rows(root)(6L) == (60L, "even"))
  }

  test("merge-on-read by-source-only: multi-matched rows in rewritten files stay single") {
    import spark.implicits._
    val root = tbl(); target(root)
    val dup = (5 to 6).flatMap(i => (1 to 3).map(k => (i.toLong, k.toLong)))
      .toDF("id", "k")
    // rewriteFraction=0 is illegal; tiny fraction forces the CoW side of
    // the MoR split for every hit file, exercising the same dedup path
    TxnTable.mergeMulti(spark, root, dup,
      condition = col("t.id") === col("s.id"),
      notMatchedBySource = Seq(Delete(Some(col("t.id") <= 2L))),
      mor = true, rewriteFraction = 1e-9)
    val got = TxnTable.read(spark, root).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(got.values.forall(_ == 1), s"duplicated carried rows: $got")
    assert(got.keySet == (3L to 10L).toSet)
  }

  test("UPDATE SET with an unknown column fails loudly, not silently") {
    import spark.implicits._
    val root = tbl(); target(root)
    val e = intercept[IllegalArgumentException] {
      TxnTable.mergeMulti(spark, root, src(),
        condition = col("t.id") === col("s.id"),
        matched = Seq(Update(None, Map("vv" -> lit(1L)))))
    }
    assert(e.getMessage.contains("unknown column vv"))
    val e2 = intercept[IllegalArgumentException] {
      TxnTable.mergeMulti(spark, root, src(),
        condition = col("t.id") === col("s.id"),
        notMatchedBySource = Seq(Update(None, Map("nope" -> lit(1L)))))
    }
    assert(e2.getMessage.contains("unknown column nope"))
  }

  test("WITH SCHEMA EVOLUTION: * actions add source columns in ONE commit") {
    import spark.implicits._
    val root = tbl(); target(root) // (id, v, grp)
    val s2 = (9 to 12).map(i => (i.toLong, i * 1000L, "star", s"tag$i"))
      .toDF("id", "v", "grp", "tag")
    TxnTable.mergeMulti(spark, root, s2,
      condition = col("t.id") === col("s.id"),
      matched = Seq(UpdateAll(None)),
      notMatched = Seq(InsertAll(None)),
      schemaEvolution = true)
    assert(TxnTable.latestVersion(root) == 1L,
      "evolution must ride the merge commit, not a separate version")
    assert(TxnTable.read(spark, root).columns.toSeq == Seq("id", "v", "grp", "tag"))
    val got = TxnTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got(9L).contains("tag9") && got(10L).contains("tag10"))
    assert(got(11L).contains("tag11") && got(12L).contains("tag12"))
    assert(got(1L).isEmpty && got(8L).isEmpty, "carried rows read null")
    // time travel below the merge still has the old schema
    assert(TxnTable.readVersion(spark, root, 0L).columns.toSeq ==
      Seq("id", "v", "grp"))
  }

  test("WITH SCHEMA EVOLUTION: same-named assignments evolve; unknown names " +
    "still refuse") {
    import spark.implicits._
    val root = tbl(); target(root)
    val s2 = (5 to 6).map(i => (i.toLong, s"n$i")).toDF("id", "note")
    TxnTable.mergeMulti(spark, root, s2,
      condition = col("t.id") === col("s.id"),
      matched = Seq(Update(None, Map("note" -> col("s.note")))),
      schemaEvolution = true)
    val got = TxnTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got(5L).contains("n5") && got(6L).contains("n6"))
    assert(got(1L).isEmpty)
    // a new column the source does not carry cannot infer a type — loud
    val e = intercept[IllegalArgumentException] {
      TxnTable.mergeMulti(spark, root, s2,
        condition = col("t.id") === col("s.id"),
        matched = Seq(Update(None, Map("other" -> lit(1L)))),
        schemaEvolution = true)
    }
    assert(e.getMessage.contains("unknown column other"))
  }

  test("no-op merge commits an audited empty version") {
    import spark.implicits._
    val root = tbl(); target(root)
    val v = TxnTable.mergeMulti(spark, root,
      Seq(Tuple1(999L)).toDF("id"),
      condition = col("t.id") === col("s.id"),
      matched = Seq(Delete(None)))
    assert(v == 1L)
    assert(TxnTable.read(spark, root).count() == 10L)
    assert(TxnTable.latestVersion(root) == 1L)
  }

  test("partitioned table: merge images stay in their partitions") {
    import spark.implicits._
    val root = tbl()
    val d = (1 to 60).map(i => (i.toLong, i * 10L, s"p${i % 3}"))
      .toDF("id", "v", "grp")
    TxnTable.appendPartitioned(d, root, Seq("grp"))
    TxnTable.mergeMulti(spark, root,
      (55 to 65).map(i => (i.toLong, i * 7L)).toDF("id", "nv"),
      condition = col("t.id") === col("s.id"),
      matched = Seq(Update(None, Map("v" -> col("s.nv")))),
      notMatched = Seq(Insert(None,
        Map("id" -> col("s.id"), "v" -> col("s.nv"), "grp" -> lit("p9")))))
    val got = TxnTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    (55 to 60).foreach(i => assert(got(i.toLong) == (i * 7L, s"p${i % 3}")))
    (61 to 65).foreach(i => assert(got(i.toLong) == (i * 7L, "p9")))
    assert(got.size == 65)
    // partition directories hold the new images
    assert(Files.isDirectory(Paths.get(root).resolve(
      FsTest.walk(Paths.get(root, "data")).iterator().asScala
        .find(p => p.toString.contains("grp=p9"))
        .map(_ => Paths.get(root, "data")).get.getFileName).getParent))
  }
}
