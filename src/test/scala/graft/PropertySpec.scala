package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.CommuteValidation
import graft.streaming.CdcIngest

/** Property-based tests (SURVEY §5): generator/validation/envelope logic
  * under arbitrary inputs, evaluated in ONE Spark pass per property (cases
  * are generated as a batch, not one job per sample).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Deterministic draw: every property samples from a fixed seed so a run
    * never depends on the JVM's RNG (SURVEY §7.4 risk 4 — the suite bans
    * nondeterminism, so the generators must not smuggle it back in).
    */
  private def sampled[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  case class Env(id: Option[Int], emp: Int, us: Long, sport: String,
                 dist: Option[Double], dur: Int, comment: Option[String])

  val genEnv: Gen[Env] = for {
    id <- Gen.option(Gen.choose(1, 1000000))
    emp <- Gen.choose(1, 161)
    us <- Gen.choose(1500000000000000L, 1800000000000000L)
    sport <- Gen.oneOf(graft.gen.ActivityGen.SportTypes)
    dist <- Gen.option(Gen.choose(0.0, 60000.0))
    dur <- Gen.choose(0, 20000)
    comment <- Gen.option(Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("séance \"top\" !", "a\\b", "tab\there", "élan")))
  } yield Env(id, emp, us, sport, dist, dur, comment)

  test("envelope parse round-trips arbitrary activities; null ids are dropped") {
    import spark.implicits._
    // Distinct ids: the round-trip lookup below is keyed by id, so two
    // envelopes sharing one would shadow each other in `byId` and the
    // assert would compare unrelated cases. Keep the first case per id.
    val drawn = sampled(Gen.listOfN(300, genEnv), 0xE17L)
    val seenIds = scala.collection.mutable.Set.empty[Int]
    val cases = drawn.filter(e => e.id.forall(seenIds.add))
    val jsons = cases.map { e =>
      s"""{"payload": {"after": {"id": ${e.id.map(_.toString).getOrElse("null")}, "id_employee": ${e.emp}, "start_datetime": ${e.us}, "sport_type": ${jsonStr(e.sport)}, "distance": ${e.dist.map(_.toString).getOrElse("null")}, "activity_duration": ${e.dur}, "comment": ${e.comment.map(jsonStr).getOrElse("null")}}}}"""
    }
    val parsed = CdcIngest.parseEnvelope(jsons.toDF("value")).collect()
    val expected = cases.filter(_.id.isDefined)
    assert(parsed.length == expected.length) // P4 drops null-id envelopes
    val byId = parsed.map(r => r.getAs[Int]("id") -> r).toMap
    expected.foreach { e =>
      val r = byId(e.id.get)
      assert(r.getAs[Int]("id_employee") == e.emp)
      assert(r.getAs[String]("sport_type") == e.sport)
      assert(Option(r.getAs[java.lang.Double]("distance")).map(_.toDouble) == e.dist)
      assert(Option(r.getAs[String]("comment")) == e.comment)
      // epoch-µs → second-truncated formatted string
      val expectTs = java.time.Instant.ofEpochSecond(e.us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      assert(r.getAs[String]("start_datetime") == expectTs)
    }
  }

  val genEmployee: Gen[(Int, String, String)] = for {
    id <- Gen.choose(1, 100000)
    mode <- Gen.oneOf("Marche/running", "Vélo/Trottinette/Autres",
      "Transports en commun", "véhicule thermique/électrique", "Téléportation")
    addr <- Gen.alphaNumStr.map(s => s"$s rue test")
  } yield (id, mode, addr)

  test("commute validation invariants hold for arbitrary employees") {
    import spark.implicits._
    val rows = sampled(Gen.listOfN(300, genEmployee), 0xC0117L).distinctBy(_._1)
    val employees = rows.toDF("id_employee", "transport_mode", "address")
    val v = CommuteValidation.validate(employees).cache()
    val joined = v.join(employees, "id_employee").cache()
    // valid ⇒ sporty mode AND distance within limit
    val sporty = CommuteValidation.TransportLimits.keys.toSeq
    assert(joined.filter($"is_valid" && !$"transport_mode".isin(sporty: _*)).count() == 0)
    assert(joined.filter($"is_valid" &&
      ($"calculed_distance".isNull ||
        ($"transport_mode" === "Marche/running" && $"calculed_distance" > 15000) ||
        ($"transport_mode" === "Vélo/Trottinette/Autres" && $"calculed_distance" > 25000)))
      .count() == 0)
    // error_message present iff invalid; non-sporty always 'non sportif'
    assert(joined.filter($"is_valid" === $"error_message".isNotNull).count() == 0)
    assert(joined.filter(!$"transport_mode".isin(sporty: _*) &&
      !$"error_message".contains("non sportif")).count() == 0)
    // exactly one validation row per employee
    assert(v.count() == rows.length)
    v.unpersist(); joined.unpersist()
  }

  test("as-of join equals the naive per-row reference on arbitrary event sets") {
    import spark.implicits._
    import java.sql.Timestamp
    // random purchases/signups over a small key+time domain to force
    // collisions, equal timestamps, and users with no prior signup
    val genRow = for {
      user <- Gen.choose(1L, 6L)
      sec <- Gen.choose(0L, 500L)
    } yield (user, sec)
    val purchases = sampled(Gen.listOfN(150, genRow), 0xA50FL).zipWithIndex
      .map { case ((u, s), i) => (i.toLong, u, new Timestamp(1700000000000L + s * 1000)) }
    val signups = sampled(Gen.listOfN(40, genRow), 0x516L).zipWithIndex
      .map { case ((u, s), i) => (1000L + i, u, new Timestamp(1700000000000L + s * 1000)) }
    val pDf = purchases.toDF("event_id", "user_id", "ts")
    // dedupe signups per (user, ts) keeping max id — the operator's contract
    val sDeduped = signups.groupBy(x => (x._2, x._3.getTime))
      .map { case (_, xs) => xs.maxBy(_._1) }.toSeq
    val sDf = sDeduped.toDF("event_id", "user_id", "ts")
      .select($"user_id", $"ts", $"event_id".as("signup_id"))
    val got = graft.operators.Temporal
      .asofJoin(pDf, sDf, "user_id", "ts", Seq("signup_id"))
      .select($"event_id", $"signup_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    // naive reference: scan all signups per purchase
    purchases.foreach { case (pid, u, pts) =>
      val candidates = sDeduped.filter(s => s._2 == u && !s._3.after(pts))
      val expected = if (candidates.isEmpty) None
        else Some(candidates.maxBy(s => (s._3.getTime, s._1))._1)
      assert(got(pid) == expected, s"purchase $pid user $u ts $pts")
    }
  }

  test("range join equals the naive per-row window count on arbitrary events") {
    import spark.implicits._
    import java.nio.file.Files
    import java.sql.Timestamp
    // random errors/purchases in a 3h span so windows straddle bucket edges
    val genEv = for {
      user <- Gen.choose(1L, 5L)
      sec <- Gen.choose(0L, 10800L)
      typ <- Gen.oneOf("error", "purchase", "signup")
    } yield (user, sec, typ)
    val rows = sampled(Gen.listOfN(200, genEv), 0x7A27EL).zipWithIndex.map {
      case ((u, sec, typ), i) =>
        (i.toLong, new Timestamp(1704067200000L + sec * 1000), u, typ, 0.0, "{}")
    }
    val dir = Files.createTempDirectory("range_prop").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Temporal.rangeJoinCount(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val purchases = rows.filter(_._4 == "purchase")
    rows.filter(_._4 == "error").foreach { case (eid, ets, u, _, _, _) =>
      val expected = purchases.count(p => p._3 == u &&
        p._2.getTime >= ets.getTime && p._2.getTime < ets.getTime + 3600000L)
      assert(got(eid) == expected, s"error $eid user $u ts $ets")
    }
  }

  test("cluster resolution equals driver-side union-find on the same pairs") {
    import spark.implicits._
    import java.nio.file.Files
    // random docs drawn from a tiny phrase pool → many exact/near dup groups
    val pool = Vector(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs every single day now",
      "how vexingly quick daft zebras jump over the fence at dawn",
      "sphinx of black quartz judge my vow before the night falls")
    val docs = sampled(Gen.listOfN(30, Gen.choose(0, pool.size - 1)), 0xCCL)
      .zipWithIndex.map { case (p, i) => (i.toLong, pool(p), "en", "s", 1L) }
    val dir = Files.createTempDirectory("cc_prop").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Dedup.dedupMinhashLsh(spark, dir)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = graft.operators.Dedup.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find over the identical pair set
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> find(id)).toMap
    assert(got == expected)
  }

  test("star contraction resolves a 50-node path graph in logarithmic rounds") {
    import spark.implicits._
    // the adversarial shape for min-label propagation: one long chain.
    // Plain propagation needs diameter (49) rounds; alternating
    // large-star/small-star must stay around 2·log₂(50) + 1 detection round.
    val pairs = (0L until 49L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = graft.operators.Dedup.resolveClusters(pairs)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 50)
    assert(got.forall(_._2 == 0L), s"all 50 nodes must label to the chain min")
    assert(got.count(_._3) == 1)
    assert(rounds <= 12, s"path-50 took $rounds star rounds")
  }

  test("star contraction equals union-find on a seeded 500-node random graph") {
    import spark.implicits._
    // denser and more tangled than any LSH output: random edges produce
    // components of mixed shapes (chains, fans, blobs) in one graph
    val genEdge = for {
      a <- Gen.choose(0L, 499L); b <- Gen.choose(0L, 499L)
    } yield (math.min(a, b), math.max(a, b))
    val pairs = sampled(Gen.listOfN(800, genEdge), 0x6EAFL)
      .filter(e => e._1 != e._2).distinct
    val (labels, rounds) = graft.operators.Dedup.resolveClusters(
      pairs.toDF("doc_a", "doc_b"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> find(id)).toMap
    assert(got == expected)
    assert(rounds <= 12, s"random-500 took $rounds star rounds")
  }

  test("z-order interleave is a bijection and monotone per dimension") {
    import spark.implicits._
    import graft.operators.ZOrder
    val pairs = sampled(Gen.listOfN(300,
      Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))), 0x30L)
    val df = pairs.toDF("xk", "yk")
      .selectExpr("xk", "yk", s"${ZOrder.zExprSpark("xk", "yk")} AS z")
    // bijection: de-interleave (even bits → x, odd bits → y) recovers the pair
    val deX = (0 until 16).map(i => s"shiftleft(shiftright(z, ${2 * i}) & 1, $i)").mkString(" + ")
    val deY = (0 until 16).map(i => s"shiftleft(shiftright(z, ${2 * i + 1}) & 1, $i)").mkString(" + ")
    val bad = df.selectExpr("xk", "yk", s"$deX AS x2", s"$deY AS y2")
      .filter($"xk" =!= $"x2" || $"yk" =!= $"y2").count()
    assert(bad == 0, "de-interleave must invert the Morton code")
    // monotone in x for fixed y (and vice versa): order by z = order by x
    val rows = pairs.map { case (x, y) => (x, y) }.distinct
    val fixedY = rows.groupBy(_._2).values.filter(_.size >= 2)
    val zOf = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    fixedY.foreach { grp =>
      val sortedByX = grp.map(_._1).distinct.sorted
      val zs = sortedByX.map(x => zOf((x, grp.head._2)))
      assert(zs == zs.sorted, "z must be monotone in x when y is fixed")
    }
  }

  test("expectations count injected violations exactly") {
    import spark.implicits._
    import graft.quality.Expectations
    val nNull = sampled(Gen.choose(1, 20), 0x20L)
    val nNeg = sampled(Gen.choose(1, 20), 0x21L)
    val good = (1 to 100).map(i => (Some(s"2024-01-01 00:00:$i"), Some("Yoga"), 100, Some(10)))
    val nullTs = (1 to nNull).map(_ => (None: Option[String], Some("Yoga"), 100, Some(10)))
    val negDur = (1 to nNeg).map(_ => (Some("2024-01-01 00:00:00"), Some("Yoga"), -5, Some(10)))
    val df = (good ++ nullTs ++ negDur)
      .toDF("start_datetime", "sport_type", "activity_duration", "distance")
    val row = Expectations.run(df, Expectations.sportActivitySuite).collect()(0)
    assert(row.getAs[Long]("not_null_start_datetime") == nNull)
    assert(row.getAs[Long]("between_activity_duration") == nNeg)
    assert(row.getAs[Long]("not_null_sport_type") == 0)
  }

  test("frequent-items sketch: merge is order-insensitive and exact under any split") {
    // arbitrary multiset of items, arbitrary 3-way split: the merged sketch
    // must report exact counts (purge-free regime) no matter how the data
    // was partitioned — the partial-aggregation contract Spark relies on
    val items = sampled(Gen.listOfN(3000, Gen.choose(1L, 120L)), 0x31L)
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val splits = sampled(Gen.listOfN(items.size, Gen.choose(0, 2)), 0x32L)
    val parts = items.zip(splits).groupBy(_._2).values.map(_.map(_._1)).toSeq
    def sketchOf(xs: Seq[Long]) = {
      val sk = new org.apache.datasketches.frequencies.LongsSketch(
        graft.functions.FreqSketch.MaxMapSize)
      xs.foreach(sk.update); sk
    }
    // merge in both orders through the serialized wire format
    val merged1 = parts.map(sketchOf).reduce { (a, b) => a.merge(b); a }
    val merged2 = parts.reverse.map(p =>
      graft.functions.FreqSketch.fromBytes(sketchOf(p).toByteArray))
      .reduce { (a, b) => a.merge(b); a }
    assert(merged1.getMaximumError == 0 && merged2.getMaximumError == 0)
    exact.foreach { case (k, n) =>
      assert(merged1.getEstimate(k) == n && merged2.getEstimate(k) == n,
        s"item $k: ${merged1.getEstimate(k)}/${merged2.getEstimate(k)} != $n")
    }
  }

  test("LPA communities equal a driver-side synchronous reference on the real graph") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    // distributed result
    val got = graft.operators.Similarity.lpaCommunities(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent driver-side reference: same deterministic LPA definition
    // (majority label among symmetrized kNN neighbors, smallest-label tie
    // break, isolated keep own, 3 synchronous rounds)
    val g = graft.operators.Similarity.knnGraph(spark, sf)
      .select($"src", $"nbr").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (g ++ g.map(_.swap)).distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id").collect().map(_.getLong(0))
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = nodes.map { n =>
        edges.get(n).filter(_.nonEmpty) match {
          case None => n -> lab(n)
          case Some(ns) =>
            val votes = ns.map(lab).groupBy(identity).view.mapValues(_.size).toSeq
            n -> votes.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    assert(got == lab, "distributed LPA must equal the driver-side reference")
  }

  test("sorted_intersect_count equals array_intersect size on arbitrary sorted sets") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val gen = for {
      a <- Gen.listOf(Gen.choose(0L, 200L))
      b <- Gen.listOf(Gen.choose(0L, 200L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val cases = (1 to 60).map(i => sampled(gen, 0x40L + i))
    val df = cases.toDF("a", "b")
      .selectExpr("a", "b",
        "sorted_intersect_count(a, b) AS fast",
        "size(array_intersect(a, b)) AS ref")
    assert(df.filter($"fast" =!= $"ref").count() == 0,
      "merge-loop kernel must agree with array_intersect on every sampled pair")
  }
}
