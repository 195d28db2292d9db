package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import graft.operators.Similarity
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("norms are positive and dims constant") {
    import spark.implicits._
    val n = Similarity.embedNorms(spark, sf).cache()
    assert(n.filter($"norm_l2" <= 0).count() == 0)
    assert(n.select($"dim").distinct().count() == 1)
    n.unpersist()
  }

  test("PQ: 8 codes per vector from a 16-entry codebook; ADC returns 5 ranked neighbors") {
    import spark.implicits._
    val enc = Similarity.pqEncode(spark, sf).cache()
    // every vector compresses to exactly one code per subspace
    assert(enc.groupBy($"vec_id").count().filter($"count" =!= 8).count() == 0)
    assert(enc.filter($"code" < 0 || $"code" >= 16).count() == 0)
    assert(enc.filter($"code_dist" < -1e-9).count() == 0) // squared distance
    val k = Similarity.knnPq(spark, sf).cache()
    assert(k.groupBy($"qid").count().collect().forall(_.getLong(1) == 5))
    // rank 1 has the smallest approximate distance within each query
    val bad = k.as("a").join(k.as("b"),
      $"a.qid" === $"b.qid" && $"a.rank" < $"b.rank" && $"a.adist" > $"b.adist")
    assert(bad.count() == 0)
    // recall vs brute force — informational: PQ trades recall for 32x
    // compression, and this corpus is near-orthogonal random (hard mode)
    val brute = Similarity.knnBrute(spark, sf).select($"qid", $"nid")
    val r = brute.intersect(k.select($"qid", $"nid")).count() /
      brute.count().toDouble
    info(f"PQ ADC recall@5 vs brute force: $r%.2f")
    enc.unpersist(); k.unpersist()
  }

  test("brute-force top-k: 5 neighbors per query, ranked by cosine desc") {
    import spark.implicits._
    val k = Similarity.knnBrute(spark, sf).cache()
    val perQuery = k.groupBy($"qid").count().collect()
    assert(perQuery.forall(_.getLong(1) == 5))
    assert(k.filter($"cosine" > 1.0000001 || $"cosine" < -1.0000001).count() == 0)
    // rank 1 has max cosine within each query
    val bad = k.as("a").join(k.as("b"),
      $"a.qid" === $"b.qid" && $"a.rank" < $"b.rank" && $"a.cosine" < $"b.cosine")
    assert(bad.count() == 0)
    k.unpersist()
  }

  test("every vector gets exactly one IVF centroid (trained, C = ceil(sqrt(n)))") {
    import spark.implicits._
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val c = math.ceil(math.sqrt(n.toDouble)).toLong
    val a = Similarity.ivfAssign(spark, sf).cache()
    assert(a.count() == n)
    assert(a.select($"vec_id").distinct().count() == n)
    // Lloyd seeds are vec_id < C; trained centroid ids keep those labels
    // (clusters may die, none can appear from nowhere)
    assert(a.filter($"centroid_id" >= c || $"centroid_id" < 0).count() == 0)
    assert(a.filter($"centroid_cosine" > 1.0000001 || $"centroid_cosine" < -1.0000001).count() == 0)
    // training is deterministic: same assignment on a second run
    val again = Similarity.ivfAssign(spark, sf)
    assert(a.exceptAll(again).count() == 0)
    a.unpersist()
  }

  test("native float_dot equals the higher-order fold bit-for-bit, faster") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val pairs = broadcast(e.filter($"qid" < 20))
      .join(spark.read.parquet(s"$sf/embeddings.parquet")
        .select($"vec_id".as("nid"), $"embedding".as("ne")), $"qid" =!= $"nid")
    val foldExpr =
      "aggregate(zip_with(qe, ne, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
    val both = pairs.selectExpr("qid", "nid", s"$foldExpr AS dot_fold", "float_dot(qe, ne) AS dot_native")
    assert(both.filter($"dot_fold" =!= $"dot_native").count() == 0) // bit-identical
    def time(c: String): Double = {
      val t0 = System.nanoTime()
      pairs.selectExpr(s"$c AS d").agg(sum($"d")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time("float_dot(qe, ne)") // codegen warmup
    val tFold = time(foldExpr); val tNative = time("float_dot(qe, ne)")
    info(f"fold $tFold%.3fs vs native $tNative%.3fs (${tFold / tNative}%.1fx)")
  }

  test("IVF top-k recall against brute force improves with nprobe") {
    import spark.implicits._
    val brute = Similarity.knnBrute(spark, sf).select($"qid", $"nid").cache()
    val n = brute.count().toDouble
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      brute.intersect(df.select($"qid", $"nid")).count() / n
    val r1 = recall(Similarity.knnIvf(spark, sf))
    val r2 = recall(Similarity.knnIvf2(spark, sf))
    info(f"IVF recall@5: nprobe=1 $r1%.2f, nprobe=2 $r2%.2f")
    // NB: the benchmark query set (vec_id < 10) is a subset of the Lloyd
    // SEEDS (vec_id < C), which inflates recall — each query starts as the
    // anchor of its own cluster. The untrained first-C index scored 0.92
    // here for exactly that reason (queries WERE centroids); the honest
    // number is the unbiased-query lift test below.
    assert(r1 > 0.0 && r1 <= 1.0)
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
    brute.unpersist()
  }

  test("trained IVF beats the random baseline on queries that are NOT seeds") {
    // The honest index-quality metric: recall@5 on a query set disjoint
    // from the Lloyd seeds, compared against the expected recall of probing
    // a random same-sized corpus fraction. Measured on this corpus
    // (near-orthogonal random vectors — labels do NOT cluster): probed
    // fraction ~4%, recall ~0.24 => lift ~5.5x. The untrained first-C
    // index lifts only ~3.5x at HIGHER probe cost (n/16 vs n/23 per query).
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = e.count().toDouble
    val assign = Similarity.ivfAssign(spark, sf).select($"vec_id", $"centroid_id").cache()
    def norms(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "vec_id", "embedding", "sqrt(float_dot(embedding, embedding)) AS nrm")
    val (qlo, qhi) = (100, 110) // disjoint from seeds (vec_id < ceil(sqrt(n)))
    val q = norms(e.filter($"vec_id" >= qlo && $"vec_id" < qhi))
      .toDF("qid", "qe", "qnrm").join(assign.toDF("qid", "centroid_id"), "qid")
    val corpus = norms(e).toDF("nid", "ne", "nnrm")
      .join(assign.toDF("nid", "centroid_id"), "nid")
    val scored = broadcast(q).join(corpus, Seq("centroid_id"))
      .filter($"qid" =!= $"nid")
      .withColumn("cosine", expr("float_dot(qe, ne) / (qnrm * nnrm)"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"nid".asc)
    val got = scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"qid", $"nid").cache()
    // brute-force truth for the same unbiased queries
    val qb = norms(e.filter($"vec_id" >= qlo && $"vec_id" < qhi)).toDF("qid", "qe", "qnrm")
    val sb = broadcast(qb).join(norms(e).toDF("nid", "ne", "nnrm"), $"qid" =!= $"nid")
      .withColumn("cosine", expr("float_dot(qe, ne) / (qnrm * nnrm)"))
    val truth = sb.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"qid", $"nid").cache()
    val recall = truth.intersect(got).count().toDouble / truth.count()
    // probed fraction = avg size of the probed cluster / n = random baseline
    val probed = got.select($"qid").distinct().join(assign.toDF("qid", "centroid_id"), "qid")
      .join(assign.groupBy($"centroid_id").count(), "centroid_id")
      .agg(avg($"count")).first().getDouble(0) / n
    info(f"unbiased recall@5 $recall%.2f vs probed fraction $probed%.3f (lift ${recall / probed}%.1fx)")
    assert(recall >= 2 * probed,
      f"trained IVF lift ${recall / probed}%.1fx below 2x random baseline")
    Seq(assign, got, truth).foreach(_.unpersist())
  }

  test("kNN graph: ≤3 ranked neighbors per node, no self edges, cosine descends") {
    import spark.implicits._
    val g = graft.operators.Similarity.knnGraph(spark, sf).cache()
    assert(g.filter($"src" === $"nbr").count() == 0)
    assert(g.groupBy($"src").count().filter($"count" > 3).count() == 0)
    // within a node, rank order must follow cosine (desc) — join rnk to rnk+1
    val a = g.select($"src", $"rnk", $"cosine")
    val b = g.select($"src".as("s2"), ($"rnk" - 1).as("rnk"), $"cosine".as("next_cos"))
    val bad = a.join(b, a("src") === b("s2") && a("rnk") === b("rnk"))
      .filter($"next_cos" > $"cosine").count()
    assert(bad == 0, "rank order must be non-increasing in cosine")
    g.unpersist()
  }

  test("semdedup: one canonical keep per cluster, clusters have >= 2 members") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sd = Similarity.semdedup(spark, sf).cache()
    val byCluster = sd.groupBy($"cluster_id").agg(
      sum(when($"keep", 1L).otherwise(0L)).as("n_keep"),
      count(lit(1)).as("n"),
      min($"vec_id").as("min_id"))
    assert(byCluster.filter($"n_keep" =!= 1).count() == 0,
      "every duplicate component keeps exactly one member")
    assert(byCluster.filter($"n" < 2).count() == 0,
      "components come from pairs, so no singletons")
    assert(byCluster.filter($"cluster_id" =!= $"min_id").count() == 0,
      "cluster id is the minimum member id")
    assert(sd.filter($"keep" && $"vec_id" =!= $"cluster_id").count() == 0,
      "the kept member is the canonical minimum")
    sd.unpersist()
  }

  test("native srp_sig equals the nested higher-order fold bit-for-bit, faster") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    for (off <- Seq(0, 32)) {
      val both = e.selectExpr("vec_id",
        s"srp_sig(embedding, $off) AS s_native",
        s"${Similarity.srpSigHofS("embedding", off)} AS s_fold")
      assert(both.filter($"s_native" =!= $"s_fold").count() == 0,
        s"offset $off diverged")
    }
    def time(c: String): Double = {
      val t0 = System.nanoTime()
      e.selectExpr(s"$c AS s").agg(org.apache.spark.sql.functions.sum($"s")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time("srp_sig(embedding, 0)") // codegen warmup
    val tFold = time(Similarity.srpSigHofS("embedding", 0))
    val tNative = time("srp_sig(embedding, 0)")
    info(f"fold $tFold%.3fs vs native $tNative%.3fs (${tFold / tNative}%.1fx)")
  }

  test("SRP signatures: Hamming distance tracks cosine (locality property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sig = Similarity.srpSig(spark, sf).cache()
    assert(sig.filter($"sig_hi" < 0 || $"sig_hi" > 4294967295L ||
      $"sig_lo" < 0 || $"sig_lo" > 4294967295L).count() == 0,
      "signature halves are 32-bit non-negative")
    val a = sig.select($"vec_id".as("vec_a"), $"sig_hi".as("ha"), $"sig_lo".as("la"))
    val b = sig.select($"vec_id".as("vec_b"), $"sig_hi".as("hb"), $"sig_lo".as("lb"))
    def avgHam(pairs: org.apache.spark.sql.DataFrame): Double =
      pairs.join(a, "vec_a").join(b, "vec_b")
        .selectExpr("bit_count(ha ^ hb) + bit_count(la ^ lb) AS ham")
        .agg(avg($"ham")).head.getDouble(0)
    // similar pairs: the IVF-blocked embedding-dedup candidates (cos >= 0.35
    // — this corpus plants no higher-cosine duplicates, so the locality
    // claim under test is separation, not collision)
    val near = Similarity.dedupEmbedding(spark, sf).select($"vec_a", $"vec_b")
    // control: arbitrary id-offset pairs — expected Hamming 32/64 on random
    val n = sig.count()
    val rand = sig.select($"vec_id".as("vec_a"), (($"vec_id" + n / 2) % n).as("vec_b"))
    val (hNear, hRand) = (avgHam(near), avgHam(rand))
    info(f"avg Hamming/64: similar=$hNear%.1f random=$hRand%.1f")
    assert(hRand > 26 && hRand < 38, s"random-pair Hamming should center on 32, got $hRand")
    assert(hNear < hRand - 4, s"similar pairs must sit measurably closer: $hNear vs $hRand")
    sig.unpersist()
  }

  test("SRP top-k: per-query contract; re-rank broadcasts the candidate set") {
    import spark.implicits._
    val k = Similarity.knnSrp(spark, sf).cache()
    assert(k.groupBy($"qid").count().filter($"count" > 5).count() == 0)
    assert(k.filter($"qid" === $"nid").count() == 0)
    assert(k.filter($"cosine" > 1.0000001 || $"cosine" < -1.0000001).count() == 0)
    val bad = k.as("a").join(k.as("b"),
      $"a.qid" === $"b.qid" && $"a.rank" < $"b.rank" && $"a.cosine" < $"b.cosine")
    assert(bad.count() == 0)
    // the corpus is scanned, never shuffled, for the re-rank: the (small)
    // candidate set reaches the embedding lookups via broadcast joins
    val plan = k.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    k.unpersist()
  }

  test("kNN accuracy and cluster purity: exact vote accounting") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val acc = Similarity.knnAccuracy(spark, sf).cache()
    assert(acc.filter($"n_correct" > $"n" || $"n_correct" < 0).count() == 0)
    assert(acc.filter($"accuracy" < 0 || $"accuracy" > 1).count() == 0)
    // every vector with >= 1 same-cell neighbor gets exactly one prediction
    val predicted = acc.agg(sum($"n")).head.getLong(0)
    val withNbrs = Similarity.knnGraph(spark, sf).select($"src").distinct().count()
    assert(predicted == withNbrs)
    acc.unpersist()
    val pur = Similarity.clusterPurity(spark, sf).cache()
    assert(pur.agg(sum($"n_members")).head.getLong(0) == n)
    assert(pur.filter($"top_n" > $"n_members" || $"purity" > 1 ||
      $"purity" <= 0).count() == 0)
    pur.unpersist()
  }

  test("cluster quality report covers every vector with bounded shares") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cq = Similarity.clusterQuality(spark, sf).cache()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(cq.agg(sum($"n_members")).head.getLong(0) == n,
      "every assigned vector appears in exactly one cluster row")
    assert(cq.filter($"n_quality" > $"n_members" || $"n_quality" < 0).count() == 0)
    assert(cq.filter($"quality_share" < 0 || $"quality_share" > 1).count() == 0)
    cq.unpersist()
  }

  test("incremental ANN maintenance equals the batch index on the delta ids") {
    import spark.implicits._
    val incr = Similarity.annIncr(spark, sf).cache()
    assert(incr.count() == 50)
    // assignment side: identical to the full batch assignment restricted
    // to the delta — the incremental path must never drift from a rebuild
    val batch = Similarity.ivfAssign(spark, sf)
      .join(incr.select($"vec_id"), "vec_id")
    assert(incr.select($"vec_id", $"centroid_id", $"centroid_cosine")
      .except(batch.select($"vec_id", $"centroid_id", $"centroid_cosine"))
      .count() == 0)
    // signature side: identical to the corpus-wide signature relation
    val sig = Similarity.srpSig(spark, sf)
      .join(incr.select($"vec_id"), "vec_id")
      .select($"vec_id", $"sig_hi", $"sig_lo")
    assert(incr.select($"vec_id", $"sig_hi", $"sig_lo").except(sig).count() == 0)
    incr.unpersist()
  }

  test("IVF drift report: exact integer accounting across corpus and delta") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Similarity.ivfDrift(spark, sf).cache()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val t = d.agg(sum($"n_corpus"), sum($"n_delta")).head
    assert(t.getLong(0) == n, "every corpus vector is in exactly one cluster")
    assert(t.getLong(1) == 50, "every delta vector lands in some cluster")
    // drift term recomputed from the row's own integers
    val bad = d.filter(abs($"n_delta" * lit(n) - $"n_corpus" * lit(50L)) =!= $"drift_x")
    assert(bad.count() == 0)
    d.unpersist()
  }

  test("hybrid RRF: fused lists are bounded, ordered, and score-consistent") {
    import spark.implicits._
    val h = Similarity.hybridRrf(spark, sf).cache()
    assert(h.groupBy($"qid").count().filter($"count" > 10).count() == 0)
    assert(h.filter($"lex_rank".isNull && $"sem_rank".isNull).count() == 0,
      "every fused row came from at least one list")
    assert(h.filter($"rrf_score" <= 0 ||
      $"rrf_score" > 2.0 / 61.0 + 1e-12).count() == 0)
    val bad = h.as("a").join(h.as("b"),
      $"a.qid" === $"b.qid" && $"a.rank" < $"b.rank" && $"a.rrf_score" < $"b.rrf_score")
    assert(bad.count() == 0, "fused rank follows fused score")
    // a doc present in BOTH lists at rank 1 beats any single-list doc
    val both1 = h.filter($"lex_rank" === 1 && $"sem_rank" === 1).select($"qid", $"rank")
    assert(both1.filter($"rank" =!= 1).count() == 0)
    h.unpersist()
  }

  test("ANN recall report: integer hits bounded by truth; nprobe is monotone") {
    val r = Similarity.annRecall(spark, sf).head
    val (k, truth) = (r.getLong(0), r.getLong(1))
    val (i1, i2, srp) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(k == 5 && truth == 50)
    assert(Seq(i1, i2, srp).forall(h => h >= 0 && h <= truth))
    assert(i2 >= i1, "nprobe=2 probes a superset of nprobe=1's clusters")
    info(f"recall@5: ivf1=${i1 / 50.0}%.2f ivf2=${i2 / 50.0}%.2f srp=${srp / 50.0}%.2f")
  }

  test("hard negatives: cross-label only, from the SRP candidate set, ranked") {
    import spark.implicits._
    val hn = Similarity.hardNegatives(spark, sf).cache()
    assert(hn.count() > 0)
    assert(hn.filter($"q_label" === $"n_label").count() == 0,
      "a same-label neighbor is a positive, never a mined negative")
    assert(hn.filter($"rank" < 1 || $"rank" > 5).count() == 0)
    // ranks are contiguous from 1 per query (a query with few candidates
    // just stops early)
    import org.apache.spark.sql.functions.{count, lit, max, min}
    val perQ = hn.groupBy($"qid")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
    assert(perQ.filter($"mn" =!= 1 || $"mx" =!= $"n").count() == 0)
    // every mined pair is a genuine SRP band collision
    val cands = Similarity.knnSrp(spark, sf).select($"qid", $"nid")
    // (knnSrp re-ranks the same candidate set but keeps same-label rows, so
    // containment is not exact — check against the raw pair universe)
    val e = graft.sources.Tables.embeddings(spark, sf)
    val labels = e.select($"vec_id", $"label")
    val joined = hn.join(labels.toDF("nid", "lbl"), "nid")
    assert(joined.filter($"n_label" =!= $"lbl").count() == 0,
      "reported negative labels must match the corpus")
    hn.unpersist()
  }

  test("matryoshka overlap: exact accounting, full dim is its own truth") {
    import spark.implicits._
    val m = Similarity.mrlOverlap(spark, sf).cache()
    val rows = m.collect().map(r =>
      r.getAs[Long]("dim") -> (r.getAs[Long]("truth_pairs"), r.getAs[Long]("hits"))).toMap
    assert(rows.keySet == Set(16L, 32L, 64L))
    val truth = rows(64)._1
    assert(rows(64)._2 == truth, "overlap of the truth with itself is total")
    assert(rows.values.forall { case (t, h) => t == truth && h >= 0 && h <= t })
    info(s"overlap@5: d16=${rows(16L)._2}/$truth d32=${rows(32L)._2}/$truth")
    m.unpersist()
  }

  test("embed dimstats: one row per dimension, extremes bound the mean") {
    import spark.implicits._
    val d = Similarity.embedDimStats(spark, sf).cache()
    val nvecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(d.count() == 64, "one row per embedding dimension")
    assert(d.filter($"n" =!= nvecs).count() == 0,
      "every dimension sees every vector")
    assert(d.filter($"mean_val" < $"min_val" || $"mean_val" > $"max_val").count() == 0)
    d.unpersist()
  }

  test("anisotropy: single-row diagnostic with cosines in range") {
    import spark.implicits._
    val a = Similarity.anisotropy(spark, sf).collect()
    assert(a.length == 1)
    val (n, nrm, mc) = (a(0).getAs[Long]("n_vecs"),
      a(0).getAs[Double]("centroid_norm"), a(0).getAs[Double]("mean_cos"))
    assert(n == spark.read.parquet(s"$sf/embeddings.parquet").count())
    assert(nrm >= 0.0 && mc >= -1.0 && mc <= 1.0 + 1e-12)
    // a cloud with a planted mean direction correlates positively with it
    assert(mc > 0.0, s"mean cosine to the corpus centroid must be positive, got $mc")
  }

  test("coverage sample: exactly one representative per cell, counts reconcile") {
    import spark.implicits._
    val c = Similarity.coverageSample(spark, sf).cache()
    val asg = Similarity.ivfAssign(spark, sf).cache()
    assert(c.select($"centroid_id").distinct().count() == c.count(),
      "one rep per cell")
    assert(c.count() == asg.select($"centroid_id").distinct().count(),
      "every non-empty cell is represented")
    assert(c.agg(org.apache.spark.sql.functions.sum($"cell_n")).head.getLong(0)
      == asg.count(), "cell sizes partition the corpus")
    // each representative genuinely belongs to its cell
    val bad = c.join(
      asg.select($"vec_id", $"centroid_id").toDF("rep_vec_id", "cid2"), "rep_vec_id")
      .filter($"centroid_id" =!= $"cid2")
    assert(bad.count() == 0)
    c.unpersist(); asg.unpersist()
  }

  test("link prediction: only non-adjacent pairs, valid scores, correct jaccard") {
    import spark.implicits._
    val g = Similarity.knnGraph(spark, sf).select($"src", $"nbr").cache()
    val und = g.selectExpr("src AS u", "nbr AS w")
      .union(g.selectExpr("nbr AS u", "src AS w")).distinct().cache()
    val nbrs = und.as[(Long, Long)].collect()
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    val preds = Similarity.linkPrediction(spark, sf).collect()
    assert(preds.length == 20)
    preds.foreach { r =>
      val (u, v, cn, score) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u < v)
      // predicted links must not already be edges
      assert(!nbrs(u).contains(v), s"($u,$v) is already adjacent")
      val inter = nbrs(u).intersect(nbrs(v)).size
      val union = nbrs(u).union(nbrs(v)).size
      assert(cn == inter, s"($u,$v) cn=$cn but reference intersection=$inter")
      assert(score == inter.toDouble / union)
      assert(score > 0.0 && score <= 1.0)
    }
    // descending score order with deterministic tie-break
    val scores = preds.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    g.unpersist(); und.unpersist()
  }
}
