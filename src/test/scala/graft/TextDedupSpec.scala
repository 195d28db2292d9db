package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  import graft.operators.{Dedup, TextAnalysis}
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("lsh bucket cap bounds pair expansion on a 10k-identical-doc mega-cluster") {
    import spark.implicits._
    // the adversarial web-corpus shape: one boilerplate mega-cluster. All
    // 10k docs share every band bucket; uncapped expansion would emit
    // ~50M pairs (and collect a 10k-id array per agg buffer) — the cap
    // bounds output to C(cap, 2) pairs over the cap smallest doc_ids and
    // the overflow accounting reports exactly what was skipped.
    val cap = Dedup.LshBucketCap
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    val docs = spark.range(10000).select($"id".as("doc_id"), lit(txt).as("text"))
    val bands = graft.Materialize.eager(Dedup.bandRows(docs))
    val cand = Dedup.lshCandidatesFromBands(bands, cap)
    assert(cand.count() == cap.toLong * (cap - 1) / 2)
    assert(cand.filter($"doc_a" >= cap || $"doc_b" >= cap).count() == 0,
      "capped expansion must keep only the cap smallest doc_ids")
    val ovf = Dedup.lshOverflowStats(bands, cap).collect()(0)
    assert(ovf.getLong(0) == 4L, "all 4 band buckets overflow")
    assert(ovf.getLong(1) ==
      4L * (10000L * 9999 / 2 - cap.toLong * (cap - 1) / 2))
  }

  test("exact dedup keeps one id per content hash") {
    import spark.implicits._
    val d = Dedup.dedupExact(spark, sf).cache()
    assert(d.select($"content_hash").distinct().count() == d.count())
    assert(d.filter($"n_dups" < 1).count() == 0)
    d.unpersist()
  }

  test("minhash signatures are stable universal-hash values in [0, p)") {
    import spark.implicits._
    val sig = Dedup.minhashSignatures(spark, sf)
    val row = sig.orderBy($"doc_id").first()
    assert(row.getAs[Long]("sig0") >= 0 && row.getAs[Long]("sig0") < 1000000007L)
    // deterministic across runs
    val again = Dedup.minhashSignatures(spark, sf).orderBy($"doc_id").first()
    assert(row == again)
  }

  test("short docs (<3 tokens) are excluded from minhash, not mis-bucketed") {
    import spark.implicits._
    import java.nio.file.Files
    // fixture: two identical real docs (must pair), several short docs
    // (must neither sign nor pair), one empty-ish doc
    val dir = Files.createTempDirectory("shortdocs").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 1L),
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", "s", 1L),
      (2L, "hi", "en", "s", 1L),
      (3L, "yo yo", "en", "s", 1L),
      (4L, " ", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sigs = graft.operators.Dedup.minhashSignatures(spark, dir)
    assert(sigs.count() == 2) // only the two shingle-able docs
    val pairs = graft.operators.Dedup.dedupMinhashLsh(spark, dir).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 0L && pairs(0).getLong(1) == 1L)
    assert(pairs(0).getDouble(2) == 1.0) // identical docs: jaccard exactly 1
  }

  test("lsh near-dup pairs are symmetric-free and above threshold") {
    import spark.implicits._
    val p = Dedup.dedupMinhashLsh(spark, sf).cache()
    assert(p.filter($"doc_a" >= $"doc_b").count() == 0)
    assert(p.filter($"jaccard" < 0.8).count() == 0)
    p.unpersist()
  }

  test("cluster resolution merges transitive near-dup pairs to one canonical id") {
    import spark.implicits._
    import java.nio.file.Files
    // docs 0,1,2 identical (clique -> pairs (0,1),(0,2),(1,2)); docs 5,6
    // identical; 9 unique. Components: {0,1,2} and {5,6}.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val other = "pack my box with five dozen liquor jugs every single day now"
    val dir = Files.createTempDirectory("clusters").toString
    Seq(
      (0L, base, "en", "s", 1L), (1L, base, "en", "s", 1L), (2L, base, "en", "s", 1L),
      (5L, other, "en", "s", 1L), (6L, other, "en", "s", 1L),
      (9L, "completely different text about distributed query engines at scale", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val c = graft.operators.Dedup.dedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(c == Set((0L, 0L, true), (1L, 0L, false), (2L, 0L, false),
      (5L, 5L, true), (6L, 5L, false)))
  }

  test("incremental cluster maintenance equals the from-scratch batch resolution") {
    // sf0.001 has planted near-dup groups on both sides of the IncrSplit
    // boundary; previous-stars ∪ delta-pairs must land on the identical
    // fixpoint as re-clustering everything.
    val sf = "/root/testdata/sf0.001"
    val batch = graft.operators.Dedup.dedupClusters(spark, sf)
    val incr = graft.operators.Dedup.dedupClustersIncremental(spark, sf)
    assert(batch.exceptAll(incr).isEmpty && incr.exceptAll(batch).isEmpty)
  }

  test("pii scrub redacts planted emails and phone numbers") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("pii").toString
    Seq(
      (0L, "contact alice.smith+dev@example.org for details", "en", "s", 1L),
      (1L, "call 555-867-5309 or 555 123 4567 now", "en", "s", 1L),
      (2L, "no personal data here at all", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextAnalysis.piiScrub(spark, dir)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getBoolean(2)))).toMap
    assert(r(0L) == (("contact [EMAIL] for details", true)))
    assert(r(1L) == (("call [PHONE] or [PHONE] now", true)))
    assert(r(2L) == (("no personal data here at all", false)))
  }

  test("chunking windows overlap 50% and the tail chunk is short") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("chunks").toString
    val fifty = (1 to 50).map(i => s"t$i").mkString(" ") // 50 tokens
    Seq((0L, fifty, "en", "s", 1L), (1L, "solo", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val c = graft.operators.TextAnalysis.chunkDocs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // 50 tokens, W=32, S=16 -> chunks at 0, 16, 32: lengths 32, 32, 18
    assert(c((0L, 0L))._1 == 32 && c((0L, 0L))._2.startsWith("t1 t2 "))
    assert(c((0L, 1L))._1 == 32 && c((0L, 1L))._2.startsWith("t17 ")) // 50% overlap
    assert(c((0L, 2L))._1 == 18 && c((0L, 2L))._2.endsWith(" t50"))   // short tail
    assert(!c.contains((0L, 3L)))
    assert(c((1L, 0L)) == ((1L, "solo")))                             // 1-token doc
  }

  test("simhash is 16-bit and identical docs collide") {
    import spark.implicits._
    val sh = Dedup.simhash(spark, sf)
    assert(sh.filter($"simhash16" < 0 || $"simhash16" > 65535).count() == 0)
  }

  test("text stats ratios are in range") {
    import spark.implicits._
    val t = TextAnalysis.textStats(spark, sf).cache()
    assert(t.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() == 0)
    assert(t.filter($"quality_score" < 0 || $"quality_score" > 1).count() == 0)
    assert(t.filter($"n_tokens" <= 0).count() == 0)
    t.unpersist()
  }

  test("bm25 ranks by term frequency, length norm, and rarity as expected") {
    import spark.implicits._
    import java.nio.file.Files
    // same length, more query-term hits → higher score; same hits, longer
    // doc → lower score; rarer term (lower df) → higher score than a
    // common one at equal tf/dl
    val dir = Files.createTempDirectory("bm25").toString
    Seq(
      (0L, "spark spark spark pad pad pad pad pad", "en", "s", 1L),
      (1L, "spark pad pad pad pad pad pad pad", "en", "s", 1L),
      (2L, "spark " + ("pad " * 30).trim, "en", "s", 1L),
      (3L, "vector pad pad pad pad pad pad pad", "en", "s", 1L),
      (4L, "spark other words entirely here now", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextAnalysis.bm25(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(0L) > m(1L))            // tf ↑ ⇒ score ↑ (equal dl, df)
    assert(m(1L) > m(2L))            // dl ↑ ⇒ score ↓ (equal tf, df)
    assert(m(3L) > m(1L))            // df("vector")=1 < df("spark")=4 ⇒ rarer wins
    assert(!m.contains(9L) && m.size == 5)
  }

  test("lang id picks a deterministic label") {
    import spark.implicits._
    val l = TextAnalysis.langId(spark, sf)
    val labels = l.select($"lang_pred").distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "fr", "de", "es", "unknown")))
  }

  test("fingerprints are deterministic and collision-free on unique texts") {
    import spark.implicits._
    val f = TextAnalysis.fingerprint(spark, sf).cache()
    assert(f.select($"fp_md5").distinct().count() == f.count())
    assert(f.filter($"fp_roll" < 0).count() == 0)
    f.unpersist()
  }

  test("segment dedup: each distinct segment survives exactly once corpus-wide") {
    import spark.implicits._
    val d = Dedup.segDedup(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    assert(d.count() == docs.count())
    assert(d.filter($"n_kept" > $"n_segs").count() == 0)
    // sum of kept == number of distinct 5-token segments in the corpus
    val distinctSegs = docs
      .selectExpr("split(trim(text), '\\\\s+') AS toks")
      .selectExpr("explode(transform(sequence(0, (size(toks) - 1) div 5), i -> concat_ws(' ', slice(toks, i * 5 + 1, 5)))) AS seg")
      .select($"seg").distinct().count()
    assert(d.agg(sum($"n_kept")).first().getLong(0) == distinctSegs)
    // a doc that kept every segment reconstructs its original text verbatim
    val intact = d.filter($"n_kept" === $"n_segs")
      .join(docs, "doc_id")
      .filter($"text_clean" =!= trim($"text"))
    assert(intact.count() == 0)
    assert(d.filter($"n_kept" < $"n_segs").count() > 0, "planted dups should trim")
    d.unpersist(); docs.unpersist()
  }

  test("containment dominates jaccard and is reported both ways") {
    import spark.implicits._
    val c = Dedup.containmentPairs(spark, sf).cache()
    assert(c.filter($"cont_a" <= 0 || $"cont_a" > 1 || $"cont_b" <= 0 || $"cont_b" > 1).count() == 0)
    assert(c.filter(greatest($"cont_a", $"cont_b") < 0.6).count() == 0)
    // C(A,B) >= J(A,B): every verified near-dup pair at J>=0.8 must appear
    val nd = Dedup.dedupMinhashLsh(spark, sf).select($"doc_a", $"doc_b")
    assert(nd.join(c, Seq("doc_a", "doc_b"), "left_anti").count() == 0)
    c.unpersist()
  }

  test("rare-shingle pass surfaces embedded-short-doc pairs that LSH banding misses") {
    import spark.implicits._
    import java.nio.file.Files
    // doc 1 is a 5-token substring of the 30-token doc 0: symmetric Jaccard
    // = 3/28 ≈ 0.11 (too low for reliable band collision) but containment
    // of doc 1 in doc 0 is exactly 1.0. The shared shingles have corpus
    // df = 2 ≤ DFCap, so the inverted-index pass must pair them.
    val long = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu apple banana cherry date")
    val dir = Files.createTempDirectory("contain").toString
    Seq(
      (0L, long, "en", "s", long.length.toLong),
      (1L, "india juliett kilo lima mike", "en", "s", 28L),
      (9L, "completely different text about distributed query engines at scale", "en", "s", 66L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // the asymmetric motivation: the LSH-band candidates alone miss the pair
    val lshOnly = graft.operators.Dedup.lshCandidatesFrom(docs)
      .filter($"doc_a" === 0L && $"doc_b" === 1L)
    assert(lshOnly.isEmpty, "fixture invalid: LSH bands found the pair by luck")
    val rare = graft.operators.Dedup.rareShingleCandidates(docs)
      .filter($"doc_a" === 0L && $"doc_b" === 1L)
    assert(!rare.isEmpty, "rare-shingle pass must surface the embedded pair")
    // end-to-end: the containment query reports the pair with cont_b = 1.0
    val c = graft.operators.Dedup.containmentPairs(spark, dir)
      .filter($"doc_a" === 0L && $"doc_b" === 1L).collect()
    assert(c.length == 1)
    assert(c(0).getAs[Double]("cont_b") == 1.0)
  }

  test("lm score: frequencies at least 1, ratios proper fractions") {
    import spark.implicits._
    val lm = TextAnalysis.lmScore(spark, sf).cache()
    assert(lm.filter($"avg_bigram_freq" < 1.0).count() == 0,
      "every bigram occurs at least once (its own occurrence)")
    assert(lm.filter($"unique_ratio" < 0.0 || $"unique_ratio" > 1.0).count() == 0)
    // a doc made of corpus-unique bigrams: avg freq 1.0 ⇔ unique ratio 1.0
    assert(lm.filter($"avg_bigram_freq" === 1.0 && $"unique_ratio" =!= 1.0).count() == 0)
    lm.unpersist()
  }

  test("zipf profile: ranks are dense and cumulative share is monotone ≤ 1") {
    import spark.implicits._
    val z = TextAnalysis.zipfProfile(spark, sf).orderBy($"rank").collect()
    assert(z.nonEmpty)
    assert(z.map(_.getAs[Int]("rank")).toSeq == (1 to z.length))
    val shares = z.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(shares.last <= 1.0 + 1e-12)
    // counts non-increasing down the ranks
    val cnts = z.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a })
  }

  test("sequence packing: offsets chain per source and bins are budget-sized") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val p = TextAnalysis.seqPacking(spark, sf).cache()
    // independent recomputation of the chain: offset(k) = offset(k-1) + n(k-1)
    val w = Window.partitionBy($"source").orderBy($"doc_id".asc)
    val chained = p
      .withColumn("prev_end", lag($"tok_offset" + $"n_tokens", 1).over(w))
      .filter($"prev_end".isNotNull && $"prev_end" =!= $"tok_offset")
    assert(chained.count() == 0)
    // first doc of each source starts at offset 0; bin arithmetic is exact
    val firsts = p.groupBy($"source").agg(min($"tok_offset").as("mn"))
    assert(firsts.filter($"mn" =!= 0).count() == 0)
    assert(p.filter($"bin_id" =!= ($"tok_offset" - $"offset_in_bin") / 256).count() == 0)
    assert(p.filter($"offset_in_bin" < 0 || $"offset_in_bin" >= 256).count() == 0)
    p.unpersist()
  }

  test("temperature mixing keeps the smallest source whole and downsamples the rest") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCnt = counts.values.min
    val kept = TextAnalysis.temperatureSample(spark, sf).cache()
    val keptBySource = kept.groupBy($"source").agg(count(lit(1)).as("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (src, cnt) =>
      val k = keptBySource.getOrElse(src, 0L)
      val rate = math.sqrt(minCnt.toDouble) / math.sqrt(cnt.toDouble)
      if (cnt == minCnt) assert(k == cnt, s"smallest source $src must keep all")
      else assert(math.abs(k.toDouble / cnt - rate) < 0.15,
        s"$src kept $k of $cnt, expected ~$rate")
    }
    // pure function of doc_id: a second run keeps the identical id set
    val again = TextAnalysis.temperatureSample(spark, sf)
    assert(kept.select($"doc_id").exceptAll(again.select($"doc_id")).isEmpty)
    kept.unpersist()
  }

  test("gini diversity: bounds and the Cauchy-Schwarz distinct-count cap hold") {
    import spark.implicits._
    val g = TextAnalysis.giniDiversity(spark, sf).cache()
    assert(g.count() == spark.read.parquet(s"$sf/documents.parquet").count())
    assert(g.filter($"gini" < 0.0 || $"gini" >= 1.0).count() == 0)
    assert(g.filter($"ttr" <= 0.0 || $"ttr" > 1.0).count() == 0)
    // sumsq >= n²/distinct  ⇒  gini <= 1 - 1/distinct
    assert(g.filter($"gini" > lit(1.0) - lit(1.0) / $"distinct_tokens" + lit(1e-12)).count() == 0,
      "gini must respect the distinct-count cap")
    // all-identical-token docs (distinct=1) must score exactly 0
    assert(g.filter($"distinct_tokens" === 1 && $"gini" =!= 0.0).count() == 0)
    g.unpersist()
  }

  test("incremental span dedup equals the batch report restricted to the delta") {
    import spark.implicits._
    val incr = Dedup.spanDedupIncremental(spark, sf)
    val split = Dedup.spanIncrSplit(spark, sf)
    val batchRestricted = Dedup.spanDedup(spark, sf).filter($"doc_id" >= split)
    assert(incr.exceptAll(batchRestricted).isEmpty &&
      batchRestricted.exceptAll(incr).isEmpty,
      "index-probe composition must be invisible in the result")
  }

  test("LSH quality truth pass is bounded by the deterministic doc cap") {
    import spark.implicits._
    // the cap bounds the sample exactly, deterministically
    val s1 = Dedup.lshSampleDocs(spark, sf, 20).select($"doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Dedup.lshSampleDocs(spark, sf, 20).select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.size == 20 && s1 == s2, "hash-order sample must be exact-size and rerun-stable")
    // uncapped = whole corpus (the oracle-paired test-scale form)
    val full = graft.sources.Tables.documents(spark, sf).count()
    assert(Dedup.lshSampleDocs(spark, sf, Int.MaxValue).count() == full)
    // the capped report's exhaustive-truth side can only see sampled pairs
    val r = Dedup.lshQualityCapped(spark, sf, 20).collect().head
    assert(r.getAs[Long]("n_true_pairs") <= 20L * 19 / 2,
      "truth input must be bounded when the cap is set")
  }

  test("span dedup matches an independent join-on-text recomputation") {
    import spark.implicits._
    val got = Dedup.spanDedup(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // every doc keeps exactly one row
    assert(got.count() == docs.count())
    // bounds + ratio arithmetic
    assert(got.filter($"n_dup_spans" < 0 || $"n_dup_spans" > $"n_spans").count() == 0)
    assert(got.filter(abs($"dup_ratio" * $"n_spans" - $"n_dup_spans") > 1e-9).count() == 0)
    // independent formulation: spans as raw text (no md5), df via self-join
    // distinct-doc count instead of a window
    val sp = docs
      .withColumn("toks", expr("split(trim(text), '\\\\s+')"))
      .selectExpr("doc_id",
        "explode(if(size(toks) < 8, array(), array_distinct(transform(sequence(1, size(toks) - 7), i -> concat_ws(' ', slice(toks, i, 8)))))) AS span")
    val df_ = sp.groupBy($"span").agg(countDistinct($"doc_id").as("df"))
    val expect = sp.join(df_, "span").filter($"df" >= 2)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_dup_expect"))
    val joined = got.join(expect, Seq("doc_id"), "left")
      .select($"doc_id", $"n_dup_spans",
        coalesce($"n_dup_expect", lit(0L)).as("n_dup_expect"))
    assert(joined.filter($"n_dup_spans" =!= $"n_dup_expect").count() == 0,
      "window-on-hash and join-on-text disagree")
    got.unpersist()
  }

  test("cross-source dups are exactly the source-crossing ngram pairs") {
    import spark.implicits._
    val cross = Dedup.crossSourceDups(spark, sf).cache()
    assert(cross.filter($"source_a" === $"source_b").count() == 0)
    val all = Dedup.ngramJaccard(spark, sf).select($"doc_a", $"doc_b").cache()
    // partition check: cross ∪ same-source = all pairs
    assert(cross.select($"doc_a", $"doc_b").except(all).count() == 0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source")
    val same = all
      .join(docs.select($"doc_id".as("doc_a"), $"source".as("sa")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"source".as("sb")), "doc_b")
      .filter($"sa" === $"sb")
    assert(cross.count() + same.count() == all.count())
    cross.unpersist(); all.unpersist()
  }

  test("dedup weights: a complete mass-preserving soft-dedup keep list") {
    import spark.implicits._
    val w = Dedup.dedupWeights(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    // total weight is conserved — soft dedup drops no mass
    assert(w.agg(sum($"weight")).head.getLong(0) == docs)
    assert(w.filter($"weight" < 1).count() == 0)
    // every keep_id is a cluster canonical or an unclustered doc
    val labels = Dedup.dedupClusters(spark, sf).cache()
    val nonCanon = labels.filter(!$"is_canonical").select($"doc_id".as("keep_id"))
    assert(w.join(nonCanon, "keep_id").count() == 0,
      "a non-canonical cluster member must never be a keep_id")
    // clustered canonicals carry exactly their cluster size
    val sizes = labels.groupBy($"cluster_id".as("keep_id"))
      .agg(count(lit(1)).as("sz"))
    assert(w.join(sizes, "keep_id").filter($"weight" =!= $"sz").count() == 0)
    labels.unpersist(); w.unpersist()
  }

  test("source overlap: sketch and exact Jaccard agree on their contracts") {
    import spark.implicits._
    val o = Dedup.sourceOverlap(spark, sf).cache()
    val nSrc = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source").distinct().count()
    assert(o.count() == nSrc * (nSrc - 1) / 2, "one row per unordered source pair")
    assert(o.filter($"k_match" < 0 || $"k_match" > 8).count() == 0)
    assert(o.filter($"exact_jaccard" < 0 || $"exact_jaccard" > 1).count() == 0)
    assert(o.filter($"est_jaccard" =!= $"k_match" / 8.0d).count() == 0)
    // symmetric-pair completeness: n_inter never exceeds either side's size
    assert(o.filter($"n_inter" < 0).count() == 0)
    o.unpersist()
  }

  test("cluster sizes histogram accounts for every document") {
    import spark.implicits._
    val h = Dedup.clusterSizes(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    // Σ size·count = corpus size; Σ count = number of kept docs
    val t = h.agg(sum($"cluster_size" * $"n_clusters"), sum($"n_clusters")).head
    assert(t.getLong(0) == docs)
    assert(t.getLong(1) == Dedup.dedupWeights(spark, sf).count())
    h.unpersist()
  }

  test("quality by source: counts bound the share and cover the corpus") {
    import spark.implicits._
    val q = graft.operators.TextAnalysis.qualityBySource(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(q.agg(sum($"n_docs")).head.getLong(0) == docs)
    assert(q.filter($"n_quality" > $"n_docs" || $"n_quality" < 0).count() == 0)
    assert(q.filter($"quality_share" < 0 || $"quality_share" > 1).count() == 0)
    q.unpersist()
  }

  test("mix plan: realized keep counts match the sampler exactly") {
    import spark.implicits._
    val p = graft.operators.TextAnalysis.mixPlan(spark, sf).cache()
    // the realized counts ARE the temperature sampler's output counts
    val sampled = graft.operators.TextAnalysis.temperatureSample(spark, sf)
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    p.collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") == sampled.getOrElse(r.getString(0), 0L))
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
    }
    // the smallest source keeps everything (keep_rate 1.0)
    val smallest = p.orderBy($"n_docs".asc).first()
    assert(smallest.getAs[Double]("keep_rate") == 1.0)
    assert(smallest.getAs[Long]("n_kept") == smallest.getAs[Long]("n_docs"))
    p.unpersist()
  }

  test("corpus card: totals reconcile with the raw table") {
    import spark.implicits._
    val c = TextAnalysis.corpusCard(spark, sf).head
    val d = spark.read.parquet(s"$sf/documents.parquet")
    assert(c.getAs[Long]("n_docs") == d.count())
    assert(c.getAs[Long]("n_langs") == d.select($"lang").distinct().count())
    assert(c.getAs[Long]("n_unique") <= c.getAs[Long]("n_docs"))
    assert(c.getAs[Long]("n_exact_dups") ==
      c.getAs[Long]("n_docs") - c.getAs[Long]("n_unique"))
    assert(c.getAs[Long]("min_tokens") <= c.getAs[Long]("max_tokens"))
    assert(c.getAs[Double]("dup_rate") >= 0.0 && c.getAs[Double]("dup_rate") < 1.0)
  }

  test("shard plan: complete partition of docs with balanced token totals") {
    import spark.implicits._
    val p = graft.operators.TextAnalysis.shardPlan(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(p.count() == 8)
    assert(p.agg(sum($"n_docs")).head.getLong(0) == docs,
      "every document lands in exactly one shard")
    val mm = p.agg(min($"n_tokens"), max($"n_tokens")).head
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    assert(hi <= lo + lo / 4,
      s"bucketed round-robin should balance token totals within 25%: [$lo, $hi]")
    p.unpersist()
  }

  test("bloom probe: no false negatives, file-backed bitmap, full delta coverage") {
    import spark.implicits._
    val r = Dedup.bloomDedup(spark, sf).cache()
    // the bloom contract: a missed exact duplicate is a correctness bug
    // (the pre-filter would silently drop a dedup candidate at scale)
    assert(r.filter($"exact_dup" && !$"bloom_hit").count() == 0,
      "bloom filters must never report a false negative")
    // fp sanity: 4 hashes over 2^20 bits with a few-hundred-doc corpus
    // gives an expected fp count ~1e-9 — any hit here means broken hashing
    val fp = r.filter($"bloom_hit" && !$"exact_dup").count()
    assert(fp == 0, s"unexpected bloom false positives at this scale: $fp")
    // every delta doc gets exactly one verdict row
    val split = Dedup.bloomArtifact(spark, sf)._2
    val delta = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" >= split).count()
    assert(r.count() == delta)
    // the probe consumes the stored artifact, not a recomputation
    val words = Dedup.bloomArtifact(spark, sf)._1
    assert(words.inputFiles.nonEmpty &&
      words.inputFiles.forall(_.contains("graft_bloom_")),
      "bitmap must be read back from the parquet artifact")
    r.unpersist()
  }

  test("leakage split: no near-dup cluster ever spans train and val") {
    import spark.implicits._
    // recompute the per-doc assignment exactly as the operator does and
    // check its invariant directly: every cluster lands on ONE side
    val labels = Dedup.dedupClusters(spark, sf).select($"doc_id", $"cluster_id")
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"doc_id")
    val asg = docs.join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("keep_id"))
      .selectExpr("doc_id", "keep_id",
        "CASE WHEN cast(conv(substr(md5(cast(cast(keep_id as string) as binary)), 1, 4), 16, 10) as int) % 100 < 90 THEN 'train' ELSE 'val' END AS split")
      .cache()
    val spanning = asg.groupBy($"keep_id")
      .agg(countDistinct($"split").as("nsp")).filter($"nsp" > 1)
    assert(spanning.count() == 0, "a cluster routed to both splits leaks")
    // the report reconciles: doc counts cover the corpus, and rerouted
    // docs only exist where a multi-doc cluster pulled members over
    val report = Dedup.leakageSplit(spark, sf).cache()
    assert(report.agg(sum($"n_docs")).head.getLong(0) == docs.count())
    assert(report.select($"split").distinct().count() == report.count(),
      "one row per split")
    asg.unpersist(); report.unpersist()
  }

  test("self-dedup: within-doc repeated segments are counted and trimmed") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("selfdedup").toString
    // doc 0: the same 5-token segment three times -> 2 dup segments
    val seg = "alpha beta gamma delta epsilon"
    Seq(
      (0L, s"$seg $seg $seg", "en", "s", 1L),
      (1L, "one two three four five six seven eight nine ten", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Dedup.selfDedup(spark, dir).orderBy($"doc_id").collect()
    assert(r(0).getAs[Int]("n_segs") == 3 && r(0).getAs[Int]("n_uniq_segs") == 1)
    assert(math.abs(r(0).getAs[Double]("dup_ratio") - 2.0 / 3) < 1e-12)
    assert(r(0).getAs[Long]("clean_chars") == seg.length)
    // doc 1: two distinct segments, nothing trimmed
    assert(r(1).getAs[Int]("n_segs") == 2 && r(1).getAs[Int]("n_uniq_segs") == 2)
    assert(r(1).getAs[Double]("dup_ratio") == 0.0)
  }

  test("quality bands: a graded, complete partition of the corpus per source") {
    import spark.implicits._
    val b = TextAnalysis.qualityBands(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(b.agg(sum($"n_docs")).head.getLong(0) == docs.count(),
      "every document lands in exactly one (source, band) cell")
    // avg_score stays inside the weight range and bands bound it
    assert(b.filter($"avg_score" < 0 || $"avg_score" > 6).count() == 0)
    assert(b.filter($"band" === "high" && $"avg_score" < 5.0).count() == 0)
    assert(b.filter($"band" === "low" && $"avg_score" >= 3.0).count() == 0)
    b.unpersist()
  }

  test("dedup agreement: intersection bounds hold and jaccard is consistent") {
    val r = Dedup.dedupAgreement(spark, sf).collect()
    assert(r.length == 1)
    val (nm, nh, nb, j) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getDouble(3))
    // the intersection can never exceed either pair set
    assert(nb <= math.min(nm, nh), s"n_both $nb > min($nm, $nh)")
    assert(j >= 0.0 && j <= 1.0)
    val union = nm + nh - nb
    if (union > 0) assert(j == nb.toDouble / union)
    // both methods find SOMETHING on the synthetic corpus (near-dups exist)
    assert(nm > 0 && nh > 0)
  }
}
