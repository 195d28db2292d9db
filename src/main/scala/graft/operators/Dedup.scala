package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators over `documents` (builder mandate: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard — the LLM-training-data pipeline
  * family).
  *
  * Scale design (the whole point of MinHash/LSH): the naive near-dup join is
  * O(n²) pairs — dead at 100 TB. Here every doc is reduced to k=8 MinHash
  * signatures (one scan, codegen'd), hashed into 4 LSH bands, and only
  * documents sharing a band bucket are pair-joined — the shuffle is on
  * `(band_id, band_key)` and the candidate set is ~|near-dup pairs|, not n².
  * With sig k=8 / 4 bands of 2: P(candidate | J=0.8) ≈ 98%, P | J=0.3 ≈ 31%.
  * Exact Jaccard verification runs only on candidates.
  *
  * All hashes are md5-derived so the DuckDB oracle computes bit-identical
  * signatures; no RNG anywhere (seeds are the literal band indices).
  */
object Dedup {

  import Tok.{toksDuck, toksExpr}

  /** Distinct word-3-gram shingles (Spark SQL fragment over `toks`). */
  // NB: guard short docs — Spark's sequence(1, 0) yields a DESCENDING [1, 0],
  // not an empty array, so the size<3 case must short-circuit.
  private val shinglesExpr =
    "if(size(toks) < 3, array(), array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))))"
  private val shinglesDuck =
    "list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)), i -> array_to_string(toks[i:i+2], ' ')))"

  private val K = 8 // minhash signatures; 4 LSH bands of 2 rows
  private val P = 1000000007L // modulus for universal hashing
  private def A(i: Int): Long = 100003L + 37L * i
  private def B(i: Int): Long = 12345L + 1013L * i

  // One md5 per shingle → 60-bit int (`shh`); each of the K signatures is a
  // cheap universal-hash projection min((h·aᵢ+bᵢ) mod p) over that array —
  // 8× less hashing than seeding md5 per signature.
  private val shingleHashSpark =
    "transform(sh, x -> cast(conv(substr(md5(cast(x as binary)), 1, 15), 16, 10) as bigint) % 1000000007)"
  private val shingleHashDuck =
    "list_transform(sh, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1000000007)"

  private def sigExprSpark(i: Int): String =
    s"array_min(transform(shh, h -> (h * ${A(i)} + ${B(i)}) % $P)) AS sig$i"
  private def sigExprDuck(i: Int): String =
    s"list_min(list_transform(shh, h -> (h * ${A(i)} + ${B(i)}) % $P)) AS sig$i"

  // ---------------------------------------------------------------------------
  // Exact dedup: hash-groupBy on content hash; keeps the lowest doc_id.
  // Scale: one shuffle on the 128-bit content hash — the standard exact-dedup
  // pass over a 100 TB corpus (hash is computed in the scan, the shuffle
  // carries (hash, id) pairs only, not the text).
  // ---------------------------------------------------------------------------
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(md5($"text".cast("binary")).as("content_hash"), $"doc_id")
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
  }
  val dedupExactSql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY md5(text)
      |""".stripMargin

  /** Normalized exact dedup: lowercase + whitespace-collapse before hashing. */
  def dedupNormalized(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val norm = regexp_replace(lower(trim($"text")), "\\s+", " ")
    Tables.documents(s, dir)
      .select(md5(norm.cast("binary")).as("content_hash"), $"doc_id")
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
  }
  val dedupNormalizedSql: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
      |       min(doc_id) AS keep_id, count(*) AS n_dups
      |FROM documents GROUP BY 1
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // MinHash signatures: k=8 md5-seeded min-hashes over word-3-gram shingles.
  // ---------------------------------------------------------------------------
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    signaturesFromHashes(shingleIndex(s, dir))

  /** The exploded (doc_id, shingle-hash) relation — ONE tokenize→shingle→md5
    * pass over the corpus; both the signature aggregate and the rare-shingle
    * inverted index consume it. */
  private def shingleHashRows(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(toksExpr))
      .withColumn("sh", expr(shinglesExpr))
      .select(col("doc_id"), explode(expr(shingleHashSpark)).as("h"))

  private def signaturesFrom(docs: DataFrame): DataFrame =
    signaturesFromHashes(shingleHashRows(docs))

  /** At-rest shingle-hash index (doc_id, source, h) — ONE tokenize →
    * shingle → md5 pass over the corpus, pinned per (session, dir) under
    * the stored-artifact contract (cluster labels, span/bloom indexes):
    * production materializes the shingle index once and every full-corpus
    * consumer — signatures, LSH bands, the rare-shingle inverted index,
    * source-overlap sketches — reads that table instead of re-hashing the
    * corpus per query (the md5 pass dominates every one of them).
    * Incremental/subset paths keep computing their own rows via
    * [[shingleHashRows]]. */
  private val shingleCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private[graft] def shingleIndex(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(shingleCache, s, dir) {
      graft.Materialize.eager(
        Tables.documents(s, dir)
          .withColumn("toks", expr(toksExpr))
          .withColumn("sh", expr(shinglesExpr))
          .select(col("doc_id"), col("source"), explode(expr(shingleHashSpark)).as("h")),
        pin = true)
    }

  /** Band rows (doc_id, band_id, band_key) for an arbitrary document
    * relation — the at-rest LSH index schema, and the probe-side projection
    * the streaming near-dup detector appends per ingest batch. */
  private[graft] def bandRows(docs: DataFrame): DataFrame =
    bandRowsFromSigs(signaturesFrom(docs))

  private def signaturesFromHashes(hrows: DataFrame): DataFrame = {
    // Signatures are computed by EXPLODING the per-doc shingle-hash array and
    // taking the K universal-hash minima in one hash aggregate. Two reasons
    // this shape, found by measurement:
    //  - referencing an expensive derived array column K times makes Catalyst
    //    inline the whole tokenize→shingle→md5 chain per reference (projection
    //    collapse even pushes through a repartition barrier), re-hashing every
    //    shingle K+ times;
    //  - array higher-order functions are CodegenFallback, while
    //    explode + min/agg is fully whole-stage-codegen'd with map-side
    //    partial aggregation — the shuffle carries one row per doc.
    // Docs with no shingles (<3 tokens) have no rows after explode and are
    // absent from the output (they are exact-dedup territory, not MinHash);
    // the oracle filters identically.
    val sigAggs = (0 until K).map(i =>
      min((col("h") * A(i) + B(i)) % P).as(s"sig$i"))
    hrows
      .groupBy(col("doc_id"))
      .agg(sigAggs.head, sigAggs.tail: _*)
  }
  val minhashSignaturesSql: String = {
    val sigs = (0 until K).map(sigExprDuck).mkString(",\n       ")
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |sh AS (SELECT doc_id, $shinglesDuck AS sh FROM tok),
       |shh AS (SELECT doc_id, $shingleHashDuck AS shh FROM sh WHERE len(sh) > 0)
       |SELECT doc_id,
       |       $sigs
       |FROM shh
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // MinHash + LSH near-dup pairs, exact-Jaccard-verified at >= 0.8.
  // Plan shape: scan -> signatures -> explode 4 bands -> shuffle on band key
  // -> self-join within buckets -> distinct pairs -> join shingle sets back
  // -> exact Jaccard filter. The only O(pairs) work happens after LSH.
  // ---------------------------------------------------------------------------
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    lshPairs(s, dir, threshold = 0.8)

  /** n-gram Jaccard similarity join (same LSH prefilter, lower threshold —
    * reported with the similarity value for downstream graph clustering). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    lshPairs(s, dir, threshold = 0.3)

  private def lshPairs(s: SparkSession, dir: String, threshold: Double): DataFrame =
    verifyJaccard(s, dir,
      lshCandidatesFromSigs(signaturesFromHashes(shingleIndex(s, dir))), threshold)

  /** LSH near-dup pairs over an arbitrary document subset (the corpus-only
    * side of incremental cluster maintenance). Verification still reads the
    * full table — the left_semi against candidate ids restricts it. */
  private def lshPairsFrom(s: SparkSession, dir: String, docs: DataFrame,
                           threshold: Double): DataFrame =
    verifyJaccard(s, dir, lshCandidatesFrom(docs), threshold)

  /** LSH candidate pairs (band-bucket cooccurrence, unverified) — shared by
    * the Jaccard and containment scorers. */
  private[graft] def lshCandidatesFrom(docs: DataFrame): DataFrame =
    lshCandidatesFromSigs(signaturesFrom(docs))

  /** Per-bucket expansion cap: at most the `LshBucketCap` smallest doc_ids
    * of a band bucket enter the pair expansion, so a pathological bucket of
    * k identical docs (boilerplate mega-clusters are GUARANTEED on a real
    * web corpus) costs O(cap²) pairs and O(cap) agg memory instead of
    * O(k²)/O(k). Deterministic (smallest ids, engine-independent) and
    * replayed by the oracle's QUALIFY-ranked bands, so the cap is part of
    * the operator's SEMANTICS, not a Spark-side approximation. Docs ranked
    * out of one bucket still surface through their other 3 bands, and the
    * skipped volume is reported by [[lshQuality]]'s overflow columns. */
  private[graft] val LshBucketCap = 256

  private def lshCandidatesFromSigs(sig: DataFrame): DataFrame =
    lshCandidatesFromBands(bandRowsFromSigs(sig), LshBucketCap)

  /** Band rows (doc_id, band_id, band_key) from a signature relation.
    * Docs with no shingles (<3 tokens) have NULL signatures: they must be
    * excluded from banding, or Spark's concat_ws would fold them all into
    * one shared "" bucket (quadratic pair blowup) while SQL `||` NULL keys
    * drop out of the join — divergent semantics. Filter them on BOTH sides.
    * '|' separator avoids concat ambiguity between adjacent int signatures. */
  private def bandRowsFromSigs(sig: DataFrame): DataFrame =
    sig.filter(col("sig0").isNotNull).selectExpr("doc_id",
      "stack(4, 0, concat_ws('|', sig0, sig1), 1, concat_ws('|', sig2, sig3), 2, concat_ws('|', sig4, sig5), 3, concat_ws('|', sig6, sig7)) AS (band_id, band_key)")

  private[graft] def lshCandidatesFromBands(bands: DataFrame, cap: Int): DataFrame = {
    val s = bands.sparkSession
    import s.implicits._
    // Candidate pairs via rank-cap + groupBy + in-bucket pair expansion, NOT
    // a self-join: a self-join would execute the (expensive) signature
    // pipeline twice — and under AQE a broadcast conversion defeats exchange
    // reuse. The row_number pass bounds every bucket BEFORE collect_list, so
    // no agg buffer ever holds an unbounded id array (WindowExec spills;
    // an uncapped collect_list over a 10M-doc bucket is a pure-heap array);
    // the groupBy that follows reuses the window's (band_id, band_key)
    // partitioning — one exchange total.
    // The candidate set is small relative to the corpus (≈ near-dup pair
    // count) but its lineage is the whole signature pipeline, and it feeds
    // three consumers below. Materialize it DISTRIBUTED via the
    // graft.Materialize seam: the signature pipeline executes exactly once,
    // lineage is truncated so the three consumers re-read the materialized
    // data, and — unlike a driver collect() — the candidate set never has to
    // fit in driver memory (a 100 TB web corpus has billions of dup pairs)
    // and re-enters the plan with its full partitioning, not as 1 partition.
    // (Churn-prone clusters set Materialize.impl = TempParquet; same shape.)
    val w = Window.partitionBy($"band_id", $"band_key").orderBy($"doc_id")
    graft.Materialize.lazyCut(bands
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= cap)
      .groupBy($"band_id", $"band_key")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") >= 2)
      .selectExpr(
        "explode(flatten(transform(sequence(1, size(ids) - 1), i -> transform(sequence(0, i - 1), j -> struct(ids[j] AS doc_a, ids[i] AS doc_b))))) AS p")
      .select($"p.doc_a", $"p.doc_b")
      .distinct())
  }

  /** Overflow accounting for the bucket cap: how many buckets exceeded
    * `cap` and how many pairs the cap skipped — the quality-report
    * counterpart of the bounded expansion (silent truncation would read as
    * "covered everything"). One count aggregate over the band relation. */
  private[graft] def lshOverflowStats(bands: DataFrame, cap: Int): DataFrame =
    bands.groupBy(col("band_id"), col("band_key"))
      .agg(count(lit(1)).as("c"))
      .selectExpr(
        s"CASE WHEN c > $cap THEN 1 ELSE 0 END AS ob",
        s"CASE WHEN c > $cap THEN c * (c - 1) DIV 2 - ${cap.toLong * (cap - 1) / 2} ELSE 0 END AS sk")
      .agg(coalesce(sum(col("ob")), lit(0L)).as("n_overflow_buckets"),
        coalesce(sum(col("sk")), lit(0L)).as("n_pairs_skipped"))

  /** Exact-Jaccard verification of LSH candidate pairs: compute shingle
    * sets ONLY for candidate docs (left_semi against the candidate-id set),
    * not the corpus — the signature pass already consumed the full corpus
    * once; re-shingling 100% of it just to verify ~0.1% of pairs would
    * dominate the runtime. No broadcast hints: AQE broadcasts when the
    * candidate side is small and falls back to a shuffled join when (at
    * corpus scale) it isn't. */
  private[graft] def verifyJaccard(s: SparkSession, dir: String,
                                   candidates: DataFrame, threshold: Double): DataFrame = {
    import s.implicits._
    val shingleSets = candidateShingles(s, dir, candidates)
    candidates
      .join(shingleSets.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(shingleSets.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .selectExpr("doc_a", "doc_b",
        "cast(size(array_intersect(sh_a, sh_b)) as double) / size(array_union(sh_a, sh_b)) AS jaccard")
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** Shingle sets for candidate-pair docs ONLY (left_semi against the
    * candidate-id set — the signature pass already consumed the full corpus;
    * re-shingling 100% of it to verify ~0.1% of pairs would dominate).
    * Materialized once: it feeds both sides of the verification join, and
    * without the checkpoint each side would re-scan the documents table. */
  private def candidateShingles(s: SparkSession, dir: String,
                                candidates: DataFrame): DataFrame = {
    import s.implicits._
    val candDocs = candidates
      .selectExpr("explode(array(doc_a, doc_b)) AS doc_id").distinct()
    graft.Materialize.lazyCut(Tables.documents(s, dir)
      .join(candDocs, Seq("doc_id"), "left_semi")
      .withColumn("toks", expr(toksExpr))
      .selectExpr("doc_id", s"$shinglesExpr AS sh"))
  }

  /** Shared DuckDB CTE prefix: tokenize → shingle → sign → band → candidate
    * pairs (everything up to the scorer — the SQL twin of
    * [[lshCandidatesFrom]] + [[candidateShingles]]). */
  private def lshCteSql(candPred: String = ""): String = {
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band_id, sig${2 * b} || '|' || sig${2 * b + 1} AS band_key FROM sig WHERE sig0 IS NOT NULL"
    }.mkString("\n  UNION ALL ")
    // The BATCH candidate expansion is bucket-capped ([[LshBucketCap]] —
    // ranked bands, smallest doc_ids kept); the INCREMENTAL probe form
    // (candPred non-empty) replays the Spark-side stored-index join, which
    // is uncapped (its per-delta-doc fan-out is bucket-bounded, not k²).
    val capSrc = if (candPred.isEmpty) ("bandsc", LshBucketCap) else ("bands", 0)
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |shs AS (SELECT doc_id, $shinglesDuck AS sh FROM tok),
       |shh AS (SELECT doc_id, sh, $shingleHashDuck AS shh FROM shs),
       |sig AS (SELECT doc_id,
       |       ${(0 until K).map(sigExprDuck).mkString(",\n       ")}
       |FROM shh),
       |bands AS (
       |  $bandRows
       |),
       |bandsc AS (
       |  SELECT doc_id, band_id, band_key FROM bands
       |  QUALIFY row_number() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) <= ${capSrc._2}
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM ${capSrc._1} a JOIN ${capSrc._1} b
       |    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id$candPred
       |)""".stripMargin
  }

  private def lshPairsSql(threshold: Double, candPred: String = ""): String =
    s"""${lshCteSql(candPred)}
       |SELECT doc_a, doc_b,
       |       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |         / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
       |FROM cand
       |JOIN shs sa ON sa.doc_id = doc_a
       |JOIN shs sb ON sb.doc_id = doc_b
       |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |         / len(list_distinct(list_concat(sa.sh, sb.sh))) >= $threshold
       |""".stripMargin
  val dedupMinhashLshSql: String = lshPairsSql(0.8)
  val ngramJaccardSql: String = lshPairsSql(0.3)

  // ---------------------------------------------------------------------------
  // Jaccard CONTAINMENT scoring (sub-document duplication): C(A,B) =
  // |A∩B| / |A| is asymmetric — a short doc fully embedded in a long one
  // scores ~1.0 where symmetric Jaccard stays low. MinHash banding alone
  // would miss exactly those pairs (band collision probability tracks the
  // SYMMETRIC Jaccard, which an embedded short doc keeps low), so candidates
  // come from TWO passes:
  //   1. the shared LSH band buckets (catches near-dups, where containment
  //      and Jaccard coincide);
  //   2. a rare-shingle inverted index (prefix-filtering flavor): any pair
  //      sharing >= MinShared shingles whose corpus document-frequency is
  //      <= DFCap becomes a candidate. An embedded short doc shares ALL its
  //      shingles with its container, so it surfaces as long as two of them
  //      are corpus-rare — no dependence on symmetric similarity.
  // Scale: the index drops shingles with df > DFCap, so per-shingle pair
  // expansion is bounded by DFCap²/2 and the shuffle carries (60-bit hash,
  // doc_id) pairs, never text. Different scorer from the near-dup join: both
  // containment directions are reported and a pair survives iff either
  // direction clears the threshold. Integer set sizes + one IEEE division
  // per direction, so the oracle hash-matches.
  // ---------------------------------------------------------------------------
  private val ContainT = 0.6
  private val DFCap = 10    // ignore shingles appearing in more docs (stopword-grams)
  private val MinShared = 2 // rare shingles a pair must share to be a candidate

  /** Rare-shingle candidate pairs — the asymmetric complement of LSH banding.
    * Same groupBy + in-bucket expansion idiom as [[lshCandidatesFrom]] (a
    * self-join of the inverted index would execute the tokenize→shingle→md5
    * pipeline twice); bucket lists are capped at DFCap elements so the
    * expansion is O(DFCap²) per rare shingle. */
  private[graft] def rareShingleCandidates(docs: DataFrame): DataFrame =
    rareShingleCandidatesFromHashes(shingleHashRows(docs))

  private def rareShingleCandidatesFromHashes(hrows: DataFrame): DataFrame = {
    val s = hrows.sparkSession
    import s.implicits._
    val inv = hrows.select(col("doc_id"), col("h").as("g"))
    // Count FIRST, collect after the df-filter: collecting then filtering
    // would materialize the full posting list of every stopword-gram
    // (millions of ids in one group at corpus scale) just to drop it. The
    // count is a cheap partial+final agg; the join and the re-group share
    // its hash partitioning on g, and every collected list is ≤ DFCap.
    val rare = inv.groupBy($"g").agg(count(lit(1)).as("df"))
      .filter($"df".between(2, DFCap))
      .select($"g")
    inv.join(rare, "g")
      .groupBy($"g")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .selectExpr(
        "explode(flatten(transform(sequence(1, size(ids) - 1), i -> transform(sequence(0, i - 1), j -> struct(ids[j] AS doc_a, ids[i] AS doc_b))))) AS p")
      .select($"p.doc_a", $"p.doc_b")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("nsh"))
      .filter($"nsh" >= MinShared)
      .select($"doc_a", $"doc_b")
  }

  def containmentPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Both candidate passes consume the SAME stored shingle-hash index —
    // the corpus is tokenized and md5'd exactly once per (session, dir),
    // not per query (the md5 pass dominates this whole family).
    val hrows = shingleIndex(s, dir)
    val candidates = graft.Materialize.lazyCut(
      lshCandidatesFromSigs(signaturesFromHashes(hrows))
        .union(rareShingleCandidatesFromHashes(hrows)).distinct())
    val shingleSets = candidateShingles(s, dir, candidates)
    // score ONCE per pair behind a cut (round 19): without the barrier the
    // threshold filter folds into the scoring join's condition and the
    // projection re-evaluates it — array_intersect ran up to 4× per
    // candidate pair. The cut relation is O(candidate pairs) of 4 scalars.
    val scored = graft.Materialize.lazyCut(candidates
      .join(shingleSets.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(shingleSets.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .selectExpr("doc_a", "doc_b",
        "cast(size(array_intersect(sh_a, sh_b)) as double) AS inter",
        "cast(size(sh_a) as double) AS na", "cast(size(sh_b) as double) AS nb"))
    scored
      .selectExpr("doc_a", "doc_b",
        "inter / na AS cont_a", "inter / nb AS cont_b")
      .filter(greatest($"cont_a", $"cont_b") >= ContainT)
  }
  val containmentPairsSql: String =
    s"""${lshCteSql()},
       |inv AS (SELECT doc_id, unnest(shh) AS g FROM shh),
       |df AS (SELECT g, count(*) AS df FROM inv GROUP BY g),
       |rare AS (SELECT inv.g, inv.doc_id FROM inv JOIN df ON inv.g = df.g
       |         WHERE df.df BETWEEN 2 AND $DFCap),
       |rpair AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $MinShared),
       |cand2 AS (SELECT doc_a, doc_b FROM cand
       |          UNION SELECT doc_a, doc_b FROM rpair),
       |scored AS (
       |  SELECT doc_a, doc_b,
       |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sa.sh) AS cont_a,
       |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sb.sh) AS cont_b
       |  FROM cand2
       |  JOIN shs sa ON sa.doc_id = doc_a
       |  JOIN shs sb ON sb.doc_id = doc_b)
       |SELECT doc_a, doc_b, cont_a, cont_b
       |FROM scored WHERE greatest(cont_a, cont_b) >= $ContainT
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Segment-level exact dedup (CCNet-style line dedup, adapted to the
  // newline-free corpus): chunk each doc into consecutive 5-token segments,
  // drop every segment occurrence except the globally FIRST one (by
  // (doc_id, pos) — the deterministic CCNet keep-first rule), and rebuild
  // the cleaned text. Boilerplate repeated across docs (headers, footers,
  // near-dup bodies) survives exactly once corpus-wide.
  // Scale shape: segments shuffle by their md5 (16 bytes + ids, never the
  // text) for the first-occurrence window, then once by doc_id for the
  // rebuild — two bounded shuffles, no self-join; at 100 TB this is the
  // same plan with the segment hash bucketed.
  // ---------------------------------------------------------------------------
  private val SegW = 5
  def segDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val segs = Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .selectExpr("doc_id",
        s"posexplode(transform(sequence(0, (size(toks) - 1) div $SegW), i -> concat_ws(' ', slice(toks, i * $SegW + 1, $SegW)))) AS (pos, seg)")
      .selectExpr("doc_id", "cast(pos as bigint) AS pos", "seg",
        "unhex(md5(cast(seg as binary))) AS segh") // 16-byte shuffle key
    val w = Window.partitionBy($"segh").orderBy($"doc_id".asc, $"pos".asc)
    segs.withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        count(when($"rn" === 1, 1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN rn = 1 THEN struct(pos, seg) END)), x -> x.seg)"),
          " ").as("text_clean"))
  }
  val segDedupSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |segs AS (
       |  SELECT doc_id,
       |         unnest(range(0, ((len(toks) - 1) // $SegW) + 1)) AS pos,
       |         unnest(list_transform(range(0, ((len(toks) - 1) // $SegW) + 1),
       |                i -> array_to_string(toks[(i * $SegW + 1):(i * $SegW + $SegW)], ' '))) AS seg
       |  FROM tok),
       |flagged AS (
       |  SELECT doc_id, pos, seg,
       |         row_number() OVER (PARTITION BY md5(seg)
       |                            ORDER BY doc_id ASC, pos ASC) AS rn
       |  FROM segs)
       |SELECT doc_id, count(*) AS n_segs,
       |       count(CASE WHEN rn = 1 THEN 1 END) AS n_kept,
       |       coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '') AS text_clean
       |FROM flagged GROUP BY doc_id
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Incremental near-dup pass: dedup a NEW batch (doc_id >= IncrSplit here;
  // in production the delta partition) against the full corpus WITHOUT
  // re-pairing corpus×corpus. The band join keys the delta's bands against
  // the corpus band index — at 100 TB that index is precomputed and stored
  // bucketed by band key, so a 1 TB delta probes it instead of re-deduping
  // 100 TB; pair work is O(delta candidates), not O(corpus²). Any pair's
  // larger id is the new side (ids are ingest-ordered), so `doc_b >= split`
  // selects exactly the pairs touching the delta — including delta-internal
  // ones.
  // ---------------------------------------------------------------------------
  private val IncrSplit = 400L
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = minhashSignatures(s, dir)
    // signature pipeline runs once; both join sides read the materialization
    val bands = graft.Materialize.lazyCut(
      sig.filter(col("sig0").isNotNull).selectExpr("doc_id",
        "stack(4, 0, concat_ws('|', sig0, sig1), 1, concat_ws('|', sig2, sig3), 2, concat_ws('|', sig4, sig5), 3, concat_ws('|', sig6, sig7)) AS (band_id, band_key)"))
    val newBands = bands.filter($"doc_id" >= IncrSplit)
      .toDF("n_doc_id", "band_id", "band_key")
    val candidates = graft.Materialize.lazyCut(
      bands.join(newBands, Seq("band_id", "band_key"))
        .filter($"doc_id" < $"n_doc_id")
        .select($"doc_id".as("doc_a"), $"n_doc_id".as("doc_b"))
        .distinct())
    verifyJaccard(s, dir, candidates, threshold = 0.8)
  }
  val dedupIncrementalSql: String =
    lshPairsSql(0.8, s" AND b.doc_id >= $IncrSplit")

  // ---------------------------------------------------------------------------
  // SimHash: 16-bit token-frequency simhash (per-bit majority vote over
  // md5-derived token hashes). One scan, no shuffle; near-dup = small
  // Hamming distance. (64-bit production variant would use a native
  // Expression; 16 bits keeps the oracle SQL tractable.)
  // ---------------------------------------------------------------------------
  def simhash(s: SparkSession, dir: String): DataFrame = {
    // Same explode+aggregate shape as minhashSignatures (the 16 per-bit
    // majority votes would otherwise inline the md5-per-token chain 32x):
    // one row per token, one hash aggregate with 16 conditional counts,
    // then the majority vote as a final projection.
    val bitCounts = (0 until 16).map { b =>
      sum(when((col("h").bitwiseAND(lit(1 << b))) =!= 0, 1).otherwise(0)).as(s"c$b")
    }
    val vote = (0 until 16).map { b =>
      s"(CASE WHEN 2 * c$b > n THEN ${1 << b} ELSE 0 END)"
    }.mkString(" + ")
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"),
        explode(expr("transform(toks, t -> cast(conv(substr(md5(cast(t as binary)), 1, 4), 16, 10) as int))")).as("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), bitCounts: _*)
      .selectExpr("doc_id", s"($vote) AS simhash16")
  }
  val simhashSql: String = {
    val bits = (0 until 16).map { b =>
      val m = 1 << b
      s"(CASE WHEN 2 * len(list_filter(th, h -> (h & $m) != 0)) > len(th) THEN $m ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |th AS (SELECT doc_id, list_transform(toks, t -> (('0x' || substr(md5(t), 1, 4))::INT)) AS th FROM tok)
       |SELECT doc_id, ($bits) AS simhash16
       |FROM th
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // 60-bit SimHash via the native expression (graft.functions.SimHash64):
  // one md5 per token, single-pass vote kernel, no shuffle — the
  // production-width signature the 16-bit q_simhash demonstrates in pure SQL.
  // The oracle reproduces it bit-for-bit from md5 hex prefixes.
  // ---------------------------------------------------------------------------
  def simhash64Sigs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir)
      .selectExpr("doc_id", s"simhash64($toksExpr) AS sh")
  }
  val simhash64SigsSql: String = {
    val bitCounts = (0 until 60).map(b => s"sum(((h >> $b) & 1)) AS c$b").mkString(",\n       ")
    val assemble = (0 until 60).map(b =>
      s"(CASE WHEN 2 * c$b > n THEN (1::BIGINT << $b) ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |t AS (SELECT doc_id, unnest(toks) AS tk FROM tok),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM t),
       |bits AS (SELECT doc_id, count(*) AS n,
       |       $bitCounts
       |FROM h GROUP BY doc_id)
       |SELECT doc_id, ($assemble) AS sh FROM bits
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // SimHash near-dup pairs at Hamming distance <= 3, pigeonhole-banded:
  // 4 bands of 15 bits — any pair differing in <= 3 bits shares at least one
  // intact band (pigeonhole), so banding has PERFECT recall at this radius,
  // unlike probabilistic MinHash banding. Same O(candidates) pair shape.
  // ---------------------------------------------------------------------------
  private val HammingT = 3

  /** The 20 block-combination candidate keys: 64 bits split into 6 blocks
    * (widths 11,11,11,11,10,10); every 3-subset of blocks packs into one
    * ≤33-bit key via fixed 11-bit slots. HammingT+1 ≤ 6−3+1 blocks stay
    * clean under ≤3 flips, so every true pair shares ≥1 combo key. */
  private lazy val SimhashComboBands: String = {
    val widths = Seq(11, 11, 11, 11, 10, 10)
    val offs = widths.scanLeft(0)(_ + _).init
    val block = offs.zip(widths).map { case (o, w) =>
      s"((sh >> $o) & ${(1L << w) - 1}L)"
    }
    val rows = (0 until 6).combinations(3).zipWithIndex.map { case (c, idx) =>
      s"$idx, ((((${block(c(0))} << 11) | ${block(c(1))}) << 11) | ${block(c(2))})"
    }
    s"stack(20, ${rows.mkString(", ")}) AS (band_id, band_val)"
  }
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Materialized once (Materialize.lazyCut — compute-once blocks, no
    // dedicated driver action): the signature pipeline feeds banding AND
    // both sides of the verification join — three full-corpus
    // recomputations without it.
    val sigs = graft.Materialize.lazyCut(simhash64Sigs(s, dir))
    // Candidate keys are BLOCK COMBINATIONS (Manku/Jain/Sarma, WWW'07 §3),
    // not single narrow bands: 4×15-bit bands collide random unrelated
    // docs at n²/2¹⁵ — quadratic corpus growth measured 10.8× on 10× data
    // at ~sf1 and hopeless at real scale. Split sh into 6 blocks and key
    // each of the C(6,3)=20 tables on a ~32-bit concatenation of 3 blocks:
    // hamming ≤ 3 flips ≤3 blocks, so ≥3 blocks are clean and SOME 3-combo
    // matches exactly (recall stays 100%, pigeonhole), while random
    // collisions drop to n²/2³². Post-verify output is therefore the
    // IDENTICAL pair set — both candidate supersets contain every
    // hamming≤3 pair — so the 4-band DuckDB oracle needs no change.
    val bands = sigs.selectExpr("doc_id", SimhashComboBands)
    // Same distributed materialization as lshPairs: the lazy checkpoint
    // truncates the signature lineage once; candidates stay partitioned on
    // the cluster instead of round-tripping through the driver.
    val candidates = graft.Materialize.lazyCut(bands
      .groupBy($"band_id", $"band_val")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") >= 2)
      .selectExpr(
        "explode(flatten(transform(sequence(1, size(ids) - 1), i -> transform(sequence(0, i - 1), j -> struct(ids[j] AS doc_a, ids[i] AS doc_b))))) AS p")
      .select($"p.doc_a", $"p.doc_b")
      .distinct())
    candidates
      .join(sigs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(sigs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .selectExpr("doc_a", "doc_b", "cast(bit_count(sh_a ^ sh_b) as int) AS hamming")
      .filter($"hamming" <= HammingT)
  }
  val dedupSimhashSql: String = {
    val bandRows = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band_id, (sh >> ${15 * b}) & 32767 AS band_val FROM sh64"
    }.mkString("\n  UNION ALL ")
    s"""WITH sh64 AS ($simhash64SigsSql),
       |bands AS (
       |  $bandRows
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(x.sh, y.sh)) AS INTEGER) AS hamming
       |FROM cand JOIN sh64 x ON x.doc_id = doc_a JOIN sh64 y ON y.doc_id = doc_b
       |WHERE bit_count(xor(x.sh, y.sh)) <= $HammingT
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Dedup method-agreement report: how much do the MinHash-LSH (Jaccard ≥
  // 0.8) and SimHash (Hamming ≤ 3) near-dup passes agree? The one-row QA
  // artifact a pipeline owner reads before trusting either method alone on
  // a new corpus — low pair-set Jaccard means the two notions of "near
  // duplicate" diverge on this data and thresholds need re-tuning.
  // Scale: both pair sets are the already-bounded candidate outputs
  // (O(near-dup pairs), never O(n²)); the agreement join keys on id pairs
  // only, and the report is three single-row aggregates.
  // ---------------------------------------------------------------------------
  // ---------------------------------------------------------------------------
  // Near-dup threshold sweep: pair counts per Jaccard band and the
  // cumulative pairs-at-or-above curve — the tuning artifact for choosing
  // the dedup threshold on a new corpus (how many pairs does moving
  // 0.8 → 0.7 add?). One verified pair set (the 0.3-threshold join the
  // library already builds) feeds a 8-row bin rollup + suffix-sum window;
  // nothing here rescans the corpus. Bin edges are exact (floor of a
  // shared-value double), so both engines bin identically.
  // ---------------------------------------------------------------------------
  def dedupThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"bin".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ngramJaccard(s, dir)
      .selectExpr("CAST(floor(jaccard * 10) AS BIGINT) AS bin")
      .groupBy($"bin").agg(count(lit(1)).as("n_pairs"))
      .select($"bin", $"n_pairs",
        sum($"n_pairs").over(w).cast("long").as("n_pairs_ge"))
      .selectExpr("CAST(bin AS DOUBLE) / 10 AS threshold", "n_pairs", "n_pairs_ge")
  }
  val dedupThresholdSweepSql: String =
    s"""WITH pairs AS ($ngramJaccardSql),
       |bins AS (SELECT CAST(floor(jaccard * 10) AS BIGINT) AS bin FROM pairs),
       |g AS (SELECT bin, count(*) AS n_pairs FROM bins GROUP BY bin)
       |SELECT CAST(bin AS DOUBLE) / 10 AS threshold, n_pairs,
       |       CAST(sum(n_pairs) OVER (ORDER BY bin DESC
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_ge
       |FROM g
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Dedup ROI report — what each method would remove, measured
  // independently: exact (non-keeper copies), near-dup (non-canonical LSH
  // cluster members), and span (corpus-duplicated 8-token spans). The
  // capacity-planning numbers behind choosing which passes to run on a new
  // corpus: docs affected + tokens at stake per method (for `span`, the
  // token column counts duplicated spans — the waterfall attribution
  // across methods lives in q_curation_funnel / q_curation_diff).
  // Scale: three already-bounded passes (hash groupBy, LSH clusters, span
  // index) reduced to three single-row aggregates; the doc-token join is a
  // broadcast of the affected-id sets.
  // ---------------------------------------------------------------------------
  def dedupRoi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docTok = Tables.documents(s, dir)
      .selectExpr("doc_id", s"CAST(size($toksExpr) AS BIGINT) AS n_tok")
    def rollup(ids: DataFrame, method: String) =
      docTok.join(ids, Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum($"n_tok"), lit(0L)).cast("long").as("n_tokens"))
        .selectExpr(s"'$method' AS method", "n_docs", "n_tokens")
    val exactDropped = Tables.documents(s, dir)
      .join(dedupExact(s, dir).select($"keep_id".as("doc_id")),
        Seq("doc_id"), "left_anti")
      .select($"doc_id")
    val nonCanon = dedupClusters(s, dir)
      .filter(!$"is_canonical").select($"doc_id")
    val spanRows = spanDedup(s, dir).filter($"n_dup_spans" >= 1)
      .selectExpr("doc_id", "n_dup_spans")
    val spanRollup = spanRows
      .agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum($"n_dup_spans"), lit(0L)).cast("long").as("n_tokens"))
      .selectExpr("'span' AS method", "n_docs", "n_tokens")
    rollup(exactDropped, "exact")
      .union(rollup(nonCanon, "neardup"))
      .union(spanRollup)
  }
  // lazy: references dedupClustersSql/spanDedupSql declared later in this
  // object — an eager val would read them as null at class init
  lazy val dedupRoiSql: String =
    s"""WITH tok AS (SELECT doc_id, CAST(len($toksDuck) AS BIGINT) AS n_tok
       |            FROM documents),
       |ex AS (SELECT keep_id AS doc_id FROM (${dedupExactSql.trim}) e),
       |exd AS (SELECT t.doc_id, t.n_tok FROM tok t
       |        WHERE t.doc_id NOT IN (SELECT doc_id FROM ex)),
       |nc AS (SELECT doc_id FROM (${dedupClustersSql.trim}) c WHERE NOT is_canonical),
       |ncd AS (SELECT t.doc_id, t.n_tok FROM tok t JOIN nc ON t.doc_id = nc.doc_id),
       |sp AS (SELECT doc_id, n_dup_spans FROM (${spanDedupSql.trim}) s
       |       WHERE n_dup_spans >= 1)
       |SELECT 'exact' AS method, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens FROM exd
       |UNION ALL
       |SELECT 'neardup', CAST(count(*) AS BIGINT),
       |       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM ncd
       |UNION ALL
       |SELECT 'span', CAST(count(*) AS BIGINT),
       |       CAST(coalesce(sum(n_dup_spans), 0) AS BIGINT) FROM sp
       |""".stripMargin

  def dedupAgreement(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // each pair relation feeds TWO consumers (its own count + the
    // intersection join) — share them or the verify stage of each pipeline
    // executes twice
    val m = graft.Materialize.shared(
      dedupMinhashLsh(s, dir).select($"doc_a", $"doc_b"))
    val h = graft.Materialize.shared(
      dedupSimhash(s, dir).select($"doc_a", $"doc_b"))
    val nm = m.agg(count(lit(1)).cast("long").as("n_minhash"))
    val nh = h.agg(count(lit(1)).cast("long").as("n_simhash"))
    val nb = m.join(h, Seq("doc_a", "doc_b"))
      .agg(count(lit(1)).cast("long").as("n_both"))
    nm.crossJoin(nh).crossJoin(nb)
      .selectExpr("n_minhash", "n_simhash", "n_both",
        "CASE WHEN n_minhash + n_simhash - n_both = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_both AS DOUBLE) / (n_minhash + n_simhash - n_both) END AS pair_jaccard")
  }
  val dedupAgreementSql: String =
    s"""WITH m0 AS ($dedupMinhashLshSql),
       |h0 AS ($dedupSimhashSql),
       |m AS (SELECT doc_a, doc_b FROM m0),
       |h AS (SELECT doc_a, doc_b FROM h0),
       |cm AS (SELECT CAST(count(*) AS BIGINT) AS n_minhash FROM m),
       |ch AS (SELECT CAST(count(*) AS BIGINT) AS n_simhash FROM h),
       |cb AS (SELECT CAST(count(*) AS BIGINT) AS n_both
       |       FROM m JOIN h USING (doc_a, doc_b))
       |SELECT n_minhash, n_simhash, n_both,
       |       CASE WHEN n_minhash + n_simhash - n_both = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(n_both AS DOUBLE) / (n_minhash + n_simhash - n_both) END AS pair_jaccard
       |FROM cm, ch, cb
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Near-dup CLUSTER resolution: LSH emits pairs, but a dedup pipeline must
  // pick one canonical doc per duplicate GROUP — pairs (a,b),(b,c) are one
  // cluster {a,b,c}, keep min(doc_id). Connected components via the
  // alternating large-star/small-star algorithm (Kiveris et al., "Connected
  // Components in MapReduce and Beyond"): edges are kept oriented
  // (child > parent) and each round applies
  //   large-star: every node u points its LARGER neighbors at
  //     min(N(u) ∪ {u}) — halves chain depth;
  //   small-star: every node u points its smaller neighbors AND itself at
  //     min(smaller neighbors) — flattens sibling fans;
  // until a fixpoint, which is exactly one star per component centered at
  // the component's min id. Rounds are O(log²) in component size even on
  // adversarial path graphs (plain min-label propagation needs O(diameter)
  // rounds — 10⁶ rounds on a 10⁶-chain); near-dup cliques still converge
  // in 2-3. The fixpoint is unique, so the result is independent of round
  // count/partitioning and DuckDB's recursive CTE reproduces it exactly.
  // Scale: each round shuffles only the (≈dup-pair-sized) edge relation,
  // materialized per round so lineage stays flat. Convergence is detected
  // from the SAME action that materializes the round — accumulators folded
  // into the checkpoint job record (count, Σ(parent+1), Σ mix-hash) as the
  // rows stream past, so a round costs exactly ONE job (previously a
  // second 1-row aggregate job per round probed the sum). Both rewrites
  // only ever move an edge's parent DOWN (or merge duplicate edges), so
  // the exact Σ(parent+1) strictly decreases iff the edge set changed; the
  // count and an order-independent mix-hash ride along as witnesses so a
  // wrapped int64 sum (possible at 10¹²-edge scale) or a task-retry
  // over-count cannot silently fake a fixpoint — a spurious MISmatch at
  // the fixpoint merely costs one extra (idempotent) round, and a
  // three-way collision on (count, sum, hash) is ~2⁻¹²⁸.
  // ---------------------------------------------------------------------------
  private final case class RoundStat(n: Long, sum: Long, mix: Long)

  /** Materialize an oriented edge relation and, inside the same job, fold
    * its (count, Σ(parent+1), Σ mix) convergence statistics — the star
    * rounds' zero-extra-job fixpoint probe. Schema is preserved (int or
    * long ids). */
  private def materializeWithStat(df: DataFrame): (DataFrame, RoundStat) = {
    val sc = df.sparkSession.sparkContext
    val nAcc = sc.longAccumulator("stars.n")
    val sAcc = sc.longAccumulator("stars.sum")
    val hAcc = sc.longAccumulator("stars.mix")
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    val tracked = df.map { r =>
      val c = r.getAs[Number](0).longValue()
      val p = r.getAs[Number](1).longValue()
      nAcc.add(1L)
      sAcc.add(p + 1L)
      hAcc.add((p + 1L) * 0x9E3779B97F4A7C15L + c * 0xC2B2AE3D27D4EB4FL)
      r
    }(enc)
    val out = graft.Materialize.eager(tracked)
    (out, RoundStat(nAcc.value, sAcc.value, hAcc.value))
  }
  /** Resolve duplicate clusters from an LSH pair relation
    * (doc_a < doc_b per row). Returns (labels, rounds): labels =
    * (doc_id, cluster_id = component min, is_canonical), one row per doc
    * appearing in any pair; rounds = star rounds to the fixpoint. */
  def resolveClusters(pairs: DataFrame): (DataFrame, Int) = {
    val s = pairs.sparkSession
    import s.implicits._
    var (stars, stat) = materializeWithStat(
      pairs.select($"doc_b".as("child"), $"doc_a".as("parent")).distinct())
    // node universe off the MATERIALIZED stars, not the pairs input — the
    // input's lineage is the whole LSH verification pipeline, and reading
    // it twice would execute that pipeline twice (same id set either way:
    // stars is just pairs reoriented)
    val nodes = stars.selectExpr("explode(array(child, parent)) AS id").distinct()

    // Both rewrites are single-pass window aggregates: min().over(partition)
    // computes each node's minimum neighbor in the same shuffle that groups
    // its edges — a groupBy + join-back would shuffle the edge relation AND
    // rescan it, and a multi-read of the un-materialized input would
    // re-execute the upstream rewrite per reference. Each round is 3 edge
    // shuffles total (sym-on-u, on-child, final distinct).
    // large-star over the symmetrized view: for each u, every neighbor
    // v > u re-points at m = min(N(u) ∪ {u}); edges to smaller neighbors
    // are re-emitted from the other endpoint's perspective, so nothing
    // is lost and output stays oriented child > parent. (No distinct here:
    // duplicates are swallowed by small-star's final distinct.)
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select($"child".as("u"), $"parent".as("v"))
        .union(e.select($"parent".as("u"), $"child".as("v")))
      sym
        .withColumn("m", least(min($"v").over(Window.partitionBy($"u")), $"u"))
        .filter($"v" > $"u")
        .select($"v".as("child"), $"m".as("parent"))
    }
    // small-star on the oriented form: each child u re-points its parents
    // (all smaller) and itself at m = min(parents). One pass: every edge row
    // explodes into its reparented edge and its child's star edge; the
    // filter drops the (m, m) self-loop and distinct collapses duplicates.
    def smallStar(e: DataFrame): DataFrame = {
      e.withColumn("m", min($"parent").over(Window.partitionBy($"child")))
        .select(explode(array(
          struct($"parent".as("child"), $"m".as("parent")),
          struct($"child".as("child"), $"m".as("parent")))).as("p"))
        .select($"p.child".as("child"), $"p.parent".as("parent"))
        .filter($"child" =!= $"parent")
        .distinct()
    }

    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      // ONE job per round: small-star consumes the large-star output in a
      // single window pass, and the convergence statistics fold into the
      // materialization action itself — no separate aggregate probe.
      val (next, nextStat) = materializeWithStat(smallStar(largeStar(stars)))
      stars = next
      converged = nextStat == stat
      stat = nextStat
      rounds += 1
    }
    // The 50-round cap is a runaway backstop far above the O(log² n) star
    // bound — silently returning unconverged labels would poison canonical
    // selection downstream with no signal, so hitting it is an error.
    if (!converged)
      throw new IllegalStateException(
        s"resolveClusters: star contraction did not converge in $rounds rounds " +
          s"(potential still ${stat.sum}) — input graph is beyond the expected regime")
    val labels = nodes
      .join(stars.select($"child".as("id"), $"parent"), Seq("id"), "left")
      .select($"id".as("doc_id"), coalesce($"parent", $"id").as("cluster_id"),
        $"parent".isNull.as("is_canonical"))
    (labels, rounds)
  }

  /** The resolved cluster-label relation as a stored artifact. In
    * production the resolution pass writes (doc_id, cluster_id,
    * is_canonical) to an at-rest table and every consumer — weight rollup,
    * size histogram, curation keep-lists — reads THAT, never re-pairing or
    * re-contracting the corpus. Cached + pinned per (session, dir) exactly
    * like the trained IVF/PQ index artifacts: the first consumer pays the
    * LSH + star-contraction build, the rest read the materialized labels. */
  private val labelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  def storedClusterLabels(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(labelCache, s, dir) {
      import s.implicits._
      graft.Materialize.eager(
        resolveClusters(dedupMinhashLsh(s, dir).select($"doc_a", $"doc_b"))._1,
        pin = true)
    }

  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    storedClusterLabels(s, dir)

  // ---------------------------------------------------------------------------
  // Incremental cluster MAINTENANCE: after a delta ingest, a 100 TB corpus
  // must not be re-paired NOR re-clustered from scratch. The stored labels
  // of the previous resolution already encode its star edges — every
  // non-canonical row (doc_id, cluster_id) is one (child, component-min)
  // edge, and stars preserve connectivity — so the new input graph is just
  //   previous star edges  ∪  delta-touching LSH pairs
  // (O(old docs in clusters) + O(delta candidates) edges), and the old
  // stars are depth-1, so contraction converges in ~2 rounds regardless of
  // corpus size. The star fixpoint is unique per component, so the result
  // is IDENTICAL to a from-scratch batch resolution — the oracle is
  // literally the batch recursive CTE over the full corpus.
  // The "previous" state — labels of the docs < IncrSplit sub-corpus — is
  // the STORED artifact of the prior resolution run: built once per
  // (session, dir) and pinned, exactly like storedClusterLabels for the
  // full corpus (production reads the label table the last run wrote; the
  // pinned cache is this repo's stand-in for that at-rest table). The
  // steady-state cost of the query is then what the operator actually
  // costs in production: the delta probe + a ~2-round contraction.
  // ---------------------------------------------------------------------------
  private val prevLabelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def storedPrevLabels(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(prevLabelCache, s, dir) {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.Materialize.eager(
        resolveClusters(
          lshPairsFrom(s, dir, docs.filter($"doc_id" < IncrSplit), threshold = 0.8)
            .select($"doc_a", $"doc_b"))._1,
        pin = true)
    }

  def dedupClustersIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prevStars = storedPrevLabels(s, dir).filter(!$"is_canonical")
      .select($"cluster_id".as("doc_a"), $"doc_id".as("doc_b"))
    val deltaPairs = dedupIncremental(s, dir).select($"doc_a", $"doc_b")
    resolveClusters(prevStars.union(deltaPairs))._1
  }
  val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |${lshPairsSql(0.8)}
       |),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |),
       |reach AS (
       |  SELECT src AS id, src AS comp FROM edges
       |  UNION
       |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
       |)
       |SELECT id AS doc_id, min(comp) AS cluster_id, (id = min(comp)) AS is_canonical
       |FROM reach GROUP BY id
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Exact duplicated-span detection (Lee et al. 2022, "Deduplicating
  // Training Data Makes Language Models Better"): find every 8-token span
  // that occurs in >= 2 distinct documents and report, per document, how
  // much of it is made of such shared spans. This is the signal used to
  // CUT repeated boilerplate out of pretraining corpora — a different
  // operator from whole/near-doc dedup: it localizes duplication inside
  // otherwise-unique documents. (The reference's stack has no equivalent;
  // suffix-array span dedup is the published production approach — here
  // the fixed span width makes it a pure hash aggregation.)
  //
  // Scale design: spans never shuffle as text — each distinct span is
  // projected to its full 32-hex (128-bit) md5 before the exchange, so the
  // shuffle carries (doc_id, 16-byte hash). 128 bits, not a 64-bit prefix:
  // at 100 TB span populations reach the 64-bit birthday zone, and a
  // prefix collision would inflate n_dup_spans on the Spark side only and
  // break the oracle gate non-reproducibly (the oracle groups by span
  // TEXT). Document frequency is a window count over the span-hash
  // partitioning (one shuffle); the per-doc rollup is a second shuffle at
  // doc grain; the join back to per-doc span totals is doc-keyed on both
  // sides. Per-doc span lists are DISTINCT (a span repeated inside one doc
  // counts once), so df is true document frequency. At 100 TB the
  // span-hash exchange is the cost — ~40 bytes/span-occurrence, linear in
  // corpus tokens, no quadratic term.
  // ---------------------------------------------------------------------------
  private val SpanK = 8
  private val spansExpr =
    s"if(size(toks) < $SpanK, array(), array_distinct(transform(sequence(1, size(toks) - ${SpanK - 1}), i -> concat_ws(' ', slice(toks, i, $SpanK)))))"
  private val spansDuck =
    s"list_distinct(list_transform(range(1, greatest(len(toks) - ${SpanK - 2}, 1)), i -> array_to_string(toks[i:i+${SpanK - 1}], ' ')))"

  /** Per-doc distinct 8-token spans. The CPU-heavy span build sits on top
    * of a conditionally-rebalanced scan (spread when the file has fewer
    * row groups than cores — see Materialize.rebalanced); the eager()
    * is the UNCONDITIONAL barrier: both the per-doc span totals and the
    * exploded hash relation read the result, and without it
    * CollapseProject re-inlines the tokenize+span build into each
    * consumer (rebalanced alone passes well-split inputs through and is
    * no barrier at all). */
  private def spanRows(docs: DataFrame): DataFrame =
    graft.Materialize.lazyCut(
      graft.Materialize.rebalanced(docs)
        .withColumn("toks", expr(toksExpr))
        .selectExpr("doc_id", s"$spansExpr AS spans"))

  /** Shared final rollup: per-doc span totals left-joined with the
    * duplicated-span counts (the batch and incremental operators must
    * emit bit-identical report rows). */
  private def spanReport(spans: DataFrame, dup: DataFrame): DataFrame = {
    val s = spans.sparkSession
    import s.implicits._
    spans.select($"doc_id", size($"spans").cast("long").as("n_spans"))
      .join(dup, Seq("doc_id"), "left")
      .select($"doc_id", $"n_spans",
        coalesce($"n_dup_spans", lit(0L)).as("n_dup_spans"),
        when($"n_spans" > 0,
          coalesce($"n_dup_spans", lit(0L)).cast("double") / $"n_spans".cast("double"))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }

  def spanDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spans = spanRows(Tables.documents(s, dir).select($"doc_id", $"text"))
    val hashed = spans
      .selectExpr("doc_id", "explode(spans) AS span")
      // unhex: the window shuffle carries the 128-bit hash as 16 BYTES,
      // not 32 hex chars (same bits, half the exchanged width — guide
      // "shuffle fewer bytes"); the hash never reaches the output
      .select($"doc_id", unhex(md5($"span")).as("h"))
    val dup = hashed
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"h")))
      .filter($"df" >= 2)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_dup_spans"))
    spanReport(spans, dup)
  }
  val spanDedupSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |sp AS (SELECT doc_id, $spansDuck AS spans FROM tok),
       |ex AS (SELECT doc_id, unnest(spans) AS span FROM sp),
       |w AS (SELECT doc_id, count(*) OVER (PARTITION BY span) AS df FROM ex),
       |dup AS (SELECT doc_id, count(*) AS n_dup FROM w WHERE df >= 2 GROUP BY doc_id)
       |SELECT sp.doc_id,
       |       CAST(len(sp.spans) AS BIGINT) AS n_spans,
       |       CAST(COALESCE(dup.n_dup, 0) AS BIGINT) AS n_dup_spans,
       |       CASE WHEN len(sp.spans) > 0
       |            THEN CAST(COALESCE(dup.n_dup, 0) AS DOUBLE) / CAST(len(sp.spans) AS DOUBLE)
       |            ELSE CAST(0.0 AS DOUBLE) END AS dup_ratio
       |FROM sp LEFT JOIN dup ON sp.doc_id = dup.doc_id
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // LSH quality report: how good is the cheap candidate pass, measured
  // against EXHAUSTIVE ground truth? Truth = every pair with exact
  // Jaccard >= 0.8, found via the inverted-index self-join on shingle
  // hashes — complete because J > 0 requires a shared shingle. This is
  // the O(sum df²) pass LSH exists to avoid; running both and reporting
  // recall/precision of the banding is the standard way to TUNE the
  // band/row split before a 100 TB run (on a sample — the truth pass is
  // the expensive one by design; the report quantifies exactly what the
  // cheap path would miss at full scale).
  //
  // Shared machinery: the same shingle-hash rows feed both sides of the
  // truth join (materialized once, exchange reused), and candidates come
  // from the production lshCandidatesFrom path — the report measures the
  // REAL pipeline, not a re-implementation. J is computed from hash-set
  // sizes (shared/(|A|+|B|-shared)) in the same mod-P (~2^30) hash space
  // the signatures use — a handful of cross-doc collisions can nudge a
  // borderline pair, but both engines hash identically so truth is
  // deterministic and the recall/precision comparison is apples-to-apples.
  // ---------------------------------------------------------------------------
  /** Deterministic doc sample for the quality report: rank every doc by an
    * md5 of its id (the same RNG-free hash-order trick as q_train_split)
    * and keep the lowest `maxDocs` — rerun-stable, engine-agnostic, and a
    * TakeOrdered of `maxDocs` rows at any corpus size. `Int.MaxValue`
    * means "whole corpus" and skips the ranking entirely (test scale). */
  def lshSampleDocs(s: SparkSession, dir: String, maxDocs: Int): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, dir).select($"doc_id", $"text")
    if (maxDocs == Int.MaxValue) base
    else base
      .withColumn("rk", expr("conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10)"))
      .orderBy($"rk".asc, $"doc_id".asc).limit(maxDocs).drop("rk")
  }

  /** Whole-corpus report — the oracle-paired entry; correct ONLY at test
    * scale, where exhaustive truth is affordable. */
  def lshQuality(s: SparkSession, dir: String): DataFrame =
    lshQualityCapped(s, dir, Int.MaxValue)

  /** The production form: the O(Σdf²) exhaustive-truth pass is BOUNDED to a
    * deterministic `maxDocs` sample — banding recall/precision is a
    * corpus-level statistic a sample estimates fine, and nothing else about
    * the report needs the full corpus. At 100 TB call THIS with a cap. */
  def lshQualityCapped(s: SparkSession, dir: String, maxDocs: Int): DataFrame = {
    import s.implicits._
    val docs = lshSampleDocs(s, dir, maxDocs)
    // the whole-corpus entry reads the stored shingle index; a capped
    // sample hashes only its sample rows
    val hrows =
      if (maxDocs == Int.MaxValue) shingleIndex(s, dir)
      else graft.Materialize.lazyCut(shingleHashRows(docs))
    val ns = hrows.groupBy($"doc_id").agg(count(lit(1)).as("nsh"))
    val shared = hrows.select($"doc_id".as("da"), $"h")
      .join(hrows.select($"doc_id".as("db"), $"h"), "h")
      .filter($"da" < $"db")
      .groupBy($"da", $"db").agg(count(lit(1)).as("shared"))
    // lazyCut (round 19): truth feeds TWO consumers — the true-pair count
    // and the semi-join against candidates — and without a cut the whole
    // O(Σdf²) exhaustive expansion (the single most expensive subtree of
    // this report) executed once per consumer. The cut computes it once;
    // the declared truth semantics are untouched.
    val truth = graft.Materialize.lazyCut(shared
      .join(ns.select($"doc_id".as("da"), $"nsh".as("na")), "da")
      .join(ns.select($"doc_id".as("db"), $"nsh".as("nb")), "db")
      .filter($"shared".cast("double") / ($"na" + $"nb" - $"shared") >= 0.8)
      .select($"da".as("doc_a"), $"db".as("doc_b")))
    // candidates from the PRODUCTION banding path, fed by the SAME
    // materialized hash rows as the truth side (the corpus is tokenized
    // and hashed exactly once). The band relation is materialized here
    // because TWO consumers read it — the capped candidate expansion and
    // the overflow accounting; elsewhere bands have a single consumer and
    // flow straight into the expansion.
    val bands = graft.Materialize.lazyCut(
      bandRowsFromSigs(signaturesFromHashes(hrows)))
    val cand = lshCandidatesFromBands(bands, LshBucketCap)
    val tp = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true_pairs"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidate_pairs")))
      .crossJoin(tp.agg(count(lit(1)).as("n_true_candidates")))
      .crossJoin(lshOverflowStats(bands, LshBucketCap))
      .selectExpr(
        "n_true_pairs", "n_candidate_pairs", "n_true_candidates",
        "IF(n_true_pairs = 0, cast(1.0 AS double), cast(n_true_candidates AS double) / n_true_pairs) AS recall",
        "IF(n_candidate_pairs = 0, cast(1.0 AS double), cast(n_true_candidates AS double) / n_candidate_pairs) AS precision",
        "n_overflow_buckets", "n_pairs_skipped")
  }
  val lshQualitySql: String =
    s"""${lshCteSql()},
       |hx AS (SELECT doc_id, unnest(shh) AS h FROM shh),
       |ns AS (SELECT doc_id, count(*) AS nsh FROM hx GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM hx a JOIN hx b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT doc_a, doc_b
       |  FROM shared
       |  JOIN ns na ON na.doc_id = doc_a
       |  JOIN ns nb ON nb.doc_id = doc_b
       |  WHERE CAST(shared AS DOUBLE) / (na.nsh + nb.nsh - shared) >= 0.8),
       |tp AS (SELECT count(*) AS n FROM truth JOIN cand USING (doc_a, doc_b)),
       |ovf AS (
       |  SELECT COALESCE(SUM(CASE WHEN c > $LshBucketCap THEN 1 ELSE 0 END), 0) AS n_overflow_buckets,
       |         COALESCE(SUM(CASE WHEN c > $LshBucketCap THEN c * (c - 1) // 2 - ${LshBucketCap.toLong * (LshBucketCap - 1) / 2} ELSE 0 END), 0) AS n_pairs_skipped
       |  FROM (SELECT band_id, band_key, count(*) AS c FROM bands GROUP BY 1, 2) bc),
       |tot AS (SELECT (SELECT count(*) FROM truth) AS n_true_pairs,
       |               (SELECT count(*) FROM cand) AS n_candidate_pairs,
       |               (SELECT n FROM tp) AS n_true_candidates)
       |SELECT n_true_pairs, n_candidate_pairs, n_true_candidates,
       |       CASE WHEN n_true_pairs = 0 THEN CAST(1.0 AS DOUBLE)
       |            ELSE CAST(n_true_candidates AS DOUBLE) / n_true_pairs END AS recall,
       |       CASE WHEN n_candidate_pairs = 0 THEN CAST(1.0 AS DOUBLE)
       |            ELSE CAST(n_true_candidates AS DOUBLE) / n_candidate_pairs END AS precision,
       |       CAST(n_overflow_buckets AS BIGINT) AS n_overflow_buckets,
       |       CAST(n_pairs_skipped AS BIGINT) AS n_pairs_skipped
       |FROM tot CROSS JOIN ovf
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // INCREMENTAL span dedup: a delta batch of documents scored against the
  // STORED corpus span index — the 100 TB operating mode for q_span_dedup,
  // where re-exploding the whole corpus per ingest would dominate. The
  // index is (span-hash → document frequency); the delta probes it with a
  // join, so the work is O(delta spans + matched index entries). Delta
  // spans count toward each other too (two new copies of the same
  // boilerplate must flag each other), so the probe combines the stored
  // df with the delta's own df before thresholding. Result is provably
  // identical to the batch report restricted to delta docs — the oracle
  // IS the restricted batch SQL.
  //
  // The corpus index is a pinned AT-REST artifact (same contract as the
  // trained IVF centroids / PQ codebook in Similarity): a real pipeline
  // maintains it between ingests, so it is built once per (session, dir)
  // and every subsequent invocation times only the O(delta) probe — the
  // work the operator exists to bound. The split is PROPORTIONAL (the last
  // tenth of the id space is the delta) rather than the fixed IncrSplit
  // the pair/cluster incrementals use: a span index probe should stay
  // small relative to the stored corpus at every scale factor, which a
  // fixed absolute split inverts as the corpus grows.
  // ---------------------------------------------------------------------------
  private val spanIdxCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, Long)]

  /** (stored corpus span-hash index, delta split id). Integer-exact split:
    * (max_id + 1) * 9 / 10 in integer arithmetic, so both engines compute
    * the identical boundary. */
  private def corpusSpanIndex(s: SparkSession, dir: String): (DataFrame, Long) =
    graft.Artifacts.cached(spanIdxCache, s, dir) {
      import s.implicits._
      val all = Tables.documents(s, dir).select($"doc_id", $"text")
      val split = (all.agg(max($"doc_id")).first().getLong(0) + 1L) * 9L / 10L
      val idx = graft.Materialize.eager(
        spanRows(all.filter($"doc_id" < split))
          .selectExpr("explode(spans) AS span")
          .select(unhex(md5($"span")).as("h")) // 16-byte key, see spanDedup
          .groupBy($"h").agg(count(lit(1)).as("df_c")),
        pin = true)
      (idx, split)
    }

  /** The delta boundary the incremental span operators use — exposed so
    * specs can restrict the batch report to the same docs. */
  def spanIncrSplit(s: SparkSession, dir: String): Long =
    corpusSpanIndex(s, dir)._2

  def spanDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (corpusIdx, split) = corpusSpanIndex(s, dir)
    val deltaSpans = spanRows(
      Tables.documents(s, dir).select($"doc_id", $"text").filter($"doc_id" >= split))
    val deltaH = graft.Materialize.lazyCut(deltaSpans
      .selectExpr("doc_id", "explode(spans) AS span")
      .select($"doc_id", unhex(md5($"span")).as("h"))) // 16-byte key
    val totalDf = deltaH.groupBy($"h").agg(count(lit(1)).as("df_d"))
      .join(corpusIdx, Seq("h"), "left")
      .select($"h", (coalesce($"df_c", lit(0L)) + $"df_d").as("df"))
    val dup = deltaH.join(totalDf, "h").filter($"df" >= 2)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_dup_spans"))
    spanReport(deltaSpans, dup)
  }
  /** Oracle: the from-scratch batch report, restricted to delta docs —
    * incremental maintenance must be invisible in the result, so the SQL
    * IS the batch SQL plus the delta restriction (same integer-exact
    * proportional boundary). */
  val spanDedupIncrementalSql: String =
    spanDedupSql +
      "WHERE sp.doc_id >= (SELECT ((max(doc_id) + 1) * 9) // 10 FROM documents)\n"

  // ---------------------------------------------------------------------------
  // Soft dedup: weight instead of drop. Training pipelines often keep ONE
  // canonical document per near-dup cluster but preserve the duplication
  // signal as a sample weight (cluster size) for loss re-weighting or
  // epoch budgeting — dropping loses the information that a document was
  // corpus-frequent. Output: one row per kept document (the cluster
  // canonical, or the document itself when it belongs to no cluster) with
  // its integer weight. Scale: the cluster labels are the stored output of
  // the resolution pass; the weight rollup is one count shuffle over
  // (keep_id) — the corpus text is never touched.
  // ---------------------------------------------------------------------------
  def dedupWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = dedupClusters(s, dir).select($"doc_id", $"cluster_id")
    Tables.documents(s, dir).select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select(coalesce($"cluster_id", $"doc_id").as("keep_id"))
      .groupBy($"keep_id")
      .agg(count(lit(1)).as("weight"))
  }
  val dedupWeightsSql: String =
    s"""WITH labels AS (
       |${dedupClustersSql.trim}
       |),
       |full_lbl AS (
       |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS keep_id
       |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id)
       |SELECT keep_id, count(*) AS weight FROM full_lbl GROUP BY keep_id
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Within-document self-dedup: the intra-doc counterpart of segDedup.
  // Scrapes repeat their own boilerplate INSIDE one document (nav blocks,
  // cookie banners, templated footers), which corpus-level dedup cannot
  // see — both occurrences live in the same doc. Segment the doc into
  // SegW-token chunks, count duplicates within the doc, and report the
  // post-trim size. `dup_ratio` is the Gopher-style self-repetition
  // signal; `clean_chars` is the byte budget after keeping each segment
  // once. Deliberately order-free: the kept-segment CHARACTER count is a
  // multiset property, so no engine-specific list ordering can leak into
  // the hash. Scale: pure per-row codegen'd HOFs — zero shuffles, zero
  // joins; the corpus streams through the scan stage once.
  // ---------------------------------------------------------------------------
  def selfDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .withColumn("segs", expr(
        s"transform(sequence(0, (size(toks) - 1) div $SegW), i -> concat_ws(' ', slice(toks, i * $SegW + 1, $SegW)))"))
      .selectExpr("doc_id",
        "size(segs) AS n_segs",
        "size(array_distinct(segs)) AS n_uniq_segs",
        "cast(size(segs) - size(array_distinct(segs)) as double) / size(segs) AS dup_ratio",
        "cast(length(concat_ws(' ', array_distinct(segs))) as bigint) AS clean_chars")
  }
  val selfDedupSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |sg AS (
       |  SELECT doc_id,
       |         list_transform(range(0, ((len(toks) - 1) // $SegW) + 1),
       |                i -> array_to_string(toks[(i * $SegW + 1):(i * $SegW + $SegW)], ' ')) AS segs
       |  FROM tok)
       |SELECT doc_id, len(segs) AS n_segs,
       |       len(list_distinct(segs)) AS n_uniq_segs,
       |       CAST(len(segs) - len(list_distinct(segs)) AS DOUBLE) / len(segs) AS dup_ratio,
       |       CAST(length(array_to_string(list_distinct(segs), ' ')) AS BIGINT) AS clean_chars
       |FROM sg
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Leakage-safe train/val split: the eval-integrity primitive group-aware
  // splitting provides. A per-document hash split routes the two halves of
  // a near-dup pair independently, so duplicated text leaks from train
  // into validation and inflates eval scores. The fix: split on the
  // CLUSTER key — every member of a near-dup cluster (singleton clusters
  // = the doc itself) hashes to the same side, by construction. Output is
  // the per-split audit: doc/cluster counts plus `n_docs_rerouted`, the
  // documents the naive per-doc split would have routed to the OTHER side
  // (each one a leak edge this operator closed).
  // Scale: the cluster labels are the stored resolution artifact (never
  // re-paired here); assignment is a per-row md5 over ids; the rollup is
  // one 2-group aggregate. The corpus text is never touched.
  // ---------------------------------------------------------------------------
  private def md5Bucket(idCol: String): String =
    s"cast(conv(substr(md5(cast(cast($idCol as string) as binary)), 1, 4), 16, 10) as int) % 100"
  def leakageSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = dedupClusters(s, dir).select($"doc_id", $"cluster_id")
    Tables.documents(s, dir).select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("keep_id"))
      .selectExpr("doc_id", "keep_id",
        s"CASE WHEN ${md5Bucket("keep_id")} < 90 THEN 'train' ELSE 'val' END AS split",
        s"CASE WHEN ${md5Bucket("doc_id")} < 90 THEN 'train' ELSE 'val' END AS naive_split")
      .groupBy($"split")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"keep_id").as("n_clusters"),
        sum(when($"naive_split" =!= $"split", 1L).otherwise(0L)).as("n_docs_rerouted"))
  }
  val leakageSplitSql: String =
    s"""WITH labels AS (
       |${dedupClustersSql.trim}
       |),
       |asg AS (
       |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS keep_id
       |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
       |sp AS (
       |  SELECT doc_id, keep_id,
       |         CASE WHEN ('0x' || substr(md5(keep_id::VARCHAR), 1, 4))::INT % 100 < 90
       |              THEN 'train' ELSE 'val' END AS split,
       |         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 < 90
       |              THEN 'train' ELSE 'val' END AS naive_split
       |  FROM asg)
       |SELECT split, count(*) AS n_docs,
       |       count(DISTINCT keep_id) AS n_clusters,
       |       CAST(sum(CASE WHEN naive_split <> split THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_docs_rerouted
       |FROM sp GROUP BY split
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Cross-source near-dup pairs: the leakage detector. A near-dup pair
  // WITHIN a source is redundancy; a near-dup pair ACROSS sources is
  // contamination (a benchmark document leaking into a training crawl, a
  // mirror site double-counted under two source labels). Same LSH-verified
  // pair relation as q_ngram_jaccard (threshold 0.3 — contamination wants
  // recall), with each side's source tagged and same-source pairs dropped.
  // Scale: the pair relation is post-LSH (O(candidates)); tagging is two
  // id-keyed joins of that small relation against the docs projection.
  // ---------------------------------------------------------------------------
  def crossSourceDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"source")
    ngramJaccard(s, dir)
      .join(docs.select($"doc_id".as("doc_a"), $"source".as("source_a")), "doc_a")
      .join(docs.select($"doc_id".as("doc_b"), $"source".as("source_b")), "doc_b")
      .filter($"source_a" =!= $"source_b")
      .select($"doc_a", $"doc_b", $"source_a", $"source_b", $"jaccard")
  }
  val crossSourceDupsSql: String =
    s"""WITH p AS (${ngramJaccardSql.trim})
       |SELECT doc_a, doc_b, da.source AS source_a, db.source AS source_b, jaccard
       |FROM p
       |JOIN documents da ON p.doc_a = da.doc_id
       |JOIN documents db ON p.doc_b = db.doc_id
       |WHERE da.source <> db.source
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Cluster-size histogram: the shape of the duplication — how many dup
  // clusters exist at each size (size 1 = unique docs). Reads the stored
  // weight relation; one tiny aggregate over cluster-count rows. The long
  // tail of this histogram is what decides weight-vs-drop policy.
  // ---------------------------------------------------------------------------
  def clusterSizes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dedupWeights(s, dir)
      .groupBy($"weight".as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
  }
  val clusterSizesSql: String =
    s"""WITH w AS (
       |${dedupWeightsSql.trim}
       |)
       |SELECT weight AS cluster_size, count(*) AS n_clusters
       |FROM w GROUP BY weight
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Dataset-level overlap: how much does source A's shingle set overlap
  // source B's? The sketch answer is a per-source UNION MinHash — each of
  // the K signature slots takes the minimum universal-hash value over ALL
  // of a source's shingles, so a source's sketch is K longs regardless of
  // size, and E[matching slots / K] = Jaccard(A, B). That is the 100 TB
  // path: one groupBy(source) over the shingle-hash relation, then a
  // |sources|² sketch comparison on the driver-sized sketch table. The
  // exact companion (distinct-shingle inverted-index join — per-hash pair
  // expansion bounded by the source count) is emitted beside it, making
  // the query its own quality report, like q_lsh_quality. All outputs are
  // integers or single IEEE divisions of integers, so the oracle
  // hash-matches bit-for-bit.
  // Bench note: at the 500-doc test corpus this query is job-floor-bound
  // (~2 s ≈ scan warmup + one shuffle + one materialize + final assembly,
  // regardless of data volume — the same fixed-overhead class the bench
  // records for sub-second queries); the plan below is the shape that
  // matters at real scale.
  // ---------------------------------------------------------------------------
  def sourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    // ONE corpus pass, ONE corpus-sized shuffle, ONE materialized job:
    // source is carried through the scan stage (no join-back onto the
    // exploded relation); groupBy(h) + collect_set builds, per distinct
    // shingle hash, its sorted source set (arrays bounded by the source
    // count, map-side partial merge keeps the exchange small); and one
    // union-expansion projects each set into BOTH its per-source rows
    // (kind=1 — distinct-shingle counts and sketch minima) and its ordered
    // pair rows (kind=2 — exact intersections), so a single tiny aggregate
    // yields every downstream relation without a self-join shuffle or a
    // second read of the hash index.
    val unionExpr =
      "concat(" +
        "transform(ss, x -> named_struct('kind', 1, 'a', x, 'b', '')), " +
        "flatten(transform(ss, (x, i) -> transform(slice(ss, i + 2, size(ss) - i - 1), " +
        "y -> named_struct('kind', 2, 'a', x, 'b', y)))))"
    val sigAggs = (0 until K).map(i => min((col("h") * A(i) + B(i)) % P).as(s"sig$i"))
    val small = graft.Materialize.lazyCut(
      shingleIndex(s, dir)
        .select($"source", $"h")
        .groupBy($"h").agg(sort_array(collect_set($"source")).as("ss"))
        .select($"h", explode(expr(unionExpr)).as("r"))
        .select($"h", $"r.kind".as("kind"), $"r.a".as("a"), $"r.b".as("b"))
        .groupBy($"kind", $"a", $"b")
        .agg(count(lit(1)).as("cnt"), sigAggs: _*))
    val stats = small.filter($"kind" === 1)
    val inter = small.filter($"kind" === 2)
      .select($"a".as("source_a"), $"b".as("source_b"), $"cnt".as("n_inter"))
    val matchExpr = (0 until K).map(i => s"cast(a$i = b$i as bigint)").mkString(" + ")
    val left = stats.select(($"a".as("source_a") +: $"cnt".as("n_a") +:
      (0 until K).map(i => col(s"sig$i").as(s"a$i"))): _*)
    val right = stats.select(($"a".as("source_b") +: $"cnt".as("n_b") +:
      (0 until K).map(i => col(s"sig$i").as(s"b$i"))): _*)
    left.crossJoin(right).filter($"source_a" < $"source_b")
      .selectExpr("source_a", "source_b", s"$matchExpr AS k_match", "n_a", "n_b")
      .join(inter, Seq("source_a", "source_b"), "left")
      .selectExpr("source_a", "source_b", "k_match",
        s"cast(k_match as double) / $K AS est_jaccard",
        "coalesce(n_inter, 0L) AS n_inter",
        "cast(coalesce(n_inter, 0L) as double) / (n_a + n_b - coalesce(n_inter, 0L)) AS exact_jaccard")
  }
  val sourceOverlapSql: String = {
    val sigExprs = (0 until K).map(i =>
      s"min((h * ${A(i)} + ${B(i)}) % $P) AS sig$i").mkString(",\n       ")
    val matchExpr = (0 until K).map(i =>
      s"CAST(a.sig$i = b.sig$i AS BIGINT)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |shs AS (SELECT doc_id, $shinglesDuck AS sh FROM tok),
       |hr0 AS (SELECT doc_id, unnest($shingleHashDuck) AS h FROM shs),
       |hr AS (SELECT DISTINCT source, h FROM hr0 JOIN documents USING (doc_id)),
       |sigs AS (SELECT source,
       |       $sigExprs
       |FROM hr GROUP BY source),
       |sizes AS (SELECT source, count(*) AS n_sh FROM hr GROUP BY source),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
       |  FROM hr a JOIN hr b USING (h) WHERE a.source < b.source GROUP BY 1, 2),
       |est AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |         $matchExpr AS k_match
       |  FROM sigs a JOIN sigs b ON a.source < b.source)
       |SELECT source_a, source_b, k_match,
       |       CAST(k_match AS DOUBLE) / $K AS est_jaccard,
       |       coalesce(n_inter, 0) AS n_inter,
       |       CAST(coalesce(n_inter, 0) AS DOUBLE)
       |         / (n_a + n_b - coalesce(n_inter, 0)) AS exact_jaccard
       |FROM est
       |LEFT JOIN inter USING (source_a, source_b)
       |JOIN (SELECT source AS source_a, n_sh AS n_a FROM sizes) sa USING (source_a)
       |JOIN (SELECT source AS source_b, n_sh AS n_b FROM sizes) sb USING (source_b)
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Bloom-filter membership probe for incremental exact dedup: the corpus's
  // normalized-content hashes are folded into a STORED bitmap artifact, and
  // a delta batch probes the bitmap BEFORE the (expensive, shuffling)
  // exact anti-join — the standard 100 TB ingest fast-path: the bitmap is a
  // few MB per 10⁹ documents (vs the TB-scale hash index), broadcastable to
  // every executor, and a negative probe (the overwhelming majority of a
  // fresh crawl) skips the corpus join entirely. Bloom guarantees NO FALSE
  // NEGATIVES, so the probe is a safe pre-filter; the query reports both
  // the probe verdict and the exact verdict so the oracle checks the full
  // contract (and the spec pins the no-false-negative invariant).
  //
  // Representation: the bitmap is a RELATION of packed 63-bit words
  // (word_idx → bit_or of 1<<bit) — built distributed (one partial+final
  // bit_or aggregation, never collected), stored as parquet, and read back
  // so the probe's lineage provably starts at the artifact files (the
  // hll/kll/theta at-rest contract). 63-bit words keep every shift off the
  // sign bit, so Spark bigint and DuckDB BIGINT agree. K=4 md5-derived bit
  // positions per key over M=2²⁰ bits; the oracle reproduces the bit
  // arithmetic exactly (set-of-bits form — packing is a layout choice, not
  // semantics). Split is the proportional span-index boundary: corpus =
  // first 9/10 of the id space, delta = the rest.
  // ---------------------------------------------------------------------------
  private val BloomM = 1L << 20 // bits in the filter
  private val BloomK = 4        // hash functions per key
  private val BloomW = 63L      // bits packed per word (sign-safe shifts)

  /** doc_id + 32-hex md5 of whitespace-normalized lowercased text — the
    * same content key q_dedup_normalized groups on. */
  private def normHashRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select($"doc_id",
      md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("nh"))
  }

  /** The K bloom bit positions of one key as an array column expr. */
  private def bloomBitsExpr: String =
    s"transform(sequence(0, ${BloomK - 1}), j -> " +
      s"cast(conv(substr(md5(cast(concat(nh, '#', cast(j as string)) as binary)), 1, 15), 16, 10) as bigint) % ${BloomM}L)"

  private val bloomCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, Long)]

  /** (stored packed-word bitmap artifact, delta split id). Built once per
    * (session, dir), parquet round-trip — probes consume stored bytes.
    * Package-visible so the spec can gate the file-backed lineage. */
  private[graft] def bloomArtifact(s: SparkSession, dir: String): (DataFrame, Long) =
    graft.Artifacts.cached(bloomCache, s, dir) {
      import s.implicits._
      val all = normHashRows(s, dir)
      val split = (Tables.documents(s, dir).agg(max($"doc_id")).first().getLong(0) + 1L) * 9L / 10L
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_bloom_" +
        java.lang.Integer.toHexString(dir.hashCode)
      all.filter($"doc_id" < split)
        .selectExpr(s"explode($bloomBitsExpr) AS bp")
        .selectExpr(s"bp div ${BloomW}L AS widx",
          s"shiftleft(1L, cast(bp % ${BloomW}L as int)) AS b")
        .groupBy($"widx")
        .agg(expr("bit_or(b)").as("w"))
        .write.mode("overwrite").parquet(path)
      (s.read.parquet(path), split)
    }

  /** Delta-batch probe: per delta document, the bloom verdict (all K bits
    * set in the stored bitmap) and the exact verdict (normalized hash
    * present in the corpus). Probe work: |delta|·K rows joined against the
    * broadcast word relation (≤ M/63 rows ≈ 16k); the exact companion is
    * the anti-join the bloom pre-filter would gate at scale — run here for
    * every delta doc so the oracle validates the full truth table. */
  def bloomDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (words, split) = bloomArtifact(s, dir)
    val all = graft.Materialize.lazyCut(normHashRows(s, dir))
    val delta = all.filter($"doc_id" >= split)
    val probe = delta
      .selectExpr("doc_id", s"explode($bloomBitsExpr) AS bp")
      .selectExpr("doc_id", s"bp div ${BloomW}L AS widx",
        s"shiftleft(1L, cast(bp % ${BloomW}L as int)) AS b")
      .join(broadcast(words), Seq("widx"), "left")
      .select($"doc_id",
        (coalesce($"w", lit(0L)).bitwiseAND($"b") =!= 0L).cast("int").as("hit"))
      .groupBy($"doc_id")
      .agg(sum($"hit").as("nhit"))
      .select($"doc_id", ($"nhit" === BloomK).as("bloom_hit"))
    val corpusHashes = all.filter($"doc_id" < split).select($"nh").distinct()
    val exact = delta
      .join(corpusHashes.withColumn("indup", lit(true)), Seq("nh"), "left")
      .select($"doc_id", coalesce($"indup", lit(false)).as("exact_dup"))
    probe.join(exact, "doc_id")
  }
  val bloomDedupSql: String = {
    val bitsDuck =
      s"(('0x' || substr(md5(nh || '#' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % $BloomM)"
    s"""WITH d AS (SELECT doc_id,
       |       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS nh
       |       FROM documents),
       |sp AS (SELECT ((max(doc_id) + 1) * 9) // 10 AS split FROM documents),
       |corpus AS (SELECT * FROM d WHERE doc_id < (SELECT split FROM sp)),
       |delta  AS (SELECT * FROM d WHERE doc_id >= (SELECT split FROM sp)),
       |cbits AS (SELECT DISTINCT $bitsDuck AS bp
       |          FROM corpus, range(0, $BloomK) t(j)),
       |dbits AS (SELECT doc_id, $bitsDuck AS bp
       |          FROM delta, range(0, $BloomK) t(j)),
       |h AS (SELECT db.doc_id, count(cb.bp) AS nhit
       |      FROM dbits db LEFT JOIN cbits cb ON db.bp = cb.bp
       |      GROUP BY db.doc_id)
       |SELECT delta.doc_id,
       |       h.nhit = $BloomK AS bloom_hit,
       |       delta.nh IN (SELECT nh FROM corpus) AS exact_dup
       |FROM delta JOIN h ON delta.doc_id = h.doc_id
       |""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_agreement"   -> dedupAgreement _,
    "q_dedup_roi"         -> dedupRoi _,
    "q_dedup_sweep"       -> dedupThresholdSweep _,
    "q_bloom_dedup"       -> bloomDedup _,
    "q_crossdup"          -> crossSourceDups _,
    "q_cluster_sizes"     -> clusterSizes _,
    "q_dedup_weights"     -> dedupWeights _,
    "q_leakage_split"     -> leakageSplit _,
    "q_selfdedup"         -> selfDedup _,
    "q_source_overlap"    -> sourceOverlap _,
    "q_span_dedup_incr"   -> spanDedupIncremental _,
    "q_lsh_quality"       -> lshQuality _,
    "q_span_dedup"        -> spanDedup _,
    "q_dedup_clusters"    -> dedupClusters _,
    "q_dedup_clusters_incr" -> dedupClustersIncremental _,
    "q_dedup_incremental" -> dedupIncremental _,
    "q_simhash64"         -> simhash64Sigs _,
    "q_dedup_simhash"     -> dedupSimhash _,
    "q_dedup_exact"       -> dedupExact _,
    "q_dedup_normalized"  -> dedupNormalized _,
    "q_minhash_sig"       -> minhashSignatures _,
    "q_dedup_minhash_lsh" -> dedupMinhashLsh _,
    "q_ngram_jaccard"     -> ngramJaccard _,
    "q_simhash"           -> simhash _,
    "q_containment"       -> containmentPairs _,
    "q_seg_dedup"         -> segDedup _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_dedup_agreement"   -> dedupAgreementSql,
    "q_dedup_roi"         -> dedupRoiSql,
    "q_dedup_sweep"       -> dedupThresholdSweepSql,
    "q_bloom_dedup"       -> bloomDedupSql,
    "q_crossdup"          -> crossSourceDupsSql,
    "q_cluster_sizes"     -> clusterSizesSql,
    "q_dedup_weights"     -> dedupWeightsSql,
    "q_leakage_split"     -> leakageSplitSql,
    "q_selfdedup"         -> selfDedupSql,
    "q_source_overlap"    -> sourceOverlapSql,
    "q_span_dedup_incr"   -> spanDedupIncrementalSql,
    "q_lsh_quality"       -> lshQualitySql,
    "q_span_dedup"        -> spanDedupSql,
    "q_dedup_clusters"    -> dedupClustersSql,
    // incremental maintenance must equal the from-scratch batch resolution
    "q_dedup_clusters_incr" -> dedupClustersSql,
    "q_dedup_incremental" -> dedupIncrementalSql,
    "q_simhash64"         -> simhash64SigsSql,
    "q_dedup_simhash"     -> dedupSimhashSql,
    "q_dedup_exact"       -> dedupExactSql,
    "q_dedup_normalized"  -> dedupNormalizedSql,
    "q_minhash_sig"       -> minhashSignaturesSql,
    "q_dedup_minhash_lsh" -> dedupMinhashLshSql,
    "q_ngram_jaccard"     -> ngramJaccardSql,
    "q_simhash"           -> simhashSql,
    "q_containment"       -> containmentPairsSql,
    "q_seg_dedup"         -> segDedupSql,
  )
}
