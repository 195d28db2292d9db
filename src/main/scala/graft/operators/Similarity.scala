package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Similarity search over the `embeddings` table (builder mandate:
  * approximate-nearest-neighbor over an `Array[Float]` column — brute-force
  * cosine top-k as the baseline, an IVF-bucketed variant as the scale path).
  *
  * Scale design:
  *   - Brute force is the correctness baseline: broadcast the (small) query
  *     set against the corpus — one pass over the corpus, per-partition
  *     top-k heaps (`TakeOrderedAndProject`-like via window row_number), no
  *     corpus shuffle. O(|Q| · n · d): fine for |Q| small, dead for all-pairs.
  *   - IVF: corpus is coarse-quantized to C centroids (cluster assignment is
  *     one broadcast join; at 100 TB the assignment is written once as a
  *     bucketed table partitioned by centroid_id). A query then probes only
  *     its centroid's partition — O(n/C · d) per query and, crucially,
  *     partition pruning on the bucketed layout means the scan itself skips
  *     (C-1)/C of the data. Centroids are TRAINED: C = ceil(sqrt(n)) seeds
  *     (the first C corpus vectors — deterministic, no RNG) refined by
  *     [[LloydIters]] Lloyd iterations with order-fixed float folds, so the
  *     DuckDB oracle replays the identical training and every downstream
  *     cosine hash-matches.
  *
  * Determinism: every dot product is a left fold in index order with double
  * accumulation on both engines (Spark: the native `float_dot` kernel, same
  * semantics as `aggregate(zip_with(...))`; DuckDB
  * `list_reduce(list_prepend(...))`) — bit-identical results, so cosine
  * scores hash-match. Rankings tie-break on neighbor id.
  */
object Similarity {

  private val NQUERY  = 10 // benchmark query-set size: vec_id < 10
  private val TOPK    = 5
  private val DIM     = 64 // embedding dimension (testdata contract)
  private val LloydIters = 2

  /** Fixed vec_id bucket width for the two-level ordered mean fold (see
    * [[twoLevelMean]]). Fixed — not a function of n — so the fold tree, and
    * therefore the bit pattern of every mean, depends only on which vec_ids
    * are present, never on corpus size or partitioning. */
  private val FoldW = 1024

  /** IVF centroid count scales with the corpus: C = ceil(sqrt(n)), the
    * standard IVF sizing (keeps both the centroid table and the per-probe
    * partition at O(sqrt(n))). The oracle computes the same C via a scalar
    * subquery. */
  private val cCountSql = "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)"

  /** Spark: native codegen'd dot product ([[graft.functions.FloatDotProduct]])
    * — same left-to-right double-accumulation semantics as the DuckDB fold,
    * without the boxed intermediate array of aggregate(zip_with(...)). */
  private def dotS(a: String, b: String): String = s"float_dot($a, $b)"

  /** Attach an L2 norm column to an embedding relation — per-pair work drops
    * from 3 dot products to 1 dot + 2 lookups. No barrier needed: the norm
    * lives in a Project BELOW the join, and Catalyst never collapses a
    * projection across a join, so it is evaluated once per ROW in the scan
    * stage, never per pair. (An earlier version repartitioned on `id` as a
    * materialization barrier — a full corpus shuffle bought nothing: when a
    * plan references this relation from two subtrees, recomputing an O(d)
    * codegen'd map over data the scan reads anyway is cheaper at any scale
    * than shuffling or block-caching the whole corpus. At rest the norms
    * belong IN the stored bucketed ANN layout, computed at write time.) */
  private def withNorm(df: DataFrame, id: String, emb: String): DataFrame =
    df.selectExpr(s"$id", s"$emb", s"sqrt(${dotS(emb, emb)}) AS ${id}_nrm")

  /** DuckDB: the same fold, element order and accumulator type identical. */
  private def dotD(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (acc, v) -> acc + v)"

  /** Spark dot for (float array, double array) and (double, double) — the
    * trained-centroid cases. [[graft.functions.FloatDotProduct]] accepts
    * both element types with identical fold semantics (widen to double,
    * multiply, accumulate in index order), so these are the same native
    * codegen'd kernel — not the boxed `aggregate(zip_with(...))` fallback. */
  private def dotFD(f: String, d: String): String = s"float_dot($f, $d)"
  private def dotDD(a: String, b: String): String = s"float_dot($a, $b)"

  // ---------------------------------------------------------------------------
  // Two-level ordered mean: the scale-safe exact fold shared by Lloyd
  // training and labelCentroids.
  //
  // A mean that hash-matches a second engine needs a FIXED summation order
  // (float addition is non-associative), and the naive way — collect every
  // group's values into one array and fold ORDER BY vec_id — makes the
  // single-group array the memory unit: with C = √n clusters a group holds
  // √n doubles, which at n = 10¹² is an 8 MB array per (centroid, dim).
  // Instead fold twice, both levels in fixed key order:
  //   level 1: within vec_id buckets of fixed width FoldW — arrays ≤ FoldW;
  //   level 2: the bucket partials in bucket order — arrays = group/FoldW
  //            (√n/1024 at C = √n: ~10³ entries even at n = 10¹²; a third
  //            level generalizes if that ever grows).
  // Both engines run the identical tree, so means are bit-identical BETWEEN
  // engines (they differ from a flat fold — that is fine, the oracle replays
  // this shape). With every vec_id < FoldW (small test corpora) level 2 has
  // one bucket and the result equals the flat fold exactly.
  // ---------------------------------------------------------------------------
  /** (groupCols..., vec_id, v: float) → (groupCols..., m: double, n: long).
    * Shuffles carry (group, bucket) partials — map-side combine applies and
    * no collect_list group grows linearly with the corpus. */
  private def twoLevelMean(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    df.groupBy(g :+ expr(s"vec_id div $FoldW").as("bkt"): _*)
      .agg(collect_list(struct(col("vec_id"), col("v"))).as("vals"),
        count(lit(1)).as("c"))
      .selectExpr(groupCols ++ Seq("bkt",
        "aggregate(transform(array_sort(vals), x -> cast(x.v as double)), cast(0.0 as double), (a, b) -> a + b) AS ps",
        "c"): _*)
      .groupBy(g: _*)
      .agg(collect_list(struct(col("bkt"), col("ps"))).as("pss"), sum(col("c")).as("n"))
      .selectExpr(groupCols ++ Seq(
        "aggregate(transform(array_sort(pss), x -> x.ps), cast(0.0 as double), (a, b) -> a + b) / n AS m",
        "n"): _*)
  }

  /** The DuckDB replay of [[twoLevelMean]]: identical buckets, identical
    * fold order at both levels. `src` is the FROM clause binding
    * (vec_id, embedding); `dim` the vector length to unnest. */
  private def twoLevelMeanDuck(groupA: String, src: String, dim: Int = DIM): String =
    s"""SELECT $groupA, pos,
       |       list_reduce(list_prepend(0.0::DOUBLE, list(ps ORDER BY bkt)), (x, y) -> x + y) / CAST(sum(c) AS BIGINT) AS m,
       |       CAST(sum(c) AS BIGINT) AS n
       |FROM (
       |  SELECT $groupA, i AS pos, vec_id // $FoldW AS bkt,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(embedding[i]::DOUBLE ORDER BY vec_id)), (x, y) -> x + y) AS ps,
       |         count(*) AS c
       |  FROM $src, (SELECT unnest(range(1, ${dim + 1})) AS i) idx
       |  GROUP BY $groupA, i, bkt) lvl1
       |GROUP BY $groupA, pos""".stripMargin

  // ---------------------------------------------------------------------------
  // IVF centroid training: deterministic seeded Lloyd iterations.
  // Seeds = first C corpus vectors; each iteration (a) assigns every vector
  // to its max-cosine centroid (ties on centroid_id), (b) recomputes each
  // cluster's mean per dimension with the two-level ordered fold above, so
  // DuckDB reproduces the trained centroids bit-for-bit. Clusters that lose
  // all members drop out (identically on both engines).
  // Scale: per iteration one broadcast of C·d doubles against the corpus +
  // one shuffle of (centroid, dim, bucket) partial groups; the result is C
  // rows, materialized eagerly so consumers never replay the training.
  // ---------------------------------------------------------------------------
  /** Trained-centroid cache: four queries (assign, knn×2, dedup) share one
    * training per (session, dir) — the checkpointed result is C rows, and
    * retraining per query would quadruple the index-build cost. */
  private val centCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def lloydCentroids(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(centCache, s, dir)(trainLloyd(s, dir))

  private def trainLloyd(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    // Index sizing: one count() — metadata-cheap on parquet (row-group
    // stats), and the only scalar the training needs.
    val c = math.ceil(math.sqrt(e.count().toDouble)).toLong
    val c0 = e.filter($"vec_id" < c)
      .selectExpr("vec_id AS centroid_id", "transform(embedding, v -> cast(v as double)) AS ce")
    val trained = (1 to LloydIters).foldLeft(c0) { (cent, _) =>
      val centN = cent.selectExpr("centroid_id", "ce", s"sqrt(${dotDD("ce", "ce")}) AS cnrm")
      val scored = e
        .selectExpr("vec_id", "embedding", s"sqrt(${dotS("embedding", "embedding")}) AS vnrm")
        .join(broadcast(centN))
        .withColumn("cosine", expr(s"${dotFD("embedding", "ce")} / (vnrm * cnrm)"))
      val w = Window.partitionBy($"vec_id").orderBy($"cosine".desc, $"centroid_id".asc)
      val assign = scored
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"vec_id", $"centroid_id")
      val exploded = e.join(assign, "vec_id")
        .select($"centroid_id", $"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
      twoLevelMean(exploded, Seq("centroid_id", "pos"))
        .groupBy($"centroid_id")
        .agg(collect_list(struct($"pos", $"m")).as("pm"))
        .selectExpr("centroid_id", "transform(array_sort(pm), x -> x.m) AS ce")
    }
    // pin = true: the trained index is a shared, cached artifact (four
    // queries reuse it via centCache) — benchmark hygiene
    // (Materialize.releaseTransient) must not free it between queries.
    graft.Materialize.eager(trained, pin = true)
  }

  /** The oracle's replay of [[lloydCentroids]]: a CTE chain cent0 →
    * (assign1, cent1) → … ending in `cent(centroid_id, ce DOUBLE[])`. */
  private def lloydCteSql: String = {
    val init =
      s"cent0 AS (SELECT vec_id AS centroid_id, list_transform(embedding, v -> v::DOUBLE) AS ce FROM embeddings WHERE vec_id < $cCountSql)"
    val iters = (1 to LloydIters).map { t =>
      val prev = s"cent${t - 1}"
      s"""assign$t AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT e.vec_id, c.centroid_id,
         |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |             ${dotD("e.embedding", "c.ce")} / (sqrt(${dotD("e.embedding", "e.embedding")}) * sqrt(${dotD("c.ce", "c.ce")})) DESC,
         |             c.centroid_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN $prev c) s$t WHERE rn = 1),
         |cent$t AS (
         |  SELECT centroid_id, list(m ORDER BY pos) AS ce FROM (
         |${twoLevelMeanDuck("centroid_id",
               s"(SELECT a.centroid_id, e.vec_id, e.embedding FROM embeddings e JOIN assign$t a ON e.vec_id = a.vec_id) j$t")}
         |  ) u$t GROUP BY centroid_id)""".stripMargin
    }
    (init +: iters).mkString(",\n") +
      s",\ncent AS (SELECT centroid_id, ce FROM cent$LloydIters)"
  }

  // ---------------------------------------------------------------------------
  // Vector stats: dimension, L2 norm, component mean — one codegen'd pass.
  // ---------------------------------------------------------------------------
  def embedNorms(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, dir)
      .selectExpr(
        "vec_id", "label",
        "size(embedding) AS dim",
        s"sqrt(${dotS("embedding", "embedding")}) AS norm_l2",
        s"aggregate(embedding, cast(0.0 as double), (acc, v) -> acc + cast(v as double)) / size(embedding) AS mean_val")
  }
  val embedNormsSql: String =
    s"""SELECT vec_id, label,
       |       len(embedding) AS dim,
       |       sqrt(${dotD("embedding", "embedding")}) AS norm_l2,
       |       list_reduce(list_prepend(0.0::DOUBLE, list_transform(embedding, v -> v::DOUBLE)), (acc, v) -> acc + v) / len(embedding) AS mean_val
       |FROM embeddings
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Brute-force cosine top-k: the exact baseline every ANN variant is
  // measured against. Query set (vec_id < NQUERY) is broadcast; the corpus
  // streams through one stage computing cosine + a per-query top-k.
  // ---------------------------------------------------------------------------
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val q = withNorm(e.filter($"vec_id" < NQUERY), "vec_id", "embedding")
      .toDF("qid", "qe", "qnrm")
    val c = withNorm(e, "vec_id", "embedding").toDF("nid", "ne", "nnrm")
    val scored = broadcast(q).join(c, $"qid" =!= $"nid")
      .withColumn("cosine", expr(s"${dotS("qe", "ne")} / (qnrm * nnrm)"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"nid".asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TOPK)
      .select($"qid", $"rank", $"nid", $"cosine")
  }
  val knnBruteSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NQUERY),
       |c AS (SELECT vec_id AS nid, embedding AS ne FROM embeddings),
       |scored AS (
       |  SELECT qid, nid,
       |         ${dotD("qe", "ne")} / (sqrt(${dotD("qe", "qe")}) * sqrt(${dotD("ne", "ne")})) AS cosine
       |  FROM q JOIN c ON qid <> nid
       |),
       |ranked AS (
       |  SELECT qid, nid, cosine,
       |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
       |  FROM scored
       |)
       |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= $TOPK
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // IVF cluster assignment: nearest of C deterministic centroids by cosine.
  // ---------------------------------------------------------------------------
  /** Centroid ranking per vector — rn=1 is the cluster assignment, rn<=p is
    * the probe list for nprobe=p searches. */
  private def rankedAssign(s: SparkSession, dir: String): DataFrame =
    rankedAssignOf(s, dir, Tables.embeddings(s, dir))

  /** Same ranking against the trained centroids for an arbitrary vector
    * relation — the incremental-maintenance entry point: a delta of new
    * vectors probes the STORED index without touching the corpus. */
  private def rankedAssignOf(s: SparkSession, dir: String, src: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = src
    val cent = lloydCentroids(s, dir)
      .selectExpr("centroid_id", "ce", s"sqrt(${dotDD("ce", "ce")}) AS cnrm")
    val scored = withNorm(e, "vec_id", "embedding").toDF("vec_id", "embedding", "vnrm")
      .join(broadcast(cent))
      .withColumn("cosine", expr(s"${dotFD("embedding", "ce")} / (vnrm * cnrm)"))
    val w = Window.partitionBy($"vec_id").orderBy($"cosine".desc, $"centroid_id".asc)
    scored.withColumn("rn", row_number().over(w))
      .select($"vec_id", $"centroid_id", $"cosine", $"rn")
  }

  def ivfAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rankedAssign(s, dir)
      .filter($"rn" === 1)
      .select($"vec_id", $"centroid_id", $"cosine".as("centroid_cosine"))
  }
  val ivfAssignSql: String =
    s"""WITH $lloydCteSql,
       |scored AS (
       |  SELECT e.vec_id, centroid_id,
       |         ${dotD("e.embedding", "ce")} / (sqrt(${dotD("e.embedding", "e.embedding")}) * sqrt(${dotD("ce", "ce")})) AS cosine
       |  FROM embeddings e CROSS JOIN cent
       |),
       |ranked AS (
       |  SELECT vec_id, centroid_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
       |  FROM scored
       |)
       |SELECT vec_id, centroid_id, cosine AS centroid_cosine FROM ranked WHERE rn = 1
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // IVF top-k: probe only the query's own cluster (nprobe=1). At scale the
  // corpus side is a table bucketed by centroid_id, so the probe is a
  // partition-pruned scan + broadcast of the queries — no corpus shuffle.
  // ---------------------------------------------------------------------------
  def knnIvf(s: SparkSession, dir: String): DataFrame = knnIvfProbed(s, dir, 1)

  /** nprobe=2 variant — the standard IVF recall knob: a query searches its
    * 2 nearest clusters (2/C of the corpus) instead of 1. Cost scales
    * linearly in nprobe. Recall caveat (SimilaritySpec): the benchmark
    * query set overlaps the Lloyd seeds, inflating its recall (~0.80→0.88
    * with nprobe); the honest metric is unbiased-query recall vs probed
    * fraction — ~5.5× lift over random probing on this (near-orthogonal,
    * unclustered) corpus. */
  def knnIvf2(s: SparkSession, dir: String): DataFrame = knnIvfProbed(s, dir, 2)

  private def knnIvfProbed(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    import s.implicits._
    val ranked = rankedAssign(s, dir)
    val assign = ranked.filter($"rn" === 1).select($"vec_id", $"centroid_id")
    val e = withNorm(Tables.embeddings(s, dir), "vec_id", "embedding")
      .toDF("vec_id", "embedding", "nrm")
    val corpus = e.join(assign, "vec_id")
      .select($"vec_id".as("nid"), $"centroid_id", $"embedding".as("ne"), $"nrm".as("nnrm"))
    // query side probes its top-nprobe clusters; corpus membership stays rn=1
    val queries = e.filter($"vec_id" < NQUERY)
      .join(ranked.filter($"rn" <= nprobe).select($"vec_id", $"centroid_id"), "vec_id")
      .select($"vec_id".as("qid"), $"centroid_id", $"embedding".as("qe"), $"nrm".as("qnrm"))
    val scored = broadcast(queries)
      .join(corpus, Seq("centroid_id"))
      .filter($"qid" =!= $"nid")
      .withColumn("cosine", expr(s"${dotS("qe", "ne")} / (qnrm * nnrm)"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"nid".asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TOPK)
      .select($"qid", $"rank", $"nid", $"cosine")
  }
  private def knnIvfSqlFor(nprobe: Int): String =
    s"""WITH $lloydCteSql,
       |scored0 AS (
       |  SELECT e.vec_id, centroid_id,
       |         ${dotD("e.embedding", "ce")} / (sqrt(${dotD("e.embedding", "e.embedding")}) * sqrt(${dotD("ce", "ce")})) AS cosine
       |  FROM embeddings e CROSS JOIN cent
       |),
       |rankedc AS (
       |  SELECT vec_id, centroid_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
       |  FROM scored0
       |),
       |corpus AS (
       |  SELECT e.vec_id AS nid, a.centroid_id, e.embedding AS ne
       |  FROM embeddings e JOIN rankedc a ON e.vec_id = a.vec_id AND a.rn = 1
       |),
       |queries AS (
       |  SELECT e.vec_id AS qid, a.centroid_id, e.embedding AS qe
       |  FROM embeddings e JOIN rankedc a ON e.vec_id = a.vec_id AND a.rn <= $nprobe
       |  WHERE e.vec_id < $NQUERY
       |),
       |scored AS (
       |  SELECT qid, nid, q.centroid_id,
       |         ${dotD("qe", "ne")} / (sqrt(${dotD("qe", "qe")}) * sqrt(${dotD("ne", "ne")})) AS cosine
       |  FROM queries q JOIN corpus c ON q.centroid_id = c.centroid_id AND qid <> nid
       |),
       |ranked AS (
       |  SELECT qid, nid, cosine,
       |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
       |  FROM scored
       |)
       |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= $TOPK
       |""".stripMargin
  val knnIvfSql: String = knnIvfSqlFor(1)
  val knnIvf2Sql: String = knnIvfSqlFor(2)

  // ---------------------------------------------------------------------------
  // Product quantization: the memory-bounded serving path (FAISS-style
  // IVF-PQ is the standard 100 TB ANN layout). The corpus is split into
  // PQSubs subvectors; each subspace trains a PQCodes-entry codebook
  // (deterministic k-means: seeds = first PQCodes subvectors, refined by
  // one Lloyd iteration with the two-level ordered mean fold), and every
  // vector is stored as PQSubs one-byte codes — a 64-dim float vector
  // compresses 32×. Search is asymmetric distance computation (ADC): the
  // query's exact subvectors are compared against the codebook ONCE
  // (PQSubs × PQCodes lookup table, broadcast), and each corpus vector's
  // approximate distance is the sub_id-ordered fold of its 8 table
  // lookups — the scan reads codes, never embeddings.
  // Determinism: squared L2 uses the dot identity (3 float_dot kernel
  // calls combined in one fixed expression — bit-identical on both
  // engines); the ADC sum folds its 8 terms in sub_id order; assignment
  // ties break on code id. The oracle replays training, encoding, and
  // search exactly. (Oracle CTE is written for PQIters = 1 — change both
  // in lockstep.)
  // ---------------------------------------------------------------------------
  private val PQSubs   = 8
  private val PQSubDim = DIM / PQSubs
  private val PQCodes  = 16
  private val PQIters  = 1

  /** Squared L2 via the dot identity — elementwise difference folds would
    * need their own cross-engine ordering pact; dot products already have
    * one (the float_dot kernel / its DuckDB fold twin). */
  private def l2S(a: String, c: String): String =
    s"(float_dot($a, $a) - 2 * float_dot($a, $c) + float_dot($c, $c))"
  private def l2D(a: String, c: String): String =
    s"(${dotD(a, a)} - 2 * ${dotD(a, c)} + ${dotD(c, c)})"

  /** (vec_id, sub_id, sv): a relation exploded into its PQ subvectors. */
  private def subvecs(e: DataFrame): DataFrame =
    e.select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${PQSubs - 1}), s -> struct(s AS sub_id, slice(embedding, s * $PQSubDim + 1, $PQSubDim) AS sv))")).as("x"))
      .select(col("vec_id"), col("x.sub_id").as("sub_id"), col("x.sv").as("sv"))

  /** Codebook cache — same contract as the IVF centroid cache: trained
    * once per (session, dir), pinned so benchmark hygiene keeps it. */
  private val pqCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def pqCodebook(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(pqCache, s, dir)(trainPq(s, dir))

  private def trainPq(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val sv = subvecs(Tables.embeddings(s, dir))
    val cb0 = sv.filter($"vec_id" < PQCodes)
      .selectExpr("sub_id", "vec_id AS code", "transform(sv, v -> cast(v as double)) AS ce")
    val trained = (1 to PQIters).foldLeft(cb0) { (cb, _) =>
      val scored = sv.join(broadcast(cb), "sub_id")
        .withColumn("dist", expr(l2S("sv", "ce")))
      val w = Window.partitionBy($"vec_id", $"sub_id").orderBy($"dist".asc, $"code".asc)
      val assign = scored.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"vec_id", $"sub_id", $"code")
      val exploded = sv.join(assign, Seq("vec_id", "sub_id"))
        .select($"sub_id", $"code", $"vec_id", posexplode($"sv").as(Seq("pos", "v")))
      twoLevelMean(exploded, Seq("sub_id", "code", "pos"))
        .groupBy($"sub_id", $"code")
        .agg(collect_list(struct($"pos", $"m")).as("pm"))
        .selectExpr("sub_id", "code", "transform(array_sort(pm), x -> x.m) AS ce")
    }
    graft.Materialize.eager(trained, pin = true)
  }

  /** (vec_id, sub_id, code, dist) against the trained codebook — rn=1 per
    * (vector, subspace). Cached + pinned like the codebook: the corpus
    * encoding is the second index artifact, and without the cache every
    * consumer (the three PQ queries, every streaming micro-batch) would
    * re-scan embeddings and re-run the assignment window. At rest this is
    * the stored code table of the writeAnnLayout shape. */
  private val pqCodesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def pqAssignRaw(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(pqCodesCache, s, dir) {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      val sv = subvecs(Tables.embeddings(s, dir))
      val scored = sv.join(broadcast(pqCodebook(s, dir)), "sub_id")
        .withColumn("dist", expr(l2S("sv", "ce")))
      val w = Window.partitionBy($"vec_id", $"sub_id").orderBy($"dist".asc, $"code".asc)
      graft.Materialize.eager(
        scored.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
          .select($"vec_id", $"sub_id", $"code", $"dist"),
        pin = true)
    }

  def pqEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pqAssignRaw(s, dir)
      .select($"vec_id", $"sub_id".cast("long").as("sub_id"), $"code",
        $"dist".as("code_dist"))
  }

  def knnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    knnPqFor(s, dir, Tables.embeddings(s, dir).filter($"vec_id" < NQUERY))
  }

  /** PQ ADC top-k for an ARBITRARY query relation (vec_id, embedding) —
    * the benchmark query set above, or a micro-batch of live queries
    * ([[graft.streaming.AnnEnrich]]). Scoring is row-independent per qid,
    * so batching the query side any way yields identical rows. A query
    * whose vec_id collides with a corpus id excludes that corpus row
    * (self-match suppression — the corpus-query contract). vec_id is the
    * query IDENTITY: duplicate ids are collapsed before scoring (a
    * re-submitted id would otherwise double every ADC term into 16 folds
    * per neighbor instead of 8), and the survivor is picked
    * DETERMINISTICALLY — the lexicographically smallest embedding array
    * wins — so a micro-batch that happens to carry the same id with two
    * different embeddings scores the same embedding on every run and in
    * the batch-over-union replay the streaming spec asserts. */
  def knnPqFor(s: SparkSession, dir: String, queries: DataFrame): DataFrame = {
    import s.implicits._
    // `queries` may live in a DIFFERENT session than `s` — streaming
    // micro-batches run in a cloned session with its own function registry,
    // so float_dot must be registered there too or the query-side
    // expressions fail to resolve
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val corpus = pqAssignRaw(s, dir)
      .select($"vec_id".as("nid"), $"sub_id", $"code")
    val wq = Window.partitionBy($"vec_id").orderBy($"embedding".asc)
    val distinctQ = queries.select($"vec_id", $"embedding")
      .withColumn("qrn", row_number().over(wq)).filter($"qrn" === 1).drop("qrn")
    val q = subvecs(distinctQ).toDF("qid", "sub_id", "qsv")
    // the ADC lookup table: |Q| × PQSubs × PQCodes exact query-to-centroid
    // distances — tiny, broadcast once; the corpus side joins on its codes
    val terms = q.join(broadcast(pqCodebook(s, dir)), "sub_id")
      .withColumn("term", expr(l2S("qsv", "ce")))
      .select($"qid", $"sub_id", $"code", $"term")
    val approx = corpus.join(broadcast(terms), Seq("sub_id", "code"))
      .groupBy($"qid", $"nid")
      .agg(collect_list(struct($"sub_id", $"term")).as("ts"))
      .selectExpr("qid", "nid",
        "aggregate(transform(array_sort(ts), x -> x.term), cast(0.0 as double), (a, b) -> a + b) AS adist")
    val w = Window.partitionBy($"qid").orderBy($"adist".asc, $"nid".asc)
    approx.filter($"qid" =!= $"nid")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TOPK)
      .select($"qid", $"rank", $"nid", $"adist")
  }

  // ---------------------------------------------------------------------------
  // IVF-PQ: the composed serving query — coarse quantizer prunes the corpus
  // to the query's cluster (1/C of the data; a partition-pruned file scan
  // on the writeAnnLayout shape), PQ codes supply the distances inside it
  // (no embedding reads). This is the standard billion-scale ANN stack;
  // both index artifacts are the cached/pinned ones the other queries use.
  // ---------------------------------------------------------------------------
  def knnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assign = ivfAssign(s, dir).select($"vec_id", $"centroid_id")
    val corpus = pqAssignRaw(s, dir)
      .select($"vec_id".as("nid"), $"sub_id", $"code")
      .join(assign.select($"vec_id".as("nid"), $"centroid_id"), "nid")
    val q = subvecs(Tables.embeddings(s, dir).filter($"vec_id" < NQUERY))
      .toDF("qid", "sub_id", "qsv")
      .join(assign.filter($"vec_id" < NQUERY)
        .select($"vec_id".as("qid"), $"centroid_id"), "qid")
    val terms = q.join(broadcast(pqCodebook(s, dir)), "sub_id")
      .withColumn("term", expr(l2S("qsv", "ce")))
      .select($"qid", $"centroid_id", $"sub_id", $"code", $"term")
    val approx = corpus.join(broadcast(terms), Seq("centroid_id", "sub_id", "code"))
      .groupBy($"qid", $"nid")
      .agg(collect_list(struct($"sub_id", $"term")).as("ts"))
      .selectExpr("qid", "nid",
        "aggregate(transform(array_sort(ts), x -> x.term), cast(0.0 as double), (a, b) -> a + b) AS adist")
    val w = Window.partitionBy($"qid").orderBy($"adist".asc, $"nid".asc)
    approx.filter($"qid" =!= $"nid")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TOPK)
      .select($"qid", $"rank", $"nid", $"adist")
  }

  val knnIvfPqSql: String =
    s"""WITH $lloydCteSql,
       |iscored AS (
       |  SELECT e.vec_id, centroid_id,
       |         ${dotD("e.embedding", "ce")} / (sqrt(${dotD("e.embedding", "e.embedding")}) * sqrt(${dotD("ce", "ce")})) AS cosine
       |  FROM embeddings e CROSS JOIN cent),
       |iassign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT vec_id, centroid_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
       |    FROM iscored) t WHERE rn = 1),
       |$pqCteSql,
       |enc AS (
       |  SELECT vec_id AS nid, sub_id, code FROM (
       |    SELECT v.vec_id, v.sub_id, c.code,
       |           row_number() OVER (PARTITION BY v.vec_id, v.sub_id ORDER BY ${l2D("v.sv", "c.ce")} ASC, c.code ASC) AS rn
       |    FROM sv v JOIN pqcb c ON v.sub_id = c.sub_id) t WHERE rn = 1),
       |corpus AS (SELECT e.nid, a.centroid_id, e.sub_id, e.code
       |           FROM enc e JOIN iassign a ON e.nid = a.vec_id),
       |q AS (
       |  SELECT s.vec_id AS qid, a.centroid_id, s.sub_id, s.sv AS qsv
       |  FROM sv s JOIN iassign a ON s.vec_id = a.vec_id
       |  WHERE s.vec_id < $NQUERY),
       |terms AS (
       |  SELECT qid, q.centroid_id, c.sub_id, c.code, ${l2D("qsv", "c.ce")} AS term
       |  FROM q JOIN pqcb c ON q.sub_id = c.sub_id),
       |approx AS (
       |  SELECT qid, nid,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY t.sub_id)), (x, y) -> x + y) AS adist
       |  FROM corpus v JOIN terms t
       |    ON v.centroid_id = t.centroid_id AND v.sub_id = t.sub_id AND v.code = t.code
       |  GROUP BY qid, nid),
       |ranked AS (
       |  SELECT qid, nid, adist,
       |         row_number() OVER (PARTITION BY qid ORDER BY adist ASC, nid ASC) AS rank
       |  FROM approx WHERE qid <> nid)
       |SELECT qid, rank, nid, adist FROM ranked WHERE rank <= $TOPK
       |""".stripMargin

  /** Shared oracle CTE prefix: subvectors → seed codebook → one Lloyd
    * iteration (assignment + two-level mean) → `pqcb(sub_id, code, ce)`. */
  private def pqCteSql: String = {
    val meanSrc = "(SELECT a.sub_id, a.code, v.vec_id, v.sv AS embedding " +
      "FROM sv v JOIN pqassign1 a ON v.vec_id = a.vec_id AND v.sub_id = a.sub_id) jpq"
    s"""sv AS (
       |  SELECT vec_id, s.sub_id, embedding[s.sub_id * $PQSubDim + 1 : s.sub_id * $PQSubDim + $PQSubDim] AS sv
       |  FROM embeddings, (SELECT unnest(range(0, $PQSubs)) AS sub_id) s),
       |pqcb0 AS (
       |  SELECT sub_id, vec_id AS code, list_transform(sv, v -> v::DOUBLE) AS ce
       |  FROM sv WHERE vec_id < $PQCodes),
       |pqassign1 AS (
       |  SELECT vec_id, sub_id, code FROM (
       |    SELECT v.vec_id, v.sub_id, c.code,
       |           row_number() OVER (PARTITION BY v.vec_id, v.sub_id ORDER BY ${l2D("v.sv", "c.ce")} ASC, c.code ASC) AS rn
       |    FROM sv v JOIN pqcb0 c ON v.sub_id = c.sub_id) t WHERE rn = 1),
       |pqcb AS (
       |  SELECT sub_id, code, list(m ORDER BY pos) AS ce FROM (
       |${twoLevelMeanDuck("sub_id, code", meanSrc, PQSubDim)}
       |  ) u GROUP BY sub_id, code)""".stripMargin
  }

  val pqEncodeSql: String =
    s"""WITH $pqCteSql,
       |enc AS (
       |  SELECT v.vec_id, v.sub_id, c.code, ${l2D("v.sv", "c.ce")} AS code_dist,
       |         row_number() OVER (PARTITION BY v.vec_id, v.sub_id ORDER BY ${l2D("v.sv", "c.ce")} ASC, c.code ASC) AS rn
       |  FROM sv v JOIN pqcb c ON v.sub_id = c.sub_id)
       |SELECT vec_id, sub_id, code, code_dist FROM enc WHERE rn = 1
       |""".stripMargin

  val knnPqSql: String =
    s"""WITH $pqCteSql,
       |enc AS (
       |  SELECT vec_id AS nid, sub_id, code FROM (
       |    SELECT v.vec_id, v.sub_id, c.code,
       |           row_number() OVER (PARTITION BY v.vec_id, v.sub_id ORDER BY ${l2D("v.sv", "c.ce")} ASC, c.code ASC) AS rn
       |    FROM sv v JOIN pqcb c ON v.sub_id = c.sub_id) t WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, sub_id, sv AS qsv FROM sv WHERE vec_id < $NQUERY),
       |terms AS (
       |  SELECT qid, c.sub_id, c.code, ${l2D("qsv", "c.ce")} AS term
       |  FROM q JOIN pqcb c ON q.sub_id = c.sub_id),
       |approx AS (
       |  SELECT qid, nid,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY t.sub_id)), (x, y) -> x + y) AS adist
       |  FROM enc e JOIN terms t ON e.sub_id = t.sub_id AND e.code = t.code
       |  GROUP BY qid, nid),
       |ranked AS (
       |  SELECT qid, nid, adist,
       |         row_number() OVER (PARTITION BY qid ORDER BY adist ASC, nid ASC) AS rank
       |  FROM approx WHERE qid <> nid)
       |SELECT qid, rank, nid, adist FROM ranked WHERE rank <= $TOPK
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // At-rest ANN layout: the 100 TB serving shape the scaladoc above argues
  // for, as a library function. One pass computes the L2 norm (so withNorm's
  // query-time compute disappears from the probe path) and the trained
  // cluster assignment, written partitioned by centroid_id — a probe then
  // partition-prunes to its cluster's files and reads precomputed norms.
  // ScaleSpec proves the pruning (probe scans 1 of C partition dirs).
  // ---------------------------------------------------------------------------
  def writeAnnLayout(s: SparkSession, dir: String, out: String): Unit = {
    import s.implicits._
    val assign = ivfAssign(s, dir).select($"vec_id", $"centroid_id")
    withNorm(Tables.embeddings(s, dir), "vec_id", "embedding")
      .toDF("vec_id", "embedding", "nrm")
      .join(assign, "vec_id")
      .write.mode("overwrite").partitionBy("centroid_id").parquet(out)
  }

  // ---------------------------------------------------------------------------
  // Per-label centroids: explode to (label, pos, value) and mean per group.
  // Determinism: float→decimal casts round differently at the last digit
  // between engines (shortest-repr vs raw-double rounding), so instead each
  // mean is the [[twoLevelMean]] ordered fold — same doubles, same fold tree
  // on both engines, bit-identical result, and no per-group array that grows
  // linearly with the corpus (a label's members all land in one group).
  // ---------------------------------------------------------------------------
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exploded = Tables.embeddings(s, dir)
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("pos0", "v")))
      .select($"vec_id", $"label", ($"pos0" + 1).cast("long").as("pos"), $"v")
    twoLevelMean(exploded, Seq("label", "pos"))
      .selectExpr("label", "pos", "m AS centroid_val", "n")
  }
  val labelCentroidsSql: String =
    s"""SELECT label, pos, m AS centroid_val, n FROM (
       |${twoLevelMeanDuck("label", "embeddings")}
       |) t
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Per-dimension embedding QA stats: n, mean, min, max for each of the DIM
  // coordinates — the first report run on any embedding ingest (a dead
  // dimension, a clipped range, or a mean far off zero flags an upstream
  // encoder bug before anything downstream trains on it). Mean uses the
  // [[twoLevelMean]] ordered fold (bit-identical between engines); min/max
  // are order-free extremes, exact on any plan. Scale: one posexplode pass,
  // shuffles carry (pos, bucket) partials — map-side combine applies.
  // ---------------------------------------------------------------------------
  def embedDimStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exploded = Tables.embeddings(s, dir)
      .select($"vec_id", posexplode($"embedding").as(Seq("pos0", "v")))
      .select($"vec_id", ($"pos0" + 1).cast("long").as("pos"), $"v",
        lit(0L).as("g"))
    val means = twoLevelMean(exploded, Seq("g", "pos"))
    val ext = exploded.groupBy($"pos")
      .agg(
        min($"v".cast("double")).as("min_val"),
        max($"v".cast("double")).as("max_val"))
    means.join(ext, "pos")
      .selectExpr("pos", "n", "m AS mean_val", "min_val", "max_val")
  }
  val embedDimStatsSql: String =
    s"""SELECT t.pos, t.n, t.m AS mean_val, x.min_val, x.max_val
       |FROM (
       |${twoLevelMeanDuck("g", "(SELECT 0 AS g, vec_id, embedding FROM embeddings) gs")}
       |) t
       |JOIN (
       |  SELECT i AS pos,
       |         min(embedding[i]::DOUBLE) AS min_val,
       |         max(embedding[i]::DOUBLE) AS max_val
       |  FROM embeddings, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx
       |  GROUP BY i) x ON t.pos = x.pos
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Embedding anisotropy: how far the corpus sits from its own mean
  // direction. Contextual encoders are notoriously anisotropic — vectors
  // crowd a narrow cone, so cosine similarities are inflated corpus-wide
  // and ANN thresholds tuned on one corpus break on the next. The standard
  // one-number diagnostic: the corpus mean vector's norm (0 for an
  // isotropic cloud) and the average cosine of each vector to that mean.
  //
  // ONE corpus pass, by algebra: the mean cosine to the centroid c factors
  //   (1/n) Σᵢ (vᵢ·c)/(|vᵢ||c|)  =  ((1/n) Σᵢ vᵢ/|vᵢ|) · c / |c|  =  nm · c / |c|
  // so the scan only needs TWO per-dimension means — the raw centroid
  // (c = mean of v) and the normalized mean (nm = mean of v/|v|) — which
  // fold in the SAME two-level ordered bucket tree over one posexplode.
  // Everything after is d-vector arithmetic on one row. Exactness: the
  // per-row norm is the codegen'd left-to-right dot fold, the division
  // v/|v| is one IEEE op, and both fold trees and the final dot are
  // replayed verbatim by the oracle. (The previous two-pass form —
  // centroid, then per-vector cosines re-scanning the corpus — computed
  // the same diagnostic with twice the scans and a broadcast join.)
  // ---------------------------------------------------------------------------
  def anisotropy(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val exploded = withNorm(Tables.embeddings(s, dir), "vec_id", "embedding")
      .toDF("vec_id", "embedding", "vnrm")
      .select($"vec_id", $"vnrm", posexplode($"embedding").as(Seq("pos0", "v")))
      .selectExpr("vec_id", "cast(pos0 + 1 as long) AS pos",
        "cast(v as double) AS v", "cast(v as double) / vnrm AS vn")
    val lvl1 = exploded
      .groupBy($"pos", expr(s"vec_id div $FoldW").as("bkt"))
      .agg(collect_list(struct($"vec_id", $"v", $"vn")).as("vals"),
        count(lit(1)).as("c"))
      .selectExpr("pos", "bkt",
        "aggregate(transform(array_sort(vals), x -> x.v), cast(0.0 as double), (a, b) -> a + b) AS psv",
        "aggregate(transform(array_sort(vals), x -> x.vn), cast(0.0 as double), (a, b) -> a + b) AS psn",
        "c")
    val lvl2 = lvl1.groupBy($"pos")
      .agg(collect_list(struct($"bkt", $"psv", $"psn")).as("pss"),
        sum($"c").as("n"))
      .selectExpr("pos",
        "aggregate(transform(array_sort(pss), x -> x.psv), cast(0.0 as double), (a, b) -> a + b) / n AS mv",
        "aggregate(transform(array_sort(pss), x -> x.psn), cast(0.0 as double), (a, b) -> a + b) / n AS mn",
        "n")
    lvl2
      .agg(collect_list(struct($"pos", $"mv", $"mn")).as("pm"),
        min($"n").as("n_vecs"))
      .selectExpr(
        "transform(array_sort(pm), x -> x.mv) AS ce",
        "transform(array_sort(pm), x -> x.mn) AS nm",
        "n_vecs")
      .selectExpr("n_vecs",
        s"sqrt(${dotDD("ce", "ce")}) AS centroid_norm",
        s"${dotDD("nm", "ce")} AS dnc")
      .selectExpr("n_vecs", "centroid_norm", "dnc / centroid_norm AS mean_cos")
  }
  val anisotropySql: String =
    s"""WITH base AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotD("embedding", "embedding")}) AS vnrm
       |  FROM embeddings),
       |ex AS (
       |  SELECT vec_id, i AS pos, embedding[i]::DOUBLE AS v,
       |         embedding[i]::DOUBLE / vnrm AS vn
       |  FROM base, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx),
       |lvl1 AS (
       |  SELECT pos, vec_id // $FoldW AS bkt,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(v ORDER BY vec_id)), (x, y) -> x + y) AS psv,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(vn ORDER BY vec_id)), (x, y) -> x + y) AS psn,
       |         count(*) AS c
       |  FROM ex GROUP BY pos, bkt),
       |lvl2 AS (
       |  SELECT pos,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(psv ORDER BY bkt)), (x, y) -> x + y) / CAST(sum(c) AS BIGINT) AS mv,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(psn ORDER BY bkt)), (x, y) -> x + y) / CAST(sum(c) AS BIGINT) AS mn,
       |         CAST(sum(c) AS BIGINT) AS n
       |  FROM lvl1 GROUP BY pos),
       |vecs AS (
       |  SELECT list(mv ORDER BY pos) AS ce, list(mn ORDER BY pos) AS nm,
       |         min(n) AS n_vecs
       |  FROM lvl2)
       |SELECT n_vecs, sqrt(${dotD("ce", "ce")}) AS centroid_norm,
       |       ${dotD("nm", "ce")} / sqrt(${dotD("ce", "ce")}) AS mean_cos
       |FROM vecs
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Coverage (diversity) sampling: one representative per IVF cell. Dedup
  // removes redundancy; coverage sampling is its positive complement — a
  // small subset that still touches every region of embedding space (seed
  // sets for labeling, eval panels, k-center-style curation). The
  // representative is the cell member with the smallest md5 hash rank — a
  // deterministic "random" pick that is reproducible across engines, runs,
  // and partitionings, unlike rand(). Scale: the assignment is the stored
  // IVF artifact; the pick is one windowed pass partitioned by cell —
  // shuffle carries (cell, id, 4-byte rank prefix), never vectors.
  // ---------------------------------------------------------------------------
  def coverageSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val asg = ivfAssign(s, dir).select($"vec_id", $"centroid_id")
      .withColumn("hk", expr("md5(cast(cast(vec_id as string) as binary))"))
    val w = Window.partitionBy($"centroid_id").orderBy($"hk".asc, $"vec_id".asc)
    asg
      .withColumn("rn", row_number().over(w))
      .withColumn("cell_n", count(lit(1)).over(Window.partitionBy($"centroid_id")))
      .filter($"rn" === 1)
      .select($"centroid_id", $"vec_id".as("rep_vec_id"), $"cell_n")
  }
  val coverageSampleSql: String =
    s"""WITH assign AS (${ivfAssignSql.trim}),
       |ranked AS (
       |  SELECT centroid_id, vec_id,
       |         row_number() OVER (PARTITION BY centroid_id
       |                            ORDER BY md5(vec_id::VARCHAR) ASC, vec_id ASC) AS rn,
       |         count(*) OVER (PARTITION BY centroid_id) AS cell_n
       |  FROM assign)
       |SELECT centroid_id, vec_id AS rep_vec_id, cell_n
       |FROM ranked WHERE rn = 1
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Embedding-cosine near-duplicate pairs (dedup-family mandate): all pairs
  // with cosine ≥ 0.35 (corpus is near-orthogonal random; a real near-dup corpus would use ~0.95), blocked by IVF cluster — the vector analogue of
  // MinHash-LSH banding. Scale: pair work is per-cluster O((n/C)²) instead
  // of O(n²); tighter recall needs nprobe>1 or multiple quantizers, same
  // query shape. (Testdata plants near-identical vectors; they co-cluster.)
  // ---------------------------------------------------------------------------
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val assign = ivfAssign(s, dir).select($"vec_id", $"centroid_id")
    val corpus = withNorm(Tables.embeddings(s, dir), "vec_id", "embedding")
      .toDF("vec_id", "embedding", "nrm")
      .join(assign, "vec_id")
    val a = corpus.select($"vec_id".as("vec_a"), $"centroid_id", $"embedding".as("ea"), $"nrm".as("anrm"))
    val b = corpus.select($"vec_id".as("vec_b"), $"centroid_id", $"embedding".as("eb"), $"nrm".as("bnrm"))
    a.join(b, Seq("centroid_id"))
      .filter($"vec_a" < $"vec_b")
      .withColumn("cosine", expr(s"${dotS("ea", "eb")} / (anrm * bnrm)"))
      .filter($"cosine" >= 0.35)
      .select($"vec_a", $"vec_b", $"cosine")
  }
  val dedupEmbeddingSql: String =
    s"""WITH $lloydCteSql,
       |scored0 AS (
       |  SELECT e.vec_id, centroid_id,
       |         ${dotD("e.embedding", "ce")} / (sqrt(${dotD("e.embedding", "e.embedding")}) * sqrt(${dotD("ce", "ce")})) AS cosine
       |  FROM embeddings e CROSS JOIN cent
       |),
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT vec_id, centroid_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
       |    FROM scored0) t WHERE rn = 1
       |),
       |corpus AS (
       |  SELECT e.vec_id, a.centroid_id, e.embedding
       |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
       |)
       |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |       ${dotD("x.embedding", "y.embedding")} / (sqrt(${dotD("x.embedding", "x.embedding")}) * sqrt(${dotD("y.embedding", "y.embedding")})) AS cosine
       |FROM corpus x JOIN corpus y
       |  ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
       |WHERE ${dotD("x.embedding", "y.embedding")} / (sqrt(${dotD("x.embedding", "x.embedding")}) * sqrt(${dotD("y.embedding", "y.embedding")})) >= 0.35
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // kNN graph construction (SemDeDup-style semantic clustering input): every
  // vector's top-3 same-cluster neighbors by cosine — the directed graph
  // that semantic dedup, diversity sampling, and graph-based curation
  // methods consume. Same IVF blocking as dedupEmbedding (pair work is
  // O(Σ cluster²), never O(n²)); the per-node top-k is a row_number window
  // partitioned on the source vector, which shares the block join's
  // partitioning. Recall caveat identical to the blocked near-dup pass:
  // neighbors in other clusters are unseen (nprobe>1 widens it).
  // ---------------------------------------------------------------------------
  def knnGraph(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val assign = ivfAssign(s, dir).select($"vec_id", $"centroid_id")
    val corpus = withNorm(Tables.embeddings(s, dir), "vec_id", "embedding")
      .toDF("vec_id", "embedding", "nrm")
      .join(assign, "vec_id")
    val a = corpus.select($"vec_id".as("src"), $"centroid_id",
      $"embedding".as("ea"), $"nrm".as("anrm"))
    val b = corpus.select($"vec_id".as("nbr"), $"centroid_id",
      $"embedding".as("eb"), $"nrm".as("bnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"src").orderBy($"cosine".desc, $"nbr".asc)
    a.join(b, Seq("centroid_id"))
      .filter($"src" =!= $"nbr")
      .withColumn("cosine", expr(s"${dotS("ea", "eb")} / (anrm * bnrm)"))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter($"rnk" <= 3)
      .select($"src", $"rnk", $"nbr", $"cosine")
  }
  val knnGraphSql: String =
    s"""WITH $lloydCteSql,
       |scored0 AS (
       |  SELECT e.vec_id, centroid_id,
       |         ${dotD("e.embedding", "ce")} / (sqrt(${dotD("e.embedding", "e.embedding")}) * sqrt(${dotD("ce", "ce")})) AS cosine
       |  FROM embeddings e CROSS JOIN cent
       |),
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT vec_id, centroid_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
       |    FROM scored0) t WHERE rn = 1
       |),
       |corpus AS (
       |  SELECT e.vec_id, a.centroid_id, e.embedding
       |  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
       |),
       |scored AS (
       |  SELECT x.vec_id AS src, y.vec_id AS nbr,
       |         ${dotD("x.embedding", "y.embedding")} / (sqrt(${dotD("x.embedding", "x.embedding")}) * sqrt(${dotD("y.embedding", "y.embedding")})) AS cosine
       |  FROM corpus x JOIN corpus y
       |    ON x.centroid_id = y.centroid_id AND x.vec_id <> y.vec_id
       |),
       |ranked AS (
       |  SELECT src, CAST(row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nbr ASC) AS INT) AS rnk,
       |         nbr, cosine
       |  FROM scored
       |)
       |SELECT src, rnk, nbr, cosine FROM ranked WHERE rnk <= 3
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Link prediction on the kNN graph — common-neighbor Jaccard: for every
  // non-adjacent pair (u,v) sharing at least one neighbor, score =
  // |N(u)∩N(v)| / |N(u)∪N(v)|; top-20 predicted links. The graph-side QA
  // twin of the embedding-space kNN: pairs the index did NOT connect but
  // whose neighborhoods overlap are likely missed near-neighbors (IVF
  // blocking recall gaps surface here first).
  // Scale: the undirected edge list is O(n·k); the common-neighbor join
  // keys on the shared neighbor w, so per-w pair expansion is deg(w)² —
  // out-degree is capped at k by construction, and a hub cap on in-degree
  // (the DFCap idiom from the rare-shingle index) bounds the worst case if
  // a corpus produces popularity hubs. Integer counts, one IEEE division,
  // deterministic (score, u, v) ordering.
  // ---------------------------------------------------------------------------
  def linkPrediction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = knnGraph(s, dir).select($"src", $"nbr")
    // one kNN-graph execution feeds the union's both branches + three
    // consumers below
    val und = graft.Materialize.lazyCut(
      g.selectExpr("src AS u", "nbr AS w")
        .union(g.selectExpr("nbr AS u", "src AS w"))
        .distinct())
    val deg = und.groupBy($"u").agg(count(lit(1)).as("deg"))
    val cand = und.as("a").join(und.as("b"),
        $"a.w" === $"b.w" && $"a.u" < $"b.u")
      .groupBy($"a.u".as("u"), $"b.u".as("v"))
      .agg(count(lit(1)).cast("long").as("cn"))
    val adj = und.selectExpr("least(u, w) AS u", "greatest(u, w) AS v").distinct()
    cand.join(adj, Seq("u", "v"), "left_anti")
      .join(deg.selectExpr("u", "deg AS deg_u"), "u")
      .join(deg.selectExpr("u AS v", "deg AS deg_v"), "v")
      .selectExpr("u", "v", "cn",
        "CAST(cn AS DOUBLE) / (deg_u + deg_v - cn) AS score")
      .orderBy($"score".desc, $"u".asc, $"v".asc)
      .limit(20)
  }
  val linkPredictionSql: String =
    s"""WITH g0 AS ($knnGraphSql),
       |g AS (SELECT src, nbr FROM g0),
       |und AS (SELECT DISTINCT u, w FROM (
       |  SELECT src AS u, nbr AS w FROM g
       |  UNION ALL SELECT nbr AS u, src AS w FROM g)),
       |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY u),
       |cand AS (
       |  SELECT a.u AS u, b.u AS v, CAST(count(*) AS BIGINT) AS cn
       |  FROM und a JOIN und b ON a.w = b.w AND a.u < b.u
       |  GROUP BY a.u, b.u),
       |adj AS (SELECT DISTINCT least(u, w) AS u, greatest(u, w) AS v FROM und)
       |SELECT c.u, c.v, cn,
       |       CAST(cn AS DOUBLE) / (du.deg + dv.deg - cn) AS score
       |FROM cand c
       |JOIN deg du ON c.u = du.u
       |JOIN deg dv ON c.v = dv.u
       |WHERE NOT EXISTS (SELECT 1 FROM adj WHERE adj.u = c.u AND adj.v = c.v)
       |ORDER BY score DESC, c.u ASC, c.v ASC LIMIT 20
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // SemDeDup keep-list (Abbas et al. 2023): the end-to-end semantic-dedup
  // recipe composed from the machinery above — IVF-blocked cosine pairs
  // (the vector LSH analogue) feed the same distributed star-contraction
  // used for text near-dup clusters, and each duplicate component keeps
  // its canonical (minimum-id) member. Output is the curation verdict per
  // vector: component id + keep flag; singleton vectors (no near-dup) are
  // not listed — at 100 TB the keep-list anti-joins the corpus, so
  // emitting only members of duplicate components keeps it small.
  // ---------------------------------------------------------------------------
  def semdedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = dedupEmbedding(s, dir)
      .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b"))
    Dedup.resolveClusters(pairs)._1
      .select($"doc_id".as("vec_id"), $"cluster_id",
        $"is_canonical".as("keep"))
  }
  val semdedupSql: String =
    s"""WITH RECURSIVE pairs AS (
       |$dedupEmbeddingSql
       |),
       |edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT vec_b AS src, vec_a AS dst FROM pairs
       |),
       |reach AS (
       |  SELECT src AS id, src AS comp FROM edges
       |  UNION
       |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id
       |)
       |SELECT id AS vec_id, min(comp) AS cluster_id, (id = min(comp)) AS keep
       |FROM reach GROUP BY id
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // SRP-LSH: signed-random-projection (random-hyperplane) locality-sensitive
  // hashing, Charikar STOC 2002 — the third candidate-generation scheme next
  // to IVF (coarse quantization) and PQ (compression). Each vector reduces
  // to a SrpBits-bit signature whose b-th bit is the sign of its projection
  // onto a deterministic pseudo-random hyperplane; P[bits differ] = θ/π, so
  // near vectors collide on whole bands of bits. Banding SrpBits into
  // SrpBands byte buckets (classic OR-of-ANDs LSH) yields candidates from
  // bucket equi-joins alone — the same shape as the MinHash-LSH text path
  // (Dedup.scala), but over the embedding space.
  // Scale: embeddings never shuffle — the banding shuffle carries
  // (vec_id, band, key) triples only; at rest the banded keys belong in the
  // stored ANN layout next to the IVF assignment (writeAnnLayout). Search =
  // SrpBands bucket joins + exact re-rank of the (small) candidate set.
  // Tuning (measured on the synthetic corpus, sweep in round-7 notes):
  // byte-wide bands keep buckets at n/256 so candidates stay ~b·n/256
  // (sub-linear per band count); narrower bands double recall but admit a
  // third of the corpus as candidates — the wrong trade at scale. 64 bits
  // in 8 byte-bands is the standard config: a true near-dup (cos ≥ 0.9,
  // θ ≤ 26°, per-bit agreement ≥ 0.86) collides with prob ≥ 1-(1-0.86⁸)⁸
  // ≈ 0.93, while random pairs collide at ~8/256. Weak-similarity top-k
  // (this corpus's unplanted neighbors) is NOT SRP's regime — q_ann_recall
  // quantifies exactly that gap against the trained-IVF paths.
  // Determinism: hyperplane component hp(b,i) is a Knuth multiplicative
  // hash mapped to [-0.5, 0.5): (b·8191+i)·2654435761 mod 2³¹ stays exact
  // in BIGINT (max ~7e14, no overflow) and /2³¹ is a power-of-two division,
  // exact in double; the projection folds dims in index order with double
  // accumulation on both engines, so signatures are bit-identical and the
  // DuckDB oracle reproduces the exact candidate sets. The 64-bit signature
  // travels as two 32-bit halves — a single MSB-first 64-bit fold would
  // overflow BIGINT's sign bit, which DuckDB rejects rather than wraps.
  // ---------------------------------------------------------------------------
  private val SrpHalf  = 32                 // bits per signature half
  private val SrpBands = 8                  // 8 bands × 8 bits over 64 bits
  // band j: byte (3 - j%4) of half (j/4) — MSB-first within each half
  private val srpByteDiv = Seq(16777216L, 65536L, 256L, 1L)

  /** Spark signature half: the native fused kernel
    * ([[graft.functions.SrpSignature]]) — whole-stage-codegen'd, unlike the
    * equivalent nested higher-order fold below, which evaluates ~2·10⁴
    * boxed lambdas per row (33× slower on the sf0.1 corpus; the spec
    * asserts bit-equality of the two forms). */
  private def srpSigS(e: String, off: Int): String = s"srp_sig($e, $off)"

  /** The HOF reference form of [[srpSigS]] — kept for the equality spec and
    * as executable documentation of the kernel's exact fold semantics. */
  private[graft] def srpSigHofS(e: String, off: Int): String =
    s"""aggregate(sequence($off, ${off + SrpHalf - 1}), CAST(0 AS BIGINT), (acc, b) ->
       |  acc * 2 + IF(aggregate(sequence(1, size($e)), CAST(0.0 AS DOUBLE), (a, i) ->
       |    a + CAST(element_at($e, i) AS DOUBLE) *
       |        (CAST(((b * 8191 + i) * 2654435761) % 2147483648 AS DOUBLE) / 2147483648.0 - 0.5)
       |  ) >= 0.0, CAST(1 AS BIGINT), CAST(0 AS BIGINT)))""".stripMargin

  /** DuckDB replay: identical bit order, fold order, and hash arithmetic. */
  private def srpSigD(e: String, off: Int): String =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range($off, ${off + SrpHalf}), b ->
       |  CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($e)+1), i ->
       |      $e[i]::DOUBLE * (CAST(((b*8191 + i) * 2654435761) % 2147483648 AS DOUBLE)/2147483648.0 - 0.5)
       |    )), (a, v) -> a + v) >= 0.0 THEN 1::BIGINT ELSE 0::BIGINT END
       |)), (acc, bit) -> acc * 2 + bit)""".stripMargin

  def srpSig(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "label",
        s"${srpSigS("embedding", 0)} AS sig_hi",
        s"${srpSigS("embedding", SrpHalf)} AS sig_lo")
  }
  val srpSigSql: String =
    s"""SELECT vec_id, label,
       |       ${srpSigD("embedding", 0)} AS sig_hi,
       |       ${srpSigD("embedding", SrpHalf)} AS sig_lo
       |FROM embeddings
       |""".stripMargin

  /** (vec_id, band, key): the LSH bucket relation — all that ever shuffles. */
  private def srpBanded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    srpSig(s, dir)
      .select($"vec_id", posexplode(expr(
        s"""transform(sequence(0, ${SrpBands - 1}), j ->
           |  CAST((IF(j < 4, sig_hi, sig_lo)
           |        div element_at(array(${srpByteDiv.map(d => s"CAST($d AS BIGINT)").mkString(", ")}), j % 4 + 1)) % 256 AS INT))""".stripMargin)))
      .toDF("vec_id", "band", "key")
  }

  /** SRP top-k: bucket-join candidates, exact cosine re-rank. A query with
    * no band collisions simply returns fewer than TOPK rows (identically in
    * the oracle). The candidate set is tiny next to the corpus, so AQE
    * picks a broadcast for the re-rank joins at runtime — the corpus is
    * touched only by the two scans (banding + embedding lookup). */
  def knnSrp(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val banded = srpBanded(s, dir)
    val qb = banded.filter($"vec_id" < NQUERY).toDF("qid", "band", "key")
    val cand = broadcast(qb)
      .join(banded.toDF("nid", "band", "key"), Seq("band", "key"))
      .filter($"qid" =!= $"nid")
      .select($"qid", $"nid").distinct()
    val e = withNorm(Tables.embeddings(s, dir), "vec_id", "embedding")
    val q = e.toDF("qid", "qe", "qnrm")
    val c = e.toDF("nid", "ne", "nnrm")
    val scored = cand.join(broadcast(q.filter($"qid" < NQUERY)), "qid").join(c, "nid")
      .withColumn("cosine", expr(s"${dotS("qe", "ne")} / (qnrm * nnrm)"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"nid".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TOPK)
      .select($"qid", $"rank", $"nid", $"cosine")
  }
  val knnSrpSql: String =
    s"""WITH sigs AS (SELECT vec_id,
       |  ${srpSigD("embedding", 0)} AS sig_hi,
       |  ${srpSigD("embedding", SrpHalf)} AS sig_lo
       |  FROM embeddings),
       |banded AS (
       |  SELECT vec_id, band,
       |         CAST(((CASE WHEN which = 0 THEN sig_hi ELSE sig_lo END) // d) % 256 AS INT) AS key
       |  FROM sigs CROSS JOIN (VALUES ${(0 until SrpBands).map(j => s"($j, ${j / 4}, ${srpByteDiv(j % 4)}::BIGINT)").mkString(", ")}) AS bands(band, which, d)
       |),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM banded q JOIN banded c ON q.band = c.band AND q.key = c.key
       |  WHERE q.vec_id < $NQUERY AND q.vec_id <> c.vec_id
       |),
       |scored AS (
       |  SELECT qid, nid,
       |         ${dotD("qe", "ne")} / (sqrt(${dotD("qe", "qe")}) * sqrt(${dotD("ne", "ne")})) AS cosine
       |  FROM cand JOIN (SELECT vec_id, embedding AS qe FROM embeddings) q ON qid = q.vec_id
       |            JOIN (SELECT vec_id, embedding AS ne FROM embeddings) c ON nid = c.vec_id
       |),
       |ranked AS (
       |  SELECT qid, nid, cosine,
       |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
       |  FROM scored
       |)
       |SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= $TOPK
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // ANN recall report: every approximate path (IVF nprobe=1/2, SRP-LSH)
  // measured against the brute-force truth — the serving-quality twin of the
  // MinHash tuner (Dedup.lshQuality). All outputs are integer hit counts
  // (recall = hits/truth_pairs), so the gate is exact-arithmetic; the same
  // query set at 100 TB is a held-out sample, and each path reuses its
  // stored index (pinned centroids here, the bucketed layout at rest).
  // ---------------------------------------------------------------------------
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val truth = knnBrute(s, dir).select($"qid", $"nid")
    def hits(df: DataFrame, as: String) =
      df.select($"qid", $"nid").join(truth, Seq("qid", "nid"))
        .agg(count(lit(1)).as(as))
    val total = truth.agg(count(lit(1)).as("truth_pairs"))
    total
      .crossJoin(broadcast(hits(knnIvf(s, dir), "hits_ivf1")))
      .crossJoin(broadcast(hits(knnIvf2(s, dir), "hits_ivf2")))
      .crossJoin(broadcast(hits(knnSrp(s, dir), "hits_srp")))
      .select(lit(TOPK).cast("long").as("k"), $"truth_pairs",
        $"hits_ivf1", $"hits_ivf2", $"hits_srp")
  }
  val annRecallSql: String =
    s"""WITH truth AS (SELECT qid, nid FROM (${knnBruteSql.trim}) t),
       |ivf1 AS (SELECT qid, nid FROM (${knnIvfSqlFor(1).trim}) t),
       |ivf2 AS (SELECT qid, nid FROM (${knnIvfSqlFor(2).trim}) t),
       |srp AS (SELECT qid, nid FROM (${knnSrpSql.trim}) t)
       |SELECT CAST($TOPK AS BIGINT) AS k,
       |       (SELECT count(*) FROM truth) AS truth_pairs,
       |       (SELECT count(*) FROM ivf1 JOIN truth USING (qid, nid)) AS hits_ivf1,
       |       (SELECT count(*) FROM ivf2 JOIN truth USING (qid, nid)) AS hits_ivf2,
       |       (SELECT count(*) FROM srp JOIN truth USING (qid, nid)) AS hits_srp
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Int8 scalar quantization (SQ8) — the standard 4× compression step for
  // embedding storage/serving (FAISS ScalarQuantizer, Milvus/pgvector SQ8):
  // per-dimension min/max over the corpus define an affine grid; each float
  // becomes an 8-bit code c = ⌊(v−mn)·255/span + ½⌋. The search path scores
  // against DEQUANTIZED vectors (mn + c·span/255) so the stored index is
  // pure int8 + a 2·d-double codebook, and q_sq8_recall reports per-query
  // recall@k against the float brute-force truth — the quantization-loss
  // twin of q_ann_recall's index-loss report.
  //
  // Exactness: min/max of floats are exact; the quantize and dequantize
  // expressions are shared-order IEEE arithmetic (floor, not round —
  // half-up rounding of a positive grid offset, identical both engines);
  // codes are integers, so the dequantized doubles and their cosines are
  // bit-identical across engines. Scale: the codebook is one 2·d-double
  // row (broadcast); quantization is a map; at rest the codes column IS
  // the stored index (4× smaller scans than float32).
  // ---------------------------------------------------------------------------
  /** One-row SQ8 codebook: per-dimension min and span as ordered arrays
    * (see [[sq8CodebookOf]] for training on an arbitrary vector slice). */
  private def sq8Codebook(s: SparkSession, dir: String): DataFrame =
    sq8CodebookOf(Tables.embeddings(s, dir))
  private val sq8CodeSpark =
    "transform(embedding, (v, i) -> CASE WHEN element_at(span_arr, i+1) > CAST(0.0 AS DOUBLE)" +
      " THEN CAST(floor((CAST(v AS DOUBLE) - element_at(mn_arr, i+1)) * CAST(255.0 AS DOUBLE) / element_at(span_arr, i+1) + CAST(0.5 AS DOUBLE)) AS BIGINT)" +
      " ELSE CAST(0 AS BIGINT) END)"
  private val sq8DeqSpark =
    "transform(codes, (c, i) -> element_at(mn_arr, i+1) + CAST(c AS DOUBLE) * element_at(span_arr, i+1) / CAST(255.0 AS DOUBLE))"
  private val sq8CodeDuck =
    "list_transform(range(1, len(embedding)+1), i -> CASE WHEN span_arr[i] > CAST(0.0 AS DOUBLE)" +
      " THEN CAST(floor((embedding[i]::DOUBLE - mn_arr[i]) * CAST(255.0 AS DOUBLE) / span_arr[i] + CAST(0.5 AS DOUBLE)) AS BIGINT)" +
      " ELSE CAST(0 AS BIGINT) END)"
  private val sq8DeqDuck =
    "list_transform(range(1, len(codes)+1), i -> mn_arr[i] + CAST(codes[i] AS DOUBLE) * span_arr[i] / CAST(255.0 AS DOUBLE))"

  def sq8Recall(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val dq = Tables.embeddings(s, dir)
      .crossJoin(broadcast(sq8Codebook(s, dir)))
      .selectExpr("vec_id", s"$sq8CodeSpark AS codes", "mn_arr", "span_arr")
      .selectExpr("vec_id", s"$sq8DeqSpark AS dq")
      .selectExpr("vec_id", "dq", s"sqrt(${dotDD("dq", "dq")}) AS nrm")
    val q = dq.filter($"vec_id" < NQUERY).toDF("qid", "qe", "qnrm")
    val c = dq.toDF("nid", "ne", "nnrm")
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"nid".asc)
    val sel = broadcast(q).join(c, $"qid" =!= $"nid")
      .withColumn("cosine", expr(s"${dotDD("qe", "ne")} / (qnrm * nnrm)"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= TOPK)
      .select($"qid", $"nid")
    // truth is NQUERY·k rows by construction — broadcast both result-side
    // joins so no stats-blind SMJ exchange appears between tiny relations
    val truth = knnBrute(s, dir).select($"qid", $"nid")
    val hits = sel.join(broadcast(truth), Seq("qid", "nid"))
      .groupBy($"qid").agg(count(lit(1)).as("h"))
    truth.select($"qid").distinct()
      .join(broadcast(hits), Seq("qid"), "left")
      .selectExpr("qid", s"CAST($TOPK AS BIGINT) AS k",
        "coalesce(h, 0L) AS hits",
        s"CAST(coalesce(h, 0L) AS DOUBLE) / CAST($TOPK AS DOUBLE) AS recall")
  }
  val sq8RecallSql: String =
    s"""WITH stats AS (
       |  SELECT pos, min(v) AS mn, max(v) AS mx
       |  FROM (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
       |        FROM embeddings) u
       |  GROUP BY pos),
       |art AS (
       |  SELECT list(CAST(mn AS DOUBLE) ORDER BY pos) AS mn_arr,
       |         list(CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE) ORDER BY pos) AS span_arr
       |  FROM stats),
       |coded AS (
       |  SELECT vec_id, $sq8CodeDuck AS codes, mn_arr, span_arr
       |  FROM embeddings, art),
       |dqt AS (
       |  SELECT vec_id, $sq8DeqDuck AS dq FROM coded),
       |nrm AS (
       |  SELECT vec_id, dq, sqrt(${dotD("dq", "dq")}) AS nrm FROM dqt),
       |scored AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |         ${dotD("q.dq", "c.dq")} / (q.nrm * c.nrm) AS cosine
       |  FROM nrm q JOIN nrm c ON q.vec_id < $NQUERY AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT qid, nid,
       |         row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
       |  FROM scored),
       |sel AS (SELECT qid, nid FROM ranked WHERE rank <= $TOPK),
       |truth AS (SELECT qid, nid FROM (${knnBruteSql.trim}) t),
       |hits AS (SELECT qid, count(*) AS h FROM sel JOIN truth USING (qid, nid) GROUP BY qid)
       |SELECT qid, CAST($TOPK AS BIGINT) AS k,
       |       coalesce(h, 0) AS hits,
       |       CAST(coalesce(h, 0) AS DOUBLE) / CAST($TOPK AS DOUBLE) AS recall
       |FROM (SELECT DISTINCT qid FROM truth) q LEFT JOIN hits USING (qid)
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // SQ8 drift: quantize a DELTA batch against the STORED codebook — the
  // incremental-maintenance twin of q_sq8_recall (same 90/10 vec_id split
  // convention as the other _incr passes). New vectors whose components
  // fall outside the frozen [mn, mn+span] grid produce out-of-range raw
  // codes; the per-vector clip count is the retraining signal every
  // quantized index needs (FAISS's "retrain when distribution shifts"
  // rule made measurable). At rest the codebook is a 2·d-double artifact;
  // scoring a delta is a stateless broadcast map — no corpus access.
  // ---------------------------------------------------------------------------
  private def sq8CodebookOf(src: DataFrame): DataFrame = {
    val s = src.sparkSession
    import s.implicits._
    src.select(posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"pos").agg(min($"v").as("mn"), max($"v").as("mx"))
      .agg(collect_list(struct($"pos", $"mn", $"mx")).as("rows"))
      .selectExpr(
        "transform(array_sort(rows), x -> CAST(x.mn AS DOUBLE)) AS mn_arr",
        "transform(array_sort(rows), x -> CAST(x.mx AS DOUBLE) - CAST(x.mn AS DOUBLE)) AS span_arr")
  }

  def sq8Drift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val split = e.selectExpr("((max(vec_id) + 1) * 9) div 10 AS sp")
    val corpus = e.join(broadcast(split), $"vec_id" < $"sp", "inner")
      .select($"vec_id", $"embedding")
    val delta = e.join(broadcast(split), $"vec_id" >= $"sp", "inner")
      .select($"vec_id", $"embedding")
    delta.crossJoin(broadcast(sq8CodebookOf(corpus)))
      .selectExpr("vec_id", "size(embedding) AS dim", s"$sq8CodeSpark AS codes")
      .selectExpr("vec_id", "CAST(dim AS BIGINT) AS dim",
        "CAST(size(filter(codes, c -> c < 0 OR c > 255)) AS BIGINT) AS n_clipped")
      .selectExpr("vec_id", "dim", "n_clipped",
        "CAST(n_clipped AS DOUBLE) / CAST(dim AS DOUBLE) AS clip_rate")
  }
  val sq8DriftSql: String =
    s"""WITH sp AS (SELECT ((max(vec_id) + 1) * 9) // 10 AS sp FROM embeddings),
       |stats AS (
       |  SELECT pos, min(v) AS mn, max(v) AS mx
       |  FROM (SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
       |        FROM embeddings, sp WHERE vec_id < sp) u
       |  GROUP BY pos),
       |art AS (
       |  SELECT list(CAST(mn AS DOUBLE) ORDER BY pos) AS mn_arr,
       |         list(CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE) ORDER BY pos) AS span_arr
       |  FROM stats),
       |coded AS (
       |  SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, $sq8CodeDuck AS codes
       |  FROM embeddings, sp, art WHERE vec_id >= sp)
       |SELECT vec_id, dim,
       |       CAST(len(list_filter(codes, c -> c < 0 OR c > 255)) AS BIGINT) AS n_clipped,
       |       CAST(CAST(len(list_filter(codes, c -> c < 0 OR c > 255)) AS BIGINT) AS DOUBLE)
       |         / CAST(dim AS DOUBLE) AS clip_rate
       |FROM coded
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack/Clarke/Buettcher
  // SIGIR 2009) of a lexical and a semantic ranking over the SAME corpus —
  // the testdata contract aligns doc_id ≡ vec_id, so a query document has
  // both a token set and an embedding. Lexical list: df-capped rare-token
  // overlap via an inverted-index self-join (common tokens are stopword-
  // pruned at df > LexDfCap — the posting-list cap that keeps the join
  // sub-quadratic at 100 TB, same policy as the rare-shingle containment
  // index). Semantic list: brute-force cosine top-k (swap in the IVF/SRP
  // path for scale — identical fusion). RRF score = Σ 1/(K + rank): each
  // reciprocal is one correctly-rounded IEEE division from exact integers
  // and the two terms add in fixed lexical-then-semantic order, so both
  // engines agree bit-for-bit.
  // ---------------------------------------------------------------------------
  private val RrfK     = 60   // the standard RRF damping constant
  private val LexTop   = 10
  private val LexDfCap = 100
  private val rrfScore =
    s"coalesce(cast(1.0 as double) / ($RrfK + lex_rank), cast(0.0 as double))" +
      s" + coalesce(cast(1.0 as double) / ($RrfK + sem_rank), cast(0.0 as double))"

  /** The lexical arm + RRF fusion, parameterized over the semantic ranking
    * — `sem` must carry (qid, nid, rank). [[hybridRrf]] fuses the
    * brute-force list (the quality ceiling); [[hybridRrfAnn]] fuses the
    * SRP-LSH list ([[knnSrp]]) — the 100 TB serving configuration, where
    * the semantic arm probes the banded index instead of scanning the
    * corpus per query. Identical fusion arithmetic by construction. */
  private def hybridFuse(s: SparkSession, dir: String, sem0: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(array_distinct(expr(Tok.toksExpr))).as("t"))
    val kept = toks.join(
      toks.groupBy($"t").agg(count(lit(1)).as("df")).filter($"df" <= LexDfCap), "t")
    val ov = kept.filter($"doc_id" < NQUERY).select($"doc_id".as("qid"), $"t")
      .join(kept.select($"doc_id".as("nid"), $"t"), "t")
      .filter($"qid" =!= $"nid")
      .groupBy($"qid", $"nid").agg(count(lit(1)).as("overlap"))
    val wl = Window.partitionBy($"qid").orderBy($"overlap".desc, $"nid".asc)
    val lex = ov.withColumn("lex_rank", row_number().over(wl).cast("long"))
      .filter($"lex_rank" <= LexTop).select($"qid", $"nid", $"lex_rank")
    val sem = sem0.select($"qid", $"nid", $"rank".as("sem_rank"))
    val fused = lex.join(sem, Seq("qid", "nid"), "full_outer")
      .withColumn("rrf_score", expr(rrfScore))
    val wf = Window.partitionBy($"qid").orderBy($"rrf_score".desc, $"nid".asc)
    fused.withColumn("rank", row_number().over(wf).cast("long"))
      .filter($"rank" <= LexTop)
      .select($"qid", $"rank", $"nid".as("doc_id"), $"rrf_score",
        $"lex_rank", $"sem_rank")
  }

  def hybridRrf(s: SparkSession, dir: String): DataFrame =
    hybridFuse(s, dir, knnBrute(s, dir))

  /** Hybrid retrieval with the ANN semantic arm: the SRP-LSH banded index
    * supplies the semantic list, so no per-query corpus scan survives —
    * this is the shape that serves at 100 TB. Oracle-paired the same way
    * (the DuckDB twin replays the SRP signatures bit-exactly). */
  def hybridRrfAnn(s: SparkSession, dir: String): DataFrame =
    hybridFuse(s, dir, knnSrp(s, dir))

  /** SQL twin, parameterized over the semantic subquery text. */
  private def hybridRrfSqlWith(semSql: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(${Tok.toksDuck})) AS t FROM documents),
       |kept AS (
       |  SELECT doc_id, t FROM toks
       |  JOIN (SELECT t, count(*) AS df FROM toks GROUP BY t) dfx USING (t)
       |  WHERE df <= $LexDfCap),
       |ov AS (
       |  SELECT q.doc_id AS qid, c.doc_id AS nid, count(*) AS overlap
       |  FROM kept q JOIN kept c USING (t)
       |  WHERE q.doc_id < $NQUERY AND q.doc_id <> c.doc_id
       |  GROUP BY 1, 2),
       |lex AS (
       |  SELECT qid, nid, lex_rank FROM (
       |    SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY overlap DESC, nid ASC) AS lex_rank
       |    FROM ov) r WHERE lex_rank <= $LexTop),
       |sem AS (SELECT qid, nid, rank AS sem_rank FROM (${semSql.trim}) t),
       |fused AS (
       |  SELECT coalesce(lex.qid, sem.qid) AS qid, coalesce(lex.nid, sem.nid) AS nid,
       |         lex_rank, sem_rank, $rrfScore AS rrf_score
       |  FROM lex FULL OUTER JOIN sem ON lex.qid = sem.qid AND lex.nid = sem.nid)
       |SELECT qid, rank, nid AS doc_id, rrf_score, lex_rank, sem_rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, nid ASC) AS rank
       |  FROM fused) f
       |WHERE rank <= $LexTop
       |""".stripMargin

  val hybridRrfSql: String    = hybridRrfSqlWith(knnBruteSql)
  val hybridRrfAnnSql: String = hybridRrfSqlWith(knnSrpSql)

  // ---------------------------------------------------------------------------
  // Hard-negative mining (ANCE-style): for each query vector, the
  // highest-cosine neighbors of a DIFFERENT label — the training pairs a
  // dual-encoder needs, mined from the ANN index rather than the corpus
  // (Xiong et al., "Approximate Nearest Neighbor Negative Contrastive
  // Learning", ICLR 2021 — the at-scale recipe: negatives come from the
  // serving index's candidate set). Candidates are the SRP-LSH band
  // collisions, so the corpus is touched only by the banding scan and the
  // candidate re-rank — O(candidates), never O(n) per query; same-label
  // collisions (the positives) are excluded after scoring. At 100 TB the
  // band join probes the stored layout and this is a per-ingest batch job
  // over the fresh queries.
  // ---------------------------------------------------------------------------
  private val NegK = 5

  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val banded = srpBanded(s, dir)
    val qb = banded.filter($"vec_id" < NQUERY).toDF("qid", "band", "key")
    val cand = broadcast(qb)
      .join(banded.toDF("nid", "band", "key"), Seq("band", "key"))
      .filter($"qid" =!= $"nid")
      .select($"qid", $"nid").distinct()
    val el = Tables.embeddings(s, dir)
      .selectExpr("vec_id", "label", "embedding",
        s"sqrt(${dotS("embedding", "embedding")}) AS nrm")
    val q = el.toDF("qid", "q_label", "qe", "qnrm")
    val c = el.toDF("nid", "n_label", "ne", "nnrm")
    val scored = cand
      .join(broadcast(q.filter($"qid" < NQUERY)), "qid").join(c, "nid")
      .filter($"q_label" =!= $"n_label") // same-label candidates are positives
      .withColumn("cosine", expr(s"${dotS("qe", "ne")} / (qnrm * nnrm)"))
    val w = Window.partitionBy($"qid").orderBy($"cosine".desc, $"nid".asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= NegK)
      .select($"qid", $"q_label", $"rank", $"nid", $"n_label", $"cosine")
  }
  val hardNegativesSql: String =
    s"""WITH sigs AS (SELECT vec_id,
       |  ${srpSigD("embedding", 0)} AS sig_hi,
       |  ${srpSigD("embedding", SrpHalf)} AS sig_lo
       |  FROM embeddings),
       |banded AS (
       |  SELECT vec_id, band,
       |         CAST(((CASE WHEN which = 0 THEN sig_hi ELSE sig_lo END) // d) % 256 AS INT) AS key
       |  FROM sigs CROSS JOIN (VALUES ${(0 until SrpBands).map(j => s"($j, ${j / 4}, ${srpByteDiv(j % 4)}::BIGINT)").mkString(", ")}) AS bands(band, which, d)
       |),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM banded q JOIN banded c ON q.band = c.band AND q.key = c.key
       |  WHERE q.vec_id < $NQUERY AND q.vec_id <> c.vec_id
       |),
       |scored AS (
       |  SELECT qid, q.label AS q_label, nid, c.label AS n_label,
       |         ${dotD("qe", "ne")} / (sqrt(${dotD("qe", "qe")}) * sqrt(${dotD("ne", "ne")})) AS cosine
       |  FROM cand JOIN (SELECT vec_id, label, embedding AS qe FROM embeddings) q ON qid = q.vec_id
       |            JOIN (SELECT vec_id, label, embedding AS ne FROM embeddings) c ON nid = c.vec_id
       |  WHERE q.label <> c.label
       |)
       |SELECT qid, q_label, rank, nid, n_label, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
       |  FROM scored) r
       |WHERE rank <= $NegK
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Matryoshka truncation eval (Kusupati et al., "Matryoshka Representation
  // Learning", NeurIPS 2022): overlap@k of the prefix-dim top-k lists
  // against the full-dim truth — the offline report that picks a serving
  // dimension (store 16 of 64 floats ⇒ 4× memory/bandwidth if overlap
  // holds). Prefix slices and their norms are projected ONCE per row below
  // the join (the withNorm pattern); every count is integer-exact, so the
  // oracle gate is exact arithmetic. At 100 TB the query set is a held-out
  // sample and the corpus streams through one scored pass, same contract
  // as annRecall.
  // ---------------------------------------------------------------------------
  private val MrlPrefixes = Seq(16, 32)

  def mrlOverlap(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val dims = MrlPrefixes :+ 64
    // prefix slices + their norms projected once per ROW (below the join —
    // withNorm's no-barrier argument applies unchanged per dim)
    def sliced(id: String, p: String) = Tables.embeddings(s, dir)
      .selectExpr(Seq(s"vec_id AS $id", s"embedding AS ${p}64") ++
        MrlPrefixes.map(d => s"slice(embedding, 1, $d) AS $p$d"): _*)
      .selectExpr(s"$id" +: dims.flatMap(d =>
        Seq(s"$p$d", s"sqrt(${dotS(s"$p$d", s"$p$d")}) AS ${p}nrm$d")): _*)
    val scored = graft.Materialize.lazyCut(
      broadcast(sliced("qid", "q").filter($"qid" < NQUERY))
        .join(sliced("nid", "n"), $"qid" =!= $"nid")
        .selectExpr(Seq("qid", "nid") ++ dims.map(d =>
          s"${dotS(s"q$d", s"n$d")} / (qnrm$d * nnrm$d) AS cos$d"): _*))
    def topk(d: Int): DataFrame = {
      val w = Window.partitionBy($"qid").orderBy(col(s"cos$d").desc, $"nid".asc)
      scored.select($"qid", $"nid", col(s"cos$d"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= TOPK).select($"qid", $"nid")
    }
    val truth = topk(64)
    val tp = truth.agg(count(lit(1)).as("truth_pairs"))
    dims.map { d =>
      val hits = if (d == 64) truth else topk(d).join(truth, Seq("qid", "nid"))
      hits.agg(count(lit(1)).as("hits")).crossJoin(broadcast(tp))
        .select(lit(d.toLong).as("dim"), lit(TOPK.toLong).as("k"),
          $"truth_pairs", $"hits")
    }.reduce(_ union _)
  }
  val mrlOverlapSql: String = {
    def dotP(d: Int) =
      s"${dotD(s"q$d", s"n$d")} / (sqrt(${dotD(s"q$d", s"q$d")}) * sqrt(${dotD(s"n$d", s"n$d")}))"
    def side(id: String, p: String) =
      s"SELECT vec_id AS $id, embedding AS ${p}64, " +
        MrlPrefixes.map(d => s"embedding[1:$d] AS $p$d").mkString(", ") +
        " FROM embeddings"
    val dims = MrlPrefixes :+ 64
    s"""WITH q AS (${side("qid", "q")} WHERE vec_id < $NQUERY),
       |c AS (${side("nid", "n")}),
       |scored AS (
       |  SELECT qid, nid, ${dims.map(d => s"${dotP(d)} AS cos$d").mkString(", ")}
       |  FROM q JOIN c ON qid <> nid),
       |${dims.map(d =>
           s"r$d AS (SELECT qid, nid FROM (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cos$d DESC, nid ASC) AS rk FROM scored) t WHERE rk <= $TOPK)")
         .mkString(",\n")}
       |${dims.map { d =>
           val hits = if (d == 64) "(SELECT count(*) FROM r64)"
                      else s"(SELECT count(*) FROM r$d JOIN r64 USING (qid, nid))"
           s"SELECT CAST($d AS BIGINT) AS dim, CAST($TOPK AS BIGINT) AS k, (SELECT count(*) FROM r64) AS truth_pairs, $hits AS hits"
         }.mkString("\nUNION ALL\n")}
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Incremental ANN index maintenance: the newest DeltaN vectors (the
  // "ingest batch") probe the STORED index artifacts — trained centroids
  // (pinned, see centCache; at rest the writeAnnLayout table) and the SRP
  // band scheme — and emit exactly the rows that append to the at-rest
  // layout: (vec_id, centroid_id, centroid_cosine, sig_hi, sig_lo). The
  // timed work is O(delta · C + delta · 64 · d): the corpus is touched by
  // NOTHING except the pinned C-row centroid table. Twin of the span-index
  // incremental dedup (Dedup.scala) for the serving side.
  // ---------------------------------------------------------------------------
  private val DeltaN = 50

  def annIncr(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val cutoff = e.agg((count(lit(1)) - DeltaN).as("cut"))
    val delta = e.crossJoin(broadcast(cutoff)).filter($"vec_id" >= $"cut")
      .select($"vec_id", $"embedding")
    // signatures computed on the DELTA rows only — joining the corpus-wide
    // srpSig here would silently reintroduce an O(corpus) scan
    val deltaSig = delta.selectExpr("vec_id",
      s"${srpSigS("embedding", 0)} AS sig_hi",
      s"${srpSigS("embedding", SrpHalf)} AS sig_lo")
    rankedAssignOf(s, dir, delta)
      .filter($"rn" === 1)
      .select($"vec_id", $"centroid_id", $"cosine".as("centroid_cosine"))
      .join(deltaSig, "vec_id")
  }
  val annIncrSql: String =
    s"""WITH $lloydCteSql,
       |delta AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id >= (SELECT count(*) - $DeltaN FROM embeddings)),
       |scored AS (
       |  SELECT d.vec_id, centroid_id,
       |         ${dotD("d.embedding", "ce")} / (sqrt(${dotD("d.embedding", "d.embedding")}) * sqrt(${dotD("ce", "ce")})) AS cosine
       |  FROM delta d CROSS JOIN cent),
       |ranked AS (
       |  SELECT vec_id, centroid_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, centroid_id ASC) AS rn
       |  FROM scored)
       |SELECT r.vec_id, centroid_id, cosine AS centroid_cosine,
       |       ${srpSigD("e.embedding", 0)} AS sig_hi,
       |       ${srpSigD("e.embedding", SrpHalf)} AS sig_lo
       |FROM ranked r JOIN embeddings e ON r.vec_id = e.vec_id
       |WHERE rn = 1
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Index drift report: does the ingest batch still look like the corpus
  // the centroids were trained on? Per centroid: corpus members, delta
  // members, and the cross-multiplied L1 drift term
  // |n_delta·N_corpus − n_corpus·N_delta| — an EXACT integer (no division),
  // so the gate is arithmetic-exact; Σ drift / (2·N_c·N_d) is total
  // variation distance if a consumer wants the normalized stat. This is
  // the retrain trigger: at 100 TB both sides are one groupBy over stored
  // assignment columns, never embeddings.
  // ---------------------------------------------------------------------------
  def ivfDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = ivfAssign(s, dir).groupBy($"centroid_id")
      .agg(count(lit(1)).as("n_corpus"))
    val delta = annIncr(s, dir).groupBy($"centroid_id")
      .agg(count(lit(1)).as("n_delta0"))
    corpus.join(delta, Seq("centroid_id"), "left_outer")
      .withColumn("n_delta", coalesce($"n_delta0", lit(0L)))
      .crossJoin(broadcast(corpus.agg(count(lit(1)).as("_c"),
        sum($"n_corpus").as("nc_total"))).select($"nc_total"))
      .crossJoin(broadcast(delta.agg(sum($"n_delta0").as("nd_total"))))
      .select($"centroid_id", $"n_corpus", $"n_delta",
        abs($"n_delta" * $"nc_total" - $"n_corpus" * $"nd_total").as("drift_x"))
  }
  val ivfDriftSql: String =
    s"""WITH corpus AS (
       |  SELECT centroid_id, count(*) AS n_corpus
       |  FROM (${ivfAssignSql.trim}) a GROUP BY centroid_id),
       |delta AS (
       |  SELECT centroid_id, count(*) AS n_delta
       |  FROM (${annIncrSql.trim}) d GROUP BY centroid_id),
       |tot AS (SELECT (SELECT CAST(sum(n_corpus) AS BIGINT) FROM corpus) AS nc_total,
       |               (SELECT CAST(sum(n_delta) AS BIGINT) FROM delta) AS nd_total)
       |SELECT centroid_id, n_corpus,
       |       CAST(coalesce(delta.n_delta, 0) AS BIGINT) AS n_delta,
       |       abs(coalesce(delta.n_delta, 0) * nc_total - n_corpus * nd_total) AS drift_x
       |FROM corpus LEFT JOIN delta USING (centroid_id) CROSS JOIN tot
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Cluster quality report: per IVF centroid, how many members pass the
  // text quality gate — the junk-cluster detector (a cluster whose quality
  // yield collapses is boilerplate/spam to prune wholesale, the
  // cluster-level complement of SemDeDup's pair-level pruning). Joins the
  // stored assignment to the text-quality relation on the doc_id ≡ vec_id
  // testdata contract; counts are exact integers, the share is one IEEE
  // division. At 100 TB both inputs are stored columns — no embedding or
  // text is touched.
  // ---------------------------------------------------------------------------
  def clusterQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = graft.operators.TextAnalysis.textStats(s, dir)
      .select($"doc_id".as("vec_id"), $"is_quality")
    ivfAssign(s, dir)
      .join(q, "vec_id")
      .groupBy($"centroid_id")
      .agg(count(lit(1)).as("n_members"),
        sum($"is_quality".cast("long")).as("n_quality"))
      .selectExpr("centroid_id", "n_members", "n_quality",
        "cast(n_quality as double) / n_members AS quality_share")
  }
  val clusterQualitySql: String =
    s"""WITH assign AS (${ivfAssignSql.trim}),
       |tq AS (SELECT doc_id AS vec_id, is_quality
       |       FROM (${graft.operators.TextAnalysis.textStatsSql.trim}) t)
       |SELECT centroid_id, count(*) AS n_members,
       |       CAST(sum(CAST(is_quality AS BIGINT)) AS BIGINT) AS n_quality,
       |       CAST(sum(CAST(is_quality AS BIGINT)) AS DOUBLE) / count(*) AS quality_share
       |FROM assign JOIN tq USING (vec_id)
       |GROUP BY centroid_id
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Embedding-space evaluation against the labeled testdata: (a) kNN label
  // prediction — each vector takes the majority label of its top-3
  // same-cell neighbors (tie → smallest label) and the report scores
  // accuracy per true label; (b) IVF cluster purity — each cluster's
  // majority-label share. Both are the standard embedding-quality numbers
  // an ANN index build is sanity-checked with, both reduce to exact
  // integer vote counts with deterministic window tie-breaks, and both
  // read only stored columns (assignment, neighbor list, labels).
  // ---------------------------------------------------------------------------
  def knnAccuracy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = Tables.embeddings(s, dir).select($"vec_id", $"label")
    val votes = knnGraph(s, dir)
      .join(labels.select($"vec_id".as("nbr"), $"label".as("nlabel")), "nbr")
      .groupBy($"src", $"nlabel").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy($"src").orderBy($"votes".desc, $"nlabel".asc)
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"src", $"nlabel".as("pred_label"))
    pred.join(labels.select($"vec_id".as("src"), $"label"), "src")
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        sum(($"pred_label" === $"label").cast("long")).as("n_correct"))
      .selectExpr("label", "n", "n_correct",
        "cast(n_correct as double) / n AS accuracy")
  }
  // ---------------------------------------------------------------------------
  // Label-propagation communities over the kNN graph (synchronous LPA,
  // Raghavan et al. 2007, made DETERMINISTIC): labels start as vec_ids;
  // each of 3 fixed rounds every node takes the MAJORITY label among its
  // symmetrized kNN neighbors, ties broken by smallest label, isolated
  // nodes keep their own. Fixed round count + total tie order makes the
  // result bit-reproducible on any engine — the classic async/random-order
  // LPA is neither — so the oracle is the same 3 rounds unrolled as CTEs.
  // Communities over doc/embedding kNN graphs are the topic-cluster signal
  // used for cluster-balanced sampling (the SemDeDup/mix-plan companion).
  // Scale: per round one edge-keyed join + one (node, label) count shuffle
  // — Pregel's message pass relationally, same shape as pagerank; the
  // symmetrized edge relation is materialized once.
  // ---------------------------------------------------------------------------
  private val LpaRounds = 3
  def lpaCommunities(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val g = knnGraph(s, dir).select($"src", $"nbr")
    val edges = graft.Materialize.lazyCut(
      g.union(g.select($"nbr".as("src"), $"src".as("nbr"))).distinct())
    val nodes = Tables.embeddings(s, dir).select($"vec_id".as("id"))
    var labels = nodes.select($"id", $"id".as("lab"))
    for (_ <- 1 to LpaRounds) {
      val votes = edges.join(labels.select($"id".as("nbr"), $"lab"), "nbr")
        .groupBy($"src", $"lab").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy($"src").orderBy($"c".desc, $"lab".asc)
      val voted = votes.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).select($"src".as("id"), $"lab")
      labels = graft.Materialize.lazyCut(
        nodes.join(voted, Seq("id"), "left")
          .select($"id", coalesce($"lab", $"id").as("lab")))
    }
    labels.select($"id".as("vec_id"), $"lab".as("community"))
  }
  val lpaCommunitiesSql: String = {
    def round(i: Int): String =
      s"""r$i AS (
         |  SELECT n.id, coalesce(w.lab, n.id) AS lab
         |  FROM nodes n LEFT JOIN (
         |    SELECT src AS id, lab FROM (
         |      SELECT e.src, l.lab, count(*) AS c,
         |             row_number() OVER (PARTITION BY e.src
         |                                ORDER BY count(*) DESC, l.lab ASC) AS rn
         |      FROM edges e JOIN r${i - 1} l ON l.id = e.nbr
         |      GROUP BY e.src, l.lab) v WHERE rn = 1) w ON w.id = n.id)""".stripMargin
    s"""WITH g AS (${knnGraphSql.trim}),
       |edges AS (
       |  SELECT DISTINCT src, nbr FROM (
       |    SELECT src, nbr FROM g UNION ALL SELECT nbr AS src, src AS nbr FROM g) u),
       |nodes AS (SELECT vec_id AS id FROM embeddings),
       |r0 AS (SELECT id, id AS lab FROM nodes),
       |${(1 to LpaRounds).map(round).mkString(",\n")}
       |SELECT id AS vec_id, lab AS community FROM r$LpaRounds
       |""".stripMargin
  }

  val knnAccuracySql: String =
    s"""WITH g AS (${knnGraphSql.trim}),
       |votes AS (
       |  SELECT src, e.label AS nlabel, count(*) AS votes
       |  FROM g JOIN embeddings e ON g.nbr = e.vec_id
       |  GROUP BY src, e.label),
       |pred AS (
       |  SELECT src, nlabel AS pred_label FROM (
       |    SELECT src, nlabel,
       |           row_number() OVER (PARTITION BY src ORDER BY votes DESC, nlabel ASC) AS rn
       |    FROM votes) r WHERE rn = 1)
       |SELECT e.label, count(*) AS n,
       |       CAST(sum(CAST(pred_label = e.label AS BIGINT)) AS BIGINT) AS n_correct,
       |       CAST(sum(CAST(pred_label = e.label AS BIGINT)) AS DOUBLE) / count(*) AS accuracy
       |FROM pred JOIN embeddings e ON pred.src = e.vec_id
       |GROUP BY e.label
       |""".stripMargin

  def clusterPurity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = Tables.embeddings(s, dir).select($"vec_id", $"label")
    val votes = ivfAssign(s, dir).select($"vec_id", $"centroid_id")
      .join(labels, "vec_id")
      .groupBy($"centroid_id", $"label").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"centroid_id").orderBy($"c".desc, $"label".asc)
    votes
      .withColumn("n_members", sum($"c").over(Window.partitionBy($"centroid_id")))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .selectExpr("centroid_id", "n_members", "label AS top_label",
        "c AS top_n", "cast(c as double) / n_members AS purity")
  }
  val clusterPuritySql: String =
    s"""WITH assign AS (${ivfAssignSql.trim}),
       |votes AS (
       |  SELECT centroid_id, e.label, count(*) AS c
       |  FROM assign JOIN embeddings e ON assign.vec_id = e.vec_id
       |  GROUP BY centroid_id, e.label),
       |sized AS (
       |  SELECT centroid_id, label, c,
       |         CAST(sum(c) OVER (PARTITION BY centroid_id) AS BIGINT) AS n_members,
       |         row_number() OVER (PARTITION BY centroid_id ORDER BY c DESC, label ASC) AS rn
       |  FROM votes)
       |SELECT centroid_id, n_members, label AS top_label, c AS top_n,
       |       CAST(c AS DOUBLE) / n_members AS purity
       |FROM sized WHERE rn = 1
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Embedding covariance — the sufficient statistic for distributed PCA.
  // cov(i,j) = E[xᵢxⱼ] − E[xᵢ]E[xⱼ] over the corpus for dimension pairs
  // i ≤ j. At scale this is THE way PCA runs on 100 TB of vectors: one scan
  // accumulates the d(d+1)/2 second moments + d means (map-side combinable
  // partials, O(d²) state per task, zero corpus-sized shuffle), and the
  // eigen-decomposition happens on the d×d result — driver-side, because a
  // d×d matrix is tiny no matter the corpus ([[pcaTop]] below; spec-gated).
  // The oracle covers a fixed PDIM-dim prefix block to keep the SQL twin
  // readable; the plan is identical at any d.
  // Exactness: per-row products are one IEEE multiply of exactly-widened
  // floats; cross-row sums replay [[twoLevelMean]]'s ordered fold tree on
  // both engines; the finishing cov/mean arithmetic is shared text.
  // ---------------------------------------------------------------------------
  private val PDIM = 8

  def embedCov(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, dir)
    val pairs = e.selectExpr("vec_id",
      s"""explode(flatten(transform(sequence(1, $PDIM), i ->
         |  transform(sequence(i, $PDIM), j -> struct(
         |    i AS i, j AS j,
         |    cast(element_at(embedding, i) as double) * cast(element_at(embedding, j) as double) AS v))))) AS p""".stripMargin)
      .selectExpr("cast(p.i as long) AS i", "cast(p.j as long) AS j", "vec_id", "p.v AS v")
    val exy = twoLevelMean(pairs, Seq("i", "j"))
      .selectExpr("i", "j", "n", "m AS exy")
    val dims = e.select($"vec_id", posexplode($"embedding").as(Seq("pos0", "v")))
      .filter($"pos0" < PDIM)
      .select(($"pos0" + 1).cast("long").as("d"), $"vec_id", $"v")
    val ex = twoLevelMean(dims, Seq("d")).selectExpr("d", "m")
    exy
      .join(ex.selectExpr("d AS i", "m AS ex"), "i")
      .join(ex.selectExpr("d AS j", "m AS ey"), "j")
      .selectExpr("i", "j", "n", "exy", "ex", "ey", "exy - ex * ey AS cov")
  }
  val embedCovSql: String =
    s"""WITH exy AS (
       |  SELECT i, j,
       |         list_reduce(list_prepend(0.0::DOUBLE, list(ps ORDER BY bkt)), (x, y) -> x + y) / CAST(sum(c) AS BIGINT) AS exy,
       |         CAST(sum(c) AS BIGINT) AS n
       |  FROM (
       |    SELECT i, j, vec_id // $FoldW AS bkt,
       |           list_reduce(list_prepend(0.0::DOUBLE, list(embedding[i]::DOUBLE * embedding[j]::DOUBLE ORDER BY vec_id)), (x, y) -> x + y) AS ps,
       |           count(*) AS c
       |    FROM embeddings,
       |         (SELECT unnest(range(1, ${PDIM + 1})) AS i) a,
       |         (SELECT unnest(range(1, ${PDIM + 1})) AS j) b
       |    WHERE j >= i
       |    GROUP BY i, j, bkt) lvl1
       |  GROUP BY i, j),
       |ex AS (
       |  SELECT pos AS d, m FROM (
       |${twoLevelMeanDuck("g", "(SELECT 0 AS g, vec_id, embedding FROM embeddings) gs", PDIM)}
       |  ) t)
       |SELECT exy.i, exy.j, exy.n, exy.exy, xi.m AS ex, xj.m AS ey,
       |       exy.exy - xi.m * xj.m AS cov
       |FROM exy JOIN ex xi ON exy.i = xi.d JOIN ex xj ON exy.j = xj.d
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // IVF occupancy balance — the ANN serving-latency report: probe cost is
  // bounded by the LARGEST cell a query can land in, so the imbalance
  // factor max/mean (1.0 = perfectly balanced) is the number that decides
  // whether the index needs re-training or cell splitting before serving.
  // One O(corpus) assignment pass (shared trained centroids), then an
  // O(cells) rollup; integer counts with one shared IEEE division.
  // ---------------------------------------------------------------------------
  def ivfBalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ivfAssign(s, dir)
      .groupBy($"centroid_id").agg(count(lit(1)).as("c"))
      .agg(
        count(lit(1)).cast("long").as("n_cells"),
        min($"c").cast("long").as("min_occ"),
        max($"c").cast("long").as("max_occ"),
        sum($"c").cast("long").as("n_vecs"))
      .selectExpr("n_cells", "min_occ", "max_occ", "n_vecs",
        "CAST(max_occ * n_cells AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS imbalance")
  }
  val ivfBalanceSql: String =
    s"""WITH assign AS (${ivfAssignSql.trim}),
       |occ AS (SELECT centroid_id, count(*) AS c FROM assign GROUP BY centroid_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |       CAST(min(c) AS BIGINT) AS min_occ,
       |       CAST(max(c) AS BIGINT) AS max_occ,
       |       CAST(sum(c) AS BIGINT) AS n_vecs,
       |       CAST(max(c) * count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS imbalance
       |FROM occ
       |""".stripMargin

  /** Driver-side power iteration on the [[embedCov]] result — the standard
    * finish for distributed PCA: the covariance is d×d (PDIM here) no
    * matter the corpus size, so the eigenvector solve is a trivially small
    * local computation, NOT a collect of data. Deterministic: fixed uniform
    * start, fixed iteration count. Returns (eigenvalue, eigenvector). */
  def pcaTop(s: SparkSession, dir: String, iters: Int = 300): (Double, Array[Double]) = {
    val rows = embedCov(s, dir).selectExpr("i", "j", "cov").collect()
    val d = PDIM
    val a = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1, r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    (1 to iters).foreach { _ =>
      val av = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * v(j)).sum)
      val nrm = math.sqrt(av.map(x => x * x).sum)
      lambda = (0 until d).map(i => v(i) * av(i)).sum
      v = av.map(_ / nrm)
    }
    (lambda, v)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_cov"       -> embedCov _,
    "q_link_prediction" -> linkPrediction _,
    "q_ivf_balance"     -> ivfBalance _,
    "q_knn_accuracy"    -> knnAccuracy _,
    "q_cluster_purity"  -> clusterPurity _,
    "q_cluster_quality" -> clusterQuality _,
    "q_hybrid_rrf"      -> hybridRrf _,
    "q_hybrid_rrf_ann"  -> hybridRrfAnn _,
    "q_hard_negatives"  -> hardNegatives _,
    "q_mrl_overlap"     -> mrlOverlap _,
    "q_ann_incr"        -> annIncr _,
    "q_ivf_drift"       -> ivfDrift _,
    "q_srp_sig"         -> srpSig _,
    "q_knn_srp"         -> knnSrp _,
    "q_ann_recall"      -> annRecall _,
    "q_sq8_recall"      -> sq8Recall _,
    "q_sq8_drift"       -> sq8Drift _,
    "q_semdedup"        -> semdedup _,
    "q_knn_graph"       -> knnGraph _,
    "q_lpa_communities" -> lpaCommunities _,
    "q_dedup_embedding" -> dedupEmbedding _,
    "q_embed_norms"     -> embedNorms _,
    "q_knn_brute"       -> knnBrute _,
    "q_ivf_assign"      -> ivfAssign _,
    "q_knn_ivf"         -> knnIvf _,
    "q_knn_ivf2"        -> knnIvf2 _,
    "q_pq_encode"       -> pqEncode _,
    "q_knn_pq"          -> knnPq _,
    "q_knn_ivfpq"       -> knnIvfPq _,
    "q_label_centroids" -> labelCentroids _,
    "q_embed_dimstats"  -> embedDimStats _,
    "q_anisotropy"      -> anisotropy _,
    "q_coverage_sample" -> coverageSample _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_embed_cov"       -> embedCovSql,
    "q_link_prediction" -> linkPredictionSql,
    "q_ivf_balance"     -> ivfBalanceSql,
    "q_knn_accuracy"    -> knnAccuracySql,
    "q_cluster_purity"  -> clusterPuritySql,
    "q_cluster_quality" -> clusterQualitySql,
    "q_hybrid_rrf"      -> hybridRrfSql,
    "q_hybrid_rrf_ann"  -> hybridRrfAnnSql,
    "q_hard_negatives"  -> hardNegativesSql,
    "q_mrl_overlap"     -> mrlOverlapSql,
    "q_ann_incr"        -> annIncrSql,
    "q_ivf_drift"       -> ivfDriftSql,
    "q_srp_sig"         -> srpSigSql,
    "q_knn_srp"         -> knnSrpSql,
    "q_ann_recall"      -> annRecallSql,
    "q_sq8_recall"      -> sq8RecallSql,
    "q_sq8_drift"       -> sq8DriftSql,
    "q_semdedup"        -> semdedupSql,
    "q_knn_graph"       -> knnGraphSql,
    "q_lpa_communities" -> lpaCommunitiesSql,
    "q_dedup_embedding" -> dedupEmbeddingSql,
    "q_embed_norms"     -> embedNormsSql,
    "q_knn_brute"       -> knnBruteSql,
    "q_ivf_assign"      -> ivfAssignSql,
    "q_knn_ivf"         -> knnIvfSql,
    "q_knn_ivf2"        -> knnIvf2Sql,
    "q_pq_encode"       -> pqEncodeSql,
    "q_knn_pq"          -> knnPqSql,
    "q_knn_ivfpq"       -> knnIvfPqSql,
    "q_label_centroids" -> labelCentroidsSql,
    "q_embed_dimstats"  -> embedDimStatsSql,
    "q_anisotropy"      -> anisotropySql,
    "q_coverage_sample" -> coverageSampleSql,
  )
}
