package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-governance operators over the customer/part dimensions — the
  * release-gate layer a training-data platform runs before data leaves the
  * curated zone (reference analogue: the role-based masking view,
  * `superset/init_superset.sh` dataset permissions, generalized here to the
  * standard privacy/quality gates).
  *
  * Everything is exact integer arithmetic — class counts, distinct counts,
  * edit distances — so the DuckDB oracle must agree bit-for-bit.
  */
object Governance {

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala 2007).
    *
    * Quasi-identifier = (c_nationkey, account-balance band); sensitive
    * attribute = c_mktsegment. Every equivalence class reports its size k,
    * its sensitive-value diversity l, and whether a k≥5 / l≥2 release
    * policy would suppress it.
    *
    * Scale shape: ONE hash aggregate on the QI tuple — the class relation
    * is bounded by the QI domain (nations × bands), not the table, so the
    * audit output stays tiny at any corpus size; the only exchange is the
    * groupBy. Banding note: balances can be negative and Spark's `div`
    * truncates toward zero while DuckDB's `//` floors, so cents are
    * shifted into the positive range BEFORE the divide — the band rule
    * must be engine-independent or the audit itself leaks rows across
    * class boundaries. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val K = 5
    val L = 2
    val classes = Tables.customer(s, dir)
      .select($"c_nationkey", $"c_mktsegment",
        // $2,000 bands over cents shifted by +$10,000 (balance floor is
        // -$999.99): always-positive integer division, floor==truncate.
        expr("(CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) div 200000")
          .as("bal_band"))
      .groupBy($"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("k"),
        countDistinct($"c_mktsegment").as("l_div"))
    classes.select($"c_nationkey", $"bal_band", $"k", $"l_div",
      ($"k" < K || $"l_div" < L).as("suppress"))
  }
  val kAnonymitySql: String =
    """SELECT c_nationkey,
      |       (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 200000 AS bal_band,
      |       count(*) AS k,
      |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div,
      |       (count(*) < 5 OR count(DISTINCT c_mktsegment) < 2) AS suppress
      |FROM customer
      |GROUP BY 1, 2
      |""".stripMargin

  /** Blocked fuzzy entity resolution over the part catalog — the
    * record-linkage primitive (Fellegi–Sunter blocking + edit-distance
    * comparison): candidate pairs come ONLY from blocks sharing
    * (name noun, brand, size decade), each pair is scored with exact
    * Levenshtein distance, and the report aggregates match tiers per
    * (noun, brand).
    *
    * Scale shape: blocking is the whole design — the quadratic pair space
    * (n²/2 ≈ 25M at sf0.1 on the noun alone) is cut to the sum of
    * per-block squares (~200k pairs) by the composite key, and block
    * sizes are bounded by the key's selectivity, not the catalog size.
    * The self-join shuffles once on the block key; the distance runs
    * inside codegen (`levenshtein` is a native expression on both
    * engines). At 100 TB the block key would add more components
    * (sorted-neighborhood windows, phonetic keys) to keep the largest
    * block's square bounded — same plan, richer key. */
  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Exact-name collapse BEFORE comparison (the standard record-linkage
    // optimization): catalogs with duplicates make raw blocks O(n²) in the
    // clone count — the sf1 scale-sanity run measured 16.6× growth on 10×
    // data for the naive form. Levenshtein now runs only between DISTINCT
    // names per block (quadratic in name variety, which cloning does not
    // grow), and the original all-pairs aggregates are recovered exactly
    // from group multiplicities: a name group of k parts contributes
    // k(k−1)/2 distance-0 pairs; a cross-group name pair contributes
    // ka·kb pairs at its one computed distance. Same output bit-for-bit
    // (hash-gated at all SFs), member-linear in duplicates.
    val g = Tables.part(s, dir)
      .select($"p_partkey", $"p_name", $"p_brand",
        // coalesce to '': getItem(1) is NULL for single-token names (NULL
        // never equi-joins) while the oracle's split_part yields '' (which
        // does) — pin the blocking semantics engine-independently
        coalesce(split($"p_name", " ").getItem(1), lit("")).as("noun"),
        expr("p_size div 10").as("size_band"))
      .groupBy($"noun", $"p_brand", $"size_band", $"p_name")
      .agg(count(lit(1)).as("k"))
    val a = g.select($"noun", $"p_brand", $"size_band",
      $"p_name".as("na"), $"k".as("ka"))
    val b = g.select($"noun", $"p_brand", $"size_band",
      $"p_name".as("nb"), $"k".as("kb"))
    val cross = a.join(b, Seq("noun", "p_brand", "size_band"))
      .filter($"na" < $"nb")
      .withColumn("d", levenshtein($"na", $"nb"))
      .withColumn("m", $"ka" * $"kb")
      .groupBy($"noun", $"p_brand")
      .agg(sum($"m").cast("long").as("c_pairs"),
        sum(when($"d" >= 1 && $"d" <= 3, $"m").otherwise(0L)).cast("long").as("c_near"),
        sum($"m" * $"d").cast("long").as("c_dist"))
    val within = g.groupBy($"noun", $"p_brand")
      .agg(sum(expr("k * (k - 1) div 2")).cast("long").as("w_pairs"))
    within.join(cross, Seq("noun", "p_brand"), "full_outer")
      .select($"noun", $"p_brand",
        (coalesce($"w_pairs", lit(0L)) + coalesce($"c_pairs", lit(0L))).as("n_pairs"),
        coalesce($"w_pairs", lit(0L)).as("n_exact"),
        coalesce($"c_near", lit(0L)).as("n_near"),
        coalesce($"c_dist", lit(0L)).as("sum_dist"))
      .filter($"n_pairs" > 0)
  }
  val fuzzyMatchSql: String =
    """WITH p AS (
      |  SELECT p_partkey, p_name, p_brand,
      |         split_part(p_name, ' ', 2) AS noun,
      |         p_size // 10 AS size_band
      |  FROM part)
      |SELECT a.noun, a.p_brand,
      |       count(*) AS n_pairs,
      |       CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
      |       CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
      |       CAST(sum(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS sum_dist
      |FROM p a JOIN p b
      |  ON a.noun = b.noun AND a.p_brand = b.p_brand AND a.size_band = b.size_band
      | AND a.p_partkey < b.p_partkey
      |GROUP BY a.noun, a.p_brand
      |""".stripMargin

  /** One name group per (block, exact name): its representative (min part
    * key) and member count. The per-block resolution unit. */
  final case class NameGroup(noun: String, p_brand: String, size_band: Long,
                             p_name: String, rep: Long, k: Long)
  final case class EntityAgg(entity_id: Long, n_members: Long)

  /** Standard Levenshtein DP — same distance as the Spark/DuckDB builtin
    * (unit costs, no transposition); runs on the block-local name lists. */
  private def lev(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }

  /** Union-find closure over one block's name groups: groups whose names
    * are within Levenshtein 3 merge; each resulting entity reports its min
    * part key and total member count. Σk < 2 components are single parts
    * that appear in NO match pair — not entities. Order-independent: the
    * emitted (min rep, Σk) pairs are the same whatever order the groups
    * arrive in. */
  private def resolveBlock(gs: IndexedSeq[NameGroup]): Iterator[EntityAgg] = {
    val n = gs.size
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (lev(gs(i).p_name, gs(j).p_name) <= 3) {
          val ri = find(i); val rj = find(j)
          if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
        }
        j += 1
      }
      i += 1
    }
    val acc = scala.collection.mutable.LongMap.empty[(Long, Long)]
    i = 0
    while (i < n) {
      val r = find(i).toLong
      val (mn, sk) = acc.getOrElse(r, (Long.MaxValue, 0L))
      acc(r) = (math.min(mn, gs(i).rep), sk + gs(i).k)
      i += 1
    }
    acc.values.iterator.collect { case (mn, sk) if sk >= 2 => EntityAgg(mn, sk) }
  }

  /** End-to-end entity resolution: the [[fuzzyMatch]] blocking+scoring pass
    * defines match pairs (Levenshtein ≤ 3 within a block), transitive
    * closure groups them into entities (pairs (a,b),(b,c) are ONE vendor
    * item listed three ways), and each entity canonicalizes to its min part
    * key. Because every edge SHARES the blocking key, components are
    * provably block-local — so the closure runs as a per-block union-find
    * over name-group representatives inside ONE `flatMapGroups` pass (one
    * shuffle on the block key, zero iteration), instead of the global
    * star contraction the cross-block LSH graphs need
    * ([[Dedup.resolveClusters]] stays the tool there). The per-group unit
    * is the exact-name collapse of [[fuzzyMatch]]: union-find is quadratic
    * only in per-block name VARIETY, member counts fold in as
    * multiplicities — member-linear in duplicates, identical entities,
    * hash-gated. The oracle recomputes components with a recursive CTE —
    * two different algorithms, identical output. */
  def erEntities(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = Tables.part(s, dir)
      .select($"p_partkey", $"p_name",
        // NULL→'' pin — blocking must not depend on the engine's
        // single-token split semantics
        coalesce(split($"p_name", " ").getItem(1), lit("")).as("noun"),
        $"p_brand", expr("p_size div 10").as("size_band"))
      .groupBy($"noun", $"p_brand", $"size_band", $"p_name")
      .agg(min($"p_partkey").cast("long").as("rep"), count(lit(1)).as("k"))
    val ents = g.as[NameGroup]
      .groupByKey(ng => (ng.noun, ng.p_brand, ng.size_band))
      .flatMapGroups((_, it) => resolveBlock(it.toIndexedSeq))
    ents.toDF()
      .join(Tables.part(s, dir).select($"p_partkey", $"p_name"),
        $"entity_id" === $"p_partkey")
      .select($"entity_id", $"p_name".as("entity_name"), $"n_members")
  }
  val erEntitiesSql: String =
    """WITH RECURSIVE p AS (
      |  SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS noun,
      |         p_brand, p_size // 10 AS size_band
      |  FROM part),
      |pairs AS (
      |  SELECT a.p_partkey AS doc_a, b.p_partkey AS doc_b
      |  FROM p a JOIN p b
      |    ON a.noun = b.noun AND a.p_brand = b.p_brand
      |   AND a.size_band = b.size_band AND a.p_partkey < b.p_partkey
      |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
      |reach AS (
      |  SELECT src AS id, src AS comp FROM edges
      |  UNION
      |  SELECT e.dst AS id, r.comp FROM reach r JOIN edges e ON e.src = r.id),
      |lab AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
      |SELECT lab.comp AS entity_id, pt.p_name AS entity_name,
      |       count(*) AS n_members
      |FROM lab JOIN part pt ON pt.p_partkey = lab.comp
      |GROUP BY 1, 2
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Benford first-digit audit of order totals — the classic fabricated-
  // numbers screen (forensic accounting, synthetic-data QA): natural
  // multi-scale amounts follow P(d) = log10(1 + 1/d); uniform or
  // hand-typed values do not. The first significant digit comes from the
  // exact integer-cents STRING (never from double formatting, which
  // differs across engines), the expected shares are precomputed double
  // literals spliced into both engine texts (libm log10 is not
  // bit-portable — the NDCG-weights rule), and each digit's χ² term is
  // one shared IEEE expression. One scan, one 9-row aggregate.
  // ---------------------------------------------------------------------------
  private val benfordExpected: Map[Int, Double] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
  // STRING-literal casts, not bare decimal literals: Spark parses a
  // 17-digit decimal literal through BigDecimal.doubleValue (not always
  // correctly rounded — measured 1 ulp off strtod here), while
  // cast('…' as double) is the spec-rounded parse on both engines.
  private val benfordExpCase: String =
    (1 to 9).map(d => s"WHEN $d THEN cast('${benfordExpected(d)}' as double)")
      .mkString("CASE digit ", " ", " ELSE cast('0.0' as double) END")

  def benford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .selectExpr(
        "cast(substr(cast(cast(round(o_totalprice * cast(100 as double)) as bigint) as string), 1, 1) as int) AS digit")
      .groupBy($"digit")
      .agg(count(lit(1)).as("n_orders"))
      .selectExpr("digit", "n_orders",
        "cast(n_orders as double) / sum(n_orders) OVER () AS share",
        s"$benfordExpCase AS expected_share")
      .selectExpr("cast(digit as bigint) AS digit", "n_orders", "share", "expected_share",
        "(share - expected_share) * (share - expected_share) / expected_share AS chi2_term")
  }
  val benfordSql: String =
    s"""WITH d AS (
       |  SELECT cast(substr(cast(cast(round(o_totalprice * cast(100 as double)) as bigint) as varchar), 1, 1) as int) AS digit
       |  FROM orders),
       |g AS (SELECT digit, count(*) AS n_orders FROM d GROUP BY digit),
       |sh AS (
       |  SELECT digit, n_orders,
       |         cast(n_orders as double) / sum(n_orders) OVER () AS share,
       |         $benfordExpCase AS expected_share
       |  FROM g)
       |SELECT CAST(digit AS BIGINT) AS digit, n_orders, share, expected_share,
       |       (share - expected_share) * (share - expected_share) / expected_share AS chi2_term
       |FROM sh
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k_anon"      -> kAnonymity _,
    "q_fuzzy_match" -> fuzzyMatch _,
    "q_er_entities" -> erEntities _,
    "q_benford"     -> benford _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_k_anon"      -> kAnonymitySql,
    "q_fuzzy_match" -> fuzzyMatchSql,
    "q_er_entities" -> erEntitiesSql,
    "q_benford"     -> benfordSql,
  )
}
