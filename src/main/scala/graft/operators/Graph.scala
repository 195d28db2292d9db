package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Iterative graph analytics over the star schema's implicit trade graph.
  *
  * PageRank here is EXACT and cross-engine-reproducible: ranks are scaled
  * 64-bit integers (1e12 = total probability mass), every per-edge
  * contribution is an integer division, and every aggregation is an
  * integer SUM — commutative and associative, so partition order cannot
  * change a single bit (float PageRank diverges in the last ulp between
  * engines and even between runs). Damping 0.85 is the rational 17/20;
  * all intermediate products stay far below 2^63.
  *
  * Graph: the undirected bipartite customer↔supplier graph induced by
  * lineitems (an edge per distinct trading pair). Node ids disambiguate
  * the two key spaces by parity (customer 2k, supplier 2k+1). Undirected
  * symmetrization means no dangling nodes: every node in the graph has at
  * least one neighbor, so no rank mass leaks and no special-case
  * redistribution is needed.
  *
  * Scale design: the edge relation is built once (distinct pair grain —
  * bounded by |trading pairs|, not |lineitems|), symmetrized, and
  * materialized; each of the 5 iterations is one fact-sized hash join
  * (ranks ⨝ edges on the source key) plus one aggregation to the
  * destination key — Pregel's message pass expressed relationally. Rank
  * state chains lazily through the 5 unrolled passes (each round has ONE
  * consumer, so the whole walk is a single action; per-round eager
  * checkpoints measured as pure scheduling overhead at every tested SF).
  * On a churn-prone 1000-executor cluster the state would go back through
  * `Materialize.eager` per iteration — O(1) plan depth, one-iteration
  * recovery — and the edge relation would be pre-partitioned by src
  * (bucketed), making each message pass a co-partitioned join; the
  * iteration structure is unchanged either way.
  *
  * The graph centrality signal is the same one used for influence-based
  * curation over document kNN graphs (select central/representative docs);
  * the trade graph is the schema's natural test graph.
  */
object Graph {

  private val Scale = 1000000000000L // rank mass: 1e12 micro-units
  private val Iters = 5

  /** (symmetrized trade edges, per-node degrees) — the undirected bipartite
    * customer↔supplier graph both rank queries walk. Cached + pinned per
    * (session, dir): in production the edge relation is an at-rest graph
    * table the extraction pipeline writes ONCE and every centrality /
    * propagation query reads — rebuilding it from the fact table per query
    * would re-shuffle the corpus for what is a static artifact. Same
    * contract as the trained IVF centroids and the stored cluster labels. */
  private val tradeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]
  private def tradeGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    graft.Artifacts.cached(tradeCache, s, dir) {
      import s.implicits._
      // distinct trading pairs; customer keys even, supplier keys odd
      val pairs = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey")
        .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
        .distinct()
      // Pinned HASH-PARTITIONED BY dst (round 19): both message-pass
      // consumers (pagerank, ppr) aggregate contributions by dst every
      // round, and the broadcast rank-state join preserves the cached
      // partitioning — so every round's groupBy(dst) reads the pinned
      // blocks with zero exchanges (was one edge-sized exchange per
      // round, 5 + 3 across the two queries). The one-time build
      // exchange is amortized across every consumer; this is the
      // bucketed-by-dst layout the 1000-executor note below describes.
      val edges = graft.Materialize.eager(
        pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
          .repartition($"dst"), pin = true)
      val deg = graft.Materialize.eager(
        edges.groupBy($"src".as("node")).agg(count(lit(1)).as("deg")), pin = true)
      (edges, deg)
    }

  def pagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (edges, deg) = tradeGraph(s, dir)
    // |V| as a broadcast 1-row relation — the constant stays distributed
    // (no driver collect), and BASE = (3·Scale) div (20·|V|) is computed
    // with the same integer expression text on both engines.
    val n = deg.agg(count(lit(1)).as("n"))
    var state = deg.crossJoin(broadcast(n))
      .selectExpr("node", "deg", s"${Scale}L div n AS r", "n")
    for (_ <- 1 to Iters) {
      // the rank state is O(V) — two orders smaller than the edge
      // relation on any entity graph (V = business entities, E = facts) —
      // so BROADCAST it into the edge join: the pinned edges never
      // reshuffle, contributions partial-aggregate map-side, and each
      // message pass pays exactly ONE exchange (the dst groupBy) instead
      // of three. Past broadcast reach (billion-node graphs) flip these
      // two joins back to shuffles — same semantics.
      val contrib = edges
        .join(broadcast(state), $"src" === $"node")
        .selectExpr("dst", "r div deg AS c", "n")
      val inSum = contrib.groupBy($"dst")
        .agg(sum($"c").as("insum"), first($"n").as("n"))
      // single consumer per round: a lazy chain keeps all 5 message
      // passes in ONE action (per-round eager actions cost more in
      // scheduling/AQE planning than their task work at tested SFs; on a
      // churn-prone cluster swap this back to per-round Materialize.eager)
      state = inSum.join(broadcast(deg), $"dst" === $"node")
        .selectExpr("node", "deg",
          s"(3L * ${Scale}L) div (20L * n) + (17L * insum) div 20L AS r",
          "n")
    }
    state.selectExpr(
      "node",
      "IF(node % 2 = 0, 'customer', 'supplier') AS entity_type",
      "node div 2 AS entity_key",
      "r AS rank_scaled")
  }

  /** Five unrolled message-pass iterations as chained CTEs — DuckDB's `//`
    * floors and Spark's `div` truncates, identical on the non-negative
    * ranks/degrees here. */
  val pagerankSql: String = {
    val base = s"(3 * ${Scale}) // (20 * (SELECT n FROM nn))"
    val iters = (1 to Iters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT deg.node, deg.deg, $base + (17 * x.insum) // 20 AS r
         |  FROM (SELECT e.dst AS node, sum(p.r // p.deg) AS insum
         |        FROM $prev p JOIN e ON e.src = p.node GROUP BY e.dst) x
         |  JOIN deg ON deg.node = x.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT node, deg, ${Scale} // (SELECT n FROM nn) AS r FROM deg),
       |$iters
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS entity_type,
       |       node // 2 AS entity_key,
       |       CAST(r AS BIGINT) AS rank_scaled
       |FROM r$Iters
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Triangle census of the part co-purchase graph (parts are adjacent iff
  // some order contains both): node/edge/wedge/triangle counts plus the
  // global clustering coefficient — the standard connectivity summary for
  // graph-shaped data (co-occurrence graphs, doc kNN graphs).
  //
  // The trade graph above is BIPARTITE (triangle-free by construction), so
  // this query builds the unipartite co-purchase projection instead. All
  // counts are integers; the coefficient is ONE IEEE division of two exact
  // integers, so both engines agree bit-for-bit.
  //
  // Scale design — degree-ordered triangle counting (the MapReduce-classic
  // Suri–Vassilvitskii orientation): every edge points from its
  // lower-(degree, id) endpoint to the higher one, wedges are enumerated
  // at their apex, and a triangle is counted exactly once — at its
  // MINIMUM-degree vertex. The wedge join's fan-out per apex is then
  // bounded by out-degree in the ORIENTED graph (O(sqrt(|E|)) for any
  // graph), so a hub part with degree 100k contributes ~0 wedges instead
  // of 5·10^9 — this is what makes the self-join survive a power-law
  // degree distribution at 100 TB. The oracle counts the same triangles
  // with the naive ordered 3-way join (count is algorithm-independent).
  // Shuffles: edges by apex (wedge build), wedge pairs by (y, z) for the
  // closing-edge hash join — ids only, never payloads.
  // ---------------------------------------------------------------------------
  /** Undirected distinct co-purchase edges, id-ordered u < v. Pair
    * generation is ONE shuffle on the order key + a map-side nested
    * transform over each order's part list (orders hold a handful of
    * parts), then the distinct exchange — two exchanges total vs four for
    * the self-join-on-o form. Shared by the triangle census, the
    * assortativity query, and the k-hop BFS — cached + pinned per
    * (session, dir) like the trade graph: production keeps this edge
    * relation as an at-rest graph table written once, and every consumer
    * reads that artifact instead of re-deriving it from the fact table. */
  private val coPurchaseCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(coPurchaseCache, s, dir) {
      import s.implicits._
      graft.Materialize.eager(
        orderPartSets(s, dir)
          .selectExpr(
            "explode(flatten(transform(ps, (a, i) -> " +
              "transform(slice(ps, i + 2, size(ps) - i - 1), b -> struct(a AS u, b AS v))))) AS pr")
          .select($"pr.u", $"pr.v").distinct(), pin = true)
    }

  /** Per-order sorted distinct part list — the upstream artifact BOTH
    * co-purchase consumers derive from (the distinct edge relation above,
    * the counted pair/degree relations of [[itemCosine]]). Pinned per
    * (session, dir) under the same at-rest contract as the trade graph:
    * production extracts order baskets once and every co-occurrence
    * consumer reads that table instead of re-grouping the fact scan. */
  private val psCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def orderPartSets(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(psCache, s, dir) {
      import s.implicits._
      graft.Materialize.eager(
        Tables.lineitem(s, dir)
          .select($"l_orderkey".as("o"), $"l_partkey".as("p"))
          .groupBy($"o").agg(sort_array(collect_set($"p")).as("ps")), pin = true)
    }

  def triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = coPurchaseEdges(s, dir)
    // deg and adj feed multiple consumers (orientation, counts, both
    // broadcast builds) — materialize them or every consumer re-runs the
    // underlying shuffle (the un-materialized form measured 4.5 s; this
    // one ~1.5 s).
    val deg = graft.Materialize.shared(
      e.select($"u".as("n")).union(e.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("d")))
    // orient each edge from its lower-(degree, id) endpoint
    val oriented = e
      .join(broadcast(deg.select($"n".as("u"), $"d".as("du"))), "u")
      .join(broadcast(deg.select($"n".as("v"), $"d".as("dv"))), "v")
      .selectExpr(
        "CASE WHEN struct(du, u) < struct(dv, v) THEN u ELSE v END AS x",
        "CASE WHEN struct(du, u) < struct(dv, v) THEN v ELSE u END AS y")
    // edge-iterator triangle count over the orientation: for each oriented
    // edge (x → y), triangles through it are |N⁺(x) ∩ N⁺(y)| — each
    // triangle is counted exactly once, at its unique out-degree-2 apex
    // edge. The Σ wedge work (Σ out-deg², ~40M element ops at sf0.1) runs
    // INSIDE a map-side array_intersect over broadcast adjacency lists —
    // no 40M-row wedge relation is ever materialized or shuffled (the
    // wedge-join form measured 4.0 s; this shape ~1.5 s). Orientation caps
    // every list at O(√|E|), which is also what bounds the broadcast: the
    // adjacency table is |nodes| rows of √|E|-capped lists. Past broadcast
    // reach, the same two joins run shuffled on x / y — identical
    // semantics, two more exchanges.
    graft.functions.GraftFunctions.register(s)
    // sorted adjacency: the intersection kernel's contract (the native
    // sorted_intersect_count merge loop — size(array_intersect) allocates
    // a boxed hash set per edge row, which alone held this query at ~4.5 s)
    val adj = graft.Materialize.shared(
      oriented.groupBy($"x").agg(sort_array(collect_set($"y")).as("ns")))
    val nTriDf = oriented
      .join(broadcast(adj), "x")
      .join(broadcast(adj.select($"x".as("y"), $"ns".as("ns2"))), Seq("y"))
      .selectExpr("sorted_intersect_count(ns, ns2) AS c")
      .agg(coalesce(sum($"c"), lit(0L)).cast("long").as("n_triangles"))
    // four single-row aggregates crossJoined into the summary row — one
    // declarative plan, no driver-side scalar collection
    nTriDf
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(deg.selectExpr("d * (d - 1) div 2 AS w")
        .agg(sum($"w").as("n_wedges")))
      .selectExpr("n_nodes", "n_edges", "n_wedges", "n_triangles",
        "CASE WHEN n_wedges = 0 THEN cast(0.0 as double) " +
          "ELSE cast(3 * n_triangles as double) / cast(n_wedges as double) END AS clustering_coeff")
  }
  val trianglesSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v
      |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
      |deg AS (SELECT n, count(*) AS d
      |        FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) x
      |        GROUP BY n),
      |t AS (SELECT count(*) AS n_tri
      |      FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
      |       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
      |       (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
      |       CAST(t.n_tri AS BIGINT) AS n_triangles,
      |       CASE WHEN (SELECT sum(d * (d - 1) // 2) FROM deg) = 0 THEN CAST(0.0 AS DOUBLE)
      |            ELSE CAST(3 * t.n_tri AS DOUBLE)
      |                 / CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS DOUBLE) END
      |         AS clustering_coeff
      |FROM t
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Degree assortativity of the co-purchase graph: the Pearson correlation
  // of endpoint degrees over the DIRECTED edge multiset (each undirected
  // edge contributes both orientations — the standard Newman definition,
  // which keeps the statistic symmetric). Positive r: hubs connect to
  // hubs (assortative mixing); negative: hub-and-spoke. The same statistic
  // over a document kNN graph diagnoses whether near-dup mass concentrates
  // in a few templates or spreads corpus-wide.
  //
  // Exactness: degrees are integers, so all five moment sums accumulate as
  // exact DECIMAL(38,0) integers (the q_corr_stats contract) and the
  // closed-form correlation text is spliced into both engines verbatim —
  // identical parse tree, identical IEEE order, identical bits (sqrt is
  // correctly rounded; no ln).
  //
  // Scale shape: edges materialize once (bounded by |co-purchase pairs|);
  // degrees are one count shuffle; the two degree attachments are
  // broadcast joins (|nodes| rows of (id, int)); the moment aggregation is
  // one partial+final pass. Nothing scales with |lineitem| after the edge
  // build.
  // ---------------------------------------------------------------------------
  private val assortFormula =
    "CASE WHEN (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd) <= cast(0 as double) " +
      "THEN cast(0 as double) " +
      "ELSE (nd * sxyd - sxd * syd) / (sqrt(nd * sxxd - sxd * sxd) * sqrt(nd * syyd - syd * syd)) END " +
      "AS assortativity"

  def assortativity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = coPurchaseEdges(s, dir)
    val deg = graft.Materialize.shared(
      e.select($"u".as("n")).union(e.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("d")))
    val directed = e.union(e.select($"v".as("u"), $"u".as("v")))
    val moments = directed
      .join(broadcast(deg.select($"n".as("u"), $"d".as("dx"))), "u")
      .join(broadcast(deg.select($"n".as("v"), $"d".as("dy"))), "v")
      .agg(
        count(lit(1)).as("n2"),
        sum($"dx".cast("decimal(38,0)")).as("sx"),
        sum($"dy".cast("decimal(38,0)")).as("sy"),
        sum(($"dx" * $"dx").cast("decimal(38,0)")).as("sxx"),
        sum(($"dy" * $"dy").cast("decimal(38,0)")).as("syy"),
        sum(($"dx" * $"dy").cast("decimal(38,0)")).as("sxy"))
    moments
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .selectExpr("n_edges",
        "cast(n2 as double) AS nd", "cast(sx as double) AS sxd",
        "cast(sy as double) AS syd", "cast(sxx as double) AS sxxd",
        "cast(syy as double) AS syyd", "cast(sxy as double) AS sxyd")
      .selectExpr("n_edges", assortFormula)
  }
  val assortativitySql: String =
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (SELECT DISTINCT a.p AS u, b.p AS v
       |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
       |deg AS (SELECT n, count(*) AS d
       |        FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e) x
       |        GROUP BY n),
       |de AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
       |m AS (SELECT count(*) AS n2,
       |             sum(du.d) AS sx, sum(dv.d) AS sy,
       |             sum(du.d * du.d) AS sxx, sum(dv.d * dv.d) AS syy,
       |             sum(du.d * dv.d) AS sxy
       |      FROM de JOIN deg du ON de.u = du.n JOIN deg dv ON de.v = dv.n),
       |d AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       |             CAST(n2 AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
       |             CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
       |             CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
       |      FROM m)
       |SELECT n_edges,
       |       $assortFormula
       |FROM d
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Personalized PageRank from a seed set: teleport mass restarts at the
  // BUILDING-segment customers instead of uniformly, so rank measures
  // proximity-to-seeds — the graph-propagation primitive behind
  // seed-based curation (score every document by its kNN-graph proximity
  // to a small trusted set, then keep/up-weight the top mass). Same
  // integer-exact machinery as q_pagerank: scaled 1e12 mass, integer
  // per-edge divisions, integer sums — bit-reproducible in any engine and
  // under any partitioning. Non-seed nodes get ZERO teleport: their rank
  // is entirely flowed-in proximity (nodes unreachable from the seeds in
  // 3 hops legitimately read 0).
  //
  // Scale shape: identical to pagerank — one materialized edge relation,
  // one broadcast scalar (|seeds ∩ graph|), and per iteration one
  // fact-sized join + one aggregation; seed membership rides the rank
  // state (no per-iteration re-join against the customer dim).
  // ---------------------------------------------------------------------------
  private val PprIters = 3

  def ppr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (edges, deg) = tradeGraph(s, dir)
    val seeds = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING")
      .select(($"c_custkey" * 2).as("node"), lit(1L).as("is_seed"))
    // base is persisted NODE-partitioned (round 19): each round's rank
    // rebuild left-joins it against the dst-keyed contribution sums, and
    // single-key hash partitionings on both sides (node / dst) satisfy
    // the join's clustering without any exchange.
    val base0 = graft.Materialize.shared(
      deg.join(seeds, Seq("node"), "left")
        .select($"node", $"deg", coalesce($"is_seed", lit(0L)).as("is_seed"))
        .repartition($"node"))
    val ns = base0.agg(sum($"is_seed").as("ns"))
    val base = base0.crossJoin(broadcast(ns))
    var state = base.selectExpr("node", "deg", "is_seed", "ns",
      s"IF(is_seed = 1, ${Scale}L div ns, 0L) AS r")
    for (_ <- 1 to PprIters) {
      // rank state is O(V) — BROADCAST it into the edge join exactly like
      // pagerank (round 19): the pinned dst-partitioned edges never
      // reshuffle and the contribution agg reuses their partitioning, so
      // a round pays ZERO edge-sized exchanges (was: edges re-exchanged
      // by src + contributions exchanged by dst, every round).
      val contrib = edges
        .join(broadcast(state), $"src" === $"node")
        .selectExpr("dst", "r div deg AS c")
      val inSum = contrib.groupBy($"dst").agg(sum($"c").as("insum"))
      // single consumer per round — lazy chain, one action (see pagerank)
      state = base.join(inSum, base("node") === inSum("dst"), "left")
        .selectExpr("node", "deg", "is_seed", "ns",
          s"IF(is_seed = 1, (3L * ${Scale}L) div (20L * ns), 0L)" +
            " + (17L * coalesce(insum, 0L)) div 20L AS r")
    }
    state.selectExpr(
      "node",
      "IF(node % 2 = 0, 'customer', 'supplier') AS entity_type",
      "node div 2 AS entity_key",
      "is_seed",
      "r AS rank_scaled")
  }
  val pprSql: String = {
    val iters = (1 to PprIters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT b.node, b.deg, b.is_seed,
         |         CASE WHEN b.is_seed = 1
         |              THEN (3 * ${Scale}) // (20 * (SELECT ns FROM nn)) ELSE 0 END
         |         + (17 * COALESCE(x.insum, 0)) // 20 AS r
         |  FROM base b LEFT JOIN (SELECT e.dst AS node, sum(p.r // p.deg) AS insum
         |                         FROM $prev p JOIN e ON e.src = p.node GROUP BY e.dst) x
         |  ON b.node = x.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
       |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
       |seeds AS (SELECT c_custkey * 2 AS node FROM customer
       |          WHERE c_mktsegment = 'BUILDING'),
       |base AS (SELECT deg.node, deg.deg,
       |                CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
       |         FROM deg LEFT JOIN seeds s ON deg.node = s.node),
       |nn AS (SELECT sum(is_seed) AS ns FROM base),
       |r0 AS (SELECT node, deg, is_seed,
       |              CASE WHEN is_seed = 1
       |                   THEN ${Scale} // (SELECT ns FROM nn) ELSE 0 END AS r
       |       FROM base),
       |$iters
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS entity_type,
       |       node // 2 AS entity_key,
       |       CAST(is_seed AS BIGINT) AS is_seed,
       |       CAST(r AS BIGINT) AS rank_scaled
       |FROM r$PprIters
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // K-hop reachability (BFS frontier expansion) from a seed set over the
  // co-purchase graph: how many parts are 1, 2, 3 hops from one brand's
  // catalog — the blast-radius query behind recall expansion ("everything
  // within 2 hops of the trusted set") and contamination tracing
  // ("everything within 3 hops of a known-bad node"). Frontier BFS, not a
  // 3-way self-join: each hop joins only the NEW frontier against the
  // edge list and anti-joins the visited set, so per-hop work is
  // O(frontier-degree sum), not O(paths) — the 3-way join enumerates every
  // redundant path and explodes on hub nodes at scale. Visited/frontier
  // states are materialized per hop (id-only rows); all counts are exact
  // integers. The oracle replays the same frontier peeling as chained
  // NOT-IN CTEs (counts are path-algorithm-independent).
  // ---------------------------------------------------------------------------
  private val KHops = 3
  private val KhopBrand = "Brand#11"

  def khop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = coPurchaseEdges(s, dir)
    val sym = graft.Materialize.shared(
      e.union(e.select($"v".as("u"), $"u".as("v"))))
    val seeds = Tables.part(s, dir)
      .filter($"p_brand" === KhopBrand)
      .select($"p_partkey".as("node")).distinct()
    // one materialization per hop: only the NEW frontier is eager'd; the
    // visited set is a lazy union over the already-materialized levels
    // (each input is checkpointed, so the union re-reads cached blocks,
    // never recomputes — half the jobs of materializing reached per hop)
    var levels = Vector(graft.Materialize.shared(seeds.withColumn("hop", lit(0))))
    for (h <- 1 to KHops) {
      val frontier = levels.last.select($"node")
      val visited = levels.map(_.select($"node")).reduce(_ union _)
      // frontier and visited are id-only sets bounded by the reachable
      // component — broadcast BOTH sides so the big edge relation is never
      // shuffled: expansion is a map-side hash join over the materialized
      // sym blocks, and the anti-join is a map-side bloom-style probe. The
      // only exchange per hop is the distinct over new candidates (bounded
      // by the frontier's degree sum). If a frontier ever outgrows
      // broadcast reach (whole-graph floods), drop the hints and the same
      // plan runs shuffled.
      val nxt = graft.Materialize.shared(
        sym.join(broadcast(frontier), sym("u") === frontier("node"))
          .select(sym("v").as("node")).distinct()
          .join(broadcast(visited), Seq("node"), "left_anti")
          .withColumn("hop", lit(h)))
      levels :+= nxt
    }
    val reached = levels.reduce(_ union _)
    // 4-row result: the unpartitioned window is over the hop levels only.
    // A static hop spine keeps exhausted frontiers visible as 0 rows (a
    // groupBy over `reached` alone would DROP a hop whose frontier died —
    // the oracle's per-hop CTE counts emit 0 instead).
    val spine = s.range(0, KHops + 1).select($"id".cast("int").as("hop"))
    val perHop = spine.join(
        reached.groupBy($"hop").agg(count(lit(1)).as("c")), Seq("hop"), "left")
      .select($"hop", coalesce($"c", lit(0L)).as("n_new"))
    perHop.withColumn("n_cum",
      sum($"n_new").over(Window.orderBy($"hop")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"hop", $"n_new", $"n_cum")
  }
  val khopSql: String =
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (SELECT DISTINCT a.p AS u, b.p AS v
       |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
       |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
       |h0 AS (SELECT DISTINCT p_partkey AS node FROM part WHERE p_brand = '$KhopBrand'),
       |h1 AS (SELECT DISTINCT s.v AS node FROM sym s JOIN h0 ON s.u = h0.node
       |       WHERE s.v NOT IN (SELECT node FROM h0)),
       |h2 AS (SELECT DISTINCT s.v AS node FROM sym s JOIN h1 ON s.u = h1.node
       |       WHERE s.v NOT IN (SELECT node FROM h0 UNION SELECT node FROM h1)),
       |h3 AS (SELECT DISTINCT s.v AS node FROM sym s JOIN h2 ON s.u = h2.node
       |       WHERE s.v NOT IN (SELECT node FROM h0 UNION SELECT node FROM h1
       |                         UNION SELECT node FROM h2)),
       |lv AS (
       |  SELECT 0 AS hop, count(*) AS n_new FROM h0
       |  UNION ALL SELECT 1 AS hop, count(*) AS n_new FROM h1
       |  UNION ALL SELECT 2 AS hop, count(*) AS n_new FROM h2
       |  UNION ALL SELECT 3 AS hop, count(*) AS n_new FROM h3)
       |SELECT hop, n_new,
       |       CAST(sum(n_new) OVER (ORDER BY hop
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum
       |FROM lv
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // Bounded-hop weighted shortest paths (Bellman-Ford relaxation, the
  // min-plus counterpart of the BFS k-hop): distance from a seed nation's
  // customers over the trade graph, where an edge's cost falls with trade
  // volume (w = 1 + 1000 div n_lineitems — strong relationships are
  // "closer"). Three relaxation rounds bound the hop depth, exactly like
  // the supply-chain "how far is every entity from this trusted set, cost-
  // weighted" query.
  //
  // Scale shape: the weighted edge relation is derived with ONE aggregation
  // over the fact join and materialized once (three rounds re-read cached
  // blocks); the distance state is id+integer rows bounded by the node set,
  // broadcast to make each relaxation a map-side hash join over the
  // materialized edges — the only per-round exchange is the min-groupBy on
  // node. If the state outgrows broadcast reach, dropping the hint yields
  // the same plan shuffled on node id. All weights/distances are exact
  // integers, so min-plus relaxation is engine-independent and the oracle
  // replays it as unrolled CTEs.
  // ---------------------------------------------------------------------------
  private val SpIters = 3
  private val SpNation = 3

  /** Weighted (directed-half) trade edges — the at-rest counterpart of
    * [[tradeGraph]] for cost-weighted walks. Stored as the o→s half only;
    * consumers union the swap over the materialized leaf (2 cheap reads,
    * one build). Pinned per (session, dir) under the same artifact
    * contract. */
  private val weightedTradeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def weightedTradeHalf(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(weightedTradeCache, s, dir) {
      import s.implicits._
      graft.Materialize.eager(
        Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey")
          .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
          .agg(count(lit(1)).as("n"))
          .selectExpr("src", "dst", "1L + 1000L div n AS w"), pin = true)
    }

  def shortestPath(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pw = weightedTradeHalf(s, dir)
    val edges = pw.union(pw.select($"dst".as("src"), $"src".as("dst"), $"w"))
    var dist = Tables.customer(s, dir).filter($"c_nationkey" === SpNation)
      .select(($"c_custkey" * 2).as("node"), lit(0L).as("dist"))
    // Each round's state is SHARED (lazy persist), not eagerly checkpointed:
    // the previous per-round eager actions cost more in scheduling + AQE
    // planning than their task work at any tested SF, while the cache gives
    // the same compute-once guarantee inside the one consuming action. No
    // broadcast hint on the state side either — dist grows toward the full
    // customer+supplier node set, so a hard-coded broadcast OOMs at scale;
    // AQE picks broadcast while the state is small and a shuffled join once
    // it is not, preserving the same min-groupBy plan.
    for (i <- 1 to SpIters) {
      val d = graft.Materialize.shared(dist)
      val relaxed = edges.as("e").join(d.as("d"), col("e.src") === col("d.node"))
        .select(col("e.dst").as("node"), (col("d.dist") + col("e.w")).as("dist"))
      dist = d.union(relaxed).groupBy($"node").agg(min($"dist").as("dist"))
    }
    dist.selectExpr(
      "node",
      "IF(node % 2 = 0, 'customer', 'supplier') AS entity_type",
      "node div 2 AS entity_key",
      "dist")
  }
  val shortestPathSql: String = {
    val rounds = (1 to SpIters).map { i =>
      val prev = s"d${i - 1}"
      s"""d$i AS (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM $prev
         |    UNION ALL
         |    SELECT e.dst AS node, d.dist + e.w AS dist
         |    FROM $prev d JOIN e ON e.src = d.node) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH pw AS (
       |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst, count(*) AS n
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
       |e AS (SELECT src, dst, 1 + 1000 // n AS w FROM pw
       |      UNION ALL SELECT dst AS src, src AS dst, 1 + 1000 // n AS w FROM pw),
       |d0 AS (SELECT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
       |       FROM customer WHERE c_nationkey = $SpNation),
       |$rounds
       |SELECT node,
       |       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS entity_type,
       |       node // 2 AS entity_key,
       |       CAST(dist AS BIGINT) AS dist
       |FROM d$SpIters
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // Item-item cosine recommender (Sarwar et al. 2001): for every part, its
  // top-3 most-similar parts by co-purchase cosine — n_uv / √(n_u·n_v)
  // over shared-order counts. The pair-count pass reuses the co-purchase
  // generation shape (one shuffle on the order key + map-side pair
  // expansion over each order's small part list); item degrees broadcast
  // back; the per-item top-3 is a WindowGroupLimit rank, never a global
  // sort. √ is IEEE-correctly-rounded on both engines (the
  // q_temperature_sample precedent), and ties break on neighbor id, so
  // the emitted ranking is engine-exact.
  // ---------------------------------------------------------------------------
  private val CosineK = 3

  /** Per-item order counts (the cosine normalizer) — derived from the
    * pinned basket artifact and itself pinned: degrees of an at-rest
    * graph table are at-rest statistics, written once beside the table
    * (the same contract as [[tradeGraph]]'s deg relation). Without the
    * pin every cosine query pays two broadcast-build jobs re-counting a
    * static relation. */
  private val itemDegCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def itemDegrees(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(itemDegCache, s, dir) {
      import s.implicits._
      graft.Materialize.eager(
        orderPartSets(s, dir).selectExpr("explode(ps) AS item")
          .groupBy($"item").agg(count(lit(1)).as("n_item")), pin = true)
    }

  def itemCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the per-order part-set artifact feeds BOTH the pair counts (map-side
    // pair expansion) and the item degrees (explode) — the sets are
    // dedup'd, so exploding them counts each (order, part) once, exactly
    // the DISTINCT the degree needs. Pair counts and degrees are SHARED
    // (lazy persist): each is computed once inside the one consuming
    // action — the a<b expansion feeds the symmetric union's two branches,
    // the degree relation feeds both broadcast builds — with zero extra
    // driver actions (the previous eager form paid one action per
    // relation, pure scheduling overhead at any tested SF).
    val ps = orderPartSets(s, dir)
    // round 12: emit BOTH directions in the map-side expansion, so the
    // symmetric pair counts come out of ONE shuffle — no persisted a<b
    // relation, no union re-read. The expansion is two stacked explode
    // GENERATORS (whole-stage-codegen'd) rather than nested higher-order
    // transforms (per-element lambda interpretation — measured ~2x slower
    // on the same row count).
    // round 13: ONE exchange serves the whole query — the exploded pairs
    // hash-partition on u alone, which satisfies the (u,v) aggregation's
    // clustering (u ⊂ {u,v}) AND the top-k window's partitioning, so
    // neither adds its own shuffle. (Map-side combine would buy ~nothing
    // here: baskets are random, so a pre-shuffle partition rarely repeats
    // a pair.)
    val sym = ps
      .select(explode($"ps").as("u"), $"ps")
      .select($"u", explode($"ps").as("v"))
      .filter($"u" =!= $"v")
      .repartition($"u")
      .groupBy($"u", $"v")
      .agg(count(lit(1)).as("n_uv"))
    val itemCnt = itemDegrees(s, dir)
    val scored = sym
      .join(broadcast(itemCnt.select($"item".as("u"), $"n_item".as("n_u"))), Seq("u"))
      .join(broadcast(itemCnt.select($"item".as("v"), $"n_item".as("n_v"))), Seq("v"))
      .withColumn("cos", $"n_uv".cast("double") /
        sqrt($"n_u".cast("double") * $"n_v".cast("double")))
    val w = Window.partitionBy($"u").orderBy($"cos".desc, $"v".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= CosineK)
      .select($"u".as("item"), $"v".as("neighbor"), $"n_uv", $"cos", $"rank")
  }
  val itemCosineSql: String =
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |sym AS (SELECT a.p AS u, b.p AS v, count(*) AS n_uv
       |        FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p GROUP BY 1, 2),
       |ic AS (SELECT p AS item, count(*) AS n_item FROM op GROUP BY 1),
       |sc AS (SELECT sym.u, sym.v, sym.n_uv,
       |              CAST(sym.n_uv AS DOUBLE) /
       |                sqrt(CAST(cu.n_item AS DOUBLE) * CAST(cv.n_item AS DOUBLE)) AS cos
       |       FROM sym JOIN ic cu ON cu.item = sym.u
       |                JOIN ic cv ON cv.item = sym.v),
       |r AS (SELECT *, row_number() OVER (PARTITION BY u ORDER BY cos DESC, v ASC) AS rank
       |      FROM sc)
       |SELECT u AS item, v AS neighbor, n_uv, cos, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= $CosineK
       |""".stripMargin

  // ---------------------------------------------------------------------------
  // k-core decomposition of the co-purchase graph (iterative peeling,
  // Matula–Beck): repeatedly drop nodes of degree < k until the remaining
  // subgraph — the k-core — is stable. The dense core is the standard
  // "structurally important subgraph" extraction (template/hub detection
  // in near-dup graphs, influence cores in interaction graphs). Peeling
  // is BOUNDED-UNROLLED to [[KCoreRounds]] rounds on BOTH engines: after
  // the fixpoint every extra round is a no-op, so the unroll count never
  // changes the answer once convergence is reached (KCoreSpec proves
  // rounds-1 has already converged at test scale), and a corpus needing
  // more rounds changes both engines identically — never a silent
  // divergence. Scale shape: each round is one degree aggregation + two
  // semi-join filters over the shrinking edge set; rounds chain lazily
  // with shared per-round state (one action, the pagerank contract). At
  // 1000 executors the edge relation would be bucketed by u so every
  // round's degree agg is co-partitioned.
  // ---------------------------------------------------------------------------
  private val KCoreK = 4
  private[graft] val KCoreRounds = 6

  def kcore(s: SparkSession, dir: String): DataFrame =
    kcoreRounds(s, dir, KCoreRounds)

  private[graft] def kcoreRounds(s: SparkSession, dir: String, rounds: Int): DataFrame = {
    import s.implicits._
    val e0 = coPurchaseEdges(s, dir)
    // Carry the ALIVE-NODE SET between rounds, never the edge relation.
    // The keep sets are nested (a node filtered out has degree 0 ever
    // after), so filtering the BASE edges by the latest set is provably
    // equal to the iterative edge filter — per-round state drops from
    // O(edges) to O(alive nodes) (bounded by |part|), which is what blew
    // the heap at ~sf1 when 6 checkpointed edge copies stacked up
    // (115 s → the sweep's one true superlinearity). The node set is
    // BROADCAST into both semi-joins: the symmetrized edge relation is
    // persisted once and never reshuffled — each round is one cached scan
    // + broadcast semi-filters + a partial degree agg. That is the 1000-
    // executor shape: the frontier travels, the graph stays put.
    // The edge relation is persisted HASH-PARTITIONED BY u (round 19):
    // every round's degree aggregation requires clustering on u, and the
    // broadcast semi-filters preserve the cached partitioning, so all
    // `rounds` aggs (and the final core_degree agg) read the cache with
    // ZERO further exchanges — previously each round re-shuffled the
    // shrinking edge set (6 exchanges → 1). Same shape at 1000 executors:
    // this is exactly the "edge relation bucketed by u" noted above.
    val sym = graft.Materialize.shared(
      e0.union(e0.select($"v".as("u"), $"u".as("v"))).repartition($"u"))
    var alive: Option[DataFrame] = None // None = every node alive (round 1)
    for (_ <- 1 to rounds) {
      val cur = alive match {
        case None => sym
        case Some(a) =>
          sym.join(broadcast(a.select($"n".as("u"))), Seq("u"), "left_semi")
            .join(broadcast(a.select($"n".as("v"))), Seq("v"), "left_semi")
      }
      // lazyCut the per-round node set: each set is referenced by the next
      // round TWICE, so an uncut lineage grows the analyzer plan 4^rounds;
      // the truncated leaf keeps planning O(rounds) while the first action
      // still computes each round exactly once
      alive = Some(graft.Materialize.lazyCut(
        cur.groupBy($"u").agg(count(lit(1)).as("d"))
          .filter($"d" >= KCoreK).select($"u".as("n"))))
    }
    val a = alive.get
    sym.join(broadcast(a.select($"n".as("u"))), Seq("u"), "left_semi")
      .join(broadcast(a.select($"n".as("v"))), Seq("v"), "left_semi")
      .groupBy($"u".as("node"))
      .agg(count(lit(1)).cast("long").as("core_degree"))
  }
  val kcoreSql: String = {
    // every CTE is MATERIALIZED: each round is referenced by the next
    // round's keep-set AND edge filter, so an inlining planner would
    // re-evaluate the chain 3^rounds times (measured: minutes at sf0.1 vs
    // ~1 s materialized)
    val rounds = (1 to KCoreRounds).map { i =>
      val prev = if (i == 1) "sym" else s"r${i - 1}"
      s"""k$i AS MATERIALIZED (SELECT u FROM $prev GROUP BY u HAVING count(*) >= $KCoreK),
         |r$i AS MATERIALIZED (
         |  SELECT s.u, s.v FROM $prev s
         |  JOIN k$i a ON s.u = a.u JOIN k$i b ON s.v = b.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
       |      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
       |sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
       |$rounds
       |SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
       |FROM r$KCoreRounds GROUP BY u
       |""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank"      -> pagerank _,
    "q_ppr"           -> ppr _,
    "q_triangles"     -> triangles _,
    "q_assortativity" -> assortativity _,
    "q_khop"          -> khop _,
    "q_shortest_path" -> shortestPath _,
    "q_item_cosine"   -> itemCosine _,
    "q_kcore"         -> kcore _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_pagerank"      -> pagerankSql,
    "q_ppr"           -> pprSql,
    "q_triangles"     -> trianglesSql,
    "q_assortativity" -> assortativitySql,
    "q_khop"          -> khopSql,
    "q_shortest_path" -> shortestPathSql,
    "q_item_cosine"   -> itemCosineSql,
    "q_kcore"         -> kcoreSql,
  )
}
