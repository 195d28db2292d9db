package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * state is materialized per iteration (`Materialize.eager`), so the plan
  * stays O(1) deep and a lost executor recomputes one iteration, not the
  * whole chain. At 1000 executors the edge relation would be
  * pre-partitioned by src (bucketed), making each message pass a
  * co-partitioned join; the iteration structure is unchanged.
  *
  * The graph centrality signal is the same one used for influence-based
  * curation over document kNN graphs (select central/representative docs);
  * the trade graph is the schema's natural test graph.
  */
object Graph {

  private val Scale = 1000000000000L // rank mass: 1e12 micro-units
  private val Iters = 5

  def pagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // distinct trading pairs; customer keys even, supplier keys odd
    val pairs = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val edges = graft.Materialize.eager(
      pairs.union(pairs.select($"dst".as("src"), $"src".as("dst"))))
    val deg = graft.Materialize.eager(
      edges.groupBy($"src".as("node")).agg(count(lit(1)).as("deg")))
    // |V| as a broadcast 1-row relation — the constant stays distributed
    // (no driver collect), and BASE = (3·Scale) div (20·|V|) is computed
    // with the same integer expression text on both engines.
    val n = deg.agg(count(lit(1)).as("n"))
    var state = deg.crossJoin(broadcast(n))
      .selectExpr("node", "deg", s"${Scale}L div n AS r", "n")
    for (_ <- 1 to Iters) {
      val contrib = state
        .join(edges, $"node" === $"src")
        .selectExpr("dst", "r div deg AS c", "n")
      val inSum = contrib.groupBy($"dst")
        .agg(sum($"c").as("insum"), first($"n").as("n"))
      state = graft.Materialize.eager(
        inSum.join(deg, $"dst" === $"node")
          .selectExpr("node", "deg",
            s"(3L * ${Scale}L) div (20L * n) + (17L * insum) div 20L AS r",
            "n"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> pagerank _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_pagerank" -> pagerankSql,
  )
}
