package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the integer-exact PageRank — the oracle pins exact
  * values; these pin the invariants that make it a PageRank. */
class GraphSpec extends AnyFunSuite {
  import graft.operators.Graph
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("pagerank: one row per graph node, typed by key parity") {
    import spark.implicits._
    val pr = Graph.pagerank(spark, sf).cache()
    assert(pr.select($"node").distinct().count() == pr.count())
    assert(pr.filter($"entity_type" === "customer" && $"node" % 2 =!= 0).count() == 0)
    assert(pr.filter($"entity_type" === "supplier" && $"node" % 2 =!= 1).count() == 0)
    // node id encodes the entity key
    assert(pr.filter($"entity_key" =!= expr("node div 2")).count() == 0)
    pr.unpersist()
  }

  test("pagerank: probability mass is conserved up to integer truncation") {
    import spark.implicits._
    val pr = Graph.pagerank(spark, sf).cache()
    val total = pr.agg(sum($"rank_scaled")).first().getLong(0)
    val scale = 1000000000000L
    // each integer division truncates < 1 unit per row per iteration; with
    // 5 iterations the loss is bounded far below 1% of the mass
    assert(total <= scale, s"mass $total exceeds the scale")
    assert(total >= (scale * 99) / 100, s"mass $total lost >1% to truncation")
    assert(pr.filter($"rank_scaled" <= 0).count() == 0, "ranks must stay positive")
    pr.unpersist()
  }

  test("pagerank: deterministic across runs") {
    import spark.implicits._
    val a = Graph.pagerank(spark, sf)
    val b = Graph.pagerank(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("triangles: degree-ordered count equals the naive ordered 3-clique join") {
    import spark.implicits._
    val row = Graph.triangles(spark, sf).first()
    // in-engine ground truth via the naive a<b<c join (the oracle proves
    // the same equality cross-engine; this pins the orientation logic)
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
    val e = op.as("a").join(op.as("b"), Seq("o"))
      .filter($"a.p" < $"b.p")
      .select($"a.p".as("u"), $"b.p".as("v")).distinct().cache()
    val naive = e.as("e1")
      .join(e.as("e2"), $"e1.v" === $"e2.u")
      .join(e.as("e3"), $"e3.u" === $"e1.u" && $"e3.v" === $"e2.v")
      .count()
    assert(row.getAs[Long]("n_triangles") == naive,
      s"degree-ordered ${row.getAs[Long]("n_triangles")} != naive $naive")
    // wedge identity: every triangle closes exactly 3 wedges
    assert(row.getAs[Long]("n_wedges") >= 3 * row.getAs[Long]("n_triangles"))
    e.unpersist()
  }

  test("ppr: equals an independent driver-side synchronous integer reference") {
    import spark.implicits._
    // rebuild the sf0.001 trade graph driver-side and replay the exact
    // integer recurrence with plain Scala Longs (/ on non-negative longs
    // truncates like Spark's div) — the distributed plan must match every
    // node's rank to the bit (the LPA reference-spec pattern)
    val pairs = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct().as[(Long, Long)].collect()
    val edges = pairs.toSeq ++ pairs.toSeq.map(p => (p._2, p._1))
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = deg.keySet
    val seedsIn = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_mktsegment" === "BUILDING")
      .select(($"c_custkey" * 2).as("n")).as[Long].collect().toSet & nodes
    val ns = seedsIn.size.toLong
    assert(ns > 0, "fixture must contain BUILDING customers in the graph")
    val scale = 1000000000000L
    var r: Map[Long, Long] =
      nodes.map(n => n -> (if (seedsIn(n)) scale / ns else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s0, d0) <- edges) in(d0) += r(s0) / deg(s0)
      r = nodes.map(n => n ->
        ((if (seedsIn(n)) (3L * scale) / (20L * ns) else 0L) + (17L * in(n)) / 20L)).toMap
    }
    val got = Graph.ppr(spark, sf)
      .select($"node", $"rank_scaled").as[(Long, Long)].collect().toMap
    assert(got == r, "distributed PPR must equal the synchronous reference bit-for-bit")
    // seed flag integrity
    val flags = Graph.ppr(spark, sf)
      .select($"node", $"is_seed").as[(Long, Long)].collect().toMap
    assert(flags.filter(_._2 == 1L).keySet == seedsIn)
  }

  test("khop frontier BFS equals a driver-side synchronous reference") {
    import spark.implicits._
    // independent reference: adjacency map + set-based BFS over the same
    // co-purchase edges and seed brand
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").as[(Long, Long)].collect()
    val byOrder = li.toSeq.distinct.groupBy(_._1).values
    val edges = byOrder.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.size)
        yield (parts(i), parts(j))
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = spark.read.parquet(s"$sf/part.parquet")
      .filter($"p_brand" === "Brand#11").select($"p_partkey").as[Long].collect().toSet
    var visited = seeds
    var frontier = seeds
    var expect = Vector((0, seeds.size.toLong))
    for (h <- 1 to 3) {
      val nxt = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- visited
      visited ++= nxt
      expect :+= (h, nxt.size.toLong)
      frontier = nxt
    }
    val got = Graph.khop(spark, sf)
      .select($"hop", $"n_new").as[(Int, Long)].collect().sortBy(_._1).toVector
    assert(got == expect, s"BFS levels diverge: got $got expected $expect")
    // cumulative column is the running sum of the levels
    val cum = Graph.khop(spark, sf)
      .select($"hop", $"n_cum").as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(cum.toVector == expect.scanLeft(0L)(_ + _._2).tail.toVector)
  }
  test("k-core peel has converged before the unroll bound at test scale") {
    import spark.implicits._
    val atBound = Graph.kcore(spark, sf)
      .select($"node", $"core_degree").as[(Long, Long)].collect().toSet
    val oneEarlier = Graph.kcoreRounds(spark, sf, Graph.KCoreRounds - 1)
      .select($"node", $"core_degree").as[(Long, Long)].collect().toSet
    assert(atBound == oneEarlier,
      "round KCoreRounds-1 must already be the fixpoint - raise the bound if not")
    // the core is a real subgraph: every surviving node keeps degree >= k
    assert(atBound.forall(_._2 >= 4))
  }

}
