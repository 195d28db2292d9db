package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Governance, Graph, Lakehouse, Temporal}
import graft.sources.Tables

/** Round-10 operator family: governance audits, blocked entity resolution,
  * SCD2 point-in-time lookup, weighted shortest paths, and incremental view
  * maintenance. Each test pins an algebraic invariant the oracle hash can't
  * express directly (conservation, blocking bounds, in-engine equivalence
  * of two algorithms). */
class GovernanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("k-anonymity classes partition the table: sum of k equals row count") {
    import org.apache.spark.sql.functions._
    val classes = Governance.kAnonymity(spark, sf)
    val total = classes.agg(sum("k")).head.getLong(0)
    assert(total == Tables.customer(spark, sf).count())
    // every suppressed class is small or non-diverse, and vice versa
    val bad = classes.filter(
      (col("suppress") && col("k") >= 5 && col("l_div") >= 2) ||
      (!col("suppress") && (col("k") < 5 || col("l_div") < 2))).count()
    assert(bad == 0)
  }

  test("fuzzy-match pair counts respect the per-block quadratic bound") {
    import org.apache.spark.sql.functions._
    // n_pairs per (noun, brand) can never exceed C(block_size, 2) summed
    // over the size bands inside it — recompute the bound independently.
    val p = Tables.part(spark, sf)
      .select(split(col("p_name"), " ").getItem(1).as("noun"),
        col("p_brand"), expr("p_size div 10").as("size_band"))
      .groupBy("noun", "p_brand", "size_band").count()
      .groupBy("noun", "p_brand")
      .agg(sum(expr("count * (count - 1) div 2")).as("bound"))
    val got = Governance.fuzzyMatch(spark, sf)
    val viol = got.join(p, Seq("noun", "p_brand"))
      .filter(col("n_pairs") > col("bound")).count()
    assert(viol == 0)
    // exact pairs have distance 0, so sum_dist must be attainable:
    // n_near pairs contribute >= 1 each
    assert(got.filter(col("sum_dist") < col("n_near")).count() == 0)
  }

  test("scd2 lookup equals the in-engine interval-containment join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val v = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("version_id"),
        expr("max_by(value, event_id)").as("version_value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc)
    val dim = v.withColumn("valid_to", lead($"ts", 1).over(w))
      .withColumnRenamed("ts", "valid_from")
    val c = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val direct = c.join(dim,
        c("user_id") === dim("user_id") && dim("valid_from") <= c("ts") &&
          (dim("valid_to").isNull || c("ts") < dim("valid_to")), "left")
      .select(c("event_id"), c("user_id"), dim("version_id"), dim("version_value"),
        (unix_micros(c("ts")) - unix_micros(dim("valid_from"))).as("age_us"))
    val got = Temporal.scd2Lookup(spark, sf)
    assert(got.count() == c.count()) // left-join semantics: one row per click
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }

  test("shortest-path distances relax monotonically and respect seed zeros") {
    import org.apache.spark.sql.functions._
    val d = Graph.shortestPath(spark, sf)
    // seeds (nation-3 customers) are at distance 0
    val seeds = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === 3).select(col("c_custkey").as("entity_key"))
    val seedDists = d.filter(col("entity_type") === "customer")
      .join(seeds, "entity_key").select("dist").distinct().collect().map(_.getLong(0))
    assert(seedDists.toSeq == Seq(0L))
    // no negative distances; non-seed reachable nodes are strictly positive
    assert(d.filter(col("dist") < 0).count() == 0)
    assert(d.filter(col("dist") === 0 && col("entity_type") === "supplier").count() == 0)
  }

  test("IVM maintenance equals direct recomputation over the live changelog") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cutoff = lit(java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val ch = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val bucket = expr(
      "cast(conv(substr(md5(cast(cast(event_id as string) as binary)), 1, 4), 16, 10) as int) % 7")
    val live = ch.filter($"ts" < cutoff).filter(bucket =!= 0)
      .union(ch.filter($"ts" >= cutoff))
    val direct = live.groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"cents").cast("long").as("revenue_cents"))
    val got = Lakehouse.ivmAgg(spark, sf)
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }
}
