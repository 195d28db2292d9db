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

  test("every vector gets exactly one IVF centroid") {
    import spark.implicits._
    val a = Similarity.ivfAssign(spark, sf).cache()
    assert(a.count() == a.select($"vec_id").distinct().count())
    assert(a.filter($"centroid_id" >= 16 || $"centroid_id" < 0).count() == 0)
    // centroids assign to themselves with cosine ~1
    assert(a.filter($"vec_id" === $"centroid_id" && $"centroid_cosine" < 0.999).count() == 0)
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
    assert(r1 > 0.0 && r1 <= 1.0)
    assert(r2 >= r1, s"nprobe=2 recall $r2 < nprobe=1 recall $r1")
    brute.unpersist()
  }
}
