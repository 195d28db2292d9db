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

  test("IVF top-k recall against brute force is measurable and sane") {
    import spark.implicits._
    val brute = Similarity.knnBrute(spark, sf).select($"qid", $"nid").cache()
    val ivf = Similarity.knnIvf(spark, sf).select($"qid", $"nid").cache()
    val hits = brute.intersect(ivf).count().toDouble
    val recall = hits / brute.count()
    info(f"IVF nprobe=1 recall@5 = $recall%.2f")
    assert(recall > 0.0 && recall <= 1.0)
    brute.unpersist(); ivf.unpersist()
  }
}
