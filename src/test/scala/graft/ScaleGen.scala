package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off ~sf1 dataset for the scale-sanity run (SURVEY §7.5): replicates
  * sf0.1 10× with deterministic key shifts so every FK stays consistent
  * within a copy, giving a corpus whose STATISTICAL structure matches
  * sf0.1 at 10× the rows — the input a linearity check needs.
  *
  *  - fact/dim keys (cust/supp/part/order/event/user ids) shift by
  *    copy·10⁹; nation/region stay the fixed 25/5 dims.
  *  - document text salts every token with the copy tag: per-copy shingle
  *    structure is IDENTICAL to the original corpus, cross-copy vocab is
  *    disjoint, so true near-dup pairs grow exactly 10× (replicating raw
  *    text instead would make every doc a 10-way near-dup of itself —
  *    a 100× pair blowup that measures the DATA, not the engine).
  *  - embeddings get hash-keyed per-copy noise (±0.05/dim), so vector
  *    neighborhoods scale like a real 10× corpus, not 10 exact clones.
  *
  * Output is a scratch dir (default /tmp/sf1) — never /root/testdata.
  */
object ScaleGen {
  private val Stride = 1000000000L
  private val Copies = 10

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(Copies).select(col("id").as("c_")))

    def shift(df: DataFrame, keys: String*): DataFrame =
      keys.foldLeft(copies(df)) { (d, k) =>
        d.withColumn(k, col(k) + col("c_") * Stride)
      }.drop("c_")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[scalegen] wrote $name")
    }

    // fixed dims pass through unchanged
    Seq("region", "nation").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    write(shift(spark.read.parquet(s"$src/customer.parquet"), "c_custkey"), "customer")
    write(shift(spark.read.parquet(s"$src/supplier.parquet"), "s_suppkey"), "supplier")
    write(shift(spark.read.parquet(s"$src/part.parquet"), "p_partkey"), "part")
    write(shift(spark.read.parquet(s"$src/orders.parquet"), "o_orderkey", "o_custkey"), "orders")
    write(shift(spark.read.parquet(s"$src/lineitem.parquet"),
      "l_orderkey", "l_partkey", "l_suppkey"), "lineitem")
    write(shift(spark.read.parquet(s"$src/events.parquet"), "event_id", "user_id"), "events")

    val docs = copies(spark.read.parquet(s"$src/documents.parquet"))
      .withColumn("doc_id", col("doc_id") + col("c_") * Stride)
      .withColumn("text", when(col("c_") === 0, col("text")).otherwise(
        // salt every token with the copy tag: same in-copy structure,
        // disjoint cross-copy vocabulary
        concat_ws(" ", expr("transform(split(text, ' '), w -> concat(w, 'z', cast(c_ as string)))"))))
      .drop("c_")
    write(docs, "documents")

    val emb = copies(spark.read.parquet(s"$src/embeddings.parquet"))
      .withColumn("vec_id", col("vec_id") + col("c_") * Stride)
      .withColumn("embedding", expr(
        // copy 0 verbatim; other copies add hash-keyed noise in (−0.05, 0.05)
        """CASE WHEN c_ = 0 THEN embedding ELSE
          |transform(embedding, (v, i) -> cast(v +
          |  (cast(pmod(hash(vec_id, i, c_), 1000) as float) / 10000.0f - 0.05f)
          |  as float)) END""".stripMargin))
      .drop("c_")
    write(emb, "embeddings")

    spark.stop()
  }
}
