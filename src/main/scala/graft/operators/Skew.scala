package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (builder mandate: salting for skew; AQE handles
  * moderate skew automatically — `spark.sql.adaptive.skewJoin` — but a
  * pathological hot key, e.g. one user with 10% of a 100 TB event log, needs
  * explicit salting because a single post-split partition must still hold the
  * whole hot-key aggregate/join-side).
  *
  * Both helpers are pure plan rewrites — deterministic salts from xxhash64 of
  * a unique column, no RNG, so results are replayable.
  */
object Skew {

  /** Two-phase salted aggregation for decomposable aggregates (count/sum):
    * phase 1 aggregates on (key, salt) — splitting a hot key across
    * `buckets` reducers — phase 2 re-aggregates on key alone. The phase-2
    * input is `buckets` rows per key, so its shuffle is trivially small.
    *
    * @param saltFrom unique-ish column used to derive the deterministic salt
    */
  def saltedCountSum(df: DataFrame, key: String, value: Column,
                     saltFrom: Column, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(value).as("_sum"))
      .groupBy(col(key))
      .agg(sum(col("_cnt")).cast("long").as("cnt"), sum(col("_sum")).as("sum"))

  /** Salted broadcast-free join for a skewed big side: the big side gets a
    * deterministic salt in [0, buckets); the small side is replicated once
    * per salt value (explode, ×buckets rows); the join key becomes
    * (key, salt), so a hot key's rows spread over `buckets` tasks.
    * Semantics identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFrom: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(xxhash64(saltFrom), lit(buckets.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
