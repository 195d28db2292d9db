package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Z-order (Morton space-filling curve) clustering key — the layout
  * primitive behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the
  * bits of two columns gives ONE sort key whose contiguous ranges are
  * small rectangles in (x, y) space, so a file sorted by it gets
  * row-group min/max bounds that are tight boxes in BOTH dimensions —
  * a 2-D range predicate then skips most row groups at the footer, where
  * a 1-D sort only ever prunes its own column. ScaleSpec measures the
  * skip rate on real parquet footers.
  *
  * The z-value is pure integer bit arithmetic (16 bits per dimension,
  * unrolled shift/mask terms with identical expression text in both
  * engines), so the oracle hash-matches bit-for-bit. At 100 TB this is a
  * one-time layout write (sort by z within partitions — Spark's
  * `sortWithinPartitions` after a range partition on z); every
  * subsequent 2-D slice query pays footer reads instead of full scans.
  */
object ZOrder {

  /** Unrolled 16-bit interleave: even bit positions take x's bits, odd
    * take y's. Pure BIGINT shift/mask/add — exact in both engines; only
    * the shift spelling differs (Spark `shiftleft`/`shiftright`
    * functions, DuckDB `<<`/`>>` operators). */
  def zExprSpark(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  def zExprDuck(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " + ", ")")

  /** Orders keyed by (customer, order epoch-day) — the classic "this
    * customer, this date range" slice — with the Morton key alongside. */
  def zorderKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .selectExpr(
        "o_orderkey",
        // BIGINT throughout: an INT lane would overflow at shift 31
        "CAST(o_custkey & 65535 AS BIGINT) AS xk",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') & 65535 AS BIGINT) AS yk")
      .selectExpr("o_orderkey", "xk", "yk", s"${zExprSpark("xk", "yk")} AS zvalue")
  }
  val zorderKeysSql: String =
    s"""WITH k AS (
       |  SELECT o_orderkey,
       |         CAST(o_custkey & 65535 AS BIGINT) AS xk,
       |         CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') & 65535 AS BIGINT) AS yk
       |  FROM orders)
       |SELECT o_orderkey, xk, yk,
       |       CAST(${zExprDuck("xk", "yk")} AS BIGINT) AS zvalue
       |FROM k
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> zorderKeys _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_zorder" -> zorderKeysSql,
  )
}
