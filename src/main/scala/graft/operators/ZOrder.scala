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

  /** Unrolled N-way interleave: bit i of column j lands at position
    * i·n + j (round-robin), so contiguous z-ranges are small n-boxes.
    * Pure BIGINT shift/mask/add — exact in both engines; only the shift
    * spelling differs (Spark `shiftleft`/`shiftright` functions, DuckDB
    * `<<`/`>>` operators). n·bits must stay below 63. */
  def zExprSparkN(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.size
    require(n >= 2 && n * bits < 63, s"$n dims × $bits bits overflows a BIGINT")
    (for (i <- 0 until bits; (c, j) <- cols.zipWithIndex) yield
      s"shiftleft(shiftright($c, $i) & 1, ${i * n + j})")
      .mkString("(", " + ", ")")
  }
  def zExprDuckN(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.size
    (for (i <- 0 until bits; (c, j) <- cols.zipWithIndex) yield
      s"((($c >> $i) & 1) << ${i * n + j})")
      .mkString("(", " + ", ")")
  }

  /** The classic 2-column Morton key (x even bits, y odd). */
  def zExprSpark(x: String, y: String, bits: Int = 16): String =
    zExprSparkN(Seq(x, y), bits)
  def zExprDuck(x: String, y: String, bits: Int = 16): String =
    zExprDuckN(Seq(x, y), bits)

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

  /** Three-dimensional Morton key — customer × order day × order id
    * lanes, the "this customer, this date range, this id band" slice.
    * Same round-robin interleave, 48 bits total. */
  def zorderKeys3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .selectExpr(
        "o_orderkey",
        "CAST(o_custkey & 65535 AS BIGINT) AS xk",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') & 65535 AS BIGINT) AS yk",
        "CAST(o_orderkey & 65535 AS BIGINT) AS wk")
      .selectExpr("o_orderkey", "xk", "yk", "wk",
        s"${zExprSparkN(Seq("xk", "yk", "wk"))} AS zvalue")
  }
  val zorderKeys3Sql: String =
    s"""WITH k AS (
       |  SELECT o_orderkey,
       |         CAST(o_custkey & 65535 AS BIGINT) AS xk,
       |         CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') & 65535 AS BIGINT) AS yk,
       |         CAST(o_orderkey & 65535 AS BIGINT) AS wk
       |  FROM orders)
       |SELECT o_orderkey, xk, yk, wk,
       |       CAST(${zExprDuckN(Seq("xk", "yk", "wk"))} AS BIGINT) AS zvalue
       |FROM k
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> zorderKeys _,
    "q_zorder3" -> zorderKeys3 _,
  )
  val oracleSql: Map[String, String] = Map(
    "q_zorder" -> zorderKeysSql,
    "q_zorder3" -> zorderKeys3Sql,
  )
}
