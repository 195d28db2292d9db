package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Collection-function surface (§2.6 breadth): Spark's array higher-order
  * functions (`transform` / `filter` / `aggregate` / `slice`), relational
  * UNPIVOT (melt), and positional LATERAL explode — the API family an
  * embedding- and token-bearing schema leans on constantly.
  *
  * Determinism: every float reduction is an ORDER-FIXED left fold
  * (`aggregate` in Spark ≡ `list_reduce` over a 0-prepended list in DuckDB —
  * same element order, same IEEE adds, identical bits; repo rule 2). Floats
  * are cast to double BEFORE any arithmetic on both engines.
  *
  * Scale: all three are per-row codegen'd/narrow operations — no shuffle
  * anywhere. The HOF lambdas are CodegenFallback (rule 13), fine here because
  * each array is touched once per query; pipelines that reference derived
  * arrays repeatedly should use explode + hash-agg instead (see Dedup).
  */
object Collections {

  import Tok.{toksDuck, toksExpr}

  // ---------------------------------------------------------------------------
  // Higher-order functions over the embedding column: dimensionality, ordered
  // sum fold, predicate count, elementwise-square fold, prefix-slice fold.
  // ---------------------------------------------------------------------------
  def hofFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .selectExpr("vec_id",
        "cast(size(v) as int) AS dim",
        "aggregate(v, cast(0 as double), (a, x) -> a + x) AS sum_all",
        "cast(size(filter(v, x -> x > 0)) as int) AS n_pos",
        "aggregate(transform(v, x -> x * x), cast(0 as double), (a, x) -> a + x) AS sum_sq",
        "aggregate(slice(v, 1, 8), cast(0 as double), (a, x) -> a + x) AS sum_head8")
  val hofFuncsSql: String =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
      |SELECT vec_id,
      |       CAST(len(v) AS INT) AS dim,
      |       list_reduce(list_prepend(CAST(0 AS DOUBLE), v), (a, x) -> a + x) AS sum_all,
      |       CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
      |       list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(v, x -> x * x)), (a, x) -> a + x) AS sum_sq,
      |       list_reduce(list_prepend(CAST(0 AS DOUBLE), v[1:8]), (a, x) -> a + x) AS sum_head8
      |FROM e
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // UNPIVOT (melt): the round-trip twin of q_pivot — the wide per-status
  // counts fold back to (priority, status, cnt) long form via the native
  // Dataset.unpivot, which compiles to a single Expand over the wide rows
  // (each input row emits its 3 value columns map-side; no join, no shuffle
  // beyond the pivot's own aggregate).
  // ---------------------------------------------------------------------------
  def unpivotStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Relational.pivotStatus(s, dir)
      .unpivot(
        ids = Array($"o_orderpriority"),
        values = Array($"n_f", $"n_o", $"n_p"),
        variableColumnName = "status",
        valueColumnName = "cnt")
  }
  val unpivotStatusSql: String =
    """WITH pv AS (
      |  SELECT o_orderpriority,
      |         CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
      |         CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
      |         CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'n_f' AS status, n_f AS cnt FROM pv
      |UNION ALL SELECT o_orderpriority, 'n_o' AS status, n_o AS cnt FROM pv
      |UNION ALL SELECT o_orderpriority, 'n_p' AS status, n_p AS cnt FROM pv
      |""".stripMargin

  // ---------------------------------------------------------------------------
  // Positional lateral explode: (doc, pos, token) triples — the tokenized
  // long-form view chunkers and n-gram pipelines start from. posexplode is
  // a generator in the same codegen stage as the scan; bounded here to the
  // first 30 tokens of 20 docs to keep the oracle relation small.
  // ---------------------------------------------------------------------------
  def posExplodeTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"doc_id" < 20)
      .withColumn("toks", expr(toksExpr))
      .selectExpr("doc_id", "posexplode(toks) AS (pos, token)")
      .filter($"pos" < 30)
      .selectExpr("doc_id", "cast(pos as int) AS pos", "token")
  }
  val posExplodeTokensSql: String =
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents WHERE doc_id < 20)
       |SELECT doc_id, CAST(pos AS INT) AS pos, toks[pos + 1] AS token
       |FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS pos FROM tok) t
       |WHERE pos < 30
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hof_funcs"  -> hofFuncs _,
    "q_unpivot"    -> unpivotStatus _,
    "q_posexplode" -> posExplodeTokens _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_hof_funcs"  -> hofFuncsSql,
    "q_unpivot"    -> unpivotStatusSql,
    "q_posexplode" -> posExplodeTokensSql,
  )
}
