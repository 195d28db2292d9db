package graft.mask

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Role-based column masking — the `employees_masked` security view
  * (ref: init-scripts/init-db.sql:74-89: first_name/last_name/address are
  * NULLed for `sportadvantagebiuser`). `current_user` becomes an explicit
  * engine/session parameter; the projection is pure `when(...)` columns, so
  * Catalyst folds it to constants per session and the masked columns never
  * leave the scan when pruned.
  */
object Masking {

  val defaultMaskedColumns: Seq[String] = Seq("first_name", "last_name", "address")

  /** @param isBiUser the session role: the BI user sees NULLs in PII columns
    *                  (matching the reference view's `current_user` test). */
  def maskedView(df: DataFrame, isBiUser: Boolean,
                 columns: Seq[String] = defaultMaskedColumns): DataFrame = {
    val projected = df.columns.map { c =>
      if (columns.contains(c))
        when(lit(isBiUser), lit(null).cast(df.schema(c).dataType))
          .otherwise(col(c)).as(c)
      else col(c)
    }
    df.select(projected.toIndexedSeq: _*)
  }
}
