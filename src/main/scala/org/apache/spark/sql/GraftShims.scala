package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ClassicConversions.ColumnConstructorExt
import org.apache.spark.sql.classic.ColumnConversions.expression

/** Minimal bridge to Spark's `private[sql]` Column⇄Expression constructors,
  * the standard pattern for libraries that ship native Catalyst expressions
  * (Spark 4 hides `Column(expr)`/`col.expr` behind the classic converters).
  */
object GraftShims {
  def column(e: Expression): Column = ColumnConstructorExt(Column).apply(e)
  def toExpression(c: Column): Expression = expression(c)

  /** Drop the session catalog's cached table relations (file listings
    * included). `Catalog.refreshByPath` only recaches CacheManager
    * entries, so a maintenance op that rewrites files under a catalog
    * table's location needs this too — and the relation cache lives
    * behind private[sql]. */
  def invalidateCachedTables(spark: classic.SparkSession): Unit =
    spark.sessionState.catalog.invalidateAllCachedTables()
}
