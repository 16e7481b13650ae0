package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.QueryModule

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Capabilities live in [[graft.ops.QueryModule]]s (one per SURVEY.md §2
  * area); this object is just the registry the driver reads.
  */
object SparkEntry {
  /** All capability modules. Order matters only for map merge (later wins);
    * names are globally unique by convention (`q_<area>_*`). */
  def modules: Seq[QueryModule] = Seq(
    operators.Dataflow,
    operators.TextOps,
    operators.Similarity,
    operators.NearDup,
    operators.Sessionize,
    operators.Multimodal,
    operators.PipelineQueries,
    operators.Relational,
    operators.Breadth,
    operators.Corpus,
    operators.Curation,
    operators.Spectral,
    operators.Profiling,
    operators.Retrieval
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's delivery-gap verification (README.md:86-99) over the
    * events table. */
  def entry(spark: SparkSession): DataFrame =
    operators.Dataflow.deliveryGap(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
