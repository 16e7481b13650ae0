package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Table DDL + physical layout (S6): the Spark analogue of the
  * reference's sink table `CREATE TABLE ... ENGINE = MergeTree PRIMARY KEY
  * (partition, offset, timestamp)` (/root/reference/README.md:73-82).
  *
  * MergeTree's primary key is a clustered sort order, not a constraint;
  * the parquet equivalent is hash-distributing on the leading key and
  * sorting within files, which gives the same two scale properties:
  * range-predicate row-group skipping (parquet min/max stats on the sort
  * columns) and cheap merge-style reads per partition.
  */
object Ddl {

  /** Write `df` as a sorted parquet table and register it in the catalog.
    * `sortCols.head` doubles as the distribution key. */
  def createSortedTable(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      path: String,
      sortCols: Seq[String],
      numFiles: Int = 4): Unit = {
    df.repartition(numFiles, col(sortCols.head))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"CREATE TABLE $table USING parquet LOCATION '$path'")
  }

  /** Write `df` as a BUCKETED catalog table: rows are hash-distributed
    * into `buckets` files by `bucketCol` and sorted within each bucket.
    * Two tables bucketed the same way join WITHOUT any shuffle — Spark
    * proves both sides already share the required hash distribution, so
    * the sort-merge join reads co-located buckets directly. At 100 TB
    * this is the difference between re-shuffling the fact table on every
    * join and paying the distribution cost ONCE at write time (the same
    * trade the reference's MergeTree primary key makes for reads);
    * pinned by AggregatorDdlSpec's exchange-free-join plan assertion. */
  def createBucketedTable(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int = 8): Unit = {
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }
}
