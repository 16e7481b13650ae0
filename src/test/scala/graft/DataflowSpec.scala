package graft

import org.apache.spark.sql.functions._

import graft.operators.Dataflow

/** Pins the SQL-surface semantics (SURVEY §2.4-2.6) including the reference's
  * own `test_commit` expectation (/root/reference/src/lib.rs:1194-1241):
  * offsets {1,0} on partitions {0,1} → highwater marks {2,1}. */
class DataflowSpec extends SparkSpecBase {

  test("highwater mark matches reference test_commit expectation") {
    import spark.implicits._
    // messages at (partition 0, offset 1) and (partition 1, offset 0)
    val msgs = Seq((0L, 1L), (1L, 0L)).toDF("user_id", "event_id")
    val got = msgs
      .groupBy($"user_id")
      .agg((max($"event_id") + lit(1L)).as("hwm"))
      .orderBy($"user_id")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(got === Seq((0L, 2L), (1L, 1L)))
  }

  test("delivery gap: delta==0 iff offsets dense per key") {
    import spark.implicits._
    // user 1 dense 0..3; user 2 has a hole (0,1,3)
    val df = Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (1L, 3L),
      (2L, 0L), (2L, 1L), (2L, 3L)).toDF("user_id", "event_id")
    df.createOrReplaceTempView("gap_in")
    val got = df
      .distinct()
      .groupBy($"user_id")
      .agg(min($"event_id").as("mn"), max($"event_id").as("mx"),
        count($"event_id").as("occ"))
      .withColumn("delta", $"mx" - $"mn" + lit(1L) - $"occ")
      .select($"user_id", $"delta")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got === Map(1L -> 0L, 2L -> 1L))
  }

  test("all dataflow queries run and agree on basic shape at sf0.001") {
    val e = Dataflow.deliveryGap(spark, sfDir)
    assert(e.count() > 0)
    assert(e.columns.toSeq === Seq("user_id", "min_off", "max_off", "occ",
      "offset_diff", "delta"))
    assert(Dataflow.doubleWrite(spark, sfDir).count() === 0) // clean data
    assert(Dataflow.highwater(spark, sfDir).count() > 0)
    assert(Dataflow.parseProps(spark, sfDir).where(col("k").isNull).count() === 0)
  }

  test("SparkEntry registry is consistent") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracle key has a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }
}
