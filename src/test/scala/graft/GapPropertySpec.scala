package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

/** Property pin for the flagship semantics (SURVEY §5c): on any offset
  * multiset, delta == 0 in the delivery-gap aggregate iff the distinct
  * offsets form a dense range — i.e. nothing was lost. Uses raw
  * ScalaCheck (the scalatest bridge isn't in the offline cache). */
class GapPropertySpec extends SparkSpecBase {

  private val offsetSets: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 40L))

  test("delta == 0 iff distinct offsets are dense (property)") {
    import spark.implicits._
    val prop = Prop.forAll(offsetSets) { offsets =>
      val delta = offsets.map(o => (1L, o)).toDF("user_id", "event_id")
        .distinct()
        .groupBy($"user_id")
        .agg(min($"event_id").as("mn"), max($"event_id").as("mx"),
          count($"event_id").as("occ"))
        .select(($"mx" - $"mn" + lit(1L) - $"occ").as("delta"))
        .as[Long].head()
      val ds = offsets.distinct.sorted
      val dense = ds.last - ds.head + 1 == ds.size
      (delta == 0L) == dense
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }
}
