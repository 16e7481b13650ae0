package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism for expensive narrow kernels.
  *
  * The bench fixtures are single-row-group parquet files, so every base
  * scan is exactly ONE partition — and a narrow per-row kernel placed
  * directly over it (codec encode/decode, shingling+minhash, BPE) runs
  * on one core no matter how many the session has. At deployment scale
  * the same scan has thousands of partitions and needs nothing.
  *
  * [[spread]] bridges the two regimes without a constant tuned for
  * either: it hash-repartitions to `defaultParallelism` ONLY when the
  * input currently has fewer partitions than that, so at 100 TB it is
  * a structural no-op (scan partitions ≫ cores) while on a starved
  * scan it buys cores× on the kernel stage. The exchange it may insert
  * moves only the narrow pre-kernel columns (callers project first), so
  * even when it does fire the shuffled bytes are key+metadata, never
  * payloads — the guide's "shuffle a lightweight proxy" rule.
  *
  * Apply it ONLY where per-row work dominates the scan (codecs, token
  * kernels): a scan-speed aggregate gains nothing and would pay an
  * exchange it never needed.
  */
object Par {
  /** `df` hash-partitioned on `key` across the session's default
    * parallelism, or `df` unchanged when it is already at least that
    * parallel (the at-scale case). Keyed repartition keeps the
    * assignment deterministic under task retry (no round-robin /
    * rand()-derived keys — SPARK-38388). */
  def spread(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
