package graft

/** Session hygiene for long-lived driver programs.
  *
  * Several operators hand a lazily-evaluated plan back to the caller
  * while that plan still reads a persisted or locally-checkpointed
  * intermediate (LSH candidate pairs, component labels, cached cell
  * assignments, …). Each module frees the PREVIOUS invocation's
  * blocks when the SAME operator runs again — the one-slot swap — but
  * the LAST invocation's blocks stay pinned until then. In a serial
  * gate/bench run that is one operator's worth of blocks; in a
  * long-lived session running a MIXED workload it is up to one
  * intermediate per module, squeezing the executor storage pool (and
  * with it the execution-memory ceiling shuffles spill against).
  * Measured: at 10⁷ docs, a dedup_survivor run immediately after a
  * dedup_clusters run in the same session was ~2× its clean-session
  * cost until the prior rung's blocks were released.
  *
  * Call [[transients]] between queries once the previous result has
  * been fully materialized (collected, written, or abandoned). Do NOT
  * call it while a returned DataFrame is still to be evaluated: local
  * checkpoints cannot be recomputed, so a released plan fails with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND rather than silently recomputing.
  */
object Release {

  /** Free every cached / locally-checkpointed intermediate the operator
    * modules still pin. Driver-side, asynchronous (non-blocking
    * unpersist), idempotent. */
  def transients(): Unit = {
    operators.NearDup.releaseTransients()
    operators.Similarity.releaseTransients()
    operators.TextOps.releaseTransients()
    operators.Corpus.releaseTransients()
    operators.Curation.releaseTransients()
    operators.Multimodal.releaseTransients()
  }
}
