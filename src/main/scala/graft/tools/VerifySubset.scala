package graft.tools

/** Development aid: [[graft.Verify]] restricted to a comma-separated
  * list of query names — a thin alias; the filtering lives in Verify
  * itself so the dump loop, session config, and JSON escaper exist
  * exactly once.
  *
  *   sbt "runMain graft.tools.VerifySubset <sfDir> <outDir> q_a,q_b"
  */
object VerifySubset {
  def main(args: Array[String]): Unit = graft.Verify.main(args)
}
