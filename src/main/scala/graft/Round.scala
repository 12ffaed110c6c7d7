package graft

/** Current build round, used to name the repo-root correctness/bench
  * records (`CORRECTNESS_local_<id>.json`, `BENCH_local_<id>.json`) so an
  * auditor always finds the freshest artifact under the round it was
  * produced in. Bump per round; `SPARK_GRAFT_ROUND` overrides. */
object Round {
  val id: String = sys.env.getOrElse("SPARK_GRAFT_ROUND", "r12")
}
