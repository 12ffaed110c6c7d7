package graft

/** Current build round, used to name the repo-root correctness/bench
  * records (`CORRECTNESS_local_<id>.json`, `BENCH_local_<id>.json`) so an
  * auditor always finds the freshest artifact under the round it was
  * produced in.
  *
  * The id is DERIVED, never hand-bumped (VERDICT r12 #1: the constant was
  * stale at the start of two consecutive rounds; in r11 that made the
  * official rerun overwrite the PRIOR round's record and merge its stale
  * oracle blocks): it is max(N) over the driver's committed official
  * artifacts `BENCH_rNN.json` / `CORRECTNESS_rNN.json` at the working
  * directory, plus one. The driver writes those at round END, so the
  * derivation is stable for the whole round and a fresh round-13 clone
  * (newest artifact: r12) names its records `*_r13` with zero human
  * edits. `SPARK_GRAFT_ROUND` still overrides; `scripts/check.py` and
  * `scripts/baseline_bench.py` replicate the same derivation. */
object Round {

  private[graft] val artifactPattern =
    "^(?:BENCH|CORRECTNESS)_r(\\d+)\\.json$".r

  /** `r<max committed official round + 1>`, or `r1` in a bare tree. */
  private[graft] def derive(root: java.io.File): String = {
    val rounds = Option(root.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => artifactPattern.findFirstMatchIn(f.getName)
        .map(_.group(1).toInt))
    if (rounds.isEmpty) {
      // Loud on cwd mismatch (VERDICT r13 #3): deriving `r1` is only
      // legitimate in a bare round-1 repo root. A Bench/Verify launched
      // from any OTHER directory sees no artifacts and silently
      // mis-names its records `*_r1` — warn so the misfire is visible
      // in the run's own stderr instead of in a later audit.
      if (!new java.io.File(root, "src/main/scala/graft").isDirectory)
        Console.err.println(s"[round] derived r1 at $root, which has no " +
          "src/main/scala/graft — not the repo root? Records would be " +
          "misnamed; set SPARK_GRAFT_ROUND or launch from the repo root.")
      "r1"
    } else s"r${rounds.max + 1}"
  }

  val id: String = sys.env.getOrElse("SPARK_GRAFT_ROUND",
    derive(new java.io.File(System.getProperty("user.dir"))))
}
