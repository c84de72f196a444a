package graft

/** Sizing for the load/stress suites (randomized schedule fuzzers, ~1k-file
  * staircases, 100k-file manifest plans). The full sizes push `sbt test`
  * to ~35 min of wall, which does not fit a CI/driver test budget; by
  * default each such suite runs a smoke-sized fraction of its schedules
  * (same invariants, same code paths, deterministic seeds — only fewer
  * random draws), and `SPARK_GRAFT_LOAD_TESTS=1` restores the full sizes
  * for on-demand soak runs.
  */
object LoadTests {
  val enabled: Boolean = sys.env.get("SPARK_GRAFT_LOAD_TESTS").contains("1")

  /** `full` iterations under SPARK_GRAFT_LOAD_TESTS=1, else `smoke`. */
  def n(full: Int, smoke: Int): Int = if (enabled) full else smoke
}
