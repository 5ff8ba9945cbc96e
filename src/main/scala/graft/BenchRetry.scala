package graft

/** Fresh-JVM arbitration bracket (round-13 directive #3): Bench's in-run
  * retry of flagged queries used to re-run inside the end-of-suite JVM —
  * 170+ compiled query plans, a 124 MB code cache, whatever JIT/deopt
  * state the sequence accumulated — so a "regression" verdict could not
  * distinguish a real plan change from suite-state pollution (round 13's
  * l102 at retry_norm 1.614 on byte-identical code was exactly this
  * ambiguity). This main is the clean room: Bench spawns ONE fresh JVM
  * for the whole flagged set, each query re-measures under the full
  * steady discipline (untimed warm + min-of-2) with hot d01 probes
  * bracketing the window, and the parent normalizes against the child's
  * own probe — so a still-degraded HOST cancels to first order while
  * suite-state pollution is gone by construction.
  *
  * Round-16 fix (verdict #1): each flagged query re-measures under
  * BenchTiming.steadyPlateau — warm until two consecutive readings agree
  * within 10% — NOT the suite's single-warm discipline. The round-15
  * bracket's three "regression" verdicts (l56 2.579, d30 1.930, d31
  * 1.607, all on code untouched for ≥3 rounds) were the bracket's own
  * bias: baseline rows were recorded IN-SUITE in a JVM warmed by 100+
  * preceding query shapes, while the child warmed only d01+d05 — the
  * d01 probe normalizes host speed, not JIT ramp, and those three are
  * the shapes most exposed to cold-JIT ramp (BPE's tiny-action merge
  * loop; sub-second window/anti-join cohorts). BASELINE_ROWS.json
  * additionally carries `<name>_fresh` twins (re-measured under this
  * same child discipline) + `d01_fresh`, which the parent prefers when
  * verdicting a fresh bracket — like-for-like by construction.
  *
  * Protocol (stdout, line-oriented; Spark logs go to stderr and the
  * parent redirects them to a file):
  *   RETRY_PROBE=<sec>       d01 steady time after session warm-up
  *   RETRY:<name>=<sec>      per flagged query, plateau-steady time
  *   RETRY_PROBE_END=<sec>   d01 steady time after the flagged set
  */
object BenchRetry {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchRetry <sfDir> <name,name,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.build("graft-bench-retry")
    // Same session warm-up as Bench: parquet footers + scheduler paths.
    Seq("d01_scan_count", "d05_multiway_join")
      .foreach(n => BenchTiming.runOnce(spark, n, sfDir))
    def r6(v: Double): String = "%.6f".formatLocal(java.util.Locale.US, v)
    println(s"RETRY_PROBE=${r6(BenchTiming.steady(spark, "d01_scan_count", sfDir))}")
    names.foreach { n =>
      println(s"RETRY:$n=${r6(BenchTiming.steadyPlateau(spark, n, sfDir))}")
    }
    println(s"RETRY_PROBE_END=${r6(BenchTiming.steady(spark, "d01_scan_count", sfDir))}")
    spark.stop()
  }
}
