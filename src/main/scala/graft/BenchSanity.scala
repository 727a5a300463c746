package graft

/** Contaminated-run guard for the bench harness: three cheap,
  * plan-diverse registry canaries, each driven once untimed (codegen /
  * footer warm) and then timed twice. On an idle box the two timed
  * runs of a warmed sub-second query agree closely; transient host
  * load — the r9 and r11 bench-artifact contaminations, both of which
  * showed contiguous bands of 3-8× inflation on queries whose plans
  * had not changed — makes them disagree. [[graft.Bench]] probes once
  * after warmup and once after the timed loop and persists both
  * instability numbers plus the pre→post drift into the artifact, so
  * the NEXT contaminated artifact is diagnosable (and discardable)
  * without an idle-box rerun; BenchSanitySpec asserts the probe's
  * steady-state property on the test fixture.
  */
object BenchSanity {

  /** Plan-diverse and individually sub-second at sf0.1: a wide
    * aggregate, a pushed semi-join, and a rollup. */
  val Canaries: Seq[String] = Seq("q1_pricing_summary", "q4_semi_join", "q13_rollup")

  /** Warm each canary once, then time it twice. A failing canary
    * PROPAGATES: timing the exception path would report a fast,
    * stable probe and silently defeat the contamination guard
    * ([[graft.Bench]] catches it and marks the artifact's canary
    * block failed instead).
    */
  def sample(drive: String => Unit): Map[String, (Double, Double)] =
    Canaries.map { n =>
      def one(): Double = {
        val t0 = System.nanoTime()
        drive(n)
        (System.nanoTime() - t0) / 1e9
      }
      one() // untimed warm: steady state is the property under test
      n -> ((one(), one()))
    }.toMap

  /** Max over canaries of slower/faster timed run — ≈ 1 on an idle
    * box, ≥ 2 under the transient contention the guard exists for. */
  def instability(samples: Map[String, (Double, Double)]): Double =
    samples.values
      .map { case (a, b) => math.max(a, b) / math.max(1e-9, math.min(a, b)) }
      .max

  /** Ratio of summed per-canary best times, post-run vs pre-run —
    * load arriving (or leaving) DURING the bench shows here even when
    * each probe was individually stable. */
  def drift(pre: Map[String, (Double, Double)],
      post: Map[String, (Double, Double)]): Double = {
    def best(m: Map[String, (Double, Double)]): Double =
      m.values.map { case (a, b) => math.min(a, b) }.sum
    best(post) / math.max(1e-9, best(pre))
  }
}
