package graft

import graft.streaming.StreamingEntry

/** The streaming-surface manifest gate: every declared twin must hold
  * its parity contract (agg twins: streamed == batch transform; fold
  * twins: N-split fold == 1-split fold) over the real fixture tables.
  * This is the in-suite mirror of the one-command
  * `runMain graft.streaming.StreamingParity` harness. */
class StreamingEntrySpec extends SparkSpecBase {

  test("every declared streaming twin holds its parity contract (3-split)") {
    val results = StreamingEntry.twins.toSeq.sortBy(_._1).map {
      case (name, twin) => name -> twin.run(spark, Sf0001, 3)
    }
    val broken = results.collect { case (n, p) if !p.ok => n }
    assert(broken.isEmpty, s"parity broken for: ${broken.mkString(", ")}")
    assert(results.size >= 12, "streaming manifest shrank unexpectedly")
    // both parity classes must stay represented
    val kinds = StreamingEntry.twins.values.map(_.kind).toSet
    assert(kinds === Set("agg", "fold"))
  }
}
