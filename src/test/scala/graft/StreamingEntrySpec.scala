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

  test("ingest funnel: seenQ broadcast-cap switchover preserves verdicts " +
      "and drops the hint past the cap") {
    // The cross-batch seen-hash state grows with stream lifetime, so the
    // funnel only HINTS the broadcast under a size cap; past it the probe
    // degrades to an unhinted h-keyed join. Fold the same 3-batch feed
    // through both regimes (cap = MaxValue: always hinted; cap = 0:
    // never) — the 8 accumulated stage counts and the folded hash state
    // must be identical either side of the switchover.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val idx = graft.operators.CorpusOps.corpusIndex(spark, Sf0001)
    val feed = graft.Tables.documents(spark, Sf0001)
      .where($"doc_id" % 10 === 7).select($"doc_id", $"text")
      .orderBy($"doc_id").collect()
    val batches = feed.grouped(math.max(1, (feed.length + 2) / 3)).toSeq
      .map(rs => rs.map(r => (r.getLong(0), r.getString(1))).toSeq
        .toDF("doc_id", "text"))
    def fold(cap: Long): (Seq[Long], Set[String]) = {
      var seen: DataFrame = Seq.empty[String].toDF("h")
      val acc = new Array[Long](8)
      batches.foreach { b =>
        val (counts, qh) = graft.operators.CorpusOps
          .ingestFunnelBatch(idx, seen, b, seenQBroadcastCap = cap)
        val r = counts.collect()(0)
        (0 until 8).foreach(i => acc(i) += (if (r.isNullAt(i)) 0L else r.getLong(i)))
        seen = seen.union(qh).distinct().localCheckpoint(true)
      }
      (acc.toSeq, seen.collect().map(_.getString(0)).toSet)
    }
    val (cHinted, sHinted) = fold(Long.MaxValue)
    val (cUnhinted, sUnhinted) = fold(0L)
    assert(cHinted === cUnhinted, "stage counts diverge across the switchover")
    assert(sHinted === sUnhinted, "folded seen-hash state diverges")
    assert(cHinted.head > 0, "feed was empty — parity would be vacuous")
    // structural: past the cap the seen-probe frame carries NO broadcast
    // hint (statistics may still choose one — only the FORCED hint is
    // the scale liability)
    val seen1 = Seq("beef").toDF("h").localCheckpoint(true)
    def hasHint(cap: Long): Boolean =
      graft.operators.CorpusOps.seenProbeFrame(seen1, cap)
        .queryExecution.analyzed.collectFirst {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
            if h.hints.strategy.exists(
              _.toString.toUpperCase.contains("BROADCAST")) => h
        }.nonEmpty
    assert(hasHint(Long.MaxValue), "under the cap the probe must be hinted")
    assert(!hasHint(0L), "past the cap the broadcast hint must be dropped")
  }
}
