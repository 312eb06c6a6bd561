package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Semantic + plan-shape coverage for the corpus-preparation operators
  * (tfidf_topk, decontaminate, pii_scrub, sequence_pack, inverted_index).
  * Oracle hashes prove value equality; these specs pin the invariants and
  * the scale-relevant plan shapes. */
class CorpusOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("perplexity_buckets: tercile sizes partition each language and " +
    "score ranges are disjoint head ≥ middle ≥ tail") {
    val rows = CorpusOps.perplexityBuckets(spark, Sf0001).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val byBucket = rs.sortBy(_.getInt(1))
      assert(byBucket.map(_.getInt(1)).toSeq === byBucket.indices.map(identity),
        s"$lang buckets must be contiguous from 0")
      // exact tercile arithmetic: bucket sizes of ((i·3) div n) partition n
      val n = byBucket.map(_.getLong(2)).sum
      val want = (0L until n).groupBy(i => i * 3 / n).view.mapValues(_.size.toLong)
      byBucket.foreach(r =>
        assert(r.getLong(2) === want(r.getInt(1).toLong), s"$lang b${r.getInt(1)}"))
      // buckets are score-descending: head's min ≥ middle's max ≥ tail's max
      byBucket.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getDouble(4) >= lo.getDouble(5),
            s"$lang: bucket ${hi.getInt(1)} min_avg below bucket ${lo.getInt(1)} max_avg")
        case _ => ()
      }
    }
    assert(rows.nonEmpty)
  }

  test("tfidf_topk: ranks are 1..k and scores non-increasing within a doc") {
    val rows = CorpusOps.tfidfTopk(spark, Sf0001, 3)
      .select($"doc_id", $"rnk", $"score_u20").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq === (1 to byRank.length))
      assert(byRank.length <= 3)
      val scores = byRank.map(_.getLong(2)).toSeq
      assert(scores === scores.sorted(Ordering[Long].reverse),
        s"scores not non-increasing: $scores")
    }
  }

  test("tfidf_topk: df join is UNhinted (stats may broadcast) and top-k is " +
      "the bounded aggregate") {
    // The vocabulary-cardinality df frame must never carry a broadcast()
    // HINT (it grows with the corpus — Heaps' law); statistics/AQE are
    // free to pick a broadcast at fixture tiers. Assert no ResolvedHint
    // survives analysis, and the physical top-k stays the bounded agg.
    val qe = CorpusOps.tfidfTopk(spark, Sf0001, 3).queryExecution
    val hints = qe.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
        if h.hints.strategy.exists(_.toString.toUpperCase.contains("BROADCAST"))
        => h
    }
    // the only permitted hint is the 1-row global-count N crossJoin
    hints.foreach { h =>
      val agg = h.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.isEmpty => a
      }
      assert(agg.nonEmpty,
        s"tfidf_topk hints a non-global-aggregate frame:\n${h.child}")
    }
    val p = qe.executedPlan.toString
    assert(p.contains("top_k_rows"), s"top-k not the bounded aggregate:\n$p")
    assert(!p.contains("Window"), s"unexpected window shuffle:\n$p")
  }

  test("decontaminate: benchmark docs are excluded and flag matches threshold") {
    val rows = CorpusOps.decontaminate(spark, Sf0001, 5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 != 0, s"benchmark doc ${r.getLong(0)} in output")
      val (nContam, flagged) = (r.getLong(2), r.getInt(4))
      assert(flagged === (if (nContam >= 5) 1 else 0))
      assert(nContam <= r.getLong(1))
    }
    // the synthetic corpus shares vocabulary, so overlap must exist
    assert(rows.exists(_.getLong(2) > 0), "no overlap found at all — suspicious")
  }

  test("decontaminate_pairs: attribution is consistent with the aggregate gate") {
    val pairs = CorpusOps.decontaminatePairs(spark, Sf0001, 3).collect()
    val contam = CorpusOps.decontaminate(spark, Sf0001, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    pairs.foreach { r =>
      val (doc, bench, shared) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(doc % 50 != 0 && bench % 50 == 0)
      assert(shared >= 3)
      // grams shared with ONE bench doc are a subset of grams shared with
      // the union of all bench docs
      assert(contam(doc) >= shared, s"doc $doc: union overlap < pair overlap")
    }
  }

  test("pii_scrub: injected PII is counted per the doc_id rules and removed") {
    val rows = CorpusOps.piiScrub(spark, Sf0001).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (if (id % 3 != 0) 1 else 0), s"emails doc $id")
      assert(r.getInt(2) === (if (id % 2 == 0) 1 else 0), s"phones doc $id")
      assert(r.getInt(3) === (if (id % 5 == 0) 1 else 0), s"ssns doc $id")
    }
    // spot-check full scrub output on one doc with all three classes
    val full = graft.Tables.documents(spark, Sf0001).where($"doc_id" === 30)
    if (full.count() > 0) {
      val scrubbed = CorpusOps.piiScrub(spark, Sf0001)
        .where($"doc_id" === 30).select($"scrubbed_head").head().getString(0)
      assert(scrubbed.contains("<EMAIL>") || scrubbed.contains("<PHONE>") ||
        scrubbed.contains("<SSN>"), s"no redaction marker in: $scrubbed")
      assert(!scrubbed.contains("@example.com"), s"email survived: $scrubbed")
    }
  }

  test("sequence_pack: offsets are contiguous within each source") {
    val rows = CorpusOps.sequencePack(spark, Sf0001, 512)
      .select($"source", $"doc_id", $"n_tok", $"start_off", $"n_windows")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      ordered.foldLeft(0L) { (expectedOff, r) =>
        assert(r.getLong(3) === expectedOff,
          s"doc ${r.getLong(1)}: start_off ${r.getLong(3)} != $expectedOff")
        assert(r.getLong(4) >= 1)
        expectedOff + r.getLong(2)
      }
    }
  }

  test("lm_score: bigram counts, exact integer sums, and the flag line up") {
    val toks = graft.Tables.documents(spark, Sf0001)
      .select($"doc_id", size(split($"text", " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = CorpusOps.lmScore(spark, Sf0001).collect()
    assert(rows.length === toks.count(_._2 >= 2))
    rows.foreach { r =>
      val (id, nBg, sum, avg, flagged) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))
      assert(nBg === toks(id) - 1, s"doc $id bigram count")
      assert(sum <= 0, s"doc $id: positive log-prob sum $sum")
      assert(avg === sum.toDouble / nBg.toDouble)
      assert(flagged === (if (avg < -4102053.0) 1 else 0))
    }
  }

  test("source_mix: shares sum to 1 and weights equalize the mixture") {
    val rows = CorpusOps.sourceMix(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
    // reweighted token mass is the same for every source: tokens*weight
    val masses = rows.map(r => r.getLong(2) * r.getDouble(4))
    masses.foreach(m => assert(math.abs(m - masses.head) < 1e-6))
  }

  test("inverted_index: postings are sorted heads of df-many docs") {
    val rows = CorpusOps.invertedIndex(spark, Sf0001, 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val postings = r.getString(2).split(",").map(_.toLong).toSeq
      assert(postings === postings.sorted, s"postings unsorted for ${r.getString(0)}")
      assert(postings.length === math.min(df, 20L).toInt)
      assert(postings.distinct.length === postings.length)
    }
  }

  test("inverted_index: bounded aggregate, single shuffle, no Window/sort-all") {
    val p = CorpusOps.invertedIndex(spark, Sf0001, 20)
      .queryExecution.executedPlan.toString
    assert(p.contains("top_k_rows"), s"postings not bounded map-side:\n$p")
    assert(!p.contains("Window"), s"unexpected window:\n$p")
  }

  test("bpe_merges: pairs are adjacent char bigrams with consistent mass") {
    val rows = CorpusOps.bpeMerges(spark, Sf0001, 20).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getString(0).length === 2, s"non-bigram ${r.getString(0)}"))
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted(Ordering[Long].reverse), "not rank-ordered")
    assert(counts.forall(_ > 0))
    // cross-check the top pair's count against a direct recomputation
    val docs = graft.Tables.documents(spark, Sf0001)
      .select("text").collect().map(_.getString(0))
    val direct = docs.iterator.flatMap(_.split(" ").iterator)
      .flatMap(w => if (w.length < 2) Iterator.empty else w.sliding(2))
      .foldLeft(Map.empty[String, Long]) { (m, p) => m + (p -> (m.getOrElse(p, 0L) + 1L)) }
    val (topPair, topN) = (rows.head.getString(0), rows.head.getLong(1))
    assert(direct(topPair) === topN, s"top pair $topPair count mismatch")
    assert(direct.values.max === topN, "a heavier pair was missed")
  }

  test("vocab_coverage: OOV mass bounded and permille consistent") {
    val rows = CorpusOps.vocabCoverage(spark, Sf0001, 256).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nOov, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nOov <= nTok)
      assert(pm === nOov * 1000 / nTok, s"permille mismatch for ${r.getString(0)}")
      assert(nTok > 0)
    }
  }

  test("rrf_fusion: ranks bounded by k, scores recompute, output ordered") {
    val rows = CorpusOps.rrfFusion(spark, Sf0001, 20).collect()
    assert(rows.nonEmpty && rows.length <= 40, s"${rows.length} rows from two top-20 arms")
    def rank(r: org.apache.spark.sql.Row, i: Int): Option[Int] =
      if (r.isNullAt(i)) None else Some(r.getInt(i))
    rows.foreach { r =>
      val (bm, cs) = (rank(r, 1), rank(r, 2))
      assert(bm.nonEmpty || cs.nonEmpty, s"row with no rank: $r")
      Seq(bm, cs).flatten.foreach(x => assert(x >= 1 && x <= 20))
      val expect = math.floor(
        (bm.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
          + cs.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)) * 1048576.0 + 0.5).toLong
      assert(r.getLong(3) === expect, s"rrf_u20 mismatch for $r")
    }
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores === scores.sorted(Ordering[Long].reverse))
    // fusion must actually fuse: at least one doc ranked by both arms
    assert(rows.exists(r => !r.isNullAt(1) && !r.isNullAt(2)),
      "no document appears in both retrieval arms — fixture degenerate")
  }

  test("stratified_sample: target is the min stratum, kept sets bounded and deterministic") {
    val a = CorpusOps.stratifiedSample(spark, Sf0001).collect()
    assert(a.nonEmpty)
    val target = a.map(_.getLong(2)).head
    assert(a.forall(_.getLong(2) == target), "target_n must be global")
    assert(target === a.map(_.getLong(1)).min, "target != min stratum size")
    a.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"kept more than stratum size: $r")
      assert(r.getLong(3) > 0, s"stratum sampled to zero: $r")
    }
    // hash sampling is a pure function of doc_id — a rerun is bit-identical
    val b = CorpusOps.stratifiedSample(spark, Sf0001).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("bpe_apply: applies the round-1 winner; merge counts bound by its support") {
    import org.apache.spark.sql.functions._
    val rule = CorpusOps.bpeApply(spark, Sf0001).collect().map(_.getString(0)).distinct
    assert(rule.length === 1, "one constant winner rule")
    val top1 = CorpusOps.bpeMerges(spark, Sf0001, 1).collect().head
    assert(rule.head === top1.getString(0),
      "applied rule must be bpe_merges' top-1 candidate")
    // greedy non-overlapping application merges at least one pair and never
    // more than the (overlap-counting) round-1 support
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val (c1, c2) = (rule.head(0).toString, rule.head(1).toString)
    val merges = words.map { case (w, cnt) =>
      // scalar greedy left-to-right count of non-overlapping occurrences
      var i = 0; var m = 0L
      while (i < w.length - 1) {
        if (w.substring(i, i + 2) == rule.head) { m += 1; i += 2 } else i += 1
      }
      m * cnt
    }.sum
    assert(merges > 0, s"winner rule $rule never applied")
    assert(merges <= top1.getLong(1), "greedy merges exceed round-1 support")
    // the round-2 candidate list must contain a pair built from the merged
    // symbol (the whole point of iterating)
    val pairs = CorpusOps.bpeApply(spark, Sf0001, 1000).collect().map(_.getString(1))
    assert(pairs.exists(p => p.split(" ").contains(rule.head)),
      s"no round-2 pair uses the merged symbol ${rule.head}")
  }
}
