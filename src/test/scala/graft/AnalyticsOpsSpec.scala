package graft

import graft.operators.{Relational, ReferenceOps, TextAnalysis}

/** Invariant coverage for the round-9 analytics additions: KMV set
  * algebra, the daily-revenue ACF, the Markov transition matrix, the
  * Gopher rule gates, and the JSONL/CSV format roundtrip. Each test pins
  * a structural property the DuckDB hash-compare alone can't see (the
  * compare proves engine agreement; these prove the MATH is the claimed
  * math).
  */
class AnalyticsOpsSpec extends SparkSpecBase {

  private val Sf001 = "/root/testdata/sf0.01"

  test("kmv_set_ops: estimator sanity — jaccard in [0,1], intersection " +
      "bounded by union, union estimate lands near the exact union") {
    val rows = Relational.kmvSetOps(spark, Sf001).collect()
    assert(rows.length == 10, "5 event types -> C(5,2) = 10 pairs")
    rows.foreach { r =>
      val (exactU, exactI) = (r.getLong(2), r.getLong(3))
      val (unionEst, jacc, interEst) =
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(jacc >= 0.0 && jacc <= 1.0, s"jaccard $jacc out of range")
      assert(interEst <= unionEst + 1e-9, "est intersection exceeds est union")
      assert(exactI <= exactU, "exact intersection exceeds exact union")
      // k=64 KMV: std err ~ 1/sqrt(k-2) ~ 13%; 40% is a safe determinism-
      // friendly band (the estimate is exact md5 arithmetic, not random —
      // a band failure means the estimator itself is wrong)
      assert(math.abs(unionEst - exactU) <= 0.40 * exactU,
        s"union est $unionEst vs exact $exactU drifted beyond 40%")
      assert(math.abs(interEst - exactI) <= 0.40 * exactU,
        s"inter est $interEst vs exact $exactI drifted beyond 40% of union")
    }
  }

  test("kmv_set_ops: exact intersection recounted from raw distinct sets") {
    import spark.implicits._
    val byType = Tables.events(spark, Sf001)
      .select($"event_type", $"user_id").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = Relational.kmvSetOps(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    for ((ta, sa) <- byType; (tb, sb) <- byType if ta < tb)
      assert(got((ta, tb)) == (sa & sb).size.toLong,
        s"exact_inter($ta,$tb) mismatch")
  }

  test("autocorr_daily: 7 lags, acf bounded by 1 in magnitude, lag-0 " +
      "identity holds on the recomputed series") {
    val rows = Relational.autocorrDaily(spark, Sf001).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 7))
    val n = rows.head.getLong(1) + 1 // n_pairs = n - lag at lag 1
    rows.foreach { r =>
      assert(r.getLong(1) == n - r.getInt(0), "n_pairs != n - lag")
      // |acf| <= 1 by Cauchy-Schwarz on the truncated overlap only when
      // the series is long; allow the exact bound with tiny slack
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9,
        s"acf(${r.getInt(0)}) = ${r.getDouble(2)} breaks the C-S bound")
    }
  }

  test("autocorr_daily: scalar recomputation agrees bit-for-bit") {
    import spark.implicits._
    val daily = Tables.orders(spark, Sf001)
      .select(
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"),
        org.apache.spark.sql.functions
          .floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"))
      .groupBy($"day")
      .agg(org.apache.spark.sql.functions.expr("sum(cents) div 100").as("x"))
      .orderBy($"day").collect().map(_.getLong(1))
    val nD = daily.length
    val mu = daily.sum / nD // integer floor mean, exactly as the operator
    val d = daily.map(x => BigInt(x - mu))
    val den = d.map(v => v * v).sum
    val got = Relational.autocorrDaily(spark, Sf001).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    for (lag <- 1 to 7) {
      val num = (0 until nD - lag).map(t => d(t) * d(t + lag)).sum
      val want =
        if (den == 0) 0.0 else num.toDouble / den.toDouble
      assert(got(lag) == want, s"acf($lag): ${got(lag)} != $want")
    }
  }

  test("markov_transitions: rows are a full conditional matrix — " +
      "per-from probabilities sum to 1, counts recount from sequences") {
    val rows = Relational.markovTransitions(spark, Sf001).collect()
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(4)).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"$from probs sum to $pSum")
      val nFrom = rs.head.getLong(3)
      assert(rs.map(_.getLong(2)).sum == nFrom, s"$from n != n_from")
    }
    // total transitions = total events - distinct users (each user's
    // sequence contributes len-1 transitions)
    import spark.implicits._
    val ev = Tables.events(spark, Sf001)
    val total = ev.count() - ev.select($"user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("gopher_rules: pass is exactly the conjunction and the gates " +
      "recount on a hand-built doc") {
    val rows = TextAnalysis.gopherRules(spark, Sf001).collect()
    rows.foreach { r =>
      val gates = Seq(5, 6, 7, 8).map(r.getInt)
      assert(gates.forall(g => g == 0 || g == 1))
      assert(r.getInt(9) == (if (gates.forall(_ == 1)) 1 else 0),
        s"doc ${r.getLong(0)}: pass != AND(gates)")
    }
    // mean_word_len recounted from the raw text (length minus the
    // single-space separators over the space-split token count) — an
    // off-by-one in the separator subtraction or a tokenizer drift would
    // break exact equality here
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    Tables.documents(spark, Sf001).select("doc_id", "text")
      .orderBy("doc_id").limit(25).collect().foreach { d =>
        val r = byId(d.getLong(0))
        val nToks = d.getString(1).split(" ", -1).length
        val nLetters = d.getString(1).length - (nToks - 1)
        assert(r.getInt(1) == nToks, s"doc ${d.getLong(0)}: n_tokens")
        assert(r.getDouble(4) == nLetters.toDouble / nToks,
          s"doc ${d.getLong(0)}: mean_word_len != n_letters/n_tokens")
      }
    // both outcomes occur at sf0.01 — the gate thresholds bite
    assert(rows.exists(_.getInt(9) == 1) && rows.exists(_.getInt(9) == 0),
      "thresholds never fire (all pass or all fail) — gates are vacuous")
  }

  test("bracket_revenue: brackets are brand-disjoint and the bracket " +
      "totals recount from a scalar pass over the joined rows") {
    import spark.implicits._
    val got = Relational.bracketRevenue(spark, Sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = Tables.lineitem(spark, Sf001)
      .join(Tables.part(spark, Sf001),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"p_size", $"l_quantity",
        $"l_extendedprice", $"l_discount").collect()
    def bracket(brand: String, size: Long, qty: Double): Option[String] =
      if (Set("Brand#1", "Brand#2", "Brand#3")(brand) && size <= 10 && qty <= 15)
        Some("small")
      else if (Set("Brand#11", "Brand#12", "Brand#13")(brand) &&
        size >= 11 && size <= 30 && qty >= 10 && qty <= 30) Some("medium")
      else if (Set("Brand#21", "Brand#22", "Brand#23")(brand) &&
        size >= 25 && size <= 50 && qty >= 25 && qty <= 50) Some("large")
      else None
    val want = rows.flatMap { r =>
      bracket(r.getString(0), r.getAs[Number](1).longValue, r.getDouble(2)).map { b =>
        val rev = (BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          * (BigDecimal(1) - BigDecimal(r.getDouble(4))
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
        b -> rev
      }
    }.groupBy(_._1).view
      .mapValues(vs => (vs.length.toLong, vs.map(_._2).sum.toDouble)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (b, (n, rev)) =>
      assert(n == want(b)._1, s"$b count")
      assert(rev == want(b)._2, s"$b revenue ${rev} != ${want(b)._2}")
    }
  }

  test("cohort_ltv: cum_revenue telescopes, first age is 0 per cohort, " +
      "active counts bounded by cohort size") {
    import spark.implicits._
    val rows = Relational.cohortLtv(spark, Sf001).collect()
    val byCohort = rows.groupBy(_.getInt(0))
    val cohortSizes = Tables.orders(spark, Sf001)
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.year($"o_orderdate")).as("cy"))
      .groupBy($"cy").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    byCohort.foreach { case (cy, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getInt(1) == 0, s"cohort $cy: first age != 0")
      var cum = 0.0
      sorted.foreach { r =>
        cum += r.getDouble(3)
        assert(math.abs(r.getDouble(4) - cum) < 1e-6,
          s"cohort $cy age ${r.getInt(1)}: cum_revenue does not telescope")
        assert(r.getLong(2) <= cohortSizes(cy),
          s"cohort $cy: active exceeds cohort size")
      }
      // age 0 actives == cohort size (every member orders in its first year)
      assert(sorted.head.getLong(2) == cohortSizes(cy))
    }
  }

  test("csv_malformed_audit: PERMISSIVE quarantine counts equal the " +
      "injected mod-7 corruption exactly and partition the row count") {
    import spark.implicits._
    val rows = ReferenceOps.csvMalformedAudit(spark, Sf001).collect()
    val want = Tables.events(spark, Sf001)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.sum(
        ($"event_id" % 7 === 0).cast("long")).as("bad"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: good + quarantined != rows")
      assert(r.getLong(3) == want(r.getString(0)),
        s"${r.getString(0)}: quarantine count drifted from the mod-7 rule")
    }
    assert(rows.map(_.getLong(3)).sum > 0, "no corruption injected — vacuous")
  }

  test("format_roundtrip: JSONL and CSV readers reproduce the parquet " +
      "profile exactly at sf0.001 and sf0.01") {
    for (sf <- Seq(Sf0001, Sf001)) {
      val rows = ReferenceOps.formatRoundtrip(spark, sf).collect()
      assert(rows.length == 5, s"$sf: expected 5 event types")
      rows.foreach { r =>
        assert(r.getBoolean(3), s"$sf/${r.getString(0)}: json mismatch")
        assert(r.getBoolean(4), s"$sf/${r.getString(0)}: csv mismatch")
      }
    }
  }
}
