package graft

import org.apache.spark.sql.SparkSession

/** Bench harness (driver contract): run every declared query on
  * SPARK_GRAFT_SF_DIR, print one JSON line with per-query seconds.
  *
  * Measurement choices:
  *  - results are materialized through the `noop` sink, not `count()` —
  *    count() lets Catalyst drop sorts and projections, under-measuring
  *    the real query;
  *  - one small warmup action first so JVM/session init and first-codegen
  *    cost don't land on whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Every unpartitioned window in the suite is ≤k rows BY CONSTRUCTION
    // (rank stamps on top-k lists after a TakeOrdered/limit), so
    // WindowExec's "No Partition Defined" warning is pure noise here —
    // silence that one logger so real warnings stay visible in the log.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // Warmup: exercise the machinery every timed query relies on — parquet
    // scan, exchange+sort, hash agg, window, HOF/codegen — on the tiny
    // sf0.001 data, so first-JIT and scan-init cost doesn't land on
    // whichever query the Map happens to order first.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // Warm on the smallest SF sibling of sfDir (overridable); fall back to
    // sfDir itself rather than silently skipping — an unwarmed first query
    // would absorb all first-JIT/scan-init cost.
    val warmDir = {
      val sibling = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
        new java.io.File(sfDir).getParent + "/sf0.001")
      if (new java.io.File(sibling).isDirectory) sibling else sfDir
    }
    Seq("sales_totals", "ranking_window", "multi_join_agg", "similarity_search")
      .foreach { q =>
        try SparkEntry.queries(q)(spark, warmDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $q skipped: ${e.getMessage}")
        }
      }
    // Two full passes, per-query minimum: transient host noise (CPU steal,
    // page-cache misses) sporadically inflates single runs 5-15x; the min
    // of two spaced runs is a far better estimate of the query's true cost
    // than any single sample.
    // Dev loop: SPARK_GRAFT_ONLY=q1,q2 restricts the run to named queries
    // (unset — the driver's case — runs everything).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    def onePass(): Map[String, Double] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $dt%.2fs")
      name -> dt
    }
    // Calibration probes — fixed workloads whose cost depends ONLY on the
    // host's effective compute/scan rate, never on engine code changes:
    // cross-round comparison divides per-query ratios by the calibration
    // ratio to cancel the documented ±40% host-throttle band (see
    // tools/benchdiff.py). Run once before each pass (min-of-2, same
    // sampling rule as the queries) so the probe sees the same throttle
    // window the measurements do.
    def calibrate(): (Double, Double) = {
      val t0 = System.nanoTime()
      spark.range(400000000L).selectExpr("sum(id * (id % 7))").collect()
      val cpu = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_quantity)", "count(*)").collect()
      val scan = (System.nanoTime() - t1) / 1e9
      System.err.println(f"[bench] calibration cpu=$cpu%.3fs scan=$scan%.3fs")
      (cpu, scan)
    }
    val startNs = System.nanoTime()
    val c1 = calibrate()
    val p1 = onePass()
    // between passes: prompt the ContextCleaner to drop checkpoint blocks
    // the finished queries no longer reference, so pass 2 isn't measured
    // under pass 1's accumulated block-manager debris
    System.gc()
    // Deadline guard: the driver kills this process at a fixed wall-clock
    // budget and a killed run prints NOTHING (round 3: rc=124, no machine
    // line). If pass 1 already ate most of the budget, publish pass-1
    // numbers instead of dying half-way through pass 2.
    val deadlineSec = sys.env.getOrElse("SPARK_GRAFT_DEADLINE", "1500").toInt
    val p1Sec = (System.nanoTime() - startNs) / 1e9
    val (results, calib) = if (p1Sec * 2.2 > deadlineSec) {
      System.err.println(f"[bench] pass 1 took $p1Sec%.0fs; skipping pass 2 to fit the ${deadlineSec}s deadline")
      (p1, c1)
    } else {
      val c2 = calibrate()
      val p2 = onePass()
      (p1.map { case (name, s) => name -> math.min(s, p2(name)) },
        (math.min(c1._1, c2._1), math.min(c1._2, c2._2)))
    }
    val (calibCpu, calibScan) = calib
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // minimal JSON string escaping: every interpolated key/path goes
    // through this, so a quote/backslash/control char in a query name or
    // sfDir can never yield an invalid machine line
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def ent(k: String, v: Double) = "\"" + jesc(k) + "\":" + f"$v%.3f"
    // Full per-query map on its own prefixed line (humans / logs only — the
    // prefix keeps it from being mistaken for the machine line below).
    val bySlowest = results.toSeq.sortBy(-_._2)
    val fullMap = bySlowest.map((ent _).tupled).mkString("{", ",", "}")
    System.err.println("bench-full: " + fullMap)
    // ... and as a JSON artifact (the stdout machine line below truncates
    // to the driver's 2000-char capture; cross-round regression diffs need
    // the WHOLE registry, so persist it where the repo keeps round state)
    // a SPARK_GRAFT_ONLY dev-loop slice must never clobber the committed
    // full-registry artifact (it feeds cross-round regression diffs and
    // scalediff) — write it only for full runs, or when a path is forced
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      if (only.isDefined) "/tmp/BENCH_ONLY.json" else "BENCH_FULL.json")
    try {
      // preserve the scalediff-owned scaling_sf1 section across rewrites:
      // a full bench rerun (e.g. the gate's regression phase) must not
      // silently drop the published sf0.1→sf1 scaling baseline
      // extraction gets its OWN try: a malformed/hand-edited previous
      // artifact must never block writing the fresh results below — losing
      // a scaling section is recoverable (rerun scalediff), losing the
      // run's bench numbers is not
      val prevScaling: Option[String] = try {
        val p = java.nio.file.Paths.get(fullPath)
        if (java.nio.file.Files.exists(p)) {
          val prev = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          // any scalediff-owned scaling_sf* sections sit LAST among the
          // top-level keys (scalediff appends), so slice from the first
          // such key to the closing brace
          val i = prev.indexOf("\"scaling_sf")
          if (i >= 0) Some(prev.substring(i, prev.lastIndexOf('}')))
          else None
        } else None
      } catch { case e: Throwable =>
        System.err.println(s"[bench] previous $fullPath unparsable, dropping its scaling section: ${e.getMessage}")
        None
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        (s"""{"sf":"${jesc(sfDir)}","total":${f"$total%.3f"},""" +
          s""""calibration":{${ent("cpu_sec", calibCpu)},${ent("scan_sec", calibScan)}},""" +
          s""""queries_n":${results.size},"queries":$fullMap""" +
          prevScaling.map("," + _).getOrElse("") + "}\n")
          .getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}")
    }
    // Machine-readable line LAST, kept under ~1500 chars: the driver
    // captures only the final 2000 chars of output, so a map of every query
    // at full double precision (observed ~2.6 KB) never fits and the driver
    // records parsed=null. Emit the slowest queries greedily until the
    // budget is hit; "queries_n" records the true total so a truncated map
    // is explicit, not silent.
    val budget = 1400
    val kept = scala.collection.mutable.ArrayBuffer[String]()
    var len = 0
    bySlowest.foreach { case (k, v) =>
      val e = ent(k, v)
      if (len + e.length + 1 <= budget) { kept += e; len += e.length + 1 }
    }
    val qs = kept.mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_n":${results.size},"calib_cpu":$calibCpu%.3f,"calib_scan":$calibScan%.3f,"sf":"${jesc(sfDir)}"}""")
    spark.stop()
  }
}
