package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic synthetic-table generator for EXTRA scale tiers (the
  * sf1 "prove it at 10×" tier the round-8 verdict asked for).
  *
  * Mirrors the driver tables' schemas and measured distributions
  * (TESTDATA.md / FIXTURES.md §2; distributions profiled from
  * /root/testdata/sf0.1 — row-count ratios, value ranges, category
  * frequencies, lines-per-order shape, doc vocabulary and dup planting,
  * unit-norm label-clustered embeddings). The driver's own dirs are
  * read-only and SACRED — this writes new dirs only, for tiers the
  * driver doesn't ship.
  *
  * Generation is the 100 TB shape by construction: `spark.range` +
  * pure HASH-derived column expressions (xxhash64 streams, no
  * driver-side RNG state, no collect), so any slice of any table can be
  * (re)generated on any executor independently — the same property a
  * petabyte backfill needs. The single-file-per-table output (driver
  * layout: `<dir>/<name>.parquet` must be a FILE for the DuckDB oracle's
  * view registration) is the one local-only concession; a cluster run
  * would drop the coalesce and keep one file per task.
  *
  * Usage: runMain graft.DataGen <outDir> <sf>   (e.g. ... /x/sf1 1.0)
  */
object DataGen {

  /** Uniform [0,1) from a salted xxhash64 of `cols` — 53 mantissa bits. */
  private def u(salt: String, cols: Column*): Column =
    shiftrightunsigned(xxhash64((lit(salt) +: cols): _*), 11)
      .cast(DoubleType) / lit(9007199254740992.0) // 2^53

  /** Uniform integer in [0, n) — long column. */
  private def ui(n: Long, salt: String, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(n))

  private def pick(choices: Seq[String], salt: String, cols: Column*): Column =
    element_at(lit(choices.toArray), (ui(choices.size, salt, cols: _*) + 1)
      .cast(IntegerType))

  private def money(lo: Double, hi: Double, salt: String, cols: Column*): Column =
    round(lit(lo) + u(salt, cols: _*) * lit(hi - lo), 2)

  /** Truncated-Poisson(4) on 1..17 (the measured lines-per-order shape)
    * via inverse CDF over a literal table — one uniform per order. */
  private def linesPerOrder(uCol: Column): Column = {
    val lambda = 4.0
    val p0 = math.exp(-lambda)
    val probs = (1 to 17).map { k =>
      (1 to k).foldLeft(p0)((acc, i) => acc * lambda / i)
    }
    val total = probs.sum
    val cdf = probs.scanLeft(0.0)(_ + _).tail.map(_ / total)
    cdf.zipWithIndex.init.reverse.foldLeft(lit(17)) {
      case (els, (c, i)) => when(uCol < c, lit(i + 1)).otherwise(els)
    }
  }

  private val Day = 86400000000L // µs

  /** µs timestamp column rendered like the driver's physical layout:
    * naive TIMESTAMP_NTZ wall-clock == UTC instant (session tz is UTC). */
  private def ntz(us: Column): Column =
    timestamp_micros(us.cast(LongType)).cast(TimestampNTZType)

  // ---- tables --------------------------------------------------------

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame =
    spark.range(25).select(
      $id.cast(IntegerType).as("n_nationkey"),
      concat(lit("NATION_"), $id).as("n_name"),
      ($id % 5).cast(IntegerType).as("n_regionkey"))

  def customer(spark: SparkSession, sf: Double): DataFrame =
    spark.range(math.round(150000 * sf)).select(
      $id.as("c_custkey"),
      format_string("Customer#%09d", $id).as("c_name"),
      ui(25, "c_nat", $id).cast(IntegerType).as("c_nationkey"),
      money(-1000, 10000, "c_bal", $id).as("c_acctbal"),
      pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"), "c_seg", $id).as("c_mktsegment"))

  def supplier(spark: SparkSession, sf: Double): DataFrame =
    spark.range(math.round(10000 * sf)).select(
      $id.as("s_suppkey"),
      format_string("Supplier#%09d", $id).as("s_name"),
      ui(25, "s_nat", $id).cast(IntegerType).as("s_nationkey"),
      money(-1000, 10000, "s_bal", $id).as("s_acctbal"))

  private val Adjs = Seq("blue", "cold", "hot", "large", "new", "old",
    "red", "small")
  private val Nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate",
    "ring", "rod", "widget")

  def part(spark: SparkSession, sf: Double): DataFrame =
    spark.range(math.round(200000 * sf)).select(
      $id.as("p_partkey"),
      concat(pick(Adjs, "p_adj", $id), lit(" "),
        pick(Nouns, "p_noun", $id)).as("p_name"),
      concat(lit("Brand#"), (ui(25, "p_brand", $id) + 1)).as("p_brand"),
      pick(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"),
        "p_type", $id).as("p_type"),
      (ui(50, "p_size", $id) + 1).cast(IntegerType).as("p_size"),
      round(lit(900.0) + ($id % 1000).cast(DoubleType) / 10.0, 1)
        .as("p_retailprice"))

  /** o_orderdate spans 1995-01-01 .. 2001-08-01 (2404 days). */
  def orders(spark: SparkSession, sf: Double): DataFrame = {
    val epoch95 = 788918400000000L // 1995-01-01 UTC µs
    spark.range(math.round(1500000 * sf)).select(
      $id.as("o_orderkey"),
      ui(math.round(150000 * sf), "o_cust", $id).as("o_custkey"),
      pick(Seq("O", "P", "F"), "o_stat", $id).as("o_orderstatus"),
      money(1000, 500000, "o_total", $id).as("o_totalprice"),
      ntz(lit(epoch95) + ui(2404, "o_date", $id) * lit(Day))
        .as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW"), "o_prio", $id).as("o_orderpriority"))
  }

  /** Fact derived FROM orders (ship dates trail their order's date by
    * 1..95 days; lines-per-order truncated-Poisson(4); l_linenumber
    * cycles 1..7 like the driver's). */
  def lineitem(spark: SparkSession, sf: Double): DataFrame = {
    val o = orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
      .withColumn("nlines", linesPerOrder(u("l_n", col("l_orderkey"))))
      .withColumn("j", explode(sequence(lit(1), col("nlines"))))
    val k = col("l_orderkey")
    o.select(
      k,
      ui(math.round(200000 * sf), "l_part", k, col("j")).as("l_partkey"),
      ui(math.round(10000 * sf), "l_supp", k, col("j")).as("l_suppkey"),
      ((col("j") - 1) % 7 + 1).cast(IntegerType).as("l_linenumber"),
      (ui(50, "l_qty", k, col("j")) + 1).cast(DoubleType).as("l_quantity"),
      money(900, 105000, "l_price", k, col("j")).as("l_extendedprice"),
      (ui(11, "l_disc", k, col("j")).cast(DoubleType) / 100.0).as("l_discount"),
      (ui(9, "l_tax", k, col("j")).cast(DoubleType) / 100.0).as("l_tax"),
      pick(Seq("A", "N", "R"), "l_rf", k, col("j")).as("l_returnflag"),
      pick(Seq("O", "F"), "l_ls", k, col("j")).as("l_linestatus"),
      ntz(unix_micros(col("o_orderdate").cast(TimestampType)) +
        (ui(95, "l_ship", k, col("j")) + 1) * lit(Day)).as("l_shipdate"))
  }

  /** 30 days from 2024-01-01, ts monotone in event_id (driver property:
    * zero inversions), exponential-ish value (mean ~50, max ~575). */
  def events(spark: SparkSession, sf: Double): DataFrame = {
    val n = math.round(1000000 * sf)
    val epoch24 = 1704067200000000L // 2024-01-01 UTC µs
    val span = 30L * Day
    val gap = span / n
    spark.range(n).select(
      $id.as("event_id"),
      ntz(lit(epoch24) + $id * lit(gap) +
        (u("e_jit", $id) * lit(gap * 0.9)).cast(LongType)).as("ts"),
      ui(math.round(15000 * sf), "e_user", $id).as("user_id"),
      pick(Seq("click", "error", "purchase", "signup", "view"),
        "e_type", $id).as("event_type"),
      round(-lit(50.0) * log(lit(1.0) - u("e_val", $id)), 2).as("value"),
      concat(lit("{\"k\": "), ui(100, "e_k", $id), lit("}")).as("props"))
  }

  private val Vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  /** Synthetic prose over the 30-word vocabulary, 10..100 words/doc;
    * exact-dup planting like the driver's: in every 500-doc block,
    * doc 499 copies doc 249's text and both end in " dup". Text is a
    * pure function of `content_id`, so the copy is byte-identical. */
  def documents(spark: SparkSession, sf: Double): DataFrame = {
    val contentId = when($id % 500 === 499, $id - 250).otherwise($id)
    val nWords = (ui(91, "d_n", contentId) + 10).cast(IntegerType)
    val words = transform(sequence(lit(0), nWords - 1),
      j => element_at(lit(Vocab.toArray),
        (pmod(xxhash64(lit("d_w"), contentId, j), lit(Vocab.size)) + 1)
          .cast(IntegerType)))
    val text = concat(array_join(words, " "),
      when(contentId % 500 === 249, lit(" dup")).otherwise(lit("")))
    val langU = u("d_lang", $id)
    spark.range(math.round(50000 * sf)).select(
      $id.as("doc_id"),
      text.as("text"),
      when(langU < 0.41, "en").when(langU < 0.5575, "zh")
        .when(langU < 0.705, "es").when(langU < 0.8525, "fr")
        .otherwise("de").as("lang"),
      concat(lit("src"), $id % 20).as("source"))
      .withColumn("n_chars", length(col("text")).cast(LongType))
  }

  /** Unit-norm 64-dim float vectors clustered around 10 label centroids
    * (the driver's shape: |v| = 1, labels ≈ geometric clusters so
    * purity/ANN metrics are meaningful). Centroids are a plan-time
    * literal (splitmix-derived), noise is per-(vector, dim) hash. */
  def embeddings(spark: SparkSession, sf: Double): DataFrame = {
    val dims = 64
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    val flat = Array.tabulate(10 * dims) { i =>
      (splitmix(i.toLong).toDouble / Long.MaxValue) // [-1,1)
    }
    val label = ui(10, "v_lab", $id)
    val raw = transform(sequence(lit(0), lit(dims - 1)), d =>
      element_at(lit(flat), (label * dims + d + 1).cast(IntegerType)) +
        (u("v_noise", $id, d) * 2.0 - 1.0) * 1.2)
    val nrm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    spark.range(math.round(20000 * sf)).select(
      $id.as("vec_id"),
      transform(raw, x => (x / nrm).cast(FloatType)).as("embedding"),
      label.cast(IntegerType).as("label"))
  }

  // ---- writer --------------------------------------------------------

  private def $id: Column = col("id")

  /** Driver layout: one parquet FILE per table at <dir>/<name>.parquet. */
  private def writeOne(df: DataFrame, outDir: Path, name: String): Unit = {
    val tmp = outDir.resolve(s".tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, outDir.resolve(s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.list(tmp).forEach(p => Files.delete(p))
    Files.delete(tmp)
    println(s"[datagen] wrote $name")
  }

  def main(args: Array[String]): Unit = {
    val out = Paths.get(args(0))
    val sf = args(1).toDouble
    Files.createDirectories(out)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeOne(region(spark), out, "region")
    writeOne(nation(spark), out, "nation")
    writeOne(customer(spark, sf), out, "customer")
    writeOne(supplier(spark, sf), out, "supplier")
    writeOne(part(spark, sf), out, "part")
    writeOne(orders(spark, sf), out, "orders")
    writeOne(lineitem(spark, sf), out, "lineitem")
    writeOne(events(spark, sf), out, "events")
    writeOne(documents(spark, sf), out, "documents")
    writeOne(embeddings(spark, sf), out, "embeddings")
    spark.stop()
  }
}
