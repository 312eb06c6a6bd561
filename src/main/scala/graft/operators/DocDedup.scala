package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.TextAnalysis.{md5Long28, md5Long60, shingles, tokens}

/** Document deduplication family for LLM-data pipelines: exact hash dedup,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Everything is bucketed — no
  * O(N²) pair enumeration anywhere, so the same plans run at 100 TB:
  * candidate pairs only ever form inside an LSH band bucket
  * (shuffle on the band key, pairs within a bucket).
  */
object DocDedup {

  // MinHash: 16 permutations h_i(x) = ((2i+1)·x + 7919·i + 1) mod P over
  // the 28-bit md5 base hash; products stay < 2^34, far from int64 overflow
  // — the same arithmetic is replayable in any engine, which is how the
  // DuckDB oracle checks it.
  private val MinHashP = 268435399L // largest prime < 2^28
  private val NumHashes = 16
  private val BandSize = 4 // 4 bands of 4 → LSH candidate buckets

  /** Exact dedup by content hash: keeper = min doc_id per md5(text). */
  def docDedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text".cast(BinaryType)).as("text_md5"))
      .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy($"keeper_doc_id")
  }

  /** doc_id + 16-element MinHash signature over distinct word-3-gram
    * shingles, plus the 4 LSH band keys. */
  private def minhashSigs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = array((0 until NumHashes).map { i =>
      array_min(transform($"xs", v => (v * (2 * i + 1) + (7919 * i + 1)) % MinHashP))
    }: _*)
    val withSig = Tables.documents(spark, dir)
      .withColumn("grams", array_distinct(shingles(tokens($"text"), 3)))
      .withColumn("xs", transform($"grams", g => md5Long28(g)))
      .withColumn("sig", sig)
    (0 until NumHashes / BandSize).foldLeft(withSig) { case (df, k) =>
      df.withColumn(s"b$k", concat_ws(",",
        (0 until BandSize).map(j => element_at($"sig", k * BandSize + j + 1).cast(StringType)): _*))
    }
  }

  /** MinHash signatures + band keys per document (the dedup index one
    * would persist and incrementally join new batches against). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    minhashSigs(spark, dir)
      .select($"doc_id", $"b0", $"b1", $"b2", $"b3")
      .orderBy($"doc_id")
  }

  /** MinHash+LSH near-dup candidate pairs: docs sharing any band bucket,
    * scored by estimated Jaccard (fraction of equal signature slots).
    * The join key is (band index, band value) — bucket-local pairs only.
    */
  def minhashDedupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = minhashSigs(spark, dir).select($"doc_id", $"sig", $"b0", $"b1", $"b2", $"b3")
    val bands = sigs.select($"doc_id", $"sig",
      posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("k", "bv")))
    val pairs = bands.as("x")
      .join(bands.as("y"), col("x.k") === col("y.k") && col("x.bv") === col("y.bv"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (size(filter(zip_with(col("x.sig"), col("y.sig"), (u, v) => u === v),
          b => b)).cast(DoubleType) / NumHashes).as("est_jaccard"))
      .distinct()
    pairs.orderBy($"doc_a", $"doc_b")
  }

  // SimHash: 32-bit signature from md5-60 token hashes, frequency-weighted.
  private val SimHashBits = 32

  /** Per-document 32-bit SimHash + its four 8-bit LSH bands. Explode +
    * groupBy keeps partial aggregation map-side (one shuffle on doc_id). */
  def simhashDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", explode(tokens($"text")).as("t"))
      .withColumn("h", md5Long60($"t"))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sums = tok.groupBy($"doc_id").agg(bitSums.head, bitSums.tail: _*)
    val simhash = (0 until SimHashBits).map { b =>
      when(col(s"s$b") > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)
    sums
      .withColumn("simhash", simhash)
      .select($"doc_id", $"simhash",
        ($"simhash" % 256).as("band0"),
        (shiftright($"simhash", 8) % 256).as("band1"),
        (shiftright($"simhash", 16) % 256).as("band2"),
        (shiftright($"simhash", 24) % 256).as("band3"))
      .orderBy($"doc_id")
  }

  /** SimHash near-dup pairs: hamming(simhash) ≤ 3, candidates restricted to
    * docs sharing ≥1 of 4 8-bit bands (pigeonhole: hamming ≤ 3 guarantees
    * an equal band — the bucket join is lossless, not approximate). */
  def simhashNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = simhashDocs(spark, dir)
    val bands = docs.select($"doc_id", $"simhash",
      posexplode(array($"band0", $"band1", $"band2", $"band3")).as(Seq("k", "bv")))
    bands.as("x")
      .join(bands.as("y"), col("x.k") === col("y.k") && col("x.bv") === col("y.bv"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .where($"hamming" <= 3)
      .distinct()
      .orderBy($"doc_a", $"doc_b")
  }

  /** n-gram Jaccard similarity of every document against a probe document
    * (doc_id 0) — the linear, shardable formulation (the all-pairs variant
    * is exactly `minhashDedupPairs`' candidate set scored the same way). */
  def ngramJaccardProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g3 = Tables.documents(spark, dir)
      .withColumn("grams", array_distinct(shingles(tokens($"text"), 3)))
    val probe = g3.filter($"doc_id" === 0).select($"grams".as("pg"))
    g3.crossJoin(broadcast(probe))
      .withColumn("n_inter", size(filter($"grams", g => array_contains($"pg", g))))
      .withColumn("n_union", size($"grams") + size($"pg") - $"n_inter")
      .select(
        $"doc_id", size($"grams").as("n_grams"), $"n_inter", $"n_union",
        ($"n_inter".cast(DoubleType) / $"n_union").as("jaccard"))
      .orderBy($"doc_id")
  }
}
