package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing as the 100 TB scale path (bucket join instead of all-pairs).
  * Dot products are sequential left-folds over the array via the
  * `aggregate` higher-order function — deterministic order, double
  * accumulation, no UDF (stays codegen-friendly).
  */
object Similarity {

  /** Σ aᵢ·bᵢ as an ordered left fold in double precision — the codegen'd
    * [[graft.functions.VectorDot]]; bit-identical to the
    * `aggregate(zip_with(...))` HOF form it replaced, ~10× faster. */
  def dot(a: Column, b: Column): Column = graft.functions.vector_dot(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Exact brute-force cosine top-10 against the probe vector (vec_id 0).
    * Linear scan + TakeOrderedAndProject: shardable over any number of
    * executors, k-row result merge — the correct exact-kNN plan at scale.
    */
  def similaritySearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("p"))
    emb.crossJoin(broadcast(probe))
      .select($"vec_id", $"label", cosine($"embedding", $"p").as("score"))
      .where($"vec_id" =!= 0)
      .orderBy($"score".desc, $"vec_id")
      .limit(10)
  }

  /** Signed random-hyperplane bit for plane j: sign of Σ_d w(j,d)·v_d with
    * integer weights w(j,d) = md5_28("hp:j:d") mod 2001 − 1000 — a
    * deterministic pseudo-random hyperplane reproducible in any engine.
    * The weights are constants, so they're materialized at PLAN time (one
    * md5 per (j,d) total) and embedded as a literal array — the per-row
    * work is a single codegen'd dot product, not 64 md5 calls. */
  private def planeWeights(j: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      (graft.functions.Md5Long.hash(s"hp:$j:$d".getBytes("UTF-8"), 7) % 2001 - 1000).toDouble
    }

  private def planeBit(v: Column, j: Int, dims: Int): Column =
    when(dot(v, lit(planeWeights(j, dims))) > 0, 1L).otherwise(0L)

  /** LSH bucket id (8 hyperplanes → 256 buckets) per vector. */
  def lshBucket(v: Column, planes: Int = 8, dims: Int = 64): Column =
    (0 until planes).map(j => planeBit(v, j, dims) * (1L << j)).reduce(_ + _)

  /** ANN index statistics: vectors per LSH bucket. This is the partition
    * histogram one watches at 100 TB — skewed buckets mean a bad hyperplane
    * draw; re-seed by changing the "hp:" salt. */
  def annLshBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .withColumn("bucket", lshBucket($"embedding"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_vectors"),
        min($"vec_id").as("min_vec_id"), max($"vec_id").as("max_vec_id"))
      .orderBy($"bucket")
  }

  /** ANN query path: cosine top-5 against the probe, restricted to the
    * probe's own LSH bucket (4 planes → 16 buckets, recall/cost knob).
    * The bucket equi-join replaces the full scan of `similaritySearch`. */
  def annLshSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", lshBucket($"embedding", planes = 4))
    val probe = emb.filter($"vec_id" === 0)
      .select($"embedding".as("p"), $"bucket".as("pbucket"))
    emb.join(broadcast(probe), $"bucket" === $"pbucket")
      .where($"vec_id" =!= 0)
      .select($"vec_id", $"label", $"bucket", cosine($"embedding", $"p").as("score"))
      .orderBy($"score".desc, $"vec_id")
      .limit(5)
  }

  /** IVF (inverted-file) cell assignment: nearest of 16 seed centroids by
    * cosine, ties broken toward the lowest cell id. Centroids here are the
    * first 16 vectors by `vec_id` — deterministic and oracle-able; a
    * production deployment would k-means-train them offline and broadcast
    * the trained codebook exactly the same way (a 16..64k-row dim table).
    * Shape at 100 TB: one broadcast of the codebook, one linear scan, one
    * 16-way ranked choice per row — no shuffle until the cell groupBy.
    */
  private val IvfCells = 16

  /** Every vector scored against every centroid:
    * (vec_id, label, embedding, cell_id, score). 16 rows out per row in,
    * all map-side (broadcast codebook, no shuffle). */
  private def ivfScored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val cents = emb.filter($"vec_id" < IvfCells)
      .select($"vec_id".as("cell_id"), $"embedding".as("ce"))
    emb.crossJoin(broadcast(cents))
      .select($"vec_id", $"label", $"embedding", $"cell_id",
        cosine($"embedding", $"ce").as("score"))
  }

  /** Cell assignment = argmax-by-score (ties → lowest cell) via `max_by`
    * over a struct ordering — partial-aggregated, so the shuffle moves one
    * pre-reduced row per vector, not the 16× scored fan-out a
    * `row_number` window would shuffle. */
  private def ivfAssigned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ivfScored(spark, dir)
      .groupBy($"vec_id")
      .agg(max_by(
        struct($"label", $"embedding", $"cell_id", $"score"),
        struct($"score", (-$"cell_id").as("tie"))).as("w"))
      .select($"vec_id", $"w.label", $"w.embedding", $"w.cell_id", $"w.score")
  }

  /** IVF index statistics: vectors per cell + summed assignment cosine
    * (cell cohesion, decimal-summed for order-insensitive exactness) —
    * the histogram that tells you whether the codebook needs retraining
    * (empty/overfull cells). */
  def annIvfCells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ivfAssigned(spark, dir)
      .groupBy($"cell_id")
      .agg(count(lit(1)).as("n_vectors"),
        min($"vec_id").as("min_vec_id"), max($"vec_id").as("max_vec_id"),
        sum($"score".cast(DecimalType(27, 12))).cast(DoubleType).as("sum_cos"))
      .orderBy($"cell_id")
  }

  /** IVF query path: rank the probe (vec_id 0) against the codebook, take
    * its nprobe=2 nearest cells, scan ONLY vectors assigned to those cells,
    * cosine top-5. At 100 TB with a trained codebook this reads
    * nprobe/cells of the corpus instead of all of it; recall is tuned by
    * nprobe exactly as in FAISS-style IVF-Flat. */
  def annIvfSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"score".desc, $"cell_id")
    val probeCells = ivfScored(spark, dir).filter($"vec_id" === 0)
      .select($"cell_id", $"score")
      .withColumn("rnk", row_number().over(w))   // 16 rows total: trivial
      .filter($"rnk" <= 2)
      .select($"cell_id".as("pcell"))
    val probe = Tables.embeddings(spark, dir)
      .filter($"vec_id" === 0).select($"embedding".as("p"))
    ivfAssigned(spark, dir)
      .join(broadcast(probeCells), $"cell_id" === $"pcell")
      .crossJoin(broadcast(probe))
      .where($"vec_id" =!= 0)
      .select($"vec_id", $"label", $"cell_id", cosine($"embedding", $"p").as("score"))
      .orderBy($"score".desc, $"vec_id")
      .limit(5)
  }

  /** Embedding-cosine near-dup pairs inside LSH buckets (4 planes):
    * bucket-local pair forming + threshold — the linear-ish near-dup scan
    * a training pipeline runs; with this corpus (unit-norm random vectors,
    * max pairwise cos ≈ 0.4) it reports the tail above 0.30. */
  def embeddingNearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", lshBucket($"embedding", planes = 4))
      .select($"vec_id", $"bucket", $"embedding")
    emb.as("x").join(emb.as("y"), Seq("bucket"))
      .where(col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        cosine(col("x.embedding"), col("y.embedding")).as("score"))
      .where($"score" > 0.30)
      .orderBy($"vec_a", $"vec_b")
  }
}
