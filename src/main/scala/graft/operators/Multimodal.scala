package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-shaped decode via `mapPartitions`.
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment) behind [[MediaDecoder]]; everything Spark-side — schema,
  * binary columns, struct/map shaping, partition-wise batch decode, the
  * operator's position in the plan — is real and tested. At 100 TB the
  * binary payloads stay columnar in parquet (never materialized as strings)
  * and decode runs once per partition with amortized codec setup.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: Map[String, String])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, head_hash: String, n_frames: Int)

  /** Decoder contract a real deployment would back with image/audio codecs.
    * `decodeBatch` is partition-scoped so implementations can amortize
    * codec/model initialization across a whole batch of payloads. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(records: Iterator[MediaRecord]): Iterator[MediaFeatures]
  }

  /** STUB decoder: deterministic fake features (payload length, md5-head
    * of the bytes, a fake frame count). A real one would go:
    * bytes → BufferedImage/av frames → resize/sample → feature vector. */
  object StubDecoder extends MediaDecoder {
    def decodeBatch(records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map { r =>
        val md = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
        MediaFeatures(
          doc_id = r.doc_id,
          n_bytes = r.payload.length,
          head_hash = md.take(8).map(b => f"$b%02x").mkString,
          n_frames = r.payload.length / 100 + 1)
      }
  }

  /** `documents` rows shaped as media records: text bytes standing in for
    * the opaque payload, (lang, source) as typed metadata. */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        $"text".cast(BinaryType).as("payload"),
        map(lit("lang"), $"lang", lit("source"), $"source").as("meta"))
      .as[MediaRecord]
  }

  /** Partition-wise batch decode through the (stub) decoder — the
    * mapPartitions seam where a Pandas-UDF/codec batch would run. */
  def decodeFeatures(records: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions(decoder.decodeBatch(_))
  }

  /** Oracle-checked multimodal shaping query: pack each document into
    * struct<payload:binary, meta:map>, then unpack — payload stats +
    * exploded metadata rows. Exercises struct/map/binary/explode. */
  def multimodalCols(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", struct(
        $"text".cast(BinaryType).as("payload"),
        map(lit("lang"), $"lang", lit("source"), $"source").as("meta")).as("packed"))
      .select(
        $"doc_id",
        length($"packed.payload").as("payload_len"),
        substring(md5($"packed.payload"), 1, 16).as("payload_head"),
        explode($"packed.meta").as(Seq("meta_key", "meta_value")))
      .orderBy($"doc_id", $"meta_key")
  }

  /** NS: CLIP-style caption/embedding pair curation — the LAION-recipe
    * gate over (text, image) training pairs: each document's caption joins
    * its aligned embedding (`embeddings.vec_id` = `documents.doc_id`, the
    * corpus convention `rrf_fusion` established), and a pair is kept when
    * the caption is long enough (≥5 ws-tokens) AND the embedding's
    * IVF-assignment cosine clears the alignment floor — the stand-in for
    * a CLIP image-text score in a sandbox with no model. The score gate
    * compares in 2^-20 fixed point, so the keep decision is
    * boundary-exact cross-engine. One equi-join on the id; the argmax
    * assignment is the same zero-shuffle literal-codebook expression the
    * ANN family uses. */
  def mediaTextPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assigned = Similarity.ivfAssigned(spark, dir,
        Similarity.codebook(spark, dir))
      .select($"vec_id", $"cell_id",
        floor($"score" * lit(1048576.0) + lit(0.5)).as("score_u20"))
    Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        size(split($"text", " ")).as("n_tokens"))
      .join(assigned, $"doc_id" === $"vec_id")
      .select($"doc_id", $"source", $"n_tokens", $"cell_id", $"score_u20",
        when($"n_tokens" >= 5 && $"score_u20" >= 104858L, 1).otherwise(0)
          .as("kept")) // 104858 ≈ 0.1 in 2^-20 units: the alignment floor
      .orderBy($"doc_id")
  }

  /** NS: WebDataset-style shard packing — assign each payload to a
    * ~budget-byte training shard, per source, in doc_id order (the
    * tar-shard planner a multimodal loader streams from; shard = unit of
    * sequential I/O and shuffle-free sampling at training time). Same
    * start-offset binning as `compaction_plan`, applied to payload bytes;
    * per-partition-dir windows keep the cumsum shardable. */
  def mediaShardPack(spark: SparkSession, dir: String,
      budget: Long = 4096L): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    Tables.documents(spark, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("off", sum($"n_chars").over(w) - $"n_chars")
      .withColumn("shard_id", expr(s"off div $budget"))
      .groupBy($"source", $"shard_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("shard_bytes"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"source", $"shard_id")
  }

  /** Rows-only-checked decode query via the mapPartitions stub pipeline
    * (not SQL-expressible — it exercises the typed Dataset seam). */
  def mediaDecodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(mediaRecords(spark, dir)).toDF().orderBy($"doc_id")
  }

  /** Frame sampling as REAL (non-stub) plumbing: the payload is windowed
    * into fixed-size frames and every stride-th frame is taken, stride
    * chosen so ~4 frames survive per document — the row-explosion shape
    * of video frame-sampling, payload-agnostic (only the in-frame decode
    * needs codecs, and it is not part of this query). Fan-out is bounded
    * (≤5 rows/doc) and map-side; fully DuckDB-oracled. */
  def mediaFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameLen = 100
    val frame = $"text".substr($"frame_idx" * frameLen + 1, lit(frameLen))
    Tables.documents(spark, dir)
      .select($"doc_id", $"text",
        floor((length($"text") + frameLen - 1) / frameLen).cast(IntegerType)
          .as("n_frames"))
      .withColumn("stride",
        greatest(lit(1), floor($"n_frames" / 4).cast(IntegerType)))
      .select($"doc_id", $"n_frames",
        explode(sequence(lit(0), $"n_frames" - 1, $"stride")).as("frame_idx"),
        $"text")
      .select($"doc_id", $"n_frames", $"frame_idx",
        length(frame).as("frame_len"),
        md5(frame.cast(BinaryType)).as("frame_md5"))
      .orderBy($"doc_id", $"frame_idx")
  }
}
