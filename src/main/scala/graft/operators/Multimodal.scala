package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-shaped decode via `mapPartitions`.
  *
  * The image decode is REAL: [[PpmDecoder]] parses binary PPM (P6) —
  * magic, comment-tolerant whitespace-delimited header, then raw
  * interleaved RGB bytes — in pure byte arithmetic (PPM needs no codec
  * library; spec: netpbm P6). The fixture payloads are deterministic
  * synthetic PPMs spliced from `doc_id` (the `pii_scrub` injection
  * pattern) with the document text as TRAILING bytes, so a correct
  * decoder must size the raster from the parsed header, not the payload
  * length. Everything Spark-side — schema, binary columns, struct/map
  * shaping, partition-wise batch decode — is the shape a codec-backed
  * deployment would keep: at 100 TB the binary payloads stay columnar in
  * parquet (never materialized as strings) and decode runs once per
  * partition with amortized decoder setup.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: Map[String, String])
  case class ImageFeatures(doc_id: Long, ok: Boolean, width: Int, height: Int,
      maxval: Int, n_pixels: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Decoder contract a real deployment would back with further codecs.
    * `decodeBatch` is partition-scoped so implementations can amortize
    * codec/model initialization across a whole batch of payloads. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(records: Iterator[MediaRecord]): Iterator[ImageFeatures]
  }

  /** REAL binary PPM (P6) decoder: `P6`, then three whitespace-delimited
    * decimal header fields (width, height, maxval; `#` comments allowed,
    * per the netpbm spec), then a single whitespace byte, then
    * width·height interleaved RGB samples (1 byte each for maxval<256).
    * Pure byte arithmetic — malformed/truncated payloads yield an
    * `ok=false` row (zeros) instead of failing the partition, the
    * poison-pill discipline a 100 TB crawl decode needs. */
  object PpmDecoder extends MediaDecoder {
    def decodeBatch(records: Iterator[MediaRecord]): Iterator[ImageFeatures] =
      records.map { r => decode(r.doc_id, r.payload) }

    private[graft] def decode(docId: Long, b: Array[Byte]): ImageFeatures = {
      val bad = ImageFeatures(docId, ok = false, 0, 0, 0, 0, 0L, 0L, 0L)
      var pos = 2
      if (b.length < 2 || b(0) != 'P' || b(1) != '6') return bad

      def isWs(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
      // whitespace-delimited decimal token, skipping '#'-to-newline comments
      def nextInt(): Int = {
        var skipping = true
        while (skipping && pos < b.length) {
          if (isWs(b(pos))) pos += 1
          else if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
          else skipping = false
        }
        if (pos >= b.length || b(pos) < '0' || b(pos) > '9') return -1
        var v = 0
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
          v = v * 10 + (b(pos) - '0'); pos += 1
        }
        v
      }

      val w = nextInt(); val h = nextInt(); val mx = nextInt()
      // exactly ONE whitespace byte separates maxval from the raster
      if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 ||
          pos >= b.length || !isWs(b(pos))) return bad
      pos += 1
      val n = w * h
      if (b.length - pos < 3 * n) return bad
      var (sr, sg, sb) = (0L, 0L, 0L)
      var k = 0
      while (k < n) {
        sr += b(pos + 3 * k) & 0xff
        sg += b(pos + 3 * k + 1) & 0xff
        sb += b(pos + 3 * k + 2) & 0xff
        k += 1
      }
      ImageFeatures(docId, ok = true, w, h, mx, n, sr, sg, sb)
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

  /** Synthetic PPM payloads spliced from `doc_id` (the `pii_scrub`
    * injection pattern — the corpus carries no real images, the splice
    * makes the decode verifiable): a P6 header with
    * width = 2 + doc_id%3, height = 1 + doc_id%2, maxval 255, raster
    * bytes `32 + (doc_id·31 + j·7) mod 64` (printable ASCII, so the
    * DuckDB oracle can replay the construction and the decode in string
    * arithmetic), then the document TEXT as trailing bytes the decoder
    * must ignore. Built as pure column expressions; cast to binary at
    * the end — the payload column IS opaque bytes to everything
    * downstream. */
  def ppmRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val w = lit(2) + ($"doc_id" % 3).cast(IntegerType)
    val h = lit(1) + ($"doc_id" % 2).cast(IntegerType)
    val px = concat_ws("", transform(
      sequence(lit(0), lit(3) * w * h - 1),
      j => chr(lit(32) + pmod($"doc_id" * 31 + j.cast(LongType) * 7, lit(64)))))
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        concat(lit("P6\n"), w.cast(StringType), lit(" "), h.cast(StringType),
          lit("\n255\n"), px, $"text").cast(BinaryType).as("payload"),
        map(lit("lang"), $"lang", lit("source"), $"source").as("meta"))
      .as[MediaRecord]
  }

  /** Partition-wise batch decode through the decoder — the mapPartitions
    * seam where a codec batch runs (PPM here; JPEG/PNG/audio decoders
    * drop into the same contract). */
  def decodeFeatures(records: Dataset[MediaRecord],
      decoder: MediaDecoder = PpmDecoder): Dataset[ImageFeatures] = {
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

  /** Oracled decode query: synthetic PPM payloads through the REAL
    * [[PpmDecoder]] in the typed mapPartitions seam; the DuckDB twin
    * replays construction + header-parse + channel sums in string
    * arithmetic over the identical bytes. Channel SUMS (exact bigints)
    * rather than float means keep the compare bit-exact. */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(ppmRecords(spark, dir)).toDF().orderBy($"doc_id")
  }

  case class MediaSig(doc_id: Long, ok: Boolean, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, payload_md5: String)

  /** NS: perceptual media dedup — byte-DISTINCT payloads collapsed by
    * their decoded content signature (width, height, per-channel sums:
    * the stats-signature stand-in for a perceptual hash; a pHash/dHash
    * drops into the same shape). Every fixture payload is byte-unique
    * (trailing text differs), yet the decoded rasters repeat with the
    * doc_id splice period, so the dedup is REAL work the exact-dup md5
    * listing cannot do. One partition pass decodes AND hashes each
    * payload (decode amortized like [[decodeFeatures]], md5 for the
    * distinct-payload audit), then ONE bounded hash aggregate: map-side
    * combine collapses each partition to ≤|signatures| rows before the
    * shuffle, so the exchange is signature-bounded at any corpus size —
    * the `doc_dedup_exact` discipline applied to decoded content. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sigs = ppmRecords(spark, dir).mapPartitions { it =>
      it.map { r =>
        val f = PpmDecoder.decode(r.doc_id, r.payload)
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaSig(f.doc_id, f.ok, f.width, f.height,
          f.sum_r, f.sum_g, f.sum_b, hex)
      }
    }.toDF()
    sigs.where($"ok")
      .groupBy($"width", $"height", $"sum_r", $"sum_g", $"sum_b")
      .agg(min($"doc_id").as("keeper_doc_id"),
        count(lit(1)).as("n_copies"),
        countDistinct($"payload_md5").as("n_distinct_payloads"))
      .orderBy($"keeper_doc_id")
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
