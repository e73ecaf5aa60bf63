package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed by per-partition batch functions (the
  * Scala analog of `mapInPandas` — one function invocation per batch of
  * rows, vectorizable by the decode library).
  *
  * The actual codec decode is STUBBED (no image/audio libraries ship in
  * this sandbox): [[FakeCodec]] is a deterministic stand-in that parses a
  * tiny synthetic header. The Spark-side contract — schema, binary
  * handling, batch shape, partitioning — is real and tested; swapping
  * [[FakeCodec.decode]] for a real decoder is a local change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, false),
    StructField("kind", StringType, false), // image | audio | video
    StructField("payload", BinaryType, false),
    StructField("meta", StructType(Seq(
      StructField("source_url", StringType, true),
      StructField("declared_format", StringType, true))), true)))

  /** Deterministic fake media codec. A real deployment replaces ONLY this
    * object (decode := libjpeg/ffmpeg/... call). Payload layout produced by
    * [[synthesizePayload]]: 2 bytes width, 2 bytes height, 1 byte channels,
    * then content bytes. */
  object FakeCodec {
    final case class Decoded(width: Int, height: Int, channels: Int, nBytes: Int)
    def decode(payload: Array[Byte]): Decoded = {
      // ??? <- real codec goes here; deterministic fake below
      require(payload.length >= 5, "truncated media payload")
      val w = ((payload(0) & 0xFF) << 8) | (payload(1) & 0xFF)
      val h = ((payload(2) & 0xFF) << 8) | (payload(3) & 0xFF)
      Decoded(w, h, payload(4) & 0xFF, payload.length)
    }
    /** 16-bin byte histogram of the content — the "feature extraction"
      * stand-in (a real pipeline would emit an embedding here). */
    def features(payload: Array[Byte]): Array[Double] = {
      val bins = new Array[Double](16)
      var i = 5
      while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1.0; i += 1 }
      val n = math.max(payload.length - 5, 1)
      bins.map(_ / n)
    }
  }

  /** Deterministic synthetic media table (seeded; used by tests/queries).
    * Built on the SQL-replayable mixer (kernels.Mix) so the DuckDB oracle
    * can regenerate every header field and content byte from range(n). */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    spark.range(n).select(
      col("id").as("media_id"),
      element_at(kinds, (pmod(mixOf(col("id"), lit(0L), 0, seed), lit(3)) + 1).cast("int")).as("kind"),
      synthesizePayload(col("id"), seed).as("payload"),
      struct(
        concat(lit("https://media.example/"), col("id").cast("string")).as("source_url"),
        lit("fake/v1").as("declared_format")).as("meta"))
  }

  /** mix31 with the per-field role constant (mirrored in OracleSql). */
  private[graft] def mixOf(id: org.apache.spark.sql.Column,
      i: org.apache.spark.sql.Column, role: Int, seed: Long) =
    graft.kernels.Mix.mix31(id, i, lit(role.toLong), seed * 7919L + 888887L)

  /** header (w, h, channels) + hash-derived content bytes, all deterministic. */
  private def synthesizePayload(id: org.apache.spark.sql.Column, seed: Long) = {
    val w = (pmod(mixOf(id, lit(0L), 1, seed), lit(512)) + 16).cast("int")
    val h = (pmod(mixOf(id, lit(0L), 2, seed), lit(512)) + 16).cast("int")
    val c = (pmod(mixOf(id, lit(0L), 3, seed), lit(3)) + 1).cast("int")
    val contentLen = (pmod(mixOf(id, lit(0L), 4, seed), lit(200)) + 32)
    val content = transform(sequence(lit(0L), contentLen),
      i => pmod(mixOf(id, i, 5, seed), lit(256)).cast("int"))
    val header = array(
      call_function("shiftright", w, lit(8)).bitwiseAND(lit(255)), w.bitwiseAND(lit(255)),
      call_function("shiftright", h, lit(8)).bitwiseAND(lit(255)), h.bitwiseAND(lit(255)),
      c.bitwiseAND(lit(255)))
    // array<int> -> binary: pack via char codes (latin-1 round trip is exact)
    call_function("encode",
      array_join(transform(concat(header, content), b => char(b + 256)), ""),
      lit("ISO-8859-1"))
  }

  /** Decode metadata per media row — per-partition batch execution (the
    * mapInPandas-shaped path: one iterator of batches per partition). */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, kind, payload) =>
          val d = FakeCodec.decode(payload)
          (id, kind, d.width, d.height, d.channels, d.nBytes)
        }
      }
    out.toDF("media_id", "kind", "width", "height", "channels", "n_bytes")
  }

  /** Feature extraction (byte-histogram stand-in for an embedding). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, FakeCodec.features(p)) })
      .toDF("media_id", "features")
  }

  /** Frame sampling for video payloads: n evenly spaced content slices as
    * binary frames (real plumbing: array-of-binary column shape). */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame = {
    val content = expr("substring(payload, 6, length(payload) - 5)")
    val step = greatest(length(content).cast("int") / nFrames, lit(1))
    media.where(col("kind") === "video")
      .select(col("media_id"),
        transform(sequence(lit(0), lit(nFrames - 1)),
          i => content.substr(i * step + 1, step)).as("frames"))
      .where(size(col("frames")) > 0)
  }

  /** Resize stub: deterministic downsample of the content bytes (every k-th
    * byte), keeping the 5-byte header shape with updated dimensions. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val d = FakeCodec.decode(p)
        val content = p.drop(5).zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
        val w = math.max(d.width / factor, 1); val h = math.max(d.height / factor, 1)
        val header = Array[Byte]((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte, d.channels.toByte)
        (id, header ++ content)
      })
      .toDF("media_id", "payload")
  }
}
