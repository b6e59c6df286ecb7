package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables => T}

/** Multimodal columns for a training-data pipeline (north-star op; no
  * reference implementation). Media ride through the engine as opaque
  * `binary` payloads plus a typed metadata struct — the payload is never
  * interpreted by relational operators, so filters/joins/dedup prune on
  * metadata and only the surviving rows pay decode cost.
  *
  * The decode step is a STUB (this environment has no image/audio codecs):
  * `FakeDecoder.decode` derives deterministic pseudo-dimensions and an
  * 8-float feature vector from the bytes. Everything around it — the schema,
  * the `mapPartitions` batch shape (one decoder instance per partition, rows
  * streamed through it), partition parallelism, and the declared queries — is
  * the real plumbing a codec-backed decoder would drop into.
  */
object Multimodal extends QueryModule {

  /** Typed decode output (what a real image decoder would emit per asset). */
  case class DecodedAsset(
    asset_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, features: Array[Float])

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg:
    * dimensions from byte-length arithmetic, features from a rolling hash.
    * In production: replace body with the codec call; signature and call
    * sites stay unchanged.
    */
  object FakeDecoder {
    def decode(assetId: Long, mediaType: String, bytes: Array[Byte]): DecodedAsset = {
      val n = bytes.length
      var h = 1125899906842597L
      val feats = new Array[Float](8)
      var i = 0
      while (i < n) {
        h = h * 31 + (bytes(i) & 0xff)
        feats(i % 8) += ((bytes(i) & 0xff) - 128) / 128.0f
        i += 1
      }
      val width = 16 + (math.abs(h) % 16).toInt
      DecodedAsset(assetId, mediaType, n.toLong, width,
        if (width == 0) 0 else n / width, feats)
    }
  }

  /** Asset table: binary payload + typed metadata. Payloads here are the
    * documents' UTF-8 bytes standing in for media bytes.
    */
  def assets(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("media_type"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  /** Decode + featurize via mapPartitions: one decoder per partition, rows
    * streamed — the batch shape that amortizes codec/model setup. No shuffle;
    * scales linearly with partitions.
    */
  def decodeFeatures(assetsDf: DataFrame): DataFrame = {
    val s = assetsDf.sparkSession
    import s.implicits._
    assetsDf
      .select(col("asset_id"), col("payload"), col("meta.media_type").as("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec/model handle)
        it.map { case (id, bytes, mt) => FakeDecoder.decode(id, mt, bytes) }
      }
      .toDF()
  }

  /** Frame sampling for "video" payloads: every 4th 64-byte frame, located by
    * pure expressions (offset arithmetic + substr on binary) — no decode, no
    * shuffle, prunes 75% of frames before any decoder runs. Frame fingerprint
    * is md5 (dialect-portable), which makes the whole sampler oracle-checkable.
    */
  def sampleFrames(assetsDf: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    assetsDf.select(col("asset_id"), col("payload"),
        explode(expr(
          s"sequence(0, greatest((length(payload) - 1) DIV ${frameBytes * stride}, 0))")).as("k"))
      .select(col("asset_id"),
        (col("k") * stride).as("frame_id"),
        md5(expr(s"substr(payload, k * $stride * $frameBytes + 1, $frameBytes)"))
          .as("frame_hash"))
      .filter(col("frame_id") * frameBytes < length(col("payload")))

  // ---- declared queries ----

  /** Metadata-only scan (oracle-checked): the payload column is never read —
    * column pruning keeps binary I/O out of a metadata query.
    */
  private def qMmMeta(s: SparkSession, d: String): DataFrame =
    assets(s, d).select(
      col("asset_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.origin").as("origin"),
      md5(col("payload")).as("content_hash"))
      .orderBy("asset_id")

  private def qMmDecode(s: SparkSession, d: String): DataFrame =
    decodeFeatures(assets(s, d))
      .select(col("asset_id"), col("n_bytes"), col("width"), col("height"),
        round(element_at(col("features"), 1).cast("double"), 3).as("f0"))
      .orderBy("asset_id")

  private def qMmFrames(s: SparkSession, d: String): DataFrame =
    sampleFrames(assets(s, d)).orderBy("asset_id", "frame_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_meta" -> qMmMeta,
    "q_mm_decode" -> qMmDecode,
    "q_mm_frames" -> qMmFrames
  )

  val oracleSql: Map[String, String] = Map(
    "q_mm_meta" ->
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  source AS origin,
        |  md5(text) AS content_hash
        |FROM documents ORDER BY asset_id""".stripMargin,
    // payloads are the docs' ASCII bytes, so byte offsets == char offsets and
    // the oracle can sample the same frames with substr on text
    "q_mm_frames" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id, text,
        |    unnest(range(0, greatest((length(text) - 1) // 256, 0) + 1)) AS k
        |  FROM documents)
        |SELECT asset_id, CAST(k * 4 AS INT) AS frame_id,
        |  md5(substr(text, CAST(k * 256 + 1 AS INT), 64)) AS frame_hash
        |FROM f
        |WHERE k * 256 < length(text)
        |ORDER BY asset_id, frame_id""".stripMargin
  )
}
