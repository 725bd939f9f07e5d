package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs batched per partition.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment — see `decodeStub`): the Spark-side contract that matters
  * at 100 TB is real and tested — schema, binary transport, partition
  * batching, deterministic feature signature, and the
  * `repartition(payload-size-aware)` guidance below.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows —
  * partition by byte budget (`maxRecordsPerFile` / salted keys), never by
  * row count alone, and keep features in a separate narrow table joined
  * by content hash so re-extraction doesn't rewrite payloads.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      modality: String,       // image | audio | video
      payload: Array[Byte],
      source_uri: String)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      content_hash: String,
      feature: Array[Float])  // stub embedding

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("source_uri", StringType, nullable = true)))

  /** Wrap any table with a string/binary column as a media table — used by
    * the testdata plumbing (documents.text as fake payloads).
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   modality: String): Dataset[MediaRecord] =
    asMediaTable(df, idCol, payloadCol, lit(modality))

  /** Column-valued modality variant (e.g. routed per row from metadata). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   modality: org.apache.spark.sql.Column): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      modality.as("modality"),
      col(payloadCol).cast(BinaryType).as("payload"),
      concat(lit("testdata://"), col(idCol).cast(StringType)).as("source_uri"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real deployment plugs an image/audio codec in here
    * (`??? → JNI/codec call`); this deterministic fake derives a
    * fixed-width pseudo-embedding from payload bytes so the downstream
    * plumbing (batching, schema, similarity join) is fully exercisable.
    */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    if (payload == null) return Array.fill(dims)(0.0f)
    val out = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction — mapPartitions so a real
    * codec can amortize model/codec init once per partition (the Scala
    * rendering of a `mapInPandas` batch UDF).
    */
  def extractFeatures(media: Dataset[MediaRecord], dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec/model load in real life)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
        val hash  = md.digest(bytes).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.modality, bytes.length.toLong, hash,
          decodeStub(r.payload, dims))
      }
    }
  }
}
