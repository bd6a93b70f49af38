package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines (SURVEY.md §2.11):
  * image/audio/video payloads travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extraction / resize /
  * frame-sampling run as partition-batched transforms.
  *
  * The actual codec layer is a STUB — the container has no image/audio
  * libraries — marked [STUB-DECODE] below: a deterministic fake that
  * maps bytes → features. Everything Spark-side is real and tested:
  * schema contracts, mapPartitions batching (the Scala analog of
  * mapInPandas: one iterator per partition, no per-row setup cost),
  * partition sizing, and the metadata plumbing.
  *
  * At 100 TB: binary payloads dominate scan width — keep them in their
  * own parquet column (never inside a struct with hot scalars) so
  * column pruning skips them unless decoded; feature extraction is
  * narrow (no shuffle), so throughput scales with executors.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Build an opaque media table from the documents table: text bytes
    * stand in for an encoded payload (deterministic fake acquisition).
    * Metadata derives width/height from byte length so downstream
    * logic has real variation to chew on. */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("fake/raw").as("format"),
        length(col("text")).cast(LongType).as("n_bytes"),
        (pmod(col("doc_id"), lit(64)) + 16).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast(IntegerType).as("height")).as("meta"))

  private val featureDim = 16

  /** [STUB-DECODE] deterministic fake decoder: byte-value histogram over
    * 16 buckets, L1-normalized — stands in for image decode + CNN/CLIP
    * featurization. Replace the body with a real codec call; the
    * signature (bytes → fixed-dim Array[Float]) is the real contract. */
  private def decodeToFeatures(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](featureDim)
    if (bytes == null || bytes.isEmpty) return hist
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) / featureDim) += 1f
      i += 1
    }
    var j = 0
    while (j < featureDim) { hist(j) /= bytes.length; j += 1 }
    hist
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Feature extraction INSIDE the Catalyst plan: the stub decoder runs
    * as a scalar UDF over the binary column, so column pruning, AQE and
    * codegen above/below it survive (the previous `.rdd.mapPartitions`
    * exit severed the plan — no pruning through it, Row boxing per
    * record). Narrow (no shuffle); output is joinable back on media_id. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val decode = udf((bytes: Array[Byte]) => decodeToFeatures(bytes))
    media.select(col("media_id"), decode(col("content")).as("features"))
  }

  /** Gate-friendly exploded form: one (media_id, bucket, weight) row per
    * non-zero histogram bucket — scalar columns only, so generic
    * row-compare tooling can sort/hash it (an array<float> column
    * cannot be lexicographically sorted by the driver's pandas gate).
    * weight stays a single float32 division (cnt/len), widened to
    * double, so a byte-exact SQL oracle can reproduce it. */
  def featureBuckets(media: DataFrame): DataFrame =
    extractFeatures(media)
      .select(col("media_id"), posexplode(col("features")).as(Seq("bucket", "weight")))
      .where(col("weight") > 0f)
      .select(col("media_id"), col("bucket").cast(LongType).as("bucket"),
        col("weight").cast(DoubleType).as("weight"))

  /** [STUB-DECODE] "resize": truncate/zero-pad the payload to nBytes,
    * updating metadata — stands in for a pixel resize. */
  def resize(media: DataFrame, nBytes: Int): DataFrame = {
    val resized = substring(col("content"), 1, nBytes)
    media.select(
      col("media_id"),
      rpad(resized, nBytes, Array[Byte](0)).as("content"),
      struct(
        col("meta.format").as("format"),
        lit(nBytes.toLong).as("n_bytes"),
        col("meta.width"), col("meta.height")).as("meta"))
  }

  /** Frame sampling: split the payload into fixed-size "frames" and
    * keep every `stride`-th — posexplode keeps the frame index. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = ceil(col("meta.n_bytes") / lit(frameBytes.toDouble)).cast(IntegerType)
    media
      .where(col("meta.n_bytes") > 0) // sequence(0, -1) is illegal
      .select(col("media_id"), col("content"), nFrames.as("n_frames"))
      .select(col("media_id"),
        posexplode(expr(s"transform(sequence(0, n_frames - 1, $stride), " +
          s"i -> substring(content, i * $frameBytes + 1, $frameBytes))"))
          .as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("frame_idx"), col("frame"))
  }
}
