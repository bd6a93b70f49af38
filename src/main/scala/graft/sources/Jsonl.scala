package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL ingestion with corrupt-record ACCOUNTING (SURVEY.md §2.1):
  * at 100 TB every line-delimited feed carries malformed rows —
  * truncated uploads, mid-write crashes, encoding damage — and the
  * two failure postures Spark offers by default are both wrong for a
  * corpus build: FAILFAST kills a day-long job on one bad byte,
  * DROPMALFORMED silently shrinks the dataset. This reader takes the
  * third posture (the [[graft.operators.Multimodal]] decode-audit
  * posture for text): PERMISSIVE parse, every unparseable line
  * preserved verbatim in a corrupt-record column, and a one-row audit
  * that COUNTS the loss so the pipeline can alert on a bad-row spike
  * instead of discovering it at eval time.
  *
  * Scale shape: the JSON parse is Spark's own codegen'd JacksonParser
  * per partition — narrow, no shuffle; the audit is one bounded-state
  * aggregate. */
object Jsonl {

  /** Read line-delimited JSON under `path` against an explicit `ddl`
    * schema (schema inference is a full extra pass at corpus scale —
    * never inferred here); unparseable lines land verbatim in
    * `_corrupt` with NULL data fields. Spark restriction to honor
    * downstream: a query may not reference ONLY `_corrupt`
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — keep a data column in any
    * corrupt-row projection, as [[audit]] does. */
  def readAudited(spark: SparkSession, path: String, ddl: String): DataFrame = {
    val schema = StructType.fromDDL(ddl).add("_corrupt", "string")
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** One-row ingest audit over a [[readAudited]] frame: row/good/bad
    * counts plus a checksum of a caller-named numeric column over the
    * GOOD rows (proving the survivors actually parsed, not just that
    * they were counted). */
  def audit(rows: DataFrame, idCol: String = "doc_id"): DataFrame =
    rows.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("_corrupt").isNull, lit(1))).as("n_good"),
      count(when(col("_corrupt").isNotNull, lit(1))).as("n_bad"),
      sum(when(col("_corrupt").isNull, col(idCol))).as("good_id_sum"))

  /** Probe: can THIS runtime frame line-text in zstd (.jsonl.zst)?
    * Spark bundles zstd-jni for parquet/orc/shuffle, but TEXT codecs
    * route through Hadoop's ZStandardCodec, which needs the native
    * hadoop zstd binding — absent in many deployments. C4/OSCAR
    * distributions increasingly ship .jsonl.zst, so wherever this
    * probe passes the gzip container discipline (jsonl_gz_roundtrip)
    * gains the zstd variant; where it fails, gzip carries the
    * contract and SourcesSpec pins that the probe's verdict agrees
    * with an actual write attempt — availability is a CHECKED fact,
    * never an assumption that surfaces as a mid-job crash. */
  def zstdTextCodecAvailable(spark: SparkSession): Boolean =
    try {
      val codec = new org.apache.hadoop.io.compress.ZStandardCodec()
      codec.setConf(spark.sparkContext.hadoopConfiguration)
      val out = codec.createOutputStream(java.io.OutputStream.nullOutputStream())
      out.write(42); out.close(); true
    } catch {
      // the two shapes "binding absent" actually takes: the codec's
      // own RuntimeException ("native ... not loaded") and a
      // LinkageError from the JNI stub. Anything fatal (OOM, thread
      // death) must propagate — a probe that swallows it would
      // misreport a present codec as absent.
      case _: LinkageError => false
      case scala.util.control.NonFatal(_) => false
    }
}
