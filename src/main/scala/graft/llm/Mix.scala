package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixing operators: deterministic domain-weighted sampling for
  * assembling a training corpus from heterogeneous sources.
  *
  * Why hash-based instead of `df.sample()`: at 100 TB the sample must be
  * (a) exactly reproducible across retries, re-partitionings, and engine
  * versions (Spark's sampler is seed-stable only per partitioning), and
  * (b) joinable — two tables sampled on the same key keep referential
  * integrity. Hashing the row's own id gives both, and the decision is a
  * narrow codegen'd projection + filter: no RNG state, no shuffle, fully
  * pushed past the scan when the id/domain columns are leading parquet
  * columns.
  */
object Mix {

  /** The sampling bucket in [0, 10000): first 8 md5 hex digits of the id
    * rendered as a string, mod 10⁴ — identical to DuckDB's
    * `('0x' || substr(md5(id::VARCHAR),1,8))::BIGINT % 10000`. */
  def sampleBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 10000

  /** Keep a row iff its bucket falls under its domain's rate: rates are
    * fractions in [0,1] resolved to integer per-myriad thresholds, so the
    * keep decision compares integers (never a float boundary). Domains
    * absent from `rates` use `defaultRate`. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * 10000).toLong)) {
      case (acc, (d, r)) => when(col(domainCol) === d, lit((r * 10000).toLong)).otherwise(acc)
    }
    df.withColumn("sample_bucket", sampleBucket(col(idCol)))
      .filter(col("sample_bucket") < threshold)
  }
}
