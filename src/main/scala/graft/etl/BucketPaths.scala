package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's derived output partitioning
  * (TripEventBucketAssigner.java:34-41): S3 directory
  * `{prefix}pickup_location=%03d/year=%04d/month=%02d` computed from the
  * payload, with zero-padding. Spark writes partition values verbatim as
  * strings, so the zero-padded values must be *string columns* — and readers
  * must not re-infer them as ints
  * (`spark.sql.sources.partitionColumnTypeInference.enabled=false`, set in
  * GraftSession).
  */
object BucketPaths {

  val partitionColumns: Seq[String] = Seq("pickup_location", "year", "month")

  /** Add the three zero-padded partition columns derived from
    * pickup_location_id / pickup_datetime. */
  def withBucketColumns(df: DataFrame): DataFrame = df
    .withColumn("pickup_location",
      format_string("%03d", col("pickup_location_id")))
    .withColumn("year", format_string("%04d", year(col("pickup_datetime"))))
    .withColumn("month", format_string("%02d", month(col("pickup_datetime"))))

  /** The directory path a given event lands in (for tests / routing). */
  def bucketId(df: DataFrame): DataFrame = df
    .withColumn("bucket_id",
      format_string("pickup_location=%03d/year=%04d/month=%02d",
        col("pickup_location_id"), year(col("pickup_datetime")),
        month(col("pickup_datetime"))))
}
