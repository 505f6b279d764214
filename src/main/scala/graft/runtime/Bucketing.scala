package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table seam (SURVEY §4 scale notes): pre-hash-partition a table
  * on its join/aggregation key at WRITE time so every later equi-join or
  * groupBy on that key reads data already co-located — the shuffle is paid
  * once, at ingest, instead of per query.
  *
  * This is the managed-table analog of the cid-partitioned IVF index
  * (graft.ext.IvfIndex) and the date-partitioned Materializer path: all
  * three trade one organized write for shuffle-free reads. At 100 TB a
  * fact-fact join (e.g. lineitem ⋈ orders) is the dominant shuffle; with
  * both sides bucketed `buckets`-ways on the key, Spark's scan reports
  * the hash partitioning and the join planner drops BOTH Exchanges
  * (asserted in BucketingSpec). Bucket counts must match across tables
  * meant to join; pick a count sized so one bucket of the LARGER table
  * fits an executor core's working memory.
  *
  * Uses the session catalog's managed parquet tables (`saveAsTable` —
  * bucket metadata lives in the catalog; a plain parquet path cannot
  * carry it).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table, bucketed AND sorted by
    * `key` (the sort makes each bucket file merge-join-ready).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Read a bucketed table back through the catalog (scan carries the
    * bucket partitioning into the planner).
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
