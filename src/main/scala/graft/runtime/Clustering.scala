package graft.runtime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Range-clustered table layout (the data-skipping seam): at write time,
  * `repartitionByRange` sends each row to the file owning its key range
  * and `sortWithinPartitions` orders rows inside the file, so every
  * parquet row group's min/max statistics span a NARROW slice of the key
  * domain. A later range predicate on that key is evaluated against those
  * stats before any page is decoded — whole row groups (and with one
  * group per file, whole files) are skipped at scan time.
  *
  * This is the third organized-write seam next to [[Bucketing]] (hash
  * layout for join co-location) and the Materializer's date partitioning
  * (directory pruning for the incremental watermark): range clustering is
  * the one that serves RANGE scans — "last 6 hours of events" against a
  * 100 TB events table reads the handful of files whose stats overlap
  * the window instead of all of them. ClusteringSpec measures the skip:
  * scan-emitted rows under a narrow predicate drop by the clustering
  * factor vs the same rows written unclustered.
  *
  * Plain parquet paths (no catalog needed — the stats live in the files);
  * `numFiles` sizes the range slices: at the target scale pick
  * total_bytes/numFiles ≈ one HDFS-block-ish file (128-512 MB) so a
  * selective scan schedules one task per surviving file.
  */
object Clustering {

  def writeClustered(df: DataFrame, path: String, numFiles: Int,
                     sortCols: Seq[String]): Unit = {
    require(sortCols.nonEmpty, "clustering needs at least one sort column")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
