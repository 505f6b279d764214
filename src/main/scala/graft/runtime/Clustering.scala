package graft.runtime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Spread the low 16 bits of `v` into the even bit positions (the
    * classic 4-step mask-shift morton expansion), as pure Column long
    * arithmetic — codegen-friendly, no UDF.
    */
  private def spreadBits(v: Column): Column = {
    val s1 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Two-dimensional Z-order (morton) layout: each sort column is
    * normalized to a 16-bit bucket over its observed [min, max] and the
    * bucket bits are interleaved, so file/row-group ranges of the morton
    * code cover axis-aligned RECTANGLES of the (x, y) domain. A range
    * predicate on EITHER column then overlaps only the files whose
    * rectangle intersects it — the property single-column clustering
    * lacks (its non-lead column is scattered across every file, so stats
    * never exclude anything; measured both ways in ClusteringSpec).
    *
    * Column min/max come from one 2-row-ish aggregate collected on the
    * driver (two scalars per column — bounded by construction). Bucket
    * arithmetic divides BEFORE multiplying (step = ceil(range/2^16)), so
    * epoch-µs magnitudes cannot overflow a long.
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
                    xCol: Column, yCol: Column): Unit = {
    val Array(row) = df.agg(
      min(xCol.cast("long")).as("x0"), max(xCol.cast("long")).as("x1"),
      min(yCol.cast("long")).as("y0"), max(yCol.cast("long")).as("y1")).collect()
    // Both dimensions must occupy the SAME bit width or interleaving is
    // pointless: a narrow domain (150 user ids) left at its natural 8
    // bits under a 16-bit timestamp makes every high morton bit a
    // timestamp bit and the layout degenerates to single-dim time order
    // (caught by ClusteringSpec's user-predicate gate). Small ranges
    // scale UP (multiply first — product ≤ range·65535 < 2^53, exact in
    // the double division), large ranges scale DOWN (divide first, no
    // overflow at epoch-µs magnitudes).
    def bucket(c: Column, lo: Long, hi: Long): Column = {
      val range = math.max(1L, hi - lo)
      val v = c.cast("long") - lit(lo)
      if (range <= (1L << 31))
        floor(v * lit(65535L) / lit(range)).cast("long")
      else
        floor(v / lit(range / 65536L + 1L)).cast("long")
    }
    val morton = spreadBits(bucket(xCol, row.getLong(0), row.getLong(1)))
      .bitwiseOR(shiftleft(spreadBits(bucket(yCol, row.getLong(2), row.getLong(3))), 1))
    df.withColumn("__z", morton)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
