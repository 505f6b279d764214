package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-level change feed between two states of a key-unique table (the
  * CDC read Delta/Iceberg users expect from a materialized model): rows
  * present only in the new state are `insert`, only in the old state
  * `delete`, present in both with different payloads `update`; unchanged
  * keys are filtered out. The emitted row image is the POST-image for
  * insert/update and the PRE-image for delete, so a downstream consumer
  * can replay the feed to reconstruct the new state from the old.
  *
  * Change detection hashes `md5(to_json(struct(payload)))` — unlike the
  * Snapshots concat render, to_json preserves column boundaries and
  * null-vs-empty distinctions, so two payloads hash equal iff they are
  * field-wise equal (both sides serialize in the same engine, so float
  * rendering is consistent by construction).
  *
  * Scale: one full-outer hash join on the key — O(|old|+|new|) with both
  * sides shuffled once; the payload rides as a single struct column and
  * the compare is one fixed-width hash, never a width-proportional
  * predicate.
  */
object ChangeFeed {

  val ChangeCol = "_change_type"

  /** Diff two key-unique frames with identical schemas. Output schema =
    * `newDf`'s columns + [[ChangeCol]].
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, uniqueKey: String): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"schema mismatch: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val valCols = newDf.columns.filterNot(_ == uniqueKey).toIndexedSeq
    def keyed(df: DataFrame, k: String, h: String, r: String) =
      df.select(col(uniqueKey).as(k),
        md5(to_json(struct(valCols.map(col): _*))).as(h),
        struct(valCols.map(col): _*).as(r))
    val o = keyed(oldDf, "__ko", "__ho", "__ro")
    val n = keyed(newDf, "__kn", "__hn", "__rn")
    val joined = o.join(n, col("__ko") === col("__kn"), "full_outer")
      .withColumn(ChangeCol,
        when(col("__ho").isNull, lit("insert"))
          .when(col("__hn").isNull, lit("delete"))
          .when(col("__ho") =!= col("__hn"), lit("update")))
      .filter(col(ChangeCol).isNotNull)
    val img = when(col(ChangeCol) === "delete", col("__ro")).otherwise(col("__rn"))
    joined.select(
      (coalesce(col("__kn"), col("__ko")).as(uniqueKey) +:
        valCols.map(c => img.getField(c).as(c)) :+
        col(ChangeCol)): _*)
  }
}
