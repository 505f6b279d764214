package graft.runtime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt-snapshot semantics (SCD2 type-2 history): each run compares the
  * source's CURRENT state against the open rows of the history table and
  * rewrites it so every key carries its full validity timeline —
  * unchanged keys keep their open row, changed keys close the old row
  * (`valid_to` = run timestamp) and open a new one, unseen keys insert.
  * This is dbt's `check` strategy (reference analog: the project's
  * `tests/`/`snapshots/` dirs are empty, but snapshots are the third
  * core dbt materialization next to table and incremental — a switching
  * user expects them).
  *
  * Design notes:
  *  - `step` is a PURE frame function (prior history in, next history
  *    out) — materialization policy stays with the caller. Because a row
  *    is immutable once closed and (key, valid_from) identifies every
  *    row, the step composes with [[Materializer.materialize]] through a
  *    `surrogateKey(key, valid_from)` id: changed keys UPDATE their open
  *    row in place (same id, valid_to now set) and new versions APPEND.
  *  - change detection hashes the declared `checkCols` (md5 over a
  *    -joined render) — one narrow comparison column instead of a
  *    width-proportional predicate; NULL renders as empty, documented
  *    dbt-compatible approximation.
  *  - keys absent from the current batch stay OPEN (dbt's default; hard
  *    deletes are a policy the caller layers on by closing them
  *    explicitly).
  *  - the run timestamp is CALLER-SUPPLIED, not wall clock: reruns are
  *    reproducible, tests and oracles can pin it, and a backfill can
  *    replay history with historical stamps.
  *
  * Scale: two hash-joins on the key (open-vs-current compare, new-key
  * anti-join) plus a union — the same O(|table|+|batch|) merge shape as
  * the incremental upsert; nothing driver-side.
  */
object Snapshots {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"

  private def stateHash(checkCols: Seq[String]) =
    md5(concat_ws("", checkCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))

  /** Advance the history by one run. `current` carries exactly the
    * payload columns (key + checkCols + any carried attributes);
    * `prior` is the previous history (None on the first run). Output
    * schema = current's columns + (valid_from, valid_to) timestamps,
    * open rows having NULL valid_to.
    */
  /** dbt's `timestamp` snapshot strategy: a key changed iff its
    * `updatedAt` column ADVANCED past the open row's — no payload
    * compare at all, so a re-emitted record with a newer stamp and an
    * identical payload still closes + re-opens (the documented contrast
    * with [[step]]'s `check` strategy, spec-pinned). Validity comes from
    * the DATA, not the run: `valid_from` = the record's own updatedAt,
    * and a closing row's `valid_to` = the superseding record's
    * updatedAt — reruns are reproducible with no caller-supplied stamp.
    * Records whose stamp did NOT advance (equal or older) are ignored,
    * dbt's late-arrival rule. Same two-hash-join + union merge shape as
    * [[step]].
    */
  def stepByTimestamp(prior: Option[DataFrame], current: DataFrame, key: String,
                      updatedAt: String): DataFrame = {
    val cur = current
      .withColumn(ValidFrom, col(updatedAt).cast("timestamp"))
      .withColumn(ValidTo, lit(null).cast("timestamp"))
    prior match {
      case None => cur
      case Some(hist) =>
        val closed = hist.filter(col(ValidTo).isNotNull)
        val open = hist.filter(col(ValidTo).isNull)
        val curKeyed = cur.select(col(key).as("__ck"),
          col(updatedAt).cast("timestamp").as("__cu"))
        val openNext = open
          .join(curKeyed, col(key) === col("__ck"), "left")
          .withColumn(ValidTo,
            when(col("__cu") > col(updatedAt).cast("timestamp"), col("__cu"))
              .otherwise(col(ValidTo)))
          .drop("__ck", "__cu")
        val openKeyed = open.select(col(key).as("__ok"),
          col(updatedAt).cast("timestamp").as("__ou"))
        val freshOpen = cur
          .join(openKeyed, col(key) === col("__ok"), "left")
          .filter(col("__ou").isNull || col(updatedAt).cast("timestamp") > col("__ou"))
          .drop("__ok", "__ou")
        closed.unionByName(openNext).unionByName(freshOpen)
    }
  }

  def step(prior: Option[DataFrame], current: DataFrame, key: String,
           checkCols: Seq[String], runTs: java.sql.Timestamp): DataFrame = {
    require(checkCols.nonEmpty, "snapshot needs at least one check column")
    val cur = current
      .withColumn("__h", stateHash(checkCols))
      .withColumn(ValidFrom, lit(runTs))
      .withColumn(ValidTo, lit(null).cast("timestamp"))
    prior match {
      case None => cur.drop("__h")
      case Some(hist) =>
        val closed = hist.filter(col(ValidTo).isNotNull)
        val open = hist.filter(col(ValidTo).isNull).withColumn("__h", stateHash(checkCols))
        val curKeyed = cur.select(col(key).as("__ck"), col("__h").as("__ch"))
        // open rows: keep if unchanged or unseen; close if the current
        // state hash differs
        val openNext = open
          .join(curKeyed, col(key) === col("__ck"), "left")
          .withColumn(ValidTo,
            when(col("__ch").isNotNull && col("__ch") =!= col("__h"), lit(runTs))
              .otherwise(col(ValidTo)))
          .drop("__ck", "__ch", "__h")
        // current rows that need a NEW open version: changed or brand-new
        val openKeyed = open.select(col(key).as("__ok"), col("__h").as("__oh"))
        val freshOpen = cur
          .join(openKeyed, col(key) === col("__ok"), "left")
          .filter(col("__oh").isNull || col("__oh") =!= col("__h"))
          .drop("__ok", "__oh", "__h")
        closed.unionByName(openNext).unionByName(freshOpen)
    }
  }
}
