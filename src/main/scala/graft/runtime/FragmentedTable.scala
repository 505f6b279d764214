package graft.runtime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** LSM-style upsert table: the O(batch)-per-upsert alternative to the
  * Materializer's whole-table rewrite (parquet has no MERGE, so the
  * Materializer re-writes the table per upsert — fine for model-sized
  * outputs, the wrong cost for a high-frequency ingest of a 100 TB
  * corpus). Each upsert writes ONLY its batch as a new FRAGMENT dir and
  * appends it to an atomically-replaced manifest; reads merge fragments
  * with last-writer-wins per key (newest fragment's row for a key wins —
  * upsert semantics); [[compact]] folds the merge back to one fragment
  * when read amplification has grown. The classic LSM trade, explicit:
  *   write O(batch) + manifest flip; read O(live fragments) until the
  *   next compaction; compaction O(table), scheduled, not per-upsert.
  *
  * Commit protocol mirrors the Materializer's manifest pointer: fragment
  * bytes land fully before the manifest names them (a crash in between
  * leaves an orphan dir the next compaction GCs, never a torn table);
  * the manifest is replaced by a same-directory atomic rename, so a
  * reader resolves either the old or the new fragment list, never a
  * partial one. Fragment order IS commit order (manifest line order);
  * within one fragment a key appears at most once (the upsert dedups its
  * own batch by keeping the LAST row per key, matching "later write
  * wins" inside a batch too). Writers are serialized per table in-JVM;
  * like the Materializer, cross-process concurrent WRITERS are out of
  * scope (single-writer-per-table topology), while cross-process readers
  * are safe through the manifest.
  */
final class FragmentedTable(spark: SparkSession, baseDir: String,
                            table: String, uniqueKey: String) {

  private val lock = FragmentedTable.lockFor(s"${Paths.get(baseDir).toAbsolutePath}#$table")
  private def manifestPath = Paths.get(baseDir, s"$table.fragments")

  private def readManifest(): Seq[String] =
    if (!Files.exists(manifestPath)) Nil
    else new String(Files.readAllBytes(manifestPath), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq

  private def publishManifest(frags: Seq[String]): Unit = {
    val tmp = Paths.get(baseDir, s"$table.fragments__tmp_" +
      java.util.UUID.randomUUID().toString.replace("-", ""))
    Files.write(tmp, (frags.mkString("\n") + "\n").getBytes("UTF-8"))
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append `batch` as a new fragment: keys present in older fragments
    * are superseded on read, new keys appear. Contract (same as the
    * Materializer's upsert): at most one row per key within a batch — a
    * DataFrame carries no "later row" order, so an in-batch conflict has
    * no well-defined winner and must be resolved by the producer (the
    * ingest paths all dedup per batch before upserting).
    */
  def upsert(batch: DataFrame): Unit = lock.synchronized {
    val name = s"${table}__frag_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    batch.write.mode(SaveMode.ErrorIfExists).parquet(s"$baseDir/$name")
    publishManifest(readManifest() :+ name)
  }

  /** The merged table: per key, the row from the NEWEST fragment that
    * contains it. One union + one per-key argmax over the live
    * fragments — the read amplification [[compact]] exists to bound.
    * Empty (no upserts yet) → None.
    */
  def read(): Option[DataFrame] = {
    val frags = readManifest()
    if (frags.isEmpty) return None
    val unioned = frags.zipWithIndex.map { case (f, i) =>
      spark.read.parquet(s"$baseDir/$f").withColumn("__frag_seq", lit(i))
    }.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(uniqueKey)).orderBy(col("__frag_seq").desc)
    Some(unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__frag_seq"))
  }

  /** Live fragment count — the read-amplification signal a maintenance
    * cadence compacts on.
    */
  def fragmentCount(): Int = readManifest().size

  /** Fold the merge back to ONE fragment: write the merged rows as a new
    * fragment, flip the manifest to name only it, then GC every
    * unreferenced fragment dir (superseded fragments AND crash orphans).
    * Readers that resolved the old manifest keep intact dirs until this
    * GC — the same keep-until-superseded window as the Materializer;
    * no-op on an empty table.
    */
  def compact(): Unit = lock.synchronized {
    read().foreach { merged =>
      val name = s"${table}__frag_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      merged.write.mode(SaveMode.ErrorIfExists).parquet(s"$baseDir/$name")
      publishManifest(Seq(name))
      val live = Set(name)
      Option(new java.io.File(baseDir).list()).toSeq.flatten
        .filter(n => n.startsWith(s"${table}__frag_") && !live(n))
        .foreach(n => Fs.deleteRecursive(Paths.get(baseDir, n)))
    }
  }
}

object FragmentedTable {
  // JVM-global writer serialization per (warehouse, table), mirroring the
  // Materializer's registry
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)
}
