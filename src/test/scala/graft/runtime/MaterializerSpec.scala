package graft.runtime

import graft.SparkSpec
import graft.ops.{Filters, Keys}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Incremental materialization properties (SURVEY §5.3): upsert
  * idempotence + split-batch == full-run equivalence.
  */
class MaterializerSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-mat").toString

  private val rows = Seq(
    ("2024-01-01", "a", 1), ("2024-01-01", "b", 2),
    ("2024-01-02", "a", 3), ("2024-01-03", "b", 4))

  private def inputDf(rs: Seq[(String, String, Int)]): DataFrame =
    rs.toDF("ds", "k", "v").select(to_date($"ds").as("d"), $"k", $"v")

  // model: count per (d, k) with surrogate id, watermarked on d
  private def model(input: DataFrame)(prior: Option[DataFrame]): DataFrame = {
    val wm = Filters.watermark(prior, "d")
    Filters.watermarkFilter(input, "d", wm)
      .groupBy("d", "k").agg(count(lit(1)).as("n"))
      .withColumn("id", Keys.surrogateKey($"d", $"k"))
  }

  test("first run = full build; rerun on same input is idempotent") {
    val mat = new Materializer(spark, freshDir())
    val full = inputDf(rows)
    val r1 = mat.materialize("m", "id")(model(full)).collect().toSet
    val r2 = mat.materialize("m", "id")(model(full)).collect().toSet
    assert(r1.nonEmpty && r1 == r2)
  }

  test("property: every date-cut split-batch incremental equals the full run") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val dates = (1 to 6).map(d => f"2024-01-0$d")
    val rowGen = Gen.listOfN(30, Gen.zip(
      Gen.oneOf(dates), Gen.oneOf("a", "b", "c", "d", "e"), Gen.choose(1, 99)))
    (0 until 2).foreach { i =>
      val rs = rowGen.apply(Gen.Parameters.default, Seed(7L + i)).get
      val matFull = new Materializer(spark, freshDir())
      val full = matFull.materialize("m", "id")(model(inputDf(rs)))
        .select("id", "d", "k", "n").collect().toSet
      // cut at an early, middle, and late date — including cuts where one
      // batch is empty relative to the data
      Seq(dates(0), dates(2), dates(5)).foreach { cut =>
        val mat = new Materializer(spark, freshDir())
        mat.materialize("m", "id")(model(inputDf(rs.filter(_._1 <= cut))))
        val got = mat.materialize("m", "id")(model(inputDf(rs)))
          .select("id", "d", "k", "n").collect().toSet
        assert(got == full, s"seed ${7 + i} cut $cut diverged")
      }
    }
  }

  test("split-batch incremental == single full run") {
    val matA = new Materializer(spark, freshDir())
    val fullOut = matA.materialize("m", "id")(model(inputDf(rows)))
      .select("id", "d", "k", "n").collect().toSet

    val matB = new Materializer(spark, freshDir())
    val batch1 = rows.filter(_._1 <= "2024-01-02")
    matB.materialize("m", "id")(model(inputDf(batch1)))
    val incrOut = matB.materialize("m", "id")(model(inputDf(rows)))
      .select("id", "d", "k", "n").collect().toSet
    assert(incrOut == fullOut)
  }

  test("interrupted swap recovers: __old restored when live dir is missing") {
    val mat = new Materializer(spark, freshDir())
    val v1 = Seq(("k1", 1), ("k2", 2)).toDF("id", "v")
    mat.materialize("t", "id")(_ => v1)
    // simulate a crash between the two swap renames: live moved to __old,
    // replacement never landed, plus the dead writer's unique tmp dir
    val out = java.nio.file.Paths.get(mat.outPath("t"))
    val bak = java.nio.file.Paths.get(mat.outPath("t") + "__old")
    Files.move(out, bak)
    val deadTmp = java.nio.file.Paths.get(mat.outPath("t") + "__tmp_dead")
    Files.createDirectories(deadTmp)
    val recovered = mat.readPrior("t")
    assert(recovered.isDefined, "prior table must be restored from __old")
    assert(recovered.get.as[(String, Int)].collect().toMap == Map("k1" -> 1, "k2" -> 2))
    assert(!Files.exists(bak))
    // tmp dirs are uniquely named per invocation, so recovery cannot tell
    // a dead one from a concurrent writer's in-flight one — it leaves
    // them (deployments sweep orphans by age)
    assert(Files.exists(deadTmp), "recovery must not touch tmp dirs")
    // and the next materialization proceeds normally on the restored table
    val next = mat.materialize("t", "id")(_ => Seq(("k2", 20)).toDF("id", "v"))
      .as[(String, Int)].collect().toMap
    assert(next == Map("k1" -> 1, "k2" -> 20))
  }

  test("concurrent materializes of one model serialize: both upserts land, no clobber") {
    // two Materializer INSTANCES over the same warehouse (the shape two
    // engine entry points in one JVM produce): the JVM-global
    // (dir, model) monitor + OS file lock serialize each whole
    // materialize, so whichever order the threads win, the second build
    // reads the first's table as its prior — BOTH upserts land (the
    // serializable-history property; same final table either order) —
    // and unique tmp dirs mean no writer can clobber another's bytes.
    val dir = freshDir()
    val matA = new Materializer(spark, dir)
    val matB = new Materializer(spark, dir)
    matA.materialize("t", "id")(_ => Seq(("k1", 1)).toDF("id", "v"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { matA.materialize("t", "id")(_ => Seq(("k1", 10)).toDF("id", "v")); () }
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { matB.materialize("t", "id")(_ => Seq(("k2", 20)).toDF("id", "v")); () }
      })
      fa.get(); fb.get()
    } finally pool.shutdown()
    val fin = spark.read.parquet(matA.outPath("t")).as[(String, Int)].collect().toMap
    assert(fin == Map("k1" -> 10, "k2" -> 20), s"lost or torn upsert: $fin")
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.contains("__tmp")).map(_.getName).toSeq
    assert(leftovers.isEmpty, s"orphaned tmp dirs: $leftovers")
  }

  test("crash-leftover __old: swap-lock reader + concurrent writer cannot deadlock") {
    // regression: recover() fired INSIDE withSwapLock used to take the
    // file-lock gate while holding the swap monitor — the inverse of the
    // writer's gate → monitor order — so a reader and a writer meeting
    // over a crash-leftover __old dir deadlocked. Now withSwapLock
    // pre-recovers before the monitor and in-monitor recover is a no-op.
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ => Seq(("k1", 1)).toDF("id", "v"))
    val out = java.nio.file.Paths.get(mat.outPath("t"))
    Files.move(out, java.nio.file.Paths.get(mat.outPath("t") + "__old"))
    val v2 = Seq(("k2", 2)).toDF("id", "v")
    val readerIn = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var readerRows = -1L
    @volatile var writerDone = false
    val reader = new Thread(() => {
      mat.withSwapLock("t") {
        readerIn.countDown()
        release.await(20, java.util.concurrent.TimeUnit.SECONDS)
        readerRows = mat.readPrior("t").map(_.count()).getOrElse(0L)
      }
    })
    val writer = new Thread(() => {
      mat.materialize("t", "id")(_ => v2)
      writerDone = true
    })
    reader.setDaemon(true); writer.setDaemon(true)
    reader.start()
    assert(readerIn.await(20, java.util.concurrent.TimeUnit.SECONDS))
    writer.start()
    Thread.sleep(500) // let the writer reach its blocking acquisition
    release.countDown()
    reader.join(60000); writer.join(60000)
    assert(!reader.isAlive && !writer.isAlive,
      "reader/writer deadlocked over crash-leftover __old")
    assert(readerRows == 1L, s"reader saw $readerRows rows of the recovered table")
    assert(writerDone)
    val end = mat.readPrior("t").get.as[(String, Int)].collect().toMap
    assert(end == Map("k1" -> 1, "k2" -> 2), end.toString)
  }

  test("recovery never touches a lone __tmp beside a healthy table") {
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ => Seq(("k1", 1)).toDF("id", "v"))
    // a concurrent materialize's in-flight write (or a dead one): with
    // the live table healthy, readers must not delete it out from under
    // the writer — the swap-marker state is consistent, so recovery is
    // a no-op
    val tmp = java.nio.file.Paths.get(mat.outPath("t") + "__tmp")
    Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("part-inflight"), "writer owns this")
    assert(mat.readPrior("t").isDefined)
    assert(Files.exists(tmp.resolve("part-inflight")),
      "reader-side recovery deleted an in-flight __tmp")
    // post-swap leftover (__old beside live) IS cleaned on read
    val bak = java.nio.file.Paths.get(mat.outPath("t") + "__old")
    Files.createDirectories(bak)
    mat.exists("t")
    assert(!Files.exists(bak), "stale __old beside a live table must be dropped")
  }

  test("withSwapLock readers are never blocked by an in-flight build") {
    // the writer mutex covers the whole materialize, but the swap
    // monitor (which readers share) must only cover the renames — a
    // downstream streaming model pinning this table has to read freely
    // while an upstream batch builds for seconds
    val mat = new Materializer(spark, freshDir())
    mat.materialize("t", "id")(_ => Seq(("k1", 1)).toDF("id", "v"))
    val buildEntered = new java.util.concurrent.CountDownLatch(1)
    val releaseBuild = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => {
      mat.materialize("t", "id") { _ =>
        buildEntered.countDown()
        releaseBuild.await()
        Seq(("k2", 2)).toDF("id", "v")
      }
      ()
    })
    writer.start()
    try {
      assert(buildEntered.await(30, java.util.concurrent.TimeUnit.SECONDS), "build never started")
      // reader pins and scans WHILE the writer sits mid-build holding
      // the writer mutex + file lock — this deadlocked under a
      // single-monitor design. Time-bounded on a daemon thread so a
      // regression fails the test instead of hanging the suite.
      @volatile var pinned: Map[String, Int] = null
      val reader = new Thread(() => {
        pinned = mat.withSwapLock("t") {
          mat.readPrior("t").get.as[(String, Int)].collect().toMap
        }
      })
      reader.setDaemon(true)
      reader.start()
      reader.join(30000)
      assert(pinned == Map("k1" -> 1), s"reader blocked by in-flight build: $pinned")
    } finally releaseBuild.countDown()
    writer.join(60000)
    assert(!writer.isAlive, "writer failed to finish after release")
    val fin = spark.read.parquet(mat.outPath("t")).as[(String, Int)].collect().toMap
    assert(fin == Map("k1" -> 1, "k2" -> 2), fin.toString)
  }

  test("upsert replaces matching ids and appends new ones") {
    val mat = new Materializer(spark, freshDir())
    val v1 = Seq(("k1", 1), ("k2", 2)).toDF("id", "v")
    val v2 = Seq(("k2", 20), ("k3", 30)).toDF("id", "v")
    mat.materialize("t", "id")(_ => v1)
    val out = mat.materialize("t", "id")(_ => v2)
      .as[(String, Int)].collect().toMap
    assert(out == Map("k1" -> 1, "k2" -> 20, "k3" -> 30))
  }
}

class PartitionOverwriteSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.ops.{Filters, Keys}
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-pow").toString

  private val rows = Seq(
    ("2024-01-01", "a", 1), ("2024-01-01", "b", 2),
    ("2024-01-02", "a", 3), ("2024-01-03", "b", 4))

  private def inputDf(rs: Seq[(String, String, Int)]): DataFrame =
    rs.toDF("ds", "k", "v").select(to_date($"ds").as("d"), $"k", $"v")

  private def model(input: DataFrame)(prior: Option[DataFrame]): DataFrame = {
    val wm = Filters.watermark(prior, "d")
    Filters.watermarkFilter(input, "d", wm)
      .groupBy("d", "k").agg(count(lit(1)).as("n"))
      .withColumn("id", Keys.surrogateKey($"d", $"k"))
  }

  test("date-partition overwrite == anti-join upsert for date-functional keys") {
    val upsert = new Materializer(spark, freshDir())
    upsert.materialize("m", "id")(model(inputDf(rows.filter(_._1 <= "2024-01-02"))))
    val expected = upsert.materialize("m", "id")(model(inputDf(rows)))
      .select("id", "k", "n", "d").as[(String, String, Long, java.sql.Date)]
      .collect().toSet

    val pow = new Materializer(spark, freshDir())
    pow.materializeByDatePartition("m", "d")(model(inputDf(rows.filter(_._1 <= "2024-01-02"))))
    val got = pow.materializeByDatePartition("m", "d")(model(inputDf(rows)))
      .select("id", "k", "n", "d").as[(String, String, Long, java.sql.Date)]
      .collect().toSet
    assert(got == expected)
  }

  test("partition overwrite rewrites only the touched date partitions") {
    val pow = new Materializer(spark, freshDir())
    pow.materializeByDatePartition("m", "d")(model(inputDf(rows)))
    val out = new java.io.File(pow.outPath("m"))
    val parts = out.listFiles().filter(_.getName.startsWith("d=")).map(_.getName).sorted
    assert(parts.toSeq == Seq("d=2024-01-01", "d=2024-01-02", "d=2024-01-03"))
  }
}
