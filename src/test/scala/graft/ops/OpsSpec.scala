package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Edge-semantics unit tests per SURVEY §5.2 — the cases a DuckDB oracle
  * diff can't isolate: NULL handling, byte-equality, branch order.
  */
class KeysSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("surrogateKey byte-matches dbt_utils generate_surrogate_key semantics") {
    val df = Seq(("a", Some(1)), ("b", None)).toDF("k", "v")
    val got = df.select(Keys.surrogateKey($"k", $"v").as("id"))
      .as[String].collect().toSeq
    assert(got == Seq(
      md5Hex("a-1"),
      md5Hex("b-_dbt_utils_surrogate_key_null")))
  }

  test("surrogateKey is injective on distinct simple inputs") {
    val df = (1 to 100).toDF("n")
    val ids = df.select(Keys.surrogateKey($"n")).distinct().count()
    assert(ids == 100)
  }
}

class FiltersSpec extends SparkSpec {
  import spark.implicits._

  test("P4: != drops NULL rows (Redshift non-null-safe semantics)") {
    val df = Seq(Some("internal"), Some("search"), None).toDF("refr_medium")
    val kept = df.filter($"refr_medium" =!= "internal").collect()
    assert(kept.map(_.getString(0)).toSeq == Seq("search")) // NULL row dropped
  }

  test("P5: botFilter is case-insensitive and drops NULL useragent") {
    val df = Seq(Some("GoogleBOT/2.1"), Some("Mozilla/5.0"), Some("web-Spider"),
      Some("crawler-x"), None).toDF("ua")
    val kept = df.filter(Filters.botFilter($"ua")).as[String].collect().toSeq
    assert(kept == Seq("Mozilla/5.0"))
  }

  test("P10: watermark NVL fallback on empty prior, value otherwise; filter is strict >") {
    val prior = Seq(java.sql.Date.valueOf("2024-01-05"), java.sql.Date.valueOf("2024-01-07"))
      .toDF("d")
    assert(Filters.watermark(Some(prior), "d").contains(java.sql.Date.valueOf("2024-01-07")))
    assert(Filters.watermark(None, "d").isEmpty)
    // prior EXISTS but max is NULL: the reference's NVL(MAX(..),'1900-01-01')
    // still filters on > 1900-01-01 (dropping NULL dates) — not a full scan.
    val empty = prior.filter(lit(false))
    assert(Filters.watermark(Some(empty), "d").contains(Filters.watermarkEpoch))
    val in = Seq(java.sql.Date.valueOf("2024-01-07"), java.sql.Date.valueOf("2024-01-08"))
      .toDF("d")
    val out = Filters.watermarkFilter(in, "d", Some(java.sql.Date.valueOf("2024-01-07")))
    assert(out.collect().map(_.getDate(0).toString).toSeq == Seq("2024-01-08"))
  }
}

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def classify(medium: String, network: String): Option[String] = {
    val df = Seq((medium, network)).toDF("refr_medium", "mkt_network")
    df.select(Classify.trafficType($"refr_medium", $"mkt_network").as("t"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))
  }

  test("F9 classifier: paid / organic / NULL branch order preserved") {
    assert(classify("cpc", "adwords").contains("paid"))
    assert(classify("paid", "").contains("paid"))          // second arm
    assert(classify("social", "").contains("organic"))
    assert(classify("social", "adnet").contains("paid"))   // paid wins when network set
    assert(classify("cpc", "").isEmpty)                    // cpc not in organic list
    assert(classify("internal", "").isEmpty)               // unclassifiable
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("u1", 1L, "view", 10L), ("u1", 2L, "purchase", 5L), ("u1", 3L, "view", 99L),
    ("u2", 4L, "view", 50L), ("u2", 5L, "view", 50L)) // tie on ts → event_id desc
    .toDF("user_id", "event_id", "event_type", "ts")

  private val rank = when($"event_type" === "purchase", 1).otherwise(2)

  test("W1 topOnePerKey picks paid-touch first, then latest, then highest id") {
    val got = Dedup.topOnePerKey(df, Seq($"user_id"),
      Seq(rank, $"ts".desc, $"event_id".desc))
      .select("user_id", "event_id").as[(String, Long)].collect().toMap
    assert(got == Map("u1" -> 2L, "u2" -> 5L))
  }

  test("argmax variant agrees with the window form under an inverted order") {
    // max(struct) picks the LARGEST, so encode: lower rank first → negate
    val got = Dedup.argmax(df, Seq($"user_id"),
      Seq(-rank, $"ts", $"event_id"))
      .select("user_id", "event_id").as[(String, Long)].collect().toMap
    assert(got == Map("u1" -> 2L, "u2" -> 5L))
  }
}

class PivotSpec extends SparkSpec {
  import spark.implicits._

  test("byUnion and byExplode emit identical row sets") {
    val agg = Seq(("2024-01-01", "click", 10L, 3L), ("2024-01-02", "view", 7L, 2L))
      .toDF("d", "t", "total_visits", "unique_visitors")
    val a = Pivot.byUnion(agg, Seq("d", "t"), "col_1", "traffic", "total_visits", "unique_visitors")
    val b = Pivot.byExplode(agg, Seq("d", "t"), "col_1", "traffic", "total_visits", "unique_visitors")
    assert(a.schema == b.schema)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == 4)
  }
}

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join under skew") {
    // hot key: 'k0' carries 80% of the big side
    val big = ((1 to 400).map(i => ("k0", i)) ++ (1 to 100).map(i => (s"k${i % 7 + 1}", i)))
      .toDF("k", "v")
    val dim = (0 to 7).map(i => (s"k$i", s"name$i")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
    val salted = graft.ops.Joins.saltedJoin(big, dim, Seq("k"), salt = 4)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("saltedJoin preserves left-join unmatched rows") {
    val big = Seq(("a", 1), ("zz", 2)).toDF("k", "v")
    val dim = Seq(("a", "x")).toDF("k", "name")
    val out = graft.ops.Joins.saltedJoin(big, dim, Seq("k"), joinType = "left", salt = 3)
      .select("k", "v", "name").as[(String, Int, Option[String])].collect().toSet
    assert(out == Set(("a", 1, Some("x")), ("zz", 2, None)))
  }

  test("sketchTable partials survive a parquet round-trip and union to the exact distinct") {
    import org.apache.spark.sql.functions._
    // the property that makes the sketch a VALUE: write daily partials,
    // read them back, roll up — per-key user sets overlap across days,
    // so a correct union must NOT double-count (sum of per-day distincts
    // would be 6; the true per-type distinct is 4 and 3)
    val ev = Seq(
      ("d1", "view", 1L), ("d1", "view", 2L), ("d2", "view", 2L),
      ("d2", "view", 3L), ("d3", "view", 4L),
      ("d1", "click", 1L), ("d2", "click", 1L), ("d3", "click", 5L),
      ("d3", "click", 6L)
    ).toDF("day", "etype", "uid")
    val dir = java.nio.file.Files.createTempDirectory("sketch_tbl").toString
    graft.ops.Aggs.sketchTable(ev, Seq(col("day"), col("etype")), col("uid"))
      .write.mode("overwrite").parquet(dir)
    val rolled = graft.ops.Aggs.sketchRollup(
        spark.read.parquet(dir), Seq(col("etype")), col("sketch"))
      .as[(String, Long)].collect().toMap
    // HLL at lgK=12 is exact at this cardinality
    assert(rolled == Map("view" -> 4L, "click" -> 3L), rolled.toString)
  }
}

class TopKSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("topKPerKey is row-identical to the ROW_NUMBER window form, ties included") {
    val rnd = new scala.util.Random(7)
    // duplicate ord values on purpose: ties must break on id identically
    val rows = (1 to 500).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(20).toDouble, i.toLong))
    val df = rows.toDF("k", "v", "id")
    val got = graft.ops.Aggs.topKPerKey(df, Seq(col("k")), col("v"), col("id"), k = 5)
      .select("k", "id", "ord", "rank")
      .as[(String, Long, Double, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("k"), col("id"), col("v").as("ord"), col("rank"))
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == expected)
  }

  test("TopK buffer stays bounded and ordered through reduce and merge") {
    val agg = new graft.ops.Aggs.TopK(3)
    val b = (1 to 10).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i.toDouble, i.toLong)))
    assert(b == Seq((10.0, 10L), (9.0, 9L), (8.0, 8L)), b.toString)
    // merge of two full buffers keeps the global top-3; tie (8.0) breaks on lower id
    val other = Seq((11.0, 20L), (8.0, 2L), (1.0, 30L))
    assert(agg.merge(b, other) == Seq((11.0, 20L), (10.0, 10L), (9.0, 9L)))
    assert(agg.merge(Seq((8.0, 2L)), Seq((8.0, 1L))) == Seq((8.0, 1L), (8.0, 2L)))
  }

  test("NULL ords are dropped, not ranked") {
    val df = Seq((Some(2.0), 1L), (None, 2L), (Some(1.0), 3L))
      .toDF("v", "id").withColumn("k", lit("a"))
    val got = graft.ops.Aggs.topKPerKey(df, Seq(col("k")), col("v"), col("id"), k = 5)
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (3L, 2L)), got.toString)
  }
}
