package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Zone-map data skipping and tiered compaction on [[FragmentedTable]].
  *
  * The exactness contract under test: for ANY predicate,
  * `readWhere(pred)` must equal `read().filter(pred)` — including when
  * a NEWER fragment is zone-pruned (its superseded victims must not
  * resurface) and when the predicate contains forms the probe doesn't
  * understand (degrade to unpruned, never to wrong).
  */
class FragmentSkipSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-fragskip").toString

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def assertSame(frag: FragmentedTable, pred: Column): Unit = {
    val expected = rowsOf(frag.read().get.filter(pred))
    val got = rowsOf(frag.readWhere(pred).get)
    assert(got == expected, s"pred $pred: $got != $expected")
  }

  test("readWhere equals read().filter across a predicate battery, overlapping keys, nasty strings") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    val rnd = new scala.util.Random(7)
    // values deliberately include manifest-hostile characters (tab, pipe,
    // \u0001, non-ASCII) so the zone-map encoding roundtrip is exercised
    val nasty = Vector("plain", "tab\there", "pi|pe", "ctl\u0001x", "naïve", "日本語")
    for (b <- 1 to 6) {
      val keys = rnd.shuffle((0 until 30).toList).take(5 + rnd.nextInt(10))
      val rows = keys.map { k =>
        (s"k%02d".format(k), b * 100 + k,
          if (rnd.nextInt(5) == 0) null else nasty(rnd.nextInt(nasty.size)),
          k.toDouble / (b + 1))
      }
      frag.upsert(rows.toDF("id", "v", "s", "d"))
    }
    val preds: Seq[Column] = Seq(
      col("v") > 300,
      col("v") <= 105,
      col("id") === "k07",
      col("id") >= "k20" && col("v") < 500,
      col("s").isNull,
      col("s").isNotNull && col("d") > 0.5,
      col("s") === "naïve",              // non-ASCII: probe must decline, not misprune
      col("id").isin("k01", "k05", "k25"),
      col("v") > 200 || col("id") < "k03",
      length(col("s")) > 4,              // unsupported form: unpruned fallback
      lit(5) < col("v"),                 // literal-on-left
      col("id") <=> "k11",
      col("v") === 9999                  // matches nothing
    )
    preds.foreach(p => assertSame(frag, p))
  }

  test("zone maps prune fragments with disjoint value ranges; result exact") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    // 4 fragments with disjoint v-ranges and disjoint key ranges
    // (zero-padded keys: string min/max must be disjoint LEXICALLY)
    for (b <- 0 until 4) {
      val rows = (0 until 50).map(i => (f"k${b * 50 + i}%03d", b * 1000 + i))
      frag.upsert(rows.toDF("id", "v"))
    }
    val (res, rep) = frag.readWhereReport(col("v") >= 3000)
    assert(rep.total == 4 && rep.scanned == 1, rep.toString)
    assert(rowsOf(res.get) == rowsOf(frag.read().get.filter(col("v") >= 3000)))
    // key-conjunct pruning skips fragments entirely (keyLive < total)
    val (res2, rep2) = frag.readWhereReport(col("id") === "k075")
    assert(rep2.keyLive == 1 && rep2.scanned == 1, rep2.toString)
    assert(res2.get.as[(String, Int)].collect().toSet == Set(("k075", 1025)))
  }

  test("a pruned NEWER fragment cannot resurrect a superseded row (winner-aware)") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    // fragment 0: key kX with v=100 (matches pred v>50)
    frag.upsert(Seq(("kX", 100), ("kA", 60)).toDF("id", "v"))
    // fragment 1 (NEWER): rewrites kX with v=1 — all values fail v>50,
    // so the zone map prunes this fragment from the row scan
    frag.upsert(Seq(("kX", 1), ("kB", 2)).toDF("id", "v"))
    val (res, rep) = frag.readWhereReport(col("v") > 50)
    assert(rep.total == 2 && rep.scanned == 1, rep.toString)
    val got = res.get.as[(String, Int)].collect().toSet
    // kX's live version is v=1 which fails the predicate: kX must be
    // ABSENT even though its old matching version sits in a scanned
    // fragment; kA survives
    assert(got == Set(("kA", 60)), got.toString)
  }

  test("legacy bare-name manifests read correctly (no pruning, no error)") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert(Seq(("k1", 1), ("k2", 2)).toDF("id", "v"))
    frag.upsert(Seq(("k1", 10)).toDF("id", "v"))
    // strip the stats off the manifest, as a pre-zone-map writer would
    // have left it
    val mf = java.nio.file.Paths.get(dir, "t.fragments")
    val legacy = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      .linesIterator.filter(_.nonEmpty).map(_.split('\t').head).mkString("\n") + "\n"
    java.nio.file.Files.write(mf, legacy.getBytes("UTF-8"))
    val (res, rep) = frag.readWhereReport(col("v") > 5)
    assert(rep.total == 2 && rep.scanned == 2, rep.toString)
    assert(res.get.as[(String, Int)].collect().toSet == Set(("k1", 10)))
  }

  test("unmodelable ColumnNodes degrade to unpruned-correct reads, never wrong or thrown") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert(Seq(("k1", 10, "a"), ("k2", 200, "b")).toDF("id", "v", "s"))
    frag.upsert(Seq(("k3", 3000, "c")).toDF("id", "v", "s"))
    // every predicate here contains a construct the bridge does NOT
    // model (SQL-string exprs, arithmetic, UDFs, case/when) — the
    // soft-degrade contract for a Spark minor-version AST drift: the
    // conjunct translates to None, pruning is declined, and readWhere
    // still equals read().filter
    val shout = udf((s: String) => if (s == null) null else s.toUpperCase)
    val opaque: Seq[Column] = Seq(
      expr("v + 1 > 200"),                      // SqlExpr node
      (col("v") * 2) < 500,                     // arithmetic fn node
      shout(col("s")) === "A",                  // UDF node
      when(col("v") > 100, true).otherwise(false), // case/when node
      expr("id rlike 'k[0-9]'"))
    opaque.foreach { p =>
      val (res, rep) = frag.readWhereReport(p)
      val want = rowsOf(frag.read().get.filter(p))
      assert(rowsOf(res.get) == want, s"pred $p")
      assert(rep.scanned == rep.total,
        s"opaque predicate must decline pruning, got $rep for $p")
    }
    // bridge-level: the opaque node is Seq(None); a mixed conjunct
    // keeps its modelable half (key pruning stays available)
    import org.apache.spark.sql.GraftColumnBridge
    assert(GraftColumnBridge.predicateConjuncts(expr("v + 1 > 200")) == Seq(None))
    val mixed = GraftColumnBridge.predicateConjuncts(
      col("id") === "k3" && shout(col("s")) === "C")
    assert(mixed.size == 2 && mixed.count(_.isDefined) == 1, mixed.toString)
    // and that modelable half still prunes to the key's fragment
    val (res2, rep2) = frag.readWhereReport(
      col("id") === "k3" && shout(col("s")) === "C")
    assert(rep2.keyLive == 1, rep2.toString)
    assert(rowsOf(res2.get) == Set("k3|3000|C".replace("C", "c")))
  }

  test("empty-string min/max survives the manifest round-trip; fragment not mispruned") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    // fragment whose string column's MIN is the empty string — the
    // round-trip regression: render must keep Some("") distinct from
    // None or a re-read manifest prunes this fragment as "all null"
    frag.upsert(Seq(("k1", "", 1), ("k2", "zzz", 2)).toDF("id", "s", "v"))
    frag.upsert(Seq(("k3", "mid", 3)).toDF("id", "s", "v"))
    // re-open: forces the manifest parse path (no in-memory stats)
    val reopened = new FragmentedTable(spark, dir, "t", "id")
    assertSame(reopened, col("s") === "")
    assertSame(reopened, col("s") <= "a")
    val hit = reopened.readWhere(col("s") === "").get
      .as[(String, String, Int)].collect().toSet
    assert(hit == Set(("k1", "", 1)), hit.toString)
    // the ZoneMap codec itself: Some("") != None across render/parse
    val zm = FragmentedTable.ZoneMap(2, Map(
      "a" -> FragmentedTable.ColStats("string", Some(""), Some(""), 0),
      "b" -> FragmentedTable.ColStats("string", None, None, 2)))
    val back = FragmentedTable.ZoneMap.parse(zm.render).get
    assert(back == zm, s"$back != $zm")
  }

  test("absent bounds prune only when the null count confirms all-null") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    // truly all-null column: nulls == rows → probe may prune on s = 'x'
    frag.upsert(Seq(("k1", null.asInstanceOf[String], 1),
      ("k2", null.asInstanceOf[String], 2)).toDF("id", "s", "v"))
    val (_, rep) = frag.readWhereReport(col("s") === "x")
    assert(rep.scanned == 0, rep.toString)
    // legacy manifest that lost an empty-string bound (inconsistent:
    // bounds absent but nulls < rows) must DECLINE pruning, not skip
    frag.upsert(Seq(("k3", "", 3)).toDF("id", "s", "v"))
    val mf = java.nio.file.Paths.get(dir, "t.fragments")
    val legacyised = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
      .replace("=", "") // strip presence markers: "" bounds become ambiguous
    java.nio.file.Files.write(mf, legacyised.getBytes("UTF-8"))
    val reopened = new FragmentedTable(spark, dir, "t", "id")
    val got = reopened.readWhere(col("s") === "").get
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("k3", "", 3)), got.toString)
  }

  test("predicate disproven everywhere returns an empty frame with the table schema") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert(Seq(("k1", 1, "a")).toDF("id", "v", "s"))
    val (res, rep) = frag.readWhereReport(col("v") > 1000)
    assert(rep.scanned == 0)
    assert(res.get.columns.toSeq == Seq("id", "v", "s"))
    assert(res.get.count() == 0)
  }

  test("null keys merge and probe safely") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert(Seq((null.asInstanceOf[String], 1), ("k1", 2)).toDF("id", "v"))
    frag.upsert(Seq((null.asInstanceOf[String], 10)).toDF("id", "v"))
    assertSame(frag, col("v") > 0)
    assertSame(frag, col("v") > 5)
    // LWW applies to the null key too
    val all = frag.read().get.as[(Option[String], Int)].collect().toSet
    assert(all == Set((None, 10), (Some("k1"), 2)), all.toString)
  }

  test("tiered compaction folds only the newest small run; base untouched; content invariant") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    // large base: 50k rows, so base bytes dominate the small run even
    // with parquet per-file overhead on the 10-row batches
    frag.upsert((0 until 50000).map(i => (s"k$i", i)).toDF("id", "v"))
    val baseName = new java.io.File(dir).list().filter(_.startsWith("t__frag_")).head
    // trickle of small batches, some updating base keys
    for (b <- 1 to 4)
      frag.upsert((0 until 10).map(i => (s"k${b * 7 + i}", 10000 * b + i)).toDF("id", "v"))
    val before = rowsOf(frag.read().get)
    assert(frag.fragmentCount() == 5)
    assert(frag.compactTiered())
    // the 4 small fragments folded into 1; the big base was NOT rewritten
    assert(frag.fragmentCount() == 2, frag.fragmentCount().toString)
    val live = new java.io.File(dir).list().filter(_.startsWith("t__frag_")).toSet
    assert(live.contains(baseName), "tiered compaction rewrote the base fragment")
    assert(live.size == 2, live.toString)
    assert(rowsOf(frag.read().get) == before)
    // single remaining run is not re-foldable into the base (base >> run)
    assert(!frag.compactTiered() || frag.fragmentCount() >= 1)
    // skipping still works across the folded layout
    assertSame(frag, col("v") >= 10000)
  }

  test("schema evolution across fragments: added columns null-fill, probes stay safe") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    frag.upsert(Seq(("a", 1), ("b", 2)).toDF("id", "v"))
    // a later batch adds a column: old fragments null-fill on read
    frag.upsert(Seq(("c", 3, "en"), ("a", 10, "de")).toDF("id", "v", "lang"))
    val all = rowsOf(frag.read().get)
    assert(all == Set("a|10|de", "b|2|null", "c|3|en"), all.toString)
    // predicate on the NEW column: the old fragment's zone map lacks it,
    // so it is conservatively kept, and its null-filled rows filter out
    assertSame(frag, col("lang") === "en")
    assertSame(frag, col("lang").isNull)
    // a batch MISSING a column also null-fills
    frag.upsert(Seq(("d", 4)).toDF("id", "v"))
    assert(rowsOf(frag.read().get) ==
      Set("a|10|de", "b|2|null", "c|3|en", "d|4|null"))
    // compaction settles the union schema
    frag.compact()
    assert(frag.read().get.columns.toSeq.sorted == Seq("id", "lang", "v"))
    assertSame(frag, col("v") > 3)
  }

  test("dotted column names survive stats collection and probing") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    frag.upsert(Seq(("a", 1), ("b", 2)).toDF("id", "dotted.name"))
    frag.upsert(Seq(("c", 30)).toDF("id", "dotted.name"))
    val pred = col("`dotted.name`") > 10
    val (res, rep) = frag.readWhereReport(pred)
    assert(rep.scanned == 1, rep.toString)
    assert(rowsOf(res.get) == Set("c|30"))
    assert(rowsOf(frag.read().get.filter(pred)) == Set("c|30"))
  }

  test("readerGrace compaction retires superseded dirs for one generation") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    frag.upsert(Seq(("a", 1), ("b", 2)).toDF("id", "v"))
    frag.upsert(Seq(("a", 10)).toDF("id", "v"))
    // a reader resolves the PRE-fold manifest (lazy plan over old dirs)
    val oldReader = frag.read().get
    frag.compact(readerGrace = true)
    // superseded dirs retained: the old reader can still finish
    assert(oldReader.collect().map(_.mkString("|")).toSet == Set("a|10", "b|2"))
    val dirs = new java.io.File(dir).list().count(_.startsWith("t__frag_"))
    assert(dirs == 3, s"grace must retain the 2 superseded dirs: $dirs")
    assert(frag.fragmentCount() == 1)
    assert(rowsOf(frag.read().get) == Set("a|10", "b|2"))
    // the NEXT fold (default mode) sweeps the retired generation
    frag.upsert(Seq(("c", 3)).toDF("id", "v"))
    frag.compact()
    val after = new java.io.File(dir).list().count(_.startsWith("t__frag_"))
    assert(after == 1, s"next fold must sweep the retired generation: $after")
    assert(rowsOf(frag.read().get) == Set("a|10", "b|2", "c|3"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "t.retired")))
  }

  test("backtick-bearing column names write, probe, and pad without parse errors") {
    val frag = new FragmentedTable(spark, freshDir(), "t", "id")
    frag.upsert(Seq(("a", 1), ("b", 2)).toDF("id", "tick`name"))
    frag.upsert(Seq(("c", 30, "x")).toDF("id", "tick`name", "extra"))
    // pad() must select the backtick-bearing column (doubled-backtick
    // quoting) in the pruned branches; equivalence is the contract
    assertSame(frag, col("extra") === "x")
    assertSame(frag, col("`tick``name`") > 10)
    assert(frag.read().get.count() == 3)
  }

  test("maybeCompact respects the read-amplification bound") {
    val dir = freshDir()
    val frag = new FragmentedTable(spark, dir, "t", "id")
    for (b <- 1 to 6)
      frag.upsert(Seq((s"k$b", b)).toDF("id", "v"))
    assert(!frag.maybeCompact(maxLive = 8))
    assert(frag.fragmentCount() == 6)
    assert(frag.maybeCompact(maxLive = 3))
    assert(frag.fragmentCount() <= 3, frag.fragmentCount().toString)
    assert(rowsOf(frag.read().get) ==
      (1 to 6).map(b => s"k$b|$b").toSet)
  }
}
