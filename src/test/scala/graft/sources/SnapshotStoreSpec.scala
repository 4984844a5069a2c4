package graft.sources

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The snapshot store's SCALE invariants — the properties that make
  * merge/delete metadata-bounded on a 100 TB table: untouched files
  * carry by REFERENCE across versions, fully-deleted files drop
  * manifest-only, key-range scans list only overlapping files, and
  * vacuum reclaims exactly the unreferenced.
  */
class SnapshotStoreSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"snapstore_$tag").toString + "/t"

  private def table(root: String) = SnapshotStore.currentManifest(root)

  /** Back-date every regular file in `dir` past vacuum's orphan TTL —
    * crashed-commit orphans are OLD by definition; the sweep now
    * refuses young ones (they may be a concurrent writer's move→CAS
    * window).
    */
  private def ageFiles(root: String, sub: String): Unit = {
    val dir = java.nio.file.Paths.get(root, sub)
    if (java.nio.file.Files.isDirectory(dir)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(dir))(
        _.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .foreach(p => java.nio.file.Files.setLastModifiedTime(p,
            java.nio.file.attribute.FileTime.fromMillis(
              System.currentTimeMillis() - 7200000L))))
    }
  }

  test("merge rewrites only key-range-overlapping files; others carry by reference") {
    val root = freshRoot("merge")
    // 4 range-partitioned files over keys 0..399 (~100 keys each)
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "payload"),
      root, "k")
    val v0 = table(root)
    assert(v0.files.size == 4)
    // batch touching only the low range
    SnapshotStore.merge(spark,
      (0L until 50L).map(i => (i, "upd")).toDF("k", "payload"), root)
    val v1 = table(root)
    val carried = v0.files.map(_.path).toSet intersect v1.files.map(_.path).toSet
    val overlap0 = v0.files.filter(f => f.minKey <= 49 && f.maxKey >= 0)
    assert(carried == (v0.files.map(_.path).toSet -- overlap0.map(_.path)),
      s"exactly the non-overlapping files must carry: v0=${v0.files}, v1=${v1.files}")
    // values: updated low range, untouched elsewhere, both versions readable
    val cur = SnapshotStore.read(spark, root)
    assert(cur.filter(col("k") < 50 && col("payload") =!= "upd").count() == 0)
    assert(cur.count() == 400)
    assert(SnapshotStore.readAsOf(spark, root, 0)
      .filter(col("payload") === "upd").count() == 0)
  }

  test("merge hit detection is per-file, not batch-span: far-apart keys don't force a table rewrite") {
    val root = freshRoot("span")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "payload"),
      root, "k")
    val v0 = table(root)
    // one update in the lowest file + one brand-new far key: the
    // batch SPAN [5, 9999] covers every file, but only the file
    // actually containing key 5 may rewrite
    SnapshotStore.merge(spark,
      Seq((5L, "upd"), (9999L, "new")).toDF("k", "payload"), root)
    val v1 = table(root)
    val hitFiles = v0.files.filter(f => f.minKey <= 5 && 5 <= f.maxKey)
    assert(hitFiles.size == 1)
    val carried = v0.files.map(_.path).toSet intersect v1.files.map(_.path).toSet
    assert(carried == v0.files.map(_.path).toSet -- hitFiles.map(_.path),
      s"span-rewrite regression: v0=${v0.files}, v1=${v1.files}")
    assert(SnapshotStore.read(spark, root).count() == 401)
  }

  test("deleteRange drops fully-covered files manifest-only; boundary files rewrite") {
    val root = freshRoot("del")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, i * 2)).toDF("k", "v"), root, "k")
    val v0 = table(root)
    val full = v0.files.filter(f => 100 <= f.minKey && f.maxKey <= 349)
    assert(full.nonEmpty, s"fixture must contain fully-covered files: ${v0.files}")
    SnapshotStore.deleteRange(spark, root, 100L, 349L)
    val v1 = table(root)
    // fully-covered entries vanished from the manifest but their DATA
    // FILES still exist (no write happened; vacuum reclaims later)
    full.foreach { f =>
      assert(!v1.files.exists(_.path == f.path))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, f.path)),
        s"manifest-only drop must not touch ${f.path}")
    }
    val got = SnapshotStore.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == ((0L until 100L) ++ (350L until 400L)))
  }

  test("scanKeyRange lists only overlapping files") {
    val root = freshRoot("scan")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, i)).toDF("k", "v"), root, "k")
    val m = table(root)
    val hit = m.files.filter(f => f.minKey <= 120 && 80 <= f.maxKey).map(_.path).toSet
    assert(hit.size < m.files.size, "fixture: the range must skip something")
    val scan = SnapshotStore.scanKeyRange(spark, root, 80L, 120L)
    val read = scan.inputFiles.map(p => "data/" + p.split('/').last).toSet
    assert(read == hit, s"scan read $read, expected $hit")
    assert(scan.count() == 41)
  }

  test("vacuum drops old manifests and exactly the unreferenced data files") {
    val root = freshRoot("vac")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, i)).toDF("k", "v"), root, "k")
    SnapshotStore.merge(spark, Seq((5L, 99L)).toDF("k", "v"), root)
    val before = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(root, "data"))
        .iterator().asScala.size
    }
    val kept = table(root).files.map(_.path).toSet
    ageFiles(root, "data") // orphans must be OLD to collect
    val (mDropped, fDropped) = SnapshotStore.vacuum(root, keepLast = 1)
    assert(mDropped == 1)
    assert(fDropped == before - kept.size)
    assert(SnapshotStore.versions(root) == Seq(1L))
    assert(SnapshotStore.read(spark, root).count() == 100)
    // every surviving data file is referenced
    import scala.jdk.CollectionConverters._
    val left = java.nio.file.Files.list(java.nio.file.Paths.get(root, "data"))
      .iterator().asScala.map(p => "data/" + p.getFileName.toString).toSet
    assert(left == kept)
  }

  test("secondary-column zone maps: scanStatsRange skips files, survives merges") {
    val root = freshRoot("zone")
    // key k ascending, secondary v DESCENDING: key-range files get
    // tight v ranges too (v = 999 - k), so a v-range hits few files
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, 999L - i, s"p$i")).toDF("k", "v", "payload"),
      root, "k", statsCols = Seq("v"))
    val m = table(root)
    assert(m.statsCols == Vector("v"))
    assert(m.files.forall(_.stats.contains("v")))
    val hit = m.files.filter(f => f.stats("v") match {
      case (mn, mx) => mn <= 650 && 600 <= mx
    }).map(_.path).toSet
    assert(hit.size < m.files.size, "fixture: the v-range must skip files")
    val scan = SnapshotStore.scanStatsRange(spark, root, "v", 600L, 650L)
    val read = scan.inputFiles.map(p => "data/" + p.split('/').last).toSet
    assert(read == hit, s"zone scan read $read, expected $hit")
    assert(scan.count() == 51)
    // a merge maintains the declared stats on rewritten files
    SnapshotStore.merge(spark,
      Seq((5L, 2000L, "upd")).toDF("k", "v", "payload"), root)
    val m1 = table(root)
    assert(m1.statsCols == Vector("v") && m1.files.forall(_.stats.contains("v")))
    val withBig = m1.files.filter(f => f.stats("v")._2 >= 2000L)
    assert(withBig.size == 1, s"rewritten file must carry the new v max: ${m1.files}")
  }

  test("countAsOf answers from the manifest alone and matches the data") {
    val root = freshRoot("cnt")
    SnapshotStore.init(spark,
      (0L until 123L).map(i => (i, i)).toDF("k", "v"), root, "k")
    SnapshotStore.merge(spark,
      (200L until 210L).map(i => (i, i)).toDF("k", "v"), root)
    Seq(0L, 1L).foreach { v =>
      assert(SnapshotStore.countAsOf(root, v) ==
        SnapshotStore.readAsOf(spark, root, v).count())
    }
    assert(SnapshotStore.countAsOf(root, 1) == 133)
  }

  test("changes feed classifies insert/update/delete and drops unchanged keys") {
    val root = freshRoot("cdc")
    SnapshotStore.init(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root, "k")
    SnapshotStore.merge(spark,
      Seq((2L, "B"), (4L, "d"), (3L, "c")).toDF("k", "v"), root)
    val got = SnapshotStore.changes(spark, root, 0, 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // 3 re-merged with an IDENTICAL payload -> not a change
    assert(got == Set((2L, "update"), (4L, "insert")))
    SnapshotStore.deleteRange(spark, root, 1L, 1L)
    val del = SnapshotStore.changes(spark, root, 1, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(del == Set((1L, "delete")))
    // a merge-on-read delete commit is a first-class CDC version too:
    // the feed reports the vanished keys as deletes (readAsOf applies
    // delete files), so downstream indexes tailing the log stay exact
    SnapshotStore.deleteKeys(spark, Seq(2L).toDF("k"), root)
    val mor = SnapshotStore.changes(spark, root, 2, 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mor == Set((2L, "delete")))
  }

  test("randomized model equivalence: merge/delete/append sequences match an in-memory map") {
    // the store's whole visible contract replayed against a trivial
    // model: after ANY operation sequence, every version reads back
    // exactly the model's snapshot at that point, countAsOf matches,
    // and the change feed between consecutive versions matches the
    // model diff. Deterministic seed so failures replay.
    val rng = new scala.util.Random(17)
    val root = freshRoot("model")
    var model = (0L until 120L).map(i => i -> s"v$i").toMap
    var history = Vector(model)
    // blooms ON: every commit in the sequence builds per-file key
    // filters, so the lookup checks below also sweep the
    // no-false-negative property across arbitrary rewrite histories
    SnapshotStore.init(spark, model.toSeq.toDF("k", "v"), root, "k",
      bloomBits = 8192)
    for (step <- 1 to 14) {
      rng.nextInt(8) match {
        case 0 => // merge: updates + some new keys
          val batch = (1 to 20).map { _ =>
            val k = rng.nextLong() % 200L
            math.abs(k) -> s"s$step-${rng.nextInt(1000)}"
          }.toMap
          SnapshotStore.merge(spark, batch.toSeq.toDF("k", "v"), root)
          model = model ++ batch
          history :+= model
        case 1 => // range delete
          val lo = math.abs(rng.nextLong() % 180L)
          val hi = lo + rng.nextInt(40)
          SnapshotStore.deleteRange(spark, root, lo, hi)
          model = model.filterNot { case (k, _) => lo <= k && k <= hi }
          history :+= model
        case 2 => // append of brand-new keys
          val batch = (1 to 5).map(i =>
            (1000L * step + i) -> s"a$step-$i").toMap
          SnapshotStore.append(spark, batch.toSeq.toDF("k", "v"), root)
          model = model ++ batch
          history :+= model
        case 3 => // compaction: content-invariant new version (or a
          // no-op when fewer than two small files qualify)
          val before = SnapshotStore.currentManifest(root).version
          val after = SnapshotStore.compact(spark, root,
            smallRows = 30L, targetRows = 60L).version
          if (after != before) history :+= model
        case 4 => // merge-on-read key delete (no-op commit when every
          // key misses every live file range)
          val keys = (1 to 10).map(_ => math.abs(rng.nextLong() % 250L))
          val before = SnapshotStore.currentManifest(root).version
          SnapshotStore.deleteKeys(spark, keys.toDF("k"), root)
          model = model -- keys
          if (SnapshotStore.currentManifest(root).version != before)
            history :+= model
          else assert(model == history.last,
            "an uncommitted delete must not have hit the model")
        case 5 => // materialize outstanding deletes: content-invariant
          val before = SnapshotStore.currentManifest(root).version
          if (SnapshotStore.applyDeletes(spark, root).version != before)
            history :+= model
        case 6 => // rollback to a random committed version: the new
          // version's content is exactly that snapshot
          val t = rng.nextInt(history.size)
          SnapshotStore.rollback(root, t.toLong)
          model = history(t)
          history :+= model
        case 7 => // byte-sized compaction: content-invariant (or a
          // no-op when fewer than two byte-small files qualify)
          val before = SnapshotStore.currentManifest(root).version
          if (SnapshotStore.compactBytes(spark, root,
              smallBytes = 100000L, targetBytes = 1000000L)
              .version != before)
            history :+= model
      }
    }
    history.zipWithIndex.foreach { case (snap, v) =>
      val got = SnapshotStore.readAsOf(spark, root, v)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == snap, s"version $v diverged from the model")
      // metadata-only count answers unless that version has
      // unmaterialized merge-on-read deletes (it refuses then)
      val meta = try Some(SnapshotStore.countAsOf(root, v))
        catch { case _: IllegalArgumentException => None }
      meta.foreach(c => assert(c == snap.size))
    }
    // metadata-bounded range counts agree with the model on random ranges
    for (_ <- 1 to 8) {
      val lo = rng.nextLong() % 2000L
      val hi = lo + math.abs(rng.nextLong() % 500L)
      val want = model.keysIterator.count(k => lo <= k && k <= hi)
      assert(SnapshotStore.countKeyRange(spark, root, lo, hi)._1 == want,
        s"countKeyRange($lo, $hi) diverged")
    }
    // bloom-pruned point lookups agree with the model on random key
    // sets (present, absent and deleted keys mixed) — the
    // no-false-negative sweep across the whole rewrite history
    for (_ <- 1 to 8) {
      val probe = (1 to 15).map(_ => math.abs(rng.nextLong() % 2200L))
      val want = probe.distinct
        .flatMap(k => model.get(k).map(k -> _)).toMap
      val got = SnapshotStore.lookupKeys(spark, root, probe)._1
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"lookupKeys(${probe.mkString(",")}) diverged")
    }
    history.sliding(2).zipWithIndex.foreach { case (Seq(a, b), v) =>
      val want = (b.keySet -- a.keySet).map(_ -> "insert") ++
        (a.keySet -- b.keySet).map(_ -> "delete") ++
        (a.keySet & b.keySet).filter(k => a(k) != b(k)).map(_ -> "update")
      val got = SnapshotStore.changes(spark, root, v, v + 1)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(got == want, s"change feed $v->${v + 1} diverged")
    case _ => () }
  }

  test("changes feed is delta-sized: files carried verbatim between the versions are not read") {
    val root = freshRoot("cdcdelta")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k") // v0, 4 files
    SnapshotStore.merge(spark,
      Seq((5L, "upd"), (9999L, "new")).toDF("k", "payload"), root) // v1: 1 file touched
    val diff = SnapshotStore.changes(spark, root, 0L, 1L)
    val got = diff.collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got == Set(5L -> "update", 9999L -> "insert"))
    // the read set excludes every carried file: only the rewritten
    // file (v0 side) and its replacements (v1 side) are opened
    val read = diff.inputFiles.map(p => "data/" + p.split('/').last).toSet
    val m0files = SnapshotStore.readAsOf(spark, root, 0L).inputFiles
      .map(p => "data/" + p.split('/').last).toSet
    val m1 = SnapshotStore.currentManifest(root)
    val carriedPaths = m1.files.map(_.path).toSet intersect m0files
    assert(carriedPaths.nonEmpty, "fixture: some files must carry")
    assert((read intersect carriedPaths).isEmpty,
      s"carried files must not be read by the diff: $read vs $carriedPaths")
    assert(read.nonEmpty, "the touched files must be read")
    // a delete-file landing makes carried files readable again only
    // where it applies: deleteKeys then diff v1 -> v2 reads the hit
    // file but not untouched carried ones
    SnapshotStore.deleteKeys(spark, Seq(250L).toDF("k"), root) // v2
    val d2 = SnapshotStore.changes(spark, root, 1L, 2L)
    assert(d2.collect().map(r => r.getLong(0) -> r.getString(1)).toSet ==
      Set(250L -> "delete"))
  }

  test("per-file layout spec: zorder stamps, range default, merge rewrite evolves back, round-trips") {
    val root = freshRoot("specs")
    val rows = (0L until 4000L).map(i => (i, (i * 2654435761L) % 10000L))
    SnapshotStore.init(spark, rows.toDF("k", "v"), root, "k",
      filesPerCommit = 2, statsCols = Seq("v")) // 2 big range files
    SnapshotStore.append(spark,
      (100000L until 102000L).map(i => (i, i % 10000L)).toDF("k", "v"),
      root, filesPerCommit = 8) // 8 small range files
    assert(SnapshotStore.currentManifest(root).files.forall(_.layout.isEmpty),
      "normal commits are range-clustered: no layout stamp")
    SnapshotStore.compactZorder(spark, root, "v",
      smallRows = 1000L, targetRows = 500L)
    val m = SnapshotStore.currentManifest(root)
    val (z, r) = m.files.partition(_.layout.isDefined)
    assert(z.nonEmpty && z.forall(_.layout.contains("zorder(k,v)")))
    assert(r.size == 2 && r.forall(_.rows > 1500L),
      "the big files carry by reference with the default layout")
    // the spec survives a manifest re-parse (JSON round trip) — the
    // carried-verbatim machinery (segments, CDC skip) depends on
    // exact FileEntry equality across write/read
    assert(SnapshotStore.manifestAsOf(root, m.version).files.toSet ==
      m.files.toSet)
    // a merge hitting a z-ordered file rewrites it back to the
    // default range layout — layout evolves PER FILE, both ways
    val zf = z.head
    val probe = zf.minKey
    SnapshotStore.merge(spark, Seq((probe, -1L)).toDF("k", "v"), root)
    val m2 = SnapshotStore.currentManifest(root)
    assert(m2.files.exists(f => f.layout.isEmpty &&
      f.minKey <= probe && probe <= f.maxKey),
      "the rewritten file must carry the default layout again")
    assert(m2.files.exists(_.layout.isDefined),
      "untouched z files keep their spec")
    // rows never depend on layout
    assert(SnapshotStore.read(spark, root).count() == 6000)
  }

  test("changes feed across a schema-evolution boundary diffs in full") {
    // dropColumn is metadata-only: every file entry carries verbatim,
    // so the delta-sized skip's premise ("identical entry => identical
    // visible rows") is FALSE across it — a dropped non-null column
    // changes the payload hash of every row holding it. The skip must
    // disengage on a schema boundary or the feed comes back empty.
    val root = freshRoot("cdcschema")
    SnapshotStore.init(spark,
      Seq((1L, "a", "x"), (2L, "b", null), (3L, "c", "z"))
        .toDF("k", "keep", "dropme"), root, "k") // v0
    SnapshotStore.dropColumn(root, "dropme") // v1, zero files touched
    val got = SnapshotStore.changes(spark, root, 0L, 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    // rows where the dropped column was non-null lose a JSON field ->
    // update; the null row's payload encoding is unchanged (to_json
    // drops null fields) -> absent from the feed
    assert(got == Set(1L -> "update", 3L -> "update"))
    // the reverse direction (addColumn, all-null backfill) also
    // bypasses the skip — and the full diff correctly finds nothing
    SnapshotStore.addColumn(root, "extra", "STRING") // v2
    assert(SnapshotStore.changes(spark, root, 1L, 2L).isEmpty)
    // same-schema consecutive versions keep the delta-sized path:
    // a one-file merge after the evolution reads only touched files
    SnapshotStore.merge(spark, Seq((1L, "a2", null))
      .toDF("k", "keep", "extra"), root) // v3
    val d3 = SnapshotStore.changes(spark, root, 2L, 3L)
    assert(d3.collect().map(r => r.getLong(0) -> r.getString(1)).toSet ==
      Set(1L -> "update"))
  }

  test("changes feed: boundary-shifted and null-vs-sentinel payloads are real updates") {
    // a concat-based payload digest would hash ('ab','c') and ('a','bc')
    // identically, and a '<NULL>' sentinel would collide with the
    // literal string '<NULL>' — both must surface as updates
    val root = freshRoot("cdchash")
    SnapshotStore.init(spark,
      Seq((1L, "ab", "c"), (2L, "x", null)).toDF("k", "v1", "v2"),
      root, "k")
    SnapshotStore.merge(spark,
      Seq((1L, "a", "bc"), (2L, "x", "<NULL>")).toDF("k", "v1", "v2"), root)
    val got = SnapshotStore.changes(spark, root, 0, 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "update"), (2L, "update")))
  }

  test("commit refuses NULL keys with the store untouched") {
    // a null key is invisible to merge hit-detection and range
    // skipping, and nulls its file's min/max — the commit must fail
    // loudly BEFORE the manifest lands, with the data files rolled back
    val root = freshRoot("nullkey")
    SnapshotStore.init(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      root, "k")
    val before = table(root)
    val ex = intercept[IllegalArgumentException] {
      SnapshotStore.merge(spark,
        Seq((Some(3L), "c"), (None, "poison")).toDF("k", "v"), root)
    }
    assert(ex.getMessage.contains("NULL"))
    assert(table(root).version == before.version, "manifest must not land")
    assert(SnapshotStore.read(spark, root).count() == 2)
    // rolled-back data files must not linger as orphans
    val dataDir = java.nio.file.Paths.get(root, "data")
    val names = scala.util.Using.resource(
      java.nio.file.Files.list(dataDir))(s =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString).toSet)
    assert(names == before.files.map(_.path.stripPrefix("data/")).toSet)
    // a non-long-castable key fails loudly too (ANSI cast error at
    // merge hit-detection, before any file is written)
    val ex2 = intercept[Exception] {
      SnapshotStore.merge(spark,
        Seq(("oops", "c")).toDF("k", "v"), root)
    }
    assert(ex2.getMessage.contains("CAST_INVALID_INPUT"))
    assert(table(root).version == before.version)
  }

  test("compact merges small files, preserves rows/zone-maps/time-travel; big files carry") {
    val root = freshRoot("compact")
    SnapshotStore.init(spark,
      (0L until 400L).map(k => (k, 999L - k)).toDF("k", "v"), root, "k",
      filesPerCommit = 2, statsCols = Seq("v")) // 2 big files (200 rows)
    (0 until 4).foreach { i => // 8 small files of 5 rows
      SnapshotStore.append(spark,
        (0L until 5L).map(j => (1000L + 10 * i + j, j)).toDF("k", "v"),
        root, filesPerCommit = 2)
    }
    val before = table(root)
    assert(before.files.size == 10)
    val after = SnapshotStore.compact(spark, root,
      smallRows = 100L, targetRows = 10L)
    // 8 small files (20 rows) -> ceil(20/10) = 2; the 2 big ones carry
    assert(after.files.size == 4, after.files.map(_.rows))
    assert(before.files.filter(_.rows >= 100L).toSet
      .subsetOf(after.files.toSet), "big files must carry by reference")
    // row identity, metadata counts, and zone maps survive
    assert(SnapshotStore.read(spark, root).count() == 420)
    assert(SnapshotStore.countAsOf(root, after.version) == 420)
    assert(after.files.forall(f => f.stats.contains("v")))
    // every pre-compaction version still time-travels
    (0L to before.version).foreach { v =>
      assert(SnapshotStore.readAsOf(spark, root, v).count() ==
        SnapshotStore.countAsOf(root, v))
    }
    // content identical across the compaction boundary
    val a = SnapshotStore.readAsOf(spark, root, before.version)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SnapshotStore.readAsOf(spark, root, after.version)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // nothing to merge -> same manifest back, no empty commit
    assert(SnapshotStore.compact(spark, root, smallRows = 1L)
      .version == after.version)
  }

  test("countKeyRange answers fully-covered files from metadata; scans only boundaries") {
    val root = freshRoot("cntrange")
    SnapshotStore.init(spark,
      (0L until 400L).map(k => (k, s"v$k")).toDF("k", "v"), root, "k",
      filesPerCommit = 4) // 4 range-partitioned files
    val m = table(root)
    // a range spanning interior file boundaries: interior files must
    // answer from metadata (scanned < overlapping)
    val mid = m.files.sortBy(_.minKey)
    val (lo, hi) = (mid.head.maxKey, mid.last.minKey) // spans all 4
    val (cnt, overl, scanned) = SnapshotStore.countKeyRange(spark, root, lo, hi)
    assert(cnt == hi - lo + 1)
    assert(overl == 4 && scanned == 2,
      s"interior files must not be read (overlapping=$overl scanned=$scanned)")
    // whole table: zero files scanned, pure metadata
    val (all, _, s0) = SnapshotStore.countKeyRange(spark, root, Long.MinValue + 1, Long.MaxValue - 1)
    assert(all == 400 && s0 == 0)
    // empty range: zero without touching readFiles' nonEmpty guard
    assert(SnapshotStore.countKeyRange(spark, root, 10000L, 20000L)._1 == 0)
    // parity with the exact scan for an arbitrary range
    val want = SnapshotStore.read(spark, root)
      .filter(col("k").between(37L, 251L)).count()
    assert(SnapshotStore.countKeyRange(spark, root, 37L, 251L)._1 == want)
  }

  test("schema evolution: addColumn/dropColumn are metadata-only; old versions keep their schema") {
    val root = freshRoot("evolve")
    SnapshotStore.init(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root, "k") // v0
    val filesV0 = table(root).files.map(_.path).toSet
    SnapshotStore.addColumn(root, "tag", "STRING") // v1: pure metadata
    assert(table(root).files.map(_.path).toSet == filesV0,
      "addColumn must touch zero data files")
    // v1 reads the new column as NULL from pre-evolution files
    val v1 = SnapshotStore.readAsOf(spark, root, 1L)
    assert(v1.columns.toSeq == Seq("k", "v", "tag"))
    assert(v1.collect().forall(_.isNullAt(2)))
    // v0 still reads with ITS schema
    assert(SnapshotStore.readAsOf(spark, root, 0L).columns.toSeq ==
      Seq("k", "v"))
    // a merge can populate the new column; an old-shape batch (no
    // tag) still works, null-filled
    SnapshotStore.merge(spark,
      Seq((2L, "B", "hot"), (4L, "d", "new")).toDF("k", "v", "tag"), root) // v2
    SnapshotStore.merge(spark, Seq((5L, "e")).toDF("k", "v"), root) // v3
    val got = SnapshotStore.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2))))
      .toMap
    assert(got == Map(1L -> ("a", None), 2L -> ("B", Some("hot")),
      3L -> ("c", None), 4L -> ("d", Some("new")), 5L -> ("e", None)))
    // CDC across the evolution boundary: payload hash includes tag
    val ch = SnapshotStore.changes(spark, root, 1, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((2L, "update"), (4L, "insert")))
    // drop hides the column now; earlier versions still show it
    SnapshotStore.dropColumn(root, "tag") // v4
    assert(SnapshotStore.read(spark, root).columns.toSeq == Seq("k", "v"))
    assert(SnapshotStore.readAsOf(spark, root, 2L).columns.contains("tag"))
    // a typo'd batch column is refused, never silently dropped
    val ex = intercept[IllegalArgumentException] {
      SnapshotStore.merge(spark,
        Seq((6L, "f", "oops")).toDF("k", "v", "tagg"), root)
    }
    assert(ex.getMessage.contains("tagg"))
    // structural columns refuse to drop
    intercept[IllegalArgumentException] {
      SnapshotStore.dropColumn(root, "k")
    }
  }

  test("scanRanges: conjunctive pruning intersects key and zone-map skips; empty hit opens nothing") {
    val root = freshRoot("scanconj")
    // key k ascending, v DESCENDING (999-k): key pruning and v-zone
    // pruning select OPPOSITE ends of the file chain, so their
    // conjunction proves intersection, not just either filter
    SnapshotStore.init(spark,
      (0L until 400L).map(k => (k, 999L - k)).toDF("k", "v"), root, "k",
      filesPerCommit = 4, statsCols = Seq("v"))
    // key in first file only ∧ v range satisfied only by LAST file:
    // the conjunction provably hits nothing
    val empty = SnapshotStore.scanRanges(spark, root,
      Map("k" -> (0L, 50L), "v" -> (600L, 650L)))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("k", "v"))
    // both-satisfiable conjunction = exact relational result
    val got = SnapshotStore.scanRanges(spark, root,
      Map("k" -> (90L, 210L), "v" -> (850L, 880L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 400L).map(k => (k, 999L - k))
      .filter { case (k, v) => k >= 90 && k <= 210 && v >= 850 && v <= 880 }
      .toSet
    assert(got == want && got.nonEmpty)
    // inputFiles proves files are actually skipped
    val one = SnapshotStore.scanRanges(spark, root, Map("k" -> (0L, 50L)))
    assert(one.inputFiles.length == 1,
      s"key pruning should open 1 of 4 files, got ${one.inputFiles.length}")
  }

  test("write-audit-publish: staged commits are invisible; abort leaves zero orphans") {
    val root = freshRoot("wap")
    SnapshotStore.init(spark,
      (0L until 100L).map(k => (k, k * 2)).toDF("k", "v"), root, "k")
    def dataFiles() = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(root, "data")))(s =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString).toSet)
    val before = dataFiles()
    val st = SnapshotStore.stageMerge(spark,
      Seq((5L, -1L), (200L, 7L)).toDF("k", "v"), root)
    // staged: data files exist, but NO reader sees them
    assert(dataFiles().size > before.size)
    assert(SnapshotStore.versions(root) == Seq(0L))
    assert(SnapshotStore.read(spark, root).count() == 100)
    // the audit view IS the would-be table
    val staged = SnapshotStore.readStaged(spark, root, st)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(staged(5L) == -1L && staged(200L) == 7L && staged.size == 101)
    // abort: store bit-identical, zero orphans
    SnapshotStore.abort(root, st)
    assert(dataFiles() == before)
    assert(SnapshotStore.versions(root) == Seq(0L))
    // a passing batch publishes exactly one new version
    val st2 = SnapshotStore.stageMerge(spark,
      Seq((5L, 55L)).toDF("k", "v"), root)
    SnapshotStore.publish(root, st2)
    assert(SnapshotStore.versions(root) == Seq(0L, 1L))
    val now = SnapshotStore.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(now(5L) == 55L && now.size == 100)
  }

  test("vacuum inside an open audit window leaves the staged commit intact") {
    val root = freshRoot("wap_vacuum")
    SnapshotStore.init(spark,
      (0L until 100L).map(k => (k, k * 2)).toDF("k", "v"), root, "k")
    SnapshotStore.append(spark,
      (100L until 120L).map(k => (k, k * 2)).toDF("k", "v"), root)
    val st = SnapshotStore.stageMerge(spark,
      Seq((5L, -1L), (300L, 7L)).toDF("k", "v"), root)
    // the maintenance vacuum a same-writer scheduler might interleave:
    // drops v0 and sweeps orphans — but must NOT touch the staged files
    SnapshotStore.vacuum(root, keepLast = 1)
    // the audit still reads the staged bytes, and publish lands whole
    val staged = SnapshotStore.readStaged(spark, root, st)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(staged(5L) == -1L && staged(300L) == 7L && staged.size == 121)
    SnapshotStore.publish(root, st)
    val now = SnapshotStore.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(now(5L) == -1L && now(300L) == 7L && now.size == 121)
    // nothing left behind in the staging area
    val leftovers = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(root, "data")))(s =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString).filter(_.startsWith(".staged-"))
        .toSeq)
    assert(leftovers.isEmpty)
  }

  test("optimistic concurrency: append stages rebase, rewriting stages refuse, CAS never clobbers") {
    val root = freshRoot("occ")
    SnapshotStore.init(spark,
      (0L until 100L).map(k => (k, k * 2)).toDF("k", "v"), root, "k") // v0
    // writer A stages an append against v0 ...
    val a = SnapshotStore.stageAppend(spark,
      (200L until 220L).map(k => (k, k)).toDF("k", "v"), root)
    assert(a.appendOnly && a.baseVersion == 0L)
    // ... writer B commits first (v1) ...
    SnapshotStore.append(spark,
      (300L until 310L).map(k => (k, k)).toDF("k", "v"), root)
    // ... A's publish REBASES onto v1 → v2, both batches survive
    val m = SnapshotStore.publish(root, a)
    assert(m.version == 2L)
    val all = SnapshotStore.read(spark, root)
      .collect().map(r => r.getLong(0)).toSet
    assert(all.size == 130 && all(205L) && all(305L) && all(50L))

    // writer A stages a MERGE against v2 (rewrites files) ...
    val am = SnapshotStore.stageMerge(spark,
      Seq((50L, -1L)).toDF("k", "v"), root)
    assert(!am.appendOnly && am.baseVersion == 2L)
    // ... writer B commits v3 in between ...
    SnapshotStore.append(spark,
      (400L until 410L).map(k => (k, k)).toDF("k", "v"), root)
    // ... A's publish REFUSES (stale rewrite set), abort cleans up
    intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.publish(root, am)
    }
    SnapshotStore.abort(root, am)
    assert(SnapshotStore.read(spark, root)
      .filter(col("k") === 50L).collect().head.getLong(1) == 100L)
    // ... and a fresh stage against the new current lands
    SnapshotStore.publish(root, SnapshotStore.stageMerge(spark,
      Seq((50L, -1L)).toDF("k", "v"), root))
    assert(SnapshotStore.read(spark, root)
      .filter(col("k") === 50L).collect().head.getLong(1) == -1L)

    // two stages against the SAME base both land (second rebases)
    val s1 = SnapshotStore.stageAppend(spark,
      Seq((500L, 1L)).toDF("k", "v"), root)
    val s2 = SnapshotStore.stageAppend(spark,
      Seq((600L, 2L)).toDF("k", "v"), root)
    SnapshotStore.publish(root, s1)
    SnapshotStore.publish(root, s2)
    val fin = SnapshotStore.read(spark, root)
      .collect().map(r => r.getLong(0)).toSet
    assert(fin(500L) && fin(600L))
    // version history is strictly sequential, nothing clobbered
    assert(SnapshotStore.versions(root) == (0L to 6L))
  }

  test("vacuumed versions are refused with a clear error") {
    val root = freshRoot("vac_refuse")
    SnapshotStore.init(spark, Seq((1L, "a")).toDF("k", "v"), root, "k")
    SnapshotStore.append(spark, Seq((2L, "b")).toDF("k", "v"), root)
    SnapshotStore.append(spark, Seq((3L, "c")).toDF("k", "v"), root)
    SnapshotStore.vacuum(root, keepLast = 1)
    val ex = intercept[IllegalArgumentException] {
      SnapshotStore.readAsOf(spark, root, 0L)
    }
    assert(ex.getMessage.contains("vacuumed") &&
      ex.getMessage.contains("available: 2"))
    // the kept version still reads
    assert(SnapshotStore.readAsOf(spark, root, 2L).count() == 3)
  }

  test("append carries every current file and empty-batch merge is a no-op version") {
    val root = freshRoot("app")
    SnapshotStore.init(spark, Seq((1L, "a")).toDF("k", "v"), root, "k")
    val v0Files = table(root).files.map(_.path).toSet
    SnapshotStore.append(spark, Seq((2L, "b")).toDF("k", "v"), root)
    val v1 = table(root)
    assert(v0Files.subsetOf(v1.files.map(_.path).toSet))
    assert(SnapshotStore.read(spark, root).count() == 2)
    val before = v1.version
    SnapshotStore.merge(spark,
      Seq.empty[(Long, String)].toDF("k", "v"), root)
    assert(table(root).version == before, "empty batch must not commit")
  }

  test("deleteKeys is merge-on-read: zero data files rewritten, reads exclude, time travel intact") {
    val root = freshRoot("mor")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k")
    val v0 = table(root)
    SnapshotStore.deleteKeys(spark,
      Seq(5L, 17L, 100L, 101L, 9999L).toDF("k"), root) // 9999 absent
    val v1 = table(root)
    assert(v1.files.map(_.path) == v0.files.map(_.path),
      "deleteKeys must not touch data files")
    assert(v1.deletes.size == 1)
    assert(v1.deletes.head.rows == 4, "absent keys must be dropped at write")
    assert(v1.deletes.head.minKey == 5L && v1.deletes.head.maxKey == 101L)
    val got = SnapshotStore.read(spark, root).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 400L).toSet -- Set(5L, 17L, 100L, 101L))
    // time travel to before the delete still sees everything
    assert(SnapshotStore.readAsOf(spark, root, 0).count() == 400)
    // range scans and counts are delete-aware
    assert(SnapshotStore.scanKeyRange(spark, root, 0L, 20L).count() == 19)
    assert(SnapshotStore.countKeyRange(spark, root, 0L, 399L)._1 == 396)
    // metadata-only count refuses while deletes are outstanding
    assertThrows[IllegalArgumentException] {
      SnapshotStore.countAsOf(root, 1L)
    }
    // a delete of only-absent keys commits nothing
    val before = table(root).version
    SnapshotStore.deleteKeys(spark, Seq(55555L).toDF("k"), root)
    assert(table(root).version == before)
  }

  test("sequence numbers: a key re-inserted after its delete is visible; old versions unaffected") {
    val root = freshRoot("seq")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, "old")).toDF("k", "payload"), root, "k")
    SnapshotStore.deleteKeys(spark, Seq(7L).toDF("k"), root) // v1
    SnapshotStore.append(spark,
      Seq((7L, "back")).toDF("k", "payload"), root) // v2: new file, newer seq
    val cur = SnapshotStore.read(spark, root)
      .filter(col("k") === 7L).select("payload")
      .collect().map(_.getString(0)).toSeq
    assert(cur == Seq("back"),
      s"the re-inserted row must be visible and the old one deleted: $cur")
    assert(SnapshotStore.readAsOf(spark, root, 1L)
      .filter(col("k") === 7L).count() == 0)
  }

  test("rewrites are delete-aware: merge and deleteRange never resurrect deleted keys") {
    val root = freshRoot("res")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k")
    SnapshotStore.deleteKeys(spark, Seq(7L, 395L).toDF("k"), root)
    // merge touches the file holding key 7 (via neighbor key 8) — its
    // rewrite lands at a newer seq, so the delete must be APPLIED in
    // the rewrite or key 7 resurrects
    SnapshotStore.merge(spark, Seq((8L, "upd")).toDF("k", "payload"), root)
    assert(SnapshotStore.read(spark, root).filter(col("k") === 7L).count() == 0)
    // boundary rewrite of deleteRange: same hazard at the other end
    SnapshotStore.deleteRange(spark, root, 390L, 394L)
    val ks = SnapshotStore.read(spark, root).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(!ks.contains(395L), "deleteRange boundary rewrite resurrected a deleted key")
    assert(!ks.contains(7L) && !ks.contains(392L))
  }

  test("applyDeletes rewrites only affected files, prunes entries, restores metadata counts") {
    val root = freshRoot("mat")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, i * 2)).toDF("k", "v"), root, "k")
    val v0 = table(root)
    SnapshotStore.deleteKeys(spark, Seq(5L, 6L).toDF("k"), root)
    val affected = v0.files.filter(f => f.minKey <= 6L && 5L <= f.maxKey)
    assert(affected.size == 1, s"fixture: one affected file, got $affected")
    SnapshotStore.applyDeletes(spark, root)
    val v2 = table(root)
    assert(v2.deletes.isEmpty, "materialized deletes must prune from the manifest")
    val carried = v0.files.map(_.path).toSet intersect v2.files.map(_.path).toSet
    assert(carried == v0.files.map(_.path).toSet -- affected.map(_.path),
      "exactly the unaffected files must carry by reference")
    assert(SnapshotStore.countAsOf(root, v2.version) == 398)
    assert(SnapshotStore.read(spark, root).count() == 398)
    // idempotent: nothing outstanding → same manifest back
    assert(SnapshotStore.applyDeletes(spark, root).version == v2.version)
  }

  test("compact materializes deletes on the files it rewrites") {
    val root = freshRoot("cmor")
    SnapshotStore.init(spark,
      (0L until 300L).map(i => (i, i)).toDF("k", "v"), root, "k")
    SnapshotStore.deleteKeys(spark, Seq(10L, 20L, 30L).toDF("k"), root)
    val m = SnapshotStore.compact(spark, root,
      smallRows = 1000000L, targetRows = 1000000L) // everything rewrites
    assert(m.deletes.isEmpty)
    assert(SnapshotStore.countAsOf(root, m.version) == 297)
    assert(SnapshotStore.read(spark, root).count() == 297)
  }

  test("vacuum keeps referenced delete files and collects orphaned ones") {
    val root = freshRoot("vmor")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, i)).toDF("k", "v"), root, "k")
    SnapshotStore.deleteKeys(spark, Seq(3L).toDF("k"), root) // v1
    val delFile = table(root).deletes.head.path
    // keep v1: its delete file is referenced and must survive
    SnapshotStore.vacuum(root, keepLast = 1)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, delFile)))
    assert(SnapshotStore.read(spark, root).count() == 99)
    // materialize, then vacuum: the delete file is orphaned — but a
    // YOUNG orphan survives (it could be a concurrent writer's
    // move→CAS window); only an aged one collects
    SnapshotStore.applyDeletes(spark, root) // v2
    SnapshotStore.vacuum(root, keepLast = 1)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, delFile)),
      "a young orphaned delete file must survive the sweep")
    ageFiles(root, "deletes")
    SnapshotStore.vacuum(root, keepLast = 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, delFile)),
      "an aged unreferenced delete file must be vacuumed")
    assert(SnapshotStore.read(spark, root).count() == 99)
  }

  test("tags pin versions against vacuum; immutable; dropTag releases") {
    val root = freshRoot("tag")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, "a")).toDF("k", "payload"), root, "k") // v0
    SnapshotStore.tag(root, "train-rel.1", 0L)
    SnapshotStore.merge(spark,
      (0L until 100L).map(i => (i, "b")).toDF("k", "payload"), root) // v1
    SnapshotStore.merge(spark,
      (0L until 100L).map(i => (i, "c")).toDF("k", "payload"), root) // v2
    assertThrows[IllegalArgumentException] {
      SnapshotStore.tag(root, "train-rel.1", 2L) // immutable
    }
    SnapshotStore.vacuum(root, keepLast = 1)
    // v0 survives via the tag (manifest + data files); v1 is gone
    assert(SnapshotStore.versions(root) == Seq(0L, 2L))
    assert(SnapshotStore.readTag(spark, root, "train-rel.1")
      .filter(col("payload") === "a").count() == 100)
    assert(SnapshotStore.tags(root) == Map("train-rel.1" -> 0L))
    // releasing the tag makes v0 vacuum-eligible
    SnapshotStore.dropTag(root, "train-rel.1")
    SnapshotStore.vacuum(root, keepLast = 1)
    assert(SnapshotStore.versions(root) == Seq(2L))
    assert(SnapshotStore.read(spark, root)
      .filter(col("payload") === "c").count() == 100)
    assertThrows[IllegalArgumentException] {
      SnapshotStore.tagVersion(root, "train-rel.1")
    }
  }

  test("manifest segments: appends carry prior segments by reference, new segment is batch-sized") {
    val root = freshRoot("seg")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k")
    val v0 = table(root)
    assert(v0.segs.size == 1 && v0.segs.head.entries.size == v0.files.size)
    SnapshotStore.append(spark,
      (1000L until 1050L).map(i => (i, "app")).toDF("k", "payload"), root)
    val v1 = table(root)
    // v0's segment carries BY REFERENCE (same path, same entries) —
    // the append's metadata write was one batch-sized segment + the
    // version file, not a rewrite of the table's file list
    assert(v1.segs.map(_.path).contains(v0.segs.head.path),
      s"append must reuse the prior segment: v0=${v0.segs.map(_.path)} v1=${v1.segs.map(_.path)}")
    val fresh = v1.segs.filterNot(s => v0.segs.map(_.path).contains(s.path))
    assert(fresh.size == 1)
    assert(fresh.head.entries.map(_.path).toSet ==
      v1.files.map(_.path).toSet -- v0.files.map(_.path).toSet,
      "the new segment must hold exactly the batch's files")
    // a metadata-only commit (addColumn) reuses EVERY segment
    SnapshotStore.addColumn(root, "note", "STRING")
    assert(table(root).segs.map(_.path) == v1.segs.map(_.path))
  }

  test("manifest segments: merge rewrites only segments containing touched files") {
    val root = freshRoot("segm")
    SnapshotStore.init(spark,
      (0L until 200L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k")
    SnapshotStore.append(spark,
      (1000L until 1200L).map(i => (i, "a1")).toDF("k", "payload"), root)
    SnapshotStore.append(spark,
      (2000L until 2200L).map(i => (i, "a2")).toDF("k", "payload"), root)
    val v2 = table(root)
    assert(v2.segs.size == 3)
    // touch only the middle append's key range
    SnapshotStore.merge(spark,
      Seq((1050L, "upd")).toDF("k", "payload"), root)
    val v3 = table(root)
    val carried = v3.segs.map(_.path).toSet intersect v2.segs.map(_.path).toSet
    val affected = v2.segs.filter(_.entries.exists(f =>
      f.minKey <= 1050L && 1050L <= f.maxKey)).map(_.path).toSet
    assert(carried == v2.segs.map(_.path).toSet -- affected,
      s"exactly the unaffected segments must carry: affected=$affected v2=${v2.segs.map(_.path)} v3=${v3.segs.map(_.path)}")
    assert(SnapshotStore.read(spark, root).count() == 600)
  }

  test("manifest segments: vacuum collects segment files no kept version references") {
    val root = freshRoot("segv")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, i)).toDF("k", "v"), root, "k")
    val seg0 = table(root).segs.head.path
    SnapshotStore.merge(spark, // rewrites the only file-bearing segment
      (0L until 100L).map(i => (i, i + 1L)).toDF("k", "v"), root)
    assert(!table(root).segs.map(_.path).contains(seg0))
    // young unreferenced segments survive (tryWriteManifest writes
    // the segment BEFORE the version CAS — same in-flight window as
    // data files); aged ones collect
    SnapshotStore.vacuum(root, keepLast = 1)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "manifests", seg0)),
      "a young unreferenced segment must survive the sweep")
    ageFiles(root, "manifests")
    SnapshotStore.vacuum(root, keepLast = 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "manifests", seg0)),
      "an aged unreferenced segment must be vacuumed")
    table(root).segs.foreach(s => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "manifests", s.path))))
    assert(SnapshotStore.read(spark, root).count() == 100)
  }

  test("manifest segments: the writer collapses past the segment cap; reads stay exact") {
    val root = freshRoot("segc")
    SnapshotStore.init(spark, Seq((0L, 0L)).toDF("k", "v"), root, "k",
      filesPerCommit = 1)
    // one tiny append per commit: segments accumulate until the cap,
    // then one commit collapses the whole list into a single segment
    (1 to 66).foreach { i =>
      SnapshotStore.append(spark,
        Seq((i.toLong * 10L, i.toLong)).toDF("k", "v"), root,
        filesPerCommit = 1)
    }
    val m = table(root)
    assert(m.segs.size <= 65,
      s"segment count must stay capped, got ${m.segs.size}")
    assert(m.files.size == 67)
    assert(SnapshotStore.read(spark, root).count() == 67)
    assert(SnapshotStore.countKeyRange(spark, root, 0L, 660L)._1 == 67)
  }

  test("legacy inline-files manifests parse and migrate to segments on the next commit") {
    val root = freshRoot("legacy")
    SnapshotStore.init(spark,
      (0L until 50L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k")
    val m = table(root)
    // rewrite v0 in the PRE-SEGMENT format (inline files array)
    val inline = m.files.map(f =>
      s"""{"path":"${f.path}","minKey":${f.minKey},"maxKey":${f.maxKey},"rows":${f.rows},"seq":${f.seq}}""")
      .mkString("[", ",", "]")
    val p = java.nio.file.Paths.get(root, "manifests", "v0.json")
    java.nio.file.Files.delete(p)
    java.nio.file.Files.writeString(p,
      s"""{"version":0,"keyCol":"k","statsCols":[],"files":$inline}""")
    m.segs.foreach(s => // drop the segment files: the legacy parse
      java.nio.file.Files.deleteIfExists( // must not need them
        java.nio.file.Paths.get(root, "manifests", s.path)))
    val legacy = table(root)
    assert(legacy.segs.isEmpty)
    assert(legacy.files.map(_.path) == m.files.map(_.path))
    assert(SnapshotStore.read(spark, root).count() == 50)
    // the next commit re-homes every entry into segments
    SnapshotStore.append(spark, Seq((500L, "x")).toDF("k", "payload"), root)
    val v1 = table(root)
    assert(v1.segs.nonEmpty &&
      v1.segs.flatMap(_.entries).map(_.path).toSet ==
        v1.files.map(_.path).toSet)
    assert(SnapshotStore.read(spark, root).count() == 51)
  }

  test("vacuum age-gates commit scratch: live scratch survives, stale scratch clears") {
    val root = freshRoot("ttl")
    SnapshotStore.init(spark,
      (0L until 50L).map(i => (i, i)).toDF("k", "v"), root, "k")
    val tmp = java.nio.file.Paths.get(root, ".tmp")
    val live = tmp.resolve("live-writer")
    val stale = tmp.resolve("crashed-writer")
    java.nio.file.Files.createDirectories(live)
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.writeString(live.resolve("part.parquet"), "x")
    java.nio.file.Files.writeString(stale.resolve("part.parquet"), "x")
    java.nio.file.Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    SnapshotStore.vacuum(root, keepLast = 1)
    assert(java.nio.file.Files.exists(live),
      "a live writer's fresh scratch must survive a maintenance vacuum")
    assert(!java.nio.file.Files.exists(stale),
      "a crashed writer's stale scratch must be collected")
    assert(SnapshotStore.read(spark, root).count() == 50)
  }

  test("deleteKeys retries a lost CAS: racing erasure and ingest writers both land") {
    val root = freshRoot("dkrace")
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k")
    // two writers on one store: an erasure queue deleting key slices
    // and an ingester appending far batches — every commit must land
    // (deleteKeys self-retries its lost CASes; appends are committed
    // serially here, so they never lose one)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val eraser = Future {
      (0 until 8).foreach { i =>
        SnapshotStore.deleteKeys(spark,
          (i * 50L until i * 50L + 10L).toDF("k"), root, retries = 50)
      }
    }
    val ingester = Future {
      (0 until 8).foreach { i =>
        val st = SnapshotStore.stageAppend(spark,
          Seq((100000L + i, "app")).toDF("k", "payload"), root)
        SnapshotStore.publish(root, st) // rebases on conflict
      }
    }
    Await.result(eraser, 120.seconds)
    Await.result(ingester, 120.seconds)
    // every erasure and every append landed, exactly once each
    val got = SnapshotStore.read(spark, root).select("k")
      .collect().map(_.getLong(0)).toSet
    val deleted = (0 until 8).flatMap(i => i * 50L until i * 50L + 10L).toSet
    assert(got == ((0L until 400L).toSet -- deleted) ++
      (0 until 8).map(i => 100000L + i))
    // history stayed strictly sequential: 16 commits after v0
    assert(SnapshotStore.versions(root) == (0L to 16L))
  }

  test("compactZorder: row-identical rewrite, secondary envelopes tighten, big files carry") {
    val root = freshRoot("zord")
    // secondary v is DECORRELATED from the key, so a key-sorted
    // layout gives every file the full v range
    val rows = (0L until 4000L).map(i => (i, (i * 2654435761L) % 10000L))
    SnapshotStore.init(spark, rows.toDF("k", "v"), root, "k",
      filesPerCommit = 16, statsCols = Seq("v"))
    // one BIG file (2000 rows) that must carry by reference
    val bigRows = (10000L until 12000L).map(i => (i, (i * 48271L) % 10000L))
    SnapshotStore.append(spark, bigRows.toDF("k", "v"), root,
      filesPerCommit = 1)
    val v0 = table(root)
    val big = v0.files.maxBy(_.rows)
    assert(big.rows == 2000L)
    def hits(m: SnapshotStore.Manifest, lo: Long, hi: Long): Int =
      m.files.count(_.stats.get("v")
        .forall { case (mn, mx) => mn <= hi && lo <= mx })
    assert(hits(v0, 4000L, 4400L) >= 15,
      "fixture: a key-sorted layout must barely prune a v band")
    val m1 = SnapshotStore.compactZorder(spark, root, "v",
      smallRows = 1000L, targetRows = 250L)
    // the big file carried by reference; the rest re-clustered
    assert(m1.files.exists(_.path == big.path))
    assert(hits(m1, 4000L, 4400L) < hits(v0, 4000L, 4400L),
      "z-order must tighten v envelopes")
    // row-identical, and the pre-compaction version still time-travels
    val got = SnapshotStore.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (rows ++ bigRows).toSet)
    assert(SnapshotStore.readAsOf(spark, root, 0L).count() == 4000L)
    assert(SnapshotStore.countAsOf(root, m1.version) == 6000L)
    // zone maps recompute through the normal commit path
    assert(m1.files.forall(_.stats.contains("v")))
    // refuses a column without zone maps
    assertThrows[IllegalArgumentException] {
      SnapshotStore.compactZorder(spark, root, "k2")
    }
  }

  test("readIncremental returns exactly the appended rows; refuses non-append intervals") {
    val root = freshRoot("incr")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "payload"), root, "k")
    SnapshotStore.append(spark,
      (1000L until 1020L).map(i => (i, "a1")).toDF("k", "payload"), root) // v1
    SnapshotStore.append(spark,
      (2000L until 2010L).map(i => (i, "a2")).toDF("k", "payload"), root) // v2
    assert(SnapshotStore.readIncremental(spark, root, 0L, 2L)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      ((1000L until 1020L) ++ (2000L until 2010L)))
    assert(SnapshotStore.readIncremental(spark, root, 1L, 2L).count() == 10)
    // empty window: zero rows in the declared schema
    val empty = SnapshotStore.readIncremental(spark, root, 2L, 2L)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("k", "payload"))
    // schema evolution in the interval is fine (metadata-only)
    SnapshotStore.addColumn(root, "note", "STRING") // v3
    SnapshotStore.append(spark,
      Seq((3000L, "a3", "n")).toDF("k", "payload", "note"), root) // v4
    val evolved = SnapshotStore.readIncremental(spark, root, 2L, 4L)
    assert(evolved.columns.toSeq == Seq("k", "payload", "note"))
    assert(evolved.count() == 1)
    // a merge rewrite, a range delete and a merge-on-read delete each
    // break append-only lineage — refuse, never silently over-report
    SnapshotStore.merge(spark, Seq((5L, "upd", "x"))
      .toDF("k", "payload", "note"), root) // v5
    assertThrows[IllegalArgumentException] {
      SnapshotStore.readIncremental(spark, root, 4L, 5L)
    }
    SnapshotStore.deleteKeys(spark, Seq(7L).toDF("k"), root) // v6
    assertThrows[IllegalArgumentException] {
      SnapshotStore.readIncremental(spark, root, 5L, 6L)
    }
    SnapshotStore.deleteRange(spark, root, 0L, 3L) // v7
    assertThrows[IllegalArgumentException] {
      SnapshotStore.readIncremental(spark, root, 6L, 7L)
    }
    // append-only windows AFTER the rewrites still work
    SnapshotStore.append(spark,
      Seq((4000L, "a4", null.asInstanceOf[String]))
        .toDF("k", "payload", "note"), root) // v8
    assert(SnapshotStore.readIncremental(spark, root, 7L, 8L).count() == 1)
  }

  test("rollback: metadata-only restore — old content current, history append-only, zero data I/O") {
    val root = freshRoot("rb")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, "a")).toDF("k", "payload"), root, "k") // v0
    SnapshotStore.merge(spark,
      (0L until 100L by 10L).map(i => (i, "b")).toDF("k", "payload"), root) // v1
    val v1Files = table(root).files.map(_.path).toSet
    SnapshotStore.deleteRange(spark, root, 50L, 99L) // v2: the accident
    SnapshotStore.deleteKeys(spark, Seq(1L).toDF("k"), root) // v3: MOR on top
    def dataCount = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.list(
        java.nio.file.Paths.get(root, "data")))(_.iterator().asScala.size)
    }
    val filesBefore = dataCount
    val m = SnapshotStore.rollback(root, 1L) // v4 == v1's content
    assert(m.version == 4L)
    assert(dataCount == filesBefore, "rollback must write zero data files")
    assert(table(root).files.map(_.path).toSet == v1Files,
      "rolled-back manifest must reference exactly the target's files")
    val cur = SnapshotStore.read(spark, root)
    assert(cur.count() == 100)
    assert(cur.filter(col("payload") === "b").count() == 10)
    assert(cur.filter(col("k") === 1L).count() == 1, "the MOR delete rolled back")
    // history stays append-only: the bad versions still time-travel
    assert(SnapshotStore.versions(root) == (0L to 4L))
    assert(SnapshotStore.readAsOf(spark, root, 3L).count() == 49)
    // refuses a forward "rollback"
    assertThrows[IllegalArgumentException] {
      SnapshotStore.rollback(root, 9L)
    }
  }

  test("appendOnce: redeliveries are no-ops, racing retries get one winner, retention bounds the window") {
    val root = freshRoot("once")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, i)).toDF("k", "v"), root, "k") // v0
    val b0 = (1000L until 1050L).map(i => (i, i)).toDF("k", "v")
    SnapshotStore.appendOnce(spark, b0, root, "ing", 0L) // v1
    assert(SnapshotStore.read(spark, root).count() == 150)
    // immediate redelivery: a no-op, no new version
    val m = SnapshotStore.appendOnce(spark, b0, root, "ing", 0L)
    assert(m.version == 1L)
    assert(SnapshotStore.read(spark, root).count() == 150)
    // unrelated commits interleave; the old batch still won't re-land
    SnapshotStore.merge(spark, Seq((5L, 99L)).toDF("k", "v"), root) // v2
    SnapshotStore.appendOnce(spark, b0, root, "ing", 0L)
    assert(SnapshotStore.versions(root) == (0L to 2L))
    assert(SnapshotStore.read(spark, root).count() == 150)
    // a different app's batch 0 is a DIFFERENT batch
    SnapshotStore.appendOnce(spark,
      Seq((5000L, 1L)).toDF("k", "v"), root, "other", 0L) // v3
    assert(SnapshotStore.read(spark, root).count() == 151)
    // racing retries of one batch: exactly one lands
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val b7 = (2000L until 2050L).map(i => (i, i)).toDF("k", "v")
    val rs = (1 to 2).map(_ => Future {
      SnapshotStore.appendOnce(spark, b7, root, "ing", 7L)
    })
    rs.foreach(Await.result(_, 120.seconds))
    assert(SnapshotStore.read(spark, root).count() == 201,
      "racing retries of one batch must land exactly once")
    // the idempotence WINDOW is retention: vacuum dropping the
    // applying version re-opens it — the documented Delta-style caveat
    ageFiles(root, "data")
    SnapshotStore.vacuum(root, keepLast = 1)
    SnapshotStore.appendOnce(spark, b0, root, "ing", 0L)
    assert(SnapshotStore.read(spark, root).count() == 251,
      "past retention, a replayed batch re-appends (documented window)")
  }

  test("byte-sized compaction: small-BYTE files collapse, wide files carry, row-identical") {
    val root = freshRoot("cbytes")
    // WIDE rows: ~1 KB of incompressible payload each, few files
    def blob(i: Long) = {
      val r = new scala.util.Random(i)
      r.alphanumeric.take(1000).mkString
    }
    val wide = (0L until 200L).map(i => (i, blob(i)))
    SnapshotStore.init(spark, wide.toDF("k", "payload"), root, "k",
      filesPerCommit = 2)
    // NARROW rows: short payloads, many tiny-byte files — but MORE
    // rows per file than the wide ones, so a row-count compaction
    // would pick the WRONG set
    val narrow = (10000L until 10400L).map(i => (i, s"n$i"))
    SnapshotStore.append(spark, narrow.toDF("k", "payload"), root,
      filesPerCommit = 4)
    val m0 = table(root)
    assert(m0.files.forall(_.bytes > 0), "commits must record file bytes")
    val wideFiles = m0.files.filter(_.minKey < 10000L)
    val narrowFiles = m0.files.filter(_.minKey >= 10000L)
    val narrowMax = narrowFiles.map(_.bytes).max
    assert(narrowMax < wideFiles.map(_.bytes).min,
      "fixture: byte skew must be real")
    assert(narrowFiles.map(_.rows).min > wideFiles.map(_.rows).max / 2,
      "fixture: rows must NOT separate the sets the way bytes do")
    val m1 = SnapshotStore.compactBytes(spark, root,
      smallBytes = narrowMax + 1, targetBytes = Long.MaxValue / 4)
    // wide files carried by reference; the tiny-byte files collapsed
    assert(wideFiles.map(_.path).toSet.subsetOf(m1.files.map(_.path).toSet))
    assert(m1.files.size < m0.files.size)
    val got = SnapshotStore.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (wide ++ narrow).toSet)
    // byte stats recompute on the rewritten files
    assert(m1.files.forall(_.bytes > 0))
    // and a second pass is a no-op (nothing small left but one file)
    assert(SnapshotStore.compactBytes(spark, root,
      smallBytes = narrowMax + 1, targetBytes = Long.MaxValue / 4)
      .version == m1.version)
  }

  test("per-file key blooms: gap probes skip files, no false negatives across rewrites") {
    val root = freshRoot("bloom")
    // SPARSE keys (×1000): tight range envelopes still CONTAIN every
    // absent key that falls in a gap — only the bloom can prune those
    SnapshotStore.init(spark,
      (0L until 400L).map(i => (i * 1000L, s"v$i")).toDF("k", "payload"),
      root, "k", filesPerCommit = 4, bloomBits = 1 << 14)
    val m0 = table(root)
    assert(m0.bloomBits == (1 << 14))
    assert(m0.files.forall(_.bloom.isDefined))
    // present keys: all found, exactly
    val present = Seq(5000L, 123000L, 399000L)
    val (hits, _, _) = SnapshotStore.lookupKeys(spark, root, present)
    assert(hits.select("k").collect().map(_.getLong(0)).toSet ==
      present.toSet)
    // absent-but-in-range keys: range overlap is real, bloom prunes
    val absent = Seq(5500L, 123500L, 250500L)
    val (miss, ro, read) = SnapshotStore.lookupKeys(spark, root, absent)
    assert(miss.count() == 0)
    assert(ro > 0 && read < ro,
      s"bloom must prune gap probes: read $read of $ro range-overlapping")
    // blooms keep building through a merge rewrite; the new key is
    // then found (no false negative after the rewrite)
    SnapshotStore.merge(spark, Seq((5500L, "new")).toDF("k", "payload"), root)
    assert(table(root).files.forall(_.bloom.isDefined))
    assert(SnapshotStore.lookupKeys(spark, root, Seq(5500L))._1.count() == 1)
    // merge-on-read deletes apply to lookups
    SnapshotStore.deleteKeys(spark, Seq(5000L).toDF("k"), root)
    assert(SnapshotStore.lookupKeys(spark, root, Seq(5000L))._1.count() == 0)
    // blooms survive the manifest round trip bit-exactly (parse ==
    // written), and compaction rebuilds them on the rewritten files
    SnapshotStore.compact(spark, root, smallRows = 1000000L,
      targetRows = 1000000L)
    val m1 = table(root)
    assert(m1.bloomBits == (1 << 14) && m1.files.forall(_.bloom.isDefined))
    assert(SnapshotStore.lookupKeys(spark, root, Seq(399000L))._1.count() == 1)
    // a bloom-less table: lookups read every range-overlapping file
    val root2 = freshRoot("nobloom")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i * 10L, i)).toDF("k", "v"), root2, "k")
    val (d2, o2, r2) = SnapshotStore.lookupKeys(spark, root2, Seq(50L, 55L))
    assert(d2.count() == 1 && r2 == o2)
  }

  test("rollback refuses loudly when the target's files were already collected") {
    val root = freshRoot("rbgone")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, "a")).toDF("k", "payload"), root, "k") // v0
    val v0File = table(root).files.head.path
    SnapshotStore.merge(spark, // v1 rewrites every v0 file
      (0L until 100L).map(i => (i, "b")).toDF("k", "payload"), root)
    // retention collects v0's now-unreferenced file mid-overlap
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, v0File))
    val ex = intercept[IllegalStateException] {
      SnapshotStore.rollback(root, 0L)
    }
    assert(ex.getMessage.contains("no longer exist"))
    // the refusal left no new version behind
    assert(SnapshotStore.versions(root) == Seq(0L, 1L))
    assert(SnapshotStore.read(spark, root)
      .filter(col("payload") === "b").count() == 100)
  }

  test("vacuum inside another writer's move→CAS publish window leaves the commit intact") {
    val root = freshRoot("midpub")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, i)).toDF("k", "v"), root, "k") // v0
    val st = SnapshotStore.stageAppend(spark,
      Seq((100000L, 1L)).toDF("k", "v"), root)
    // replicate publish's FIRST half by hand: hop the staged files
    // into data/ — exactly the state a cross-process writer is in
    // the instant before its manifest CAS
    val movedNames = st.newFiles.map { f =>
      val name = f.split('/').last
      java.nio.file.Files.move(
        java.nio.file.Paths.get(root).resolve(f),
        java.nio.file.Paths.get(root, "data", name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      name
    }
    // a maintenance vacuum fires inside the window: the just-moved
    // files are unreferenced by every manifest, but YOUNG — the
    // age-gated orphan sweep must not eat them
    SnapshotStore.vacuum(root, keepLast = 1)
    movedNames.foreach(n => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "data", n)),
      "an in-flight commit's just-moved files must survive the sweep"))
    // SECOND half: the CAS lands (final paths, so publish skips the
    // already-done moves) — the commit must arrive intact
    val finalFiles = st.manifest.files.map(f =>
      if (f.path.startsWith("data/.staged-"))
        f.copy(path = "data/" + f.path.split('/').last)
      else f)
    SnapshotStore.publish(root, SnapshotStore.Staged(
      st.manifest.copy(files = finalFiles),
      movedNames.map("data/" + _), st.baseVersion, st.appendOnly))
    val cur = SnapshotStore.read(spark, root)
    assert(cur.count() == 101)
    assert(cur.filter(col("k") === 100000L).count() == 1)
  }

  test("tagging a deleted-state version pins it: readTag applies its deletes forever") {
    val root = freshRoot("tagmor")
    SnapshotStore.init(spark,
      (0L until 100L).map(i => (i, i)).toDF("k", "v"), root, "k")
    SnapshotStore.deleteKeys(spark, Seq(1L, 2L).toDF("k"), root) // v1
    SnapshotStore.tag(root, "cut", 1L)
    SnapshotStore.applyDeletes(spark, root) // v2
    SnapshotStore.append(spark, Seq((500L, 500L)).toDF("k", "v"), root) // v3
    SnapshotStore.vacuum(root, keepLast = 1)
    val tagged = SnapshotStore.readTag(spark, root, "cut")
    assert(tagged.count() == 98)
    assert(tagged.filter(col("k").isin(1L, 2L)).count() == 0)
  }
}
