package graft.streaming

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class SinkCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def awaitOrFail(q: org.apache.spark.sql.streaming.StreamingQuery,
      timeoutMs: Long = 180000L): Unit = {
    val done = q.awaitTermination(timeoutMs)
    if (!done) {
      q.stop()
      fail(s"streaming query did not terminate within ${timeoutMs}ms")
    }
  }

  private def doc(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  private def ids(dedupedDir: String): Seq[Long] =
    spark.read.parquet(dedupedDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  private def batchDirs(dedupedDir: String): Seq[String] = {
    val f = new java.io.File(dedupedDir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.getName.startsWith("batch="))
      .map(_.getName).sorted.toSeq
  }

  test("compact folds committed batches, spares the newest as replay " +
    "guard, and preserves the row set") {
    val inDir = Files.createTempDirectory("compact-in").toString
    val outDir = Files.createTempDirectory("compact-out").toString
    val deduped = s"$outDir/deduped"
    // three drains -> three batch directories
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      doc(1, "alpha one") + "\n" + doc(2, "beta two") + "\n")
    awaitOrFail(StreamingDedup.start(spark, inDir, outDir))
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      doc(3, "gamma three") + "\n")
    awaitOrFail(StreamingDedup.start(spark, inDir, outDir))
    Files.writeString(java.nio.file.Paths.get(inDir, "b3.json"),
      doc(4, "delta four") + "\n")
    awaitOrFail(StreamingDedup.start(spark, inDir, outDir))
    assert(batchDirs(deduped) == Seq("batch=0", "batch=1", "batch=2"))
    val before = ids(deduped)
    assert(before == Seq(1L, 2L, 3L, 4L))

    val stats = SinkCompaction.compact(spark, deduped)
    assert(stats.batchesCompacted == 2)
    assert(stats.rowsCompacted == 3L) // docs 1,2 (batch 0) + 3 (batch 1)
    assert(!stats.recovered)
    assert(batchDirs(deduped) == Seq("batch=0", "batch=2"),
      s"newest batch must survive as replay guard: ${batchDirs(deduped)}")
    assert(ids(deduped) == before, "compaction must preserve the row set")
    // no protocol residue
    assert(!new java.io.File(s"$deduped/_compact_tmp").exists())
    assert(!new java.io.File(s"$deduped/_compact_trash").exists())

    // idempotent: only one eligible source remains after the guard
    val again = SinkCompaction.compact(spark, deduped)
    assert(again.batchesCompacted == 0)
    assert(ids(deduped) == before)

    // the stream keeps going after compaction: new batch ids continue
    Files.writeString(java.nio.file.Paths.get(inDir, "b4.json"),
      doc(5, "epsilon five") + "\n")
    awaitOrFail(StreamingDedup.start(spark, inDir, outDir))
    assert(ids(deduped) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("compact preserves a partitioned batch layout (round-5 find: " +
    "StreamingScan sinks partition inside batch dirs)") {
    import spark.implicits._
    val root = Files.createTempDirectory("compact-part").toString +
      "/matched_stream"
    def write(batch: Long, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "indicator_type").write
        .mode("overwrite").partitionBy("indicator_type")
        .parquet(s"$root/batch=$batch")
    write(0, Seq((1L, "ipv4"), (2L, "domain")))
    write(1, Seq((3L, "ipv4")))
    write(2, Seq((4L, "email"))) // newest: replay guard, untouched
    def rows(): Set[(Long, String)] = spark.read.parquet(root)
      .select("doc_id", "indicator_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val before = rows()
    val stats = SinkCompaction.compact(spark, root)
    assert(stats.batchesCompacted == 2)
    assert(stats.rowsCompacted == 3L)
    // the recursive listing must SEE the nested files (the direct-child
    // form read 0 files / 0 bytes and sized everything into one file)
    assert(stats.filesBefore > 0)
    // the compacted dir must reproduce the k=v chain, or partition
    // discovery on the sink root dies with conflicting structures
    val compacted = new java.io.File(s"$root/batch=0")
    assert(compacted.listFiles().exists(f =>
      f.isDirectory && f.getName.startsWith("indicator_type=")),
      s"compacted dir lost the partition layout: ${compacted.list().toSeq}")
    assert(rows() == before, "row set (incl. partition values) preserved")
  }

  test("recovery completes a compaction interrupted mid-swap (manifest " +
    "committed, one source moved, one not)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact-rec").toString + "/deduped"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.parquet(s"$dir/batch=0")
    Seq((3L, "c")).toDF("doc_id", "text").write.parquet(s"$dir/batch=1")
    Seq((4L, "d")).toDF("doc_id", "text").write.parquet(s"$dir/batch=2")
    // hand-build the crash state: tmp fully written + manifest committed,
    // batch=1 already in trash, batch=0 still in place, target not yet
    // installed — the worst interruption point
    spark.read.parquet(s"$dir/batch=0", s"$dir/batch=1")
      .coalesce(1).write.parquet(s"$dir/_compact_tmp")
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/_compact_tmp/_MANIFEST"),
      "batch=0\nbatch=0\nbatch=1")
    new java.io.File(s"$dir/_compact_trash").mkdirs()
    assert(new java.io.File(s"$dir/batch=1")
      .renameTo(new java.io.File(s"$dir/_compact_trash/batch=1")))

    val stats = SinkCompaction.compact(spark, dir)
    assert(stats.recovered)
    assert(batchDirs(dir) == Seq("batch=0", "batch=2"))
    assert(ids(dir) == Seq(1L, 2L, 3L, 4L),
      "recovery must neither lose nor duplicate rows")
    assert(!new java.io.File(s"$dir/_compact_tmp").exists())
    assert(!new java.io.File(s"$dir/_compact_trash").exists())
    // the installed target contains no manifest residue visible to Spark
    assert(!new java.io.File(s"$dir/batch=0/_MANIFEST").exists())
  }

  test("recovery discards an uncommitted tmp (no manifest) and a " +
    "leftover trash from a completed swap") {
    import spark.implicits._
    val dir = Files.createTempDirectory("compact-rec2").toString + "/deduped"
    Seq((1L, "a")).toDF("doc_id", "text").write.parquet(s"$dir/batch=0")
    // crash mid-write: tmp exists, no manifest -> sources authoritative
    new java.io.File(s"$dir/_compact_tmp").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/_compact_tmp/part-junk.parquet"), "x")
    assert(SinkCompaction.recover(spark, dir))
    assert(!new java.io.File(s"$dir/_compact_tmp").exists())
    assert(ids(dir) == Seq(1L))
    // crash after install, before cleanup: trash exists, tmp gone, and the
    // installed target still carries its manifest (it rides the rename)
    new java.io.File(s"$dir/_compact_trash/batch=9").mkdirs()
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/batch=0/_MANIFEST"), "batch=0\nbatch=0")
    assert(SinkCompaction.recover(spark, dir))
    assert(!new java.io.File(s"$dir/_compact_trash").exists())
    assert(!new java.io.File(s"$dir/batch=0/_MANIFEST").exists(),
      "recovery must sweep installed-manifest residue")
    assert(ids(dir) == Seq(1L))
    // stale trash AND an uncommitted tmp together (completed swap whose
    // trash-delete crashed, then a new compact crashed mid-write): one
    // recover call must clear both
    new java.io.File(s"$dir/_compact_trash/batch=9").mkdirs()
    new java.io.File(s"$dir/_compact_tmp").mkdirs()
    assert(SinkCompaction.recover(spark, dir))
    assert(!new java.io.File(s"$dir/_compact_tmp").exists())
    assert(!new java.io.File(s"$dir/_compact_trash").exists())
    // clean state: nothing to recover
    assert(!SinkCompaction.recover(spark, dir))
  }

  test("crash-injection sweep: compact killed after EVERY Nth mutating fs " +
    "op, then recovered — rows never lost, never duplicated") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.faulty.impl", classOf[FaultyLocalFs].getName)
    // template layout built once, copied per sweep step (no Spark re-write)
    val template = Files.createTempDirectory("compact-crash-tpl").toString
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$template/batch=0")
    Seq((3L, "c")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$template/batch=1")
    Seq((4L, "d")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$template/batch=2")
    val expected = Seq(1L, 2L, 3L, 4L)

    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      Files.walk(from).forEach { p =>
        val dst = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else Files.copy(p, dst)
      }
    }

    var n = 0
    var cleanRun = false
    val maxOps = 200 // far above the protocol's op count — the sweep must
    // reach an unfaulted run long before this (else the loop is broken)
    while (!cleanRun && n < maxOps) {
      val dir = Files.createTempDirectory(s"compact-crash-$n")
      Files.delete(dir)
      copyTree(java.nio.file.Paths.get(template), dir)
      var crashed = false
      FaultyLocalFs.armAfter(n)
      try {
        val stats = SinkCompaction.compact(spark, s"faulty://$dir")
        cleanRun = stats.batchesCompacted == 2
      } catch { case _: Throwable => crashed = true }
      finally FaultyLocalFs.disarm()
      assert(crashed || cleanRun, s"op budget $n: neither crashed nor compacted")
      // recover over the plain scheme (recovery itself ran unfaulted in
      // the happy-path tests; here it faces every possible crash state)
      SinkCompaction.recover(spark, dir.toString)
      val got = spark.read.parquet(dir.toString).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected,
        s"crash after $n mutating ops lost/duplicated rows: got $got")
      assert(!new java.io.File(s"$dir/_compact_tmp").exists(),
        s"tmp residue after recovery (budget $n)")
      assert(!new java.io.File(s"$dir/_compact_trash").exists(),
        s"trash residue after recovery (budget $n)")
      n += 1
    }
    assert(cleanRun, s"sweep never reached an unfaulted compact in $maxOps ops")
    // the sweep covered every crash point: 0..n-2 faulted, n-1 ran clean
    assert(n >= 5, s"suspiciously few mutating ops in the protocol: $n")
  }
}
