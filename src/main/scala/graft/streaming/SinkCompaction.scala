package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Maintenance compaction for streaming `batch=N` parquet sink layouts
  * (StreamingDedup `deduped/`, StreamingScan `conv_state_final/`, …).
  *
  * A long-running foreachBatch sink accumulates one directory per
  * micro-batch — after a month of 10-second triggers that is ~260k
  * directories of tiny files, which kills both listing time and scan
  * parallelism on the consumer side. `compact` folds the committed batch
  * directories into one right-sized directory, preserving the row set
  * exactly.
  *
  * MUST run while the producing query is stopped (the usual maintenance
  * window); the newest batch directory is additionally left untouched as a
  * replay guard — after a crash between a sink write and its checkpoint
  * commit, Spark re-runs only that LAST batch id, whose idempotent
  * overwrite must land in its own directory, not a compacted one.
  *
  * Crash-recoverable swap protocol (object-store friendly — only renames
  * and deletes after a fully committed temp write):
  *  1. write compacted data to `<dir>/_compact_tmp` (hidden from Spark's
  *     partition discovery), then a `_MANIFEST` naming the target
  *     directory and the source directories — written to a dotted temp
  *     name and renamed into place, so a torn write can never parse as a
  *     committed manifest; the rename is the commit point;
  *  2. move each source directory into `<dir>/_compact_trash/`;
  *  3. rename `_compact_tmp` to `batch=<smallest compacted id>` — the
  *     manifest travels WITH the rename (a tmp stripped of its manifest
  *     before install would be indistinguishable from a mid-write crash
  *     and get discarded while the sources sit in the trash);
  *  4. delete the trash, then the installed `_MANIFEST` (cosmetic — Spark
  *     ignores underscore-prefixed files either way).
  * A crash anywhere leaves a state `recover()` finishes deterministically:
  * tmp without manifest is discarded (data still in the sources); tmp with
  * manifest re-drives steps 2-4 (the temp write already committed); trash
  * without tmp is deleted and manifest residue swept (swap already
  * completed). Rows are therefore never lost and never duplicated.
  *
  * After compaction the partition-discovery `batch` value of compacted
  * rows is the smallest compacted id — consumers treating `batch` as an
  * arrival-order hint keep monotonicity; the row contents are unchanged.
  */
object SinkCompaction {

  final case class CompactStats(batchesCompacted: Int, rowsCompacted: Long,
      filesBefore: Int, filesAfter: Int, recovered: Boolean)

  private val TmpName = "_compact_tmp"
  private val TrashName = "_compact_trash"
  private val ManifestName = "_MANIFEST"

  /** Compact all committed batch directories under `dir` except the newest
    * (replay guard) into one directory sized at ~`targetFileBytes` per
    * file. No-op (after any pending recovery) unless at least two
    * directories are eligible.
    */
  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactStats = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val recovered = recover(fs, root)
    val sources = committedBatches(fs, root).dropRight(1) // replay guard
    if (sources.length < 2)
      return CompactStats(0, 0L, 0, 0, recovered)

    val srcPaths = sources.map(_._2)
    // RECURSIVE listing: StreamingScan's matched/routed sinks partition
    // INSIDE each batch=N dir (indicator_type=… / sink=…/bucket=…), so a
    // direct-child listing would see 0 files and 0 bytes (round-5 review
    // find: sizing collapsed multi-GB partitioned sinks into one file)
    val srcFiles = srcPaths.map(dataFiles(fs, _))
    val filesBefore = srcFiles.map(_.length).sum
    val totalBytes = srcFiles.flatten.map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt

    val tmp = new Path(root, TmpName)
    fs.delete(tmp, true)
    // preserve the sink's partition layout: the compacted batch dir must
    // carry the SAME k=v directory chain as the uncompacted ones, or
    // partition discovery on the sink root fails with "Conflicting
    // directory structures" and the whole sink becomes unreadable
    val partCols = partitionKeys(fs, srcPaths.head)
    // one read PER source dir, unioned: a single multi-path read of
    // partitioned batch dirs trips Spark's partition inference
    // (CONFLICTING_DIRECTORY_STRUCTURES — the roots themselves look like
    // one partitioned table); per-dir discovery then union keeps the
    // partition values as ordinary columns
    val df = srcPaths.map(p => spark.read.parquet(p.toString))
      .reduce(_.unionByName(_))
    // coalesce, not repartition: compaction is a read+write, no shuffle.
    // The row count for the stats comes from the WRITTEN output's parquet
    // footers (metadata-only) — a separate df.count() action would read
    // every source file a second time, doubling the maintenance window.
    // With partition columns, nFiles bounds the TASK count; each task
    // writes one file per partition value it holds, so file sizing is
    // approximate for partitioned sinks (bounded by tasks x partitions).
    val writer = df.coalesce(nFiles).write.mode(SaveMode.Overwrite)
    (if (partCols.isEmpty) writer else writer.partitionBy(partCols: _*))
      .parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()
    val target = sources.head._1 // smallest compacted batch id keeps its name
    writeManifest(fs, tmp, target, sources.map(_._1))

    swap(fs, root, tmp, target, sources.map(_._1))
    val filesAfter = dataFiles(fs, new Path(root, target)).length
    CompactStats(sources.length, rows, filesBefore, filesAfter, recovered)
  }

  /** Finish (or discard) an interrupted compaction. Returns true if there
    * was anything to recover. Also called from `compact`.
    */
  def recover(spark: SparkSession, dir: String): Boolean = {
    val root = new Path(dir)
    recover(root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def recover(fs: FileSystem, root: Path): Boolean = {
    val tmp = new Path(root, TmpName)
    val trash = new Path(root, TrashName)
    val manifest = new Path(tmp, ManifestName)
    if (fs.exists(tmp) && fs.exists(manifest)) {
      // temp write committed: re-drive the swap (idempotent — moves of
      // already-trashed sources are skipped; swap deletes the trash)
      val (target, srcs) = readManifest(fs, manifest)
      swap(fs, root, tmp, target, srcs)
      return true
    }
    var acted = false
    if (fs.exists(tmp)) {
      // crashed mid-write: sources are intact, the temp data is garbage
      fs.delete(tmp, true)
      acted = true
    }
    // a stale trash can coexist with an UNcommitted tmp (completed swap
    // whose trash-delete crashed, then a new compact crashed mid-write) —
    // handle it independently, not as an else-branch
    if (fs.exists(trash)) {
      // swap completed, cleanup didn't: the trash holds superseded copies;
      // the installed target may still carry its (harmless, Spark-hidden)
      // manifest — sweep it to restore the clean-state invariant
      fs.delete(trash, true)
      committedBatches(fs, root).foreach { case (_, p) =>
        fs.delete(new Path(p, ManifestName), false)
      }
      acted = true
    }
    acted
  }

  /** Steps 2-4 of the protocol; idempotent, callable from recovery. */
  private def swap(fs: FileSystem, root: Path, tmp: Path, target: String,
      sources: Seq[String]): Unit = {
    val trash = new Path(root, TrashName)
    fs.mkdirs(trash)
    sources.foreach { name =>
      val src = new Path(root, name)
      if (fs.exists(src)) {
        fs.delete(new Path(trash, name), true) // re-driven move after crash
        require(fs.rename(src, new Path(trash, name)),
          s"compaction: failed to move $src to trash")
      }
    }
    val targetPath = new Path(root, target)
    if (fs.exists(tmp)) {
      // the manifest rides along: stripping it first would open a crash
      // window where recover() reads tmp-without-manifest as a mid-write
      // crash and discards the only copy of the compacted rows
      require(fs.rename(tmp, targetPath),
        s"compaction: failed to install $targetPath")
    }
    fs.delete(trash, true)
    fs.delete(new Path(targetPath, ManifestName), false)
  }

  /** Committed (`_SUCCESS`-marked) `batch=N` children, sorted by id. */
  private def committedBatches(fs: FileSystem, root: Path): Seq[(String, Path)] = {
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith("batch=")) None
        else name.stripPrefix("batch=").toLongOption.map(id => (id, name, st.getPath))
      }
      .filter { case (_, _, p) => fs.exists(new Path(p, "_SUCCESS")) }
      .sortBy(_._1)
      .map { case (_, name, p) => (name, p) }
  }

  /** All data files under `dir`, RECURSIVELY — batch dirs of partitioned
    * sinks nest their files under k=v subdirectories. Plain listStatus
    * recursion (not FileSystem.listFiles): the block-location enrichment
    * of listLocatedStatus is useless here and not all FS shims implement
    * it faithfully.
    */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
    def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (st.isDirectory) walk(st.getPath) else out += st
      }
    }
    walk(dir)
    out.result()
  }

  /** The k=v partition-directory chain under a batch dir (empty for flat
    * sinks) — the layout the compacted replacement must reproduce.
    */
  private def partitionKeys(fs: FileSystem, dir: Path): Seq[String] = {
    val keys = Seq.newBuilder[String]
    var cur = dir
    var done = false
    while (!done) {
      val kv = fs.listStatus(cur).find { st =>
        val n = st.getPath.getName
        st.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
          n.contains('=')
      }
      kv match {
        case Some(st) =>
          keys += st.getPath.getName.takeWhile(_ != '=')
          cur = st.getPath
        case None => done = true
      }
    }
    keys.result()
  }

  private def writeManifest(fs: FileSystem, tmp: Path, target: String,
      sources: Seq[String]): Unit = {
    // dotted temp name + rename: a crash mid-write must leave NO file at
    // the manifest path — a torn manifest would be read back as a
    // committed one with a truncated source list (duplicated rows) or a
    // garbage target name (rows hidden from consumers)
    val inProgress = new Path(tmp, "." + ManifestName + ".inprogress")
    val out = fs.create(inProgress, true)
    try out.write((target +: sources).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(inProgress, new Path(tmp, ManifestName)),
      "compaction: failed to commit manifest")
  }

  private def readManifest(fs: FileSystem, manifest: Path): (String, Seq[String]) = {
    val in = fs.open(manifest)
    val text =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toString("UTF-8")
      } finally in.close()
    val lines = text.split("\n").toSeq
    (lines.head, lines.tail)
  }
}
