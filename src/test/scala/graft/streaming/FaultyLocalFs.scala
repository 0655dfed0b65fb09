package graft.streaming

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

/** A local filesystem whose MUTATING operations (create/rename/delete/
  * mkdirs) fail after a configurable budget is exhausted — the standard
  * Hadoop-test pattern for proving a multi-step filesystem protocol
  * crash-safe at EVERY step, not just the steps someone thought to
  * hand-simulate. Registered under the `faulty:` scheme; reads are never
  * faulted (a crashed process loses writes, not the data already on disk).
  *
  * The budget is global (static) because Hadoop instantiates and caches
  * filesystem instances internally; tests serialize access.
  */
class FaultyLocalFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("faulty:///")

  private def spend(): Unit = {
    if (FaultyLocalFs.budget.getAndDecrement() <= 0)
      throw new IOException("FaultyLocalFs: injected fault")
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    spend()
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    spend(); super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    spend(); super.delete(p, recursive)
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    spend(); super.mkdirs(f, permission)
  }
}

object FaultyLocalFs {
  /** Remaining mutating operations before injected failure; set very high
    * to disable faulting. */
  val budget: AtomicInteger = new AtomicInteger(Int.MaxValue)

  def disarm(): Unit = budget.set(Int.MaxValue)
  def armAfter(ops: Int): Unit = budget.set(ops)
}
