package graft.ops

import graft.io.ParquetTableIO
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Staging seam for multi-consumer intermediate frames (round 6,
  * VERDICT r05 item 3).
  *
  * The heavy ops (SetJoin, Curation, the minhash pair generator) stage
  * frames that several downstream consumers re-read. In this sandbox the
  * right mechanism is `localCheckpoint` — one in-memory materialization,
  * released deterministically — but localCheckpoint pins blocks in
  * executor storage and is NOT fault-tolerant: on a preemptible cluster a
  * lost executor loses blocks whose lineage was truncated, killing the
  * job. At 100 TB the staged token/band tables must be durable.
  *
  * This object makes the mechanism selectable PER RUN without touching
  * any operator signature: by default `stage` is `localCheckpoint`;
  * setting `-Dgraft.staging.dir=/warehouse/tmp` (or env
  * `GRAFT_STAGING_DIR`) reroutes every staged frame through a real
  * parquet table write + read-back via [[graft.io.ParquetTableIO]] — the
  * "materialize to a table" shape a production pipeline runs, durable
  * across executor loss, at the cost of one table write per staged frame
  * (cost delta on the bench corpus recorded in OPTIMIZATION_r06.md).
  *
  * Lifecycle: [[release]] frees a LOCAL stage's blocks immediately (the
  * previous `Checkpoints.releaseLocal` behavior). Durable stages hold no
  * executor memory, so release is a no-op for them; their files live
  * under `<dir>/<pid>-<seq>-<name>` and are reclaimed by deleting the
  * staging directory after the run (they are per-process-unique, so
  * concurrent runs sharing a dir never collide).
  */
private[graft] object Staging {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def durableDir: Option[String] =
    sys.props.get("graft.staging.dir")
      .orElse(sys.env.get("GRAFT_STAGING_DIR")).filter(_.nonEmpty)

  /** Materialize `df` once for multi-consumer reuse: localCheckpoint by
    * default, durable parquet round-trip when a staging dir is set.
    * `name` only labels the durable table (diagnosability); uniqueness
    * comes from pid + a process-wide sequence.
    */
  def stage(df: DataFrame, name: String): DataFrame = durableDir match {
    case None => df.localCheckpoint()
    case Some(dir) =>
      val io = new ParquetTableIO(dir)
      val table =
        s"${ProcessHandle.current().pid()}-${seq.incrementAndGet()}-$name"
      io.write(df, table, SaveMode.ErrorIfExists)
      io.read(df.sparkSession, table)
  }

  /** Release a staged frame: frees a local stage's blocks; no-op for a
    * durable stage (no executor memory held; files reclaimed with the
    * staging dir).
    */
  def release(df: DataFrame): Unit = Checkpoints.releaseLocal(df)

  /** Deep variant of [[release]] — every local checkpoint reachable under
    * `df` (see [[Checkpoints.releaseLocalDeep]]).
    */
  def releaseDeep(df: DataFrame): Unit = Checkpoints.releaseLocalDeep(df)
}
