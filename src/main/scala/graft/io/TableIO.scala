package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Format-swap RECIPE (SURVEY.md §7.0): the north rule targets Iceberg
  * tables, but this runtime ships no Iceberg catalog jars — the engine
  * stores parquet-at-path with the same layout (partition columns = the
  * Iceberg bucket-partition analog). This trait documents the swap shape
  * (`format("iceberg")` + a catalog name in exactly two methods).
  *
  * Honesty note (round-5 review find): the pipeline does NOT route
  * through this seam — ScanJob/StreamingScan/Sinks/IntelStore call
  * `spark.read.parquet` / `df.write…parquet` directly because several
  * sinks need writer knobs this trait doesn't model (dynamic partition
  * overwrite, per-batch overwrite paths, coalesce). An Iceberg migration
  * therefore edits those call sites, using this impl as the template;
  * the read/write pairs to touch are the `parquet(` call sites in
  * pipeline/, streaming/, io/Sinks.scala and intel/IntelStore.scala.
  */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String, mode: SaveMode,
      partitionBy: Seq[String] = Nil): Unit
}

final class ParquetTableIO(baseDir: String) extends TableIO {
  private def path(table: String) = s"$baseDir/$table"
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))
  override def write(df: DataFrame, table: String, mode: SaveMode,
      partitionBy: Seq[String]): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(table))
  }
}
