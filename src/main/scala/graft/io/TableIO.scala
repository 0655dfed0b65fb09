package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin table seam (SURVEY.md §7.0): the north rule targets Iceberg tables,
  * but this runtime ships no Iceberg catalog jars — the default impl is
  * parquet-at-path with the same layout (partition columns = the Iceberg
  * bucket-partition analog). Swapping to Iceberg is `format("iceberg")` +
  * a catalog name; every pipeline call goes through this seam so parity and
  * scaling evidence are format-independent.
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
