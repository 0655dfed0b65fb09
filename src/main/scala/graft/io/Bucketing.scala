package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — the PRE-SHUFFLED join layout: pay the hash
  * exchange ONCE at write time, then every subsequent join or
  * aggregation on the bucket key runs with ZERO exchange, forever.
  * This is the storage-side answer to the same problem [[graft.ops
  * .SkewJoin]] attacks at query time: a 100 TB fact table that joins
  * its dimension (or itself) on the same key every day should not
  * re-shuffle 100 TB every day.
  *
  * Mechanics: `bucketBy(n, key)` hashes each row to one of n bucket
  * files per write task; the catalog records the bucket spec, and the
  * scan reports `HashPartitioning(key, n)` as its output partitioning,
  * so Catalyst sees the join's clustering requirement as already
  * satisfied on both sides — the SortMergeJoin plans with NO Exchange
  * (pinned in BucketingSpec). `sortBy` additionally pre-orders rows
  * within each bucket file so even the join-side Sort drops out of
  * the plan's cost at read time.
  *
  * Bucket metadata only exists for CATALOG tables — `saveAsTable`, not
  * `parquet(path)`; a raw path write silently loses the spec and every
  * downstream join shuffles again (the reason this helper exists
  * instead of three inline lines). Both join sides must use the SAME
  * bucket count on the SAME key; mismatched counts fall back to a
  * shuffle of the smaller side.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) parquet
    * catalog table, overwriting any previous version. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    // The in-memory catalog dies with the session but the managed
    // table's warehouse DIRECTORY does not: a fresh session's
    // saveAsTable then fails with LOCATION_ALREADY_EXISTS even in
    // overwrite mode. Drop any catalog entry, then clear the orphaned
    // location the catalog no longer knows about.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Inner-join two co-bucketed tables on their bucket key. `merge`
    * hint keeps the demonstration honest (a broadcast would also be
    * exchange-free, but for a different reason); the plan contains no
    * Exchange when both tables are bucketed `nBuckets` on `keys`. */
  def bucketedJoin(spark: SparkSession, tableA: String, tableB: String,
      keys: Seq[String]): DataFrame =
    spark.table(tableA).hint("merge")
      .join(spark.table(tableB).hint("merge"), keys)
}
