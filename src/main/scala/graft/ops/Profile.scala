package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality contract check that gates every
  * ingest at scale: per-column row/null/distinct counts as ONE job,
  * emitted as one row PER COLUMN so downstream rules ("null fraction
  * jumped", "cardinality collapsed — upstream started sending a
  * constant") are plain filters over a tiny table, comparable across
  * daily runs with [[Rollups.mergePartials]]-style diffs.
  *
  * Exactness rules: counts and exact distinct counts only — no
  * approx_count_distinct (a sketch's estimate is engine- and
  * seed-dependent, so it can never be oracle-gated; the exact form is
  * one aggregate whose cost is the profiling job's price), and no
  * min/max-as-string (float-to-string rendering differs across
  * engines). NULL handling is ANSI: `n_distinct` counts non-null
  * distinct values; `n_nulls` counts them separately.
  *
  * Shape: one pass over the corpus. Spark plans the multi-column
  * distinct aggregate as a single Expand (×columns fan-out) feeding
  * one partial-aggregated exchange — columns× the scan cost in row
  * volume, but map-side combined and still ONE scan of the corpus,
  * vs the N-separate-jobs form reading the table N times. The final
  * per-column unpivot runs over a ONE-ROW frame.
  */
object Profile {

  /** One row per profiled column: (column, n_rows, n_nulls,
    * n_distinct). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val aggs = count(lit(1)).as("__graft_rows") +:
      cols.flatMap { c =>
        Seq(count(when(col(c).isNull, lit(1))).as(s"__graft_nn_$c"),
          countDistinct(col(c)).as(s"__graft_nd_$c"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via ONE explode over the one-row aggregate — a
    // union-of-selects would re-execute the corpus aggregate once per
    // column (the multi-consumer rule)
    wide.select(explode(array(cols.map { c =>
        struct(lit(c).as("column"),
          col("__graft_rows").as("n_rows"),
          col(s"__graft_nn_$c").as("n_nulls"),
          col(s"__graft_nd_$c").as("n_distinct"))
      }: _*)).as("__graft_s"))
      .select("__graft_s.*")
  }
}
