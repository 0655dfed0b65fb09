package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each probe row with the MOST RECENT build row at or
  * before its timestamp, per key — "which feed/config/tier state was in
  * effect when this event happened", the standard temporal-enrichment
  * shape a log pipeline needs and Spark has no native operator for.
  *
  * Spark-first plan (NOT a range join): tag both sides, union, then ONE
  * hash-shuffle + sort per key and a running `last(_, ignoreNulls)` window
  * carries each build row's payload forward to every later probe row. A
  * range-condition join would plan BroadcastNestedLoop/cartesian and
  * re-scan the build side per probe row; the union form is linear in
  * |probe| + |build| and sorts once. This is the classic
  * union-tag/carry-forward pattern (cf. Flink's temporal table join and
  * the sort-merge as-of joins in kdb/QuestDB — same semantics, shuffle
  * formulation).
  *
  * Semantics and determinism:
  *   - "at or before": a build row with ts EQUAL to the probe ts is
  *     visible (build sorts before probe at equal ts via the side tag).
  *   - Among build rows with the same (key, ts), the one with the
  *     largest `buildTie` wins — callers pass a unique column (an event
  *     id / sequence number) so the result is a pure function of the
  *     input multiset, never of partition order.
  *   - Probe rows with no earlier build row keep NULL payload (left
  *     join).
  *
  * The carried payload rides ONE struct through the window, so multi-
  * column payloads are atomic: all output columns come from the same
  * build row even when some of its fields are null (per-column
  * `last(ignoreNulls)` would stitch fields from different rows).
  *
  * 100 TB shape: one exchange on the key for |probe|+|build| rows, one
  * sort, zero joins. A hot key sorts inside one task — the same bound as
  * any per-entity window (pre-split hot entities upstream if one exceeds
  * a task). The output keeps the probe's partitioning, so a downstream
  * groupBy on the key adds no exchange.
  */
object AsofJoin {

  private val TsCol = "__graft_asof_ts"
  private val SideCol = "__graft_asof_side"
  private val TieCol = "__graft_asof_tie"
  private val PayloadCol = "__graft_asof_payload"

  /** NULL semantics follow the SQL equi-join: a build row with a NULL
    * key or NULL timestamp can match NOTHING (`k = k` and `ts <= ts` are
    * never true on NULL), so such rows are dropped from the build side;
    * a probe row with a NULL key or NULL timestamp matches nothing and
    * keeps a NULL payload. Without the explicit drop, Spark's window
    * PARTITION BY would group NULL keys TOGETHER and a NULL-ts build row
    * would sort nulls-first and leak into every frame — both silent
    * divergences from what the same query means in SQL.
    *
    * @param probe     rows to enrich; all its columns pass through
    * @param build     state/update rows supplying the payload
    * @param keys      equi-join key columns (present on both sides)
    * @param carry     build columns to carry onto matching probe rows;
    *                  must not collide with probe column names
    * @param probeTs   probe timestamp column
    * @param buildTs   build timestamp column
    * @param buildTie  unique-per-(key,ts) build column breaking equal-ts
    *                  ties (largest wins); required for determinism
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      carry: Seq[String], probeTs: String = "ts", buildTs: String = "ts",
      buildTie: String = "event_id"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(carry.nonEmpty, "asofJoin needs at least one carried column")
    val probeCols = probe.columns.toSeq
    val collisions = carry.filter(probeCols.contains)
    require(collisions.isEmpty,
      s"carried build columns collide with probe columns: " +
        collisions.mkString(", "))
    val internal = Seq(TsCol, SideCol, TieCol, PayloadCol)
    require(!probeCols.exists(internal.contains),
      s"probe uses reserved asofJoin column names: $internal")

    val payloadType = org.apache.spark.sql.types.StructType(
      carry.map(c => build.schema(build.schema.fieldIndex(c))))
    val tieType = build.schema(build.schema.fieldIndex(buildTie)).dataType

    val probeSide = probe
      .withColumn(TsCol, col(probeTs))
      .withColumn(SideCol, lit(1))
      .withColumn(TieCol, lit(null).cast(tieType))
      .withColumn(PayloadCol, lit(null).cast(payloadType))
      .select((keys ++ internal).map(col) ++
        probeCols.filterNot(keys.contains).map(col): _*)
    val buildSide = build
      .where(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(buildTs).isNotNull)
      .withColumn(TsCol, col(buildTs))
      .withColumn(SideCol, lit(0))
      .withColumn(TieCol, col(buildTie))
      .withColumn(PayloadCol, struct(carry.map(col): _*))
      .select((keys ++ internal).map(col) ++
        probeCols.filterNot(keys.contains)
          .map(c => lit(null).cast(probe.schema(
            probe.schema.fieldIndex(c)).dataType).as(c)): _*)

    // Build rows sort BEFORE probe rows at equal ts (side 0 < 1): "at or
    // before" includes ties. TieCol ascending puts the winning build row
    // last in the running frame, where last() picks it up.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(TsCol).asc, col(SideCol).asc, col(TieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    buildSide.unionByName(probeSide)
      .withColumn(PayloadCol, last(col(PayloadCol), ignoreNulls = true)
        .over(w))
      .where(col(SideCol) === 1)
      .select(probeCols.map(col) ++
        carry.map(c => col(s"$PayloadCol.$c").as(c)): _*)
  }
}
