package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * right.ts <= left.ts (inclusive; or < when `inclusive = false`) per
  * key — the time-series join (trade↔latest-quote,
  * event↔latest-dimension-version) that plain SQL can only express as a
  * correlated subquery or a range join + per-row argmax, both of which
  * explode at scale.
  *
  * Implementation is the union–tag–carry layout (the kdb `aj` / Flink
  * temporal-join plan, built from plain DataFrame ops): tag both
  * inputs, union them, and run ONE window per key ordered by
  * (ts, side), carrying the last non-null right payload forward with
  * `last(_, ignoreNulls = true)`. With right rows sorted BEFORE left
  * rows at an equal timestamp, a left row sees same-instant right rows
  * — exactly the inclusive (>=) semantics DuckDB's ASOF JOIN
  * implements, so the operator is DuckDB-oracle-checkable; flipping the
  * tie order gives the strict (>) form.
  *
  * Scale posture (100 TB): ONE hash shuffle on the key columns, then a
  * linear scan per partition — no range-join candidate explosion
  * (a naive l.ts >= r.ts range join materializes O(|L|·|R|/keys)
  * candidate rows before the per-row argmax; this materializes none).
  * Window state is `last` over scalar payload columns: O(1) memory per
  * row streamed, any partition size spills safely. A single key whose
  * full history outgrows one task is the remaining skew case; the
  * standard refinement is bucketing time into coarse epochs and
  * carrying each epoch's closing payload into the next (two bounded
  * passes) — unnecessary at this corpus' key cardinality.
  */
object AsofJoin {

  /** As-of join of `left` to `right` on equal `keyCols` and
    * right.`rightTsCol` <= left.`leftTsCol` (or < when
    * `inclusive = false`).
    *
    * @param payload     right-side columns to carry, as
    *                    (rightCol → outName); the right timestamp itself
    *                    can be carried (e.g. "ts" → "q_ts").
    * @param tieBreakCol right-side column whose LARGEST value wins when
    *                    several right rows share one (key, ts) — makes
    *                    the pick deterministic instead of
    *                    arrival-ordered.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String,
      payload: Seq[(String, String)], tieBreakCol: String,
      inclusive: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // key columns ride along once (real on both sides); the rest of the
    // left row is null-padded on the right side
    val carryCols = leftCols.filterNot(keyCols.contains)
    val outNames = payload.map(_._2)
    // side ordering encodes the boundary rule: inclusive → right rows
    // (side 0) sort first at an equal ts and a left row sees them;
    // strict → left rows (side -1) sort first and same-instant right
    // rows are invisible to them.
    val leftSide = if (inclusive) 1 else -1

    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTsCol).as("__asof_ts"), lit(0).as("__asof_side"),
          col(tieBreakCol).cast("long").as("__asof_tie")) ++
        carryCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map { case (rc, out) => col(rc).as(out) }: _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTsCol).as("__asof_ts"), lit(leftSide).as("__asof_side"),
          lit(null).cast("long").as("__asof_tie")) ++
        carryCols.map(col) ++
        payload.map { case (rc, out) =>
          lit(null).cast(right.schema(rc).dataType).as(out) }: _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc,
        col("__asof_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .select(
        (Seq(col("__asof_side")) ++ leftCols.map(col) ++
          outNames.map(n => last(col(n), ignoreNulls = true).over(w).as(n))): _*)

    carried.filter(col("__asof_side") === leftSide)
      .select((leftCols ++ outNames).map(col): _*)
  }
}
