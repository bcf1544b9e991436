package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC MERGE: apply a change log (upserts + delete tombstones) to a base
  * table — the operator that turns an event/CDC stream into a serving
  * table, and the batch kernel behind [[graft.streaming.UpsertSink]].
  *
  * Scale shape: `latestChanges` is ONE keyed aggregation (`max_by` over a
  * struct ordering key — partial aggregation map-side, no window sort, no
  * per-key row_number over the full log), and `applyLog` is ONE join on the
  * key. At 100 TB the change log is usually much larger than its key space,
  * so the map-side combine is the difference between shuffling the log and
  * shuffling one row per touched key; the join side is broadcast-able
  * whenever the compacted key set is small and AQE handles it otherwise.
  *
  * Semantics (classic latest-op-wins):
  *  - per key, the change with the greatest `ordCols` tuple wins;
  *  - a winning op equal to `deleteOp` removes the key from the result;
  *  - keys only in `base` pass through with null payload columns;
  *  - keys only in the log (op != deleteOp) surface with null base columns
  *    (the insert path of MERGE).
  * `ordCols` must be a unique total order per key (e.g. (ts, change_id)) or
  * latest-wins is ill-defined; ties are the caller's bug, not resolved here.
  */
object CdcApply {

  /** One winning change per key: `payloadCols` (+ the op) of the row with
    * the greatest `ordCols` tuple. Output columns: keyCol, opCol,
    * payloadCols. */
  def latestChanges(changes: DataFrame, keyCol: String, ordCols: Seq[String],
                    opCol: String, payloadCols: Seq[String]): DataFrame = {
    val ord = struct(ordCols.map(col): _*)
    // distinct: the op column may itself be a payload column (q201 uses
    // event_type as both the op and a carried value).
    val outCols = (opCol +: payloadCols).distinct
    val payload = struct(outCols.map(col): _*)
    changes.groupBy(col(keyCol))
      .agg(max_by(payload, ord).as("_win"))
      .select(col(keyCol) +: outCols.map(c => col(s"_win.$c")): _*)
  }

  /** Apply the compacted log to `base`. Base columns must include
    * `baseKeyCol`; the result carries all base columns plus `payloadCols`
    * (never the op or ord columns). */
  def applyLog(base: DataFrame, changes: DataFrame,
               baseKeyCol: String, changeKeyCol: String,
               ordCols: Seq[String], opCol: String, deleteOp: String,
               payloadCols: Seq[String]): DataFrame = {
    val latest = latestChanges(changes, changeKeyCol, ordCols, opCol, payloadCols)
    val joined = base.join(latest,
      base(baseKeyCol) === latest(changeKeyCol), "full_outer")
    val untouched = latest(changeKeyCol).isNull
    val kept = joined.filter(untouched || latest(opCol) =!= lit(deleteOp))
    // Inserts (key only in the log) have a null base key: surface the
    // change key there so the result's key column is total.
    val keyOut = coalesce(base(baseKeyCol), latest(changeKeyCol)).as(baseKeyCol)
    val baseCols: Seq[Column] = base.columns.toSeq.map {
      case k if k == baseKeyCol => keyOut
      case c => base(c)
    }
    kept.select(baseCols ++ payloadCols.map(latest(_)): _*)
  }
}
