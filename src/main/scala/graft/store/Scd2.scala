package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension MERGE — the warehouse versioning
  * pattern the reference's Redshift consumers run around every
  * dimension table: history rows are immutable, the current row per
  * key carries `valid_to IS NULL`, and applying a batch of updates
  * closes changed rows and opens new versions in one pass.
  *
  * Contract (all stated, all deterministic):
  *  - `dim` rows: key, tracked attrs, `valid_from` (epoch seconds,
  *    BIGINT), `valid_to` (BIGINT, NULL = current);
  *  - `updates` rows: key, attrs, `ts`; multiple updates per key
  *    collapse to the GREATEST (ts, attrs...) tuple — lexicographic
  *    struct max, so the tie rule is explicit;
  *  - new key → insert (valid_from = ts, current);
  *  - attrs differ (null-safe) AND ts > current.valid_from → close
  *    the current row at ts and open a new current version;
  *  - attrs equal, or ts ≤ current.valid_from (a LATE update that
  *    cannot version monotonically) → no-op, stated;
  *  - history rows pass through untouched.
  *
  * Shape at 100 TB: history never shuffles (filter + union); the
  * current slice joins the collapsed update batch on the key — one
  * key shuffle, update-batch-sized right side (AQE broadcasts small
  * batches), each joined row emits ≤ 2 output rows via an in-row
  * array explode. No windows, no global state. */
object Scd2 {

  def merge(
      dim: DataFrame,
      updates: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      tsCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2Merge needs at least one tracked attr")
    val history = dim.filter(col("valid_to").isNotNull)
    val current = dim.filter(col("valid_to").isNull)
    val upd = updates
      .groupBy(col(keyCol))
      .agg(max(struct(col(tsCol).as("_u_ts") +:
        attrCols.map(c => col(c).as(s"_u_$c")): _*)).as("_u"))
      .select(col(keyCol) +: (col("_u._u_ts") +:
        attrCols.map(c => col(s"_u._u_$c"))): _*)
    val j = current.join(upd, Seq(keyCol), "full_outer")
    val changed = attrCols.map(c => !(col(s"_u_$c") <=> col(c)))
      .reduce(_ || _)
    val applies = col("_u_ts").isNotNull &&
      (col("valid_from").isNull || col("_u_ts") > col("valid_from"))
    def row(attrs: Seq[Column], from: Column, to: Column): Column =
      struct(attrCols.zip(attrs).map { case (n, c) => c.as(n) } :+
        from.as("valid_from") :+ to.as("valid_to"): _*)
    val curRow = row(attrCols.map(col), col("valid_from"),
      lit(null).cast("long"))
    val closedRow = row(attrCols.map(col), col("valid_from"), col("_u_ts"))
    val newRow = row(attrCols.map(c => col(s"_u_$c")), col("_u_ts"),
      lit(null).cast("long"))
    val rows =
      when(col("valid_from").isNotNull && (!applies || !changed),
        array(curRow)) // no-op (late, equal, or no update)
        .when(col("valid_from").isNotNull, array(closedRow, newRow)) // version
        .otherwise(array(newRow)) // insert
    val merged = j.select(col(keyCol), explode(rows).as("_r"))
      .select(col(keyCol) +: (attrCols.map(c => col(s"_r.$c")) :+
        col("_r.valid_from") :+ col("_r.valid_to")): _*)
    history.select(col(keyCol) +: (attrCols.map(col) :+
        col("valid_from") :+ col("valid_to")): _*)
      .unionByName(merged)
  }
}
