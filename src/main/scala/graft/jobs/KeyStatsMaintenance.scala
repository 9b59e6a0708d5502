package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Delta-maintained key-distribution statistics — the nightly tick
  * that keeps the pre-shuffle diagnostics sheet (K138 entropy, K140
  * Gini) current at O(changed) cost, the [[CardMaintenance]]
  * discipline applied to the key-count view:
  *
  *  - `counts (key, cnt)` — the per-key count relation; a tick
  *    adjusts only keys whose rows arrived or left.
  *  - `cc (c, m)` — the counts-of-counts histogram; each changed key
  *    moves one unit of `m` from its old count class to its new one,
  *    so the Gini prefix always runs over a maintained
  *    histogram-sized relation, never the keys.
  *  - `scalars (n_rows, n_keys, t_sum)` — abelian sufficient stats;
  *    `t_sum = Σ c·round(ln c·10⁶)` updates by per-changed-key
  *    `term(new) − term(old)` differences, so entropy needs NO pass
  *    over the counts at all.
  *
  * The snapshot diff anti-joins on (id, key): an event reassigned to
  * a different key leaves its old key AND arrives at its new one —
  * content-change correctness, the CardMaintenance `_card` argument.
  *
  * Scale shape: the diff moves (id, key) pairs for changed rows
  * only; the counts merge is an anti-join + union keyed on the
  * changed keys; cc and scalars exchanges are histogram- and
  * one-row-sized. Nothing rescans the unchanged corpus. */
object KeyStatsMaintenance {

  /** The three persisted relations as one value. */
  final case class KeyStatsState(
      counts: DataFrame,
      cc: DataFrame,
      scalars: DataFrame)

  /** `c · round(ln c · 10⁶)` — the entropy term, 0 at c ≤ 0 (the
    * keyEntropy quantize-before-sum convention). */
  private def lnTerm(c: Column): Column =
    when(c > 0, c * round(log(c.cast("double")) * 1e6).cast(LongType))
      .otherwise(lit(0L))

  /** Full rebuild from a snapshot — initial state construction, and
    * the equivalence baseline every maintained state must match. */
  def rebuild(snap: DataFrame, keyCol: String): KeyStatsState = {
    val counts = snap.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val cc = counts.groupBy(col("cnt").as("c")).agg(count(lit(1)).as("m"))
    val scalars = counts.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      coalesce(sum(lnTerm(col("cnt"))), lit(0L)).as("t_sum"))
    KeyStatsState(counts, cc, scalars)
  }

  /** One O(changed) maintenance tick from `oldSnap` to `newSnap`. */
  def tick(
      st: KeyStatsState,
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      keyCol: String): KeyStatsState = {
    def keyed(df: DataFrame) = df.select(col(idCol).as("_id"),
      col(keyCol).cast("string").as("key"))
    val o = keyed(oldSnap)
    val n = keyed(newSnap)
    val deltas = o.join(n, Seq("_id", "key"), "left_anti")
      .select(col("key"), lit(-1L).as("d"))
      .unionByName(n.join(o, Seq("_id", "key"), "left_anti")
        .select(col("key"), lit(1L).as("d")))
      .groupBy(col("key")).agg(sum(col("d")).as("d"))
      .filter(col("d") =!= 0)
    val changed = st.counts.join(deltas, Seq("key"), "right")
      .select(col("key"), coalesce(col("cnt"), lit(0L)).as("oldCnt"),
        (coalesce(col("cnt"), lit(0L)) + col("d")).as("newCnt"))
    val countsNext = st.counts
      .join(deltas.select(col("key")), Seq("key"), "left_anti")
      .unionByName(changed.filter(col("newCnt") > 0)
        .select(col("key"), col("newCnt").as("cnt")))
    val ccNext = st.cc
      .unionByName(changed.filter(col("oldCnt") > 0)
        .select(col("oldCnt").as("c"), lit(-1L).as("m")))
      .unionByName(changed.filter(col("newCnt") > 0)
        .select(col("newCnt").as("c"), lit(1L).as("m")))
      .groupBy(col("c")).agg(sum(col("m")).as("m"))
      .filter(col("m") > 0)
    val adj = changed.agg(
      coalesce(sum(col("newCnt") - col("oldCnt")), lit(0L)).as("d_rows"),
      coalesce(sum(
        when(col("oldCnt") === 0 && col("newCnt") > 0, 1L)
          .when(col("oldCnt") > 0 && col("newCnt") <= 0, -1L)
          .otherwise(0L)), lit(0L)).as("d_keys"),
      coalesce(sum(lnTerm(col("newCnt")) - lnTerm(col("oldCnt"))), lit(0L))
        .as("d_t"))
    val scalarsNext = st.scalars.crossJoin(broadcast(adj)).select(
      (col("n_rows") + col("d_rows")).as("n_rows"),
      (col("n_keys") + col("d_keys")).as("n_keys"),
      (col("t_sum") + col("d_t")).as("t_sum"))
    KeyStatsState(countsNext, ccNext, scalarsNext)
  }

  /** The diagnostics sheet from the MAINTAINED state: entropy reads
    * the scalars only, Gini runs its exclusive prefix over the
    * maintained counts-of-counts histogram — the keyEntropy/keyGini
    * formulas verbatim, never touching the key relation. */
  def stats(st: KeyStatsState): DataFrame = {
    val byC = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = st.cc
      .withColumn("r0", coalesce(sum(col("m")).over(byC), lit(0L)))
      .agg(coalesce(sum(col("c") * (col("m") * col("r0") +
        expr("m * (m + 1) div 2"))), lit(0L)).as("_s"))
    st.scalars.crossJoin(broadcast(g)).select(
      col("n_rows"), col("n_keys"),
      (round(log(col("n_rows").cast("double")) * 1e6).cast(LongType) -
        expr("t_sum div n_rows")).as("entropy_micro"),
      round(log(col("n_keys").cast("double")) * 1e6).cast(LongType)
        .as("max_entropy_micro"),
      col("_s"))
      .select(col("n_rows"), col("n_keys"), col("entropy_micro"),
        col("max_entropy_micro"),
        when(col("max_entropy_micro") > 0,
          expr("entropy_micro * 1000000 div max_entropy_micro"))
          .otherwise(lit(1000000L)).as("balance_ppm"),
        when(col("n_rows") <= 0 || col("n_keys") <= 1, lit(0L))
          .otherwise(expr(
            "(2 * _s - (n_keys + 1) * n_rows) * 1000000" +
              " div (n_keys * n_rows)")).as("gini_ppm"))
  }
}
