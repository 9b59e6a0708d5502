package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit salting for skew-bomb equi-joins (SURVEY §4.2: AQE's
  * skew-join splitting covers sort-merge joins at runtime, but salting
  * is the deterministic fallback when a single key exceeds what one
  * task can hold — the hot-uid case VERDICT flagged in the
  * multi-device self-join).
  *
  * The probe side gets a deterministic salt derived from its whole row
  * (uniform spread, no RNG — reproducible plans); the build side is
  * replicated `salt` ways. Same result set as the unsalted join, with
  * the hot key's rows spread over `salt` tasks.
  */
object SkewJoin {

  /** Inner equi-join on `keys`, salted `salt` ways. */
  def saltedInner(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salt: Int): DataFrame = {
    val l = probe.withColumn("_salt",
      pmod(xxhash64(struct(probe.columns.toIndexedSeq.map(col): _*)), lit(salt)))
    val r = build
      .withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
