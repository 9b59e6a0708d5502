package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.functions.GraftFunctions._

/** ScalaCheck properties for the sampling cohort — the invariants the
  * whole tier model rests on (SURVEY §5.3). Driver-side evaluation of
  * the same Catalyst expressions the importers use. */
object CohortProps extends Properties("hexPrefixCohort") {

  private lazy val spark = TestSpark.spark

  private def cohorts(ids: Seq[String]): Seq[Option[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    ids.toDF("id").select(hexPrefixCohort(col("id"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
  }

  private val hexId: Gen[String] =
    Gen.chooseNum(8, 32).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString))

  property("range: cohort of a hex id is always in [0, 100)") =
    Prop.forAll(hexId) { id =>
      cohorts(Seq(id)).head.exists(c => c >= 0 && c < 100)
    }

  property("matches the reference formula: parseLong(id[0:7], 16) % 100") =
    Prop.forAll(hexId) { id =>
      cohorts(Seq(id)).head.contains(
        java.lang.Long.parseLong(id.take(7), 16) % 100)
    }

  property("FROM 0 FOR 8 quirk: only the first 7 chars matter") =
    Prop.forAll(hexId, Gen.oneOf("0123456789abcdef".toSeq)) { (id, extra) =>
      val base = id.take(7)
      cohorts(Seq(base + extra, base + "0", base)).distinct.sizeIs == 1
    }

  property("determinism: same id, same cohort") =
    Prop.forAll(hexId) { id =>
      cohorts(Seq(id, id)).distinct.sizeIs == 1
    }
}
