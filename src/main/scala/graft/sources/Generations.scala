package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table ATOMIC generation publish (SURVEY §2.1 S9).
  *
  * The reference INTENDS transactional refresh: backup + TRUNCATE +
  * append inside an `engine.begin()` block (ref
  * `src/batch_train.py:154-176`) — but that block covers ONE table
  * (`standard_knowledge_base`), and MySQL's TRUNCATE/CREATE TABLE are
  * DDL that implicitly commit, so even the single-table refresh is not
  * actually atomic there. This object provides the guarantee the
  * reference only approximates, and extends it across tables: a reader
  * never observes table A's new rows next to table B's old ones. The
  * per-table [[Sinks.snapshotOverwrite]] staged-rename protocol is
  * crash-safe per table but cannot give that cross-table guarantee: a
  * reader arriving between two tables' swaps sees a MIXED generation.
  *
  * This object restores the one-transaction semantics in a file store
  * with a generation-manifest pointer:
  *
  *   - `<root>/gen-<v>/<table>/` — every table's snapshot for version v,
  *     all staged BEFORE anything becomes visible;
  *   - `<root>/_versions/v<v>` — the version MARKER. Its single
  *     atomic rename (from a dot-prefixed temp name in the same
  *     directory) is the commit point for the WHOLE generation.
  *
  * Readers resolve the pointer ONCE ([[openVersion]]: max committed
  * marker) and read every table under that `gen-<v>` dir — so a read set
  * is always one generation, by construction. A crash anywhere before the
  * marker rename leaves only invisible staging (orphaned `gen-<v>` dirs
  * with no marker, swept by the next [[publish]]); a crash after it is a
  * completed publish. Markers are never written in place: the temp name
  * starts with `.` so it can match no marker pattern, and the rename
  * target never pre-exists (fresh version numbers are monotone).
  *
  * Single-writer protocol, like the reference's one-process pipeline and
  * the rest of [[Sinks]]. Directory/file renames are atomic on HDFS-like
  * stores; on object stores use a manifest-pointer-capable committer —
  * same documented delta as [[Sinks.snapshotOverwrite]].
  */
object Generations {

  private def fsOf(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

  private val Marker = "v(\\d{12})".r

  private def versionsDir(root: String) = new Path(s"$root/_versions")

  private def markerName(v: Long) = f"v$v%012d"

  private def genDir(root: String, v: Long) = f"$root/gen-$v%012d"

  /** The newest COMMITTED generation, if any: max over the version
    * markers. Only exact `v<12 digits>` names count — temp files are
    * dot-prefixed and can never match. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark)
    val dir = versionsDir(root)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case Marker(d) => d.toLong }
      .reduceOption(_ max _)
  }

  /** Publish ALL `tables` as one atomic generation: stage every table's
    * parquet snapshot under the next `gen-<v>` dir, then commit the
    * whole set with ONE marker rename. Returns the published version.
    * `crashPoint` is a test hook fired between protocol steps (the
    * [[Sinks.snapshotOverwrite]] convention); the crash-injection spec
    * drives it at every step and proves a reader never observes a mixed
    * generation. Also sweeps orphaned staging from earlier crashed
    * publishes (gen dirs newer than the current marker). */
  def publish(spark: SparkSession, tables: Map[String, DataFrame],
              root: String,
              crashPoint: String => Unit = _ => ()): Long = {
    require(tables.nonEmpty, "at least one table")
    tables.keys.foreach(t => require(
      t.nonEmpty && !t.contains("/") && !t.startsWith("_") &&
        !t.startsWith("."),
      s"bad table name '$t'"))
    val fs = fsOf(spark)
    val current = currentVersion(spark, root).getOrElse(0L)
    // sweep invisible orphans: staging dirs from a crashed publish (and
    // any stale marker temp) — readers never saw them, deletion is safe
    val rootPath = new Path(root)
    if (fs.exists(rootPath)) {
      fs.listStatus(rootPath).map(_.getPath).foreach { p =>
        val n = p.getName
        if (n.startsWith("gen-") &&
          scala.util.Try(n.stripPrefix("gen-").toLong).toOption
            .exists(_ > current)) fs.delete(p, true)
      }
    }
    val vdir = versionsDir(root)
    if (fs.exists(vdir))
      fs.listStatus(vdir).map(_.getPath)
        .filter(_.getName.startsWith(".tmp-"))
        .foreach(fs.delete(_, true))
    val next = current + 1
    // stage EVERY table before anything commits (sorted: deterministic
    // crash-injection step names)
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"${genDir(root, next)}/$name")
      crashPoint(s"staged-$name")
    }
    crashPoint("staged")
    // commit point: marker temp write + single atomic rename
    fs.mkdirs(vdir)
    val tmp = new Path(vdir, s".tmp-${markerName(next)}")
    val out = fs.create(tmp, true)
    out.close()
    crashPoint("marker-staged")
    val marker = new Path(vdir, markerName(next))
    if (!fs.rename(tmp, marker))
      throw new java.io.IOException(s"rename $tmp -> $marker failed")
    crashPoint("published")
    next
  }

  /** Resolve the pointer ONCE for a consistent multi-table read set.
    * Every [[readTableAt]] against the returned version reads the same
    * generation — the file-store equivalent of opening a repeatable-read
    * transaction on the reference's MySQL store. */
  def openVersion(spark: SparkSession, root: String): Long =
    currentVersion(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no committed generation under $root"))

  /** One table of a pinned generation. */
  def readTableAt(spark: SparkSession, root: String, version: Long,
                  table: String): DataFrame =
    spark.read.parquet(s"${genDir(root, version)}/$table")

  /** Convenience single-table read of the CURRENT generation. Callers
    * reading several tables that must agree should [[openVersion]] once
    * and use [[readTableAt]] — that is the whole point of the
    * protocol. */
  def readTable(spark: SparkSession, root: String, table: String): DataFrame =
    readTableAt(spark, root, openVersion(spark, root), table)

  /** Table names of a generation (its staged directory listing). */
  def tablesAt(spark: SparkSession, root: String,
               version: Long): Seq[String] = {
    val fs = fsOf(spark)
    fs.listStatus(new Path(genDir(root, version)))
      .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
  }

  /** Retention: delete all but the newest `keepLast` COMMITTED
    * generations (marker first, then the data — a crash between the two
    * leaves an orphaned gen dir that the next [[publish]] cannot sweep,
    * since it is older than current, but a re-run [[vacuum]] can: an
    * unmarked dir older than the oldest kept marker is dead). The
    * current generation is never a candidate when keepLast >= 1; as
    * with any VACUUM, time-travel reads reach only kept generations. */
  def vacuum(spark: SparkSession, root: String,
             keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val fs = fsOf(spark)
    val vdir = versionsDir(root)
    if (!fs.exists(vdir)) return Seq.empty
    val committed = fs.listStatus(vdir).map(_.getPath.getName)
      .collect { case Marker(d) => d.toLong }.sorted
    val doomed = committed.dropRight(keepLast)
    val deleted = doomed.flatMap { v =>
      fs.delete(new Path(vdir, markerName(v)), false)
      val g = new Path(genDir(root, v))
      if (fs.exists(g)) { fs.delete(g, true); Some(g.toString) } else None
    }
    // sweep unmarked orphans older than the oldest kept marker (the
    // crash window above)
    val oldestKept = committed.takeRight(keepLast).headOption
    val rootPath = new Path(root)
    val orphans =
      if (!fs.exists(rootPath) || oldestKept.isEmpty) Seq.empty[String]
      else fs.listStatus(rootPath).map(_.getPath).toSeq
        .filter { p =>
          val n = p.getName
          n.startsWith("gen-") &&
            scala.util.Try(n.stripPrefix("gen-").toLong).toOption
              .exists(v => v < oldestKept.get &&
                !fs.exists(new Path(vdir, markerName(v))))
        }
        .map { p => fs.delete(p, true); p.toString }
    deleted.toSeq ++ orphans
  }

  /** Per-JVM registry of published generation chains (the
    * [[Sinks.backupChainFor]] contract: `key` uniquely identifies the
    * input; built once per session + key): publishes the given table
    * STATES in order — states(i) is a Map(table -> DataFrame) — and
    * returns the root. The registry query reads the LAST generation
    * through the pointer; its oracle replays that state's derivation. */
  private val chains = new graft.SessionMemo[String, String]()

  def generationChainFor(spark: SparkSession,
                         states: Seq[Map[String, DataFrame]], key: String,
                         baseDir: String =
                           sys.props("java.io.tmpdir") + "/graft-generations")
      : String = {
    require(states.nonEmpty, "at least one state")
    chains.getOrCompute(spark, key) {
      val root = graft.TmpArtifacts.under(baseDir, key)
      fsOf(spark).delete(new Path(root), true)
      states.foreach(publish(spark, _, root))
      root
    }
  }
}
