package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Iceberg-style snapshot log over parquet file sets: versioned,
  * ATOMIC, time-travelable table state for the north rule's
  * "snapshot-backed checkpoints" (this image ships no Iceberg jars —
  * SURVEY.md §1.3 — so the facade implements the table-format contract the
  * engine needs and Iceberg slots in unchanged where available).
  *
  * Model: `dir/vN.json` is an immutable manifest listing the data files
  * visible at version N (absolute paths, one per line in a JSON array)
  * plus its parent version. State transitions are COMMITS of a complete
  * new file list; readers resolve a version to its file list and scan
  * exactly those files, so a reader of vN is never affected by a
  * concurrent commit of vN+1 — snapshot isolation by construction.
  *
  * Atomicity/concurrency: a commit writes a temp file and promotes it with
  * an atomic hard-link creation (link(2) fails with EEXIST on an existing
  * target) — if two writers race on the same next version, exactly one
  * link succeeds and the loser gets the standard optimistic-concurrency
  * retry signal (the same CAS-on-filename protocol Iceberg/Delta run
  * against an atomic object store or a catalog). Readers never observe a
  * partial manifest.
  *
  * Scale: the log holds O(versions) small JSON files; resolving a version
  * is one file read on the driver. Data files are parquet written by
  * ordinary distributed jobs — the log only records WHICH files constitute
  * each version, exactly like an Iceberg manifest list.
  */
final class SnapshotLog(dir: String) {
  private val root: Path = Paths.get(dir)
  Files.createDirectories(root)

  private def manifest(version: Long): Path = root.resolve(s"v$version.json")

  /** Highest committed version, or None for an empty log. Scans the log
    * directory (O(versions) names, driver-side). */
  def latest(): Option[Long] = {
    val stream = Files.list(root)
    val vs =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json") }
        .flatMap(s => s.toLongOption)
        .toSeq
      finally stream.close()
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Commit `files` as the next version. `expectedParent` is the CAS guard:
    * pass `latest()` as observed; if another writer committed first, the
    * atomic create fails and this throws `ConcurrentCommitException` — the
    * caller re-reads, re-resolves conflicts, retries (Iceberg's optimistic
    * loop). Returns the committed version. */
  def commit(files: Seq[String], expectedParent: Option[Long]): Long = {
    val observed = latest()
    if (observed != expectedParent)
      throw new SnapshotLog.ConcurrentCommitException(
        s"expected parent $expectedParent but log is at $observed")
    val version = expectedParent.getOrElse(-1L) + 1L
    val node = SnapshotLog.mapper.createObjectNode()
    node.put("version", version)
    node.put("parent", expectedParent.getOrElse(-1L))
    val arr = node.putArray("files")
    files.foreach(arr.add)
    val json = SnapshotLog.mapper.writeValueAsString(node)
    val tmp = Files.createTempFile(root, s".v$version-", ".tmp")
    Files.write(tmp, json.getBytes(UTF_8))
    // The CAS is an atomic hard-link creation: link(2) fails with EEXIST
    // when the target exists, so exactly one racing writer claims the
    // version. (A rename would NOT work here — on POSIX, ATOMIC_MOVE maps
    // to rename(2), which silently REPLACES an existing target, letting
    // the loser clobber the winner's manifest.) Readers see either no
    // manifest or the complete one: the bytes were fully written to the
    // temp inode before the link makes them visible.
    try Files.createLink(manifest(version), tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new SnapshotLog.ConcurrentCommitException(
          s"version $version was committed concurrently")
    }
    finally Files.deleteIfExists(tmp)
    version
  }

  /** Append-style commit: next version = parent's files + `newFiles`. */
  def commitAppend(newFiles: Seq[String]): Long = {
    val parent = latest()
    commit(parent.map(files).getOrElse(Nil) ++ newFiles, parent)
  }

  /** The data files visible at `version` (time travel). */
  def files(version: Long): Seq[String] = {
    val path = manifest(version)
    require(Files.exists(path), s"no snapshot v$version in $dir")
    val node = SnapshotLog.mapper.readTree(Files.readAllBytes(path))
    node.get("files").elements().asScala.map(_.asText()).toSeq
  }

  /** Scan the table AS OF `version` — exactly that snapshot's files. */
  def read(spark: SparkSession, version: Long): DataFrame = {
    val fs = files(version)
    require(fs.nonEmpty, s"snapshot v$version is empty")
    spark.read.parquet(fs: _*)
  }

  /** Scan the latest snapshot. */
  def readLatest(spark: SparkSession): DataFrame =
    read(spark, latest().getOrElse(sys.error(s"empty snapshot log $dir")))

  /** Files ADDED between two snapshots: `files(to) -- files(from)`.
    * Versions are 0-based ([[commit]] returns 0 for the first commit), so
    * the "before any commit" base is `from = -1` (everything in `to` is
    * new). Append-only logs never remove files, but a rewritten file set
    * (compaction) is handled correctly too — only genuinely new paths are
    * returned. */
  def deltaFiles(fromVersion: Long, toVersion: Long): Seq[String] = {
    require(fromVersion >= -1 && toVersion >= fromVersion,
      s"bad version range v$fromVersion..v$toVersion")
    val before =
      if (fromVersion == -1) Set.empty[String] else files(fromVersion).toSet
    files(toVersion).filterNot(before)
  }

  /** Scan ONLY the files added between two snapshots — the incremental-
    * validation shape: a 100 TB lake validates each new snapshot's delta,
    * never the whole table (`read` exists for full-table / time-travel
    * audits). Returns None when the delta is empty, so callers don't have
    * to conjure an empty frame with the right schema. */
  def readDelta(spark: SparkSession, fromVersion: Long,
                toVersion: Long): Option[DataFrame] = {
    val fs = deltaFiles(fromVersion, toVersion)
    if (fs.isEmpty) None else Some(spark.read.parquet(fs: _*))
  }
}

object SnapshotLog {
  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}
