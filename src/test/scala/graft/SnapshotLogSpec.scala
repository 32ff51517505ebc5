package graft

import org.apache.spark.sql.functions._

import graft.io.SnapshotLog

/** Iceberg-analog snapshot log: atomic versioned commits, time travel,
  * snapshot isolation, optimistic-concurrency conflicts. */
class SnapshotLogSpec extends SparkTestBase {

  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-snaplog").toString

  private def writeSlice(dir: String, name: String, from: Int, until: Int): String = {
    val path = s"$dir/$name"
    (from until until).toDF("v").write.mode("overwrite").parquet(path)
    path
  }

  test("append commits accumulate files; time travel reads exactly each version's set") {
    val dir = tempDir()
    val log = new SnapshotLog(s"$dir/log")
    log.latest() shouldBe None
    val a = writeSlice(dir, "a", 0, 100)
    val b = writeSlice(dir, "b", 100, 150)
    log.commitAppend(Seq(a)) shouldBe 0L
    log.commitAppend(Seq(b)) shouldBe 1L
    log.latest() shouldBe Some(1L)
    log.read(spark, 0L).count() shouldBe 100L
    log.read(spark, 1L).count() shouldBe 150L
    log.readLatest(spark).agg(sum("v")).head().getLong(0) shouldBe (0 until 150).sum.toLong
    // v0's manifest is immutable: re-resolving it after the v1 commit
    // yields the original file set (snapshot isolation for readers)
    log.files(0L) shouldBe Seq(a)
    log.files(1L) shouldBe Seq(a, b)
  }

  test("full-replace commit supports compaction/rewrite semantics") {
    val dir = tempDir()
    val log = new SnapshotLog(s"$dir/log")
    val a = writeSlice(dir, "a", 0, 10)
    val compacted = writeSlice(dir, "c", 0, 10)
    log.commit(Seq(a), None) shouldBe 0L
    // rewrite: v1 replaces the file set entirely (what a compaction commit does)
    log.commit(Seq(compacted), Some(0L)) shouldBe 1L
    log.files(1L) shouldBe Seq(compacted)
    log.read(spark, 1L).count() shouldBe 10L
  }

  test("stale-parent commit throws the optimistic-concurrency conflict") {
    val dir = tempDir()
    val log = new SnapshotLog(s"$dir/log")
    val a = writeSlice(dir, "a", 0, 10)
    val b = writeSlice(dir, "b", 10, 20)
    log.commit(Seq(a), None)
    // a second writer that read the log BEFORE the first commit (observed
    // parent None) must fail its CAS, not silently overwrite v0
    val ex = intercept[SnapshotLog.ConcurrentCommitException] {
      log.commit(Seq(b), None)
    }
    ex.getMessage should include("expected parent")
    // after re-reading the log, the retry succeeds
    log.commit(Seq(a, b), log.latest()) shouldBe 1L
  }

  test("racing writers on the same version: exactly one atomic promote wins") {
    val dir = tempDir()
    val log = new SnapshotLog(s"$dir/log")
    val a = writeSlice(dir, "a", 0, 10)
    log.commit(Seq(a), None)
    // both writers observed parent v0 and race on v1 — run the commits
    // concurrently; exactly one must win the ATOMIC_MOVE CAS
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val attempts = (1 to 2).map { i =>
      Future {
        gate.await()
        try { log.commit(Seq(a, s"$dir/w$i"), Some(0L)); true }
        catch { case _: SnapshotLog.ConcurrentCommitException => false }
      }
    }
    gate.countDown()
    val results = Await.result(Future.sequence(attempts), 30.seconds)
    results.count(identity) shouldBe 1
    log.latest() shouldBe Some(1L)
  }

  test("delta scan reads exactly the files a commit added; validateDelta validates only them") {
    val dir = tempDir()
    val log = new SnapshotLog(s"$dir/log")
    val a = writeSlice(dir, "a", 0, 100)
    val b = writeSlice(dir, "b", 100, 150)
    log.commitAppend(Seq(a))
    log.commitAppend(Seq(b))
    // -1 = before any commit (versions are 0-based)
    log.deltaFiles(-1, 0) shouldBe Seq(a)
    log.deltaFiles(0, 1) shouldBe Seq(b)
    log.deltaFiles(1, 1) shouldBe Seq()
    log.readDelta(spark, 1, 1) shouldBe None
    log.readDelta(spark, 0, 1).get.count() shouldBe 50L
    an[IllegalArgumentException] should be thrownBy log.deltaFiles(1, 0)

    // incremental validation: only v1's rows are checked — a v0 row that
    // violates the spec must NOT appear in the delta's violations
    val spec = Graft.parseSchema("""{"properties":{"v":{"maximum":120}}}""")
    val out = graft.run.Runner.validateDelta(spark, log, 0, 1, spec, Seq("v")).get
    out.flagged.count() shouldBe 50L
    // leaf violations only — the enclosing properties-level row rides the
    // same array per the reference's error model
    out.violations.where(col("kind") === "maximum")
      .select("v").as[Int].collect().sorted.toSeq shouldBe (121 to 149)

    // compaction rewrite: the rewritten file is "new" relative to v1 even
    // though its rows are not — deltas are FILE-level, as documented
    val c = writeSlice(dir, "c", 0, 150)
    log.commit(Seq(c), log.latest())
    log.deltaFiles(1, 2) shouldBe Seq(c)
  }
}
