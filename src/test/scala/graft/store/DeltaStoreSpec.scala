package graft.store

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The s40 serving-index maintenance discipline, at the store grain:
  * append idempotency under at-least-once replay, the folded-batch
  * watermark, and crash recovery at every interruptible point of the
  * staged compaction swap (the FingerprintStore discipline applied to
  * delta+base stores). */
class DeltaStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("token", StringType),
    StructField("df", LongType)))

  private def plain(d: DataFrame, path: String): Unit =
    d.coalesce(1).write.mode("overwrite").parquet(path)

  private def mkStore(): DeltaStore = {
    val root = Files.createTempDirectory("delta_store_spec_").toString
    new DeltaStore(root, schema, plain, plain,
      _.groupBy("token").agg(sum("df").as("df")))
  }

  private def contents(st: DeltaStore): Map[String, Long] =
    st.read(spark).groupBy("token").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def fs = new Path("/").getFileSystem(
    spark.sessionState.newHadoopConf())

  test("append + read: deltas union; replayed batch overwrites, not double-appends") {
    val st = mkStore()
    st.append(spark, 0L, Seq(("a", 1L), ("b", 2L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("a", 3L)).toDF("token", "df"))
    assert(contents(st) == Map("a" -> 4L, "b" -> 2L))
    // at-least-once replay of batch 1 (same content) — overwrite, no dup
    st.append(spark, 1L, Seq(("a", 3L)).toDF("token", "df"))
    assert(contents(st) == Map("a" -> 4L, "b" -> 2L))
  }

  test("compact folds base+deltas via merge; replay of a FOLDED batch is skipped by the watermark") {
    val st = mkStore()
    st.append(spark, 0L, Seq(("a", 1L), ("b", 2L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("a", 3L)).toDF("token", "df"))
    st.compact(spark)
    assert(st.foldedUpto(spark) == 1L)
    assert(contents(st) == Map("a" -> 4L, "b" -> 2L))
    // the post-compaction replay hazard: batch 1's rows are in the base
    // and its delta dir is gone — a naive overwrite-append would
    // double-count them. The watermark must skip it.
    st.append(spark, 1L, Seq(("a", 3L)).toDF("token", "df"))
    assert(contents(st) == Map("a" -> 4L, "b" -> 2L),
      "replayed folded batch double-counted")
    // a genuinely new batch after compaction still lands
    st.append(spark, 2L, Seq(("c", 7L)).toDF("token", "df"))
    assert(contents(st) == Map("a" -> 4L, "b" -> 2L, "c" -> 7L))
    // second compaction folds base + the new delta
    st.compact(spark)
    assert(st.foldedUpto(spark) == 2L)
    assert(contents(st) == Map("a" -> 4L, "b" -> 2L, "c" -> 7L))
  }

  test("recover: staging WITHOUT the completeness marker is a dead rewrite — cleared, base+deltas untouched") {
    val st = mkStore()
    st.append(spark, 0L, Seq(("a", 1L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("b", 2L)).toDF("token", "df"))
    // simulate a crash DURING the staging write: partial parquet data,
    // no _STAGED marker
    val staging = s"${st.root}/base.compact"
    Seq(("junk", 99L)).toDF("token", "df")
      .write.mode("overwrite").parquet(staging)
    st.recover(spark)
    assert(!fs.exists(new Path(staging)), "dead staging not cleared")
    assert(contents(st) == Map("a" -> 1L, "b" -> 2L),
      "dead staging corrupted the store")
  }

  test("recover: staging WITH the completeness marker rolls FORWARD — swap finished, folded deltas swept") {
    val st = mkStore()
    st.append(spark, 0L, Seq(("a", 1L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("b", 2L)).toDF("token", "df"))
    // simulate a crash AFTER staging completed but BEFORE the swap:
    // the staging holds the complete merged relation + both markers
    val staging = s"${st.root}/base.compact"
    Seq(("a", 1L), ("b", 2L)).toDF("token", "df")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val h = fs
    val out1 = h.create(new Path(staging, "_FOLDED_UPTO"), true)
    out1.write("1".getBytes("UTF-8")); out1.close()
    val out2 = h.create(new Path(staging, "_STAGED"), true)
    out2.close()
    st.recover(spark)
    assert(!h.exists(new Path(staging)), "swap not finished")
    assert(st.foldedUpto(spark) == 1L)
    assert(!h.exists(new Path(s"${st.root}/delta/batch=0")) &&
      !h.exists(new Path(s"${st.root}/delta/batch=1")),
      "folded deltas not swept after roll-forward")
    assert(contents(st) == Map("a" -> 1L, "b" -> 2L))
  }

  test("recover: a folded delta surviving a crash mid-sweep is re-swept from the base watermark") {
    val st = mkStore()
    st.append(spark, 0L, Seq(("a", 1L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("b", 2L)).toDF("token", "df"))
    st.compact(spark)
    // simulate the crash: a folded delta dir reappears (the sweep died
    // before deleting it) — rows ALREADY in the base
    st.append(spark, 2L, Seq(("c", 3L)).toDF("token", "df"))
    val zombie = s"${st.root}/delta/batch=1"
    Seq(("b", 2L)).toDF("token", "df")
      .coalesce(1).write.mode("overwrite").parquet(zombie)
    assert(contents(st) == Map("a" -> 1L, "b" -> 2L, "c" -> 3L),
      "zombie folded delta double-counted on read")
    assert(!fs.exists(new Path(zombie)), "zombie folded delta not re-swept")
  }

  test("readOnly: resolves every crash/in-flight state WITHOUT mutating the store (the non-owner contract)") {
    def roContents(st: DeltaStore): Map[String, Long] =
      st.readOnly(spark).groupBy("token").agg(sum("df").as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val h = fs

    // normal state: readOnly == read
    val st = mkStore()
    st.append(spark, 0L, Seq(("a", 1L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("b", 2L)).toDF("token", "df"))
    assert(roContents(st) == Map("a" -> 1L, "b" -> 2L))

    // dead staging (a writer mid-rewrite, or a crash): IGNORED but — the
    // critical difference from recover() — NOT deleted; a non-owner
    // clearing it would destroy the owner's in-progress compaction
    val staging = s"${st.root}/base.compact"
    Seq(("junk", 99L)).toDF("token", "df")
      .write.mode("overwrite").parquet(staging)
    assert(roContents(st) == Map("a" -> 1L, "b" -> 2L),
      "dead staging leaked into a read-only view")
    assert(h.exists(new Path(staging)),
      "readOnly mutated the store: deleted the owner's staging")

    // staged-complete (crash between marker write and swap, or the
    // owner mid-swap): the staging is the base-elect — read AS the
    // base, deltas at/below its watermark excluded, nothing touched
    Seq(("a", 1L), ("b", 2L)).toDF("token", "df")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val out1 = h.create(new Path(staging, "_FOLDED_UPTO"), true)
    out1.write("1".getBytes("UTF-8")); out1.close()
    val out2 = h.create(new Path(staging, "_STAGED"), true)
    out2.close()
    st.append(spark, 2L, Seq(("c", 3L)).toDF("token", "df"))
    // (append ran recover() first, finishing the swap — rebuild the
    // staged state around the new base to test readOnly against it)
    Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("token", "df")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val out3 = h.create(new Path(staging, "_FOLDED_UPTO"), true)
    out3.write("2".getBytes("UTF-8")); out3.close()
    val out4 = h.create(new Path(staging, "_STAGED"), true)
    out4.close()
    // a zombie delta the staged fold already consumed
    Seq(("c", 3L)).toDF("token", "df")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${st.root}/delta/batch=2")
    assert(roContents(st) == Map("a" -> 1L, "b" -> 2L, "c" -> 3L),
      "staged-complete state misread (double-count or stale base)")
    assert(h.exists(new Path(staging)) &&
      h.exists(new Path(s"${st.root}/delta/batch=2")),
      "readOnly mutated the store during the staged-complete state")

    // a delta ABOVE the staged watermark still unions in
    Seq(("d", 4L)).toDF("token", "df")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${st.root}/delta/batch=3")
    assert(roContents(st) ==
      Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
  }

  test("retention at merge (s46): compact's extra hook drops expired rows; force expires with no deltas; rebase replaces a derived store and folds its deltas") {
    val st = mkStore()
    // token doubles as the age axis here: "old" rows expire
    st.append(spark, 0L, Seq(("old", 1L), ("new", 2L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("old", 3L), ("new", 4L)).toDF("token", "df"))
    st.compact(spark, extra = _.filter(col("token") =!= "old"))
    assert(contents(st) == Map("new" -> 6L),
      "expired rows must be dropped AT the merge")
    assert(st.foldedUpto(spark) == 1L)
    // watermark advance with NO new deltas: a plain compact would
    // no-op; force must still rewrite the base through the filter
    st.compact(spark, extra = _.filter(col("df") < 100L), force = true)
    assert(contents(st) == Map("new" -> 6L) && st.foldedUpto(spark) == 1L,
      "forced expiry must keep the folded watermark")
    // rebase: the derived-store compaction — replaces the base wholesale
    // and sweeps live deltas into the watermark
    st.append(spark, 2L, Seq(("c", 9L)).toDF("token", "df"))
    st.rebase(spark, Seq(("derived", 42L)).toDF("token", "df"))
    assert(contents(st) == Map("derived" -> 42L))
    assert(st.foldedUpto(spark) == 2L,
      "rebase must fold the swept deltas' ids into the watermark")
    // a replay of the swept batch is skipped by that watermark
    st.append(spark, 2L, Seq(("c", 9L)).toDF("token", "df"))
    assert(contents(st) == Map("derived" -> 42L))
  }

  test("readOnly(asOf): excludes deltas above the pinned batch; refuses an asOf behind the folded base") {
    val st = mkStore()
    st.append(spark, 0L, Seq(("a", 1L)).toDF("token", "df"))
    st.append(spark, 1L, Seq(("a", 2L)).toDF("token", "df"))
    assert(st.readOnlyMaxBatch(spark) == 1L)
    val at0 = st.readOnly(spark, asOf = 0L)
      .groupBy("token").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(at0 == Map("a" -> 1L), "asOf=0 must exclude batch 1's delta")
    st.compact(spark)
    assert(st.readOnlyMaxBatch(spark) == 1L)
    val err = intercept[IllegalArgumentException] {
      st.readOnly(spark, asOf = 0L).count()
    }
    assert(err.getMessage.contains("cannot be rewound"),
      s"expected the loud rewind refusal, got: ${err.getMessage}")
  }

  test("empty store reads as an empty typed relation; compact with no deltas is a no-op") {
    val st = mkStore()
    assert(st.read(spark).collect().isEmpty)
    assert(st.read(spark).schema == schema)
    st.compact(spark)
    assert(st.foldedUpto(spark) == -1L)
  }

  test("partitioned-layout store: explicit schema keeps the partition column type through base and deltas") {
    val pSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("cell", LongType)))
    def cellPart(d: DataFrame, path: String): Unit =
      d.repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(path)
    val root = Files.createTempDirectory("delta_store_part_").toString
    val st = new DeltaStore(root, pSchema, cellPart, cellPart, identity)
    st.append(spark, 0L, Seq((10L, 1L), (11L, 2L)).toDF("vec_id", "cell"))
    st.compact(spark)
    st.append(spark, 1L, Seq((12L, 1L)).toDF("vec_id", "cell"))
    val view = st.read(spark)
    assert(view.schema("cell").dataType == LongType,
      "partition discovery narrowed the cell type")
    assert(view.filter(col("cell") === 1L).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(10L, 12L))
  }

  test("StoreEpoch seqlock: absent reads 0 (even), begin/end alternate odd/even, both idempotent across a crashed pass") {
    val root = Files.createTempDirectory("store_epoch_spec_").toString
    // a never-merged store group is always serveable
    assert(StoreEpoch.read(spark, root) == 0L)
    StoreEpoch.begin(spark, root)
    assert(StoreEpoch.read(spark, root) == 1L, "begin must flip to odd")
    // a crashed pass resumes with another begin — idempotent, no
    // double increment (a reader would otherwise see a phantom epoch)
    StoreEpoch.begin(spark, root)
    assert(StoreEpoch.read(spark, root) == 1L)
    StoreEpoch.end(spark, root)
    assert(StoreEpoch.read(spark, root) == 2L, "end must flip to even")
    StoreEpoch.end(spark, root)
    assert(StoreEpoch.read(spark, root) == 2L)
    // the next full pass advances the counter — two consistent reads
    // around it can never match across the pass boundary
    StoreEpoch.begin(spark, root); StoreEpoch.end(spark, root)
    assert(StoreEpoch.read(spark, root) == 4L)
  }
}
