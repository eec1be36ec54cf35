package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class StoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("store_spec_wh").toString
    EventStore.write(Tables.clicks(spark, TestSpark.Sf0001), wh,
      grain = EventStore.DayGrain)
    wh
  }

  test("write→read round-trip preserves every row") {
    val orig = Tables.clicks(spark, TestSpark.Sf0001)
    val back = EventStore.read(spark, warehouse)
    assert(back.count() == orig.count())
    // spot field integrity through the partition+sort rewrite
    val a = orig.agg(sum(col("user_id")), count_distinct(col("event_id"))).head
    val b = back.agg(sum(col("user_id")), count_distinct(col("event_id"))).head
    assert(a == b)
  }

  test("partition-column predicate prunes partitions in the physical plan") {
    val q = EventStore.read(spark, warehouse)
      .filter(col("day") === "20240115")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in:\n$plan")
    // the scan must report pruned partition count: 1 of ~30
    val scanned = q.select(input_file_name()).distinct().count()
    val total = EventStore.read(spark, warehouse)
      .select(input_file_name()).distinct().count()
    assert(scanned < total / 5, s"scan touched $scanned of $total files — no pruning")
  }

  test("ts-range predicate is pushed to the parquet scan") {
    val q = EventStore.read(spark, warehouse)
      .filter(col("ts") >= "2024-01-15 00:00:00")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"ts filter not pushed:\n$plan")
  }

  test("retention drops exactly the partitions past the cutoff") {
    val wh = Files.createTempDirectory("store_spec_ttl").toString
    EventStore.write(Tables.clicks(spark, TestSpark.Sf0001), wh,
      grain = EventStore.DayGrain)
    val before = EventStore.read(spark, wh)
      .select(col("day")).distinct().count()
    val dropped = EventStore.expire(spark, wh, EventStore.DayGrain,
      java.sql.Timestamp.valueOf(Tables.AsOf), retainDays = 10)
    val after = EventStore.read(spark, wh)
    assert(dropped.nonEmpty)
    assert(after.select(col("day")).distinct().count() == before - dropped.size)
    assert(dropped.forall(_ < "20240121")) // cutoff = asOf(01-31) − 10 d
    assert(after.filter(col("day") < "20240121").count() == 0)
  }

  test("writer emits ts-sorted files (row-group skipping)") {
    // every file must be internally ts-sorted; with range partitioning the
    // files of one partition dir additionally cover non-overlapping ranges
    val part = EventStore.read(spark, warehouse).filter(col("day") === "20240110")
    val byFile = part.select(input_file_name().as("f"), col("ts"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getTimestamp(1).getTime))
    byFile.foreach { case (f, ts) =>
      assert(ts.zip(ts.tail).forall { case (a, b) => a <= b }, s"unsorted file $f")
    }
  }

  test("write fan-out: a partition's data is split across multiple tasks/files") {
    // the 100 TB guard: repartitionByRange(grain, ts) must give a hot grain
    // value MANY write tasks, not one — here 90 tasks over 30 days ⇒ ~3
    // files per day partition
    val wh = Files.createTempDirectory("store_spec_fanout").toString
    val clicks = Tables.clicks(spark, TestSpark.Sf0001)
    EventStore.write(clicks, wh, grain = EventStore.DayGrain,
      numWriteTasks = Some(90))
    val filesPerDay = EventStore.read(spark, wh)
      .select(col("day"), input_file_name().as("f"))
      .groupBy(col("day")).agg(count_distinct(col("f")).as("nf"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(filesPerDay.values.max > 1,
      s"no partition got more than one file: $filesPerDay")
    // and the round-trip still preserves every row
    assert(EventStore.read(spark, wh).count() == clicks.count())
  }

  test("compaction merges small files, preserves content and ts order") {
    val wh = Files.createTempDirectory("store_spec_compact").toString
    val clicks = Tables.clicks(spark, TestSpark.Sf0001)
    EventStore.write(clicks, wh, grain = EventStore.DayGrain)
    val before = EventStore.read(spark, wh)
      .select(input_file_name()).distinct().count()
    val sumBefore = clicks.agg(sum("user_id"), count("*")).head

    val rewritten = EventStore.compact(spark, wh, EventStore.DayGrain)
    assert(rewritten.nonEmpty, "nothing compacted — fixture write made 1 file/partition?")
    rewritten.foreach { case (v, b, a) =>
      assert(a < b, s"partition $v: $b files -> $a, not reduced")
      assert(a == 1, s"partition $v should compact to 1 file at 128MB target, got $a")
    }

    val back = EventStore.read(spark, wh)
    val after = back.select(input_file_name()).distinct().count()
    assert(after < before, s"file count not reduced: $before -> $after")
    assert(back.agg(sum("user_id"), count("*")).head == sumBefore,
      "compaction changed the data")

    // per-file ts-sortedness survives the rewrite
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(input_file_name())
      .orderBy(monotonically_increasing_id())
    val unsorted = back.select(col("ts"), lag("ts", 1).over(w).as("prev"))
      .filter(col("prev").isNotNull && col("prev") > col("ts"))
    assert(unsorted.count() == 0, "a compacted file is not ts-sorted")
  }

  test("compaction recovers a crash between delete and rename; clears stale tmps") {
    val wh = Files.createTempDirectory("store_spec_recover").toString
    val clicks = Tables.clicks(spark, TestSpark.Sf0001)
    EventStore.write(clicks, wh, grain = EventStore.DayGrain)
    val total = EventStore.read(spark, wh).count()

    val root = new java.io.File(wh)
    val parts = root.listFiles().filter(_.getName.startsWith("day=")).sortBy(_.getName)
    assert(parts.length >= 2)

    // crash state A (between delete and rename): partition dir gone, its
    // full content lives only in the tmp dir
    val victim = parts.head
    val value = victim.getName.stripPrefix("day=")
    val tmp = new java.io.File(root, s".compact_tmp_$value")
    assert(victim.renameTo(tmp))
    // crash state B (during the tmp write): partition dir intact, an
    // incomplete tmp beside it
    val stale = new java.io.File(root, s".compact_tmp_${parts(1).getName.stripPrefix("day=")}")
    assert(stale.mkdir())
    java.nio.file.Files.writeString(stale.toPath.resolve("part-garbage"), "not parquet")

    EventStore.compact(spark, wh, EventStore.DayGrain)

    assert(!tmp.exists() && new java.io.File(root, victim.getName).exists(),
      "crashed swap was not completed")
    assert(!stale.exists(), "stale tmp beside an intact partition was not cleared")
    assert(EventStore.read(spark, wh).count() == total, "recovery lost rows")
  }

  test("zorder write: round-trip exact; user rows collapse into few files") {
    val orig = Tables.clicks(spark, TestSpark.Sf0001)
    val whZ = Files.createTempDirectory("store_spec_zwh").toString
    val whT = Files.createTempDirectory("store_spec_twh").toString
    val files = 16
    EventStore.zorderWrite(orig, whZ, numWriteTasks = Some(files))
    // ts-sorted baseline with the same file count (no day partitioning —
    // isolate the clustering effect)
    orig.repartitionByRange(files, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(whT)

    // content parity through the rewrite
    val back = EventStore.read(spark, whZ)
    assert(back.count() == orig.count())
    assert(back.agg(sum(col("user_id")), count_distinct(col("event_id"))).head ==
           orig.agg(sum(col("user_id")), count_distinct(col("event_id"))).head)

    // locality: avg #files holding a given user's rows. In the ts-sorted
    // layout an active user (spread over the whole month) touches ~every
    // file; z-ordering must cut that several-fold — that collapse is what
    // makes per-file blooms/dictionaries reject point lookups.
    def avgFilesPerUser(wh: String): Double = {
      val per = spark.read.parquet(wh)
        .select(col("user_id"), input_file_name().as("f"))
        .groupBy("user_id").agg(countDistinct(col("f")).as("nf"))
      val r = per.agg(avg(col("nf"))).head
      r.getDouble(0)
    }
    val (z, t) = (avgFilesPerUser(whZ), avgFilesPerUser(whT))
    assert(z * 2 < t, s"z-order locality not better: z=$z vs ts-sorted=$t")
  }

  test("retention on a missing root fails loudly instead of no-op") {
    val missing = new java.io.File("/tmp/graft_no_such_warehouse_xyz")
    assert(!missing.exists())
    intercept[IllegalArgumentException] {
      EventStore.expire(spark, missing.getAbsolutePath, EventStore.DayGrain,
        java.sql.Timestamp.valueOf(Tables.AsOf), retainDays = 10)
    }
  }

  test("fingerprint store: bootstrap, cross-batch dedup, replay, compact") {
    import graft.store.FingerprintStore
    import spark.implicits._
    val store = Files.createTempDirectory("graft_fps_").toFile.getAbsolutePath + "/store"
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

    // batch 1 against a store that does not exist yet: internal dedup
    // only — "b" keeps its lowest id
    val b1 = FingerprintStore.dedupAgainst(spark, store,
      docs(1L -> "alpha text", 2L -> "beta text", 3L -> "beta text"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(b1 == Seq(1L, 2L))

    // batch 2 overlaps batch 1 and history-style duplicates drop; the
    // genuinely new doc survives
    val b2 = FingerprintStore.dedupAgainst(spark, store,
      docs(10L -> "alpha text", 11L -> "gamma text"))
      .select("doc_id").as[Long].collect().toSeq
    assert(b2 == Seq(11L))

    // full replay admits nothing (durable across calls = across runs;
    // the store is plain parquet, nothing lives in this JVM)
    assert(FingerprintStore.dedupAgainst(spark, store,
      docs(1L -> "alpha text", 2L -> "beta text", 11L -> "gamma text")).count() == 0)

    // compact dedups the stored relation without changing membership
    val before = FingerprintStore.known(spark, store)
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    FingerprintStore.compact(spark, store)
    val after = FingerprintStore.known(spark, store)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(after == before)
    assert(after.distinct == after)
  }

  test("fingerprint store: crashed compact recovers instead of reading empty") {
    import graft.store.FingerprintStore
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val store = Files.createTempDirectory("graft_fpc_").toFile.getAbsolutePath + "/store"
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    FingerprintStore.ingest(docs(1L -> "alpha text", 2L -> "beta text"), store)
    val members = FingerprintStore.known(spark, store)
      .collect().map(_.getString(0)).sorted.toSeq
    val fs = new Path(store).getFileSystem(spark.sessionState.newHadoopConf())

    // crash BETWEEN delete and rename: store gone, completed staging
    // (with _SUCCESS) left behind — known() must finish the swap, not
    // re-admit all history as if the store were empty
    assert(fs.rename(new Path(store), new Path(store + ".compact")))
    val recovered = FingerprintStore.known(spark, store)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(recovered == members, "recovery lost fingerprints")
    assert(!fs.exists(new Path(store + ".compact")))
    assert(FingerprintStore.dedupAgainst(spark, store,
      docs(9L -> "alpha text")).count() == 0, "history re-admitted after recovery")

    // crash DURING the staging write (no _SUCCESS yet, store intact):
    // the dead staging is cleared, the store keeps answering
    fs.mkdirs(new Path(store + ".compact"))
    assert(FingerprintStore.known(spark, store)
      .collect().map(_.getString(0)).sorted.toSeq == members)
    assert(!fs.exists(new Path(store + ".compact")))

    // store absent AND staging incomplete: unrecoverable — must throw,
    // never silently treat history as empty
    assert(fs.rename(new Path(store), new Path(store + ".bak")))
    fs.mkdirs(new Path(store + ".compact"))
    intercept[IllegalStateException] { FingerprintStore.known(spark, store) }
  }

  test("m04 maintenance pass: first run does real work, second run is a no-op") {
    import spark.implicits._
    val asOf = java.sql.Timestamp.valueOf(Tables.AsOf)
    val wh = Files.createTempDirectory("store_spec_m04_wh").toString
    val clicks = Tables.clicks(spark, TestSpark.Sf0001)
    EventStore.write(clicks, wh, grain = EventStore.DayGrain)
    val fp = Files.createTempDirectory("store_spec_m04_fp").toString + "/store"
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    FingerprintStore.dedupAgainst(spark, fp, docs.filter(col("doc_id") < 20)).count()
    FingerprintStore.dedupAgainst(spark, fp, docs).count()

    def report(df: org.apache.spark.sql.DataFrame) =
      df.select("component", "action", "units_before", "units_after", "detail")
        .as[(String, String, Long, Long, String)].collect()
        .map(r => (r._1, r._2) -> r).toMap

    val first = report(Maintenance.run(spark, wh, EventStore.DayGrain, asOf,
      retainDays = 15, fpStore = Some(fp)))
    // TTL dropped something, survivors kept; retained rows intact
    val (_, _, pBefore, pAfter, _) = first(("events", "expire"))
    assert(pAfter < pBefore && pAfter > 0)
    // fingerprint rewrite: fewer files, all distinct fps preserved
    val (_, _, fBefore, fAfter, fDetail) = first(("fingerprints", "compact"))
    assert(fAfter == 1 && fBefore >= 2)
    assert(fDetail.startsWith(docs.count().toString)) // every doc's fp survived
    // retained data still answers correctly after the pass
    val cutoff = new java.sql.Timestamp(asOf.getTime - 15L * 86400000L)
    val kept = EventStore.read(spark, wh).count()
    assert(kept > 0 && kept <= clicks.filter(col("ts") >= lit(cutoff)).count())

    // idempotency: the second pass reports zero drops and zero rewrites
    val second = report(Maintenance.run(spark, wh, EventStore.DayGrain, asOf,
      retainDays = 15, fpStore = Some(fp)))
    val (_, _, b2, a2, d2) = second(("events", "expire"))
    assert(b2 == a2 && d2 == "nothing past retention")
    val (_, _, cb2, ca2, cd2) = second(("events", "compact"))
    assert(cb2 == ca2 && cd2 == "0 partitions rewritten")
    val (_, _, fb2, fa2, _) = second(("fingerprints", "compact"))
    assert(fb2 == 1 && fa2 == 1)
  }
}
