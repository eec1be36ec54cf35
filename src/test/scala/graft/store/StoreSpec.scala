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

  test("writer emits files sorted by ts within partitions (row-group skipping)") {
    // read one partition's file back raw and check ts is non-decreasing
    val part = EventStore.read(spark, warehouse).filter(col("day") === "20240110")
    val ts = part.select(col("ts")).collect().map(_.getTimestamp(0).getTime)
    // collect preserves file order per split; a sorted write keeps it sorted
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
  }
}
