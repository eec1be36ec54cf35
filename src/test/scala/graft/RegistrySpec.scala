package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the registry itself. The registry is
  * assembled by concatenating seven per-module lists and collapsing to a
  * Map — a DUPLICATE name would silently drop an entry (the Map keeps
  * the last), and the driver's correctness gate would simply never see
  * the shadowed operator. These guards make registration mistakes loud
  * at test time instead of invisible at judge time. */
class RegistrySpec extends AnyFunSuite {

  test("registry names are unique — nothing is silently shadowed by toMap") {
    // re-assemble the same concatenation queries/oracleSql collapse from
    val names = Seq(
      graft.queries.ReferenceQueries.all.map(_._1),
      graft.queries.ReferenceQueries.allNoOracle.map(_._1),
      graft.queries.TpchQueries.all.map(_._1),
      graft.queries.ExtendedQueries.all.map(_._1),
      graft.queries.CurationQueries.all.map(_._1),
      graft.streaming.StreamingQueries.all.map(_._1),
      graft.queries.InfraQueries.all.map(_._1),
      graft.streaming.PipelineMetrics.all.map(_._1)).flatten
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate registry names shadow entries: $dups")
    assert(names.size == SparkEntry.queries.size,
      "queries map lost entries relative to the concatenated registry")
  }

  test("every oracle belongs to a registered query and names follow the convention") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    val pattern = "^[a-z]\\d{2}[a-z0-9_]*$".r
    val bad = qs.filterNot(n => pattern.matches(n))
    assert(bad.isEmpty, s"names outside the <letter><2 digits>_<slug> convention: $bad")
  }

  test("oracle SQL strings are non-empty and DuckDB-shaped (no Spark-only syntax)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // cheap lints for the two drifts that have bitten: Spark interval
      // literal syntax and unaliased aggregates are the usual suspects —
      // the full check is the driver's DuckDB run; these catch paste-os
      assert(!sql.contains("timestamp_micros("),
        s"$name: Spark-only function in oracle SQL")
      assert(!sql.toLowerCase.contains("interval 1 minutes"),
        s"$name: Spark interval plural in DuckDB SQL")
    }
  }

  test("flagship entry returns rows on sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
