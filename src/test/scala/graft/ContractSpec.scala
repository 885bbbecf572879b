package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the harness keys its correctness gate on
  * SparkEntry.queries / oracleSql, so wiring mistakes (an oracle whose
  * query was renamed, a duplicate key silently dropped by ++) must fail
  * here, not in the driver's report. */
class ContractSpec extends AnyFunSuite {

  test("every oracleSql key has a corresponding query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("module query maps do not collide (++ would silently drop)") {
    import graft.queries._
    val maps = Seq(
      "Relational" -> Relational.defs.keySet, "Windows" -> Windows.defs.keySet,
      "Shapes" -> Shapes.defs.keySet, "Funcs" -> Funcs.defs.keySet,
      "TimeOps" -> TimeOps.defs.keySet, "PipelineOps" -> PipelineOps.defs.keySet,
      "MetaOps" -> MetaOps.defs.keySet, "TpchSql" -> TpchSql.defs.keySet)
    maps.combinations(2).foreach { case Seq((na, a), (nb, b)) =>
      val overlap = a & b
      assert(overlap.isEmpty, s"$na and $nb both define: $overlap")
    }
    assert(SparkEntry.queries.size == maps.map(_._2.size).sum)
  }

  test("inventory size matches the documented counts") {
    assert(SparkEntry.queries.size == 200,
      s"queries=${SparkEntry.queries.size} — update README/ContractSpec together")
    assert(SparkEntry.oracleSql.size == 181,
      s"oracles=${SparkEntry.oracleSql.size} — update README/ContractSpec together")
  }
}
