package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Physical-plan regression guards: the properties that make these queries
  * scale must survive refactors — filters/projections on the scan, broadcast
  * dimension joins, map-side partial aggregation, top-k without full sort. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter and projection reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)") || p.contains("GreaterThanOrEqual(l_quantity,49.0)"))
    assert(!p.contains("l_shipdate"), "pruned columns must not be read")
  }

  test("q04: star joins broadcast, no sort-merge join") {
    val p = plan("q04_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q08: last-by-key is a partial max_by aggregate, not a window sort") {
    val p = plan("q08_last_by_key")
    assert(p.contains("partial_max_by"))
    assert(!p.contains("Window"))
  }

  test("q11: top-k plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q11_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q01: aggregate has a map-side partial stage") {
    val p = plan("q01_groupby_sum")
    assert(p.contains("partial_sum"))
  }

  test("q29: pair scan uses the codegen vec_dot kernel") {
    val p = plan("q29_cosine_neardup")
    assert(p.contains("graft_vec_dot"))
  }

  test("q42: LSH near-dup has NO cross/all-pairs join — bucket-keyed joins only") {
    val p = plan("q42_embedding_neardup_lsh")
    assert(!p.contains("CartesianProduct"), "no cross product anywhere")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no conditional all-pairs join")
    assert(p.contains("graft_rhp_sig"), "signatures come from the codegen expression")
    assert(p.contains("graft_vec_dot"), "verify stage uses the codegen dot kernel")
  }

  test("q41: the LSH-routed dedup pipeline is also free of all-pairs joins") {
    val p = plan("q41_embedding_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
