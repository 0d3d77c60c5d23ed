package graft.examples

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Time
import graft.core.Time.Nanos
import graft.examples.Etfs.{EtfComposition, PriceRecord}
import graft.testing.DagTestBench

/** Flagship end-to-end mirroring `/root/reference/tests/test_etfs.py`. */
class EtfSpec extends AnyFunSuite {

  val t0: Nanos = Time.parse("2023-06-10T12:00:00Z")
  def plusSec(n: Long): Nanos = t0 + n * 1000000000L

  test("ETF NAV dag: incremental recompute, suppression, missing prices") {
    val bench = new DagTestBench(Etfs.createDag())

    // Price and ETF come in:
    bench
      .setSource("price", List(
        PriceRecord(t0, "AAPL", Some(180.0)),
        PriceRecord(t0, "GOOG", Some(120.0))))
      .setSource("etf_composition", List(
        EtfComposition(t0, "TECH", Map("AAPL" -> 1.0, "GOOG" -> 1.5))))
      .execute(t0)
      .assertSinkList("etf_price", Seq(PriceRecord(t0, "TECH", Some(144.0))))

    // AAPL price update propagates to TECH:
    val t1 = plusSec(1)
    bench
      .setSource("price", List(PriceRecord(t1, "AAPL", Some(200.0))))
      .execute(t1)
      .assertSinkList("etf_price", Seq(PriceRecord(t1, "TECH", Some(152.0))))

    // Unrelated price update: sink NOT updated (delta-driven recompute):
    val t2 = plusSec(2)
    bench
      .setSource("price", List(PriceRecord(t2, "MSFT", Some(330.0))))
      .execute(t2)
      .assertSinkNotUpdated("etf_price")

    // New ETF using the (previously unrelated) MSFT price:
    val t3 = plusSec(4)
    bench
      .setSource("etf_composition", List(
        EtfComposition(t3, "SOFT", Map("MSFT" -> 0.5, "GOOG" -> 1.0))))
      .execute(t3)
      .assertSinkList("etf_price", Seq(PriceRecord(t3, "SOFT", Some(190.0))))

    // ETF extends with a missing constituent price -> null NAV:
    val t4 = plusSec(4)
    bench
      .setSource("etf_composition", List(
        EtfComposition(t4, "SOFT", Map("MSFT" -> 0.5, "GOOG" -> 1.0, "ORCL" -> 0.5))))
      .execute(t4)
      .assertSinkList("etf_price", Seq(PriceRecord(t4, "SOFT", None)))
  }
}
