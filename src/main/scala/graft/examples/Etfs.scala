package graft.examples

import graft.core.Dag
import graft.core.Time.Nanos

/** The flagship incremental ETF-NAV dataflow
  * (reference `examples/etfs.py`): latest-price and latest-composition
  * keyed states, delta-driven recomputation of only the ETFs touched by an
  * update, null NAV when a constituent price is missing. */
object Etfs {

  final case class PriceRecord(timestamp: Nanos, ticker: String, price: Option[Double])
  final case class EtfComposition(timestamp: Nanos, ticker: String, weights: Map[String, Double])

  /** reference `GetLatest` (`examples/etfs.py:34-43`). */
  final class GetLatest[K, V](keyOf: V => K) extends (List[V] => Map[K, V]) {
    private var latest = Map.empty[K, V]
    def apply(updates: List[V]): Map[K, V] = {
      updates.foreach(u => latest += keyOf(u) -> u)
      latest
    }
  }

  /** reference `calculate_nav` (`examples/etfs.py:70-91`): weighted average,
    * None when any constituent is missing. */
  def calculateNav(composition: EtfComposition, prices: Map[String, PriceRecord]): PriceRecord = {
    var timestamp = composition.timestamp
    var quotient = 0.0
    var dividend = 0.0
    var error = false
    composition.weights.foreach { case (ticker, weight) =>
      prices.get(ticker) match {
        case None => error = true
        case Some(p) =>
          quotient += p.price.getOrElse(0.0) * weight
          dividend += weight
          timestamp = math.max(timestamp, p.timestamp)
      }
    }
    PriceRecord(timestamp, composition.ticker,
      if (dividend == 0.0 || error) None else Some(quotient / dividend))
  }

  /** reference `calculate_navs` (`examples/etfs.py:94-107`): recompute only
    * ETFs touched by the update set (incremental view maintenance). */
  def calculateNavs(updatedTickers: Set[String],
      compositions: Map[String, EtfComposition],
      prices: Map[String, PriceRecord]): List[PriceRecord] =
    compositions.values.iterator
      .filter(c => updatedTickers.contains(c.ticker) ||
        c.weights.keySet.intersect(updatedTickers).nonEmpty)
      .map(calculateNav(_, prices))
      .toList

  def getUpdatedTickers(prices: List[PriceRecord],
      compositions: List[EtfComposition]): Set[String] =
    prices.map(_.ticker).toSet ++ compositions.map(_.ticker)

  /** reference `create_dag` (`examples/etfs.py:118-134`). */
  def createDag(): Dag = {
    val dag = new Dag
    val priceStream = dag.sourceStream(List.empty[PriceRecord], name = "price")
    val compositionStream = dag.sourceStream(List.empty[EtfComposition], name = "etf_composition")
    val priceLatest = dag.state(priceStream)(new GetLatest[String, PriceRecord](_.ticker))
    val compositionLatest =
      dag.state(compositionStream)(new GetLatest[String, EtfComposition](_.ticker))
    val updatedTickers = dag.stream2(priceStream, compositionStream)(Set.empty[String])(
      getUpdatedTickers)
    val updatedNavs = dag.stream3(updatedTickers, compositionLatest, priceLatest)(
      List.empty[PriceRecord])(calculateNavs)
    dag.sink("etf_price", updatedNavs)
    dag
  }
}
