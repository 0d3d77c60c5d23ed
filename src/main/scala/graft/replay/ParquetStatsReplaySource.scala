package graft.replay

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Time
import graft.core.Time.Nanos

/** Replay source whose cursor runs off parquet FOOTER STATISTICS only — the
  * cluster-scale variant of [[SparkTableDataSource]] (which collects the
  * timestamp column; fine locally, not at 100 TB).
  *
  * Per row group the footer holds min/max of the (long-nanos) timestamp
  * column; `getNext` is the min over row groups not yet passed. That makes
  * `getNext` conservative (a scheduled cycle may find 0 rows when the range
  * is sparse inside a row group). `readTo` stays an exact lazy slice; the
  * same min/max stats drive row-group pruning in the scan, so each cycle
  * reads only the row groups overlapping its window. No data is ever
  * collected. The batch `count` is exact about EMPTINESS (0 vs > 0 — the
  * contract the dag's update suppression relies on) but may overstate the
  * row count when the window only partially covers a row group; see
  * [[DataSource.length]].
  */
final class ParquetStatsReplaySource(
    spark: SparkSession, path: String, tsCol: String,
) extends DataSource[SparkBatch] {

  // One footer read per file: (rowGroupMinTs, rowGroupMaxTs, rowCount).
  private val rowGroups: Array[(Long, Long, Long)] = {
    val conf = new Configuration()
    val fs = new Path(path).getFileSystem(conf)
    val files = {
      val st = fs.getFileStatus(new Path(path))
      if (st.isDirectory)
        fs.listStatus(new Path(path)).toSeq
          .filter(f => f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
      else Seq(st.getPath)
    }
    files.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        // raw footer values scale to nanos by the column's timestamp unit
        val mult = TsNanos.unitMultiplier(
          reader.getFooter.getFileMetaData.getSchema, tsCol)
        reader.getFooter.getBlocks.asScala.map { block =>
          val chunk = block.getColumns.asScala
            .find(_.getPath.toDotString == tsCol)
            .getOrElse(throw new IllegalArgumentException(
              s"Column $tsCol not found in $f"))
          val stats = chunk.getStatistics
          require(stats != null && stats.hasNonNullValue, s"No stats for $tsCol in $f")
          (stats.genericGetMin.asInstanceOf[Number].longValue() * mult,
            stats.genericGetMax.asInstanceOf[Number].longValue() * mult,
            block.getRowCount)
        }.toSeq
      } finally reader.close()
    }.sortBy(_._1).toArray
  }

  private val dfRaw: DataFrame = spark.read.parquet(path)
  private var prevTs: Nanos = Long.MinValue

  /** Earliest/latest timestamp in the file, from footer stats only — lets a
    * replay driver derive its window without scanning data. */
  def minTimestamp: Nanos = rowGroups.iterator.map(_._1).min
  def maxTimestamp: Nanos = rowGroups.iterator.map(_._2).max

  override def readTo(timestamp: Nanos): SparkBatch = {
    val from = prevTs
    val overlapping = rowGroups.filter { case (mn, mx, _) => mx > from && mn <= timestamp }
    // Row groups FULLY inside (from, timestamp] contribute an exact count;
    // partially-overlapping groups only an upper bound. The emptiness gate
    // (count == 0 vs > 0) must be exact — the dag treats an empty batch as
    // "not updated" — so when only partial groups overlap, probe with a
    // limit-1 scan (row-group-pruned by the same stats; cheap, metadata-sized
    // IO) instead of trusting the estimate. `count` may still overstate the
    // exact row count for partial groups (documented on DataSource.length).
    val (full, partial) = overlapping.partition { case (mn, mx, _) =>
      mn > from && mx <= timestamp
    }
    // predicate on the raw column (pushdown + row-group pruning), output
    // normalized to long nanos
    val sliced = TsNanos.slice(dfRaw, tsCol, from, timestamp)
    val exactFull = full.map(_._3).sum
    val count =
      if (exactFull > 0) exactFull + partial.map(_._3).sum
      else if (partial.nonEmpty && !sliced.isEmpty) partial.map(_._3).sum
      else 0L
    prevTs = timestamp
    SparkBatch(sliced, count)
  }

  override def getNext: Nanos = {
    // materialize before testing emptiness: Iterator.isEmpty invalidates the
    // iterator, so filter to a strict collection first
    val remaining = rowGroups.filter(_._2 > prevTs)
    if (remaining.isEmpty) Time.UtcMax
    else remaining.iterator.map { case (mn, _, _) => math.max(mn, prevTs + 1) }.min
  }

  override def length(data: SparkBatch): Int =
    math.min(data.count, Int.MaxValue).toInt
}
