package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned parquet corpus writer — the publish side of a curation
  * pipeline, shaped for the two failure modes that kill corpus writes
  * at scale:
  *
  *  - **Small files**: without co-location, EVERY task holding rows of
  *    a partition value opens its own file there — `tasks ×
  *    partition-values` files (a 2000-task job over 100 languages is
  *    200k files per write). One shuffle on the partition columns
  *    routes each value to one task → one file.
  *  - **Hot partitions**: co-locating naively sends a dominant value
  *    (the `en` of a web corpus — often >50% of rows) to ONE task,
  *    serializing the write and overflowing its disk. `filesPerPart`
  *    salts the shuffle with a deterministic row hash so a hot value
  *    spreads over UP TO that many tasks/files (an upper bound: salt
  *    groups are hash-placed, so they spread in expectation — with
  *    shuffle partitions ≫ filesPerPart, collapsing onto one task is
  *    vanishingly unlikely), while small values still land in few
  *    files. With AQE partition coalescing on (the default), salt
  *    groups that turn out SMALL are folded back together before the
  *    write — so filesPerPart only takes effect where row volume
  *    actually justifies more files, and the small-files guarantee
  *    survives the salting.
  *
  * `maxRecordsPerFile` bounds file size from the other side — a salted
  * task that still holds too many rows rolls over to a new file
  * instead of writing one huge one. At 100 TB: pick filesPerPart ≈
  * (largest partition's bytes) / (target file size ~512 MB), and the
  * layout stays scan-friendly (readers get partition pruning on the
  * directory keys; each file is one task's sequential write).
  */
object CorpusSink {

  /** Write `df` under `path` as `partitionCols`-keyed parquet dirs
    * (`col=value/…`). Deterministic layout: the salt is a pure
    * function of the row, so reruns place rows identically.
    *
    * `sortBy` orders rows INSIDE each file (a task-local sort — no
    * extra shuffle: the partition-column sort the dynamic-partition
    * writer needs anyway is extended with these keys). Parquet keeps
    * min/max statistics per row group, so sorting by the columns
    * readers filter on (doc ids, timestamps) turns those filters into
    * row-group skips — the query-aligned layout that matters once a
    * partition holds thousands of files. */
  def writeParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                   filesPerPart: Int = 1,
                   maxRecordsPerFile: Long = 1000000L,
                   sortBy: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite,
                   writerOptions: Map[String, String] = Map.empty): Unit = {
    require(partitionCols.nonEmpty, "corpus writes need partition columns")
    val missing = (partitionCols ++ sortBy).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns $missing not in frame")
    require(filesPerPart >= 1 && maxRecordsPerFile >= 1)
    val routed =
      if (filesPerPart == 1) df.repartition(partitionCols.map(col): _*)
      else df.repartition((partitionCols.map(col) :+
        pmod(hash(df.columns.map(col): _*), lit(filesPerPart))): _*)
    val laid =
      if (sortBy.isEmpty) routed
      else routed.sortWithinPartitions((partitionCols ++ sortBy).map(col): _*)
    laid.write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .options(writerOptions)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
