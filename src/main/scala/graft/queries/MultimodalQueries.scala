package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-plumbing queries: documents get deterministic synthetic
  * media payloads (seeded by doc_id), which flow through the binary
  * column → batched decode → metadata pipeline. Because the synthetic
  * dimensions are pure arithmetic in doc_id, the full binary round-trip
  * has an exact DuckDB oracle — the oracle recomputes the arithmetic,
  * the Spark side actually encodes and decodes bytes.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "m01_media_meta" -> ((s, dir) => {
      import s.implicits._
      val withMedia = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .map(id => (id, Multimodal.synthesize(id)))
      Multimodal.extractMeta(withMedia)
        .select($"id".as("doc_id"), $"kind",
          $"width".cast("long").as("width"), $"height".cast("long").as("height"),
          $"payload_bytes")
        .orderBy($"doc_id")
    }),

    "m02_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val vids = Tables.load(s, dir, "documents")
        .select($"doc_id").as[Long]
        .map(id => (id, Multimodal.synthesize(id, Multimodal.Kind.Video)))
      Multimodal.frameSample(vids, everyK = 10)
        .groupBy($"id".as("doc_id")).agg(count(lit(1)).as("n_sampled"))
        .orderBy($"doc_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // width = 64 + (doc_id * 7919) % 1216; height = 64 + (doc_id * 104729) % 656
    "m01_media_meta" ->
      """SELECT doc_id, 'image' AS kind,
        |CAST(64 + (doc_id * 7919) % 1216 AS BIGINT) AS width,
        |CAST(64 + (doc_id * 104729) % 656 AS BIGINT) AS height,
        |CAST(16 AS BIGINT) AS payload_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    // video frames = 1 + doc_id % 120, sampled every 10th → ceil(n/10)
    "m02_frame_sample" ->
      """SELECT doc_id, CAST(((1 + doc_id % 120) + 9) // 10 AS BIGINT) AS n_sampled
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
