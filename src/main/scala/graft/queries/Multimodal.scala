package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaOps, MediaRecord}

/** Multimodal-column queries — binary payloads built from `documents` (the
  * only deterministic byte source in the fixtures; texts are ASCII so byte
  * counts equal `n_chars`, which the oracle exploits).
  */
object Multimodal {

  /** Binary payload → per-partition stub decode → typed features. The stub
    * decode is pure arithmetic on byte length/values, so the DuckDB oracle
    * reproduces it exactly — verifying the full binary-column path: cast to
    * bytes, Dataset[MediaRecord] encoding, mapPartitions batch shape,
    * feature schema. */
  val mm01MediaFeatures = Q(
    "mm01_media_features",
    (s, dir) => {
      import s.implicits._
      val media = MediaOps
        .mediaFrame(Tables.documents(s, dir), "doc_id", "text", "source")
        .select(
          col("media_id"), col("payload"), col("meta.format").as("format"))
        .as[MediaRecord]
      MediaOps.extractFeatures(media)
        .toDF()
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id, source AS format,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
      CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height,
      CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE)
        / octet_length(encode(text)) AS luma
    FROM documents ORDER BY media_id"""))

  val all: Seq[Q] = Seq(mm01MediaFeatures)
}
