package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * stages as partition-wise batch functions.
  *
  * The Spark-side plumbing — schema, binary payloads, partition-batched
  * UDF shape, metadata struct — is real and tested. The actual media
  * decode is STUBBED (`fakeDecode`): the container has no image/audio
  * libraries, so the stub derives deterministic pseudo-features from the
  * payload bytes. Swapping in a real decoder changes only the body of
  * `fakeDecode`; the dataflow (mapPartitions over batches, one output
  * row per asset, fixed-width feature vector) is exactly what a JNI/
  * FFmpeg/JPEG decoder would use at scale. On a real pipeline this stage
  * runs after a size/paranoia filter and is the natural GPU boundary.
  */
object Multimodal {

  val FeatureDim = 4

  final case class AssetMeta(nBytes: Long, sig: String)

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("sig", StringType),
    StructField("features", ArrayType(DoubleType))))

  /** STUB decoder: deterministic fake features from payload length.
    * Replace with a real media decode (JPEG/PNG/audio frames) — the
    * `Iterator`-of-batches shape below is unchanged by that swap. */
  private def fakeDecode(payload: Array[Byte]): Array[Double] =
    Array.tabulate(FeatureDim)(i => ((payload.length.toLong * (i + 7)) % 256).toDouble)

  /** Binary-asset pipeline: documents(id, payload binary) → one row per
    * asset with metadata + feature vector. Partition-wise iteration (the
    * mapInPandas/mapPartitions batch shape) keeps per-batch setup — a
    * real decoder's codec init — amortized. */
  def extractFeatures(assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = assets.sparkSession
    val in = assets.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    implicit val enc = RowEncoder.encoderFor(outputSchema)
    in.mapPartitions { rows =>
      // per-partition setup happens once (codec/model init in real life)
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        digest.reset()
        val sig = digest.digest(payload).map("%02x".format(_)).mkString
        Row(id, payload.length.toLong, sig, fakeDecode(payload))
      }
    }
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("byte_offset", LongType),
    StructField("frame_bytes", LongType),
    StructField("frame_sig", StringType)))

  /** Frame-sampling plumbing for video-shaped payloads: emit every
    * `stride`-th fixed-size frame window of the payload (up to
    * `maxFrames` per asset), one OUTPUT ROW PER FRAME — the 1→N explode
    * a real container demuxer produces. The frame "decode" is the same
    * honest stub (byte-window signature); the dataflow — partition-wise
    * iterator, per-asset bounded fan-out, frame index + byte offset
    * metadata — is exactly the shape a keyframe sampler has at scale,
    * where the downstream embed/dedup stages key on (doc_id, frame_idx).
    */
  def sampleFrames(assets: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, stride: Int, maxFrames: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0)
    val in = assets.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    implicit val enc = RowEncoder.encoderFor(frameSchema)
    in.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val starts = (0 until maxFrames).iterator
          .map(k => k.toLong * stride * frameBytes)
          .takeWhile(_ < payload.length)
        starts.zipWithIndex.map { case (off, idx) =>
          val end = math.min(off + frameBytes, payload.length.toLong).toInt
          digest.reset()
          val sig = digest.digest(
            java.util.Arrays.copyOfRange(payload, off.toInt, end))
            .map("%02x".format(_)).mkString
          Row(id, idx.toLong, off, (end - off).toLong, sig)
        }
      }
    }
  }

  val keyframeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("byte_offset", LongType),
    StructField("frame_bytes", LongType),
    StructField("level", LongType),
    StructField("keep_rank", LongType)))

  /** KEYFRAME selection — the real demuxer behavior ([[sampleFrames]]'
    * fixed stride is the fallback): scan every consecutive
    * `frameBytes`-sized frame of the payload and EMIT ONLY FRAMES WHOSE
    * SIGNATURE CHANGED from the previously kept frame, up to `maxKeep`
    * kept frames per asset. The signature is the honest stub's coarse
    * level — `sum(unsigned bytes) DIV levelDiv`, the "scene luma" a real
    * decoder would derive from pixel data — deterministic and
    * reproducible by the oracle from the same bytes. Because a frame is
    * skipped only when it EQUALS the last kept signature, comparing to
    * the previous kept frame and comparing to the previous frame are
    * provably the same rule (the last kept signature always equals the
    * previous frame's — a skipped frame matched it), which is what lets
    * the SQL oracle express the scan as a lag. Same partition-wise
    * iterator shape as [[sampleFrames]]; per-asset output is bounded by
    * `maxKeep`, per-asset work by the payload scan a demuxer does
    * anyway. */
  def sampleKeyframes(assets: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int, maxKeep: Int, levelDiv: Long = 1024L): DataFrame = {
    require(frameBytes > 0 && maxKeep > 0 && levelDiv > 0)
    val in = assets.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    implicit val enc = RowEncoder.encoderFor(keyframeSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var idx = 0L
        var off = 0L
        var lastKept = Long.MinValue
        while (off < payload.length && out.length < maxKeep) {
          val end = math.min(off + frameBytes, payload.length.toLong).toInt
          var sum = 0L
          var i = off.toInt
          while (i < end) { sum += payload(i) & 0xff; i += 1 }
          val level = sum / levelDiv
          if (level != lastKept) {
            lastKept = level
            out += Row(id, idx, off, (end - off).toLong, level,
              out.length + 1L)
          }
          idx += 1L
          off += frameBytes
        }
        out
      }
    }
  }

  /** Modality-mixed batch assembly — "every training batch holds
    * exactly q_m samples of each modality" (3 text : 1 image is the
    * classic VLM mix): per modality, rows take a deterministic
    * hash-shuffled rank; batch `rk DIV q_m`, slot `offset_m + rk MOD
    * q_m` (modalities own disjoint slot ranges, so a batch reads as
    * one ordered record). Only COMPLETE global batches survive:
    * `B = min_m (n_m DIV q_m)` — the scarcest modality bounds the
    * epoch, the same never-upsample stance as [[Sampling.sourceMix]].
    *
    * Shape: one rank window per modality (they share the modality
    * exchange) + a #modalities-row quota frame broadcast back — the
    * corpus streams through once; nothing global. Deterministic: hash
    * coins, no RNG — the same batch layout on every engine, every
    * re-run, any partitioning. An unknown modality value fails loudly
    * (a silent otherwise-null would drop its rows from every batch).
    * Emits `batch`, `slot`; read order is (batch, slot). */
  def batchMix(df: DataFrame, modalityCol: String, idCol: String,
      quotas: Seq[(String, Int)], seed: Int = 0): DataFrame = {
    require(quotas.nonEmpty && quotas.forall(_._2 >= 1),
      "every modality quota must be >= 1")
    require(quotas.map(_._1).distinct.length == quotas.length,
      "duplicate modality in quotas")
    val offsets = quotas.scanLeft(0) { case (acc, (_, q)) => acc + q }.init
    def pick(vals: Seq[(String, Long)]): Column =
      vals.foldRight(raise_error(concat(
          lit(s"batchMix: unknown $modalityCol "), col(modalityCol)))
            .cast("long")) { case ((m, v), els) =>
        when(col(modalityCol) === m, lit(v)).otherwise(els)
      }
    // quota/offset evaluate BEFORE the quota join: an input modality
    // outside the quota list raises at scan time — after an inner join
    // it would be silently dropped instead, the exact silent-wrong the
    // guard exists for
    val guarded = df
      .withColumn("__q", pick(quotas.map { case (m, q) => m -> q.toLong }))
      .withColumn("__off", pick(quotas.map(_._1).zip(offsets.map(_.toLong))))
    // anchor the batch bound on the QUOTA list, not the present
    // modalities: a modality with a quota but no rows must yield ZERO
    // complete batches (batches with silently missing slots would
    // violate "every batch holds q_m of each"), so absent → count 0
    val quotaRows = df.sparkSession
      .createDataFrame(quotas.map { case (m, q) => (m, q.toLong) })
      .toDF(modalityCol, "__qq")
    val counts = quotaRows
      .join(df.groupBy(col(modalityCol)).agg(count(lit(1)).as("__n")),
        Seq(modalityCol), "left")
      .withColumn("__B",
        min(expr("coalesce(__n, 0) DIV __qq")).over(Window.partitionBy()))
      .select(col(modalityCol), col("__B"))
    val h = Hashing.h60(seed, col(idCol).cast("string"))
    val rk = row_number().over(Window.partitionBy(col(modalityCol))
      .orderBy(h.asc, col(idCol).asc)) - 1
    guarded.join(broadcast(counts), modalityCol)
      .withColumn("__rk", rk)
      .withColumn("batch", call_function("div", col("__rk"), col("__q")))
      .filter(col("batch") < col("__B"))
      .withColumn("slot", col("__off") + pmod(col("__rk"), col("__q")))
      .drop("__rk", "__B", "__q", "__off")
  }
}
