package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.ByteBuffer

/** m03: the video leg of the multimodal family (SURVEY.md §2C) —
  * frame sampling, the canonical big-corpus video op: decode every
  * Nth frame, never touch the rest.
  *
  * Real video codecs aren't in this container, so the CONTAINER is
  * ours (a length-prefixed PNG frame sequence) but everything else is
  * real: each frame is genuine PNG bytes (JDK `javax.imageio`
  * encode), the sampler walks the container with a real
  * length-prefix parser, and — the part that matters at 100 TB —
  * frames that aren't sampled are SKIPPED with a pointer bump, never
  * decoded. Swap the frame slicer for an MP4/MKV demuxer binding and
  * the Spark-side shape (schema, per-partition codec scope, flatMap
  * row explosion, stride semantics) is unchanged.
  *
  * Frame CONTENT is deterministic in (doc_id, frame_idx) — same
  * linear-congruential grays as m01 — so PNG losslessness makes every
  * decoded statistic closed-form integer arithmetic the DuckDB oracle
  * reproduces with generate_series.
  */
object Video {

  /** Sampling stride: decode frames 0, 3, 6, … */
  val FrameStride = 3

  private val Magic = 0x47564944 // "GVID"

  private def nFramesOf(id: Long): Int = (4 + id % 9).toInt
  private def widthOf(id: Long): Int = (8 + id % 17).toInt
  private def heightOf(id: Long): Int = (8 + (id * 5) % 17).toInt
  private def pixelOf(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt

  /** Encode one video: GVID magic, frame count, then per frame a
    * 4-byte length prefix + real PNG bytes.
    */
  def videoBytes(id: Long, writer: javax.imageio.ImageWriter,
      bos: java.io.ByteArrayOutputStream): Array[Byte] = {
    val n = nFramesOf(id)
    val w = widthOf(id)
    val h = heightOf(id)
    val frames = (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, pixelOf(id, f, x, y))
          x += 1
        }
        y += 1
      }
      bos.reset()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.close()
      bos.toByteArray
    }
    val buf = ByteBuffer.allocate(8 + frames.map(4 + _.length).sum)
    buf.putInt(Magic).putInt(n)
    frames.foreach { png => buf.putInt(png.length).put(png) }
    buf.array()
  }

  /** Synthesize the video table: payload = framed PNG sequence,
    * metadata struct queryable without decoding.
    */
  def videoTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").next()
        val bos = new java.io.ByteArrayOutputStream(4096)
        it.map { id =>
          (id, videoBytes(id, writer, bos), nFramesOf(id),
            widthOf(id), heightOf(id))
        }
      }
      .toDF("media_id", "payload", "nf", "w", "h")
      .select(col("media_id"), col("payload"),
        struct(
          octet_length(col("payload")).as("n_bytes"),
          col("nf").as("n_frames"),
          col("w").as("width"), col("h").as("height"),
          lit("video/x-png-frames").as("mime")).as("meta"))
  }

  /** Walk the container and decode every `stride`-th frame; emit one
    * row per SAMPLED frame. Unsampled frames are skipped by their
    * length prefix — zero decode cost, which is why stride sampling
    * is linear in sampled (not total) frames at corpus scale.
    */
  def sampleFrames(videos: DataFrame, stride: Int): DataFrame = {
    import videos.sparkSession.implicits._
    videos
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        it.flatMap { case (id, bytes) =>
          // per-VIDEO corrupt policy (see Multimodal.decode): a
          // malformed container yields one `_corrupt` row, never a
          // stage failure. Sampled-frame STAT tuples are buffered so
          // the walk completes inside the try (frames themselves still
          // decode streaming, one at a time).
          try {
            val buf = ByteBuffer.wrap(bytes)
            require(buf.getInt() == Magic, "not a GVID payload")
            val n = buf.getInt()
            val out = Vector.newBuilder[(Long, Option[Int], Option[Int],
              Option[Int], Option[Int], Option[Long], Option[Int],
              Option[Int], Int)]
            var f = 0
            while (f < n) {
              require(buf.remaining() >= 4, "truncated frame header")
              val len = buf.getInt()
              require(len >= 0 && len <= buf.remaining(),
                "frame length out of bounds")
              if (f % stride != 0) {
                buf.position(buf.position() + len) // skip: no decode
              } else {
                val png = new Array[Byte](len)
                buf.get(png)
                val iis = javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(png))
                reader.setInput(iis)
                val img = reader.read(0)
                val raster = img.getRaster
                val w = img.getWidth
                val h = img.getHeight
                var sum = 0L
                var mn = 255
                var mx = 0
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val v = raster.getSample(x, y, 0)
                    sum += v
                    if (v < mn) mn = v
                    if (v > mx) mx = v
                    x += 1
                  }
                  y += 1
                }
                out += ((id, Some(f), Some(n), Some(w), Some(h), Some(sum),
                  Some(mn), Some(mx), 0))
              }
              f += 1
            }
            out.result().iterator
          } catch {
            case scala.util.control.NonFatal(_) =>
              Iterator.single((id, Option.empty[Int], Option.empty[Int],
                Option.empty[Int], Option.empty[Int], Option.empty[Long],
                Option.empty[Int], Option.empty[Int], 1))
          }
        }
      }
      .toDF("media_id", "frame_idx", "n_frames", "width", "height",
        "px_sum", "px_min", "px_max", "_corrupt")
  }

  /** The video table staged to parquet once (MediaStage) — m03 times
    * container-walk + stride-decode over stored payloads, the corpus
    * shape.
    */
  def stagedVideoTable(s: SparkSession, dir: String): DataFrame =
    MediaStage.staged(s, dir, "vid")(videoTable(s, dir))

  /** Bench warm-up hook: materialize the staged payloads. */
  def ensureStaged(s: SparkSession, dir: String): Unit =
    stagedVideoTable(s, dir)

  /** m03 query: stride-sample → decode over real stored framed PNG
    * payloads; every column deterministic integer arithmetic.
    */
  def q(s: SparkSession, dir: String): DataFrame =
    sampleFrames(stagedVideoTable(s, dir), FrameStride)
      .filter(col("_corrupt") === 0)
      .select(col("media_id"), col("frame_idx"), col("n_frames"),
        col("width"), col("height"), col("px_sum"), col("px_min"),
        col("px_max"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Scene-change threshold on the mean absolute pixel delta between
    * consecutive frames (0-255 gray scale).
    */
  val SceneThreshold = 30.0

  /** m05: scene-change detection — decode CONSECUTIVE frames, score
    * each adjacent pair by mean absolute pixel delta, flag pairs above
    * [[SceneThreshold]]. The shape that matters at corpus scale: the
    * whole comparison is ROW-LOCAL (one video = one payload row; the
    * previous frame's gray buffer is carried in the walker, never
    * shuffled), so scene segmentation of a 100 TB video corpus is a
    * scan — same class as t01-t05. Emits one row per adjacent pair;
    * mean delta is quantized at 1e-6 from exact integer pixel sums
    * (§8 discipline) so the generate_series oracle reproduces it
    * bit-for-bit.
    */
  def sceneChanges(videos: DataFrame): DataFrame = {
    import videos.sparkSession.implicits._
    videos
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        it.flatMap { case (id, bytes) =>
          // per-VIDEO corrupt policy — see sampleFrames
          try {
            val buf = ByteBuffer.wrap(bytes)
            require(buf.getInt() == Magic, "not a GVID payload")
            val n = buf.getInt()
            var prev: Array[Int] = null
            val out = Vector.newBuilder[(Long, Option[Int], Option[Int],
              Option[Int], Option[Long], Option[Double], Option[Int], Int)]
            var f = 0
            while (f < n) {
              require(buf.remaining() >= 4, "truncated frame header")
              val len = buf.getInt()
              require(len >= 0 && len <= buf.remaining(),
                "frame length out of bounds")
              val png = new Array[Byte](len)
              buf.get(png)
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(png))
              reader.setInput(iis)
              val img = reader.read(0)
              val raster = img.getRaster
              val w = img.getWidth
              val h = img.getHeight
              val cur = new Array[Int](w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  cur(y * w + x) = raster.getSample(x, y, 0)
                  x += 1
                }
                y += 1
              }
              if (prev != null) {
                var sumAbs = 0L
                var i = 0
                while (i < cur.length) {
                  sumAbs += math.abs(cur(i) - prev(i))
                  i += 1
                }
                val mean6 = math.floor(
                  sumAbs.toDouble / cur.length * 1e6 + 0.5) / 1e6
                out += ((id, Some(f), Some(w), Some(h), Some(sumAbs),
                  Some(mean6), Some(if (mean6 > SceneThreshold) 1 else 0),
                  0))
              }
              prev = cur
              f += 1
            }
            out.result().iterator
          } catch {
            case scala.util.control.NonFatal(_) =>
              Iterator.single((id, Option.empty[Int], Option.empty[Int],
                Option.empty[Int], Option.empty[Long], Option.empty[Double],
                Option.empty[Int], 1))
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "abs_delta_sum",
        "mean_delta6", "scene_change", "_corrupt")
  }

  /** m05 query: consecutive-frame deltas over the stored payloads. */
  def qScenes(s: SparkSession, dir: String): DataFrame =
    sceneChanges(stagedVideoTable(s, dir))
      .filter(col("_corrupt") === 0)
      .select(col("media_id"), col("frame_idx"), col("width"),
        col("height"), col("abs_delta_sum"), col("mean_delta6"),
        col("scene_change"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Per-SAMPLED-frame aHash over the container walk — m03's stride
    * skip (unsampled frames cost a pointer bump, never a decode) with
    * m06's 8×8 NN-resample fingerprint per decoded frame; one row per
    * sampled frame, per-video corrupt policy.
    */
  def frameHashes(videos: DataFrame, stride: Int): DataFrame = {
    import videos.sparkSession.implicits._
    videos
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        it.flatMap { case (id, bytes) =>
          try {
            val buf = ByteBuffer.wrap(bytes)
            require(buf.getInt() == Magic, "not a GVID payload")
            val n = buf.getInt()
            val out = Vector.newBuilder[(Long, Option[Int], Option[Long],
              Option[Long], Int)]
            var f = 0
            while (f < n) {
              require(buf.remaining() >= 4, "truncated frame header")
              val len = buf.getInt()
              require(len >= 0 && len <= buf.remaining(),
                "frame length out of bounds")
              if (f % stride != 0) {
                buf.position(buf.position() + len) // skip: no decode
              } else {
                val png = new Array[Byte](len)
                buf.get(png)
                val iis = javax.imageio.ImageIO.createImageInputStream(
                  new java.io.ByteArrayInputStream(png))
                reader.setInput(iis)
                val img = reader.read(0)
                val raster = img.getRaster
                val w = img.getWidth
                val h = img.getHeight
                val p = new Array[Int](64)
                var sum = 0L
                var y = 0
                while (y < 8) {
                  val sy = y * h / 8
                  var x = 0
                  while (x < 8) {
                    val v = raster.getSample(x * w / 8, sy, 0)
                    p(y * 8 + x) = v
                    sum += v
                    x += 1
                  }
                  y += 1
                }
                var lo = 0L
                var hi = 0L
                var i = 0
                while (i < 64) {
                  if (p(i) * 64L > sum) {
                    if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
                  }
                  i += 1
                }
                out += ((id, Some(f), Some(lo), Some(hi), 0))
              }
              f += 1
            }
            out.result().iterator
          } catch {
            case scala.util.control.NonFatal(_) =>
              Iterator.single((id, Option.empty[Int], Option.empty[Long],
                Option.empty[Long], 1))
          }
        }
      }
      .toDF("media_id", "frame_idx", "h_lo", "h_hi", "_corrupt")
  }

  /** m08: VIDEO near-dup via frame-fingerprint overlap — the video
    * twin of m06's image dedup: a re-encoded / re-uploaded copy of a
    * video shares its frames' perceptual hashes even though the
    * container bytes differ entirely. Overlap(A,B) =
    * |hashset(A) ∩ hashset(B)| / min(|A|, |B|) over the SAMPLED
    * frames' distinct aHashes — the min-denominator makes a clipped
    * or trimmed copy (a strict subset of frames) still score 1.0.
    * Exact integer ratio; pairs at overlap ≥ τ.
    *
    * Scale shape: candidates come from an equi-join on the 64-bit
    * frame hash — never all-pairs over videos — with d04's stoplist
    * guard: a hash shared by more than `maxDf` videos (title cards,
    * black frames — the video world's stop-shingles) is dropped
    * before the join, bounding any hash's fan-out. Decode is m03's
    * stride walk: unsampled frames are skipped by length prefix.
    */
  def videoNearDup(s: SparkSession, dir: String, tau: Double = 0.5,
      maxDf: Int = 100): DataFrame =
    videoNearDup(stagedVideoTable(s, dir), tau, maxDf)

  /** m08 core over any (media_id, payload) video table. */
  def videoNearDup(videos: DataFrame, tau: Double,
      maxDf: Int): DataFrame = {
    // fh feeds the stoplist AND the anti-join side, and `cold` below
    // feeds sizes and both pair-join sides — without a cut the frame
    // DECODE subtree (mapPartitions PNG reads, the dominant stage)
    // re-executes up to four times; one cut of the 3-longs-per-frame
    // table runs it once (§8 shared-table discipline)
    val fh = graft.operators.Materialize.cut(
      frameHashes(videos, FrameStride)
        .filter(col("_corrupt") === 0)
        .select(col("media_id"), col("h_lo"), col("h_hi")).distinct())
    val hot = fh.groupBy(col("h_lo"), col("h_hi"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("h_lo"), col("h_hi"))
    val cold = fh.join(hot, Seq("h_lo", "h_hi"), "left_anti")
    val sizes = cold.groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    val a = cold.join(sizes, Seq("media_id"))
      .select(col("media_id").as("id_a"), col("n").as("n_a"),
        col("h_lo"), col("h_hi"))
    val b = cold.join(sizes, Seq("media_id"))
      .select(col("media_id").as("id_b"), col("n").as("n_b"),
        col("h_lo"), col("h_hi"))
    a.join(b, Seq("h_lo", "h_hi"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .withColumn("overlap",
        col("n_shared").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("overlap") >= tau)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("n_a"),
        col("n_b"), col("overlap"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
