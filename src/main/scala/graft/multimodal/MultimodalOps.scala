package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) travels as opaque `binary` columns with a typed
  * metadata struct alongside. The Spark-side machinery — schema,
  * partition-sized batch processing, feature-extraction signatures — is
  * real and tested; the actual codec calls are STUBBED (deterministic
  * fakes) because no image/audio libraries ship in this environment.
  * Swap `decodeStub` for a real decoder (e.g. TwelveMonkeys/JavaCV) and
  * nothing else changes.
  */
object MultimodalOps {

  /** Metadata schema carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wrap a binary payload with (fake-)sniffed metadata. The sniffing
    * here derives deterministic dimensions from the byte length — STUB:
    * a real implementation reads the container header. */
  def sniffMeta(payload: Column): Column = {
    val n = length(payload).cast("long")
    struct(
      when(n % 3 === 0, "png").when(n % 3 === 1, "jpeg").otherwise("webp")
        .as("format"),
      (n % 1024 + 32).cast("int").as("width"),
      ((n / 7) % 1024 + 32).cast("int").as("height"),
      n.as("n_bytes"))
  }

  /** STUB decoder: a real implementation would return pixel data; this
    * returns a deterministic 8-bucket byte histogram as the "decoded"
    * feature so the downstream plumbing (arrays of floats per media item)
    * is exercised end-to-end. Runs per-partition over the raw bytes —
    * the same batch shape a real codec would use. */
  def decodeStub(payload: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) null
      else {
        val hist = new Array[Float](8)
        var i = 0
        while (i < b.length) {
          hist((b(i) & 0xff) >>> 5) += 1f
          i += 1
        }
        if (b.length > 0) {
          var j = 0
          while (j < 8) { hist(j) /= b.length; j += 1 }
        }
        hist.toSeq
      }
    }
    f(payload)
  }

  /** "Resize" stub: maps the feature vector to a fixed target size by
    * linear rebinning — stands in for an image resize kernel, keeping
    * the (array in → array out, size contract) signature. */
  def resizeStub(features: Column, targetSize: Int): Column = {
    val f = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val out = new Array[Float](targetSize)
        var i = 0
        while (i < targetSize) {
          val src = i.toDouble * v.length / targetSize
          out(i) = v(math.min(v.length - 1, src.toInt))
          i += 1
        }
        out.toSeq
      }
    }
    f(features)
  }

  /** Frame sampling stub for video-like payloads: split the byte stream
    * into `n` equal chunks and fingerprint each — stands in for
    * keyframe extraction, exercising the explode-per-media-item shape. */
  def sampleFramesStub(payload: Column, n: Int): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) null
      else (0 until n).map { i =>
        val lo = i * b.length / n
        val hi = math.max(lo + 1, (i + 1) * b.length / n)
        var h = 0xcbf29ce484222325L
        var j = lo
        while (j < math.min(hi, b.length)) {
          h ^= b(j); h *= 0x100000001b3L; j += 1
        }
        h
      }
    }
    f(payload)
  }

  /** Assemble a media table from any binary source column: payload +
    * sniffed metadata + decoded features. One narrow projection — no
    * shuffle; scales with the scan. */
  def mediaTable(df: DataFrame, payload: Column, id: Column): DataFrame =
    df.select(id.as("media_id"), payload.as("payload"))
      .withColumn("meta", sniffMeta(col("payload")))
      .withColumn("features", decodeStub(col("payload")))

  /** Partition-batched decode — the Scala analog of `mapInPandas`: the
    * decoder sees a whole partition's iterator, so a real codec can
    * amortize per-batch setup (native library handles, GPU context,
    * model session) across rows instead of paying it per call like a
    * scalar UDF. Same deterministic histogram as [[decodeStub]] (spec
    * pins parity); swap the inner loop for the real codec and the
    * batch shape, schema, and laziness are already right — the
    * iterator is consumed streamingly, never materialized. */
  def decodeBatch(media: Dataset[(Long, Array[Byte])])
      : Dataset[(Long, Seq[Float])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup happens HERE, once (codec/session init)
      it.map { case (id, b) =>
        if (b == null) (id, null) // undecodable stays NULL, like decodeStub
        else {
          val hist = new Array[Float](8)
          var i = 0
          while (i < b.length) { hist((b(i) & 0xff) >>> 5) += 1f; i += 1 }
          if (b.length > 0) {
            var j = 0
            while (j < 8) { hist(j) /= b.length; j += 1 }
          }
          (id, hist.toSeq)
        }
      }
    }
  }
}
