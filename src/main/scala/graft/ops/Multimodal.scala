package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs next to them.
  *
  * The decode/feature-extract kernels are STUBS (this container ships no
  * image/audio codecs): `fakeDecode` derives deterministic pseudo-metadata
  * from the bytes, and `decodeBatch` marks where a real codec slots in.
  * The Spark-side plumbing — schema, batch iteration, partition shape —
  * is real and tested.
  *
  * Design for 100 TB: payload bytes never leave the executor (no
  * collect); decode runs per-partition so a codec can amortize native
  * init across a batch (the Scala analogue of a Pandas-UDF batch); the
  * metadata struct is columnar so filters on width/duration prune without
  * touching bytes.
  */
object Multimodal {

  /** Metadata schema that rides next to every blob column. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a binary payload column (here synthesized from text — the
    * testdata has no real blobs) plus deterministic fake decode metadata.
    * Pure projection: codegen'd, no shuffle, oracle-checkable. */
  def withBlobAndMeta(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val blob = encode(col(textCol), "UTF-8")
    val nBytes = octet_length(blob).cast("long")
    docs
      .withColumn("payload", blob)
      .withColumn("meta", struct(
        // STUB decode: deterministic pseudo-dimensions derived from size.
        // A real codec replaces these three expressions.
        when(pmod(nBytes, lit(3)) === 0, "png")
          .when(pmod(nBytes, lit(3)) === 1, "jpeg")
          .otherwise("webp").as("format"),
        (pmod(nBytes, lit(640)) + 32).cast("int").as("width"),
        (pmod(nBytes, lit(480)) + 32).cast("int").as("height"),
        nBytes.as("n_bytes")))
  }

  /** Frame-sample: take every `stride`-th byte of the payload as a stand-in
    * for frame extraction — exercises binary slicing + array plumbing. */
  def frameSample(docs: DataFrame, stride: Int = 64): DataFrame =
    docs.withColumn("frames",
      transform(
        sequence(lit(1),
          greatest((octet_length(col("payload")) / lit(stride)).cast("int"), lit(1))),
        i => col("payload").substr((i - 1) * stride + 1, lit(1))))

  /** Audio-frame windowing plan: treat the payload as 16-bit PCM and
    * emit one row per (win-sample window every hop samples) — the
    * offsets a spectrogram/feature extractor consumes. All integer
    * arithmetic over the blob LENGTH: the plan is computed and
    * shuffled/filtered without ever touching payload bytes, so a
    * 100 TB audio corpus plans its windows from metadata alone. Blobs
    * shorter than one window emit nothing. */
  def audioWindows(docs: DataFrame, idCol: String,
      win: Int = 64, hop: Int = 32): DataFrame = {
    val nSamples = (octet_length(col("payload")) / 2).cast("long")
    docs
      .withColumn("graft_ns", nSamples)
      .filter(col("graft_ns") >= win)
      .select(col(idCol), col("graft_ns").as("n_samples"),
        // `div`, not `/`: integral window count (double division would
        // lose exactness past 2^53 samples)
        posexplode(sequence(lit(0L),
          expr(s"(graft_ns - ${win}L) div ${hop}L"))))
      .select(col(idCol), col("n_samples"),
        col("pos").cast("int").as("window_idx"),
        (col("col") * hop).as("start_sample"))
  }

  /** Batch decode over partitions — the slot where a real codec runs.
    * Iterates rows per partition so native-library init happens once per
    * partition, not once per row (the Scala analogue of mapInPandas). */
  def decodeBatch(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields :+
      StructField("decoded_checksum", LongType, nullable = true))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // resolved on the driver: the closure must not capture the DataFrame
    val payloadIdx = docs.schema.fieldIndex("payload")
    docs.mapPartitions { rows =>
      // REAL CODEC GOES HERE: init once per partition (native handles,
      // thread pools), then stream the batch through it.
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        // STUB: checksum instead of pixels; deterministic.
        val checksum: Long = if (bytes == null) 0L
          else bytes.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
        Row.fromSeq(r.toSeq :+ checksum)
      }
    }(enc)
  }
}
