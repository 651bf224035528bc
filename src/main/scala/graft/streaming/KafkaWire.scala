package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal Kafka WIRE-PROTOCOL client — Metadata (api 3) and Fetch
  * (api 1) at protocol version 0 over a plain TCP socket, per the
  * public Kafka protocol guide (kafka.apache.org/protocol). This
  * retires the "no connector jars offline" gap on the repo's own
  * terms: the broker-facing byte layout (request framing, v0 message
  * sets, CRC32 verification) is implemented and exercised against an
  * in-test mock broker speaking the same bytes (KafkaStreamSpec), so
  * the only thing a production deployment swaps in is the real
  * endpoint. The reference surface is the librdkafka-based importer
  * (`ImportExport/KafkaImporter.cpp:476` in /root/reference).
  *
  * Scope: v0 REQUEST APIs (the smallest self-contained dialect every
  * broker answers) — but the fetch decoder reads BOTH payload
  * framings: v0 message sets (CRC32) and, since round-12, magic-2
  * RECORD BATCHES (varint records, CRC32C, control-batch skipping) —
  * the format every modern broker actually stores, so a broker that
  * serves batches without down-conversion decodes too. Since
  * round-13, compressed record batches decode as well — gzip, snappy
  * (xerial framing) and zstd, the codecs whose libraries ship in
  * Spark's own jars; lz4's Kafka-specific block framing stays
  * refused rather than wrongly decoded. The file-source micro-batch
  * path (StreamingIngest) remains the default ingest; `fetchBatchDf`
  * lands rows in the connector's exact output schema so
  * `decodeKafkaEvents` is shared between both paths.
  */
object KafkaWire {

  case class BrokerMeta(nodeId: Int, host: String, port: Int)
  case class PartitionMeta(partition: Int, leaderId: Int)
  case class TopicMeta(brokers: Seq[BrokerMeta], topic: String,
      partitions: Seq[PartitionMeta])
  /** timestamp: epoch millis from a v2 record batch; -1 for v0
    * messages (the v0 wire carries no timestamp).
    */
  case class MessageRec(partition: Int, offset: Long,
      key: Array[Byte], value: Array[Byte], timestamp: Long = -1L)

  // ---- primitive writers ----------------------------------------------

  private def kString(s: String): Array[Byte] = {
    if (s == null) return Array[Byte](-1, -1)
    val b = s.getBytes(StandardCharsets.UTF_8)
    val out = ByteBuffer.allocate(2 + b.length)
    out.putShort(b.length.toShort).put(b).array()
  }

  /** Frame and send one request; return the response body (after the
    * correlation-id echo, which is checked).
    */
  private def roundTrip(sock: Socket, apiKey: Short, version: Short,
      corr: Int, body: Array[Byte]): ByteBuffer = {
    val clientId = kString("graft-wire")
    val size = 2 + 2 + 4 + clientId.length + body.length
    val req = ByteBuffer.allocate(4 + size)
    req.putInt(size).putShort(apiKey).putShort(version).putInt(corr)
      .put(clientId).put(body)
    val out = new DataOutputStream(sock.getOutputStream)
    out.write(req.array()); out.flush()
    val in = new DataInputStream(sock.getInputStream)
    val respSize = in.readInt()
    require(respSize > 4 && respSize < (64 << 20),
      s"implausible kafka response size $respSize")
    val buf = new Array[Byte](respSize)
    in.readFully(buf)
    val resp = ByteBuffer.wrap(buf)
    val echoed = resp.getInt()
    require(echoed == corr,
      s"correlation id mismatch: sent $corr, got $echoed")
    resp
  }

  private def readString(b: ByteBuffer): String = {
    val len = b.getShort()
    if (len < 0) null
    else {
      val arr = new Array[Byte](len)
      b.get(arr)
      new String(arr, StandardCharsets.UTF_8)
    }
  }

  private def readBytes(b: ByteBuffer): Array[Byte] = {
    val len = b.getInt()
    if (len < 0) null
    else { val arr = new Array[Byte](len); b.get(arr); arr }
  }

  // ---- record-batch v2 varints (zigzag, protobuf wire format) ----------

  private def readUnsignedVarint(b: ByteBuffer): Int = {
    var value = 0; var shift = 0; var cur = 0
    do {
      cur = b.get() & 0xff
      value |= (cur & 0x7f) << shift
      shift += 7
      require(shift <= 35, "malformed varint")
    } while ((cur & 0x80) != 0)
    value
  }

  private def readVarint(b: ByteBuffer): Int = {
    val raw = readUnsignedVarint(b)
    (raw >>> 1) ^ -(raw & 1)
  }

  private def readVarlong(b: ByteBuffer): Long = {
    var value = 0L; var shift = 0; var cur = 0
    do {
      cur = b.get() & 0xff
      value |= (cur & 0x7fL) << shift
      shift += 7
      require(shift <= 70, "malformed varlong")
    } while ((cur & 0x80) != 0)
    (value >>> 1) ^ -(value & 1L)
  }

  private def readVarBytes(b: ByteBuffer): Array[Byte] = {
    val len = readVarint(b)
    if (len < 0) null
    else { val arr = new Array[Byte](len); b.get(arr); arr }
  }

  /** Decode ONE record batch (magic 2; kafka.apache.org/protocol
    * "Record Batch"). Caller has consumed baseOffset (int64) and
    * batchLength (int32); `r` is positioned at partitionLeaderEpoch
    * and the batch ends at `end`. CRC is CRC32C (Castagnoli) over
    * everything AFTER the crc field. Uncompressed batches only —
    * the bounded ingest probe never negotiates compression — and
    * control batches (transaction markers) contribute no data rows,
    * exactly like the real consumer.
    */
  private def decodeV2Batch(r: ByteBuffer, pid: Int, baseOffset: Long,
      end: Int, recs: scala.collection.mutable.Builder[MessageRec, _])
      : Unit = {
    r.getInt() // partitionLeaderEpoch (not CRC-covered)
    val magic = r.get()
    require(magic == 2, s"decodeV2Batch on magic $magic")
    val crc = r.getInt()
    val crcCheck = new java.util.zip.CRC32C()
    crcCheck.update(r.array(), r.position(), end - r.position())
    require((crcCheck.getValue & 0xffffffffL) == (crc.toLong & 0xffffffffL),
      s"record batch CRC32C mismatch at offset $baseOffset")
    val attributes = r.getShort()
    // Compression codec (attributes bits 0-2, round-13): the records
    // section — everything after the count field — is one compressed
    // stream in the producer's codec. CRC32C was verified above over
    // the COMPRESSED wire bytes (the spec'd coverage), so a corrupt
    // batch fails before any decompressor runs. gzip/snappy/zstd use
    // the same stream framings Kafka's client does (java.util.zip
    // GZIP, xerial Snappy, zstd-jni — all shipped in Spark's jars);
    // lz4 (Kafka's KafkaLZ4Block framing, not the plain lz4 frame)
    // stays refused rather than wrongly decoded.
    val codec = attributes & 0x7
    require(codec == 0 || codec == 1 || codec == 2 || codec == 4,
      s"unsupported record-batch compression codec $codec")
    val isControl = (attributes & 0x20) != 0
    r.getInt()  // lastOffsetDelta
    val firstTimestamp = r.getLong()
    r.getLong() // maxTimestamp
    r.getLong() // producerId
    r.getShort() // producerEpoch
    r.getInt()  // baseSequence
    val recordCount = r.getInt()
    val rb: ByteBuffer =
      if (codec == 0) r
      else {
        val comp = new Array[Byte](end - r.position())
        r.get(comp)
        val bin = new java.io.ByteArrayInputStream(comp)
        val in: java.io.InputStream = codec match {
          case 1 => new java.util.zip.GZIPInputStream(bin)
          case 2 => new org.xerial.snappy.SnappyInputStream(bin)
          case 4 => new com.github.luben.zstd.ZstdInputStream(bin)
        }
        try ByteBuffer.wrap(in.readAllBytes()) finally in.close()
      }
    var i = 0
    while (i < recordCount) {
      val len = readVarint(rb)
      val recEnd = rb.position() + len
      rb.get() // record attributes (unused)
      val tsDelta = readVarlong(rb)
      val offDelta = readVarint(rb)
      val key = readVarBytes(rb)
      val value = readVarBytes(rb)
      val nHeaders = readVarint(rb)
      var h = 0
      while (h < nHeaders) { readVarBytes(rb); readVarBytes(rb); h += 1 }
      require(rb.position() == recEnd,
        s"record length mismatch at offset ${baseOffset + offDelta}")
      if (!isControl)
        recs += MessageRec(pid, baseOffset + offDelta, key, value,
          firstTimestamp + tsDelta)
      i += 1
    }
    require(if (codec == 0) rb.position() == end else rb.remaining() == 0,
      s"record batch at offset $baseOffset has trailing bytes")
    r.position(end)
  }

  // ---- Metadata v0 ------------------------------------------------------

  def metadata(host: String, port: Int, topic: String): TopicMeta = {
    val sock = new Socket(host, port)
    try {
      val topicBytes = kString(topic)
      val body = ByteBuffer.allocate(4 + topicBytes.length)
        .putInt(1).put(topicBytes).array()
      val r = roundTrip(sock, apiKey = 3, version = 0, corr = 1, body)
      val brokers = (0 until r.getInt()).map { _ =>
        BrokerMeta(r.getInt(), readString(r), r.getInt())
      }
      val nTopics = r.getInt()
      require(nTopics >= 1, s"no metadata returned for $topic")
      val tops = (0 until nTopics).map { _ =>
        val err = r.getShort()
        val name = readString(r)
        val parts = (0 until r.getInt()).map { _ =>
          val perr = r.getShort()
          val pid = r.getInt()
          val leader = r.getInt()
          (0 until r.getInt()).foreach(_ => r.getInt()) // replicas
          (0 until r.getInt()).foreach(_ => r.getInt()) // isr
          require(perr == 0, s"partition $pid of $name: error $perr")
          PartitionMeta(pid, leader)
        }
        require(err == 0, s"topic $name: error $err")
        name -> parts
      }.toMap
      TopicMeta(brokers, topic, tops(topic))
    } finally sock.close()
  }

  // ---- Fetch v0 ---------------------------------------------------------

  def fetch(host: String, port: Int, topic: String, partition: Int,
      offset: Long, maxBytes: Int = 1 << 20,
      maxWaitMs: Int = 100): Seq[MessageRec] = {
    val sock = new Socket(host, port)
    try {
      val topicBytes = kString(topic)
      val body = ByteBuffer.allocate(4 + 4 + 4 + 4 + topicBytes.length
          + 4 + 4 + 8 + 4)
        .putInt(-1)          // replica_id (consumer)
        .putInt(maxWaitMs)
        .putInt(1)           // min_bytes
        .putInt(1)           // one topic
        .put(topicBytes)
        .putInt(1)           // one partition
        .putInt(partition)
        .putLong(offset)
        .putInt(maxBytes)
        .array()
      val r = roundTrip(sock, apiKey = 1, version = 0, corr = 2, body)
      val recs = Seq.newBuilder[MessageRec]
      (0 until r.getInt()).foreach { _ =>
        val name = readString(r)
        (0 until r.getInt()).foreach { _ =>
          val pid = r.getInt()
          val err = r.getShort()
          r.getLong() // high watermark
          val setSize = r.getInt()
          require(err == 0, s"fetch $name/$pid: error $err")
          val end = r.position() + setSize
          // Both wire framings start [int64, int32]: a v0 message set
          // entry is (offset, messageSize) and a v2 record batch is
          // (baseOffset, batchLength) — and in BOTH the magic byte
          // sits 4 bytes into the sized region (after the v0 crc /
          // the v2 partitionLeaderEpoch), so one peek dispatches.
          // A trailing partial entry (broker-side maxBytes cut) is
          // legal and must be dropped silently.
          while (r.position() + 12 <= end) {
            val msgOffset = r.getLong()
            val msgSize = r.getInt()
            if (r.position() + msgSize > end) {
              r.position(end)
            } else {
              val msgStart = r.position()
              val magic = r.get(msgStart + 4) // peek, don't consume
              magic match {
                case 0 =>
                  val crc = r.getInt()
                  val crcCheck = new CRC32()
                  crcCheck.update(r.array(), r.position(),
                    msgSize - 4)
                  require((crcCheck.getValue & 0xffffffffL) ==
                      (crc.toLong & 0xffffffffL),
                    s"CRC mismatch at offset $msgOffset")
                  val m = r.get()
                  require(m == 0, s"unsupported message magic $m")
                  r.get() // attributes (0 = uncompressed)
                  val key = readBytes(r)
                  val value = readBytes(r)
                  r.position(msgStart + msgSize)
                  recs += MessageRec(pid, msgOffset, key, value)
                case 2 =>
                  decodeV2Batch(r, pid, msgOffset, msgStart + msgSize,
                    recs)
                case other =>
                  throw new IllegalArgumentException(
                    s"unsupported message magic $other at $msgOffset")
              }
            }
          }
        }
      }
      recs.result()
    } finally sock.close()
  }

  // ---- one bounded micro-batch as a DataFrame ---------------------------

  /** The Spark Kafka connector's fixed output schema. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Metadata + per-partition fetch-from-0 as ONE bounded batch in the
    * connector's wire schema — feed to StreamingIngest.decodeKafkaEvents.
    * (v0 messages carry no timestamp; the connector surfaces epoch 0
    * with timestampType NO_TIMESTAMP_TYPE = -1 semantics; we pin 0.)
    */
  def fetchBatchDf(spark: SparkSession, host: String, port: Int,
      topic: String): DataFrame = {
    val meta = metadata(host, port, topic)
    val byId = meta.brokers.map(b => b.nodeId -> b).toMap
    val rows = meta.partitions.flatMap { p =>
      val leader = byId(p.leaderId)
      fetch(leader.host, leader.port, topic, p.partition, offset = 0L)
        .map(m => Row(m.key, m.value, topic, m.partition, m.offset,
          new java.sql.Timestamp(math.max(0L, m.timestamp)), 0))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), wireSchema)
  }

  // ---- offset-resuming poll loop ----------------------------------------

  /** The micro-batch poll driver the reference's importer implements
    * (`ImportExport/KafkaImporter.cpp:476` — poll → batch → commit):
    * per-partition consumed offsets live in this consumer; each
    * `poll()` re-reads topic metadata (leaders may move between
    * polls — a broker restart lands here), fetches each partition
    * FROM its committed offset, and advances the offset only after
    * the batch's rows are materialized, so a fetch that throws
    * mid-poll (broker down) is redelivered in full on the next poll —
    * at-least-once on failures, exactly-once across CLEAN polls
    * (asserted duplicate-free by KafkaStreamSpec across a simulated
    * broker restart). Connection errors are retried with bounded
    * backoff inside `poll` so a restarting broker costs one stall,
    * not a lost batch.
    */
  final class PollConsumer(host: String, port: Int, topic: String,
      retries: Int = 20, backoffMs: Long = 50L) {

    private val committed =
      scala.collection.mutable.Map.empty[Int, Long]

    /** Committed next-fetch offset per partition (0 before first poll). */
    def committedOffsets: Map[Int, Long] = committed.toMap.withDefault(_ => 0L)

    private def withRetry[T](what: String)(f: => T): T = {
      var attempt = 0
      var out: Option[T] = None
      while (out.isEmpty) {
        try out = Some(f)
        catch {
          case e: java.io.IOException =>
            attempt += 1
            if (attempt > retries)
              throw new java.io.IOException(
                s"$what: broker unreachable after $retries retries", e)
            Thread.sleep(backoffMs)
        }
      }
      out.get
    }

    /** One micro-batch: every partition fetched from its committed
      * offset; offsets advance past the returned records only after
      * the whole poll succeeds. Returns records in wire order.
      */
    def poll(): Seq[MessageRec] = {
      val meta = withRetry("metadata")(metadata(host, port, topic))
      val byId = meta.brokers.map(b => b.nodeId -> b).toMap
      val recs = meta.partitions.flatMap { p =>
        val leader = byId(p.leaderId)
        val from = committed.getOrElse(p.partition, 0L)
        withRetry(s"fetch p${p.partition}")(
          fetch(leader.host, leader.port, topic, p.partition, from))
      }
      // commit AFTER every partition fetched — a throw above leaves
      // all offsets untouched and the next poll redelivers
      recs.groupBy(_.partition).foreach { case (p, ms) =>
        committed(p) = ms.map(_.offset).max + 1L
      }
      recs
    }

    /** `poll` as a bounded DataFrame in the connector wire schema. */
    def pollDf(spark: SparkSession): DataFrame = {
      val rows = poll().map(m => Row(m.key, m.value, topic, m.partition,
        m.offset, new java.sql.Timestamp(math.max(0L, m.timestamp)), 0))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), wireSchema)
    }
  }
}
