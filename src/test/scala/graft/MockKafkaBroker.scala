package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** In-test mock Kafka broker speaking the v0 wire dialect KafkaWire
  * implements: Metadata (api 3) and Fetch (api 1) over a real TCP
  * socket, byte-for-byte per the public protocol guide. One topic, one
  * partition, an appendable message log; this broker is the
  * counterparty that lets KafkaStreamSpec exercise a genuine socket
  * round-trip in a container with no broker and no connector jars.
  *
  * Round-11 additions for the offset-resuming poll-loop contract:
  * `append` grows the log between polls (fetch responses honor the
  * requested offset, so a resumed consumer sees only the new tail) and
  * `restart()` simulates a broker bounce — the listener drops and
  * re-binds on the SAME port with the log intact, so in-flight
  * connects fail with IOException exactly like a real restart.
  */
class MockKafkaBroker(topic: String,
    initial: Seq[(Array[Byte], Array[Byte])],
    v2Batches: Boolean = false,
    codec: Int = 0) { // 0=none, 1=gzip, 2=snappy, 4=zstd (v2 only)

  private val log =
    scala.collection.mutable.ArrayBuffer(initial: _*)
  @volatile private var server = new ServerSocket(0)
  private val boundPort = server.getLocalPort
  def port: Int = boundPort
  @volatile private var running = true
  @volatile private var accepting = true

  def append(msgs: Seq[(Array[Byte], Array[Byte])]): Unit =
    log.synchronized { log ++= msgs }

  /** Drop the listener (in-flight connects fail), then re-bind the
    * same port. The message log survives, like a broker restart over
    * a persistent topic log.
    */
  def restart(downMs: Long = 0L): Unit = {
    accepting = false
    server.close()
    if (downMs > 0) Thread.sleep(downMs)
    val s = new ServerSocket()
    s.setReuseAddress(true)
    s.bind(new InetSocketAddress(boundPort))
    server = s
    accepting = true
  }

  private def kString(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    ByteBuffer.allocate(2 + b.length)
      .putShort(b.length.toShort).put(b).array()
  }

  private def kBytes(b: Array[Byte]): Array[Byte] =
    if (b == null) ByteBuffer.allocate(4).putInt(-1).array()
    else ByteBuffer.allocate(4 + b.length).putInt(b.length).put(b).array()

  // ---- record-batch v2 emission (magic 2, varint records, CRC32C) ----

  private def uVarint(out: java.io.ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
  }
  private def zigzag(out: java.io.ByteArrayOutputStream, v: Int): Unit =
    uVarint(out, (v << 1) ^ (v >> 31))
  private def zigzagL(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    out.write(z.toInt)
  }
  private def varBytes(out: java.io.ByteArrayOutputStream,
      b: Array[Byte]): Unit =
    if (b == null) zigzag(out, -1)
    else { zigzag(out, b.length); out.write(b) }

  /** One magic-2 record batch holding the log tail from `from`:
    * [baseOffset i64][batchLength i32][leaderEpoch i32][magic 2]
    * [crc32c u32][attributes i16][lastOffsetDelta i32][firstTs i64]
    * [maxTs i64][producerId i64][producerEpoch i16][baseSeq i32]
    * [count i32][records…], timestamps = BaseTs + offset.
    */
  private val BaseTs = 1700000000000L
  private def recordBatch(from: Long): (Array[Byte], Long) = {
    val snapshot = log.synchronized { log.toVector }
    val tail = snapshot.zipWithIndex.drop(from.toInt)
    if (tail.isEmpty) return (Array.empty[Byte], snapshot.size.toLong)
    val records = new java.io.ByteArrayOutputStream()
    tail.foreach { case ((k, v), i) =>
      val body = new java.io.ByteArrayOutputStream()
      body.write(0) // record attributes
      zigzagL(body, i - from) // timestampDelta = offsetDelta here
      zigzag(body, (i - from).toInt)
      varBytes(body, k)
      varBytes(body, v)
      zigzag(body, 0) // headers
      zigzag(records, body.size())
      records.write(body.toByteArray)
    }
    // the records section compresses as ONE stream in the batch codec
    // (kafka.apache.org/protocol: attributes bits 0-2); CRC32C covers
    // the compressed form
    val recBytes = codec match {
      case 0 => records.toByteArray
      case 1 =>
        val bos = new java.io.ByteArrayOutputStream()
        val z = new java.util.zip.GZIPOutputStream(bos)
        z.write(records.toByteArray); z.close(); bos.toByteArray
      case 2 =>
        val bos = new java.io.ByteArrayOutputStream()
        val z = new org.xerial.snappy.SnappyOutputStream(bos)
        z.write(records.toByteArray); z.close(); bos.toByteArray
      case 4 =>
        val bos = new java.io.ByteArrayOutputStream()
        val z = new com.github.luben.zstd.ZstdOutputStream(bos)
        z.write(records.toByteArray); z.close(); bos.toByteArray
      case c => throw new IllegalArgumentException(s"codec $c")
    }
    // attributes → end (CRC32C-covered region)
    val covered = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4
        + recBytes.length)
      .putShort(codec.toShort)           // attributes: compression bits
      .putInt(tail.size - 1)             // lastOffsetDelta
      .putLong(BaseTs + from)            // firstTimestamp
      .putLong(BaseTs + snapshot.size - 1) // maxTimestamp
      .putLong(-1L).putShort(-1)         // producerId/epoch
      .putInt(-1)                        // baseSequence
      .putInt(tail.size)
      .put(recBytes).array()
    val crc = new java.util.zip.CRC32C()
    crc.update(covered)
    val afterLength = ByteBuffer.allocate(4 + 1 + 4 + covered.length)
      .putInt(0)                         // partitionLeaderEpoch
      .put(2.toByte)                     // magic
      .putInt(crc.getValue.toInt)
      .put(covered).array()
    val batch = ByteBuffer.allocate(8 + 4 + afterLength.length)
      .putLong(from)                     // baseOffset
      .putInt(afterLength.length)        // batchLength
      .put(afterLength).array()
    (batch, snapshot.size.toLong)
  }

  private def messageSet(from: Long): (Array[Byte], Long) = {
    if (v2Batches) return recordBatch(from)
    val snapshot = log.synchronized { log.toVector }
    val parts = snapshot.zipWithIndex.drop(from.toInt).map {
      case ((k, v), i) =>
        val kb = kBytes(k)
        val vb = kBytes(v)
        val payload = ByteBuffer.allocate(2 + kb.length + vb.length)
          .put(0.toByte) // magic v0
          .put(0.toByte) // attributes: uncompressed
          .put(kb).put(vb).array()
        val crc = new CRC32()
        crc.update(payload)
        val msg = ByteBuffer.allocate(4 + payload.length)
          .putInt(crc.getValue.toInt).put(payload).array()
        ByteBuffer.allocate(8 + 4 + msg.length)
          .putLong(i.toLong).putInt(msg.length).put(msg).array()
    }
    (parts.foldLeft(Array.empty[Byte])(_ ++ _), snapshot.size.toLong)
  }

  private def metadataResponse(corr: Int): Array[Byte] = {
    val host = kString("127.0.0.1")
    val name = kString(topic)
    val b = ByteBuffer.allocate(4 + 4 + (4 + host.length + 4)
      + 4 + (2 + name.length + 4 + (2 + 4 + 4 + 4 + 4)))
    b.putInt(corr)
    b.putInt(1).putInt(0).put(host).putInt(port) // one broker: node 0
    b.putInt(1)                                  // one topic
    b.putShort(0).put(name)
    b.putInt(1)                                  // one partition
    b.putShort(0).putInt(0).putInt(0)            // err, pid 0, leader 0
    b.putInt(0).putInt(0)                        // replicas[], isr[]
    b.array()
  }

  private def fetchResponse(corr: Int, from: Long): Array[Byte] = {
    val name = kString(topic)
    val (set, hw) = messageSet(from)
    val b = ByteBuffer.allocate(4 + 4 + 2 + name.length + 4
      + 4 + 2 + 8 + 4 + set.length)
    b.putInt(corr)
    b.putInt(1).put(name)                        // one topic
    b.putInt(1)                                  // one partition
    b.putInt(0).putShort(0)                      // pid 0, no error
    b.putLong(hw)                                // high watermark
    b.putInt(set.length).put(set)
    b.array()
  }

  private val thread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        serve(sock)
      } catch {
        case _: Throwable if !running => ()
        case _: java.io.IOException => // restart window: wait for re-bind
          while (running && !accepting) Thread.sleep(5)
      }
    }
  }, "mock-kafka-broker")
  thread.setDaemon(true)
  thread.start()

  private def serve(sock: Socket): Unit = {
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val size = in.readInt()
      val buf = new Array[Byte](size)
      in.readFully(buf)
      val req = ByteBuffer.wrap(buf)
      val apiKey = req.getShort()
      req.getShort() // api version (v0 expected)
      val corr = req.getInt()
      val cidLen = req.getShort() // client id
      if (cidLen > 0) req.position(req.position() + cidLen)
      val resp = apiKey match {
        case 3 => metadataResponse(corr)
        case 1 =>
          req.getInt(); req.getInt(); req.getInt() // replica/wait/min
          req.getInt()                             // topic count
          val tLen = req.getShort()                // topic name
          req.position(req.position() + tLen)
          req.getInt()                             // partition count
          req.getInt()                             // partition id
          val offset = req.getLong()
          fetchResponse(corr, offset)
        case other =>
          throw new IllegalStateException(s"mock broker: api $other")
      }
      out.writeInt(resp.length)
      out.write(resp)
      out.flush()
    } finally sock.close()
  }

  def stop(): Unit = {
    running = false
    server.close()
  }
}
