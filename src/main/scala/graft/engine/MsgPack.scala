package graft.engine

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal MessagePack codec — the wire format of every reference
  * boundary (`/root/reference/src/processor.ts:66,112,119,123,130`
  * encodes/decodes job packets, rpc envelopes, and payloads with
  * msgpack). The container has no msgpack dependency, so the subset the
  * envelope contract needs is implemented here against the public
  * MessagePack specification: nil, bool, all int widths, float64,
  * str, bin, array, map. No extension types (the reference never sends
  * any — its packets are plain JSON-shaped maps).
  *
  * Decoding canonicalizes: every integer form -> Long, float32/64 ->
  * Double, str -> String, bin -> Array[Byte], array -> Vector[Any],
  * map -> Map[Any, Any] (insertion order irrelevant to the contract).
  */
object MsgPack {

  // ---------------------------------------------------------------- encode

  def encode(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def write(out: ByteArrayOutputStream, v: Any): Unit = v match {
    case null => out.write(0xc0)
    case None => out.write(0xc0)
    case Some(x) => write(out, x)
    case b: Boolean => out.write(if (b) 0xc3 else 0xc2)
    case b: Byte => writeLong(out, b.toLong)
    case s: Short => writeLong(out, s.toLong)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case f: Float => writeDouble(out, f.toDouble)
    case d: Double => writeDouble(out, d)
    case s: String => writeString(out, s)
    case bytes: Array[Byte] => writeBin(out, bytes)
    case seq: Seq[_] => writeArrayHeader(out, seq.length); seq.foreach(write(out, _))
    case arr: Array[_] => writeArrayHeader(out, arr.length); arr.foreach(write(out, _))
    case m: scala.collection.Map[_, _] =>
      writeMapHeader(out, m.size)
      m.foreach { case (k, mv) => write(out, k); write(out, mv) }
    case other =>
      throw new IllegalArgumentException(s"msgpack: unsupported type ${other.getClass.getName}")
  }

  private def writeLong(out: ByteArrayOutputStream, l: Long): Unit =
    if (l >= 0 && l <= 0x7f) out.write(l.toInt)                       // positive fixint
    else if (l < 0 && l >= -32) out.write((l & 0xff).toInt)            // negative fixint
    else if (l >= Byte.MinValue && l <= Byte.MaxValue) { out.write(0xd0); out.write(l.toInt & 0xff) }
    else if (l >= Short.MinValue && l <= Short.MaxValue) { out.write(0xd1); writeBE(out, l, 2) }
    else if (l >= Int.MinValue && l <= Int.MaxValue) { out.write(0xd2); writeBE(out, l, 4) }
    else { out.write(0xd3); writeBE(out, l, 8) }

  private def writeDouble(out: ByteArrayOutputStream, d: Double): Unit = {
    out.write(0xcb)
    writeBE(out, java.lang.Double.doubleToLongBits(d), 8)
  }

  private def writeString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    if (b.length <= 31) out.write(0xa0 | b.length)
    else if (b.length <= 0xff) { out.write(0xd9); out.write(b.length) }
    else if (b.length <= 0xffff) { out.write(0xda); writeBE(out, b.length.toLong, 2) }
    else { out.write(0xdb); writeBE(out, b.length.toLong, 4) }
    out.write(b, 0, b.length)
  }

  private def writeBin(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    if (b.length <= 0xff) { out.write(0xc4); out.write(b.length) }
    else if (b.length <= 0xffff) { out.write(0xc5); writeBE(out, b.length.toLong, 2) }
    else { out.write(0xc6); writeBE(out, b.length.toLong, 4) }
    out.write(b, 0, b.length)
  }

  private def writeArrayHeader(out: ByteArrayOutputStream, n: Int): Unit =
    if (n <= 15) out.write(0x90 | n)
    else if (n <= 0xffff) { out.write(0xdc); writeBE(out, n.toLong, 2) }
    else { out.write(0xdd); writeBE(out, n.toLong, 4) }

  private def writeMapHeader(out: ByteArrayOutputStream, n: Int): Unit =
    if (n <= 15) out.write(0x80 | n)
    else if (n <= 0xffff) { out.write(0xde); writeBE(out, n.toLong, 2) }
    else { out.write(0xdf); writeBE(out, n.toLong, 4) }

  private def writeBE(out: ByteArrayOutputStream, v: Long, nBytes: Int): Unit = {
    var i = nBytes - 1
    while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Any = {
    val buf = ByteBuffer.wrap(bytes)
    val v = read(buf)
    v
  }

  private def read(buf: ByteBuffer): Any = {
    val b = buf.get() & 0xff
    b match {
      case x if x <= 0x7f => x.toLong                                  // positive fixint
      case x if x >= 0xe0 => (x - 256).toLong                          // negative fixint
      case x if (x & 0xf0) == 0x80 => readMap(buf, x & 0x0f)           // fixmap
      case x if (x & 0xf0) == 0x90 => readArray(buf, x & 0x0f)         // fixarray
      case x if (x & 0xe0) == 0xa0 => readStr(buf, x & 0x1f)           // fixstr
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => readBin(buf, buf.get() & 0xff)
      case 0xc5 => readBin(buf, buf.getShort() & 0xffff)
      case 0xc6 => readBin(buf, buf.getInt())
      case 0xca => buf.getFloat().toDouble
      case 0xcb => buf.getDouble()
      case 0xcc => (buf.get() & 0xff).toLong                           // uint8
      case 0xcd => (buf.getShort() & 0xffff).toLong                    // uint16
      case 0xce => (buf.getInt() & 0xffffffffL)                        // uint32
      case 0xcf => buf.getLong()                                       // uint64 (as signed)
      case 0xd0 => buf.get().toLong
      case 0xd1 => buf.getShort().toLong
      case 0xd2 => buf.getInt().toLong
      case 0xd3 => buf.getLong()
      case 0xd9 => readStr(buf, buf.get() & 0xff)
      case 0xda => readStr(buf, buf.getShort() & 0xffff)
      case 0xdb => readStr(buf, buf.getInt())
      case 0xdc => readArray(buf, buf.getShort() & 0xffff)
      case 0xdd => readArray(buf, buf.getInt())
      case 0xde => readMap(buf, buf.getShort() & 0xffff)
      case 0xdf => readMap(buf, buf.getInt())
      case other =>
        throw new IllegalArgumentException(f"msgpack: unsupported format byte 0x$other%02x")
    }
  }

  private def readStr(buf: ByteBuffer, n: Int): String = {
    val b = new Array[Byte](n); buf.get(b); new String(b, UTF_8)
  }

  private def readBin(buf: ByteBuffer, n: Int): Array[Byte] = {
    val b = new Array[Byte](n); buf.get(b); b
  }

  private def readArray(buf: ByteBuffer, n: Int): Vector[Any] =
    Vector.fill(n)(read(buf))

  private def readMap(buf: ByteBuffer, n: Int): Map[Any, Any] =
    (0 until n).map(_ => (read(buf), read(buf))).toMap

  // ------------------------------------------------------- Row conversion

  /** Convert a collected Spark Row into the plain JSON-shaped value the
    * reference's handlers would have produced (field-name map), ready
    * for [[encode]]. Decimals and temporals are carried as strings
    * (exactness over the wire, like the pg text protocol the reference's
    * delegated queries ride).
    */
  def rowToValue(row: org.apache.spark.sql.Row, schema: org.apache.spark.sql.types.StructType): Map[Any, Any] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      (f.name: Any) -> anyToValue(if (row.isNullAt(i)) null else row.get(i))
    }.toMap

  private def anyToValue(v: Any): Any = v match {
    case null => null
    case r: org.apache.spark.sql.Row =>
      if (r.schema != null) rowToValue(r, r.schema)
      else r.toSeq.map(anyToValue).toVector
    case d: java.math.BigDecimal => d.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
    case d: java.sql.Date => d.toString
    case t: java.sql.Timestamp => t.toString
    case d: java.time.LocalDate => d.toString
    case t: java.time.Instant => t.toString
    case seq: Seq[_] => seq.map(anyToValue).toVector
    case arr: Array[Byte] => arr
    case arr: Array[_] => arr.toVector.map(anyToValue)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => (anyToValue(k), anyToValue(mv)) }.toMap
    case other => other
  }
}
