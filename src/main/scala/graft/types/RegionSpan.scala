package graft.types

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types.{BinaryType, DataType, UDTRegistration, UserDefinedType}

/** A key-range value `[startKey, endKey)` — the capability analog of the
  * reference's `RegionInfoUDT` (`types/RegionInfoUDT.scala:6-20`: a
  * `UserDefinedType[RegionInfo]` with BinaryType sqlType and protobuf
  * serialization, registered at session construction and queried through
  * SQL). Ours serializes two length-prefixed UTF-8 strings.
  */
case class RegionSpan(startKey: String, endKey: String) {
  def contains(key: String): Boolean =
    key >= startKey && (endKey.isEmpty || key < endKey)
}

class RegionSpanUDT extends UserDefinedType[RegionSpan] {
  override def sqlType: DataType = BinaryType
  override def userClass: Class[RegionSpan] = classOf[RegionSpan]

  override def serialize(obj: RegionSpan): Array[Byte] = {
    val s = obj.startKey.getBytes(StandardCharsets.UTF_8)
    val e = obj.endKey.getBytes(StandardCharsets.UTF_8)
    val buf = ByteBuffer.allocate(8 + s.length + e.length)
    buf.putInt(s.length).put(s).putInt(e.length).put(e)
    buf.array()
  }

  override def deserialize(datum: Any): RegionSpan = {
    val buf = ByteBuffer.wrap(datum.asInstanceOf[Array[Byte]])
    val s = new Array[Byte](buf.getInt); buf.get(s)
    val e = new Array[Byte](buf.getInt); buf.get(e)
    RegionSpan(new String(s, StandardCharsets.UTF_8), new String(e, StandardCharsets.UTF_8))
  }
}

object RegionSpanUDT {
  /** Register globally (analog of the reference registering its UDT at
    * session construction, `HBaseSQLContext.scala:248`). Idempotent. */
  def register(): Unit =
    UDTRegistration.register(classOf[RegionSpan].getName, classOf[RegionSpanUDT].getName)
}
