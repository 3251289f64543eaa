package graft.engine

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Binary row codec for the delta log — the analogue of the
  * reference's self-describing row encoding
  * (SQLLayer/includes/row_codec.hpp:5-16), but schema-driven and
  * typed: values are written in their declared type, not as strings
  * (SURVEY §1.1 recommends keeping values typed from ingest).
  *
  * Layout: [nCols:int] then per column [isNull:byte] and, when
  * non-null, the value by declared type (fixed width for numerics,
  * [len:int][utf8/bytes] for strings/binary).
  */
object RowCodec {

  def encode(values: Array[Any], meta: TableMeta): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(meta.cols.size)
    var i = 0
    while (i < meta.cols.size) {
      val v = values(i)
      if (v == null) out.writeByte(0)
      else {
        out.writeByte(1)
        meta.cols(i).tpe match {
          case ColType.I64 | ColType.Ts => out.writeLong(v.asInstanceOf[Long])
          case ColType.I32  => out.writeInt(v.asInstanceOf[Int])
          case ColType.F64  => out.writeDouble(v.asInstanceOf[Double])
          case ColType.F32  => out.writeFloat(v.asInstanceOf[Float])
          case ColType.Bool => out.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0)
          case ColType.Str =>
            val b = v.asInstanceOf[String].getBytes("UTF-8")
            out.writeInt(b.length); out.write(b)
          case ColType.Bytes =>
            val b = v.asInstanceOf[Array[Byte]]
            out.writeInt(b.length); out.write(b)
        }
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  def decode(in: DataInputStream, meta: TableMeta): Array[Any] = {
    val n = in.readInt()
    require(n == meta.cols.size, s"column count mismatch: $n vs ${meta.cols.size}")
    val values = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (in.readByte() == 1) {
        values(i) = meta.cols(i).tpe match {
          case ColType.I64 | ColType.Ts => in.readLong()
          case ColType.I32  => in.readInt()
          case ColType.F64  => in.readDouble()
          case ColType.F32  => in.readFloat()
          case ColType.Bool => in.readByte() == 1
          case ColType.Str =>
            val b = new Array[Byte](in.readInt()); in.readFully(b); new String(b, "UTF-8")
          case ColType.Bytes =>
            val b = new Array[Byte](in.readInt()); in.readFully(b); b
        }
      }
      i += 1
    }
    values
  }
}
