package graft.engine

import java.io.{BufferedOutputStream, ByteArrayInputStream, DataInputStream, DataOutputStream, EOFException, FileOutputStream}
import java.nio.file.{Files, Path}
import java.util.zip.CRC32

/** Per-table append-only durability log — the analogue of the
  * reference WAL (includes/wal.hpp:36-397): append + flush per
  * mutation, CRC-validated recovery that stops at the first corrupt
  * record, truncate after flush-to-parquet.
  *
  * Record layout: [len:int][seq:long][tombstone:byte][row bytes]
  * [crc32:long over the payload].
  */
final class DeltaLog(path: Path, meta: TableMeta) {

  Files.createDirectories(path.getParent)
  private var fos = new FileOutputStream(path.toFile, true)
  private var out = new DataOutputStream(new BufferedOutputStream(fos))

  /** What the last replay() recovered and discarded; None before
    * recovery. A nonzero truncatedBytes distinguishes a benign torn
    * tail (small, end-of-log) from mid-log corruption whose intact
    * successors were also cut off — the discarded bytes are preserved
    * in the .corrupt sibling either way, but only an operator who can
    * SEE the loss can repair it.
    */
  @volatile var lastRecovery: Option[DeltaLog.Recovery] = None

  def append(rv: RowVersion): Unit = this.synchronized {
    writeRecord(rv)
    out.flush()
    // fsync per mutation — the reference WAL's durability contract
    // (includes/wal.hpp:128-148 append + flush per op).
    fos.getFD.sync()
  }

  /** Batched append: all records buffered, ONE flush + fsync for the
    * group — the group-commit the reference WAL declares but never
    * wires in (wal.hpp:399-608, SURVEY C14).
    */
  def appendBatch(rvs: Seq[RowVersion]): Unit = this.synchronized {
    rvs.foreach(writeRecord)
    out.flush()
    fos.getFD.sync()
  }

  private def writeRecord(rv: RowVersion): Unit = {
    val row = RowCodec.encode(rv.values, meta)
    val payload = new java.io.ByteArrayOutputStream()
    val p = new DataOutputStream(payload)
    p.writeLong(rv.seq)
    p.writeByte(if (rv.tombstone) 1 else 0)
    p.write(row)
    p.flush()
    val bytes = payload.toByteArray
    val crc = new CRC32(); crc.update(bytes)
    out.writeInt(bytes.length)
    out.write(bytes)
    out.writeLong(crc.getValue)
  }

  /** Replay every intact record, oldest→newest; a corrupt tail is
    * skipped AND truncated away (reference wal.hpp recover()):
    * without the truncation, records appended after recovery would
    * sit behind the garbage and be unreachable on the next restart.
    */
  def replay(): Vector[RowVersion] = this.synchronized {
    if (!Files.exists(path)) return Vector.empty
    val all = Files.readAllBytes(path)
    val in = new DataInputStream(new ByteArrayInputStream(all))
    val acc = Vector.newBuilder[RowVersion]
    var intactBytes = 0L
    try {
      while (true) {
        val len = in.readInt()
        // garbage decoded as a length must not drive an allocation: a
        // negative or larger-than-remaining value marks corruption
        if (len <= 0 || intactBytes + 4L + len + 8L > all.length)
          throw new EOFException("corrupt length")
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val expected = in.readLong()
        val crc = new CRC32(); crc.update(bytes)
        if (crc.getValue != expected)
          throw new EOFException("corrupt record")
        val rec = new DataInputStream(new ByteArrayInputStream(bytes))
        val seq = rec.readLong()
        val tomb = rec.readByte() == 1
        acc += RowVersion(seq, tomb, RowCodec.decode(rec, meta))
        intactBytes += 4L + len + 8L
      }
    } catch {
      case _: EOFException => ()
      case _: RuntimeException => () // decode failure on corrupt payload
    }
    val recovered = acc.result()
    if (intactBytes < all.length) {
      // preserve the unreadable tail for offline repair before cutting
      // it off (truncation makes future appends reachable; keeping the
      // bytes means a mid-log bit flip is not irreversible data loss)
      Files.write(path.resolveSibling(path.getFileName.toString + ".corrupt"),
        java.util.Arrays.copyOfRange(all, intactBytes.toInt, all.length),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      out.close()
      val ch = java.nio.channels.FileChannel.open(path,
        java.nio.file.StandardOpenOption.WRITE)
      try ch.truncate(intactBytes) finally ch.close()
      fos = new FileOutputStream(path.toFile, true)
      out = new DataOutputStream(new BufferedOutputStream(fos))
      System.err.println(
        s"[graft] WAL $path: recovered ${recovered.size} records, " +
          s"truncated ${all.length - intactBytes} corrupt bytes (kept in .corrupt)")
    }
    lastRecovery = Some(DeltaLog.Recovery(recovered.size, all.length - intactBytes))
    recovered
  }

  /** Checkpoint: copy the current log to `dest` (reference
    * wal.hpp:330-397 — checkpoint is a file snapshot). Flushed and
    * fsynced first so the copy is a complete prefix of the live log.
    */
  def checkpoint(dest: Path): Unit = this.synchronized {
    out.flush()
    fos.getFD.sync()
    Files.copy(path, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Reset after a flush made the log's contents durable in parquet. */
  def truncate(): Unit = this.synchronized {
    out.close()
    Files.deleteIfExists(path)
    fos = new FileOutputStream(path.toFile, true)
    out = new DataOutputStream(new BufferedOutputStream(fos))
  }

  def close(): Unit = this.synchronized { out.close() }
}

object DeltaLog {
  /** Result of a replay(): records recovered, corrupt bytes cut off. */
  final case class Recovery(records: Int, truncatedBytes: Long)
}
