package graft.engine

import java.io.{BufferedOutputStream, ByteArrayInputStream, DataInputStream, DataOutputStream, EOFException, FileOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.CRC32

/** Per-table append-only durability log — the analogue of the
  * reference WAL (includes/wal.hpp:36-397): append + flush per
  * mutation, CRC-validated recovery that stops at the first corrupt
  * record, truncate after flush-to-parquet.
  *
  * Record layout: [len:int][seq:long][tombstone:byte][row bytes]
  * [crc32:long over the payload].
  *
  * SIZE BOUND (load-bearing for [[replay]] and [[truncateThrough]],
  * which read the WHOLE file into memory): the live log never exceeds
  * ~(memtable cap + in-flight window). The Engine flushes the hot
  * store at hotLimit rows / hotLimitBytes (64 MB default) and every
  * flush truncateThrough-s the flushed prefix away, so the file holds
  * at most one memtable's worth of records plus whatever concurrent
  * writers staged during the flush job — bounded by writer concurrency
  * × batch size, not by table size. A flush-policy change that stops
  * truncating after flush, or raises the caps to "unbounded", SILENTLY
  * unbounds these full-file reads — re-derive this bound before doing
  * that. DurabilitySpec asserts the flush-truncates-the-log half.
  */
final class DeltaLog(path: Path, meta: TableMeta) {

  Files.createDirectories(path.getParent)
  private var fos = new FileOutputStream(path.toFile, true)
  private var out = new DataOutputStream(new BufferedOutputStream(fos))

  /** What the last replay() recovered and discarded — or, when a
    * truncateThrough() rewrite found corruption, the frames it kept
    * and the bytes it excised (r21 ADVICE item 3: a routine flush
    * that cuts a corrupt mid-log frame must be as observable as a
    * recovery that does). None before either event. A nonzero
    * truncatedBytes distinguishes a benign torn tail (small,
    * end-of-log) from mid-log corruption whose intact successors were
    * also cut off — the discarded bytes are preserved in the .corrupt
    * sibling either way, but only an operator who can SEE the loss
    * can repair it.
    */
  @volatile var lastRecovery: Option[DeltaLog.Recovery] = None

  // ---- cross-thread group commit (r20, C14 one level up) -------------------
  // appendBatch already batches WITHIN one call; concurrent callers
  // (8 writer threads doing independent batchPuts) each paid their own
  // fsync, serialized. The classic ticket-based group commit coalesces
  // them: stage() buffers + flushes to the OS under the append lock
  // and hands out a monotone ticket; syncTo() makes one caller the
  // LEADER whose single fsync covers every ticket staged before it
  // read the high-water mark — followers arriving behind it return
  // without syncing. N concurrent writers pay ~2 fsyncs, not N.
  // Durability contract UNCHANGED: an append call returns only after
  // an fsync covering its records completed (a crash loses no acked
  // write). Lock order is syncLock → this everywhere (stage takes
  // only `this`), so the pair cannot deadlock.
  private var stagedTicket = 0L  // guarded by this
  private var syncedTicket = 0L  // guarded by syncLock
  private val syncLock = new Object

  /** Stage records: CRC-framed, buffered, and flushed to the OS —
    * NOT yet durable. Returns the ticket [[syncTo]] must cover before
    * the write may be acknowledged.
    */
  def stage(rvs: Seq[RowVersion]): Long = this.synchronized {
    rvs.foreach(writeRecord)
    out.flush()
    stagedTicket += 1
    stagedTicket
  }

  /** [[stage]] for rows the caller already encoded (RowCodec.encode
    * outside the serialized section — concurrent writers encode in
    * parallel and the append lock holds only the framing + buffer
    * copy). Byte format identical to [[stage]].
    */
  def stageEncoded(recs: Seq[(RowVersion, Array[Byte])]): Long = this.synchronized {
    recs.foreach { case (rv, row) => writeFramed(rv.seq, rv.tombstone, row) }
    out.flush()
    stagedTicket += 1
    stagedTicket
  }

  /** Return once an fsync covering `ticket` has completed — either
    * this caller's own (it becomes the leader and syncs the whole
    * staged group) or one a concurrent leader already ran.
    */
  def syncTo(ticket: Long): Unit = syncLock.synchronized {
    if (syncedTicket >= ticket) return
    // everything staged so far is already flushed to the OS (stage
    // flushes under the append lock), so one sync covers it all
    val cover = this.synchronized(stagedTicket)
    fos.getFD.sync()
    syncedTicket = cover
  }

  def append(rv: RowVersion): Unit = appendBatch(Seq(rv))

  /** Batched append: all records buffered, ONE flush + fsync for the
    * group — the group-commit the reference WAL declares but never
    * wires in (wal.hpp:399-608, SURVEY C14). Under concurrency the
    * fsync additionally coalesces across calls (see [[stage]]).
    */
  def appendBatch(rvs: Seq[RowVersion]): Unit = syncTo(stage(rvs))

  private def writeRecord(rv: RowVersion): Unit =
    writeFramed(rv.seq, rv.tombstone, RowCodec.encode(rv.values, meta))

  /** Frame one pre-encoded row: [len][seq(8,BE)|tomb(1)|row][crc32] —
    * byte-identical to the historical DataOutputStream framing, built
    * in one array (no per-record stream allocations in the append
    * lock's critical section).
    */
  private def writeFramed(seq: Long, tomb: Boolean, row: Array[Byte]): Unit = {
    val bytes = new Array[Byte](9 + row.length)
    var i = 0
    while (i < 8) { bytes(i) = ((seq >>> ((7 - i) * 8)) & 0xff).toByte; i += 1 }
    bytes(8) = if (tomb) 1 else 0
    System.arraycopy(row, 0, bytes, 9, row.length)
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
  def replay(): Vector[RowVersion] = syncLock.synchronized { this.synchronized {
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
  } }

  /** Checkpoint: copy the current log to `dest` (reference
    * wal.hpp:330-397 — checkpoint is a file snapshot). Flushed and
    * fsynced first so the copy is a complete prefix of the live log.
    */
  def checkpoint(dest: Path): Unit = syncLock.synchronized { this.synchronized {
    out.flush()
    fos.getFD.sync()
    Files.copy(path, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  } }

  // NOTE: the old full-reset truncate() is GONE (r21, r20 ADVICE): it
  // had no remaining caller, and its safety argument ("records already
  // durable in the flushed parquet") held only under the pre-r20
  // hold-lock-through-flush design — under freeze-and-swap it would
  // silently discard concurrent writers' staged-but-unflushed records.
  // Flush-driven truncation goes through truncateThrough(cutoff).

  /** Drop records with seq <= cutoff, KEEPING the newer suffix — the
    * reference WAL's `truncate(seq)` (wal.hpp:330-397 rewrites the
    * file keeping seq > cutoff). This is what lets a freeze-and-swap
    * flush truncate only what its tier made durable while concurrent
    * writers' in-flight records (staged DURING the flush job) survive
    * for crash recovery. Atomic: the suffix is written to a tmp
    * sibling, fsynced, and moved over the live log — a crash leaves
    * either the old file (recover() skips records at or below the
    * manifest's flushed max) or the new one. Holds both locks in the
    * syncTo order, so no append or leader fsync interleaves with the
    * descriptor swap; frames are copied RAW (seq is the first 8 bytes
    * of each CRC-framed payload), never re-encoded.
    */
  def truncateThrough(cutoff: Long): Unit = syncLock.synchronized { this.synchronized {
    out.flush() // buffered frames must be in the file before the read
    if (!Files.exists(path)) return
    val all = Files.readAllBytes(path)
    val keep = new java.io.ByteArrayOutputStream()
    var off = 0
    def i32(at: Int): Int =
      ((all(at) & 0xff) << 24) | ((all(at + 1) & 0xff) << 16) |
        ((all(at + 2) & 0xff) << 8) | (all(at + 3) & 0xff)
    def i64(at: Int): Long = {
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (all(at + k) & 0xffL); k += 1 }
      v
    }
    var ok = true
    var keptFrames = 0
    while (ok && off + 4 <= all.length) {
      val len = i32(off)
      if (len <= 0 || off + 4L + len + 8L > all.length) ok = false
      else {
        // CRC-validate every frame before keeping it (r21, r20 ADVICE):
        // length-only walking would KEEP a mid-log frame whose length
        // survived but whose payload was corrupted — a frame replay()
        // would reject — so the rewrite and the next recovery could
        // disagree about the log's contents. Bytes are already in
        // memory; the checksum is the cheap part of the rewrite.
        val crc = new CRC32(); crc.update(all, off + 4, len)
        if (crc.getValue != i64(off + 4 + len)) ok = false
        else {
          val seq = i64(off + 4)
          val total = 4 + len + 8
          if (seq > cutoff) { keep.write(all, off, total); keptFrames += 1 }
          off += total
        }
      }
    }
    // corruption (bad length OR bad CRC, ok=false) cuts the log HERE,
    // exactly as replay() would at the next recovery: the corrupt
    // frame and everything after it are dropped from the rewrite, and
    // — like replay() — the dropped bytes are preserved in the
    // .corrupt sibling so a mid-log bit flip is never irreversible.
    if (off < all.length) {
      Files.write(path.resolveSibling(path.getFileName.toString + ".corrupt"),
        java.util.Arrays.copyOfRange(all, off, all.length),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      // mirror replay() (r21 ADVICE item 3): a routine flush that
      // silently excised a corrupt mid-log frame — possibly together
      // with intact successor records above the cutoff — would
      // otherwise pass unnoticed until a much later recovery; the
      // event is both logged and recorded in lastRecovery so callers
      // and specs can observe it at the flush that found it.
      System.err.println(
        s"[graft] WAL $path: truncateThrough($cutoff) found corruption at " +
          s"offset $off — dropped ${all.length - off} bytes (kept in .corrupt)")
      lastRecovery = Some(DeltaLog.Recovery(keptFrames, all.length - off.toLong))
    }
    val tmp = path.resolveSibling(path.getFileName.toString + ".trunc")
    Files.write(tmp, keep.toByteArray)
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.force(true) finally ch.close()
    out.close()
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    fos = new FileOutputStream(path.toFile, true)
    out = new DataOutputStream(new BufferedOutputStream(fos))
  } }

  def close(): Unit = syncLock.synchronized { this.synchronized { out.close() } }
}

object DeltaLog {
  /** Result of a replay(): records recovered, corrupt bytes cut off. */
  final case class Recovery(records: Int, truncatedBytes: Long)
}
