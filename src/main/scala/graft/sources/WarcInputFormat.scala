package graft.sources

import java.io.{ByteArrayOutputStream, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BytesWritable, LongWritable}
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.hadoop.mapreduce.{InputSplit, JobContext, RecordReader,
  TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.{FileInputFormat, FileSplit}

/** Splittable WARC (ISO 28500) input format with STRICT Content-Length
  * byte framing — the round-10 upgrade over the record-delimiter text
  * scan, closing its documented edge: a payload CONTAINING the bytes
  * `\r\n\r\nWARC/` no longer splits a record early, because mid-stream
  * records are framed by reading exactly `Content-Length` payload bytes
  * (the reader never *searches* for a boundary except when recovering).
  *
  * Split model (the LineRecordReader contract, applied to records):
  *   - a record belongs to the split containing its START byte;
  *   - a reader whose split starts mid-file SYNCS forward to the first
  *     record boundary strictly after `start` (seeking back 8 bytes so a
  *     boundary pattern straddling the split edge is still seen), then
  *     reads Content-Length-framed records while recordStart <= end —
  *     deliberately running past `end` to finish the record it owns;
  *   - sync candidates (`\r\n\r\nWARC/`) are VALIDATED before being
  *     trusted: the version line must parse (`WARC/d.d`), a header block
  *     terminated by a blank line must follow within 1 MB, and it must
  *     carry a parseable Content-Length AND a `WARC-Type` header (both
  *     mandatory per ISO 28500 — requiring the second shrinks the
  *     false-sync window for payloads embedding partial WARC headers).
  *     Payload bytes that merely contain the delimiter are rejected and
  *     scanning continues;
  *   - a rejected candidate that nonetheless carries a `WARC-Type`
  *     header in a terminated block — the signature of a DAMAGED REAL
  *     RECORD (truncated writes retain their WARC-* headers; payloads
  *     embedding partial WARC heads typically carry version +
  *     Content-Length at most) — is REMEMBERED: once the sync scan
  *     proves the region by reaching a trusted boundary (or EOF), the
  *     reader re-seeks to the first such candidate and reads
  *     sequentially from it, recovering it as `_corrupt`. Without this,
  *     a corrupt record whose START falls after the previous split's end
  *     is silently lost (the previous reader stops at `pos > end`, this
  *     reader's sync scans past it) and row counts become split-layout-
  *     dependent. The residual (and documented) limit: a payload
  *     embedding a COMPLETE, structurally-valid WARC header block AND
  *     straddling a split boundary can still fool the sync/recovery —
  *     detecting that needs whole-file context no splittable reader has.
  *
  * Malformed records (no parseable Content-Length) are RECOVERED, not
  * fatal: the reader scans to the next validated boundary (or EOF) and
  * emits the raw chunk as one record — the DataFrame layer surfaces it
  * in `_corrupt` (the JSONL PERMISSIVE discipline).
  *
  * `.warc.gz` decompresses through the codec factory in ONE split
  * (gzip is not seekable) — crawl corpora parallelize across their many
  * files, which is how CommonCrawl shards.
  *
  * Values are raw record BYTES (version line + headers + blank line +
  * exactly Content-Length payload bytes); keys are record start offsets.
  */
class WarcInputFormat
    extends FileInputFormat[LongWritable, BytesWritable] {

  override def isSplitable(context: JobContext, file: Path): Boolean =
    new CompressionCodecFactory(context.getConfiguration)
      .getCodec(file) == null

  override def createRecordReader(split: InputSplit,
      context: TaskAttemptContext): RecordReader[LongWritable, BytesWritable] =
    new WarcRecordReader
}

private object WarcRecordReader {
  val Magic: Array[Byte] = "WARC/".getBytes(StandardCharsets.US_ASCII)
  val Boundary: Array[Byte] =
    "\r\n\r\nWARC/".getBytes(StandardCharsets.US_ASCII)
  val CrLfCrLf: Array[Byte] = Array[Byte]('\r', '\n', '\r', '\n')
  /** Header blocks larger than this are treated as malformed. */
  val HeaderCap: Int = 1 << 20

  /** Emitted-bytes cap for one recovered corrupt chunk (the scan itself
    * is unbounded — realignment must still be found; only the BUFFER is
    * capped so a gigabyte corrupt region cannot OOM the task). */
  val MaxRecoveryChunk: Int = 64 << 20
  val VersionRe = "^WARC/[0-9]+\\.[0-9]+$".r
  val ContentLengthRe =
    "(?mi)^Content-Length:\\s*(\\d+)\\r?$".r
  val WarcTypeRe = "(?mi)^WARC-Type:\\s*\\S".r

  /** Content-Length parsed defensively: the value is payload-controlled
    * on the recovery/sync paths, so a digit run overflowing Long (20+
    * digits) is noise, not a length — None, never a thrown
    * NumberFormatException (which would turn corrupt input into a fatal
    * task failure). */
  def parseContentLength(head: String): Option[Long] =
    ContentLengthRe.findFirstMatchIn(head).flatMap { m =>
      try Some(m.group(1).toLong)
      catch { case _: NumberFormatException => None }
    }

  /** `validateHead` outcome bit flags. `NotAHead` (0) means the version
    * line failed to parse or no blank-line terminator arrived within the
    * cap — payload bytes that merely resemble a delimiter. Otherwise
    * `HeadBit` is set, plus: */
  final val NotAHead = 0
  /** Version line parses and the header block terminates. */
  final val HeadBit = 1
  /** + parseable Content-Length: the sequential reader can FRAME from
    * here, and a recovery scan realigns here. */
  final val FrameBit = 2
  /** + `WARC-Type` (mandatory per ISO 28500): the signature of a real
    * record head — damaged records retain it, while real-world payloads
    * embedding partial WARC headers (tutorials, mirrored WARC files
    * served over HTTP) typically carry version + Content-Length at
    * most. Sync REMEMBERS typed heads for recovery. */
  final val TypeBit = 4
  /** All three: a trusted mid-file sync anchor. */
  final val SyncOk = HeadBit | FrameBit | TypeBit
}

private class WarcRecordReader
    extends RecordReader[LongWritable, BytesWritable] {
  import WarcRecordReader._

  private var in: PushbackInputStream = _
  private var fsIn: org.apache.hadoop.fs.FSDataInputStream = _
  private var pos: Long = 0L
  private var start: Long = 0L
  private var end: Long = 0L
  /** On-disk file length; valid bound for `pos` only on the
    * uncompressed path (positions are raw offsets there). */
  private var fileLen: Long = Long.MaxValue
  private var done = false
  private val key = new LongWritable()
  private val value = new BytesWritable()

  override def initialize(genericSplit: InputSplit,
      context: TaskAttemptContext): Unit = {
    val split = genericSplit.asInstanceOf[FileSplit]
    val conf = context.getConfiguration
    val file = split.getPath
    val fs = file.getFileSystem(conf)
    val codec = new CompressionCodecFactory(conf).getCodec(file)
    start = split.getStart
    end = start + split.getLength
    fileLen = fs.getFileStatus(file).getLen
    fsIn = fs.open(file)
    val base: InputStream =
      if (codec != null) {
        // non-splittable: one split covers the whole file; positions
        // below are DECOMPRESSED offsets, end is unbounded
        require(start == 0, s"compressed WARC split must start at 0: $file")
        end = Long.MaxValue
        codec.createInputStream(fsIn)
      } else {
        // seek back 8 bytes so a boundary pattern straddling the split
        // edge is visible to the sync scan
        val seekTo = math.max(0L, start - (Boundary.length - 1).toLong)
        fsIn.seek(seekTo)
        pos = seekTo
        fsIn
      }
    in = new PushbackInputStream(base, HeaderCap + 64)
    if (codec == null && start > 0L) {
      // sync to the first validated record boundary STRICTLY after start
      done = !syncToBoundary(minStart = start + 1)
    }
    // start == 0: the file must open with a record (or be recovered)
  }

  private def read1(): Int = {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  private def unread(bytes: Array[Byte], off: Int, len: Int): Unit = {
    in.unread(bytes, off, len)
    pos -= len
  }

  /** Ring buffer over the last `Boundary.length` bytes read — a naive
    * matched-prefix restart would MISS boundaries preceded by extra
    * CRLFs (every payload ending in `\r\n` produces one), so the match
    * test compares the full trailing window after every byte. */
  private final class BoundaryWindow {
    private val ring = new Array[Byte](Boundary.length)
    private var n = 0L
    def push(b: Int): Unit = {
      ring((n % Boundary.length).toInt) = b.toByte
      n += 1
    }
    def matches: Boolean = {
      if (n < Boundary.length) return false
      var i = 0
      while (i < Boundary.length) {
        if (ring(((n + i) % Boundary.length).toInt) != Boundary(i))
          return false
        i += 1
      }
      true
    }
  }

  /** Re-seek the (uncompressed) stream to an absolute offset, discarding
    * any pushback state. Only legal on the uncompressed path — sync (the
    * sole caller's context) never runs for compressed splits. */
  private def reseek(to: Long): Unit = {
    fsIn.seek(to)
    pos = to
    in = new PushbackInputStream(fsIn, HeaderCap + 64)
  }

  /** Scan for `\r\n\r\nWARC/`; on each hit, validate the candidate
    * record head. A [[WarcRecordReader.SyncOk]] head anchors the sync:
    * the stream is positioned AT the record start (the 'W') and true is
    * returned. A TYPED but untrusted head (carries `WARC-Type` but its
    * Content-Length is missing/unparseable — the damaged-record
    * signature) is remembered; once the scan proves the region by
    * reaching a trusted anchor or EOF, the reader re-seeks to the FIRST
    * such candidate so the sequential read path emits it (recovered as
    * `_corrupt`) instead of losing the bytes — without this, a corrupt
    * record whose start falls after the previous split's end is owned by
    * nobody and row counts become split-layout-dependent. A FRAMED but
    * untyped head (version + Content-Length, no `WARC-Type` — a
    * spec-violating record the sequential reader nonetheless frames and
    * emits) is neither trusted outright (payloads embedding
    * version+Content-Length heads are the common false-sync shape) nor
    * skipped (whole-file and split reads would then disagree): it is
    * resolved by PROOF — [[verifyFramedChain]] follows its
    * Content-Length hops, and only a chain that lands exactly on a
    * typed head or a clean EOF anchors the sync there. Plain
    * delimiter-lookalikes are never remembered or trusted. Candidates
    * starting before `minStart` belong to the previous split and are
    * skipped. False only at EOF with nothing owned. */
  private def syncToBoundary(minStart: Long): Boolean = {
    var pending = -1L
    var w = new BoundaryWindow
    var b = read1()
    while (b >= 0) {
      w.push(b)
      // every candidate from here on starts past `end` and belongs to
      // the NEXT split (whose own sync will see it) — stop instead of
      // scanning to this record's terminating boundary (r14 review: an
      // oversized record spanning k splits cost O(record · k) dead
      // reads). A pending candidate resolves exactly as the
      // scan-exhausted path would; nextKeyValue's pos > end gate still
      // decides ownership.
      if (pos - Magic.length > end) {
        if (pending >= 0) { reseek(pending); return true }
        return false
      }
      if (w.matches) {
        val candidate = pos - Magic.length
        if (candidate >= minStart) {
          val grade = validateHead()
          if (grade == SyncOk) {
            if (pending >= 0) { reseek(pending); return true }
            unread(Magic, 0, Magic.length)
            return true
          }
          else if ((grade & (HeadBit | FrameBit)) == (HeadBit | FrameBit)) {
            if (verifyFramedChain(candidate)) {
              reseek(if (pending >= 0) pending else candidate)
              return true
            }
            // disproven framed-untyped candidate: verifyFramedChain
            // moved the stream; resume the scan just past the candidate
            // ("WARC/" contains no CR/LF, so no overlapping boundary
            // pattern can start within it — a fresh window at
            // candidate+1 misses nothing)
            reseek(candidate + 1)
            w = new BoundaryWindow
          } else if ((grade & TypeBit) != 0 && pending < 0)
            pending = candidate
        }
        // rejected — keep scanning (window state carries on naturally)
      }
      b = read1()
    }
    if (pending >= 0) { reseek(pending); true } else false
  }

  /** Prove or refute a framed-but-untyped sync candidate by following
    * its Content-Length chain: from `candidateStart`, repeatedly read a
    * header block, require a parsing version line + terminator, and hop
    * exactly Content-Length payload bytes (+ the record separator).
    * TRUE when the chain lands on a TYPED head (a trusted anchor — the
    * hops walked record boundaries, so the candidate is one) or ends
    * cleanly at EOF; FALSE on any misalignment (no version line, no
    * terminator, unparseable or overrunning Content-Length) — the
    * signature of payload bytes that merely embed a WARC head. Bytes
    * that embed a COMPLETE chained copy of the tail of a real WARC file
    * could still pass, the residual limit inherent to any splittable
    * sync. The stream position is clobbered either way; callers reseek. */
  private def verifyFramedChain(candidateStart: Long,
      maxHops: Int = 8): Boolean = {
    reseek(candidateStart)
    var hop = 0
    while (hop < maxHops) {
      val headOpt = readHeaderBlock()
      if (headOpt.isEmpty) return true // clean EOF on a record boundary
      // the stream sits at a record start, so the block carries the
      // full version line ("WARC/d.d") as its first line
      val head = new String(headOpt.get, StandardCharsets.ISO_8859_1)
      val nl = head.indexOf("\r\n")
      val versionOk = nl >= 0 &&
        VersionRe.findFirstIn(head.substring(0, nl)).isDefined
      if (!head.endsWith("\r\n\r\n") || !versionOk) return false
      if (WarcTypeRe.findFirstMatchIn(head).isDefined)
        return true // chained onto a trusted anchor
      val cl = parseContentLength(head)
      if (cl.isEmpty) return false
      // The CL is payload-controlled: a value overrunning the file's
      // remaining bytes refutes the candidate outright (the old
      // "buffer then check short read" did the same test but allocated
      // the full claimed length first — a hostile CL near 2 GB OOMs and
      // one above it threw, turning corrupt input into a fatal task).
      // Hop by seek; nothing is buffered. Sync runs only on the
      // uncompressed path, where fileLen bounds pos.
      if (cl.get > fileLen - pos) return false
      reseek(pos + cl.get)
      val sep = readFully(4L)
      if (sep.length == 0) return true // chain ends exactly at EOF
      if (sep.length < 4) {
        // trailing partial separator then EOF is a (sloppy) clean end;
        // anything else is misalignment
        return java.util.Arrays.equals(sep,
          java.util.Arrays.copyOf(CrLfCrLf, sep.length))
      }
      if (!java.util.Arrays.equals(sep, CrLfCrLf))
        unread(sep, 0, sep.length) // separator-less record: tolerate,
      // the next header read decides
      hop += 1
    }
    // maxHops aligned untyped frames in a row, none typed: every hop
    // landed a Content-Length exactly on a version line — coincidence
    // is not a realistic shape; trust the candidate.
    true
  }

  /** With the stream positioned just after `WARC/`, look ahead for a
    * version line + terminated header block and grade the candidate
    * ([[WarcRecordReader.NotAHead]] … [[WarcRecordReader.SyncOk]]);
    * push every byte back regardless of outcome. */
  private def validateHead(): Int = {
    val buf = new ByteArrayOutputStream(512)
    var grade = NotAHead
    var terminated = false
    // read until header-block terminator or cap
    var m = 0
    var b = read1()
    while (b >= 0 && !terminated && buf.size < HeaderCap) {
      buf.write(b)
      if (b == CrLfCrLf(m)) {
        m += 1
        if (m == CrLfCrLf.length) terminated = true
      } else m = if (b == '\r') 1 else 0
      if (!terminated) b = read1()
    }
    if (terminated) {
      val head = new String(buf.toByteArray, StandardCharsets.ISO_8859_1)
      val nl = head.indexOf("\r\n")
      val version = if (nl < 0) "" else "WARC/" + head.substring(0, nl)
      if (VersionRe.findFirstIn(version).isDefined) {
        grade = HeadBit
        if (ContentLengthRe.findFirstMatchIn(head).isDefined)
          grade |= FrameBit
      }
      // TypeBit is graded INDEPENDENTLY of the version line (r14): a
      // record whose version fails the regex (WARC/1.1.1) but carries
      // WARC-Type is exactly the damaged-record shape the pending
      // machinery exists for — gating it on the version made such
      // records invisible to split sync while the sequential path
      // emitted them, i.e. split-layout-dependent row counts (the
      // defect class this file documents as closed). Residual cost:
      // a hostile payload embedding a terminated boundary-lookalike
      // with WARC-Type but a bad version can now become a pending
      // chunk for a split landing inside that payload — the same
      // bounded ambiguity class as the documented chained-copy limit.
      if (WarcTypeRe.findFirstMatchIn(head).isDefined)
        grade |= TypeBit
    }
    val arr = buf.toByteArray
    if (arr.length > 0) unread(arr, 0, arr.length)
    grade
  }

  /** Read exactly n bytes (short read at EOF returns what exists). */
  private def readFully(n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"payload too large for one record: $n")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val r = in.read(out, off, n.toInt - off)
      if (r < 0) return java.util.Arrays.copyOf(out, off)
      pos += r
      off += r
    }
    out
  }

  /** Read the header block (through its blank-line terminator) from the
    * current position; None at immediate EOF. */
  private def readHeaderBlock(): Option[Array[Byte]] = {
    val buf = new ByteArrayOutputStream(512)
    var m = 0
    var b = read1()
    if (b < 0) return None
    while (b >= 0) {
      buf.write(b)
      if (b == CrLfCrLf(m)) {
        m += 1
        if (m == CrLfCrLf.length) return Some(buf.toByteArray)
      } else m = if (b == '\r') 1 else 0
      if (buf.size >= HeaderCap) return Some(buf.toByteArray) // malformed
      b = read1()
    }
    Some(buf.toByteArray) // EOF mid-headers — malformed
  }

  /** Malformed record recovery: collect bytes until the next FRAMEABLE
    * or TYPED boundary (stream left at the next record start) or EOF.
    * A Content-Length-bearing head realigns the sequential reader
    * whether or not it carries WARC-Type; a TYPED-but-unframeable head
    * STARTS A NEW corrupt chunk rather than being swallowed into this
    * one — consecutive damaged records each surface as their own
    * `_corrupt` row. That decomposition is also what keeps split reads
    * consistent with whole-file reads: the split sync independently
    * remembers the first typed head after its start, so if recovery
    * swallowed a following typed head into the previous chunk, a split
    * landing between two damaged records would emit the second one
    * TWICE (once inside the previous split's merged chunk, once from
    * its own sync-remembered recovery). */
  private def recoverChunk(prefix: Array[Byte]): Array[Byte] = {
    val buf = new ByteArrayOutputStream(prefix.length + 512)
    buf.write(prefix, 0, prefix.length)
    val w = new BoundaryWindow
    // seed with the prefix tail: an empty-payload malformed head is
    // DIRECTLY followed by the next record, so the boundary's \r\n\r\n
    // lives in the prefix — an unseeded window would scan past that
    // record start and swallow everything to the next boundary or EOF
    var i = math.max(0, prefix.length - (Boundary.length - 1))
    while (i < prefix.length) { w.push(prefix(i) & 0xff); i += 1 }
    // the emitted chunk is CAPPED (r14 review): a hostile Content-Length
    // routed here (> Int.MaxValue-ish) or a corrupt region with no later
    // valid boundary previously buffered the whole remainder and OOMed —
    // the exact fatal-task shape the framed gate exists to prevent. The
    // scan still walks to the realignment boundary; bytes past the cap
    // are dropped from the emitted `_corrupt` row, never from framing.
    var truncated = false
    var b = read1()
    while (b >= 0) {
      if (buf.size < MaxRecoveryChunk) buf.write(b) else truncated = true
      w.push(b)
      if (w.matches && (validateHead() & (FrameBit | TypeBit)) != 0) {
        // drop the consumed boundary from the chunk, reposition at the
        // record start (a truncated chunk never holds the boundary)
        unread(Magic, 0, Magic.length)
        val arr = buf.toByteArray
        return if (truncated) arr
          else java.util.Arrays.copyOf(arr, arr.length - Boundary.length)
      }
      b = read1()
    }
    buf.toByteArray
  }

  override def nextKeyValue(): Boolean = {
    if (done || pos > end) return false
    val recordStart = pos
    val headOpt = readHeaderBlock()
    if (headOpt.isEmpty) { done = true; return false }
    val head = headOpt.get
    val headStr = new String(head, StandardCharsets.ISO_8859_1)
    val lenOpt = parseContentLength(headStr)
    // a CL too large to materialize alongside its header in one record
    // value is treated as unframed (recovery scan), never a thrown
    // require from readFully — corrupt input must not fail the task.
    // The version line must match the SAME regex split sync trusts
    // (r14): framing on a bare "WARC/" prefix emitted nonstandard-
    // version records (WARC/1.1.1) that sync could never anchor, so
    // row counts depended on the split layout; such records now route
    // through recovery on BOTH paths.
    val nlIdx = headStr.indexOf("\r\n")
    val versionOk = nlIdx >= 0 &&
      VersionRe.findFirstIn(headStr.substring(0, nlIdx)).isDefined
    val framed = headStr.endsWith("\r\n\r\n") && versionOk &&
      lenOpt.exists(_ <= (Int.MaxValue - head.length - 8).toLong)
    val recordBytes: Array[Byte] =
      if (framed) {
        val payload = readFully(lenOpt.get)
        // consume the record separator if present (malformed files may
        // omit it; the NEXT read then recovers)
        val sep = readFully(4L)
        if (!(sep.length == 4 && java.util.Arrays.equals(sep, CrLfCrLf)) &&
            sep.length > 0)
          unread(sep, 0, sep.length)
        val out = new ByteArrayOutputStream(head.length + payload.length)
        out.write(head, 0, head.length)
        out.write(payload, 0, payload.length)
        out.toByteArray
      } else recoverChunk(head)
    key.set(recordStart)
    value.set(recordBytes, 0, recordBytes.length)
    true
  }

  override def getCurrentKey: LongWritable = key
  override def getCurrentValue: BytesWritable = value
  override def getProgress: Float =
    if (end == Long.MaxValue || end == start) 0f
    else math.min(1f, (pos - start).toFloat / (end - start).toFloat)
  override def close(): Unit = if (in != null) in.close()
}
