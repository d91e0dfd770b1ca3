package graft.cspro

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

/** Per-file character-encoding detection.
  *
  * The reference sniffs each DCF/DAT with chardet over the head of the file
  * (ref: DHS_To_Database/cspro_parser/DCF_Parser.py:34-42, DAT_Parser.py:62-68)
  * and falls back to cp1252 when re-reading CSVs
  * (ref: 04_DHS_Load_New_Tables.ipynb:440-444). There is no Spark primitive
  * for this, so it is a driver-side pre-step per file (files are small); the
  * detected charset is then passed to `spark.read.option("encoding", …)`.
  *
  * The heuristic: BOM detection, then strict-UTF-8 validation of the head of
  * the file; anything that fails strict UTF-8 decoding is treated as cp1252
  * (windows-1252 decodes every byte sequence, making it the safe superset
  * fallback for the latin-script DHS corpus).
  */
object CharsetSniffer {

  val DefaultSniffBytes: Int = 256 * 1024

  def detect(bytes: Array[Byte]): Charset = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return StandardCharsets.UTF_8
    // UTF-32LE's BOM (FF FE 00 00) starts with UTF-16LE's (FF FE): the
    // 4-byte checks must run first or UTF-32 files decode as NUL-riddled
    // UTF-16
    if (bytes.length >= 4 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte &&
      bytes(2) == 0 && bytes(3) == 0)
      return Charset.forName("UTF-32LE")
    if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      bytes(2) == 0xFE.toByte && bytes(3) == 0xFF.toByte)
      return Charset.forName("UTF-32BE")
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return StandardCharsets.UTF_16LE
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return StandardCharsets.UTF_16BE
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      // drop a possibly-truncated trailing multibyte sequence before validating
      var end = bytes.length
      var backtrack = 0
      while (backtrack < 3 && end > 0 && (bytes(end - 1) & 0xC0) == 0x80) { end -= 1; backtrack += 1 }
      if (end > 0 && (bytes(end - 1) & 0x80) != 0 && (bytes(end - 1) & 0xC0) != 0x80) end -= 1
      decoder.decode(java.nio.ByteBuffer.wrap(bytes, 0, end))
      StandardCharsets.UTF_8
    } catch {
      case _: CharacterCodingException => Charset.forName("windows-1252")
    }
  }

  /** Decode bytes with the sniffed charset, stripping a leading BOM — the
    * decoded U+FEFF would otherwise prefix the first line and break
    * `[Dictionary]` chunk-header detection (Python's chardet path in the
    * reference reports UTF-8-SIG, which strips it implicitly).
    */
  def decode(bytes: Array[Byte]): String = {
    val s = new String(bytes, detect(bytes))
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
  }

  /** Sniff a bounded head off an open stream (caller closes the stream).
    * The shared primitive behind [[detectFile]] and the fixedwidth
    * connector's partition reader — one fill-loop to maintain.
    */
  def detectStream(in: java.io.InputStream, sniffBytes: Int = DefaultSniffBytes): Charset = {
    val buf = new Array[Byte](sniffBytes)
    var off = 0
    var n = in.read(buf, off, buf.length - off)
    while (n > 0 && off + n < buf.length) { off += n; n = in.read(buf, off, buf.length - off) }
    detect(java.util.Arrays.copyOf(buf, off + Math.max(n, 0)))
  }

  /** Sniff the head of a local file (driver-side, pre-Spark). */
  def detectFile(path: String, sniffBytes: Int = DefaultSniffBytes): Charset = {
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
    try detectStream(in, sniffBytes) finally in.close()
  }
}
