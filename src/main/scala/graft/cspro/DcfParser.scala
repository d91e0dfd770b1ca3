package graft.cspro

import graft.model.{ColumnSpec, RelationshipSpec, ValueSpec}

import scala.collection.mutable

/** CSPro `.DCF` dictionary parser.
  *
  * Re-implements, clean-room in Scala, the stateful sequential parse of the
  * reference pipeline (ref: DHS_To_Database/cspro_parser/DCF_Parser.py:53-494):
  * the file is a sequence of `[Bracket]`-headed, blank-line-delimited chunks
  * whose *order* encodes the hierarchy — a `[Level]` chunk sets the level
  * context, `[IdItems]` switches subsequent `[Item]`s into key-collection
  * mode, each `[Record]` re-emits the collected IdItems as its leading rows,
  * `[Item]`s attach to the most recent record, and `[ValueSet]`s attach to
  * the most recent item.
  *
  * Because the format is inherently sequential *per file* (SURVEY.md §2.1-S4)
  * this parser is plain Scala invoked from the driver or from
  * `wholeTextFiles`-style per-file tasks; files are small (≤ a few MB), and
  * parallelism comes from parsing many files at once, not within a file.
  *
  * Semantics preserved exactly (SURVEY.md §1.4):
  *  - the `[Dictionary]` header emits a synthetic first row with
  *    `ItemType = "RecordDesciption"` (sic — the misspelling is part of the
  *    reference's on-disk contract, ref DCF_Parser.py:200) whose Start/Len
  *    are the record-type locator (RecordTypeStart/RecordTypeLen);
  *  - duplicate level/record names: identical label → warning, different
  *    label → fatal (ref DCF_Parser.py:221-228,263-271);
  *  - valueset↔item association is positional with a fuzzy-label sanity
  *    check, warn-only (ref DCF_Parser.py:278-288);
  *  - range expansion (`Value=1:12`) obeys strategy All/Multiple/None with a
  *    size cap; oversize or non-integer ranges degrade to min/max rows with
  *    ValueType RangeMin/RangeMax (single range) or MultiRangeMin/Max
  *    (ref DCF_Parser.py:290-342);
  *  - multiple ranges on one `Value=` line, and descriptions containing `:`
  *    after the `;`, parse correctly (ref DCF_Parser.py:399-437);
  *  - a second `[ValueSet]` for the same item extends the first
  *    (ref DCF_Parser.py:337-341);
  *  - items referenced by a `[Relation]` link are re-tagged
  *    `ItemType = "JoinableItem"` in a final pass (ref DCF_Parser.py:479-489);
  *  - unknown `[Chunks]` are skipped with a note (ref DCF_Parser.py:184-187);
  *  - kv lines split at the FIRST `=` only (descriptions may contain `=`),
  *    and repeated keys within a chunk keep the first value.
  *
  * Deliberate divergence: a final chunk not terminated by a blank line is
  * still processed (the reference silently drops it); kv lines inside skipped
  * chunks are fully ignored rather than leaking into parser globals.
  */
object DcfParser {

  sealed trait RangeExpansion
  object RangeExpansion {
    /** Expand every integer range (≤ limit) to one row per value. */
    case object All extends RangeExpansion
    /** Expand only when an item declares more than one range. */
    case object Multiple extends RangeExpansion
    /** Never expand; always emit min/max rows. */
    case object None extends RangeExpansion
  }

  /** Default cap on expanded range size (ref DCF_Parser.py:53). */
  val DefaultRangeExpansionLimit: Long = 10000L

  final case class ParseResult(
      items: Vector[ColumnSpec],
      values: Vector[ValueSpec],
      relations: Vector[RelationshipSpec],
      warnings: Vector[String],
      skippedChunks: Vector[String]
  )

  final case class DcfParseException(msg: String) extends RuntimeException(msg)

  private val RangeProbe = "-?\\d+:-?\\d+".r
  private val RangePattern = "(-?[0-9]+(?:[.][0-9]+)?):(-?[0-9]+(?:[.][0-9]+)?)".r

  // ---------------------------------------------------------------- parsing

  private final case class RawValue(value: String, desc: String, valueType: String)

  /** One parsed item plus its accumulated values (in emission order). */
  private final case class ItemAcc(var spec: ColumnSpec, values: mutable.ArrayBuffer[RawValue])

  def parse(
      content: String,
      fileCode: String,
      expandRanges: RangeExpansion = RangeExpansion.All,
      rangeExpansionLimit: Long = DefaultRangeExpansionLimit
  ): ParseResult = {
    val warnings = mutable.ArrayBuffer.empty[String]
    val skipped = mutable.ArrayBuffer.empty[String]

    val items = mutable.ArrayBuffer.empty[ItemAcc]
    val relations = mutable.ArrayBuffer.empty[RelationshipSpec]

    var currentRecordName = "N/A"
    var currentRecordLabel = "N/A"
    var currentRecordType = "N/A"
    var currentLevelName = ""
    var currentLevelLabel = ""
    var surveyZeroFill = false
    var surveyDecChar = false

    // mode: what family of chunks we're inside (persists across chunks)
    var mode = "None" // None | Dictionary | IdItems | Records | Relation
    val currentIds = mutable.ArrayBuffer.empty[(String, String, Int, Int)] // name,label,start,len
    val levels = mutable.Map.empty[String, String]
    val records = mutable.Map.empty[String, String]

    val relProc = new RelationRowProcessor(fileCode)

    // state of the chunk being accumulated
    var chunkType: String = ""
    var skippingChunk = false
    val kv = mutable.LinkedHashMap.empty[String, String]
    val chunkValues = mutable.ArrayBuffer.empty[RawValue] // explicit values in line order
    val chunkRanges = mutable.ArrayBuffer.empty[(String, String, String)] // (min,max,desc)

    var lineNo = 0

    def resetChunk(tpe: String): Unit = {
      chunkType = tpe
      skippingChunk = false
      kv.clear(); chunkValues.clear(); chunkRanges.clear()
    }

    def boolOf(s: String): Boolean = s.equalsIgnoreCase("Yes")

    def intOf(key: String, default: Int): Int =
      kv.get(key).map(_.trim).filter(_.nonEmpty).map(_.toInt).getOrElse(default)

    /** Python str(float) formatting for whole numbers: 1.0 not 1 / 1.0E0. */
    def pyFloat(d: Double): String =
      if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e16) {
        val l = d.toLong
        s"$l.0"
      } else d.toString

    def endChunk(): Unit = {
      if (skippingChunk) { skippingChunk = false; return }
      chunkType match {
        case "" => // leading blank lines
        case "Dictionary" =>
          val rtStart = intOf("RecordTypeStart", 0)
          val rtLen = intOf("RecordTypeLen", 0)
          surveyZeroFill = kv.get("ZeroFill").exists(boolOf)
          surveyDecChar = kv.get("DecimalChar").exists(boolOf)
          items += ItemAcc(
            ColumnSpec("RecordDesciption", fileCode, "*", "*", "*",
              kv.getOrElse("Name", ""), kv.getOrElse("Label", ""),
              rtStart, rtLen, 1, surveyZeroFill, surveyDecChar, 0, "", ""),
            mutable.ArrayBuffer.empty)
        case "Level" =>
          currentLevelName = kv.getOrElse("Name", "")
          currentLevelLabel = kv.getOrElse("Label", "")
          levels.get(currentLevelName) match {
            case Some(l) if l == currentLevelLabel =>
              warnings += s"duplicate level name/label at line $lineNo"
            case Some(_) =>
              throw DcfParseException(s"Duplicate level name at line $lineNo with non-matched label")
            case scala.None =>
          }
          levels(currentLevelName) = currentLevelLabel
        case "Record" =>
          currentRecordName = kv.getOrElse("Name", "")
          currentRecordLabel = kv.getOrElse("Label", "")
          currentRecordType = kv.getOrElse("RecordTypeValue", "").stripPrefix("'").stripSuffix("'")
          // each record's leading rows are its level's IdItems (the key layout)
          currentIds.foreach { case (n, l, s, len) =>
            items += ItemAcc(
              ColumnSpec("IdItem", fileCode, currentRecordName, currentRecordType,
                currentRecordLabel, n, l, s, len, 1, surveyZeroFill, surveyDecChar, 0,
                currentLevelName, currentLevelLabel),
              mutable.ArrayBuffer.empty)
          }
          records.get(currentRecordName) match {
            case Some(l) if l == currentRecordLabel =>
              warnings += s"duplicate record name/label at line $lineNo"
            case Some(_) =>
              throw DcfParseException(s"Duplicate record name at line $lineNo with non-matched label")
            case scala.None =>
          }
          records(currentRecordName) = currentRecordLabel
        case "Item" =>
          if (mode == "Records") {
            items += ItemAcc(
              ColumnSpec("Item", fileCode, currentRecordName, currentRecordType,
                currentRecordLabel, kv.getOrElse("Name", ""), kv.getOrElse("Label", ""),
                intOf("Start", 0), intOf("Len", 0), intOf("Occurrences", 1),
                kv.get("ZeroFill").map(boolOf).getOrElse(surveyZeroFill),
                kv.get("DecimalChar").map(boolOf).getOrElse(surveyDecChar),
                intOf("Decimal", 0), currentLevelName, currentLevelLabel),
              mutable.ArrayBuffer.empty)
          } else if (mode == "IdItems") {
            currentIds += ((kv.getOrElse("Name", ""), kv.getOrElse("Label", ""),
              intOf("Start", 0), intOf("Len", 0)))
          }
        case "ValueSet" =>
          if (items.isEmpty)
            throw DcfParseException(s"ValueSet before any item at line $lineNo")
          val last = items.last
          val vsLabel = kv.getOrElse("Label", "")
          val itLabel = last.spec.label
          if (!(similarity(vsLabel, itLabel) > 0.7 || vsLabel.startsWith(itLabel)))
            warnings += s"valueset label '$vsLabel' did not seem to match item '$itLabel' at line $lineNo"
          // explicit values first (line order), then ranges (expansion policy)
          val expanded = mutable.ArrayBuffer.empty[RawValue]
          expanded ++= chunkValues
          val multi = chunkRanges.length > 1
          chunkRanges.foreach { case (minS, maxS, desc) =>
            val lo = minS.toDouble
            val hi = maxS.toDouble
            val size = (hi - lo) + 1
            val isInt = lo == Math.floor(lo) && hi == Math.floor(hi)
            if (size <= 1)
              throw DcfParseException(s"Error parsing range at line $lineNo")
            val expand =
              size <= rangeExpansionLimit && isInt && (expandRanges match {
                case RangeExpansion.All      => true
                case RangeExpansion.Multiple => multi
                case RangeExpansion.None     => false
              })
            if (expand) {
              var v = lo.toLong
              while (v <= hi.toLong) {
                expanded += RawValue(v.toString, desc, "ExpandedRange")
                v += 1
              }
            } else if (multi) {
              expanded += RawValue(pyFloat(lo), desc, "MultiRangeMin")
              expanded += RawValue(pyFloat(hi), desc, "MultiRangeMax")
            } else {
              expanded += RawValue(pyFloat(lo), desc, "RangeMin")
              expanded += RawValue(pyFloat(hi), desc, "RangeMax")
            }
          }
          last.values ++= expanded // a second ValueSet extends the first
        case "Relation" =>
          relProc.emit().foreach(relations += _)
        case _ => // unknown chunk types handled via skippingChunk
      }
      chunkType = ""
      kv.clear(); chunkValues.clear(); chunkRanges.clear()
    }

    def kvLine(line: String): Unit = {
      if (skippingChunk) return
      val eq = line.indexOf('=')
      if (eq < 0) return
      val name = line.substring(0, eq).trim
      val value = line.substring(eq + 1).trim
      if (mode == "Relation") {
        relProc.addRow(name, value, lineNo).foreach(relations += _)
      } else if (name == "Value") {
        // split off the description at the FIRST ';' — the desc may itself
        // contain ':' (e.g. "1;Yes: between 2:00 and 6:00 pm"), so desc must
        // be removed before range detection.
        val sc = value.indexOf(';')
        val (valPart, desc) =
          if (sc >= 0) (value.substring(0, sc), value.substring(sc + 1).trim)
          else (value, "")
        if (RangeProbe.findFirstIn(valPart).isDefined) {
          RangePattern.findAllMatchIn(valPart).foreach { m =>
            chunkRanges += ((m.group(1), m.group(2), desc))
          }
        } else {
          chunkValues += RawValue(valPart, desc, "ExplicitValue")
        }
      } else if (!kv.contains(name)) {
        kv(name) = value
      }
    }

    content.linesIterator.foreach { raw =>
      lineNo += 1
      val line = raw.stripSuffix("\r")
      val trimmed = line.trim
      if (trimmed.startsWith("[") && trimmed.endsWith("]")) {
        // a non-relation chunk ends relation mode (pending relation rows
        // were emitted by resetChunk→endChunk); items/valuesets after a
        // [Relation] block belong to the record context, so restore
        // "Records" — otherwise their kv lines would misroute into the
        // relation row processor and fail the parse
        def exitRelationMode(): Unit = if (mode == "Relation") mode = "Records"
        trimmed match {
          case "[Dictionary]" => resetChunk("Dictionary"); mode = "Dictionary"
          case "[Level]"      => resetChunk("Level"); exitRelationMode()
          case "[IdItems]"    => resetChunk("IdItems"); mode = "IdItems"; currentIds.clear()
          case "[Record]"     => resetChunk("Record"); mode = "Records"
          case "[Item]"       => resetChunk("Item"); exitRelationMode()
          case "[ValueSet]"   => resetChunk("ValueSet"); exitRelationMode()
          case "[Relation]"   => resetChunk("Relation"); mode = "Relation"
          case other =>
            skippingChunk = true
            skipped += other
        }
      } else if (trimmed.isEmpty) {
        endChunk()
      } else {
        kvLine(line)
      }
    }
    endChunk() // reference drops an unterminated trailing chunk; we keep it
    if (mode == "Relation") relProc.emit().foreach(relations += _)

    // final pass: items referenced by a relation link become JoinableItem
    val joinCols: Map[String, Set[String]] = relations
      .flatMap(r =>
        Seq(r.primaryTable -> r.primaryLink, r.secondaryTable -> r.secondaryLink))
      .filter(_._2 != RelationRowProcessor.RowId)
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }

    val finalItems = items.map { acc =>
      val s = acc.spec
      if (s.itemType == "Item" && joinCols.get(s.recordName).exists(_.contains(s.name)))
        acc.copy(spec = s.copy(itemType = "JoinableItem"))
      else acc
    }

    val values = finalItems.flatMap(acc =>
      acc.values.map(v => ValueSpec(fileCode, acc.spec.name, v.value, v.desc, v.valueType)))

    ParseResult(finalItems.map(_.spec).toVector, values.toVector,
      relations.toVector, warnings.toVector, skipped.toVector)
  }

  /** Cheap SequenceMatcher-like ratio: 2·LCS/(|a|+|b|). Used only for the
    * warn-only valueset↔item label sanity check (ref DCF_Parser.py:278-288).
    */
  private[cspro] def similarity(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val n = a.length; val m = b.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        cur(j) =
          if (a.charAt(i - 1) == b.charAt(j - 1)) prev(j - 1) + 1
          else Math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    2.0 * prev(m) / (n + m)
  }
}

/** Incremental state machine for `[Relation]` blocks: one block declares
  * joins from one primary table to 1..N secondary tables; each side of each
  * join is a column link or, when the link row is absent, row identity
  * (`*ROWID*`). A new `PrimaryLink`/`Secondary` row marks the *previous* join
  * as complete (ref DCF_Parser.py:537-645).
  */
final class RelationRowProcessor(fileCode: String) {
  import RelationRowProcessor.RowId
  private var relName = ""
  private var primary = ""
  private var primaryLink = ""
  private var secondary = ""
  private var secondaryLink = ""

  private def current(): Option[RelationshipSpec] =
    if (relName.isEmpty || primary.isEmpty || secondary.isEmpty) None
    else Some(RelationshipSpec(fileCode, relName, primary,
      if (primaryLink.isEmpty) RowId else primaryLink,
      secondary,
      if (secondaryLink.isEmpty) RowId else secondaryLink))

  def addRow(name: String, value: String, lineNo: Int): Option[RelationshipSpec] =
    name match {
      case "Name" =>
        if (relName.nonEmpty)
          throw DcfParser.DcfParseException(s"Relation Name already set at line $lineNo; emit first")
        relName = value; None
      case "Primary" =>
        if (primary.nonEmpty)
          throw DcfParser.DcfParseException(s"Relation Primary already set at line $lineNo; emit first")
        primary = value; None
      case "PrimaryLink" =>
        val out = current()
        primaryLink = value; secondary = ""; secondaryLink = ""
        out
      case "Secondary" =>
        val out = current()
        if (secondary.nonEmpty) primaryLink = "" // occ-join on primary side just ended
        secondary = value; secondaryLink = ""
        out
      case "SecondaryLink" =>
        secondaryLink = value; None
      case other =>
        throw DcfParser.DcfParseException(s"Unknown relationship specification tag $other")
    }

  /** Flush the join in progress (end of block) and reset. */
  def emit(): Option[RelationshipSpec] = {
    val out = current()
    relName = ""; primary = ""; primaryLink = ""; secondary = ""; secondaryLink = ""
    out
  }
}

object RelationRowProcessor {
  /** Sentinel link meaning "join on row identity / occurrence number". */
  val RowId = "*ROWID*"
}
