package graft.cspro

import graft.SparkTestBase
import graft.model.ColumnSpec
import org.apache.spark.sql.functions.{col, substring}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the CSPro spine (SURVEY.md §5c): fixed-width
  * render→parse round trips, padded-key integrity, range-expansion count
  * laws, and sketch invariants.
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, min: Int = 100): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, r.status.toString)
  }

  // ---------------------------------------------------------------- helpers

  private def spec(itemType: String, rec: String, tag: String, name: String,
                   start: Int, len: Int): ColumnSpec =
    ColumnSpec(itemType, "PROP", rec, tag, rec, name, name, start, len, 1,
      zeroFill = false, decimalChar = false, decimal = 0, "L", "L")

  private val fieldValue: Gen[String] = for {
    len <- Gen.choose(0, 6)
    s <- Gen.stringOfN(len, Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
  } yield s

  // -------------------------------------------------------------- round trip

  test("fixed-width render→parse round trip: trim semantics per field kind") {
    val gen = for {
      widths <- Gen.nonEmptyListOf(Gen.choose(1, 8)).map(_.take(5))
      values <- Gen.sequence[List[String], String](widths.map(w =>
        fieldValue.map(_.take(w))))
    } yield (widths, values)

    val prop = Prop.forAll(gen) { case (widths, values) =>
      // layout: tag "T01" at 1-3, then fields packed left to right
      val starts = widths.scanLeft(4)(_ + _).init
      val specs = spec("RecordDesciption", "*", "*", "", 1, 3) +:
        widths.indices.map(i => spec("Item", "R", "T01", s"F$i", starts(i), widths(i)))
      val line = "T01" + widths.indices.map(i =>
        values(i).padTo(widths(i), ' ')).mkString
      val df = Seq(line).toDF("value")
      val out = DatReader.projectLines(df, specs)("R").collect().head
      widths.indices.forall { i =>
        out.getAs[String](s"f$i") == values(i).trim
      }
    }
    check(prop, min = 25) // each sample runs a Spark job
  }

  test("CASEID/HHID keep padding exactly; HHID = substring(CASEID, 1, 12) holds") {
    val gen = for {
      hh <- Gen.stringOfN(10, Gen.alphaNumChar)
      tail <- Gen.stringOfN(3, Gen.oneOf(Gen.alphaNumChar, Gen.const(' ')))
    } yield (" " + hh + " ", tail) // padded 12-char household id

    val prop = Prop.forAll(gen) { case (hhid12, tail) =>
      val specs = Seq(
        spec("RecordDesciption", "*", "*", "", 16, 3),
        spec("IdItem", "H", "H00", "HHID", 1, 12),
        spec("IdItem", "P", "I01", "CASEID", 1, 15),
        spec("Item", "P", "I01", "V1", 19, 1))
      val lines = Seq(
        hhid12 + "   " + "H00" + "x",
        hhid12 + tail + "I01" + "y").toDF("value")
      val tables = DatReader.projectLines(lines, specs)
      val h = tables("H"); val p = tables("P")
      val caseid = p.select("caseid").as[String].collect().head
      val hhid = h.select("hhid").as[String].collect().head
      val joined = p.join(h, h("hhid") === substring(p("caseid"), 1, 12)).count()
      caseid == hhid12 + tail && hhid == hhid12 && joined == 1L
    }
    check(prop, min = 25)
  }

  // ---------------------------------------------------------- range expansion

  private def dcfWithRange(lo: Long, hi: Long): String =
    s"""[Dictionary]
       |Name=R
       |RecordTypeStart=16
       |RecordTypeLen=3
       |
       |[Level]
       |Label=L
       |Name=L
       |
       |[Record]
       |Label=R
       |Name=R
       |RecordTypeValue='X01'
       |
       |[Item]
       |Label=Item
       |Name=V1
       |Start=19
       |Len=2
       |
       |[ValueSet]
       |Label=Item
       |Name=V1_VS1
       |Value=$lo:$hi
       |""".stripMargin

  test("range expansion count law: |[lo,hi]| ≤ limit → hi-lo+1 ExpandedRange rows, else Min/Max pair") {
    val gen = for {
      lo <- Gen.choose(-50L, 1000L)
      // span ≥ 1: a degenerate range a:a is a fail-fast parse error by
      // design (reference raises ValueError, DCF_Parser.py:309-312)
      span <- Gen.choose(1L, 30L)
      limit <- Gen.choose(1L, 40L)
    } yield (lo, lo + span, limit)

    val prop = Prop.forAll(gen) { case (lo, hi, limit) =>
      val r = DcfParser.parse(dcfWithRange(lo, hi), "PROP",
        rangeExpansionLimit = limit)
      val vals = r.values.filter(_.name == "V1")
      val n = hi - lo + 1
      if (n <= limit)
        vals.length == n && vals.forall(_.valueType == "ExpandedRange") &&
          vals.map(_.value) == (lo to hi).map(_.toString).toVector
      else
        // un-expanded bounds render with Python float formatting ("-46.0"),
        // matching the reference's float()-parsed bounds
        vals.map(_.valueType) == Vector("RangeMin", "RangeMax") &&
          vals.map(_.value) == Vector(s"$lo.0", s"$hi.0")
    }
    check(prop)
  }

  // ----------------------------------------------------------------- sketches

  test("minhash is a set function: order- and duplication-invariant; k respected") {
    import graft.functions.VectorHash
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.stringOfN(4, Gen.alphaNumChar))
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (xs, new scala.util.Random(seed))

    val prop = Prop.forAll(gen) { case (xs, rnd) =>
      val shuffledDup = rnd.shuffle(xs ++ xs.take(xs.size / 2))
      val df = Seq((xs.distinct, shuffledDup.distinct)).toDF("a", "b")
      val row = df.select(
        VectorHash.minhashSignature(col("a"), 16),
        VectorHash.minhashSignature(col("b"), 16)).collect().head
      val sa = row.getSeq[Long](0); val sb = row.getSeq[Long](1)
      // same element set by construction → identical signatures
      sa.length == 16 && sa == sb
    }
    check(prop, min = 25)
  }

  test("simhash self-distance is 0 and order-invariant") {
    import graft.functions.VectorHash
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.stringOfN(3, Gen.alphaNumChar))
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (xs, new scala.util.Random(seed))

    val prop = Prop.forAll(gen) { case (xs, rnd) =>
      val df = Seq((xs, rnd.shuffle(xs))).toDF("a", "b")
      val row = df.select(
        VectorHash.simhash64(col("a")), VectorHash.simhash64(col("b"))).collect().head
      row.getLong(0) == row.getLong(1)
    }
    check(prop, min = 25)
  }
}
