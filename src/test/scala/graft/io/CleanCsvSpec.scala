package graft.io

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import graft.TestSpark

/** Fixture contract: FIXTURES.md §A.1 (BOM, NULs, ND codes, units row,
  * No Collateral, mixed case, accents, short rows). */
class CleanCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(dir: String): String = {
    val rows = Seq(
      "junk_header,AL2,AL3,AL4,AL5",             // cell 0 gets renamed AL1
      "date,pool id,servicer,backup,lease id",   // units row — skipped
      "2023-07-31,POOL1,  MixedCase Srl  ,ND5,LÉASE-1",
      "",                                        // blank line — skipped
      "2023-07-31,POOL1,No Collateral,,L2",
      "2023-07-31,POOL2,plain,x,L3",
    ).mkString("\n")
    val withNoise = "\uFEFF" + rows.replace("plain", "pla\u0000in")
    val p = Paths.get(dir, "LESSES0001_2023_07_31_Loan_Data.csv")
    Files.write(p, withNoise.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("cleaning, lineage, and bookkeeping semantics") {
    val dir = Files.createTempDirectory("cleancsv").toString
    val df = CleanCsv.read(spark, writeFixture(dir), "assets").cache()
    val cols = df.columns.toSeq
    assert(cols.take(5) == Seq("AL1", "AL2", "AL3", "AL4", "AL5"))
    assert(Seq("filename", "pcd", "ed_code", "valid_from", "valid_to",
      "iscurrent", "checksum", "part").forall(cols.contains))

    val rows = df.orderBy("AL5").collect()
    assert(rows.length == 3) // units + blank dropped
    val r1 = rows.find(_.getAs[String]("AL5") == "l3").get
    assert(r1.getAs[String]("AL3") == "plain")   // NUL byte stripped
    assert(r1.getAs[String]("ed_code") == "LESSES0001")
    assert(r1.getAs[String]("pcd") == "2023-07-31")
    assert(r1.getAs[String]("part") == "LESSES0001_20230731")
    assert(r1.getAs[Int]("iscurrent") == 1)
    assert(r1.getAs[String]("checksum").length == 32)

    val r2 = rows.find(r => Option(r.getAs[String]("AL5")).contains("lÉase-1".toLowerCase)) // léase → lease
    assert(r2.isEmpty, "accents must be transliterated to ASCII")
    val r3 = rows.find(_.getAs[String]("AL5") == "lease-1").get
    assert(r3.getAs[String]("AL3") == "mixedcase srl") // lower + trim
    assert(r3.getAs[String]("AL4") == null)            // ND5 → null

    val r4 = rows.find(_.getAs[String]("AL5") == "l2").get
    assert(r4.getAs[String]("AL3") == null)            // No Collateral → null
    assert(r4.getAs[String]("AL4") == null)            // empty → null
  }

  test("duplicate header columns are rejected") {
    val dir = Files.createTempDirectory("cleancsv2").toString
    val p = Paths.get(dir, "D1_2023_01_01_Loan_Data.csv")
    Files.write(p, "a,AL2,AL2\nunits,u,u\n1,2,3\n".getBytes(StandardCharsets.UTF_8))
    assertThrows[IllegalArgumentException] {
      CleanCsv.read(spark, p.toString, "assets")
    }
  }

  test("rows with more fields than the physical header are dropped") {
    val dir = Files.createTempDirectory("cleancsv4").toString
    val p = Paths.get(dir, "D1_2023_01_01_Loan_Data.csv")
    Files.write(p, Seq(
      "a,AL2,AL3",
      "units,u,u",
      "1,2,3",
      "1,2,3,4",          // over-length → dropped (reference skips it)
      "\"x,y\",2,3",      // quoted comma is ONE field → kept
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val df = CleanCsv.read(spark, p.toString, "assets")
    val rows = df.select("AL1").collect().map(_.getString(0)).sorted.toSeq
    assert(rows == Seq("1", "x,y"))
  }

  test("embedded newline in a quoted cell: read fails loudly, readMultiLine handles it") {
    val dir = Files.createTempDirectory("cleancsv5").toString
    val p = Paths.get(dir, "D1_2023_01_01_Loan_Data.csv")
    Files.write(p, Seq(
      "a,AL2,AL3",
      "units,u,u",
      "1,\"two\nlines\",3",
      "4,five,6",
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val ex = intercept[Exception] {
      CleanCsv.read(spark, p.toString, "assets").collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("readMultiLine")), ex.getMessage)

    val df = CleanCsv.readMultiLine(spark, p.toString, "assets").cache()
    assert(df.count() == 2)
    val r = df.filter($"AL1" === "1").collect()(0)
    assert(r.getAs[String]("AL2") == "two\nlines")
    assert(df.filter($"AL1" === "4").collect()(0).getAs[String]("AL2") == "five")
  }

  test("transliteration: Latin diacritics, Greek, Cyrillic, ligatures") {
    import org.apache.spark.sql.functions.lit
    val tr = graft.functions.Transliterate.transliterate _
    val r = spark.range(1).select(
      tr(lit("Škoda Fráiße")).as("a"),
      tr(lit("αθήνα ψ")).as("b"),
      tr(lit("Москва щи")).as("c"),
      tr(lit("plain ascii")).as("d"),
      tr(lit("Łódź Đặng")).as("e"))
      .collect()(0)
    assert(r.getString(0) == "Skoda Fraisse")
    assert(r.getString(1) == "athena ps")
    assert(r.getString(2) == "Moskva shchi")
    assert(r.getString(3) == "plain ascii")
    assert(r.getString(4) == "Lodz Dang")
  }

  test("transliteration: NFKD compatibility tier and Latin stragglers") {
    import org.apache.spark.sql.functions.lit
    val tr = graft.functions.Transliterate.transliterate _
    val r = spark.range(1).select(
      tr(lit("ﬁle ﬂow")).as("a"),          // ligatures
      tr(lit("Ｆｕｌｌ　Ｗｉｄｔｈ５")).as("b"), // fullwidth + ideographic space
      tr(lit("№ Ⅻ ™")).as("c"),            // numero, Roman numeral, TM
      tr(lit("GROẞE STRAẞE")).as("d"),     // capital sharp s
      tr(lit("Ŋaŋ Ħaħ Əə")).as("e"))       // eng, H-bar, schwa
      .collect()(0)
    assert(r.getString(0) == "file flow")
    assert(r.getString(1) == "Full Width5")
    assert(r.getString(2) == "No XII TM")
    assert(r.getString(3) == "GROSSE STRASSE")
    assert(r.getString(4) == "Ngang Hah Ee")
  }

  test("transliteration: Hangul (algorithmic), Kana, Arabic tiers") {
    import org.apache.spark.sql.functions.lit
    val tr = graft.functions.Transliterate.transliterate _
    val r = spark.range(1).select(
      tr(lit("한국 서울")).as("a"),   // jamo arithmetic: han-gug seo-ul
      tr(lit("さくら すし")).as("b"), // hiragana
      tr(lit("カタカナ")).as("c"),    // katakana (shared table, +0x60)
      tr(lit("كتاب ١٢٣")).as("d"),   // abjad consonants + Arabic digits
      tr(lit("漢字")).as("e"))        // Han ideographs stay unmapped
      .collect()(0)
    assert(r.getString(0) == "hangug seoul")
    assert(r.getString(1) == "sakura sushi")
    assert(r.getString(2) == "katakana")
    assert(r.getString(3) == "ktab 123")
    assert(r.getString(4) == "漢字")
  }

  test("amortisation tapes truncate to 121 columns") {
    val dir = Files.createTempDirectory("cleancsv3").toString
    val header = (1 to 150).map(i => s"AS$i").mkString(",")
    val units = (1 to 150).map(_ => "u").mkString(",")
    val data = (1 to 150).map(_.toString).mkString(",")
    val p = Paths.get(dir, "D1_2023_01_01_Amortisation.csv")
    Files.write(p, s"$header\n$units\n$data\n".getBytes(StandardCharsets.UTF_8))
    val df = CleanCsv.read(spark, p.toString, "amortisation")
    assert(df.columns.count(_.startsWith("AS")) == 121)
    // regression: with textFile's default minPartitions=2, the wide
    // header became its own split and the units row leaked through
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("AS1") == "1")
  }
}
