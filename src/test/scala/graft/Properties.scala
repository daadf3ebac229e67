package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** Property-based invariants (SURVEY.md §5.2): profile partitioning,
  * SCD2 single-current, cleaning idempotence — over generated data.
  * Kept to few, small Spark jobs per property (maxSize bounded). */
object GraftProperties extends Properties("graft") {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s" $s "),
    Gen.const(""),
    Gen.const("   "),
    Gen.const("ND1"),
    Gen.const("ND5,extra"),
    Gen.const("No Collateral"),
    Gen.alphaStr.map(_.toUpperCase),
    Gen.const("MiXeD cAsE"),
  )

  property("cleanCell is idempotent and lowercases") =
    forAll(Gen.listOfN(12, cellGen)) { cells =>
      val df = cells.toDF("c")
      val once = df.select(io.CleanCsv.cleanCell($"c").as("v"))
      val twice = once.select(io.CleanCsv.cleanCell($"v").as("v"))
      val a = once.as[Option[String]].collect().toSeq
      val b = twice.as[Option[String]].collect().toSeq
      a == b && a.forall(_.forall(v => v == v.toLowerCase.trim))
    }

  private val rowGen = for {
    pk <- Gen.choose(1, 5)
    payload <- Gen.alphaNumStr
  } yield (s"2023-07-31", s"pool$pk", payload)

  property("profile: good ∪ bad = input and disjoint") =
    forAll(Gen.listOfN(8, Gen.oneOf(
      ("ok", "y", "1.5"), ("bad-enum", "zzz", "1.5"),
      ("bad-num", "y", "abc"), (null, "y", "2")))) { rows =>
      val df = rows.toDF("a", "b", "c")
      val schema = Map(
        "a" -> quality.Rules.ColumnRule(quality.Rules.TString),
        "b" -> quality.Rules.ColumnRule(quality.Rules.TString,
          allowed = Some(Seq("y", "n"))),
        "c" -> quality.Rules.ColumnRule(quality.Rules.TNumber, coerce = true))
      val (good, bad) = quality.Rules.profile(df, schema)
      good.count() + bad.count() == rows.size &&
        good.intersect(bad).isEmpty
    }

  property("scd2: exactly one current row per PK after any merge chain") =
    forAll(Gen.listOfN(3, Gen.listOfN(4, rowGen))) { snapshots =>
      def bronze(rows: Seq[(String, String, String)]) = {
        // merge precondition: one row per PK within a snapshot
        val unique = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        val df = unique.toDF("AL1", "AL2", "payload")
          .withColumn("pcd", lit("2023-07-31"))
          .withColumn("ed_code", lit("D1"))
        io.CleanCsv.withBookkeeping(df, "assets")
      }
      val merged = snapshots.map(bronze).reduceLeft(
        (acc, next) => scd2.Scd2.merge(acc, next, "assets"))
      val counts = merged.filter($"iscurrent" === 1)
        .groupBy("AL1", "AL2").count()
        .select("count").as[Long].collect()
      counts.forall(_ == 1L)
    }
}
