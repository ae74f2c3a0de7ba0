package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.schema.{DplaMap, SchemaAlign}
import graft.sinks.{KeyPurge, Manifest, Sitemap}

/** Property-based coverage (SURVEY.md §5.3) via raw ScalaCheck (no
  * scalatest-plus bridge in the offline cache): pure functions get forAll
  * properties; Spark expression round-trips batch sampled inputs through ONE
  * DataFrame run instead of a job per sample.
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("thumbnailKey: 4-level fan-out for ids >= 4 chars, None below") {
    check(Prop.forAll(Gen.asciiPrintableStr) { id =>
      KeyPurge.thumbnailKey(id) match {
        case Some(key) =>
          id.length >= 4 &&
            key == s"${id(0)}/${id(1)}/${id(2)}/${id(3)}/$id.jpg"
        case None => id == null || id.length < 4
      }
    })
  }

  test("sitemap partitionCount: true ceiling, never 0, never over-packed") {
    check(Prop.forAll(Gen.chooseNum(0L, 10000000L)) { n =>
      val p = Sitemap.partitionCount(n)
      p >= 1 &&
        p.toLong * Sitemap.MaxUrlsPerFile >= n &&
        (p == 1 || (p - 1).toLong * Sitemap.MaxUrlsPerFile < n)
    })
  }

  test("manifest render: keys always sorted, one line per key + timestamp") {
    val kvGen = Gen.mapOf(Gen.zip(
      Gen.alphaNumStr.suchThat(s => s.nonEmpty && !s.contains("\n")),
      Gen.alphaNumStr))
    check(Prop.forAll(kvGen) { kv =>
      val lines = Manifest.render(kv, "T").split("\n").toSeq
      val keyLines = lines.dropRight(1).map(_.takeWhile(_ != ':'))
      lines.last == "Generated: T" &&
        lines.length == kv.size + 1 &&
        keyLines == keyLines.sorted
    })
  }

  test("unwrap(wrap(x)) == x over arbitrary unicode strings (batched)") {
    import spark.implicits._
    val samples = Gen.listOfN(300, Gen.option(Gen.asciiPrintableStr))
      .sample.get ++ Seq(Some("héllo 北京"), Some(""), None)
    val df = samples.map(_.orNull).toDF("s")
    val back = df
      .select(SchemaAlign.unwrapValue(SchemaAlign.wrapValue(col("s"))).as("s"))
      .collect().map(r => Option(r.getString(0)))
    assert(back.toSeq === samples.map(_.filter(_ => true)))
  }

  test("alignToSchema is idempotent over random top-level projections") {
    val fields = DplaMap.record.fields
    val gen = Gen.someOf(fields.toIndexedSeq)
    (1 to 8).foreach { _ =>
      val subset = gen.sample.get
      val sub = StructType(subset.toArray)
      val df = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sub)
      val once = SchemaAlign.alignToSchema(df, DplaMap.record)
      val twice = SchemaAlign.alignToSchema(once, DplaMap.record)
      assert(once.schema === DplaMap.record)
      assert(twice.schema === DplaMap.record)
    }
  }

  test("union count additivity (E1 invariant): |A union B| == |A| + |B|") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0, 1000)),
      Gen.listOf(Gen.chooseNum(0, 1000))) { (a, b) =>
      // driver-side surrogate of the JsonlDump manifest invariant — the
      // Spark plan is exercised once below, not per ScalaCheck sample
      (a ++ b).size == a.size + b.size
    })
    val a = (1 to 100).toDF("v")
    val b = (1 to 57).toDF("v")
    assert(a.union(b).count() === 157L)
  }
}
