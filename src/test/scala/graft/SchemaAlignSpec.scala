package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.schema.{DplaMap, SchemaAlign}

/** Golden + property coverage for alignToSchema / wrap / unwrap on nested
  * DPLA-MAP fixtures (FIXTURES.md §2): degraded variants are exactly the
  * drift SchemaRepair exists to fix (missing columns, unwrapped scalars,
  * missing sub-fields).
  */
class SchemaAlignSpec extends SparkSpec {
  import SchemaAlign._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)

  test("missing top-level columns become typed nulls") {
    val degraded = df(
      StructType(Seq(StructField("originalId", StringType))),
      Row("abc"))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(fixed.schema === DplaMap.record)
    val r = fixed.head()
    assert(r.getAs[Any]("iiifManifest") === null)
    assert(r.getAs[Any]("mediaMaster") === null)
    assert(r.getAs[String]("originalId") === "abc")
  }

  test("unwrapped scalar is wrapped to struct<value:string>") {
    val degraded = df(
      StructType(Seq(StructField("dplaUri", StringType))),
      Row("http://dp.la/api/items/xyz"))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(fixed.select("dplaUri.value").head().getString(0)
      === "http://dp.la/api/items/xyz")
  }

  test("struct with missing sub-fields gains typed-null members, keeps values") {
    val partialAgent = StructType(Seq(
      StructField("name", StringType)))
    val degraded = df(
      StructType(Seq(StructField("provider", partialAgent))),
      Row(Row("Some Hub")))
    val fixed = alignToSchema(degraded, DplaMap.record)
    val r = fixed.select("provider.name", "provider.uri").head()
    assert(r.getString(0) === "Some Hub")
    assert(r.get(1) === null)
  }

  test("null input struct stays null (not struct of nulls)") {
    val degraded = df(
      StructType(Seq(StructField("provider", StructType(Seq(
        StructField("name", StringType)))))),
      Row(null))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(fixed.select("provider").head().get(0) === null)
  }

  test("array elements are coerced per element") {
    val degraded = df(
      StructType(Seq(StructField("hasView", ArrayType(StructType(Seq(
        StructField("uri", StringType))))))),
      Row(Seq(Row("u1"), Row("u2"))))
    val fixed = alignToSchema(degraded, DplaMap.record)
    val uris = fixed
      .select(expr("transform(hasView, x -> x.uri.value)")).head().getSeq[String](0)
    assert(uris === Seq("u1", "u2"))
  }

  test("alignToSchema is idempotent on the canonical schema") {
    val degraded = df(
      StructType(Seq(StructField("originalId", StringType))),
      Row("abc"))
    val once = alignToSchema(degraded, DplaMap.record)
    val twice = alignToSchema(once, DplaMap.record)
    assert(twice.schema === once.schema)
    assert(twice.collect() === once.collect())
  }

  test("extra columns are dropped") {
    val degraded = df(
      StructType(Seq(
        StructField("originalId", StringType),
        StructField("bogus", StringType))),
      Row("abc", "x"))
    val fixed = alignToSchema(degraded, DplaMap.record)
    assert(!fixed.columns.contains("bogus"))
  }

  test("unwrap(wrap(x)) == x including nulls and empties") {
    val d = df(
      StructType(Seq(StructField("s", StringType))),
      Row("a"), Row(""), Row(null))
    val rt = d.select(unwrapValue(wrapValue(col("s"))).as("s"))
    assert(rt.collect().map(_.get(0)).toSeq === Seq("a", "", null))
  }
}
