package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Schema-drift sentinel: dump each provider's inferred schema as SQL DDL to
  * diff divergence (reference SchemaTest.scala:10-27 — `df.schema.sql`
  * written to `schema.sql` per provider).
  */
object SchemaDdl {

  def ddl(df: DataFrame): String = df.schema.toDDL

  /** Write `<outRoot>/<provider>/schema.sql` for each provider frame;
    * returns provider → ddl for driver-side diffing.
    */
  def dump(
      spark: SparkSession,
      frames: Map[String, DataFrame],
      outRoot: String): Map[String, String] = {
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    frames.map { case (provider, df) =>
      val s = ddl(df)
      val p = new Path(s"${outRoot.stripSuffix("/")}/$provider/schema.sql")
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
      provider -> s
    }
  }

  /** Providers whose schema differs from the majority schema. Ties on
    * group size break on the schema string (lexicographically smallest
    * wins): a bare maxBy over a hash-map grouping is iteration-order-
    * dependent, so with an even split the flagged provider set would
    * flip whenever an unrelated change reordered the map.
    */
  def divergent(ddls: Map[String, String]): Seq[String] = {
    if (ddls.isEmpty) return Seq.empty
    val majority = ddls.values.groupBy(identity)
      .maxBy { case (schema, group) => (group.size, schema) }(
        Ordering.Tuple2(Ordering.Int, Ordering.String.reverse))._1
    ddls.collect { case (p, d) if d != majority => p }.toSeq.sorted
  }
}
