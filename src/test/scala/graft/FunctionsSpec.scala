package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.ArrayMath

/** Native codegen expressions in graft.functions. */
class FunctionsSpec extends SparkTestBase {

  import org.scalatest.matchers.should.Matchers._

  private def dotOf(a: Seq[java.lang.Double], b: Seq[java.lang.Double]): Any = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(a, b)),
      org.apache.spark.sql.types.StructType.fromDDL("a array<double>, b array<double>")
    )
    df.select(ArrayMath.dotProduct(col("a"), col("b")).as("d")).head.get(0)
  }

  test("dotProduct matches the interpreted builtin composition bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val a = Seq.fill(64)(rnd.nextDouble() - 0.5)
    val b = Seq.fill(64)(rnd.nextDouble() - 0.5)
    val df = spark.createDataFrame(
      java.util.List.of(Row(a.map(Double.box), b.map(Double.box))),
      org.apache.spark.sql.types.StructType.fromDDL("a array<double>, b array<double>")
    )
    val Row(native: Double, builtin: Double) = df.select(
      ArrayMath.dotProduct(col("a"), col("b")),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), _ + _)
    ).head
    // identical left-fold order → identical bits, not just approximate
    assert(java.lang.Double.doubleToLongBits(native) == java.lang.Double.doubleToLongBits(builtin))
  }

  test("dotProduct null/edge semantics match zip_with+aggregate") {
    dotOf(Seq(1.0, 2.0), Seq(3.0, 4.0)) shouldBe 11.0
    dotOf(Seq.empty, Seq.empty) shouldBe 0.0
    assert(dotOf(null, Seq(1.0)) == null) // null array → null
    assert(dotOf(Seq(1.0, null), Seq(1.0, 2.0)) == null) // null element → null
    assert(dotOf(Seq(1.0), Seq(1.0, 2.0)) == null) // length mismatch (zip_with null-pads) → null
  }

  test("graft_dot resolves in SQL after GraftExtensions.register") {
    graft.functions.GraftExtensions.register(spark)
    val v = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head.getDouble(0)
    v shouldBe 11.0
  }

  test("every graft native expression resolves in SQL after register") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_punct_count('a, b!') AS pc,
        |  graft_sorted_intersect_size(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS si,
        |  size(graft_shingle_hashes(array('a','b','c','d'), 2)) AS sh,
        |  graft_subword_counts(array('ingtion'), 'ing,tion')[0] AS sw
        |""".stripMargin).head
    assert(r.getAs[Number]("pc").longValue() == 2L) // ',' and '!'
    assert(r.getAs[Number]("si").longValue() == 2L) // {3,5}
    assert(r.getAs[Number]("sh").longValue() == 3L) // 3 bigrams of 4 tokens
    assert(r.getAs[Number]("sw").longValue() == 2L) // ing + tion
  }

  test("PQL pass-through resolves registered native functions") {
    graft.functions.GraftExtensions.register(spark)
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq(1.0, 2.0).map(Double.box), Seq(3.0, 4.0).map(Double.box))),
      org.apache.spark.sql.types.StructType.fromDDL("a array<double>, b array<double>")
    )
    // unknown functions forward to the session registry — the same
    // mechanism that exposes the whole Spark SQL library exposes graft's
    // native expressions inside PQL text
    val out = Pql.query(spark, "t | project d = graft_dot(a, b)", Map("t" -> df))
    assert(out.head.getDouble(0) == 11.0)
  }

  private implicit def mapCat(m: Map[String, org.apache.spark.sql.DataFrame]): String => org.apache.spark.sql.DataFrame =
    name => m.getOrElse(name, sys.error(s"unknown table $name"))

  test("dotProduct stays inside whole-stage codegen") {
    // a non-local source, or ConvertToLocalRelation folds the whole
    // projection at optimization time and no codegen stage exists
    val df = spark.range(8)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"), array(lit(3.0), lit(4.0)).as("b"))
      .select(ArrayMath.dotProduct(col("a"), col("b")).as("d"))
    // "*(n) Project [graft_dot(...)]" — the star marks a whole-stage
    // codegen span containing the expression (i.e. doGenCode was used,
    // no fallback to interpreted eval)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), s"expected codegen'd graft_dot in:\n$plan")
  }
}
