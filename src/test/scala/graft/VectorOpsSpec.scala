package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** FloatVecDot: the native codegen'd dot product must be bit-identical to
  * the composable HOF formulation it replaces (left-to-right double fold).
  */
class VectorOpsSpec extends SparkSpecBase {

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("FloatVecDot matches the zip_with/aggregate fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorOps.fdot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("FloatVecDot interpreted eval matches codegen path") {
    import spark.implicits._
    val df = Seq((Array(1.5f, -2.25f, 3.0f), Array(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val expected = 1.5 * 0.5 + (-2.25) * 4.0 + 3.0 * (-1.0)
    // codegen on (default)
    val v1 = df.select(VectorOps.fdot(col("a"), col("b"))).head.getDouble(0)
    assert(v1 == expected)
    // force interpreted expression evaluation
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val v2 = df.select(VectorOps.fdot(col("a"), col("b"))).head.getDouble(0)
      assert(v2 == expected)
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("null array, null element, or length mismatch yields NULL like the HOF fold") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f, 5f))),          // length mismatch
      (None: Option[Array[Float]], Some(Array(1f)))).toDF("a", "b")
    val got = df.select(VectorOps.fdot(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0)) // zip_with pads with null -> fold is NULL
    assert(got(1).isNullAt(0))
    // null ELEMENT: compare native vs HOF on the same rows
    val withNullElem = spark.sql(
      "SELECT CAST(array(1.0, NULL, 2.0) AS array<float>) AS a, " +
        "CAST(array(1.0, 1.0, 1.0) AS array<float>) AS b")
    VectorOps.ensureRegistered(spark)
    val both = withNullElem.select(
      VectorOps.fdot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).head
    assert(both.isNullAt(0) && both.isNullAt(1))
  }

  test("IntVecDot: exact long dot, codegen/interpreted parity, null semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)(
      (Array.fill(64)(rnd.nextInt(255) - 127), Array.fill(64)(rnd.nextInt(255) - 127)))
    val df = rows.toDF("a", "b")
    val got = df.select(VectorOps.idot(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum }
    assert(got.toSeq == want)
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(VectorOps.idot(col("a"), col("b"))).collect().map(_.getLong(0))
      assert(interp.toSeq == want)
    }
    // length mismatch / null array / null element -> NULL
    val edge = Seq(
      (Some(Array(1, 2)), Some(Array(3, 4, 5))),
      (None: Option[Array[Int]], Some(Array(1)))).toDF("a", "b")
    val e = edge.select(VectorOps.idot(col("a"), col("b"))).collect()
    assert(e(0).isNullAt(0) && e(1).isNullAt(0))
    val nullElem = spark.sql(
      "SELECT CAST(array(1, NULL, 2) AS array<int>) AS a, array(1, 1, 1) AS b")
    assert(nullElem.select(VectorOps.idot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("extensions entry registers graft_fdot and its builder constructs the expression") {
    // the exact entry the GraftExtensions hook injects
    val (ident, _, builder) = VectorOps.DotEntry
    assert(ident.funcName == "graft_fdot")
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.registerFunction(ident, VectorOps.DotEntry._2, builder)
    import s2.implicits._
    val v = Seq((Array(2f, 3f), Array(4f, 5f))).toDF("a", "b")
      .selectExpr("graft_fdot(a, b)").head.getDouble(0)
    assert(v == 2.0 * 4.0 + 3.0 * 5.0)
    // builder arity/shape used by injectFunction
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val arr = Literal.create(Array(1f, 0f), ArrayType(FloatType))
    val e = builder(Seq(arr, arr))
    assert(e.isInstanceOf[graft.functions.FloatVecDot])
  }

  test("DoubleVecDot matches the explicit element_at chain bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 129
    val rows = Seq.fill(200)(
      (Array.fill(n)(rnd.nextDouble() * 2 - 1), Array.fill(n)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val chain = (0 until n)
      .map(j => element_at(col("a"), j + 1) * element_at(col("b"), j + 1))
      .reduce(_ + _)
    val out = df.select(
      VectorOps.ddot(col("a"), col("b")).as("native"), chain.as("chain")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // null element and length mismatch -> NULL (the chain's semantics)
    val edge = Seq(
      (Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0)),
      (Array[java.lang.Double](1.0), Array[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
      .select(VectorOps.ddot(col("a"), col("b")).as("d")).collect()
    assert(edge.forall(_.isNullAt(0)))
  }
}
