package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the graft native expressions, via the public
  * `SparkSessionExtensions` hook:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)       // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * after which `spark.sql("SELECT graft_cosine(a, b) ...")` etc. work
  * anywhere SQL does — the engine's operators are usable from pure SQL, not
  * just the Scala DSL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorHash.type].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "graft_word_shingles(text, n) - distinct lowercased word n-gram shingles"),
      (args: Seq[Expression]) =>
        VectorHash.WordShinglesExpr(args(0), intArg(args(1), "n"))))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles, k) - k-minima MinHash signature"),
      (args: Seq[Expression]) =>
        VectorHash.MinHashSignatureExpr(args(0), intArg(args(1), "k"))))

    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bands"),
      info("graft_lsh_bands", "graft_lsh_bands(sig, bands, rowsPerBand) - LSH band keys"),
      (args: Seq[Expression]) =>
        VectorHash.LshBandKeysExpr(args(0), intArg(args(1), "bands"), intArg(args(2), "rowsPerBand"))))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(tokens) - 64-bit SimHash"),
      (args: Seq[Expression]) => VectorHash.SimHash64Expr(args(0))))

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of float arrays"),
      (args: Seq[Expression]) => VectorHash.CosineSimExpr(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_bucket"),
      info("graft_hyperplane_bucket", "graft_hyperplane_bucket(vec, planes) - random-hyperplane LSH bucket"),
      (args: Seq[Expression]) =>
        VectorHash.HyperplaneBucketExpr(args(0), intArg(args(1), "planes"))))

    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler", "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
      (args: Seq[Expression]) => StringSim.JaroWinklerExpr(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_jaro"),
      info("graft_jaro", "graft_jaro(a, b) - Jaro similarity in [0,1]"),
      (args: Seq[Expression]) => StringSim.JaroExpr(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_theta_sketch"),
      info("graft_theta_sketch", "graft_theta_sketch(item, lgK) - theta sketch aggregate (binary)"),
      (args: Seq[Expression]) =>
        graft.operators.ThetaSketches.ThetaSketchAgg(args(0), intArg(args(1), "lgK"))
          .toAggregateExpression()))

    ext.injectFunction((
      FunctionIdentifier("graft_theta_estimate"),
      info("graft_theta_estimate", "graft_theta_estimate(sketch) - distinct estimate of a theta sketch"),
      (args: Seq[Expression]) => graft.operators.ThetaSketches.ThetaEstimateExpr(args(0))))

    ext.injectFunction((
      FunctionIdentifier("graft_theta_intersect"),
      info("graft_theta_intersect",
        "graft_theta_intersect(a, b[, lgK]) - intersection of two theta sketches; pass the inputs' lgK when above the default 12"),
      (args: Seq[Expression]) => graft.operators.ThetaSketches.ThetaIntersectExpr(
        args(0), args(1),
        if (args.length > 2) intArg(args(2), "lgK") else 12)))

    ext.injectFunction((
      FunctionIdentifier("graft_theta_union"),
      info("graft_theta_union",
        "graft_theta_union(a, b[, lgK]) - union of two theta sketches; pass the inputs' lgK when above the default 12"),
      (args: Seq[Expression]) => graft.operators.ThetaSketches.ThetaUnionExpr(
        args(0), args(1),
        if (args.length > 2) intArg(args(2), "lgK") else 12)))
  }
}
