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
  * just the Scala DSL. The full surface lives in
  * [[GraftExtensions.registry]]; `SqlFunctionsSpec` pins one worked example
  * per entry, so a function added here without an example fails the build.
  *
  * Deliberately NOT registered (DSL-only): `VectorHash.pqCodes` (needs a
  * driver-trained codebook argument no SQL literal can carry) and the typed
  * `Aggregator`s (MisraGries/TopK — Kryo-buffered `Dataset` aggregators,
  * not Catalyst `AggregateFunction`s).
  */
object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def optIntArg(args: Seq[Expression], i: Int, what: String, default: Int): Int =
    if (args.length > i) intArg(args(i), what) else default

  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** Merge-list literal for graft_bpe_encode: pairs separated by newlines,
    * left/right separated by ONE space. Both separators are whitespace, and
    * BPE symbols come from whitespace tokenization, so neither can occur
    * inside a symbol — the encoding is unambiguous for any trained list.
    */
  private def mergesArg(e: Expression): Seq[(String, String)] =
    stringArg(e, "merges").split('\n').toSeq.filter(_.nonEmpty).map { line =>
      line.split(' ') match {
        case Array(a, b) => (a, b)
        case _ => throw new IllegalArgumentException(
          s"merges line must be 'left right', got '$line'")
      }
    }

  private def vocabArg(e: Expression): Seq[(String, Long)] =
    stringArg(e, "vocab").split('\n').toSeq.filter(_.nonEmpty).map { line =>
      val cut = line.lastIndexOf(' ')
      require(cut > 0, s"vocab line must be 'piece logp_micro', got '$line'")
      (line.substring(0, cut), line.substring(cut + 1).toLong)
    }

  /** The canonical registry: (name, usage, builder). Order is the doc
    * order; names are the exact SQL identifiers.
    */
  val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_word_shingles",
      "graft_word_shingles(text, n) - distinct lowercased word n-gram shingles",
      args => VectorHash.WordShinglesExpr(args(0), intArg(args(1), "n"))),

    ("graft_minhash",
      "graft_minhash(shingles, k) - k-minima MinHash signature",
      args => VectorHash.MinHashSignatureExpr(args(0), intArg(args(1), "k"))),

    ("graft_lsh_bands",
      "graft_lsh_bands(sig, bands, rowsPerBand) - LSH band keys",
      args => VectorHash.LshBandKeysExpr(
        args(0), intArg(args(1), "bands"), intArg(args(2), "rowsPerBand"))),

    ("graft_simhash64",
      "graft_simhash64(tokens) - 64-bit SimHash",
      args => VectorHash.SimHash64Expr(args(0))),

    ("graft_cosine",
      "graft_cosine(a, b) - cosine similarity of float arrays",
      args => VectorHash.CosineSimExpr(args(0), args(1))),

    ("graft_hyperplane_bucket",
      "graft_hyperplane_bucket(vec, planes) - random-hyperplane LSH bucket",
      args => VectorHash.HyperplaneBucketExpr(args(0), intArg(args(1), "planes"))),

    ("graft_content_boundaries",
      "graft_content_boundaries(text, window, divisor) - rolling-hash content-defined chunk boundaries (code-point offsets)",
      args => VectorHash.ContentBoundariesExpr(
        args(0), intArg(args(1), "window"), intArg(args(2), "divisor"))),

    ("graft_bpe_encode",
      "graft_bpe_encode(tokens, merges) - BPE symbol sequence of a token array; merges is a literal of newline-separated 'left right' pairs in rank order",
      args => graft.operators.BpeTrainer.BpeEncodeExpr(args(0), mergesArg(args(1)))),

    ("graft_unigram_encode",
      "graft_unigram_encode(tokens, vocab) - unigram-LM (SentencePiece-style) pieces of a token array; vocab is a literal of newline-separated 'piece logp_micro' lines",
      args => graft.operators.UnigramTrainer.UnigramEncodeExpr(
        args(0), vocabArg(args(1)), maxPieceLen = 8)),

    ("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]",
      args => StringSim.JaroWinklerExpr(args(0), args(1))),

    ("graft_jaro",
      "graft_jaro(a, b) - Jaro similarity in [0,1]",
      args => StringSim.JaroExpr(args(0), args(1))),

    ("graft_theta_sketch",
      "graft_theta_sketch(item, lgK) - theta sketch aggregate (binary)",
      args => graft.operators.ThetaSketches.ThetaSketchAgg(
        args(0), intArg(args(1), "lgK")).toAggregateExpression()),

    ("graft_theta_union_agg",
      "graft_theta_union_agg(sketch[, lgK]) - aggregate union of binary theta sketch rows; pass the inputs' lgK when above the default 12",
      args => graft.operators.ThetaSketches.ThetaUnionAgg(
        args(0), optIntArg(args, 1, "lgK", 12)).toAggregateExpression()),

    ("graft_theta_estimate",
      "graft_theta_estimate(sketch) - distinct estimate of a theta sketch",
      args => graft.operators.ThetaSketches.ThetaEstimateExpr(args(0))),

    ("graft_theta_lb",
      "graft_theta_lb(sketch[, numStdDev]) - lower bound of the distinct estimate (default 2 std devs)",
      args => graft.operators.ThetaSketches.ThetaBoundExpr(
        args(0), optIntArg(args, 1, "numStdDev", 2), upper = false)),

    ("graft_theta_ub",
      "graft_theta_ub(sketch[, numStdDev]) - upper bound of the distinct estimate (default 2 std devs)",
      args => graft.operators.ThetaSketches.ThetaBoundExpr(
        args(0), optIntArg(args, 1, "numStdDev", 2), upper = true)),

    ("graft_theta_intersect",
      "graft_theta_intersect(a, b[, lgK]) - intersection of two theta sketches; pass the inputs' lgK when above the default 12",
      args => graft.operators.ThetaSketches.ThetaIntersectExpr(
        args(0), args(1), optIntArg(args, 2, "lgK", 12))),

    ("graft_theta_union",
      "graft_theta_union(a, b[, lgK]) - union of two theta sketches; pass the inputs' lgK when above the default 12",
      args => graft.operators.ThetaSketches.ThetaUnionExpr(
        args(0), args(1), optIntArg(args, 2, "lgK", 12))))

  /** Exact list of SQL identifiers this extension registers. */
  def registeredNames: Seq[String] = registry.map(_._1)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorHash.type].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registry.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
