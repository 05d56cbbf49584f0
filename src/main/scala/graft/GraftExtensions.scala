package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CurationExprs, ShingleExprs}

/** SparkSessionExtensions injector: mounts graft's native expressions into
  * the SQL function registry, so the same hot-path operators are reachable
  * from `spark.sql(...)` as from the Column API (SURVEY.md §2 custom-
  * operator tier (c): extension-registered functions).
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** (identifier, info, builder) triples shared by the extension injector
    * and [[register]]. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.StringMetricExprs.JaroWinkler].getName,
        "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(a, b)")
        graft.functions.StringMetricExprs.JaroWinkler(args.head, args(1))
      }),
    (new FunctionIdentifier("canonicalize_url"),
      new ExpressionInfo(classOf[graft.functions.StringMetricExprs.CanonicalizeUrl].getName,
        "canonicalize_url"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "canonicalize_url(url)")
        graft.functions.StringMetricExprs.CanonicalizeUrl(args.head)
      }),
    (new FunctionIdentifier("registrable_domain"),
      new ExpressionInfo(classOf[graft.functions.StringMetricExprs.RegistrableDomain].getName,
        "registrable_domain"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "registrable_domain(host)")
        graft.functions.StringMetricExprs.RegistrableDomain(args.head)
      }),
    (new FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleExprs.ShingleHash].getName, "shingle_hash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hash(text, k)")
        ShingleExprs.ShingleHash(args.head, intArg(args(1), "k"))
      }),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[ShingleExprs.MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_sig(text, k, numHashes)")
        ShingleExprs.MinHashSig(args.head, intArg(args(1), "k"),
          intArg(args(2), "numHashes"))
      }),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[ShingleExprs.SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2, "simhash64(text[, k])")
        ShingleExprs.SimHash64(args.head,
          if (args.length == 2) intArg(args(1), "k") else 3)
      }),
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[ShingleExprs.DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b)")
        ShingleExprs.DotProduct(args.head, args(1))
      }),
    (new FunctionIdentifier("ngram_strings"),
      new ExpressionInfo(classOf[ShingleExprs.NgramStrings].getName, "ngram_strings"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "ngram_strings(text, n)")
        ShingleExprs.NgramStrings(args.head, intArg(args(1), "n"))
      }),
    (new FunctionIdentifier("consecutive_pairs"),
      new ExpressionInfo(classOf[ShingleExprs.ConsecutivePairs].getName, "consecutive_pairs"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "consecutive_pairs(tokens)")
        ShingleExprs.ConsecutivePairs(args.head)
      }),
    (new FunctionIdentifier("quality_score"),
      new ExpressionInfo(classOf[ShingleExprs.QualityScoreExpr].getName, "quality_score"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "quality_score(text)")
        ShingleExprs.QualityScoreExpr(args.head)
      }),
    (new FunctionIdentifier("gopher_flags"),
      new ExpressionInfo(classOf[ShingleExprs.GopherFlags].getName, "gopher_flags"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "gopher_flags(text, minWords, maxWords)")
        ShingleExprs.GopherFlags(args.head, intArg(args(1), "minWords"),
          intArg(args(2), "maxWords"))
      }),
    (new FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[ShingleExprs.LangIdExpr].getName, "lang_id"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "lang_id(text)")
        ShingleExprs.LangIdExpr(args.head)
      }),
    (new FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[CurationExprs.NormalizeText].getName, "normalize_text"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "normalize_text(text, 'NFC'|'NFD'|'NFKC'|'NFKD')")
        val form = args(1) match {
          case Literal(v, _) if v != null =>
            java.text.Normalizer.Form.valueOf(v.toString.toUpperCase)
          case other => throw new IllegalArgumentException(
            s"form must be a string literal, got $other")
        }
        CurationExprs.NormalizeText(args.head, form)
      }),
    (new FunctionIdentifier("clean_text"),
      new ExpressionInfo(classOf[CurationExprs.CleanTextExpr].getName, "clean_text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "clean_text(text)")
        CurationExprs.CleanTextExpr(args.head)
      }),
    (new FunctionIdentifier("strip_html"),
      new ExpressionInfo(classOf[CurationExprs.StripHtmlExpr].getName, "strip_html"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "strip_html(text)")
        CurationExprs.StripHtmlExpr(args.head)
      }),
    (new FunctionIdentifier("deflate_size"),
      new ExpressionInfo(classOf[CurationExprs.DeflateSizeExpr].getName, "deflate_size"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "deflate_size(text)")
        CurationExprs.DeflateSizeExpr(args.head)
      }),
    // an AGGREGATE function: the analyzer wraps the returned
    // AggregateFunction in an AggregateExpression at resolution
    (new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[graft.functions.CmsSketchAgg].getName, "cms_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "cms_sketch(value, depth, width)")
        graft.functions.CmsSketchAgg(args.head,
          intArg(args(1), "depth"), intArg(args(2), "width"))
      }),
    (new FunctionIdentifier("cms_merge"),
      new ExpressionInfo(classOf[graft.functions.CmsMergeAgg].getName, "cms_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "cms_merge(sketch)")
        graft.functions.CmsMergeAgg(args.head)
      }),
    (new FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[graft.functions.KllSketchAgg].getName, "kll_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_sketch(value, k)")
        graft.functions.KllSketchAgg(args.head, intArg(args(1), "k"))
      }),
    (new FunctionIdentifier("kll_merge"),
      new ExpressionInfo(classOf[graft.functions.KllMergeAgg].getName, "kll_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2, "kll_merge(sketch[, k])")
        if (args.length == 1) graft.functions.KllMergeAgg(args.head)
        else graft.functions.KllMergeAgg(args.head, intArg(args(1), "k"))
      }),
    (new FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[graft.functions.KllQuantile].getName, "kll_quantile"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_quantile(sketch, rank)")
        // SQL literals arrive as DECIMAL (possibly under a cast) — fold
        // any constant numeric expression rather than pattern-matching
        // literal shapes
        val rank = args(1) match {
          case e if e.foldable => e.eval() match {
            case d: Double => d
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case other => throw new IllegalArgumentException(
              s"rank must be numeric, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"rank must be a constant, got $other")
        }
        graft.functions.KllQuantile(args.head, rank)
      }),
    (new FunctionIdentifier("theta_sketch"),
      new ExpressionInfo(classOf[graft.functions.ThetaSketchAgg].getName, "theta_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "theta_sketch(value, lgK)")
        graft.functions.ThetaSketchAgg(args.head, intArg(args(1), "lgK"))
      }),
    (new FunctionIdentifier("theta_merge"),
      new ExpressionInfo(classOf[graft.functions.ThetaMergeAgg].getName, "theta_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "theta_merge(sketch, lgK)")
        graft.functions.ThetaMergeAgg(args.head, intArg(args(1), "lgK"))
      }),
    (new FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[graft.functions.ThetaEstimate].getName, "theta_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "theta_estimate(sketch)")
        graft.functions.ThetaEstimate(args.head, 0)
      }),
    (new FunctionIdentifier("theta_intersect"),
      new ExpressionInfo(classOf[graft.functions.ThetaSetOp].getName, "theta_intersect"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "theta_intersect(a, b)")
        graft.functions.ThetaSetOp(args.head, args(1), "intersect")
      }),
    (new FunctionIdentifier("theta_a_not_b"),
      new ExpressionInfo(classOf[graft.functions.ThetaSetOp].getName, "theta_a_not_b"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "theta_a_not_b(a, b)")
        graft.functions.ThetaSetOp(args.head, args(1), "a_not_b")
      }))

  /** Register on an already-running session (extensions only bind at
    * session construction — this is the REPL/test path). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftglue.GraftSqlBridge.registerFunction(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], id, info, builder)
    }
}
