package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.dedup.NearDup
import graft.functions.{DotProductExpr, MinHashSigExpr, ShinglesExpr, SimHashExpr}

/** SparkSessionExtensions hook exposing graft's custom Catalyst
  * expressions as SQL functions:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * then `SELECT graft_simhash(text), graft_minhash_sig(text),
  * graft_dot(a, b) FROM ...`. [[GraftFunctions.register]] does the
  * same on an already-built session (tests, notebooks).
  *
  * Also injects [[GraftGuardrails]] — opt-in analysis-time checks
  * for plan shapes that melt down at cluster scale.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectCheckRule(GraftGuardrails.check)
    // whole-operator custom-plan path: rewrite
    // `row_number() OVER (PARTITION BY..ORDER BY..) <= k` into the
    // heap-based two-phase top-k operator (see graft.plans.TopKPerGroup)
    ext.injectOptimizerRule(_ => graft.plans.RewriteTopKPerGroup)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

/** Analysis-time scale guardrails, injected as a check rule.
  *
  * `spark.graft.failOnGlobalWindow=true` turns a partition-less
  * window (`row_number() OVER (ORDER BY ...)` with no PARTITION BY —
  * Spark funnels the WHOLE input through one task) from a silent
  * scale cliff into an immediate AnalysisException naming the fix
  * ([[graft.operators.Ranks]]). Off by default: ad-hoc small-data
  * sessions are legitimate.
  */
object GraftGuardrails {
  def check(session: org.apache.spark.sql.SparkSession)
  : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan => Unit = plan => {
    if (session.conf.getOption("spark.graft.failOnGlobalWindow").contains("true")) {
      plan.foreach {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty =>
          throw new org.apache.spark.sql.AnalysisException(
            "USER_RAISED_EXCEPTION",
            Map("errorMessage" ->
              ("partition-less window moves ALL rows through one task " +
                "(graft guardrail: spark.graft.failOnGlobalWindow). " +
                "Partition the window, or use graft.operators.Ranks for " +
                "exact global ranks/order statistics.")), None)
        case _ =>
      }
    }
  }
}

object GraftFunctions {
  type Description =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val descriptions: Seq[Description] = Seq(
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHashExpr(args.head)),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSigExpr(args.head, 3, NearDup.coeffs)),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    (FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[graft.functions.NormalizeTextExpr].getName,
        "graft_normalize_text"),
      (args: Seq[Expression]) =>
        graft.functions.NormalizeTextExpr(args.head)),
    (FunctionIdentifier("graft_minhash_merge"),
      new ExpressionInfo(classOf[graft.functions.MinHashMergeAgg].getName,
        "graft_minhash_merge"),
      // AGGREGATE: elementwise-min merge of MinHash signatures
      (args: Seq[Expression]) =>
        graft.functions.MinHashMergeAgg(args.head, NearDup.NumHashes)),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      // graft_shingles(text[, n[, distinct]]) — n and distinct must be
      // foldable literals (they parameterize the expression itself)
      (args: Seq[Expression]) => {
        val n = if (args.length > 1) intLiteral(args(1), "graft_shingles", "n") else 3
        val distinct = args.length > 2 &&
          (foldableValue(args(2), "graft_shingles", "distinct") == true)
        ShinglesExpr(args.head, n, distinct)
      }))

  private def analysisError(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), None)

  private def foldableValue(e: Expression, fn: String, param: String): Any = {
    if (!e.foldable)
      analysisError(s"$fn: parameter '$param' must be a literal, got ${e.sql}")
    e.eval()
  }

  /** Int parameter from any integral literal (INT/BIGINT/SMALLINT/
    * TINYINT or a CAST of one) — a BIGINT literal like `3L` must not
    * surface as an opaque ClassCastException. */
  private def intLiteral(e: Expression, fn: String, param: String): Int =
    foldableValue(e, fn, param) match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => analysisError(
        s"$fn: parameter '$param' must be an integer literal, got $other (${e.sql})")
    }

  /** Register on a live session (equivalent to the extension). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, ident, info, builder)
    }
}
