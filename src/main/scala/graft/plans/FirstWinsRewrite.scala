package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.FirstByOrder

/** Optimizer rule: rewrite the ubiquitous window-dedup idiom
  *
  *   SELECT ... FROM t
  *   QUALIFY row_number() OVER (PARTITION BY k ORDER BY o) = 1
  *
  * into a hash aggregation with the [[FirstByOrder]] aggregate.
  *
  * The window form shuffles EVERY row to its partition and sorts whole
  * partitions before discarding all but one row per key; the aggregate
  * form combines map-side (one surviving row per key per input split
  * crosses the wire) and never sorts. Same rows out: for each key the
  * minimum by the window's ORDER BY — when the ordering has ties, any
  * row_number assignment among tied rows is a valid outcome and
  * FirstByOrder deterministically returns the first by Spark's struct
  * ordering, which is one of them.
  *
  * Fires only on the conservative shape: Filter(rn = 1) (or rn <= 1 /
  * 1 >= rn) directly above a Window whose only window expression is that
  * row_number with ascending-only, non-null-trailing ordering, where the
  * filtered column is not otherwise referenced upstream. Registered via
  * [[GraftExtensions]] (SparkSessionExtensions).
  */
object FirstWinsRewrite extends Rule[LogicalPlan] {

  private object RowNumberEq1 {
    /** Matches Filter(cond, Window(...)) where cond pins row_number to 1. */
    def unapply(plan: LogicalPlan): Option[(Window, Attribute)] = plan match {
      case Filter(cond, w: Window) =>
        val rnAttr = cond match {
          case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some(a)
          case EqualTo(Literal(1, IntegerType), a: Attribute) => Some(a)
          case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => Some(a)
          case GreaterThanOrEqual(Literal(1, IntegerType), a: Attribute) => Some(a)
          case _ => None
        }
        rnAttr.flatMap { a =>
          w.windowExpressions match {
            case Seq(al @ Alias(WindowExpression(RowNumber(),
                WindowSpecDefinition(_, _, _)), _)) if al.exprId == a.exprId =>
              Some((w, a))
            case _ => None
          }
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, RowNumberEq1(w, rnAttr))
        // the rn column must be projected away (it is, after QUALIFY) and
        // ordering must be ASC NULLS FIRST so struct-min picks the same row
        if !projectList.exists(_.exists(_.semanticEquals(rnAttr))) &&
           w.orderSpec.nonEmpty &&
           w.orderSpec.forall(s => s.direction == Ascending &&
             s.nullOrdering == NullsFirst) &&
           w.partitionSpec.nonEmpty &&
           w.partitionSpec.forall(_.isInstanceOf[Attribute]) =>
      val child = w.child
      val keys = w.partitionSpec.map(_.asInstanceOf[Attribute])
      val valueStruct = CreateStruct(child.output)
      val orderStruct = CreateStruct(w.orderSpec.map(_.child))
      val aggExpr = FirstByOrder(valueStruct, orderStruct).toAggregateExpression()
      val winner = Alias(aggExpr, "__winner")()
      val agg = Aggregate(keys, keys :+ winner, child)
      // Restore the child's original attribute ids so parents still
      // resolve. Grouping keys pass through as the Aggregate's own output
      // attributes (aliasing them to their own exprId would duplicate
      // expression ids within the subtree — unsound under self-joins or
      // later rules that assume exprId uniqueness); only non-key columns
      // are re-aliased out of the winner struct.
      val keyIds = keys.map(_.exprId).toSet
      val restored: Seq[NamedExpression] = child.output.zipWithIndex.map {
        case (attr, _) if keyIds.contains(attr.exprId) => attr
        case (attr, i) =>
          Alias(GetStructField(winner.toAttribute, i, Some(attr.name)),
            attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
      }
      Project(projectList, Project(restored, agg))
  }
}

/** Session extension wiring: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Besides the optimizer rule, the engine's expression kernels register
  * as SQL functions, so the `spark.sql` front-end can use them like
  * built-ins (`SELECT simhash60(split(text, ' ')) FROM docs`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
  import graft.functions._

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal, got $other")
  }

  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
     new ExpressionInfo("graft.functions", name, usage),
     (args: Seq[Expression]) => builder(args))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => FirstWinsRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction(fn("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float vectors") {
      case Seq(a, b) => CosineSim(a, b)
    })
    e.injectFunction(fn("simhash60",
      "simhash60(tokens) - 60-bit SimHash over distinct tokens") {
      case Seq(t) => SimHash60(t)
    })
    e.injectFunction(fn("word_shingles",
      "word_shingles(text, k) - distinct word k-gram shingles") {
      case Seq(t, k) => WordShingles(t, intArg(k, "word_shingles k"))
    })
    e.injectFunction(fn("minhash_sig",
      "minhash_sig(shingles, k) - k-element MinHash signature") {
      case Seq(s, k) => MinHashSig(s, intArg(k, "minhash_sig k"))
    })
    e.injectFunction(fn("lsh_bucket",
      "lsh_bucket(embedding[, planes]) - LSH bucket id (default 8 planes)") {
      case Seq(v)    => LshBucket(v)
      case Seq(v, p) => LshBucket(v, intArg(p, "lsh_bucket planes"))
    })
    e.injectFunction(fn("token_stats",
      "token_stats(text) - struct(n_chars, n_tokens, n_types, n_stopwords)") {
      case Seq(t) => TokenStats(t)
    })
    e.injectFunction(fn("lang_scores",
      "lang_scores(text) - struct of language marker-hit counts") {
      case Seq(t) => LangScores(t)
    })
    e.injectFunction(fn("rep_stats",
      "rep_stats(text) - Gopher repetition numerators: struct(den, top2..top4, dup5..dup10)") {
      case Seq(t) => RepStats(t)
    })
    e.injectFunction(fn("dsir_buckets",
      "dsir_buckets(text, b) - hashed word-bigram feature buckets (with multiplicity)") {
      case Seq(t, b) => DsirBuckets(t, intArg(b, "dsir_buckets b"))
    })
    e.injectFunction(fn("dsir_score",
      "dsir_score(text, weights) - length-normalized importance score vs a dense weight vector") {
      case Seq(t, w) => DsirScore(t, w)
    })
    e.injectFunction(fn("winnow_fingerprints",
      "winnow_fingerprints(text, k, w) - MOSS winnowing fingerprints") {
      case Seq(t, k, w) =>
        WinnowFingerprints(t, intArg(k, "winnow k"), intArg(w, "winnow w"))
    })
  }
}
