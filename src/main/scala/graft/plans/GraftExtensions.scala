package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArgMax, BloomMightContain, BoundedEditDistance, HeavyHitters, LimbSum, LmXent2Score, LmXentScore, LongDotProduct, MinHashSignature, QuantizeError, TopK}

/** Engine-native Catalyst extensions, injected via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)` on the builder).
  *
  * Registers the SQL-callable surface of the engine's custom expressions
  * so `spark.sql("SELECT graft_dot(a, b)")` plans the same codegen'd
  * operator the Column API uses. The engine deliberately needs NO custom
  * `Rule[LogicalPlan]` or `SparkStrategy` (SURVEY.md §4): every operator
  * maps onto Catalyst-planned primitives; the extension point carries
  * only expressions where the built-in compositional form (higher-order
  * function lambdas) can't reach whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.graftDot)
    ext.injectFunction(GraftExtensions.graftEditWithin)
    ext.injectFunction(GraftExtensions.graftMinhash)
    ext.injectFunction(GraftExtensions.graftArgMax)
    ext.injectFunction(GraftExtensions.graftArgMin)
    ext.injectFunction(GraftExtensions.graftBloomContains)
    ext.injectFunction(GraftExtensions.graftLmXent)
    ext.injectFunction(GraftExtensions.graftLmXent2)
    ext.injectFunction(GraftExtensions.graftQuantErr)
    ext.injectFunction(GraftExtensions.graftHeavyHitters)
    ext.injectFunction(GraftExtensions.graftTopK)
    GraftExtensions.limbFns.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  val graftDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[LongDotProduct].getName, "graft_dot"),
    { args =>
      require(args.length == 2, "graft_dot(arrayA, arrayB) takes 2 arguments")
      LongDotProduct(args.head, args(1))
    })

  val graftEditWithin: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_edit_within"),
    new ExpressionInfo(classOf[BoundedEditDistance].getName, "graft_edit_within"),
    { args =>
      require(args.length == 3,
        "graft_edit_within(a, b, k) takes 3 arguments")
      BoundedEditDistance(args.head, args(1), args(2))
    })

  val graftMinhash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
    { args =>
      require(args.length == 1, "graft_minhash(wordHash) takes 1 argument")
      MinHashSignature(args.head).toAggregateExpression()
    })

  val graftArgMax: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_argmax"),
    new ExpressionInfo(classOf[ArgMax].getName, "graft_argmax"),
    { args =>
      require(args.length == 2, "graft_argmax(ord, value) takes 2 arguments")
      ArgMax(args.head, args(1)).toAggregateExpression()
    })

  val graftArgMin: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_argmin"),
    new ExpressionInfo(classOf[ArgMax].getName, "graft_argmin"),
    { args =>
      require(args.length == 2, "graft_argmin(ord, value) takes 2 arguments")
      ArgMax(args.head, args(1), findMax = false).toAggregateExpression()
    })

  val graftBloomContains: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
    { args =>
      require(args.length == 2,
        "graft_bloom_contains(value, bloomBytes) takes 2 arguments")
      BloomMightContain(args.head, args(1))
    })

  val graftLmXent: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lm_xent"),
    new ExpressionInfo(classOf[LmXentScore].getName, "graft_lm_xent"),
    { args =>
      require(args.length == 3,
        "graft_lm_xent(lang, tokens, lmBytes) takes 3 arguments")
      LmXentScore(args.head, args(1), args(2))
    })

  val graftLmXent2: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_lm_xent2"),
    new ExpressionInfo(classOf[LmXent2Score].getName, "graft_lm_xent2"),
    { args =>
      require(args.length == 3,
        "graft_lm_xent2(lang, tokens, lm2Bytes) takes 3 arguments")
      LmXent2Score(args.head, args(1), args(2))
    })

  val graftQuantErr: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quant_err"),
    new ExpressionInfo(classOf[QuantizeError].getName, "graft_quant_err"),
    { args =>
      require(args.length == 3,
        "graft_quant_err(sv, mins, rngs) takes 3 arguments")
      QuantizeError(args.head, args(1), args(2))
    })

  val graftHeavyHitters: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_heavy_hitters"),
    new ExpressionInfo(classOf[HeavyHitters].getName, "graft_heavy_hitters"),
    { args =>
      require(args.length == 2,
        "graft_heavy_hitters(item, k) takes 2 arguments")
      require(args(1).foldable,
        "graft_heavy_hitters k must be a literal")
      val k = args(1).eval().asInstanceOf[Number].intValue()
      HeavyHitters(args.head, k).toAggregateExpression()
    })

  val graftTopK: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopK].getName, "graft_topk"),
    { args =>
      require(args.length == 3,
        "graft_topk(ord, value, k) takes 3 arguments")
      require(args(2).foldable, "graft_topk k must be a literal")
      val k = args(2).eval().asInstanceOf[Number].intValue()
      TopK(args.head, args(1), k).toAggregateExpression()
    })

  /** Exact two-limb decimal-parity sum family (see [[LimbSum]]):
    * scalar unscaled extracts, guarded fused products, and the
    * aggregate in its three emit modes. */
  val limbFns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    def info(name: String) = new ExpressionInfo(classOf[LimbSum].getName, name)
    def scaleOf(e: Expression): Int = {
      require(e.foldable, "graft limb scale must be a literal")
      e.eval().asInstanceOf[Number].intValue()
    }
    Seq(
      (FunctionIdentifier("graft_u4"), info("graft_u4"), { args: Seq[Expression] =>
        require(args.length == 1, "graft_u4(x) takes 1 argument")
        LimbSum.u4Expr(args.head)
      }),
      (FunctionIdentifier("graft_u4n"), info("graft_u4n"), { args: Seq[Expression] =>
        require(args.length == 1, "graft_u4n(x) takes 1 argument")
        LimbSum.u4nExpr(args.head)
      }),
      (FunctionIdentifier("graft_rev_u8"), info("graft_rev_u8"), { args: Seq[Expression] =>
        require(args.length == 2, "graft_rev_u8(price, disc) takes 2 arguments")
        LimbSum.revU8Expr(args.head, args(1))
      }),
      (FunctionIdentifier("graft_prod_u8"), info("graft_prod_u8"), { args: Seq[Expression] =>
        require(args.length == 2, "graft_prod_u8(a, b) takes 2 arguments")
        LimbSum.prodU8Expr(args.head, args(1))
      }),
      (FunctionIdentifier("graft_charge_u6"), info("graft_charge_u6"), { args: Seq[Expression] =>
        require(args.length == 3, "graft_charge_u6(price, disc, tax) takes 3 arguments")
        LimbSum.chargeU6Expr(args.head, args(1), args(2))
      }),
      (FunctionIdentifier("graft_limb_sum"), info("graft_limb_sum"), { args: Seq[Expression] =>
        require(args.length == 2, "graft_limb_sum(x, scale) takes 2 arguments")
        LimbSum(args.head, scaleOf(args(1)), LimbSum.EmitDouble).toAggregateExpression()
      }),
      (FunctionIdentifier("graft_limb_struct"), info("graft_limb_struct"), { args: Seq[Expression] =>
        require(args.length == 1, "graft_limb_struct(x) takes 1 argument")
        LimbSum(args.head, 0, LimbSum.EmitStruct).toAggregateExpression()
      }),
      (FunctionIdentifier("graft_limb_resum"), info("graft_limb_resum"), { args: Seq[Expression] =>
        require(args.length == 1, "graft_limb_resum(st) takes 1 argument")
        LimbSum(args.head, 0, LimbSum.EmitStruct).toAggregateExpression()
      }),
      (FunctionIdentifier("graft_limb_fin"), info("graft_limb_fin"), { args: Seq[Expression] =>
        require(args.length == 2, "graft_limb_fin(st, scale) takes 2 arguments")
        LimbSum(args.head, scaleOf(args(1)), LimbSum.EmitDouble).toAggregateExpression()
      }),
      (FunctionIdentifier("graft_limb_u4"), info("graft_limb_u4"), { args: Seq[Expression] =>
        require(args.length == 2, "graft_limb_u4(x, scale) takes 2 arguments")
        LimbSum(args.head, scaleOf(args(1)), LimbSum.EmitU4).toAggregateExpression()
      }))
  }

  /** Register on an already-built session (idempotent — mirrors what
    * `injectFunction` does at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    (Seq(graftDot, graftEditWithin, graftMinhash, graftArgMax, graftArgMin, graftBloomContains, graftLmXent, graftLmXent2, graftQuantErr, graftHeavyHitters, graftTopK) ++ limbFns).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
