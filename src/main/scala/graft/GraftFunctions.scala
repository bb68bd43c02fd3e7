package graft

import graft.expr.{CosineSimilarity, DotProduct, PolynomialFingerprint, TokenShingles}
import graft.functions.InterpolatedQuantile
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftx.Bridge

/** SQL-surface registration of the graft native expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works alongside the
  * Column API.
  *
  * Two entry points:
  *  - `GraftFunctions.register(spark)` — register into an existing session;
  *  - `spark.sql.extensions=graft.GraftExtensions` — injected at session
  *    build (the SparkSessionExtensions path for cluster deployment).
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args =>
      require(args.length == 2, "graft_dot(arrayA, arrayB)")
      DotProduct(args(0), args(1))
    },
    "graft_cosine" -> { args =>
      require(args.length == 2, "graft_cosine(arrayA, arrayB)")
      CosineSimilarity(args(0), args(1))
    },
    "graft_sqdist" -> { args =>
      require(args.length == 2, "graft_sqdist(arrayA, arrayB)")
      graft.expr.SquaredDistance(args(0), args(1))
    },
    "graft_fingerprint" -> { args =>
      require(args.length == 1, "graft_fingerprint(text)")
      PolynomialFingerprint(args(0))
    },
    "graft_mix63" -> { args =>
      require(args.length == 1, "graft_mix63(bigint)")
      graft.expr.Mix63(args(0))
    },
    "graft_nfc" -> { args =>
      require(args.length == 1, "graft_nfc(text)")
      graft.expr.NfcNormalize(args(0))
    },
    "graft_image_meta" -> { args =>
      require(args.length == 1, "graft_image_meta(binary)")
      graft.expr.ImageMeta(args(0))
    },
    "graft_audio_meta" -> { args =>
      require(args.length == 1, "graft_audio_meta(binary)")
      graft.expr.AudioMeta(args(0))
    },
    "graft_video_meta" -> { args =>
      require(args.length == 1, "graft_video_meta(binary)")
      graft.expr.VideoMeta(args(0))
    },
    "graft_video_frame_ranges" -> { args =>
      require(args.length == 3, "graft_video_frame_ranges(binary, k, snap)")
      val k = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"graft_video_frame_ranges: k must be a literal, got $other")
      }
      val snap = args(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toBoolean
        case other => throw new IllegalArgumentException(
          s"graft_video_frame_ranges: snap must be a literal, got $other")
      }
      graft.expr.VideoFrameRanges(args(0), k, snap)
    },
    "graft_shingles" -> { args =>
      require(args.length == 2, "graft_shingles(tokens, n)")
      val n = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"graft_shingles: n must be a literal, got $other")
      }
      TokenShingles(args(0), n)
    },
    // (catalyst trees built directly: a Column round-trip through the
    // Bridge leaves Unevaluable column-node wrappers inside a registered
    // function)
    "graft_zvalue" -> { args =>
      import org.apache.spark.sql.catalyst.expressions._
      require(args.length >= 3, "graft_zvalue(colA, colB, ..., bits)")
      val bits = args.last match {
        case Literal(v, _) => v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"graft_zvalue: bits must be a literal, got $other")
      }
      val cols = args.init
      val m = cols.size
      require(bits > 0 && m * bits <= 63, s"$m cols x $bits bits exceeds a long")
      val terms = for {
        (c, ci) <- cols.zipWithIndex
        b <- 0 until bits
      } yield ShiftLeft(
        BitwiseAnd(
          ShiftRightUnsigned(Cast(c, org.apache.spark.sql.types.LongType), Literal(b)),
          Literal(1L)),
        Literal(b * m + ci))
      terms.reduce[Expression](BitwiseOr(_, _))
    },
    "graft_redact_pii" -> { args =>
      import org.apache.spark.sql.catalyst.expressions._
      require(args.length == 1, "graft_redact_pii(text)")
      import graft.operators.TextOps.{DigitRunRe, EmailRe, Ipv4Re}
      Seq(EmailRe -> "<EMAIL>", Ipv4Re -> "<IP>", DigitRunRe -> "<NUM>")
        .foldLeft(args(0)) { case (e, (re, tok)) =>
          RegExpReplace(e, Literal(re), Literal(tok))
        }
    },
    "graft_http_response" -> { args =>
      require(args.length == 1, "graft_http_response(binary)")
      graft.expr.HttpResponse(args(0))
    },
    "graft_http_gate" -> { args =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      require(args.length == 3, "graft_http_gate(binary, status, ctPrefix)")
      val status = args(1) match {
        case Literal(v, _) => v.toString.toInt
        case other => throw new IllegalArgumentException(
          s"graft_http_gate: status must be a literal, got $other")
      }
      val prefix = args(2) match {
        case Literal(v, _) => v.toString
        case other => throw new IllegalArgumentException(
          s"graft_http_gate: ctPrefix must be a literal, got $other")
      }
      graft.expr.HttpGate(args(0), status, prefix)
    },
    "graft_robots_rules" -> { args =>
      require(args.length == 1, "graft_robots_rules(text)")
      graft.expr.RobotsRules(args(0))
    },
    "graft_robots_allowed" -> { args =>
      require(args.length == 2, "graft_robots_allowed(rules, path)")
      graft.expr.RobotsAllowed(args(0), args(1))
    },
    "graft_robots_directives" -> { args =>
      require(args.length == 1, "graft_robots_directives(text)")
      graft.expr.RobotsDirectives(args(0))
    },
    "graft_quantile" -> { args =>
      require(args.length == 2, "graft_quantile(col, q)")
      val q = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toDouble
        case other => throw new IllegalArgumentException(
          s"graft_quantile: q must be a literal, got $other")
      }
      InterpolatedQuantile(args(0), q).toAggregateExpression()
    })

  /** Register all graft functions into an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) => Bridge.registerFunction(spark, name, builder) }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        (args: Seq[Expression]) => builder(args)))
    }
}
