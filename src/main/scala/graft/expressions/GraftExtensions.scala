package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration for the custom expressions, so
  * `spark.sql("SELECT simhash64(split(text, ' ')) ...")` works.
  *
  * Two paths:
  *  - [[GraftExtensions]] for session construction:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `--conf spark.sql.extensions=graft.expressions.GraftExtensions`.
  *  - [[registerAll]] for an existing session (the driver owns the
  *    session in Verify/Bench, so runtime registration is the path the
  *    query packs use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(e: SparkSessionExtensions): Unit =
    builtins.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.expressions", name),
          builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case x if x.foldable => x.eval() match {
      case n: java.lang.Number => n.intValue
      case other => throw new IllegalArgumentException(s"$what must be an int, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case x if x.foldable => x.eval() match {
      case b: java.lang.Boolean => b.booleanValue
      case other => throw new IllegalArgumentException(s"$what must be a boolean, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  val builtins: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_signature" -> { args =>
      require(args.length == 3, "minhash_signature(tokens, k, numHashes)")
      MinHashSignature(args.head, intArg(args(1), "k"), intArg(args(2), "numHashes"))
    },
    "simhash64" -> { args =>
      require(args.length == 1, "simhash64(tokens)")
      SimHash64(args.head)
    },
    "quantize_vec" -> { args =>
      require(args.length == 2, "quantize_vec(arr, scale)")
      val scale = args(1) match {
        case e if e.foldable => e.eval() match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case d: java.lang.Double => d.doubleValue
          case f: java.lang.Float => f.doubleValue
          case n: java.lang.Number => n.doubleValue
          case other => throw new IllegalArgumentException(s"scale must be numeric, got $other")
        }
        case other => throw new IllegalArgumentException(s"scale must be a literal, got $other")
      }
      QuantizeVec(args.head, scale)
    },
    "dot_long" -> { args =>
      require(args.length == 2, "dot_long(a, b)")
      DotLong(args.head, args(1))
    },
    "lsh_bucket" -> { args =>
      require(args.length == 2, "lsh_bucket(arr, nBits)")
      LshBucket(args.head, intArg(args(1), "nBits"))
    },
    "ngram_shingles" -> { args =>
      require(args.length == 3, "ngram_shingles(toks, n, distinct)")
      NgramShingles(args.head, intArg(args(1), "n"), boolArg(args(2), "distinct"))
    },
    "ngram_shingle_hashes" -> { args =>
      require(args.length == 3, "ngram_shingle_hashes(toks, n, distinct)")
      NgramShingleHashes(args.head, intArg(args(1), "n"), boolArg(args(2), "distinct"))
    },
    "count_in_sorted" -> { args =>
      require(args.length == 2, "count_in_sorted(needles, sortedHaystack)")
      CountInSorted(args.head, args(1))
    },
    "pq_adc_score" -> { args =>
      require(args.length == 3, "pq_adc_score(codes, dtable, ksub)")
      PqAdcScore(args.head, args(1), intArg(args(2), "ksub"))
    },
    "winnow_mins" -> { args =>
      require(args.length == 3, "winnow_mins(text, k, w)")
      WinnowMins(args.head, intArg(args(1), "k"), intArg(args(2), "w"))
    },
    "winnow_spans" -> { args =>
      require(args.length == 3, "winnow_spans(text, k, w)")
      WinnowSpans(args.head, intArg(args(1), "k"), intArg(args(2), "w"))
    },
    "lsh_bucket_long" -> { args =>
      require(args.length == 2, "lsh_bucket_long(arr, nBits)")
      LshBucketLong(args.head, intArg(args(1), "nBits"))
    },
    "min_md5_window" -> { args =>
      require(args.length == 2, "min_md5_window(text, k)")
      MinMd5Window(args.head, intArg(args(1), "k"))
    },
    "nfc_normalize" -> { args =>
      require(args.length == 1, "nfc_normalize(text)")
      NfcNormalize(args.head)
    },
    "punct_ws_normalize" -> { args =>
      require(args.length == 2, "punct_ws_normalize(text, maskDigits)")
      PunctWsNormalize(args.head, boolArg(args(1), "maskDigits"))
    },
    "cdc_chunks" -> { args =>
      require(args.length == 3, "cdc_chunks(text, k, mod)")
      val k = intArg(args(1), "k")
      val mod = intArg(args(2), "mod")
      require(k >= 1 && mod >= 1,
        s"cdc_chunks: k and mod must be >= 1 (got k=$k, mod=$mod)")
      CdcChunks(args.head, k, mod)
    },
    "jaro_winkler" -> { args =>
      require(args.length == 2, "jaro_winkler(a, b)")
      JaroWinkler(args.head, args(1))
    },
    "sem_verdict" -> { args =>
      require(args.length == 2, "sem_verdict(raw, semType)")
      val semType = args(1) match {
        case e if e.foldable => e.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case s: String => s
          case other => throw new IllegalArgumentException(s"semType must be a string, got $other")
        }
        case other => throw new IllegalArgumentException(s"semType must be a literal, got $other")
      }
      SemVerdict(
        org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.StringType),
        SemVerdict.kernels.getOrElse(semType,
          throw new IllegalArgumentException(
            s"unknown semType '$semType' (one of ${SemVerdict.kernels.keys.mkString(", ")})")))
    })

  /** Runtime registration on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    builtins.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
