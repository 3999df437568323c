package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.Bridge

import graft.dedup.MinHashLsh
import graft.functions._

/** SQL surface for graft's custom Catalyst expressions: a user who
  * lives in `spark.sql(...)` (or a JDBC/Thrift client) gets the same
  * codegen'd primitives the DataFrame API exposes — no UDF tax, no
  * Scala required. Two registration paths:
  *
  *  - new sessions: `--conf spark.sql.extensions=graft.sql.GraftExtensions`
  *  - an existing session: `GraftFunctions.register(spark)`
  *
  * Functions:
  *   float_dot(a, b)                   ⟨a, b⟩ over array<float>
  *   float_norm(v)                     ‖v‖₂
  *   float_normalize(v)                v/‖v‖ (zero vector stays zero)
  *   sorted_intersect_size(a, b)       |A∩B| merge walk, sorted array<long>
  *   pq_encode(v, codebook, dsub)      m-byte PQ code (binary)
  *   pq_lut(q, codebook, dsub)         per-query ADC lookup table
  *   pq_adc(code, lut)                 ADC score (m adds)
  *   count_min(h, width, depth, seed)  AGGREGATE: Count-Min sketch over
  *                                     60-bit token hashes (same affine
  *                                     rows as minhash_sig)
  *   cms_query(cms, h, width, depth, seed)  point-frequency estimate
  *   sq8_encode(v, bounds)             d-byte SQ8 code (binary)
  *   sq8_decode(code, bounds)          reconstruction (array<float>)
  *   sq8_adc_dot(q, code, bounds)      fused asymmetric dot (double)
  *   minhash_sig(h, numHashes, seed)   AGGREGATE: minhash signature over
  *                                     grouped 60-bit hash values, same
  *                                     seeded permutations as
  *                                     [[MinHashLsh.coefficients]]
  *   heavy_hitters(toks, capacity)     AGGREGATE: Misra–Gries frequent-
  *                                     tokens sketch (T17/S15 core)
  *   vec_outer(v)                      AGGREGATE: [n, Σv, upper(Σvvᵀ)]
  *                                     second-moment buffer (PCA/OPQ fit)
  *   cdc_gear(text, minLen, maxLen, maskBits)
  *                                     gear rolling-hash CDC chunks:
  *                                     array<struct<start,len,hash>>
  *   binary_pack(v)                    sign bits of array<float>, 32
  *                                     dims per long word (P7j)
  *   hamming(a, b)                     XOR+popcount over packed words
  *   kmv(hs, k)                        AGGREGATE: k smallest distinct
  *                                     long hashes, ascending (T33)
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }

  /** (name, builder) pairs — one list drives both registration paths. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "float_dot" -> { args => FloatDot(args(0), args(1)) },
    "float_norm" -> { args =>
      org.apache.spark.sql.catalyst.expressions.Sqrt(FloatDot(args(0), args(0)))
    },
    "float_normalize" -> { args => FloatNormalize(args(0)) },
    "sorted_intersect_size" -> { args => SortedIntersectSize(args(0), args(1)) },
    "pq_encode" -> { args => PqOps.PqEncode(args(0), args(1), intArg(args(2), "dsub")) },
    "pq_lut" -> { args => PqOps.PqLut(args(0), args(1), intArg(args(2), "dsub")) },
    "pq_adc" -> { args => PqOps.PqAdc(args(0), args(1)) },
    "count_min" -> { args =>
      CountMinAgg(args(0), intArg(args(1), "width"), intArg(args(2), "depth"),
        longArg(args(3), "seed"))
    },
    "cms_query" -> { args =>
      new CmsQuery(args(0), args(1), intArg(args(2), "width"), intArg(args(3), "depth"),
        longArg(args(4), "seed"))
    },
    "sq8_encode" -> { args => Sq8Ops.Sq8Encode(args(0), args(1)) },
    "sq8_decode" -> { args => Sq8Ops.Sq8Decode(args(0), args(1)) },
    "sq8_adc_dot" -> { args => Sq8Ops.Sq8AdcDot(args(0), args(1), args(2)) },
    "minhash_sig" -> { args =>
      val numHashes = intArg(args(1), "numHashes")
      val seed = longArg(args(2), "seed")
      val coefs = MinHashLsh.coefficients(numHashes, seed)
      // same input convention as signaturesFromShingles: raw 64-bit
      // hashes, reduced into [0, prime) here
      MinHashAgg(
        org.apache.spark.sql.catalyst.expressions.Pmod(
          args(0), Literal(2147483647L)),
        coefs.map(_._1), coefs.map(_._2), 2147483647L)
        .toAggregateExpression(isDistinct = false)
    },
    "heavy_hitters" -> { args =>
      // AGGREGATE: Misra–Gries sketch of array<string> token rows
      HeavyHittersAgg(args(0), intArg(args(1), "capacity"))
        .toAggregateExpression(isDistinct = false)
    },
    "vec_outer" -> { args =>
      // AGGREGATE: [n, Σv, upper(Σvvᵀ)] second-moment buffer of an
      // array<float> column (the PCA/covariance substrate)
      VecOuterAgg(args(0)).toAggregateExpression(isDistinct = false)
    },
    "cdc_gear" -> { args =>
      // gear rolling-hash CDC: array<struct<start,len,hash>> chunks
      GearChunks(
        args(0), intArg(args(1), "minLen"), intArg(args(2), "maxLen"),
        intArg(args(3), "maskBits"))
    },
    "binary_pack" -> { args => BinaryPack(args(0)) },
    "hamming" -> { args => Hamming(args(0), args(1)) },
    "kmv" -> { args =>
      // AGGREGATE: k smallest distinct long hashes, ascending
      KmvAgg(args(0), intArg(args(1), "k")).toAggregateExpression(isDistinct = false)
    }
  )

  /** Register every graft SQL function on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerTempFunction(spark, name, b) }
}

/** `spark.sql.extensions` entry point: injects the [[GraftFunctions]]
  * list into every session built with this extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction(
        (new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          b))
    }
}
