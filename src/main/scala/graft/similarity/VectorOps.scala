package graft.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable vector primitives for embedding columns (Array[Float]).
  *
  * Floats are quantized to integer milli-units (`floor(x*1000 + 0.5)`)
  * before any arithmetic: dot products and norms become EXACT int64 math,
  * identical in every engine, and cosine surfaces as floor'd basis points.
  * This removes float-summation-order nondeterminism — the reason most
  * engines' ANN results can't be cross-checked — while costing ≤0.1%
  * precision, irrelevant for near-dup/top-k ranking.
  *
  * All expressions are `functions._` compositions (codegen'd higher-order
  * array functions); no UDFs.
  */
object VectorOps {

  /** Quantize array<float> → array<bigint> milli-units. floor(x+0.5) is
    * used instead of round() because round's half-way tie rule differs
    * across engines; floor does not. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000d + 0.5d).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity in floor'd basis points from quantized vectors and
    * their precomputed self-dots. */
  def cosineBp(dot: Column, selfA: Column, selfB: Column): Column =
    floor(lit(10000.0) * dot / sqrt(selfA.cast("double") * selfB.cast("double")))
      .cast("long")

  /** DuckDB SQL twins (expr strings over list columns). */
  def duckQuantize(e: String): String =
    s"list_transform($e, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
  def duckQdot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) AS BIGINT)"
  def duckCosineBp(dot: String, selfA: String, selfB: String): String =
    s"CAST(floor(10000.0 * $dot / sqrt(CAST($selfA AS DOUBLE) * $selfB)) AS BIGINT)"

  // ---------------------------------------------------------------- LSH

  /** Deterministic pseudo-random hyperplane component: same md5-derived
    * value as PortableHash.h32(s"$plane:$dim"), mapped to [-1000, 1000].
    * Computed driver-side (it's a constant), embedded as literals in the
    * plan; the oracle regenerates it in SQL from the same formula. */
  def hyperplane(plane: Int, dims: Int): Array[Long] =
    Array.tabulate(dims) { d =>
      val md5 = MessageDigest.getInstance("MD5")
        .digest(s"$plane:$d".getBytes(StandardCharsets.UTF_8))
      val hex = md5.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }

  def duckHyperplane(plane: String, dim: String): String =
    s"(${graft.text.PortableHash.duckH32(s"$plane||':'||$dim")} % 2001 - 1000)"

  /** 16-bit sign sketch of a quantized vector against hyperplanes 0..15. */
  def sketch(qv: Column, dims: Int, bits: Int = 16): Column =
    (0 until bits).map { p =>
      val hp = array(hyperplane(p, dims).map(lit): _*)
      when(qdot(qv, hp) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  def duckSketch(qv: String, bits: Int = 16): String =
    (0 until bits).map { p =>
      val dot = s"list_sum(list_transform(generate_series(1, len($qv)), i -> $qv[i] * ${duckHyperplane(p.toString, "i-1")}))"
      s"(CASE WHEN $dot > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
}
