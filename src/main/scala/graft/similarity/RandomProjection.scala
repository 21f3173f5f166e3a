package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-projection dimensionality reduction for embedding columns —
  * the pre-ANN compression step at corpus scale: a 100 TB embedding
  * table at dim 4096 is first projected to a few dozen dimensions
  * (Johnson–Lindenstrauss: pairwise distances survive within ε), and
  * clustering / LSH / coarse search run on the projected vectors at a
  * fraction of the memory and FLOPs.
  *
  * The projection matrix is a SIGN matrix (Achlioptas 2001: ±1 entries
  * are JL-valid — "Database-friendly random projections"), derived
  * deterministically from md5 of `salt:i:j`, so any engine (and any
  * round trip through storage) regenerates the identical matrix — no
  * model artifact to ship. Vector components are first quantized to
  * integer thousandths (floor(x·1000 + 0.5) — the Quantize convention),
  * so the projected coordinates are pure integer sums: bit-identical
  * on every engine and partitioning, which is what lets the gate
  * hash-compare exactly.
  *
  * Scale design: map-only — the matrix is a plan literal (k·dim ints),
  * each row's projection is a fold over its own vector; zero shuffles,
  * zero driver state, trivially codegen-friendly (`transform` /
  * `zip_with` / `aggregate` are all codegen'd higher-order functions).
  */
object RandomProjection {

  val QuantScale = 1000L

  /** ±1 sign matrix [k rows][dim cols], entry (j,i) from bit 0 of the
    * 60-bit md5 hash of "salt:i:j" (the Portable.h60 construction —
    * first 15 hex digits of md5 as a long). */
  def signMatrix(dim: Int, k: Int, salt: String = "rp"): Array[Array[Int]] = {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    Array.tabulate(k)(j => Array.tabulate(dim)(i =>
      if ((h60(s"$salt:$i:$j") & 1L) == 0L) 1 else -1))
  }

  /** Integer-quantized copy of a float vector (thousandths,
    * round-half-up — floor(x·1000 + 0.5) is exact on both engines). */
  def quantize(vec: Column): Column =
    transform(vec, x =>
      floor(x.cast("double") * QuantScale + lit(0.5)).cast("long"))

  /** The j-th projected coordinate of a QUANTIZED vector: the signed
    * integer sum Σ_i sign(j,i)·q_i. */
  def coordinate(quantized: Column, signRow: Array[Int]): Column =
    aggregate(
      zip_with(typedLit(signRow.toSeq), quantized,
        (s, q) => s.cast("long") * q),
      lit(0L), (acc, e) => acc + e)
}
