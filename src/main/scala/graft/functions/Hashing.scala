package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashing primitives for near-duplicate detection at scale.
  *
  * Everything is deterministic (fixed seeds) so results are stable
  * across runs, partitionings, and cluster sizes — a hard requirement
  * for reproducible dedup of a 100 TB corpus.
  */
object Hashing {

  /** Prime modulus for the universal-hash family (> 2^32). */
  val MinHashPrime: Long = 4294967311L

  /** Deterministic (a, b) coefficient pairs for k min-hash functions.
    * a ∈ [1, 2^31): keeps a*h < 2^63 for h < 2^32 — no Long overflow. */
  def minHashCoefficients(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
                 math.floorMod(rnd.nextLong(), MinHashPrime)))
  }

  /** 32-bit-ranged base hashes of an array of string shingles:
    * xxhash64 folded into [0, 2^32). */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => pmod(xxhash64(s), lit(4294967296L)))

  /** MinHash signature (`array<long>`, length k) of a shingle-hash array.
    * Empty shingle set → signature of all MinHashPrime (matches nothing).
    * Native expression: one fused k×n loop per row (the equivalent
    * built-in composition — k `transform`s — evaluates interpreted,
    * ~50× slower). */
  def minHashSignature(baseHashes: Column, k: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(baseHashes), k, seed))

  /** Reference implementation via built-ins (cross-checked in tests). */
  def minHashSignatureBuiltin(baseHashes: Column, k: Int = 64, seed: Long = 42L): Column = {
    val coeffs = minHashCoefficients(k, seed)
    array(coeffs.map { case (a, b) =>
      coalesce(
        array_min(transform(baseHashes,
          h => pmod(lit(a) * h + lit(b), lit(MinHashPrime)))),
        lit(MinHashPrime))
    }: _*)
  }

  /** See [[minHashSignature]]. Input `array<long>` of base hashes in
    * [0, 2^32); output `array<long>` length k. */
  case class MinHashSig(child: Expression, k: Int, seed: Long) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(v: Any): Any =
      Hashing.minHashSigCompute(v.asInstanceOf[ArrayData], k, seed)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Hashing.minHashSigCompute($c, $k, ${seed}L)")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  private val coeffCache =
    new BoundedMemo[(Int, Long), (Array[Long], Array[Long])](64)

  /** Static entry point (also called from generated Java). */
  def minHashSigCompute(hashes: ArrayData, k: Int, seed: Long): ArrayData = {
    val (as, bs) = coeffCache.getOrCompute((k, seed), { key =>
      val cs = minHashCoefficients(key._1, key._2)
      (cs.map(_._1).toArray, cs.map(_._2).toArray)
    })
    val n = hashes.numElements()
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, MinHashPrime)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % MinHashPrime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** LSH band keys: the signature sliced into `bands` bands of
    * `sig.length / bands` rows each, each band hashed to one long.
    * Two sets with Jaccard similarity s collide in ≥1 band with
    * probability 1 - (1 - s^r)^b — the classic S-curve. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",",
        slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** 64-bit SimHash of a token array (see [[SimHash]]). */
  def simHash(tokens: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(tokens)))

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDist64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash fingerprint: xxhash64 each token, sum ±1 per bit position,
    * keep the sign bit. Near-duplicate documents land within a small
    * Hamming distance. Codegen delegates to [[SimHash.compute]] — one
    * static call per row keeps the surrounding pipeline fused. */
  /** Input must be an `array<string>` column (not type-checked: Spark 4
    * keeps `AbstractDataType` private to the sql package). */
  case class SimHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(v: Any): Any =
      SimHash.compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.simHashCompute($c)")

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  object SimHash {
    val Seed: Long = 42L
    def compute(tokens: ArrayData): Long = {
      val counts = new Array[Int](64)
      val n = tokens.numElements()
      var i = 0
      while (i < n) {
        val s: UTF8String = tokens.getUTF8String(i)
        if (s != null) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** Java-codegen-friendly static entry point. */
  def simHashCompute(tokens: ArrayData): Long = SimHash.compute(tokens)
}
