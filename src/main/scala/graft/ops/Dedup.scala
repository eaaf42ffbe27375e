package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for training-data pipelines.
  * All shapes are inverted-index joins / banded LSH — no cross join ever
  * touches the full corpus, so each scales by partitioning on the
  * token/band key (the classic MinHash-LSH construction, Broder '97;
  * SimHash, Charikar '02).
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text with the
    * representative (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  private def tokens(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => length(t) > 0)

  /** Distinct (id, token) pairs with document-frequency cap — the inverted
    * index that keys every similarity self-join. Tokens above `maxDf` are
    * dropped on BOTH sides (stop-word pruning; bounds the join fan-out, which
    * is what makes this survive 100 TB — a token in k docs produces k² pairs).
    */
  def tokenIndex(df: DataFrame, idCol: String, textCol: String, maxDf: Long): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .distinct()
    val dfs = tok.groupBy("token").agg(count(lit(1)).as("df"))
    tok.join(dfs.filter(col("df") <= maxDf), Seq("token"), "left_semi")
  }

  /** Word-level Jaccard near-duplicate pairs (n-gram Jaccard with n=1 over
    * the df-capped token sets; integer arithmetic only so any SQL engine
    * reproduces it bit-exactly): pairs (a < b) with
    * |∩| * 100 >= threshold% * |∪|.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      thresholdPct: Int, maxDf: Long): DataFrame = {
    val idx = tokenIndex(df, idCol, textCol, maxDf)
    val sizes = idx.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = idx.as("x").join(idx.as("y"),
        col("x.token") === col("y.token") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), Seq("b"))
      .filter(col("inter") * 100 >= lit(thresholdPct) * (col("sza") + col("szb") - col("inter")))
      .select(col("a"), col("b"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("uni"))
  }

  private val MinhashPrime = 2147483647L // 2^31 - 1

  /** MinHash signature of the token set: sig_i = min over tokens of
    * (a_i * h(token) + b_i mod p), h reduced to 31 bits first so the affine
    * step never overflows a long. One codegen'd expression — shingle →
    * minhash entirely inside transform/array_min.
    */
  def minhashSig(tokensCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i => {
      val a = i * 131 + 7
      val b = i * 40503 + 11
      array_min(transform(tokensCol,
        t => pmod(pmod(xxhash64(t), lit(MinhashPrime)) * a + b, lit(MinhashPrime))))
    })

  /** MinHash + LSH banding: shingle → minhash → band → bucket-join →
    * candidate pairs verified by exact Jaccard. `bands` must divide
    * `numHashes`; rows-per-band r = numHashes/bands sets the similarity knee
    * (threshold ≈ (1/bands)^(1/r)).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, thresholdPct: Int = 60,
      maxDf: Long = Long.MaxValue): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val toks = df.select(col(idCol).as("id"),
      array_distinct(tokens(col(textCol))).as("toks"))
      .filter(size(col("toks")) > 0)
    val sigs = toks.withColumn("sig", minhashSig(col("toks"), numHashes))
    val banded = sigs.select(col("id"), col("toks"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band", "bhash")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.toks").as("ta"), col("y.toks").as("tb"))
      .distinct()
    // verify candidates exactly (integer jaccard)
    cands
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
      .filter(col("inter") * 100 >= lit(thresholdPct) * col("uni"))
      .select("a", "b", "inter", "uni")
  }

  private val SimhashBits = 48

  /** SimHash bit vector (standard construction with one hash function per
    * bit — avoids 64-bit shift precision issues): bit b is set iff more
    * tokens hash to 1 on h_b than to 0.
    */
  def simhashBits(tokensCol: Column): Column = {
    val nToks = size(tokensCol)
    transform(
      sequence(lit(0), lit(SimhashBits - 1)),
      b => when(
        size(filter(tokensCol,
          t => pmod(xxhash64(concat(t, lit(":"), b.cast("string"))), lit(2L)) === 1L)) * 2
          > nToks, 1).otherwise(0))
  }

  /** The bit vector packed into one long (for compact storage/eyeballing). */
  def simhash(tokensCol: Column): Column =
    aggregate(simhashBits(tokensCol), lit(0L), (acc, b) => acc * 2 + b)

  /** SimHash near-duplicate candidates: band the bit vector into `chunks`
    * pieces; pairs sharing any chunk are verified by Hamming distance
    * (pigeonhole: hamming <= chunks-1 guarantees a shared chunk).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    val bitsPerChunk = SimhashBits / chunks
    val fp = df.select(col(idCol).as("id"),
      simhashBits(array_distinct(tokens(col(textCol)))).as("bits"))
    val banded = fp.select(col("id"), col("bits"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => xxhash64(slice(col("bits"), c * bitsPerChunk + 1, lit(bitsPerChunk)))))
        .as(Seq("chunk", "chash")))
    banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.chash") === col("y.chash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        size(filter(zip_with(col("x.bits"), col("y.bits"), (p, q) => p =!= q),
          x => x)).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
