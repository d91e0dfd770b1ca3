package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018
  * ("Subword Regularization"), the other standard production tokenizer
  * next to BPE ([[BpeTrainer]]): seed a large substring vocabulary, run EM
  * to fit per-piece log-probabilities, and iteratively prune the worst
  * pieces until the target vocabulary size. This implementation uses HARD
  * (Viterbi) EM — expected counts are taken along each word's single best
  * segmentation rather than the full forward-backward lattice — which
  * keeps every accumulated statistic an exact integer.
  *
  * Same scale reduction as [[BpeTrainer.trainFast]]: the corpus collapses
  * to a (word, count) table in ONE Spark pass (Zipf: orders of magnitude
  * smaller than a 100 TB corpus), `maxWords` fail-fast guards the driver
  * transfer, and everything after is driver-side over that table. The
  * ENCODER is a native Catalyst expression over the token array (no UDF),
  * an integer-score Viterbi — scores are micro-unit log-probs (bigint), so
  * segmentation is deterministic arithmetic with pinned tie-breaks (fewer
  * pieces, then longer final piece), never float-order-dependent.
  *
  * Coverage is total by construction: every single code point segments
  * (unseen ones at a synthetic UNK score below every trained piece), so
  * `concat(pieces) == concat(tokens)` ALWAYS — the round-trip contract the
  * `t_unigram_roundtrip_contract` gate hash-checks.
  */
object UnigramTrainer {

  /** Code-point split (surrogate-pair safe, matching [[BpeTrainer]]). */
  private[operators] def codePoints(word: String): Array[String] = {
    val b = Array.newBuilder[String]
    var ci = 0
    while (ci < word.length) {
      val n = Character.charCount(word.codePointAt(ci))
      b += word.substring(ci, ci + n)
      ci += n
    }
    b.result()
  }

  /** Integer-score Viterbi segmentation. `scores` maps piece → micro-unit
    * log-prob; single code points absent from it fall back to `unkMicro`
    * (total coverage). Ties break deterministically: higher score, then
    * fewer pieces, then the longer final piece.
    */
  private[operators] def viterbi(
      word: String, scores: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int, unkMicro: Long): Array[String] = {
    val cps = codePoints(word)
    val n = cps.length
    if (n == 0) return Array.empty
    // prefix character offsets so substrings are O(1) to build per (s, e)
    val prefix = new Array[Int](n + 1)
    var i = 0
    while (i < n) { prefix(i + 1) = prefix(i) + cps(i).length; i += 1 }
    val sentinel = Long.MinValue / 4
    val bestScore = Array.fill(n + 1)(sentinel)
    val bestPieces = Array.fill(n + 1)(Int.MaxValue)
    val backStart = new Array[Int](n + 1)
    bestScore(0) = 0L
    bestPieces(0) = 0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxPieceLen)
      while (start < end) {
        if (bestScore(start) != sentinel) {
          val piece = word.substring(prefix(start), prefix(end))
          val known = scores.get(piece)
          val sc: Long =
            if (known != null) known.longValue()
            else if (end - start == 1) unkMicro
            else Long.MinValue
          if (sc != Long.MinValue) {
            val cand = bestScore(start) + sc
            val candPieces = bestPieces(start) + 1
            val cur = bestScore(end)
            val better =
              cand > cur ||
                (cand == cur && (candPieces < bestPieces(end) ||
                  (candPieces == bestPieces(end) && start < backStart(end))))
            if (cur == sentinel || better) {
              bestScore(end) = cand
              bestPieces(end) = candPieces
              backStart(end) = start
            }
          }
        }
        start += 1
      }
      end += 1
    }
    // backtrack
    val out = new scala.collection.mutable.ArrayBuffer[String](bestPieces(n))
    var e = n
    while (e > 0) {
      val s = backStart(e)
      out += word.substring(prefix(s), prefix(e))
      e = s
    }
    out.reverseIterator.toArray
  }

  private def logpMicro(count: Long, total: Long, vocab: Int): Long =
    math.floor(1e6 *
      (math.log(count + 1.0) - math.log(total.toDouble + vocab))).toLong

  /** Train a unigram tokenizer. Returns the model frame
    * (piece, logp_micro), rows ≤ `vocabSize`, every observed single code
    * point always retained (coverage). Deterministic: all accumulated
    * counts are exact integers, pruning ties break on the piece string.
    */
  /** The SAMPLING CONTRACT for corpora whose distinct-word table exceeds
    * any driver heap (a 100 TB web crawl's typo/URL tail): `wordSample = n`
    * trains on a deterministic 1/n ID-HASH sample of the (word, count)
    * table — seeded, partitioning-independent, so the trained model is
    * still a pure function of (corpus, params), bit-identical across
    * retrains (spec-pinned). SentencePiece itself trains on a bounded
    * sample for the same reason. COVERAGE IS UNAFFECTED: the Viterbi
    * encoder segments any unseen single code point at the synthetic UNK
    * score, so the round-trip law `concat(pieces) == concat(tokens)` holds
    * for a model trained on ANY subset of the words. What sampling trades
    * is piece-inventory quality on the dropped tail — exactly the
    * SentencePiece trade, now pinned instead of "raise minCount and hope".
    */
  def train(
      docs: DataFrame, textCol: String, vocabSize: Int,
      maxWords: Long = 5000000L, minCount: Long = 1L,
      maxPieceLen: Int = 8, emRounds: Int = 2,
      seedMultiple: Int = 4, wordSample: Int = 1): DataFrame = {
    require(vocabSize > 0 && maxPieceLen >= 1 && emRounds >= 1 && seedMultiple >= 1)
    require(wordSample >= 1, s"wordSample must be >= 1, got $wordSample")
    val spark = docs.sparkSession
    import spark.implicits._
    val wc0 = BpeTrainer.wordCounts(docs, textCol).filter(col("n") >= minCount)
    val wc =
      if (wordSample <= 1) wc0
      else wc0.filter(
        pmod(xxhash64(col("word"), lit(77L)), lit(wordSample.toLong)) === 0L)
    val nDistinct = wc.count()
    require(nDistinct <= maxWords,
      s"UnigramTrainer.train collects the (word, count) table driver-side: " +
        s"$nDistinct distinct words exceed maxWords=$maxWords. Set " +
        s"wordSample (currently $wordSample) to train on a deterministic " +
        s"1/n word sample (coverage unaffected — see the sampling " +
        s"contract), raise minCount (currently $minCount), or raise " +
        "maxWords if driver heap allows.")
    val table = wc.as[(String, Long)].collect()
    require(table.nonEmpty, "no trainable words (empty corpus after tokenization)")

    import scala.collection.mutable
    // --- seed: every substring up to maxPieceLen, weighted by word count
    val subCounts = mutable.HashMap.empty[String, Long]
    val charSet = mutable.TreeSet.empty[String]
    table.foreach { case (word, nW) =>
      val cps = codePoints(word)
      charSet ++= cps
      val prefix = new Array[Int](cps.length + 1)
      var i = 0
      while (i < cps.length) { prefix(i + 1) = prefix(i) + cps(i).length; i += 1 }
      var s = 0
      while (s < cps.length) {
        var e = s + 1
        while (e <= math.min(cps.length, s + maxPieceLen)) {
          val piece = word.substring(prefix(s), prefix(e))
          subCounts.update(piece, subCounts.getOrElse(piece, 0L) + nW)
          e += 1
        }
        s += 1
      }
    }
    val chars = charSet.toVector
    require(vocabSize > chars.size,
      s"vocabSize=$vocabSize must exceed the ${chars.size} distinct code " +
        "points (single characters are always retained for coverage)")
    val targetMulti = vocabSize - chars.size
    // deterministic seed order: count desc, piece asc
    var multi: Vector[String] = subCounts.iterator
      .filter { case (p, _) => codePoints(p).length >= 2 }
      .toVector.sortBy { case (p, c) => (-c, p) }
      .take(targetMulti * seedMultiple).map(_._1)
    var counts: mutable.HashMap[String, Long] =
      mutable.HashMap((chars ++ multi).map(p => p -> subCounts.getOrElse(p, 0L)): _*)

    def emPass(vocabPieces: Vector[String]): mutable.HashMap[String, Long] = {
      val total = math.max(1L, vocabPieces.iterator.map(counts.getOrElse(_, 0L)).sum)
      val scores = new java.util.HashMap[String, java.lang.Long](vocabPieces.size * 2)
      vocabPieces.foreach(p => scores.put(p,
        java.lang.Long.valueOf(logpMicro(counts.getOrElse(p, 0L), total, vocabPieces.size))))
      val unk = logpMicro(0L, total, vocabPieces.size) - 10000000L
      val used = mutable.HashMap.empty[String, Long]
      table.foreach { case (word, nW) =>
        viterbi(word, scores, maxPieceLen, unk).foreach(p =>
          used.update(p, used.getOrElse(p, 0L) + nW))
      }
      used
    }

    // --- prune rounds: EM, then keep the best-used multi-char pieces
    var done = false
    while (!done) {
      var r = 0
      while (r < emRounds) {
        counts = emPass(chars ++ multi)
        r += 1
      }
      if (multi.size <= targetMulti) done = true
      else {
        // shrink by 1/4 per round (SentencePiece's default posture), never
        // below the target; zero-usage pieces drop immediately
        val keep = math.max(targetMulti, multi.size * 3 / 4)
        val ranked = multi.map(p => (p, counts.getOrElse(p, 0L)))
          .filter(_._2 > 0L)
          .sortBy { case (p, c) => (-c, p) }
        multi = ranked.take(keep).map(_._1)
      }
    }
    val finalPieces = chars ++ multi
    val finalCounts = counts
    val total = math.max(1L, finalPieces.iterator.map(finalCounts.getOrElse(_, 0L)).sum)
    finalPieces.map(p =>
      (p, logpMicro(finalCounts.getOrElse(p, 0L), total, finalPieces.size)))
      .toDF("piece", "logp_micro")
  }

  /** FULLY-DISTRIBUTED trainer: same algorithm, same integer statistics,
    * same tie-breaks as [[train]] — the (word, count) table never reaches
    * the driver, so there is no `maxWords` bound at all. Every driver-side
    * structure is VOCABULARY-bounded:
    *
    *  - the substring seed is a distributed explode ([[UnigramSubstringsExpr]],
    *    native expression — every occurrence position counts, matching the
    *    driver loop's multiplicity) + groupBy-sum; only the top
    *    `targetMulti × seedMultiple` multi-char pieces (count desc, piece
    *    asc — the same total order) and the observed code points (alphabet-
    *    bounded) are collected;
    *  - each hard-EM pass ships the current vocab's scores to executors as
    *    an expression literal (vocab-bounded, the [[encode]] shape), runs
    *    the SAME integer Viterbi per word ([[UnigramWordPiecesExpr]]), and
    *    collects only the per-piece usage sums — ≤ vocab rows, since the
    *    vocab always contains every observed code point (total coverage ⇒
    *    every emitted piece is a vocab member);
    *  - pruning is driver-side over those vocab-bounded maps, unchanged.
    *
    * Exact integer counts summed distributively + identical tie-breaks ⇒
    * the returned model is ROW-IDENTICAL to [[train]]'s on any corpus both
    * can run ([[UnigramTrainerSpec]] pins the equality; the
    * t_unigram_distributed_contract gate hash-checks it per round). Cost:
    * `emRounds × pruneRounds + 2` Spark jobs over the word table instead
    * of one collect — the right trade exactly when the distinct-word table
    * (a 100 TB crawl's typo/URL tail) exceeds driver heap; below that,
    * [[train]]'s single transfer is cheaper (SentencePiece's own posture).
    */
  def trainDistributed(
      docs: DataFrame, textCol: String, vocabSize: Int,
      minCount: Long = 1L, maxPieceLen: Int = 8, emRounds: Int = 2,
      seedMultiple: Int = 4): DataFrame = {
    require(vocabSize > 0 && maxPieceLen >= 1 && emRounds >= 1 && seedMultiple >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    import scala.collection.mutable
    val wc = graft.CacheScope.localCheckpoint(
      BpeTrainer.wordCounts(docs, textCol).filter(col("n") >= minCount)
        .select(col("word"), col("n")))
    try {
      val sub = graft.CacheScope.localCheckpoint(
        wc.select(col("n"),
            explode(Bridge.column(UnigramSubstringsExpr(
              Bridge.expression(col("word")), maxPieceLen))).as("s"))
          .groupBy(col("s.piece").as("piece"), col("s.cp_len").as("cp_len"))
          .agg(sum(col("n")).as("c")))
      try {
        val chars: Vector[(String, Long)] = sub.filter(col("cp_len") === 1)
          .select(col("piece"), col("c")).as[(String, Long)]
          .collect().sortBy(_._1).toVector
        require(vocabSize > chars.size,
          s"vocabSize=$vocabSize must exceed the ${chars.size} distinct code " +
            "points (single characters are always retained for coverage)")
        val targetMulti = vocabSize - chars.size
        val seedMulti: Vector[(String, Long)] = sub.filter(col("cp_len") >= 2)
          .orderBy(col("c").desc, col("piece").asc)
          .limit(targetMulti * seedMultiple)
          .select(col("piece"), col("c")).as[(String, Long)]
          .collect().toVector
        var multi: Vector[String] = seedMulti.map(_._1)
        var counts: mutable.HashMap[String, Long] =
          mutable.HashMap((chars ++ seedMulti): _*)
        val charPieces = chars.map(_._1)

        def emPass(vocabPieces: Vector[String]): mutable.HashMap[String, Long] = {
          val total = math.max(1L,
            vocabPieces.iterator.map(counts.getOrElse(_, 0L)).sum)
          val scored = vocabPieces.map(p =>
            (p, logpMicro(counts.getOrElse(p, 0L), total, vocabPieces.size)))
          val unk = logpMicro(0L, total, vocabPieces.size) - 10000000L
          val used = wc.select(col("n"),
              explode(Bridge.column(UnigramWordPiecesExpr(
                Bridge.expression(col("word")), scored, maxPieceLen, unk))).as("piece"))
            .groupBy(col("piece")).agg(sum(col("n")).as("u"))
            .as[(String, Long)].collect() // ≤ vocab rows (coverage)
          mutable.HashMap(used: _*)
        }

        var done = false
        while (!done) {
          var r = 0
          while (r < emRounds) {
            counts = emPass(charPieces ++ multi)
            r += 1
          }
          if (multi.size <= targetMulti) done = true
          else {
            val keep = math.max(targetMulti, multi.size * 3 / 4)
            val ranked = multi.map(p => (p, counts.getOrElse(p, 0L)))
              .filter(_._2 > 0L)
              .sortBy { case (p, c) => (-c, p) }
            multi = ranked.take(keep).map(_._1)
          }
        }
        val finalPieces = charPieces ++ multi
        val total = math.max(1L,
          finalPieces.iterator.map(counts.getOrElse(_, 0L)).sum)
        finalPieces.map(p =>
          (p, logpMicro(counts.getOrElse(p, 0L), total, finalPieces.size)))
          .toDF("piece", "logp_micro")
      } finally graft.CacheScope.unpersistCheckpoint(sub)
    } finally graft.CacheScope.unpersistCheckpoint(wc)
  }

  /** Model symmetric difference — the trainer-equivalence contract face:
    * rows learned by exactly one of [[train]] / [[trainDistributed]],
    * tagged by source; provably empty whenever both can run.
    */
  def distributedTrainViolations(
      docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, emRounds: Int = 2,
      seedMultiple: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def rows(df: DataFrame): Set[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet // ≤ vocab rows
    val drv = rows(train(docs, textCol, vocabSize,
      maxPieceLen = maxPieceLen, emRounds = emRounds, seedMultiple = seedMultiple))
    val dst = rows(trainDistributed(docs, textCol, vocabSize,
      maxPieceLen = maxPieceLen, emRounds = emRounds, seedMultiple = seedMultiple))
    val diff =
      (drv -- dst).toSeq.map(t => ("train", t._1, t._2)) ++
        (dst -- drv).toSeq.map(t => ("trainDistributed", t._1, t._2))
    diff.sortBy(t => (t._1, t._2)).toDF("src", "piece", "logp_micro")
  }

  def writeModel(model: DataFrame, path: String): Unit =
    model.coalesce(1).write.mode("overwrite").parquet(path)

  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, Long)] =
    spark.read.parquet(path).orderBy(col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Encode a token array into unigram pieces (flattened across words) —
    * a native expression, same shape as [[BpeTrainer.encodeSymbols]].
    */
  def encode(tokens: Column, vocab: Seq[(String, Long)], maxPieceLen: Int = 8): Column =
    Bridge.column(UnigramEncodeExpr(Bridge.expression(tokens), vocab, maxPieceLen))

  /** Round-trip violations: docs whose concatenated pieces differ from
    * their concatenated tokens — provably empty for ANY model/corpus by
    * the coverage construction; the gate hash-checks the emptiness.
    */
  def roundTripViolations(
      docs: DataFrame, textCol: String, idCol: String,
      vocab: Seq[(String, Long)], maxPieceLen: Int = 8): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol), toks.as("__tk"))
      .withColumn("__joined", concat_ws("", col("__tk")))
      .withColumn("__enc", concat_ws("", encode(col("__tk"), vocab, maxPieceLen)))
      .filter(col("__enc") =!= col("__joined"))
      .select(col(idCol))
  }

  /** All substrings of a word up to `maxPieceLen` code points, one element
    * PER OCCURRENCE POSITION (matching the driver trainer's seed loop
    * multiplicity), with the code-point length alongside so the seed can
    * split chars from multi-char candidates without re-parsing. Native
    * expression — the seed explode is the hottest distributed stage of
    * [[trainDistributed]].
    */
  case class UnigramSubstringsExpr(child: Expression, maxPieceLen: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cp_len",
          org.apache.spark.sql.types.IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "graft_unigram_substrings"

    protected override def nullSafeEval(input: Any): Any = {
      val word = input.asInstanceOf[UTF8String].toString
      val cps = codePoints(word)
      val n = cps.length
      val prefix = new Array[Int](n + 1)
      var i = 0
      while (i < n) { prefix(i + 1) = prefix(i) + cps(i).length; i += 1 }
      val out = new java.util.ArrayList[Any]()
      var s = 0
      while (s < n) {
        var e = s + 1
        while (e <= math.min(n, s + maxPieceLen)) {
          out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](UTF8String.fromString(word.substring(prefix(s), prefix(e))),
              e - s)))
          e += 1
        }
        s += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): UnigramSubstringsExpr =
      copy(child = c)
  }

  /** Viterbi pieces of ONE word under an explicit (vocab, unk) scoring —
    * the distributed EM pass's per-word kernel, sharing [[viterbi]] with
    * the driver trainer so the two trainers cannot disagree on
    * segmentation. Differs from [[UnigramEncodeExpr]] in taking the word
    * directly (not a token array) and the EM pass's exact unk score.
    */
  case class UnigramWordPiecesExpr(
      child: Expression, vocab: Seq[(String, Long)], maxPieceLen: Int,
      unkMicro: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_unigram_word_pieces"

    @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (p, lp) => m.put(p, java.lang.Long.valueOf(lp)) }
      m
    }

    protected override def nullSafeEval(input: Any): Any = {
      val pieces = viterbi(input.asInstanceOf[UTF8String].toString,
        scores, maxPieceLen, unkMicro)
      new GenericArrayData(pieces.map(p => UTF8String.fromString(p): Any))
    }

    override protected def withNewChildInternal(c: Expression): UnigramWordPiecesExpr =
      copy(child = c)
  }

  case class UnigramEncodeExpr(
      child: Expression, vocab: Seq[(String, Long)], maxPieceLen: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_unigram_encode"

    @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
      vocab.foreach { case (p, lp) => m.put(p, java.lang.Long.valueOf(lp)) }
      m
    }
    @transient private lazy val unkMicro: Long =
      (if (vocab.isEmpty) 0L else vocab.iterator.map(_._2).min) - 10000000L

    protected override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = new java.util.ArrayList[Any]()
      var w = 0
      while (w < arr.numElements()) {
        viterbi(arr.getUTF8String(w).toString, scores, maxPieceLen, unkMicro)
          .foreach(p => out.add(UTF8String.fromString(p)))
        w += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): UnigramEncodeExpr =
      copy(child = c)
  }
}
