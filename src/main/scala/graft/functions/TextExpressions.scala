package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-shingles of a text column, as a single native
  * expression.
  *
  * Replaces the composed
  * `array_distinct(transform(sequence(...), i -> concat_ws(element_at...)))`
  * pipeline: higher-order functions are CodegenFallback, so that chain
  * walks an interpreted expression tree with boxing for every shingle of
  * every row. This expression does the same work in one compiled pass over
  * the row's `UTF8String` (split → sliding concat → hash-set distinct) —
  * order-preserving first-occurrence distinct, identical output.
  * (CodegenFallback itself, but ONE virtual call per row; the loop body is
  * plain JVM code the JIT compiles.)
  *
  * Reference: Presto's `ngrams()` (`presto-main/.../scalar/ArrayFunctions`)
  * + `split` — same shingle semantics the dedup pipeline composes there.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + k <= words.length) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) {
        parts(j) = words(i + j)
        j += 1
      }
      out.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All word k-grams of a text column IN ORDER WITH MULTIPLICITY — the
  * repetition-analysis sibling of [[WordShingles]] (which dedups, and so
  * can't feed duplicate-fraction / top-n-gram counts). Same single-pass
  * native loop replacing the interpreted
  * `transform(sequence(...), i -> concat(...))` chain (measured 2.1 s →
  * interpreted HOFs on 500 docs in qh3; SURVEY §2.4's known fallback). */
case class WordNgrams(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"ngram size must be >= 1, got $k")

  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val n = math.max(0, words.length - k + 1)
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) {
        parts(j) = words(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One BPE merge pass (Sennrich et al. 2016, arXiv:1508.07909 — the
  * byte-pair-encoding subword algorithm): over a space-joined symbol
  * sequence, merge every LEFT-TO-RIGHT non-overlapping occurrence of the
  * adjacent pair (a, b) into the single symbol a+b. Greedy semantics via
  * a single fold — after a merge the accumulated tail token is `ab`,
  * which no longer matches `a`, so "l l l" under pair (l, l) yields
  * "ll l", exactly the reference algorithm's scan. The training loop
  * (queries/TextAnalysis q1a) applies one pass per learned merge; the
  * DuckDB oracle replays the identical fold with list_reduce. */
case class BpeMergePass(child: Expression, a: String, b: String)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bpe_merge_pass"
  override def dataType: DataType = StringType

  private val merged = a + b

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (out.nonEmpty && out.last == a && toks(i) == b)
        out(out.length - 1) = merged
      else out += toks(i)
      i += 1
    }
    UTF8String.fromString(out.mkString(" "))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Presto `hamming_distance(s1, s2)` (`StringFunctions.java`): number of
  * differing code points; inputs must have equal code-point length, as in
  * the reference. Static-call codegen like WordStem — one compiled call
  * per row, no interpreted fallback. */
case class HammingDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "hamming_distance"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("hamming_distance expects two string arguments")

  override def nullSafeEval(a: Any, b: Any): Any =
    TextExpressions.hammingDistance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextExpressions.hammingDistance($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `chunk_text(text, chunk, overlap)` — token-bounded document
  * chunking with overlap, the RAG-ingest sibling of sequence packing
  * (packing concatenates documents into budgets; chunking SPLITS one
  * document into retrieval units): word windows of `chunk` tokens
  * starting every `chunk - overlap` words, so adjacent chunks share
  * `overlap` words of context; the final window may run short, and a
  * start past the end emits nothing. One compiled pass per row like
  * [[WordShingles]]; deterministic, so the oracle replays chunk counts
  * and word totals exactly. */
case class ChunkText(child: Expression, chunk: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback {

  require(chunk >= 1, s"chunk size must be >= 1, got $chunk")
  require(overlap >= 0 && overlap < chunk,
    s"overlap must be in [0, chunk), got $overlap")

  override def prettyName: String = "chunk_text"
  override def dataType: DataType = ArrayType(StringType)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val step = chunk - overlap
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < words.length) {
      val n = math.min(chunk, words.length - i)
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words(i + j); j += 1 }
      out += UTF8String.concatWs(space, parts: _*)
      // a tail already fully covered by the previous chunk stops the
      // walk (emitting it would duplicate pure-overlap content)
      i = if (i + chunk >= words.length) words.length else i + step
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `gzip(binary) -> binary` — deterministic GZIP compression (Java's
  * writer emits a fixed header: MTIME 0, no OS/XFL variance), for the
  * compressed-text-column storage pattern every corpus pipeline hits
  * (store documents gzipped, decompress in the scan projection). */
case class GzipCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "gzip"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(v.asInstanceOf[Array[Byte]]); gz.close()
    bos.toByteArray
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `gunzip(binary) -> binary` — NULL on bytes that are not a valid
  * GZIP stream (corrupt blobs must not kill a scan; wrap the NULL in
  * a loud check when corruption should stop the job). */
case class GzipDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "gunzip"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      in.close()
      bos.toByteArray
    } catch { case _: java.io.IOException => null }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `zstd(binary) -> binary` — Zstandard compression via the zstd-jni
  * that ships with Spark's own codecs (level 3, the library default;
  * deterministic for a fixed level/library). The modern corpus-storage
  * codec next to [[GzipCompress]]. */
case class ZstdCompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "zstd"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    com.github.luben.zstd.Zstd.compress(v.asInstanceOf[Array[Byte]], 3)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `unzstd(binary) -> binary` — NULL on invalid frames (streamed, so
  * the original size need not be known). */
case class ZstdDecompress(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "unzstd"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${dt.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    try {
      val in = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]]))
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      in.close()
      bos.toByteArray
    } catch { case _: java.io.IOException => null }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** First 60 bits of md5 as a non-negative long — bit-identical to the
  * composed `conv(substring(md5(x), 1, 15), 16, 10)` (DuckDB:
  * `('0x'||substr(md5(x),1,15))::BIGINT`), without the per-row
  * `MessageDigest.getInstance` (a synchronized JCA provider lookup inside
  * commons-codec's DigestUtils, which Spark's `Md5` pays per call — 32
  * executor threads contend on it), the 32-char hex-string intermediate,
  * or the base-16 reparse. r17 OPT: the checksum aggregate and the
  * simhash feature hash spend their per-row time here (qe3's main
  * aggregation job measured 0.92 s with the composed chain). The 15 hex
  * chars are the top 60 bits of the first 8 digest bytes — the same
  * `(big >>> 4)` read [[MinHashBandKeys]] uses, differentially proven
  * against DuckDB since the q3x round. */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "md5_prefix60"
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string or binary, got ${t.catalogString}")
  }

  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var big = 0L
    var i = 0
    while (i < 8) { big = (big << 8) | (d(i) & 0xffL); i += 1 }
    big >>> 4
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash LSH band keys of a text column in ONE native pass — the
  * row-local hash pipeline of the online near-dup operator
  * (`streaming/StreamingNearDup.scala`). For each distinct word
  * k-shingle: one md5, its first 60 bits reduced mod P = 2^31-1; seed
  * i's hash is the universal-family remix `(a_i·base + b_i) mod P`
  * with a_i = (i+1)·2654435761 mod P, b_i = i·2654435789 mod P
  * (Fibonacci-hash constants — the multipliers must be LARGE: small
  * a_i mostly preserve the base ordering, collapsing a band's seeds
  * into one effective hash and dropping unrelated documents; measured
  * 20 of 44 drops at best-Jaccard < 0.1 with a_i = 2i+1, zero below
  * 0.9 with the spread constants. a_i, base < P < 2^31 keeps every
  * product inside 62 bits — replayable in DuckDB BIGINT arithmetic,
  * which ERRORS on overflow rather than wrapping); the signature is
  * the per-seed minimum, and bands of `numHashes / bands` consecutive
  * signature slots concatenate with ':' into the key strings.
  *
  * Why native: the composed form (12 × `transform(shingles, s ->
  * conv(substr(md5(concat(i,':',s)),1,15),16,10))` + array_min) is
  * CodegenFallback — an interpreted tree per seed per row that
  * re-evaluates the shingle array AND re-digests every shingle 12
  * times (measured 14.3 s on the 5000-doc fixture, single parquet
  * partition); this expression digests each shingle ONCE and does 12
  * long remixes (sub-second, same plan). NULL when the text has fewer
  * than k words — no shingles, no near-dup evidence. */
case class MinHashBandKeys(child: Expression, k: Int, numHashes: Int,
    bands: Int) extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")
  require(bands >= 1 && numHashes % bands == 0,
    s"numHashes ($numHashes) must split evenly into bands ($bands)")

  private val rowsPerBand = numHashes / bands
  private val P = 2147483647L // 2^31 - 1, prime
  private val aSeed = Array.tabulate(numHashes)(i => ((i + 1) * 2654435761L) % P)
  private val bSeed = Array.tabulate(numHashes)(i => (i * 2654435789L) % P)

  override def prettyName: String = "minhash_band_keys"
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true

  private val space = UTF8String.fromString(" ")

  // MessageDigest is stateful (not thread-safe) and getInstance is a
  // synchronized JCA provider lookup — once per task thread, not per
  // row; the distinct-shingle set is likewise reused and cleared.
  @transient private lazy val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  @transient private lazy val shingleSet =
    ThreadLocal.withInitial[java.util.HashSet[UTF8String]](() =>
      new java.util.HashSet[UTF8String]())

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    if (words.length < k) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val seen = shingleSet.get()
    seen.clear()
    val md = digest.get()
    var i = 0
    while (i + k <= words.length) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = words(i + j); j += 1 }
      val sh = UTF8String.concatWs(space, parts: _*)
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes)
        // first 15 hex chars of md5 = the top 60 bits of the first 8
        // bytes (DuckDB: ('0x'||substr(md5(f),1,15))::BIGINT)
        var big = 0L
        var b = 0
        while (b < 8) { big = (big << 8) | (d(b) & 0xffL); b += 1 }
        val base = (big >>> 4) % P
        var h = 0
        while (h < numHashes) {
          val v = (aSeed(h) * base + bSeed(h)) % P
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    val keys = new Array[AnyRef](bands)
    var band = 0
    while (band < bands) {
      val sb = new java.lang.StringBuilder()
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(':')
        sb.append(mins(band * rowsPerBand + r))
        r += 1
      }
      keys(band) = UTF8String.fromString(sb.toString)
      band += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextExpressions {
  def wordShingles(text: Column, k: Int): Column =
    ColumnBridge.toCol(WordShingles(ColumnBridge.toExpr(text), k))

  def md5Prefix60(c: Column): Column =
    ColumnBridge.toCol(Md5Prefix60(ColumnBridge.toExpr(c)))

  def minHashBandKeys(text: Column, k: Int, numHashes: Int,
      bands: Int): Column =
    ColumnBridge.toCol(
      MinHashBandKeys(ColumnBridge.toExpr(text), k, numHashes, bands))

  def hamming(a: Column, b: Column): Column =
    ColumnBridge.toCol(
      HammingDistance(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** Static entry point for generated code: code-point-wise difference
    * count, equal-length required (Presto contract). */
  def hammingDistance(a: UTF8String, b: UTF8String): Long = {
    val sa = a.toString
    val sb = b.toString
    var i = 0
    var j = 0
    var d = 0L
    while (i < sa.length && j < sb.length) {
      val ca = sa.codePointAt(i)
      val cb = sb.codePointAt(j)
      if (ca != cb) d += 1
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    if (i < sa.length || j < sb.length)
      throw new IllegalArgumentException(
        "hamming_distance: inputs must have the same length")
    d
  }
}
