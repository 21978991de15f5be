package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{CascadeImpl, TextImpl}

/** Static-call bridges for the pipeline's scalar expressions (see
  * graft.ops.TextImpl / CascadeImpl for semantics + reference citations).
  * All scalar string ops generate a single static call, staying inside
  * whole-stage codegen.
  */
object PipelineImplBridge {
  def backgroundPassage(chunk: UTF8String, backgroundOnly: Boolean): UTF8String = {
    val r = CascadeImpl.backgroundPassage(chunk.toString, backgroundOnly)
    if (r == null) null else UTF8String.fromString(r)
  }
  def extractOrgs(text: UTF8String): ArrayData =
    ArrayData.toArrayData(
      TextImpl.extractOrgs(text.toString).map(UTF8String.fromString).toArray)
  def pseudoEmbedding(text: UTF8String, dim: Int): ArrayData =
    ArrayData.toArrayData(TextImpl.pseudoEmbedding(text.toString, dim))
  def y4mLumaSums(payload: Array[Byte]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      graft.ops.Multimodal.y4mLumaSumArray(payload))
  def wavEnergyWindows(payload: Array[Byte], windowFrames: Int): ArrayData = {
    val rows = graft.ops.Multimodal.wavEnergyWindows(payload, windowFrames)
      .map { case (_, e, nf) => // window index = array position
        new GenericInternalRow(Array[Any](e, nf))
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.toArray[Any])
  }
}

abstract class StaticStringUnary extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  protected def staticCall: String // e.g. "graft.ops.TextImpl.dedupLines"
  override def nullSafeEval(s: Any): Any = evalString(s.asInstanceOf[UTF8String])
  protected def evalString(s: UTF8String): UTF8String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"$staticCall($s)")
}

/** F5: company-name normalization ("all but last word" + domain merge). */
case class CompanyNameNorm(child: Expression) extends StaticStringUnary {
  override protected def staticCall = "graft.ops.TextImpl.normalizeCompanyName"
  override protected def evalString(s: UTF8String) = TextImpl.normalizeCompanyName(s)
  override def prettyName: String = "company_name_norm"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** F7: HTML -> text (text nodes joined by newline). */
case class HtmlToText(child: Expression) extends StaticStringUnary {
  override protected def staticCall = "graft.ops.TextImpl.htmlToText"
  override protected def evalString(s: UTF8String) = TextImpl.htmlToText(s)
  override def prettyName: String = "html_to_text"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** U3: order-preserving line dedup (keeps blanks). */
case class DedupLines(child: Expression) extends StaticStringUnary {
  override protected def staticCall = "graft.ops.TextImpl.dedupLines"
  override protected def evalString(s: UTF8String) = TextImpl.dedupLines(s)
  override def prettyName: String = "dedup_lines"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** T3-T6 cascade: null unless the chunk contains a Background-section
  * header that survives title/TOC/length heuristics; otherwise the promoted
  * passage text. */
case class BackgroundPassage(child: Expression, backgroundOnly: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(s: Any): Any =
    PipelineImplBridge.backgroundPassage(s.asInstanceOf[UTF8String], backgroundOnly)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.PipelineImplBridge.backgroundPassage($c, $backgroundOnly);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override def prettyName: String = "background_passage"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** X4 test-grade NER: ORG-like capitalized runs ending in a corporate
  * suffix. */
case class ExtractOrgs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    PipelineImplBridge.extractOrgs(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.PipelineImplBridge.extractOrgs($s)")
  override def prettyName: String = "extract_orgs"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Fixed-point dot product of two float arrays:
  * `sum(round(a_i * b_i * 1e6))` accumulated as long — the deterministic
  * cross-engine similarity kernel. A direct loop over `ArrayData` with no
  * intermediate array, unlike the equivalent `aggregate(zip_with(...))`
  * higher-order pipeline (~20x less allocation on all-pairs scans).
  * Rounding is ties-away-from-zero on the binary double, matching both
  * Spark's `round` and DuckDB's `round` on every representable value.
  */
case class ScaledDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    graft.ops.VecImpl.scaledDot(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.ops.VecImpl.scaledDot($l, $r)")
  override def prettyName: String = "scaled_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** F17: mojibake remap + Unicode quote folding. */
case class NormalizeQuotes(child: Expression) extends StaticStringUnary {
  override protected def staticCall = "graft.ops.TextImpl.normalizeQuotes"
  override protected def evalString(s: UTF8String) = TextImpl.normalizeQuotes(s)
  override def prettyName: String = "normalize_quotes"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Whole Cavnar-Trenkle language classification as one per-row call (see
  * graft.ops.LangIdNgram.classifyKernel) — the map-stage alternative to
  * the relational explode/groupBy/window plan, proven equivalent by the
  * shared DuckDB twin. NULL for texts too short to carry a trigram. */
case class LangIdNgramExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("pred_lang", StringType, nullable = false),
    StructField("best_dist", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(s: Any): Any =
    graft.ops.LangIdNgram.classifyRow(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = graft.ops.LangIdNgram.classifyRow($s);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override def prettyName: String = "langid_ngram"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Fused PQ encoder (see graft.ops.VecImpl.pqEncode): one static call per
  * target vector instead of a subspaces x cells ScaledDot/slice expression
  * tree — the tree version generated ~256 expression nodes at the default
  * geometry, blowing the generated method past JIT-friendly size on the
  * coded-scan hot path. The codebook rides as a codegen reference object. */
case class PqEncode(child: Expression, cbs: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(cbs.nonEmpty && cbs.forall(_.nonEmpty))
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    graft.ops.VecImpl.pqEncode(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], cbs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebooks", cbs, "float[][][]")
    defineCodeGen(ctx, ev, v => s"graft.ops.VecImpl.pqEncode($v, $ref)")
  }
  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-row MinHash signature: `numHashes` permutation minima over k-char
  * shingles, computed in ONE pass over the string — turns signature
  * generation into a map-side scalar op (no shingle explode, no shuffle). */
case class MinHashSig(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && numHashes > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      TextImpl.minhashSig(s.asInstanceOf[UTF8String], k, numHashes))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.ops.TextImpl.minhashSig($s, $k, $numHashes))")
  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Distinct word n-gram shingle hashes of a normalized (single-spaced)
  * string — the one-pass, allocation-free candidate-key generator for the
  * exact Jaccard dedup (see TextImpl.wordShingleHashes). */
/** Greedy merges-table BPE token count over whitespace words (the real
  * tokenizer, committed fixture — see graft.ops.BpeImpl for semantics and
  * the rank-order == classical-BPE argument). Single static call, stays
  * inside whole-stage codegen. */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    graft.ops.BpeImpl.tokenCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ops.BpeImpl.tokenCount($s)")
  override def prettyName: String = "bpe_token_count"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Real PNG payload from a text column: dims derived from the code-point
  * length (graft.ops.Multimodal.imageDims), bytes a spec-valid PNG
  * (signature/IHDR/deflated IDAT/CRCs — Multimodal.pngEncode). Keeps the
  * media-table synthesis fully relational (no typed map in the plan). */
case class PngPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(s: Any): Any =
    graft.ops.Multimodal.pngPayloadOf(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ops.Multimodal.pngPayloadOf($s)")
  override def prettyName: String = "png_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Real WAV payload from a text column: params derived from the
  * code-point length (graft.ops.Multimodal.audioParams), bytes a
  * spec-valid RIFF/WAVE PCM16 file (Multimodal.wavEncode). The audio
  * sibling of [[PngPayload]] — keeps the media-table synthesis fully
  * relational. */
case class WavPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(s: Any): Any =
    graft.ops.Multimodal.wavPayloadOf(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ops.Multimodal.wavPayloadOf($s)")
  override def prettyName: String = "wav_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Real YUV4MPEG2 payload from a text column: params derived from the
  * code-point length (graft.ops.Multimodal.videoParams), bytes a
  * spec-valid Y4M stream (Multimodal.y4mEncode — ASCII header +
  * FRAME-marked raw 4:2:0 planes). The video sibling of [[PngPayload]]
  * and [[WavPayload]] — keeps the media-table synthesis fully
  * relational. */
case class Y4mPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(s: Any): Any =
    graft.ops.Multimodal.y4mPayloadOf(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ops.Multimodal.y4mPayloadOf($s)")
  override def prettyName: String = "y4m_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Image-dedup fixture PNG from a doc_id column
  * (graft.ops.Multimodal.dedupPngPayloadOf: class-keyed dims + pixels,
  * all five scanline filters). Keeps the dedup-fixture synthesis fully
  * relational — no typed map, no Tungsten->object serde in the plan. */
case class DedupPngPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    graft.ops.Multimodal.dedupPngPayloadOf(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.ops.Multimodal.dedupPngPayloadOf($id)")
  override def prettyName: String = "dedup_png_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** ADAM7-INTERLACED PNG fixture payload from a doc_id column: the same
  * image-dedup fixture pixels as [[DedupPngPayload]] in the progressive
  * wire layout (seven scattered, independently-filtered passes) real
  * interlaced PNGs carry — PNG is lossless, so the gate shares the
  * closed-form pixel oracle and pins the Adam7 decode path. */
case class DedupPngAdam7Payload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    graft.ops.Multimodal.dedupPngAdam7PayloadOf(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"graft.ops.Multimodal.dedupPngAdam7PayloadOf($id)")
  override def prettyName: String = "dedup_png_adam7_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Audio-dedup fixture WAV from a doc_id column — the RIFF/WAVE sibling
  * of [[DedupPngPayload]]. */
case class DedupWavPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    graft.ops.Multimodal.dedupWavPayloadOf(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.ops.Multimodal.dedupWavPayloadOf($id)")
  override def prettyName: String = "dedup_wav_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** gzip wire bytes of a text column, produced by the JDK's INDEPENDENT
  * GZIPOutputStream — the foreign transfer encoding a crawler receives
  * for text bodies; [[GunzipText]] is the hand-rolled decode that must
  * read it back. */
case class GzipPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(s: Any): Any =
    graft.ops.Inflate.gzipOf(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ops.Inflate.gzipOf($s)")
  override def prettyName: String = "gzip_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Hand-rolled RFC 1952 gunzip of a binary column back to text: member
  * header walk (FLG-gated optional fields), RFC 1951 inflate
  * (graft.ops.Inflate — stored/fixed/dynamic Huffman), CRC-32 + ISIZE
  * verification, multi-member concatenation. */
case class GunzipText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(b: Any): Any =
    graft.ops.Inflate.gunzipText(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.ops.Inflate.gunzipText($b)")
  override def prettyName: String = "gunzip_text"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** JPEG-dedup fixture payload from a doc_id column: a real baseline
  * sequential grayscale JPEG (graft.ops.Jpeg.encodeGray — Annex K
  * Huffman tables, zigzag, byte stuffing) of the block-constant fixture
  * image, whose DCT round-trip is bit-exact. The JPEG sibling of
  * [[DedupPngPayload]]. */
case class DedupJpegPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    graft.ops.Jpeg.dedupJpegPayloadOf(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id => s"graft.ops.Jpeg.dedupJpegPayloadOf($id)")
  override def prettyName: String = "dedup_jpeg_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** PROGRESSIVE (SOF2) JPEG fixture payload from a doc_id column: the
  * grayscale dedup block formula through the 6-scan spectral-selection
  * + successive-approximation script (graft.ops.Jpeg
  * .encodeProgressiveGray). Decoded pixels equal the baseline
  * fixture's exactly — the progressive gate pins the Annex G decode
  * path (DC/AC first scans, EOB runs, correction-bit refinements)
  * against the SAME closed-form oracle as [[DedupJpegPayload]]. */
case class DedupJpegProgPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    graft.ops.Jpeg.dedupJpegProgPayloadOf(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"graft.ops.Jpeg.dedupJpegProgPayloadOf($id)")
  override def prettyName: String = "dedup_jpeg_prog_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** COLOUR JPEG fixture payload from a doc_id column: a real 3-component
  * 4:4:4 baseline JPEG (graft.ops.Jpeg.encodeColorYcc — chroma
  * quant/Huffman tables, interleaved MCUs, per-component DC
  * prediction) of the block-constant YCbCr fixture. */
case class DedupJpegColorPayload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    graft.ops.Jpeg.dedupJpegColorPayloadOf(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"graft.ops.Jpeg.dedupJpegColorPayloadOf($id)")
  override def prettyName: String = "dedup_jpeg_color_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 4:2:0 CHROMA-SUBSAMPLED colour JPEG fixture payload from a doc_id
  * column (graft.ops.Jpeg.encodeColorYcc420 — Y at 2x2 sampling, Cb/Cr
  * quarter-resolution, the default layout real encoders emit).
  * [[JpegColorDHash]] decodes it through the same expression as 4:4:4:
  * the decoder reads the sampling factors from the frame header. */
case class DedupJpeg420Payload(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    graft.ops.Jpeg.dedupJpeg420PayloadOf(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, id =>
      s"graft.ops.Jpeg.dedupJpeg420PayloadOf($id)")
  override def prettyName: String = "dedup_jpeg420_payload"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit perceptual dHash of a REAL colour JPEG payload: interleaved
  * 3-component entropy decode + per-plane IDCT + the exact fixed-point
  * BT.601 inverse transform (graft.ops.Jpeg.pixelsColor), then the
  * pngDHash luma formula over the RGB pixels. */
case class JpegColorDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    graft.ops.Jpeg.jpegColorDHash(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.ops.Jpeg.jpegColorDHash($b)")
  override def prettyName: String = "jpeg_color_dhash"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit perceptual dHash of a REAL baseline JPEG payload: marker walk
  * + Huffman/DC-prediction entropy decode + dequant + IDCT
  * (graft.ops.Jpeg.pixelsGray), then the exact-integer 9x8 block-mean
  * difference hash. One static call, whole decode inside codegen. */
case class JpegDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    graft.ops.Jpeg.jpegDHash(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.ops.Jpeg.jpegDHash($b)")
  override def prettyName: String = "jpeg_dhash"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit perceptual dHash of a REAL PNG payload: full chunk-walk + CRC
  * + inflate + un-filter decode (graft.ops.Multimodal.pngPixels), then
  * the exact-integer 9x8 block-mean difference hash
  * (Multimodal.pngDHash). One static call — the whole decode+hash
  * lineage stays inside whole-stage codegen instead of paying a
  * Tungsten->JVM-object round trip through Dataset.map. */
case class PngDHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    graft.ops.Multimodal.pngDHash(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.ops.Multimodal.pngDHash($b)")
  override def prettyName: String = "png_dhash"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit perceptual fingerprint of a REAL WAV payload: RIFF chunk walk
  * + PCM16 sample decode + the exact-integer 65-window energy-contour
  * hash (graft.ops.Multimodal.wavFingerprint). The audio sibling of
  * [[PngDHash]]. */
case class WavFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    graft.ops.Multimodal.wavFingerprint(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.ops.Multimodal.wavFingerprint($b)")
  override def prettyName: String = "wav_fingerprint"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-window PCM16 energy of a REAL WAV payload as
  * array<struct<energy:bigint, n_frames:int>> (window index = array
  * position; graft.ops.Multimodal.wavEnergyWindows walks the RIFF
  * chunks and folds exact per-window sum-of-|sample|). posexplode
  * recovers the (win_idx, energy, n_frames) rows relationally — the
  * audio-plane sibling of [[Y4mLumaSumArray]]. */
case class WavEnergyWindows(child: Expression, windowFrames: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("energy", LongType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(b: Any): Any =
    PipelineImplBridge.wavEnergyWindows(b.asInstanceOf[Array[Byte]],
      windowFrames)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"org.apache.spark.sql.graft.PipelineImplBridge" +
        s".wavEnergyWindows($b, $windowFrames)")
  override def prettyName: String = "wav_energy_windows"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-frame Y-plane luma sums of a REAL Y4M payload as array<bigint>
  * (frame index = array position; graft.ops.Multimodal.y4mLumaSumArray
  * walks the FRAME markers and sums plane bytes). posexplode recovers
  * the (frame_idx, luma_sum) rows relationally — the video sibling of
  * [[PngDHash]]/[[WavFingerprint]]. */
case class Y4mLumaSumArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(b: Any): Any =
    PipelineImplBridge.y4mLumaSums(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"org.apache.spark.sql.graft.PipelineImplBridge.y4mLumaSums($b)")
  override def prettyName: String = "y4m_luma_sums"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Token count under a LEARNED merges table (BpeTrain.train output,
  * flattened [a0,b0,a1,b1,...] in rank order) — the kernel path of the
  * trained tokenizer, complement of the committed-fixture
  * [[BpeTokenCount]]. The table rides as a codegen reference object
  * serialized with the expression, so executors get it without any
  * driver-side registry (the PqEncode codebook pattern). */
case class BpeLearnedTokenCount(child: Expression, merges: Array[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(merges.nonEmpty && merges.length % 2 == 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    graft.ops.BpeImpl.learnedTokenCount(s.asInstanceOf[UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeLearnedMerges", merges, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      s => s"graft.ops.BpeImpl.learnedTokenCount($s, $ref)")
  }
  override def prettyName: String = "bpe_learned_token_count"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      TextImpl.wordShingleHashes(s.asInstanceOf[UTF8String], n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.ops.TextImpl.wordShingleHashes($s, $n))")
  override def prettyName: String = "word_shingle_hashes"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Exact k-shingle Jaccard of two strings (pairwise verify kernel). */
case class ShingleJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextImpl.shingleJaccard(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.ops.TextImpl.shingleJaccard($l, $r, $k)")
  override def prettyName: String = "shingle_jaccard"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 64-bit SimHash over whitespace tokens (Charikar sketch; dedup family). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    TextImpl.simhash64(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ops.TextImpl.simhash64($s)")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Bounded id-list aggregate: collects at most `limit`+1 longs per group
  * and returns NULL once the group exceeds `limit` — the memory-safe form
  * of `collect_list` for df-capped candidate generation (a plain
  * collect-then-filter would materialize a hot key's entire multi-million
  * id list before dropping it; this buffer never exceeds limit+1 entries,
  * map-side partials included). Result ids are sorted for deterministic
  * downstream pair generation. */
case class BoundedLongList(child: Expression, limit: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]]
    with ImplicitCastInputTypes { // narrower integral ids widen to long
  require(limit > 0)
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty[Long]

  override def update(buf: scala.collection.mutable.ArrayBuffer[Long],
      input: org.apache.spark.sql.catalyst.InternalRow):
      scala.collection.mutable.ArrayBuffer[Long] = {
    val v = child.eval(input)
    // saturation: once past limit, stop growing — length limit+1 encodes
    // "more than limit members", which is all eval() needs to know
    if (v != null && buf.length <= limit) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(b1: scala.collection.mutable.ArrayBuffer[Long],
      b2: scala.collection.mutable.ArrayBuffer[Long]):
      scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < b2.length && b1.length <= limit) { b1 += b2(i); i += 1 }
    b1
  }

  override def eval(buf: scala.collection.mutable.ArrayBuffer[Long]): Any =
    if (buf.length > limit) null
    else org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(buf.toArray.sorted)

  override def serialize(buf: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (bb.remaining() >= 8) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedLongList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedLongList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedLongList =
    copy(child = newChildren.head)
  override def prettyName: String = "bounded_long_list"
}

/** T8 hermetic embedder stub: deterministic 3-gram feature-hash unit vector
  * (swap for a real service client via graft.io.Embedder at deploy time). */
case class PseudoEmbedding(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0, s"invalid pseudo_embedding dim $dim")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    PipelineImplBridge.pseudoEmbedding(s.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.PipelineImplBridge.pseudoEmbedding($s, $dim)")
  override def prettyName: String = "pseudo_embedding"
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
