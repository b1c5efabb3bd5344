package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for dynamic-JSON payload manipulation.
  *
  * The engine keeps KRM payloads as JSON strings (SURVEY.md §1.4) so the
  * schema stays stable at 100 TB. Spark's builtins cover scalar extraction
  * (`get_json_object`) but not *subtree* projection that preserves JSON
  * types (a string leaf must stay quoted, an object subtree must stay an
  * object) — which is exactly what the reference's nested-field projection
  * does (NestedFieldCopy→SetNestedField,
  * /root/reference/syncer/controllers/krmsyncer_controller.go:561-584).
  * These expressions implement that natively in the expression tree.
  *
  * They are CodegenFallback: per-row cost is dominated by the Jackson
  * parse either way; codegen'ing the dispatch would not change the
  * profile. They still participate in column pruning / filter pushdown
  * like any expression.
  */
object JsonFunctions {
  // Jackson is shipped with Spark itself (spark uses it for from_json et
  // al.), so this adds no dependency.
  private[functions] val mapper = new ObjectMapper()

  /** Project a set of dotted paths out of a JSON object document,
    * preserving JSON types and silently skipping missing paths
    * (reference semantics: found==false → skip). Returns null when
    * nothing was found (payload absent on the projected doc).
    */
  def projectPaths(json: String, paths: Seq[String]): String = {
    if (json == null) return null
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return null }
    if (!root.isObject) return null
    val out = mapper.createObjectNode()
    var any = false
    paths.foreach { p =>
      val parts = p.split('.')
      var node: JsonNode = root
      var ok = true
      parts.foreach { part =>
        if (ok && node != null && node.isObject && node.has(part)) node = node.get(part)
        else ok = false
      }
      if (ok && node != null) {
        // set nested: rebuild intermediate objects along the path
        var cursor = out
        parts.dropRight(1).foreach { part =>
          cursor = cursor.get(part) match {
            case o: ObjectNode => o
            case _ => val o = mapper.createObjectNode(); cursor.set(part, o); o
          }
        }
        cursor.set[JsonNode](parts.last, node.deepCopy[JsonNode]())
        any = true
      }
    }
    if (any) out.toString else null
  }

  /** Shallow field-level merge of two JSON objects: keys of `src`
    * overwrite keys of `dest`; keys only in `dest` are retained. This is
    * the batch-table equivalent of server-side-apply with ForceOwnership
    * (krmsyncer_controller.go:586-600): the projected fields are owned and
    * overwritten, everything else is left alone.
    */
  def mergeShallow(dest: String, src: String): String = {
    if (src == null) return dest
    if (dest == null) return src
    val d = try mapper.readTree(dest) catch { case _: Exception => return src }
    val s = try mapper.readTree(src) catch { case _: Exception => return dest }
    (d, s) match {
      case (dn: ObjectNode, sn: ObjectNode) =>
        val out = dn.deepCopy[ObjectNode]()
        val it = sn.fields()
        while (it.hasNext) { val e = it.next(); out.set[JsonNode](e.getKey, e.getValue) }
        out.toString
      case _ => src
    }
  }
}

/** `json_project(json, 'a.b,c')` — subtree projection of a dynamic JSON
  * payload (operator D10). The path list is a comma-separated foldable
  * string so the expression stays a simple binary node.
  */
case class JsonProjectExpr(json: Expression, pathsExpr: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = json
  override def right: Expression = pathsExpr
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_project"

  override def nullSafeEval(j: Any, p: Any): Any = {
    val paths = p.toString.split(',').toSeq.filter(_.nonEmpty)
    val out = JsonFunctions.projectPaths(j.toString, paths)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(json = l, pathsExpr = r)
}

/** `json_merge_shallow(dest, src)` — SSA-style field-subset merge (D12). */
case class JsonMergeShallowExpr(dest: Expression, src: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = dest
  override def right: Expression = src
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_merge_shallow"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = dest.eval(input)
    val s = src.eval(input)
    val out = JsonFunctions.mergeShallow(
      if (d == null) null else d.toString,
      if (s == null) null else s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(dest = l, src = r)
}

/** `json_valid(str)` — true iff the string parses as JSON. Used by the
  * sync plane's error side-output (D14): a malformed payload that a rule
  * projects is surfaced as an error row instead of silently degrading to
  * null (the DataFrame analog of the reference's per-event error
  * handling, krmsyncer_controller.go:509-516).
  */
case class JsonValidExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "json_valid"

  override def nullSafeEval(v: Any): Any = {
    try { JsonFunctions.mapper.readTree(v.toString); java.lang.Boolean.TRUE }
    catch { case _: Exception => java.lang.Boolean.FALSE }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `to_yaml(json)` — render a JSON document as YAML (the export surface
  * form, B8). A proper Catalyst expression so YAML rendering composes in
  * query plans and SQL (`SELECT to_yaml(doc)`), not just at the sink
  * edge; CodegenFallback because the Jackson parse dominates per-row
  * cost either way.
  */
case class ToYamlExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "to_yaml"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Yaml.fromJson(v.toString))

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `rolling_hash(str)` — 64-bit polynomial rolling hash over the UTF-8
  * bytes of a string (h = h*31 + byte, wrapping). Used for document
  * fingerprinting at 100 TB scale: cheap, codegen'd, and stable across
  * JVM versions (no object hashing involved). Implements a real
  * `doGenCode` so it stays inside whole-stage codegen in hot paths.
  */
case class RollingHashExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level entry points for the custom expressions. */
object functions {
  import org.apache.spark.sql.graft.bridge
  private def col(e: Expression): Column = bridge.column(e)
  private def expr(c: Column): Expression = bridge.expression(c)

  /** D10 — project dotted `paths` out of a JSON payload column. */
  def json_project(json: Column, paths: Seq[String]): Column =
    col(JsonProjectExpr(expr(json), expr(org.apache.spark.sql.functions.lit(paths.mkString(",")))))

  /** D12 — SSA-style shallow merge of two JSON payload columns. */
  def json_merge_shallow(dest: Column, src: Column): Column =
    col(JsonMergeShallowExpr(expr(dest), expr(src)))

  /** Codegen'd 64-bit rolling hash of a string column. */
  def rolling_hash(c: Column): Column = col(RollingHashExpr(expr(c)))

  /** True iff the string column parses as JSON (D14 error detection). */
  def json_valid(c: Column): Column = col(JsonValidExpr(expr(c)))

  /** Render a JSON payload column as YAML (B8 surface form). */
  def to_yaml(c: Column): Column = col(ToYamlExpr(expr(c)))

  /** Codegen'd distinct word-n-gram shingle hashes (xxhash64, seed 42 —
    * byte-identical to `xxhash64(concat_ws(" ", tokens...))`). */
  def ngram_hashes(text: Column, n: Int): Column = col(NGramHashesExpr(expr(text), n))

  /** Codegen'd Σ aᵢ·bᵢ over `array<float|double>` columns. */
  def dot_product(a: Column, b: Column): Column = col(DotProductExpr(expr(a), expr(b)))

  /** Hash-aggregable argmax with the quantizers' larger-cell tie rule —
    * see [[ArgMaxCell]] for why `max(struct(score, cell))` (a
    * SortAggregate) is unusable over the k-fold scoring blowup. */
  def argmax_cell(score: Column, cell: Column): Column =
    col(ArgMaxCell(expr(score), expr(cell)).toAggregateExpression())

  /** Codegen'd single-pass cosine similarity over `array<float|double>`. */
  def cosine_sim(a: Column, b: Column): Column = col(CosineSimExpr(expr(a), expr(b)))

  /** Header-only media probe: binary → struct(format, width, height). */
  def image_meta(c: Column): Column = col(ImageMetaExpr(expr(c)))

  /** Header-only audio/video container probe: binary →
    * struct(format, duration_ms, channels, sample_rate, width, height). */
  def media_meta(c: Column): Column = col(MediaMetaExpr(expr(c)))

  /** Perceptual image signatures for near-dup dedup over image bytes:
    * binary → struct(ahash, dhash), NULL for undecodable blobs. */
  def image_phash(c: Column): Column = col(ImagePhashExpr(expr(c)))

  /** C4-style HTML → clean text extraction (tag/script/comment strip,
    * entity decode, block-level line breaks, whitespace collapse) —
    * the text pipeline's crawl front end. Never throws. */
  def html_text(c: Column): Column = col(HtmlTextExpr(expr(c)))

  /** Per-frame perceptual signatures for multi-frame media (animated
    * GIF): binary → array<struct(frame_idx, ahash, dhash)>, NULL for
    * undecodable blobs. */
  def image_frame_phashes(c: Column): Column = col(ImageFramePhashExpr(expr(c)))

  /** Argmax centroid index over a matrix-as-data quantizer (rows must be
    * pre-normalized for cosine ordering). O(1) codegen size in k. */
  def best_cell(vec: Column, unitCentroids: Array[Array[Double]]): Column =
    col(BestCellExpr(expr(vec), unitCentroids))

  /** Top-`nProbe` centroid indices, ascending by (score, index). */
  def probe_cells(vec: Column, unitCentroids: Array[Array[Double]],
      nProbe: Int): Column =
    col(ProbeCellsExpr(expr(vec), unitCentroids, nProbe))

  /** BPE segmentation with the merge table carried as data — O(1)
    * codegen size in the merge count. `merges` = (pattern, replacement)
    * pairs in training order. */
  def bpe_segment(word: Column, merges: Seq[(String, String)]): Column =
    col(BpeSegmentExpr(expr(word), merges.map(_._1), merges.map(_._2)))

  /** Scan-side hashed-linear-classifier kernel: array<string> tokens →
    * struct(n_tokens, raw) against a weights-as-data table. */
  def hashed_score(tokens: Column, weights: Array[Long]): Column =
    col(HashedScoreExpr(expr(tokens), weights))

  /** PQ codes (m per-subspace argmaxes) against a codebook-as-data. */
  def pq_encode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    col(PqEncodeExpr(expr(vec), books))

  /** Flat m·k ADC lookup table for a query vector. */
  def pq_lut(qvec: Column, books: Array[Array[Array[Double]]]): Column =
    col(PqLutExpr(expr(qvec), books))

  /** Vector minus its assigned coarse centroid (the FAISS IVFPQ
    * residual) — centroid matrix as one reference object; see
    * [[CellResidualExpr]]. */
  def cell_residual(vec: Column, cell: Column,
      centroids: Array[Array[Double]], normalize: Boolean = false,
      appendEvery: Int = 0): Column =
    col(CellResidualExpr(expr(vec), expr(cell), centroids, normalize, appendEvery))

  /** Matrix-vector rotation with the matrix as one reference object
    * (O(1) generated code in the matrix size); optional unit-normalize
    * and augmented-layout append-1 — see [[RotateProjectExpr]]. */
  def rotate_project(vec: Column, matrix: Array[Array[Double]],
      normalize: Boolean = false, appendEvery: Int = 0): Column =
    col(RotateProjectExpr(expr(vec), matrix, normalize, appendEvery))
}
