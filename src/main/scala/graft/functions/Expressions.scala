package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (operator decision table tier (b),
  * SURVEY.md §7.3): native `UnaryExpression`s with `doGenCode`, so they
  * run inside whole-stage codegen like built-ins — no UDF serialization,
  * no codegen fence in the hot path.
  */

/** Polynomial rolling hash over a string's UTF-16 code units:
  * `acc = (acc * 31 + c) mod 1_000_000_007` — the document-fingerprint
  * primitive (deterministic, order-sensitive, mergeable for chunked
  * hashing). ASCII-equivalent to folding DuckDB `ascii()` codepoints, so
  * it is oracle-comparable on ASCII corpora. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hash requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 1000000007L

  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31 + s.charAt(i)) % Mod
      i += 1
    }
    acc
  }
}

/** The dedup pipeline's token hash as a native codegen'd expression:
  * [[RollingHash]]'s polynomial fold spread by a Knuth multiplicative
  * step (`(fold * 2654435761) mod p`) — the per-token primitive under
  * MinHash signatures (x05) and SimHash bits (x06). Equivalent to the
  * interpreted `aggregate(transform(split(tok,'')))` fold it replaces
  * (property-tested in ExpressionsSpec), but runs inside whole-stage
  * codegen with no per-element lambda dispatch. */
case class TokenHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"token_hash requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "token_hash"

  override protected def nullSafeEval(input: Any): Any =
    TokenHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): TokenHash =
    copy(child = newChild)
}

object TokenHash {
  def hash(s: String): Long =
    RollingHash.hash(s) * graft.pipeline.HashConstants.Knuth % graft.pipeline.HashConstants.HashPrime
}

/** The reference's `sanitize_name` (fmp_reader.py:56-61) as a native
  * data-plane expression — same unicode-aware semantics as
  * [[graft.etl.Sanitize.sanitize]], codegen'd for per-row use (B35's
  * "showcase UDF" upgraded to a real Catalyst expression). */
case class SanitizeName(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"sanitize_name requires STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "sanitize_name"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.etl.Sanitize.sanitize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.etl.Sanitize.sanitize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SanitizeName =
    copy(child = newChild)
}

/** Element loops shared by [[VecDot]]/[[VecNorm2]] — accumulation is in
  * ARRAY ORDER with double precision, exactly the semantics of the
  * `zip_with`/`aggregate` folds they replace, so cosine values (and the
  * DuckDB oracle comparisons built on them) are bit-identical. */
object VecOps {
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def norm2(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }

  private[functions] def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  private[functions] def isFloatVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Exact BIGINT dot product over two long arrays — the integer-
    * millionths discipline's hot loop (x89 candidate affinities). Long
    * addition/multiplication in array order, bit-identical to the
    * `aggregate(zip_with(...))` fold it replaces; overflow wraps like
    * the non-ANSI fold did (callers carry the documented ≤2⁶³ envelope,
    * disclosed at the x89 scaladoc). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  private[functions] def isLongVec(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
}

/** Exact integer dot product of two array<bigint> vectors — the
  * codegen'd kernel under x89's bitext-margin affinities, where the
  * interpreted `aggregate(zip_with(...))` fold paid a lambda dispatch
  * and an intermediate 64-element array PER CANDIDATE PAIR (the
  * label-cell join's dominant per-row cost at sf1). Same null contract
  * as [[VecDot]]: ragged pairs yield NULL, never a truncated sum. */
case class VecDotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isLongVec(left.dataType) && VecOps.isLongVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_long requires ARRAY<BIGINT> args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else VecOps.dotLong(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VecOps.dotLong($a, $b);
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two numeric vectors (array<float> | array<double>) as a
  * native codegen'd expression — the hot primitive under cosine top-k
  * (B29) and LSH near-dup verification (x09), where the interpreted
  * `aggregate(zip_with(...))` fold costs a lambda dispatch per element
  * per candidate pair. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(left.dataType) && VecOps.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT|DOUBLE> args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val aFloat = VecOps.isFloatVec(left.dataType)
  private lazy val bFloat = VecOps.isFloatVec(right.dataType)

  // Mismatched lengths yield NULL — the semantics of the zip_with fold
  // this replaces (zip_with pads the shorter array with null elements,
  // nulling the whole sum), so ragged/corrupt embeddings surface as null
  // cosines instead of a plausible-but-wrong truncated product.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else VecOps.dot(x, y, aFloat, bFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VecOps.dot($a, $b, $aFloat, $bFloat);
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm of a numeric vector — [[VecDot]]'s companion for
  * cosine denominators, same ordering/precision contract. */
case class VecNorm2(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_norm2 requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm2"

  private lazy val aFloat = VecOps.isFloatVec(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VecOps.norm2(a.asInstanceOf[ArrayData], aFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.norm2($a, $aFloat)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm2 =
    copy(child = newChild)
}

/** Jaccard coefficient of two SORTED, de-duplicated string arrays in one
  * native codegen'd pass: a two-pointer merge count of shared elements
  * with zero per-row allocation. Replaces
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect))`
  * whose hash-set build runs once per REFERENCE (Catalyst inlines the
  * column into the numerator, denominator, and the pushed-down filter —
  * 4+ evaluations per row), the hot primitive under the df-capped
  * near-dup verify (B28/x11/x16). Inputs MUST be `array_sort`ed and
  * distinct with no null elements (Spark's array_sort uses UTF8String
  * binary order — the same ordering the merge uses);
  * [[graft.pipeline.Dedup]] guarantees this at the set projection.
  * ExpressionsSpec proves equality with the array_intersect form. */
case class SetJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"set_jaccard requires ARRAY<STRING> args, got ${left.dataType}, ${right.dataType}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "set_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetJaccard.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetJaccard.jaccard($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SetJaccard =
    copy(left = newLeft, right = newRight)
}

/** |A∩B| as a BIGINT by the same two-pointer merge as [[SetJaccard]] —
  * the primitive under OVERLAP/CONTAINMENT scoring (x29), where the
  * score divides by ONE side's size (|A∩B|/|A|), not the union's, so
  * the caller needs the raw shared count. Same preconditions: sorted
  * ascending (array_sort order), element-distinct. */
case class SetOverlap(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"set_overlap requires ARRAY<STRING> args, got ${left.dataType}, ${right.dataType}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "set_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetJaccard.shared(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetJaccard.shared($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SetOverlap =
    copy(left = newLeft, right = newRight)
}

object SetJaccard {
  /** |A∩B| by two-pointer merge (the shared kernel of [[SetJaccard]] and
    * [[SetOverlap]]); preconditions as documented on [[jaccard]]. */
  def shared(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(j)
      val cmp =
        if (an && bn) 0
        else if (an) 1
        else if (bn) -1
        else a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { s += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    s
  }

  /** |A∩B| / |A∪B| by two-pointer merge; both arrays sorted ascending in
    * UTF8String binary order and element-distinct. Null elements are
    * ordered LAST (exactly where Spark's `array_sort` places them) and a
    * null matches a null, so SQL callers with nullable elements get set
    * semantics instead of an NPE. Empty∩empty is DEFINED as 1.0 (two
    * identical — vacuously equal — sets), not left to 0/0 = NaN whose
    * `NaN >= t` comparison quirk would silently pass dedup filters. The
    * oracle division form never reaches this case: its candidate pairs
    * come from a posting-list join, so shared >= 1 and the denominator
    * is always positive. UNSORTED input returns an undefined (not error)
    * result — a precondition documented here AND in the SQL usage text
    * ([[graft.GraftExtensions]]). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    val s = shared(a, b)
    s.toDouble / (na + nb - s)
  }
}

/** The x56 subword (BPE-style) token count as a native codegen'd
  * expression: greedy longest-match over [[graft.pipeline.Bpe]]'s fixed
  * vocabulary, whole document in one call (spaces are word boundaries —
  * skipped without counting; no vocabulary entry contains a space, so a
  * match can never cross one). Equivalent to the nested-HOF
  * (pos,count)-fold it replaces (property-tested against it in BpeSpec),
  * but runs inside whole-stage codegen with hash-set lookups instead of
  * per-position array scans — the x56 production path. */
case class SubwordCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"subword_count requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "subword_count"

  override protected def nullSafeEval(input: Any): Any =
    SubwordCount.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordCount.count($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordCount {
  private val v4 = new java.util.HashSet[String](java.util.Arrays.asList(
    graft.pipeline.Bpe.Vocab4: _*))
  private val v3 = new java.util.HashSet[String](java.util.Arrays.asList(
    graft.pipeline.Bpe.Vocab3: _*))
  private val v2 = new java.util.HashSet[String](java.util.Arrays.asList(
    graft.pipeline.Bpe.Vocab2: _*))

  /** Counts over CODE POINTS, not UTF-16 code units: Spark's
    * `length`/`substr` (the HOF reference) and DuckDB's `len`/`substr`
    * (the oracle) are both code-point based, so a surrogate pair (emoji,
    * astral CJK) must be ONE fallback token here too — iterating
    * `charAt` would count it as two and silently desync all three
    * implementations the moment the corpus gains non-BMP text. The
    * vocabulary is pure ASCII, so a window containing any non-ASCII
    * code point can never match and the fast path skips the String
    * allocation entirely. */
  def count(s: String): Long = {
    val cps = s.codePoints().toArray
    val n = cps.length
    var pos = 0
    var c = 0L
    def hit(len: Int, vocab: java.util.HashSet[String]): Boolean = {
      if (pos + len > n) return false
      var i = 0
      while (i < len) { // ASCII-only vocab: any non-ASCII cp kills the match
        if (cps(pos + i) > 127) return false
        i += 1
      }
      vocab.contains(new String(cps, pos, len))
    }
    while (pos < n) {
      if (cps(pos) == ' ') pos += 1 // word boundary, not a token
      else {
        val step =
          if (hit(4, v4)) 4
          else if (hit(3, v3)) 3
          else if (hit(2, v2)) 2
          else 1
        pos += step
        c += 1
      }
    }
    c
  }
}

/** All [[graft.pipeline.Ivf.PqM]] product-quantization code assignments
  * in ONE native pass: for each subspace, the argmin over K codebook
  * entries of the integer squared distance, first-match (= smallest
  * code) on ties — exactly the semantics of the composed
  * `array_position(array_min(...))` column tree it replaces. That tree
  * was ~1,000 Catalyst nodes PER code column × M columns, whose
  * analysis/codegen fixed cost dominated the whole x59 query (~2.3 s on
  * a 2,000-row corpus); here the same arithmetic is three `while` loops
  * over a reference-held `long[]` codebook. The codebook child must be
  * a foldable literal — it is folded ONCE into [[cbArr]] and shipped to
  * generated code via `addReferenceObj`, so the per-row work is exactly
  * m·k·subDim integer multiply-adds. A vector whose length differs from
  * the codebook's m·subDim geometry yields NULL (the ragged-input
  * discipline of [[VecDot]]). */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) if right.foldable =>
        if (m < 1 || k < 1)
          TypeCheckResult.TypeCheckFailure(
            s"pq_encode requires m >= 1 and k >= 1, got m=$m, k=$k")
        else right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            "pq_encode codebook must not be NULL")
          case cb: ArrayData if cb.numElements() == 0 =>
            TypeCheckResult.TypeCheckFailure(
              "pq_encode codebook must be non-empty (subDim would be 0)")
          // Long multiply: m and k are each >= 1 and an Int, but m*k in
          // Int can overflow to 0 (ArithmeticException from the modulo —
          // the crash class this check exists to prevent) or negative.
          case cb: ArrayData if cb.numElements() % (m.toLong * k) == 0 =>
            TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"pq_encode codebook length must be a multiple of m*k = ${m.toLong * k}")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires (ARRAY<BIGINT>, foldable ARRAY<BIGINT>), got " +
          s"${left.dataType}, ${right.dataType}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // Always nullable: a ragged vector yields NULL even when the child is
  // non-nullable — without this override, nullSafeCodeGen's
  // non-nullable branch would emit an assignment to an undeclared
  // isNull variable (the contract AdcScore declares for the same
  // reason).
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  private lazy val cbArr: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqEncode.encode(cbArr, m, k, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "long[]")
    nullSafeCodeGen(ctx, ev, (a, _) => s"""
      ${ev.value} = graft.functions.PqEncode.encode($cbRef, $m, $k, $a);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Codes for all m subspaces; null for a vector whose length is not
    * m·subDim (the codebook defines subDim = cb.length/(m·k)). Strict
    * `<` keeps the FIRST (smallest) code on distance ties — mirrored by
    * the oracle's `row_number() OVER (ORDER BY dist, k)`. */
  def encode(cb: Array[Long], m: Int, k: Int, x: ArrayData): ArrayData = {
    val subDim = cb.length / (m * k)
    if (x.numElements() != m * subDim) return null
    val codes = new Array[Int](m)
    var ms = 0
    while (ms < m) {
      var best = 0
      var bestD = Long.MaxValue
      var kk = 0
      while (kk < k) {
        var d = 0L
        var j = 0
        val off = (ms * k + kk) * subDim
        while (j < subDim) {
          val t = x.getLong(ms * subDim + j) - cb(off + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = kk }
        kk += 1
      }
      codes(ms) = best
      ms += 1
    }
    ArrayData.toArrayData(codes)
  }
}

/** The ADC (asymmetric distance computation) lookup-sum for one encoded
  * row: `Σ_ms table[ms·k + codes[ms]]` over a per-query foldable table —
  * [[PqEncode]]'s companion on the search side, replacing M chained
  * `element_at(literal_array, …)` lookups with one loop over a
  * reference-held `long[]`. Null codes (or a codes array whose length
  * does not divide the table) yield NULL. */
case class AdcScore(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) if right.foldable =>
        if (right.eval() == null)
          TypeCheckResult.TypeCheckFailure("adc_score table must not be NULL")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"adc_score requires (ARRAY<INT>, foldable ARRAY<BIGINT>), got " +
          s"${left.dataType}, ${right.dataType}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  private lazy val tableArr: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcScore.score(tableArr, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTable", tableArr, "long[]")
    // Fresh per-call-site name: with a non-nullable child, nullSafeExec
    // emits this snippet without enclosing braces, so a fixed local name
    // would collide when two adc_score calls share a codegen scope.
    val res = ctx.freshName("adcRes")
    nullSafeCodeGen(ctx, ev, (a, _) => s"""
      Long $res = graft.functions.AdcScore.score($tRef, $a);
      if ($res == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $res.longValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

object AdcScore {
  /** Boxed so codegen can branch on the null contract without a
    * sentinel value colliding with a legitimate sum. */
  def score(table: Array[Long], codes: ArrayData): java.lang.Long = {
    val m = codes.numElements()
    if (m == 0 || table.length % m != 0) return null
    val k = table.length / m
    var acc = 0L
    var ms = 0
    while (ms < m) {
      val c = codes.getInt(ms)
      if (c < 0 || c >= k) return null
      acc += table(ms * k + c)
      ms += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Bloom-probe hit count for one document in a single native pass: for
  * each precomputed shingle hash, test whether ALL `k` affine-spread bit
  * positions (`((h·(2i+1) + i²·31+7) mod prime) mod bits`) are set in
  * the foldable bitmask, and count the hits. Replaces a
  * `size(filter(hs, …))` interpreted-HOF chain whose per-element lambda
  * dispatch made the map-only Bloom gate slower than the exact join it
  * exists to avoid. The mask child must be foldable — folded once into
  * [[maskArr]] and shipped via `addReferenceObj`. Null elements in the
  * hash array never hit (a null shingle hash matches nothing). */
case class BloomHits(left: Expression, right: Expression, k: Int, prime: Long)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) if right.foldable =>
        // An empty mask would make the probe's `pos % bits` divide by
        // zero per row; fail analysis instead. A null-evaluating foldable
        // mask (CAST(NULL AS ARRAY<BIGINT>)) is equally unusable.
        right.eval() match {
          case null => TypeCheckResult.TypeCheckFailure(
            "bloom_hits mask must not be NULL")
          case mk: ArrayData if mk.numElements() > 0 =>
            TypeCheckResult.TypeCheckSuccess
          case _ =>
            TypeCheckResult.TypeCheckFailure("bloom_hits mask must be non-empty")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bloom_hits requires (ARRAY<BIGINT>, foldable ARRAY<BIGINT>), got " +
          s"${left.dataType}, ${right.dataType}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hits"

  private lazy val maskArr: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BloomHits.count(maskArr, k, prime, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bloomMask", maskArr, "long[]")
    defineCodeGen(ctx, ev, (a, _) =>
      s"graft.functions.BloomHits.count($mRef, $k, ${prime}L, $a)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomHits =
    copy(left = newLeft, right = newRight)
}

/** Distinct word-shingle rolling hashes of a document in ONE native
  * pass: split on single spaces (Java split limit -1 — exactly Spark's
  * `split(text, " ")`), form every n-token shingle joined by one space,
  * de-duplicate by STRING (first occurrence), and emit each distinct
  * shingle's [[RollingHash]]. Replaces the interpreted
  * `array_distinct(transform(sequence…, concat_ws(slice…)))` +
  * `transform(rolling_hash)` HOF chain, whose per-element lambda
  * dispatch and substring allocation dominated the x67 Bloom probe
  * (measured 3.7 s vs ~0.9 s for the codegen'd explode path it was
  * meant to beat). De-duplication is by string, not by hash, so a
  * rolling-hash collision between distinct shingles still emits both —
  * the oracle's DISTINCT-string semantics. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires (STRING, n >= 1), got ${child.dataType}, n=$n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.hashes(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.hashes($c.toString(), $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def hashes(s: String, n: Int): ArrayData = {
    val toks = s.split(" ", -1)
    if (toks.length < n) return ArrayData.toArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = RollingHash.hash(it.next()); k += 1 }
    ArrayData.toArrayData(out)
  }
}

object BloomHits {
  def count(mask: Array[Long], k: Int, prime: Long, hs: ArrayData): Long = {
    val bits = mask.length.toLong * 64L
    val n = hs.numElements()
    var c = 0L
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var all = true
        var i = 0
        while (all && i < k) {
          val raw = (h * (2L * i + 1L) + i.toLong * i * 31L + 7L) % prime
          val pos = (if (raw < 0) raw + prime else raw) % bits
          all = (mask((pos / 64L).toInt) >>> (pos % 64L).toInt & 1L) == 1L
          i += 1
        }
        if (all) c += 1L
      }
      j += 1
    }
    c
  }
}

/** Algebraic simplification for [[SanitizeName]]: the sanitizer is
  * idempotent (property-tested in SanitizeSpec), so nested applications
  * collapse to one — the engine's own little optimizer rule, injected via
  * [[graft.GraftExtensions]]. Composed pipelines (e.g. a sanitize in a
  * view under a sanitize in a query) stop paying the double per-row
  * regex. */
object CollapseSanitize extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.transformAllExpressions {
      case SanitizeName(inner @ SanitizeName(_)) => inner
    }
}

/** Registration for the custom expressions: per-session temp functions
  * (usable on any driver-provided session) — see also
  * [[graft.GraftExtensions]] for the `SparkSessionExtensions` path. */
/** x99's character-entropy statistic as ONE native pass: count code-point
  * frequencies (O(len)), then one term per DISTINCT character — replacing
  * the interpreted `aggregate(transform(array_distinct(split(…))))` fold
  * whose `replace`-based counting re-scans the string per distinct
  * character (O(distinct × len); measured 3.9 s for x99 at sf0.1, scan-
  * bound native). BIT-IDENTICAL to the fold by construction, and the
  * fold stays the spec's reference implementation (ExpressionsSpec
  * compares them corpus-wide + on planted unicode):
  *  - counts are CODE POINTS, matching `length`/`split`/`replace`
  *    semantics on UTF8String (surrogate pairs are one character);
  *  - each per-character term replicates the fold's exact double tree
  *    `1e6 * (cnt/len) * ln(len/cnt)` and Spark Round's
  *    BigDecimal-HALF_UP rounding before the long cast;
  *  - long terms then sum (order-free), empty/NULL input → NULL. */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"char_entropy requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) null else java.lang.Long.valueOf(CharEntropy.entropy(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      String ceStr = $c.toString();
      if (ceStr.isEmpty()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.CharEntropy.entropy(ceStr);
      }""")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  def entropy(s: String): Long = {
    val counts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    var len = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      i += Character.charCount(cp)
      len += 1
    }
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next().intValue()
      // The fold's exact term: round(1e6 * (cnt/len) * ln(len/cnt)) with
      // Spark Round's double semantics (BigDecimal.decimal, HALF_UP),
      // then the BIGINT cast of the integral rounded double.
      val term = 1000000d * (cnt.toDouble / len.toDouble) *
        math.log(len.toDouble / cnt.toDouble)
      acc += BigDecimal(term)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble.toLong
    }
    acc
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("char_entropy",
      exprs => CharEntropy(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("sanitize_name",
      exprs => SanitizeName(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("token_hash",
      exprs => TokenHash(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("vec_dot",
      exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("vec_dot_long",
      exprs => VecDotLong(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("vec_norm2",
      exprs => VecNorm2(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("set_jaccard",
      exprs => SetJaccard(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("set_overlap",
      exprs => SetOverlap(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("subword_count",
      exprs => SubwordCount(exprs.head), "scala_udf")
    // Geometry arguments (m/k/n/prime) are REQUIRED foldable integer
    // literals — folded at registration into the expression (they shape
    // the generated loops, not per-row data). intArg gives a clean
    // AnalysisException-style message for a column or wrong-typed
    // argument instead of a raw ClassCastException from a bare cast.
    registry.createOrReplaceTempFunction("pq_encode",
      exprs => PqEncode(exprs(0), exprs(1),
        intArg(exprs(2), "pq_encode", "m").toInt,
        intArg(exprs(3), "pq_encode", "k").toInt),
      "scala_udf")
    registry.createOrReplaceTempFunction("adc_score",
      exprs => AdcScore(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("shingle_hashes",
      exprs => ShingleHashes(exprs(0),
        intArg(exprs(1), "shingle_hashes", "n").toInt),
      "scala_udf")
    registry.createOrReplaceTempFunction("bloom_hits",
      exprs => BloomHits(exprs(0), exprs(1),
        intArg(exprs(2), "bloom_hits", "k").toInt,
        intArg(exprs(3), "bloom_hits", "prime")),
      "scala_udf")
  }

  /** Evaluate a foldable INT/BIGINT literal argument; anything else —
    * a column reference, a string, a null — fails with a message naming
    * the function and parameter rather than a ClassCastException. */
  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String, param: String): Long = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: argument '$param' must be an integer literal, got non-foldable $e")
    e.eval() match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$param' must be an integer literal, got $other")
    }
  }

  /** B35's one showcase scalar UDF — kept for API-surface parity; the
    * production path is [[SanitizeName]] (native, codegen'd) or the
    * expression chain in B21. A closure UDF is a codegen fence and a
    * serialization cost per batch: that is exactly why it stays a
    * showcase. */
  lazy val sanitizeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) =>
      if (s == null) null else graft.etl.Sanitize.sanitize(s))
}
