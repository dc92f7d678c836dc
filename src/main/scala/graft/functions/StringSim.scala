package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity expressions for entity resolution, complementing the
  * built-in `levenshtein`. Same design rules as [[HashExprs]]: one tight
  * JVM loop per row behind `doGenCode`, so fuzzy-match verification stays
  * inside WholeStageCodegen.
  */
object StringSim {

  /** Jaro-Winkler similarity, standard definition (match window
    * `max(l1,l2)/2 - 1`, half-transpositions, prefix scale 0.1 over at
    * most 4 leading chars applied when jaro > 0.7). An empty string is
    * similar to nothing — including another empty string — matching
    * DuckDB's `jaro_winkler_similarity` so results gate exactly.
    * Comparison is per UTF-16 char (names/codes are BMP text; supplement
    * with a normalization pass upstream for astral-plane corpora).
    */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    protected override def nullSafeEval(l: Any, r: Any): Any =
      jaroWinklerEval(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.StringSim.jaroWinklerEval($a, $b)")

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
  }

  /** Codegen entry point for [[JaroWinkler]]. */
  def jaroWinklerEval(lu: UTF8String, ru: UTF8String): Double = {
    val s1 = lu.toString
    val s2 = ru.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var pl = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (pl < maxP && s1.charAt(pl) == s2.charAt(pl)) pl += 1
    jaro + pl * 0.1 * (1.0 - jaro)
  }

  /** Unicode canonical composition (NFC) as a codegen'd expression —
    * the normalization pass multilingual corpus cleaning runs before
    * tokenization/dedup (decomposed accents, compatibility variants of
    * the same grapheme hash/shingle differently and split duplicate
    * groups). NFC (not NFKC) because SQL engines expose NFC
    * (`nfc_normalize` in DuckDB), so normalization gates exactly;
    * Java's Normalizer and ICU agree byte-for-byte on canonical
    * composition. Spark has no built-in for this — the (b)-tier
    * custom-Expression case from the design rules: one JVM call per
    * row inside WholeStageCodegen, no UDF serialization.
    */
  case class NfcNormalize(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def prettyName: String = "nfc_normalize"

    protected override def nullSafeEval(s: Any): Any =
      nfcEval(s.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.StringSim.nfcEval($c)")

    override protected def withNewChildInternal(c: Expression): NfcNormalize =
      copy(child = c)
  }

  /** Codegen entry point for [[NfcNormalize]]. */
  def nfcEval(u: UTF8String): UTF8String = {
    val s = u.toString
    // common case: already-composed ASCII/Latin text — skip the copy
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Column API. */
  def jaro_winkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
  }

  def nfc_normalize(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NfcNormalize(Bridge.expression(c)))
  }
}
