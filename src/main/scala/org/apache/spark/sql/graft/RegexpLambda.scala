package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trino's per-match-lambda `regexp_replace(string, pattern, function)`
  * (the dialect's regexp family; Trino invokes the lambda once per match
  * with the CAPTURING GROUPS passed as an `array(varchar)` — group
  * numbers start at 1, there is no element for the whole match, and a
  * non-participating group contributes NULL. On this engine address the
  * array with `element_at(x, n)` = group n — 1-based in both dialects;
  * per DIALECT.md the `[]` subscript stays Spark-0-based everywhere).
  *
  * Spark has no equivalent: `RegExpReplace` takes only a replacement
  * STRING (with `$n` backreferences), and none of the built-in
  * higher-order functions iterate regex matches. This expression is a
  * genuine Catalyst [[HigherOrderFunction]], so the analyzer's standard
  * lambda-resolution rule binds the lambda variable (the groups array)
  * exactly as it does for `transform`/`filter`, and the lambda body may
  * be any Catalyst expression tree — `upper(x[1]) || x[2]`, nested
  * lambdas, whatever — evaluated per match with zero UDF plumbing.
  * It lives in this bridge package because the trait's
  * `argumentTypes`/`functionTypes` signatures name the `private[sql]`
  * type `AbstractDataType` (same reason [[DeclaredInputTypes]] is here).
  *
  * Evaluation contract (pinned in TrinoFunctionsSpec):
  *   - non-matching segments copy through verbatim;
  *   - the lambda's return type must be string (enforced by the type
  *     check via `functionTypes`, as in Trino where the lambda must
  *     return varchar);
  *   - a NULL lambda result is an error, matching Trino's "lambda
  *     expression must return a non-null value" behavior — a silent
  *     empty-replace would corrupt data;
  *   - NULL string or NULL pattern → NULL result;
  *   - zero-width matches advance by one character (java.util.regex's
  *     own `find()` behavior, same family Trino's Joni follows).
  *
  * Like Spark's RegExpReplace this caches the compiled pattern across
  * rows keyed on the pattern text, so a literal (the overwhelmingly
  * common case) compiles once per task. Per-row work is one linear
  * matcher pass — the same cost profile as built-in regexp_replace plus
  * the interpreted lambda body per match (higher-order functions are
  * CodegenFallback in Spark itself, so this matches the built-in
  * lambda cost model).
  */
case class RegExpReplaceLambda(str: Expression, regex: Expression,
    function: Expression)
    extends Expression with HigherOrderFunction with CodegenFallback
    with TernaryLike[Expression] {

  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_replace"

  override def arguments: Seq[Expression] = Seq(str, regex)
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def functions: Seq[Expression] = Seq(function)
  // the lambda must produce a string, as in Trino (varchar-returning
  // lambda); a non-string body fails analysis, never casts silently
  override def functionTypes: Seq[AbstractDataType] = Seq(StringType)

  override def first: Expression = str
  override def second: Expression = regex
  override def third: Expression = function

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): RegExpReplaceLambda =
    // the lambda variable: array of capture groups; elements nullable
    // (a group that did not participate in the match is NULL, as in Trino)
    copy(function = f(function, (ArrayType(StringType, containsNull = true), false) :: Nil))

  @transient private lazy val groupsVar: NamedLambdaVariable = function match {
    case LambdaFunction(_, Seq(v: NamedLambdaVariable), _) => v
    case other => throw new IllegalStateException(
      s"regexp_replace lambda was not bound: $other")
  }

  // compiled-pattern cache (same shape as Spark's own RegExpReplace):
  // re-compile only when the pattern text changes between rows
  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: Pattern = _

  override def eval(input: InternalRow): Any = {
    val sv = str.eval(input)
    if (sv == null) return null
    val rv = regex.eval(input)
    if (rv == null) return null
    val ru = rv.asInstanceOf[UTF8String]
    if (pattern == null || !ru.equals(lastRegex)) {
      lastRegex = ru.clone()
      pattern = Pattern.compile(ru.toString)
    }
    val source = sv.asInstanceOf[UTF8String].toString
    val m = pattern.matcher(source)
    val fn = functionsForEval.head
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      val n = m.groupCount()
      val groups = new Array[AnyRef](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        groups(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      groupsVar.value.set(new GenericArrayData(groups))
      val replaced = fn.eval(input)
      if (replaced == null) throw new IllegalArgumentException(
        "regexp_replace: the replacement lambda must return a non-null " +
          s"value (matched '${m.group()}' at offset ${m.start()})")
      sb.append(source, last, m.start())
        .append(replaced.asInstanceOf[UTF8String].toString)
      last = m.end()
    }
    sb.append(source, last, source.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RegExpReplaceLambda =
    copy(str = newFirst, regex = newSecond, function = newThird)
}
