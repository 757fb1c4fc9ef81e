package graft.plans

import graft.core.Tokenizer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, HintInfo, LogicalPlan, Project, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Index-aware query acceleration: the Catalyst analog of what the
  * reference engine does implicitly — answer a term predicate from the
  * inverted index instead of scanning and re-tokenizing the corpus
  * (reference: every query route goes through posting lists,
  * `qq_mem_engine.h:329-358`; there is no "scan the documents" fallback at
  * all). On Spark the corpus-scan shape is expressible — and is exactly
  * what a naive user writes: `docs.filter(tokens contains t)` — so the
  * engine ships an optimizer [[Rule]] that rewrites that filter into a
  * broadcast LEFT SEMI join against the decoded posting list for `t`,
  * keyed by docId. At 100 TB that is the difference between a full-corpus
  * tokenize (read every byte of `content`) and one pushed-down term lookup
  * over the block index (read a few KB of postings) followed by a
  * broadcast semi-join that prunes the scan output — the same plan shape
  * Hyperspace-style index subsystems produce, built here from public
  * Catalyst surface only.
  *
  * Pieces:
  *  - [[GraftMatch]] — the user-facing predicate `graft_match(key, text,
  *    term)`. Self-contained semantics: when NOT rewritten (no index
  *    registered for `key`) it evaluates by tokenizing `text` with the
  *    engine [[Tokenizer]] and testing membership — the rewrite is an
  *    optimization, never a semantic change.
  *  - [[IndexCatalog]] — session-global registry `key -> (keyCol, term =>
  *    docIds DataFrame)`. The lookup DataFrame contract: one BIGINT column
  *    of docIds whose rows are exactly the docs whose tokenized `text`
  *    contains `term` (which an inverted index built with the same
  *    tokenizer satisfies by construction).
  *  - [[IndexSemiJoinRule]] — splits the filter condition into conjuncts,
  *    turns every rewritable [[GraftMatch]] conjunct into a LEFT SEMI join
  *    (broadcast-hinted: a single term's docId list is small relative to
  *    the corpus by Zipf — and if it isn't, AQE demotes the hint), and
  *    keeps the remaining conjuncts as a residual Filter so mixed
  *    predicates (`graft_match(...) AND doc_id % 3 = 0`) stay exact.
  */
object IndexCatalog {
  /** `lookup(term)` → docIds containing the term; `phraseLookup(terms)` →
    * docIds containing the terms ADJACENT IN ORDER (positional index
    * required — absent means phrase predicates stay scan-evaluated). */
  final case class Entry(keyCol: String, lookup: String => DataFrame,
                         phraseLookup: Option[Seq[String] => DataFrame] = None,
                         containsLookup: Option[String => DataFrame] = None)
  private val entries = scala.collection.concurrent.TrieMap.empty[String, Entry]
  def register(key: String, keyCol: String, lookup: String => DataFrame,
               phraseLookup: Option[Seq[String] => DataFrame] = None,
               containsLookup: Option[String => DataFrame] = None): Unit =
    entries.put(key, Entry(keyCol, lookup, phraseLookup, containsLookup))
  def get(key: String): Option[Entry] = entries.get(key)
  def clear(): Unit = entries.clear()
}

/** `graft_match(key, text, term)` — true iff the engine tokenizer's terms
  * of `text` contain `term`. `key` names an [[IndexCatalog]] entry that MAY
  * accelerate it; evaluation never consults the index (rewrite-only), so
  * the predicate is correct with or without the rule installed. */
case class GraftMatch(key: Expression, text: Expression, term: Expression)
    extends TernaryExpression with Predicate with CodegenFallback {
  override def first: Expression = key
  override def second: Expression = text
  override def third: Expression = term
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(key, text, term).forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_match requires (STRING key, STRING text, STRING term)")
  override def nullSafeEval(k: Any, t: Any, q: Any): Any = {
    val needle = q.asInstanceOf[UTF8String].toString
    // scan-side fallback semantics: tokenize and test membership
    Tokenizer.terms(t.asInstanceOf[UTF8String].toString).contains(needle)
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GraftMatch =
    copy(key = newFirst, text = newSecond, term = newThird)
}

/** `graft_phrase(key, text, phrase)` — true iff the engine tokenizer's
  * terms of `text` contain the phrase's terms adjacent and in order (the
  * J4 phrase predicate as a scan expression). Like [[GraftMatch]],
  * evaluation never consults the index; when an [[IndexCatalog]] entry
  * with a `phraseLookup` covers it, [[IndexSemiJoinRule]] answers it from
  * the positional posting lists instead of re-tokenizing the corpus. */
case class GraftPhrase(key: Expression, text: Expression, phrase: Expression)
    extends TernaryExpression with Predicate with CodegenFallback {
  override def first: Expression = key
  override def second: Expression = text
  override def third: Expression = phrase
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(key, text, phrase).forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_phrase requires (STRING key, STRING text, STRING phrase)")
  override def nullSafeEval(k: Any, t: Any, p: Any): Any = {
    val needle = Tokenizer.terms(p.asInstanceOf[UTF8String].toString)
    if (needle.isEmpty) false
    else Tokenizer.terms(t.asInstanceOf[UTF8String].toString)
      .sliding(needle.length).exists(_.sameElements(needle))
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GraftPhrase =
    copy(key = newFirst, text = newSecond, phrase = newThird)
}

/** `graft_contains(key, text, needle)` — true iff the STORED text contains
  * `needle` as a raw substring (case-sensitive; token boundaries ignored —
  * the predicate a term index cannot serve). `key` MAY name an
  * [[IndexCatalog]] entry with a `containsLookup` (trigram-index path,
  * [[graft.index.TrigramIndex]]); evaluation never consults it. */
case class GraftContains(key: Expression, text: Expression, needle: Expression)
    extends TernaryExpression with Predicate with CodegenFallback {
  override def first: Expression = key
  override def second: Expression = text
  override def third: Expression = needle
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(key, text, needle).forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_contains requires (STRING key, STRING text, STRING needle)")
  override def nullSafeEval(k: Any, t: Any, q: Any): Any =
    t.asInstanceOf[UTF8String].contains(q.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GraftContains =
    copy(key = newFirst, text = newSecond, needle = newThird)
}

/** The rewrite rule. Installed per session ([[IndexRewrite.install]]) or via
  * `GraftExtensions` (`withExtensions`). Runs in the user-provided optimizer
  * batch — i.e. AFTER cache substitution, so the embedded lookup plan is
  * taken from the lookup DataFrame's own `optimizedPlan` (which resolves
  * against cached posting blocks; fresh exprIds per call, so the same index
  * can accelerate several conjuncts of one query). */
case class IndexSemiJoinRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  /** A conjunct the index can answer: one registered entry plus the set of
    * terms whose posting lists, UNIONED, are exactly its matching docs —
    * a single GraftMatch, or an OR whose disjuncts are all GraftMatch over
    * the same index and text column (duplicates across the unioned lists
    * are harmless under LEFT SEMI, so no distinct is needed). */
  private def indexable(e: Expression, child: LogicalPlan):
      Option[(IndexCatalog.Entry, Seq[() => DataFrame])] = {
    def entryFor(k: Expression, textExpr: Expression): Option[(String, IndexCatalog.Entry)] = {
      if (!k.foldable || k.eval() == null) return None
      val key = k.eval().toString
      IndexCatalog.get(key).filter { entry =>
        // join key present in the child's output, and the text argument a
        // direct reference to a child column — a derived text (e.g.
        // substring(text)) has no index built over it, so scan-eval it
        child.output.exists(a => a.name == entry.keyCol) &&
          (textExpr match {
            case a: Attribute => child.output.exists(_.exprId == a.exprId)
            case _ => false
          })
      }.map(key -> _)
    }
    def one(x: Expression): Option[(String, IndexCatalog.Entry, () => DataFrame)] = x match {
      case GraftMatch(k, textExpr, t) if t.foldable && t.eval() != null =>
        entryFor(k, textExpr).map { case (key, entry) =>
          val term = t.eval().toString
          (key, entry, () => entry.lookup(term))
        }
      case GraftPhrase(k, textExpr, p) if p.foldable && p.eval() != null =>
        entryFor(k, textExpr).flatMap { case (key, entry) =>
          val terms = graft.core.Tokenizer.terms(p.eval().toString).toSeq
          entry.phraseLookup.filter(_ => terms.nonEmpty)
            .map(pl => (key, entry, () => pl(terms)))
        }
      case GraftContains(k, textExpr, q) if q.foldable && q.eval() != null =>
        entryFor(k, textExpr).flatMap { case (key, entry) =>
          val needle = q.eval().toString
          entry.containsLookup.map(cl => (key, entry, () => cl(needle)))
        }
      case _ => None
    }
    val leaves = splitDisjunctivePredicates(e).map(one)
    if (leaves.nonEmpty && leaves.forall(_.isDefined)
        && leaves.flatMap(_.map(_._1)).distinct.size == 1)
      Some((leaves.head.get._2, leaves.flatMap(_.map(_._3))))
    else None
  }

  /** Text attributes referenced by the predicate's GraftMatch/GraftPhrase
    * leaves (for the negation rewrite's IsNotNull residual). */
  private def textAttrs(e: Expression): Seq[Attribute] = e.collect {
    case GraftMatch(_, a: Attribute, _)    => a
    case GraftPhrase(_, a: Attribute, _)   => a
    case GraftContains(_, a: Attribute, _) => a
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // a negated indexable unit rewrites to LEFT ANTI — De Morgan gives
      // NOT(a OR b) = in NEITHER list, i.e. anti-join against the union.
      // One semantic wrinkle: scan-eval of NOT graft_match(null_text) is
      // null (row dropped), while an anti-join would KEEP a doc absent
      // from the index — so the rewrite adds an IsNotNull(text) residual,
      // making the two paths exactly equivalent.
      val units = conjuncts.map {
        case c @ Not(e) =>
          (c, indexable(e, child).map(u => (u, true, textAttrs(e))))
        case c =>
          (c, indexable(c, child).map(u => (u, false, Seq.empty[Attribute])))
      }
      val accel = units.collect { case (_, Some(u)) => u }
      if (accel.isEmpty) f
      else {
        val joined = accel.foldLeft(child) { case (acc, ((entry, lookups), anti, _)) =>
          val docId = acc.output.find(_.name == entry.keyCol).get
          val lookupDf = lookups.map(_.apply()).reduce(_ unionAll _)
          val right = lookupDf.queryExecution.optimizedPlan
          val rightKey = right.output.head
          val rightCast: Expression =
            if (rightKey.dataType == docId.dataType) rightKey
            else Cast(rightKey, docId.dataType)
          // project the join key through a FRESH alias: a lookup built over
          // the same relation as the filtered child would otherwise surface
          // the child's own exprIds on the right side, and the Join would
          // fail duplicate-resolution (self-join shape)
          val freshKey = Alias(rightCast, "graft_idx_key")()
          Join(acc, Project(Seq(freshKey), right),
            if (anti) LeftAnti else LeftSemi,
            Some(EqualTo(docId, freshKey.toAttribute)),
            JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
        }
        val notNulls = accel.collect { case (_, true, attrs) => attrs }.flatten
          .distinct.map(a => IsNotNull(a): Expression)
        val residual = units.collect { case (c, None) => c } ++ notNulls
        if (residual.isEmpty) joined
        else Filter(residual.reduce(And), joined)
      }
  }
}

object IndexRewrite {
  /** Column builder for the marker predicate. */
  def graftMatch(key: String, text: Column, term: String): Column =
    ColumnBridge.column(GraftMatch(
      Literal(UTF8String.fromString(key), StringType),
      ColumnBridge.expression(text),
      Literal(UTF8String.fromString(term), StringType)))

  /** Column builder for the phrase predicate. */
  def graftPhrase(key: String, text: Column, phrase: String): Column =
    ColumnBridge.column(GraftPhrase(
      Literal(UTF8String.fromString(key), StringType),
      ColumnBridge.expression(text),
      Literal(UTF8String.fromString(phrase), StringType)))

  /** Column builder for the substring predicate. */
  def graftContains(key: String, text: Column, needle: String): Column =
    ColumnBridge.column(GraftContains(
      Literal(UTF8String.fromString(key), StringType),
      ColumnBridge.expression(text),
      Literal(UTF8String.fromString(needle), StringType)))

  /** Idempotently install the rule into a session built without
    * `withExtensions` (e.g. the driver's Verify/Bench sessions).
    *
    * The extension path (`GraftExtensions.injectOptimizerRule`) places the
    * rule inside the operator-optimization fixed point, so ColumnPruning
    * naturally re-runs after the rewrite. `experimental.extraOptimizations`
    * runs as a LATE batch instead — after the main pruning pass — so the
    * rewritten plan's scan would keep reading the (now-unreferenced) text
    * column, which at 100 TB is most of the bytes the rewrite exists to
    * avoid. The install therefore appends Catalyst's own ColumnPruning +
    * CollapseProject after the rule; the batch is a fixed point, so they
    * re-prune whatever the rewrite freed. */
  def install(spark: SparkSession): Unit = spark.experimental.synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[IndexSemiJoinRule]))
      spark.experimental.extraOptimizations = cur ++ Seq(
        IndexSemiJoinRule(spark),
        org.apache.spark.sql.catalyst.optimizer.ColumnPruning,
        org.apache.spark.sql.catalyst.optimizer.CollapseProject)
  }
}
