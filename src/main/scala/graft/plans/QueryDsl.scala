package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.{GeoOps, TextOps, VectorOps}
import graft.sources.Tables

/** ES Query-DSL → DataFrame compiler.
  *
  * The reference's actual interface is an Elasticsearch `SearchRequest`
  * JSON body built at runtime (reference
  * lib/collectServicesFromSummaries.ts:12-49,178-246;
  * lib/collectServices.ts:12-84; lib/collectPods.ts:12-63) and POSTed
  * through the client (lib/es_client.ts). Every operator in this
  * library reproduces those bodies' SEMANTICS as hand-compiled Spark;
  * this object closes the interface gap: it parses the surveyed DSL
  * subset and emits plans built from the same devices the hand-written
  * operators use, so a reference user can hand their request JSON to
  * [[search]]/[[drain]] unchanged. QueryDslSpec replays the
  * reference's four verbatim bodies through this compiler and asserts
  * bit-equality with the flagship pipelines.
  *
  * Supported subset (SURVEY.md §2.2-2.6 query surface):
  * `bool` (`filter`/`must`/`must_not`/`should` + `minimum_should_match`),
  * `term`/`terms` (array form and terms-lookup `{index,path}` form),
  * `range` (ES date math `now-Nu` against a pinned `now`), `exists`,
  * `match`/`match_phrase`/`match_bool_prefix`/`match_all`,
  * `prefix`/`ids`/`constant_score`/`wildcard`/`fuzzy`,
  * `geo_bounding_box`/`geo_distance` (integer microdegree predicates),
  * `fields` projection (incl. `host.*` wildcard families),
  * `sort`/`size`/`search_after`, `collapse`, top-level `knn`
  * (+ `rank: {rrf}` hybrid fusion with a `query`, [[runHybrid]]),
  * `aggs` trees (the `size: 0` aggregation-request shape — terms
  * (+`missing`)/date_histogram/histogram/range buckets, `filters`,
  * `composite`(+`after` keyset paging), `significant_terms`,
  * `top_hits`, and sum/avg/min/max/value_count/cardinality/stats/
  * percentiles/percentile_ranks metric leaves — see [[runAggs]]),
  * and the QUERY-context scoring model under `sort: ["_score"]`
  * (scored `bool`/`dis_max`/`multi_match`/`term`/`constant_score`/
  * `function_score` trees, `rescore`, `highlight` —
  * [[runScoredTree]]).
  *
  * Compilation is declarative end to end — every construct lowers to
  * the DataFrame API and the scan-discipline devices the operator
  * library already proved out, so Catalyst sees the same plans the
  * hand-written pipelines produce:
  *   - `range` on the timestamp field restates its bound on the raw
  *     scan twin ([[Tables.rawTsAtLeast]]) for parquet row-group
  *     pruning — the 100 TB cold-partition skip;
  *   - `terms` lookup (the data-dependent form; the reference builds
  *     its phase-2 `terms` from phase-1 results at
  *     lib/collectServicesFromSummaries.ts:209-215) compiles to a
  *     broadcast semi-join, so the big side never shuffles;
  *   - `collapse` compiles to the window top-1 form whose partial
  *     WindowGroupLimit Catalyst places before the exchange
  *     ([[graft.operators.Assets.collapseLatest]]'s proven shape);
  *   - `sort`+`size` compiles to TakeOrderedAndProject (never a full
  *     sort);
  *   - multi-index reads resolve each pattern through the named source
  *     map and union — the `collectPods` logs∪apm shape (SURVEY.md S3).
  */
object QueryDsl {

  /** Declarative ES-field ↔ column mapping for one index family.
    *
    * @param fields     ES field name → column name (`service.name` →
    *                   `service_name`). Unmapped fields project to
    *                   nothing, exactly as ES returns no entry for a
    *                   field absent from the mapping (covers the
    *                   reference's typo'd `kubneretes.pod.name`,
    *                   lib/collectServices.ts:29).
    * @param families   wildcard pattern → column prefix (`host.*` →
    *                   `host_`) — the ES field-family read (SURVEY.md P1).
    * @param idColumn   the `_id` analog, always present on every hit.
    * @param tsFields   fields whose range bounds are timestamps with
    *                   ES date-math support.
    * @param termValues per-field term-VALUE translation — the fixture
    *                   mapping (FIXTURES.md §3: `metricset.name:
    *                   service_summary` ≈ `event_type: purchase`).
    *                   Unlisted values pass through.
    * @param dateMath   verbatim date-math rewrite, the fixture's window
    *                   scaling (`now-10m` → `now-7d`): the reference's
    *                   minute/hour windows are rescaled to the fixture's
    *                   30-day span exactly as the hand-written pipelines
    *                   scaled them (Assets.scala Scaladoc per pipeline).
    */
  final case class Mapping(
      fields: Map[String, String],
      idColumn: String,
      families: Map[String, String] = Map.empty,
      tsFields: Set[String] = Set("@timestamp"),
      termValues: Map[String, Map[String, String]] = Map.empty,
      dateMath: Map[String, String] = Map.empty,
      /** ES geo-point field → (latMicroColumn, lonMicroColumn): the
        * indexed integer-microdegree pair a real deployment stores
        * (GeoOps's coordinate convention — lat+90, lon+180, ×10^6).
        */
      geoFields: Map[String, (String, String)] = Map.empty)

  /** Everything a request body resolves against: named index patterns
    * (the body's `index` array — each entry is one of the reference's
    * comma-joined pattern strings, constants.ts:1-2), the field
    * mapping, the pinned `now` for date math (the dataset's own max
    * timestamp, [[Tables.maxBound]]'s determinism device), and named
    * frames for the `terms` lookup form.
    */
  /** The trained ANN index artifacts an approximate `knn` request
    * resolves against — the env-side analog of the HNSW graph living
    * INSIDE an ES index (built at write time, consulted at query
    * time). IVF form: the inverted-list `assignments`
    * (`vec_id`, `assigned_label`) and the `centroids` codebook
    * (`c_label`, `centroid`, `cnrm`), both the memoized
    * [[VectorOps.ivfAssign]]/[[VectorOps.centroidVectors]] artifacts.
    */
  final case class AnnIndex(
      assignments: DataFrame,
      centroids: DataFrame,
      nlist: Int)

  final case class Env(
      indices: Map[String, DataFrame],
      mapping: Mapping,
      /** null ⇒ the source is empty (no resolvable `now`): every
        * date-math range compiles to FALSE, matching
        * [[Tables.trailingWithBound]]'s empty-input contract.
        */
      now: java.sql.Timestamp = null,
      lookups: Map[String, DataFrame] = Map.empty,
      /** Present ⇒ `knn` bodies with `num_candidates` route to the
        * approximate candidate path ([[runKnn]]); absent ⇒ such bodies
        * fail fast (an index without an ANN structure cannot serve an
        * approximate search).
        */
      ann: Option[AnnIndex] = None)

  // ---------------------------------------------------------------------
  // Public entry points
  // ---------------------------------------------------------------------

  /** Compile and run one search request, honoring `size` (the single-
    * page read: TakeOrderedAndProject under the body's sort).
    */
  def search(env: Env, body: String): DataFrame =
    run(env, JsonMethods.parse(body), honorSize = true)

  /** Compile the FULL-DRAIN form of a request: the reference pages
    * with `search_after` until `hits.total` is exhausted
    * (lib/collectServicesFromSummaries.ts:76-84) — the union of all
    * pages is the query without its `size` cut, which on Spark is
    * simply the unlimited plan (one partitioned scan, no driver loop).
    */
  def drain(env: Env, body: String): DataFrame =
    run(env, JsonMethods.parse(body), honorSize = false)

  // ---------------------------------------------------------------------
  // Core
  // ---------------------------------------------------------------------

  private def run(env: Env, body: JValue, honorSize: Boolean): DataFrame = {
    val src = resolveIndex(env, body \ "index")
    body \ "suggest" match {
      case JObject(List((_, spec: JObject))) =>
        // a suggest-only request: silently discarding a co-present
        // query/knn/aggs section would return DIFFERENT results than
        // ES (which answers both envelopes) — fail fast instead
        for (k <- Seq("query", "knn", "aggs"))
          if ((body \ k) != JNothing)
            fail(s"suggest combined with '$k' is unsupported (suggest-only requests)")
        if ((spec \ "term") != JNothing) return runTermSuggest(env, src, spec)
        if ((spec \ "phrase") != JNothing) return runPhraseSuggest(env, src, spec)
        if ((spec \ "completion") != JNothing)
          return runCompletionSuggest(env, src, spec)
        fail(s"unsupported suggester: $spec")
      case JNothing => ()
      case other    => fail(s"unsupported suggest: $other")
    }
    (body \ "knn", body \ "aggs") match {
      case (JNothing, JNothing) => runQuery(env, src, body, honorSize)
      case (knn, JNothing)      =>
        (body \ "query", body \ "rank" \ "rrf") match {
          case (JNothing, JNothing) => runKnn(env, src, knn)
          case (JNothing, _) => fail("rank.rrf needs both knn and query")
          case (q, rrf) if rrf != JNothing => runHybrid(env, src, body, knn, q)
          case _ => fail("knn combined with query needs rank.rrf")
        }
      case (JNothing, aggs)     =>
        // the aggregation request shape (`size: 0` in ES): the query
        // is the filter context, aggs the result
        val filtered = body \ "query" match {
          case JNothing => src
          case q        => applyQuery(env, src, q)
        }
        runAggs(env, src, filtered, aggs)
      case _ => fail("knn and aggs cannot combine")
    }
  }

  private def runQuery(env: Env, src: DataFrame, body: JValue,
      honorSize: Boolean): DataFrame = {
    if (hasScoreSort(body \ "sort")) return runScored(env, src, body, honorSize)
    var df = body \ "query" match {
      case JNothing => src
      case q        => applyQuery(env, src, q)
    }
    val sortSpec = parseSort(env, body \ "sort")
    body \ "search_after" match {
      case JNothing => ()
      case JArray(vs) => df = df.where(keysetAfter(env, df, sortSpec, vs))
      case other => fail(s"unsupported search_after: $other")
    }
    var innerHits = false
    var collapseCol: Option[String] = None
    body \ "collapse" \ "field" match {
      case JString(f) =>
        body \ "collapse" \ "inner_hits" match {
          case JNothing => df = collapseTop1(env, df, f, sortSpec)
          case ih =>
            df = collapseInner(env, df, f, sortSpec, ih)
            innerHits = true
            collapseCol = Some(colName(env, f))
        }
      case JNothing   => ()
      case other      => fail(s"unsupported collapse: $other")
    }
    if (honorSize) body \ "size" match {
      case JInt(n) if innerHits =>
        // ES counts `size` in COLLAPSED hits (rank-1 groups) and
        // returns each surviving group's inner hits alongside; a flat
        // limit over the hit+inner-hit rows would cut MID-GROUP. So:
        // TakeOrdered the rank-1 hits under the request sort, then
        // semi-join the inner rows back on the collapse key — the
        // ≤size key set broadcasts, so the inner rows never shuffle
        // for the cut.
        val key = collapseCol.get
        val keep = df.where(col("hit_rank") === 1)
          .orderBy(orderCols(env, sortSpec): _*).limit(n.toInt)
          .select(col(key))
        val cols = df.columns.toSeq
        df = df.join(broadcast(keep), Seq(key), "left_semi")
          .select(cols.map(col): _*)
      case JInt(n)  => df = df.orderBy(orderCols(env, sortSpec): _*).limit(n.toInt)
      case JNothing => ()
      case other    => fail(s"unsupported size: $other")
    }
    project(env, df, body \ "fields",
      extra = if (innerHits) Seq("hit_rank") else Nil)
  }

  private def hasScoreSort(s: JValue): Boolean = {
    def isScore(e: JValue): Boolean = e match {
      case JString("_score")                   => true
      case JObject(List(JField("_score", _)))  => true
      case _                                   => false
    }
    s match {
      case JArray(es) => es.exists(isScore)
      case other      => isScore(other)
    }
  }

  /** QUERY context (`sort: ["_score"]`): relevance-ranked `match` —
    * everything else in this compiler is filter context because the
    * reference never reads `_score`, but a search user does. The
    * scorer is the library's BM25 engine ([[TextOps.bm25RankedFrom]]:
    * integer-grid scores, log-free idf ratio, deterministic
    * tiebreaks), fed index relations derived from the source frame
    * itself — tf restricted to the analyzed query terms via the
    * broadcast cut (the batch operator's own first move), doc lengths
    * as the length-norm sidecar. Hits carry `score`, `rank`,
    * `n_matched` next to the projected fields — the ES hit envelope.
    */
  private def runScored(env: Env, src: DataFrame, body: JValue,
      honorSize: Boolean): DataFrame = {
    // highlighting and rescoring need the general path
    if ((body \ "highlight") != JNothing || (body \ "rescore") != JNothing)
      return runScoredTree(env, src, body, honorSize)
    val (field, queryText) = body \ "query" match {
      case JObject(List(JField("match", JObject(List(JField(f, spec)))))) =>
        val q = spec match {
          case JString(s) => s
          case o: JObject if (o \ "boost") == JNothing &&
              (o \ "operator") == JNothing =>
            o \ "query" match {
              case JString(s) => s
              case x          => fail(s"match needs query: $x")
            }
          // boosted/AND match: the general scorer handles it
          case _ => return runScoredTree(env, src, body, honorSize)
        }
        (colName(env, f), q)
      // compound query-context trees (bool/dis_max/multi_match/term/
      // constant_score) go through the general clause scorer
      case _ => return runScoredTree(env, src, body, honorSize)
    }
    val s = src.sparkSession
    import s.implicits._
    val id = env.mapping.idColumn
    val terms = queryText.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty scored match query")
    val tf = src
      .select(col(id).as("doc_id"), explode(split(col(field), " ")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val lens = src.select(col(id).as("doc_id"),
      size(split(col(field), " ")).as("dl"))
    val queries = terms.map(t => (0L, t)).toDF("query_id", "term")
    var ranked = TextOps.bm25RankedFrom(tf, lens, queries, excludeSelf = false)
    if (honorSize) body \ "size" match {
      case JInt(n)  => ranked = ranked.where(col("rank") <= n.toLong)
      case JNothing => ()
      case other    => fail(s"unsupported size: $other")
    }
    val hits = ranked.select(col("doc_id").as(id), col("score"),
      col("rank"), col("n_matched"))
    val projected = project(env, src, body \ "fields")
    hits.join(projected, Seq(id))
  }

  // ---------------------------------------------------------------------
  // Query-context scoring — the general clause scorer
  // ---------------------------------------------------------------------

  /** The BM25 integer grid unit (2^40, [[TextOps]]'s Bm25Grid device):
    * a `constant_score` boost of 1.0 scores one grid unit, so constant
    * and relevance scores stay commensurable the way ES keeps them on
    * one scale.
    */
  private val GridUnit = 1099511627776.0d

  /** Clause types the query-context scorer can lower. */
  private def isScoring(clause: JValue): Boolean = clause match {
    case JObject(List(JField(t, _))) =>
      Set("match", "term", "multi_match", "dis_max", "constant_score",
        "bool")(t)
    case _ => false
  }

  /** Compound QUERY-context trees (`sort: ["_score"]` with anything
    * beyond a single plain `match`): `bool` (must scores AND-combine
    * and sum; should scores sum over matching clauses under
    * `minimum_should_match`; filter/must_not gate without scoring —
    * ES's own scoring model), `dis_max` (+`tie_breaker`),
    * `multi_match` (`best_fields` = dis_max over per-field matches,
    * `most_fields` = their sum, `^boost` field syntax), scored `term`
    * (the single-token match through the same BM25 engine — exactly
    * how ES scores a term query), and `constant_score` (grid-scaled
    * boost).
    *
    * Determinism: every leaf score is a BM25 grid LONG
    * ([[TextOps.bm25ScoreTable]]); combinators do per-row double
    * arithmetic in fixed clause order (no cross-row float
    * accumulation), so the DuckDB mirror reproduces scores
    * bit-for-bit. Scale: each leaf frame is that clause's matching
    * docs keyed by doc_id — the inverted-index read ES itself pays —
    * and the response cut is TakeOrderedAndProject; the rank window
    * runs on ≤ `size` rows, never corpus-wide.
    */
  private def runScoredTree(env: Env, src: DataFrame, body: JValue,
      honorSize: Boolean): DataFrame = {
    val id = env.mapping.idColumn
    val scored = scoreClause(env, src, body \ "query")
    // A scored read always has a response window (re-ranking an
    // unbounded drain has no ES analog): size, defaulting to ES's 10 —
    // honored in BOTH search and drain form.
    val n = body \ "size" match {
      case JInt(k)  => k.toInt
      case JNothing => 10
      case other    => fail(s"unsupported size: $other")
    }
    val rescored = body \ "rescore" match {
      case JNothing => scored
      case r        => applyRescore(env, src, scored, n, r)
    }
    val top = rescored.orderBy(col("s").desc, col("doc_id").asc).limit(n)
    val w = Window.orderBy(col("s").desc, col("doc_id").asc)
    val ranked = top
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id").as(id), col("s").as("score"), col("rank"))
    val hits = ranked.join(project(env, src, body \ "fields"), Seq(id))
    body \ "highlight" \ "fields" match {
      case JNothing => hits
      case JObject(List(JField(f, _))) =>
        attachHighlight(env, src, hits, f, body \ "query")
      case other => fail(s"unsupported highlight: $other")
    }
  }

  /** ES highlighting inside the DSL envelope: for each hit, the
    * ±HlWindow-word fragment around the FIRST occurrence of any query
    * term targeting the highlighted field, with every such term
    * `<em>`-wrapped — [[TextOps.highlight]]'s exact per-row array
    * expressions, fed by the terms extracted from the query tree (the
    * same extraction ES's unified highlighter performs). Pure per-row
    * work after one hit-sized join against the field's words.
    */
  private def attachHighlight(env: Env, src: DataFrame, hits: DataFrame,
      field: String, query: JValue): DataFrame = {
    val id = env.mapping.idColumn
    val terms = highlightTerms(env, query, field)
    require(terms.nonEmpty, s"highlight field '$field' has no query terms")
    val hw = TextOps.HlWindow
    // typed literals via the Column API — NEVER string-interpolated
    // into expr(): a query term is request-controlled text, and a
    // quote in it would otherwise become expression injection
    val qterms = array(terms.map(lit): _*)
    val words = src.select(col(id), split(fieldCol(env, field), " ").as("words"))
    hits.join(words, Seq(id))
      .withColumn("first_pos", array_min(filter(
        transform(qterms, t => array_position(col("words"), t)),
        p => p > 0)))
      .withColumn("frag_start",
        greatest(lit(1L), col("first_pos") - lit(hw.toLong)))
      .withColumn("fragment", array_join(
        transform(
          slice(col("words"), col("frag_start").cast("int"),
            (col("first_pos") + lit(hw.toLong) - col("frag_start") + lit(1L))
              .cast("int")),
          w => when(array_contains(qterms, w),
            concat(lit("<em>"), w, lit("</em>"))).otherwise(w)),
        " "))
      .drop("words")
  }

  /** The query tree's terms targeting one field — match/term tokens
    * and multi_match queries whose field list names it, recursively
    * through bool/dis_max/constant_score; distinct and sorted (the
    * deterministic order [[TextOps.highlight]] uses).
    */
  private def highlightTerms(env: Env, q: JValue, field: String): Seq[String] = {
    def toks(text: String): Seq[String] =
      text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    def walk(c: JValue): Seq[String] = c match {
      case JObject(List(JField("match", JObject(List(JField(f, spec))))))
          if f == field => toks(matchSpec(spec)._1)
      case JObject(List(JField("term", JObject(List(JField(f, v))))))
          if f == field => v match {
        case JString(s) => Seq(s)
        case o: JObject => o \ "value" match {
          case JString(s) => Seq(s)
          case _          => Nil
        }
        case _ => Nil
      }
      case JObject(List(JField("multi_match", o: JObject))) =>
        val names = o \ "fields" match {
          case JArray(fs) => fs.collect { case JString(f) => f.split('^')(0) }
          case _          => Nil
        }
        if (names.contains(field)) o \ "query" match {
          case JString(s) => toks(s)
          case _          => Nil
        } else Nil
      case JObject(List(JField("bool", b))) =>
        Seq("must", "should", "filter", "must_not").flatMap { k =>
          (b \ k match {
            case JArray(cs) => cs
            case JNothing   => Nil
            case single     => Seq(single)
          }).flatMap(walk)
        }
      case JObject(List(JField("dis_max", d))) =>
        (d \ "queries" match {
          case JArray(cs) => cs
          case _          => Nil
        }).flatMap(walk)
      case JObject(List(JField("constant_score", cs))) => walk(cs \ "filter")
      case _ => Nil
    }
    walk(q).distinct.sorted
  }

  /** ES `rescore`: the primary retrieval's top `window_size` hits are
    * re-scored as `query_weight·primary + rescore_query_weight·
    * rescore_query_score` (zero where the rescore query misses — the
    * phrase-boost pattern, typically a `constant_score` of
    * `match_phrase`). The window cut is a TakeOrdered, the rescore
    * frame a left join onto ≤ window_size rows; `size` must fit inside
    * the window (ES returns unrescored tails otherwise — a shape with
    * no deterministic relational meaning, so it is rejected).
    */
  private def applyRescore(env: Env, src: DataFrame, scored: DataFrame,
      size: Int, r: JValue): DataFrame = {
    val window = r \ "window_size" match {
      case JInt(n)  => n.toInt
      case JNothing => 10
      case other    => fail(s"unsupported window_size: $other")
    }
    require(size <= window,
      s"rescore needs size ($size) <= window_size ($window)")
    val rq = r \ "query"
    def weight(key: String): Double = rq \ key match {
      case JNothing   => 1.0
      case JDouble(d) => d
      case JInt(n)    => n.toDouble
      case other      => fail(s"unsupported $key: $other")
    }
    val (qw, rw) = (weight("query_weight"), weight("rescore_query_weight"))
    val rescores = scoreClause(env, src, rq \ "rescore_query")
      .select(col("doc_id"), col("s").as("__rs"))
    scored.orderBy(col("s").desc, col("doc_id").asc).limit(window)
      .join(rescores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (lit(qw) * col("s") + lit(rw) * coalesce(col("__rs"), lit(0.0d))).as("s"))
  }

  /** One query-context clause → its matching-docs score frame
    * `(doc_id, s DOUBLE)`. Only matching docs appear — combinators
    * join these frames, mirroring how ES merges per-clause scorers.
    */
  private def scoreClause(env: Env, src: DataFrame, clause: JValue): DataFrame =
    clause match {
      case JObject(List(JField("match", JObject(List(JField(f, spec)))))) =>
        val (text, andOp, boost) = matchSpec(spec)
        scoreMatch(env, src, f, text, andOp, boost)
      case JObject(List(JField("term", t)))        => scoreTerm(env, src, t)
      case JObject(List(JField("multi_match", m))) => scoreMultiMatch(env, src, m)
      case JObject(List(JField("dis_max", d)))     => scoreDisMax(env, src, d)
      case JObject(List(JField("constant_score", cs))) =>
        scoreConstantScore(env, src, cs)
      case JObject(List(JField("bool", b)))        => scoreBool(env, src, b)
      case JObject(List(JField("function_score", fs))) =>
        scoreFunctionScore(env, src, fs)
      case JObject(List(JField("more_like_this", m))) =>
        scoreMoreLikeThis(env, src, m)
      case other => fail("clause not scorable in query context: " +
        JsonMethods.compact(JsonMethods.render(other)))
    }

  /** `more_like_this`: seed-term selection over the like-docs' union —
    * tf·(N+1)/(df+1), the log-free tf·idf ratio the MLT operator
    * proved, with the `min_doc_freq` gate and the
    * (score DESC, term ASC) deterministic cut at `max_query_terms` —
    * then those terms run as a standard BM25 match over the corpus
    * with the like docs excluded (ES's default `include: false`).
    * Shape: the seed relation is |likes| rows; term selection is one
    * term-keyed partial agg + a response-sized TakeOrdered; the
    * corpus-side work is the same tf explode + broadcast term cut
    * every scored match pays.
    */
  private def scoreMoreLikeThis(env: Env, src: DataFrame, m: JValue): DataFrame = {
    val id = env.mapping.idColumn
    val field = m \ "fields" match {
      case JArray(List(JString(f))) => f
      case other => fail(s"more_like_this needs exactly one field: $other")
    }
    val likes: Seq[Long] = m \ "like" match {
      case JArray(ls) if ls.nonEmpty => ls.map { l =>
        l \ "_id" match {
          case JInt(n) => n.toLong
          case other   => fail(s"unsupported like entry: $other")
        }
      }
      case other => fail(s"more_like_this needs like docs: $other")
    }
    def intOf(key: String, dflt: Int): Int = m \ key match {
      case JInt(n)  => n.toInt
      case JNothing => dflt
      case other    => fail(s"unsupported $key: $other")
    }
    val maxTerms = intOf("max_query_terms", 25) // ES default
    val minDf = intOf("min_doc_freq", 5)        // ES default
    val minTf = intOf("min_term_freq", 2)       // ES default
    val c = fieldCol(env, field)
    val pairs = src
      .select(col(id).as("doc_id"), explode(split(c, " ")).as("term"))
    // seed tf summed over the like union; df = distinct-doc frequency
    val seedTf = pairs.where(col("doc_id").isin(likes: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("stf"))
    val dfq = pairs.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = src.agg(count(lit(1)).as("n_docs"))
    val chosen = seedTf
      .join(dfq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      // ES prunes seed terms on BOTH dials before selection:
      // like-doc term frequency (min_term_freq) and corpus doc
      // frequency (min_doc_freq)
      .where(col("stf") >= minTf && col("df") >= minDf)
      .withColumn("mlt_score",
        col("stf").cast("double") *
          ((col("n_docs").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))))
      .orderBy(col("mlt_score").desc, col("term").asc)
      .limit(maxTerms)
      .select(col("term"))
    val tf = pairs
      .join(broadcast(chosen), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val lens = src.select(col(id).as("doc_id"), size(split(c, " ")).as("dl"))
    TextOps.bm25ScoreTable(tf, lens)
      .where(!col("doc_id").isin(likes: _*))
      .select(col("doc_id"), col("score").cast("double").as("s"))
  }

  /** `function_score`: `{filter, weight}` functions contribute their
    * weight where the filter matches (multiplicative identity 1,
    * additive identity 0, per `score_mode`); `gauss`/`exp`/`linear`
    * decay functions contribute the plan-time-quantized curve factor
    * ([[decayNumerators]] — driver-side transcendentals, exact dyadic
    * factors on the 2^40 grid, the [[TextOps.functionScore]]
    * integer-numerator device generalized). Combined onto the base
    * score per `boost_mode` — all per-row double arithmetic in
    * function order over exact factors, the filters compiled by the
    * same filter-context compiler.
    */
  private def scoreFunctionScore(env: Env, src: DataFrame,
      fs: JValue): DataFrame = {
    val id = env.mapping.idColumn
    val base = scoreClause(env, src, fs \ "query")
    val multiply = fs \ "score_mode" match {
      case JNothing | JString("multiply") => true
      case JString("sum")                 => false
      case other => fail(s"unsupported score_mode: $other")
    }
    val boostMultiply = fs \ "boost_mode" match {
      case JNothing | JString("multiply") => true
      case JString("sum")                 => false
      case other => fail(s"unsupported boost_mode: $other")
    }
    val identity = lit(if (multiply) 1.0 else 0.0)
    val factors = fs \ "functions" match {
      case JArray(fns) if fns.nonEmpty => fns.map { f =>
        val decayKinds = Seq("gauss", "exp", "linear")
          .filter(k => (f \ k) != JNothing)
        decayKinds match {
          case Nil =>
            val c = compileClause(env, src, f \ "filter")
            require(c.lookups.isEmpty,
              "terms lookup inside function_score is unsupported")
            val w = f \ "weight" match {
              case JNothing   => 1.0
              case JDouble(d) => d
              case JInt(n)    => n.toDouble
              case other      => fail(s"unsupported weight: $other")
            }
            when(coalesce(c.pred, lit(false)), lit(w)).otherwise(identity)
          case List(kind) =>
            val factor = decayColumn(env, kind, f \ kind)
            f \ "filter" match {
              case JNothing => factor
              case flt =>
                val c = compileClause(env, src, flt)
                require(c.lookups.isEmpty,
                  "terms lookup inside function_score is unsupported")
                when(coalesce(c.pred, lit(false)), factor).otherwise(identity)
            }
          case more => fail(s"one decay kind per function, got $more")
        }
      }
      case other => fail(s"function_score needs functions: $other")
    }
    val combined = if (multiply) factors.reduce(_ * _) else factors.reduce(_ + _)
    base.join(src.withColumnRenamed(id, "doc_id"), Seq("doc_id"))
      .select(col("doc_id"),
        (if (boostMultiply) col("s") * combined else col("s") + combined).as("s"))
  }

  /** `minimum_should_match` parse shared by both bool compilers:
    * plain non-negative integers only — ES's percent ("75%") and
    * negative ("-1") forms fail fast instead of throwing a bare
    * NumberFormatException (or silently meaning something else).
    */
  private def msmOf(v: JValue, default: => Int): Int = v match {
    case JInt(n)                         => n.toInt
    case JString(s) if s.matches("\\d+") => s.toInt
    case JString(s) => fail(
      s"unsupported minimum_should_match form '$s' (percent/negative forms unsupported)")
    case JNothing => default
    case other    => fail(s"unsupported minimum_should_match: $other")
  }

  /** 2^40 — the house integer score grid. */
  private val DecayGrid = 1099511627776L

  /** Cells in the quantized decay curve. 1024 cells over [0, 4·scale)
    * give cellWidth 1 (i.e. ZERO quantization error on integer fields)
    * whenever scale ≤ 256, and ≤0.4%-of-support resolution always.
    */
  private[graft] val DecaySteps = 1024

  /** The decay curve quantized onto the 2^40 grid: transcendentals run
    * ONCE on the driver (the geotile-cutoff device — engines never
    * agree on libm, so exp/ln must not enter a plan), emitting one
    * integer numerator per distance cell; cell `i` covers distances
    * [i·cellWidth, (i+1)·cellWidth) and takes the curve value at its
    * LOWER edge (so distance 0 is exactly 1.0). Returns (cellWidth,
    * numerators[0..DecaySteps]) — the last cell absorbs everything
    * past 4·scale. `floor(f·2^40)/2^40` is an exact dyadic rational,
    * so the factor doubles are bit-identical across engines by
    * construction. For power-of-two scales the LINEAR curve quantizes
    * EXACTLY: (1 − d/scale)·2^40 is an integer, making the factor a
    * constant multiple of the operator form's integer numerator
    * (TextOps.functionScore's `max(0, scale − d)` device) — replayed
    * in QueryDslSpec.
    */
  private[graft] def decayNumerators(kind: String, scale: Long,
      decay: Double): (Long, IndexedSeq[Long]) = {
    require(scale > 0, s"decay scale must be positive, got $scale")
    require(decay > 0.0 && decay < 1.0, s"decay must be in (0,1), got $decay")
    val cellWidth = math.max(1L, (4 * scale + DecaySteps - 1) / DecaySteps)
    val nums = (0 to DecaySteps).map { i =>
      val d = (i.toLong * cellWidth).toDouble
      val f = kind match {
        case "gauss"  => math.exp(math.log(decay) * (d / scale) * (d / scale))
        case "exp"    => math.exp(math.log(decay) * (d / scale))
        case "linear" => math.max(0.0, 1.0 - d * (1.0 - decay) / scale)
      }
      math.floor(f * DecayGrid).toLong
    }
    (cellWidth, nums)
  }

  /** One `gauss`/`exp`/`linear` decay factor as a Column: integer
    * distance → cell lookup into the plan-time numerator array → one
    * exact power-of-two division. Numeric (integer-typed) fields only —
    * the fixture's stored fields; a float/geo origin would need the
    * micro-unit device first.
    */
  private def decayColumn(env: Env, kind: String, spec: JValue): Column =
    spec match {
      case JObject(List(JField(field, params))) =>
        val cn = colName(env, field)
        def num(key: String, default: Option[Long]): Long =
          params \ key match {
            case JInt(n)    => n.toLong
            case JNothing   => default.getOrElse(fail(s"$kind needs $key"))
            case other      => fail(s"unsupported $kind $key: $other")
          }
        val origin = num("origin", None)
        val scale = num("scale", None)
        val offset = num("offset", Some(0L))
        val decay = params \ "decay" match {
          case JDouble(d) => d
          case JNothing   => 0.5 // ES default
          case other      => fail(s"unsupported decay: $other")
        }
        val (cellWidth, nums) = decayNumerators(kind, scale, decay)
        val arr = nums.mkString("array(", "L, ", "L)")
        val dist =
          s"greatest(0L, abs(CAST($cn AS BIGINT) - ${origin}L) - ${offset}L)"
        val cell = s"least($dist div ${cellWidth}L, ${DecaySteps}L)"
        expr(s"CAST(element_at($arr, CAST($cell AS INT) + 1) AS DOUBLE)" +
          s" / $DecayGrid.0")
      case other => fail(s"unsupported $kind decay spec: $other")
    }

  private def matchSpec(spec: JValue): (String, Boolean, Double) = spec match {
    case JString(q) => (q, false, 1.0)
    case o: JObject =>
      val q = o \ "query" match {
        case JString(s) => s
        case x          => fail(s"match needs query: $x")
      }
      ((q, (o \ "operator") == JString("and"), boostOf(o)))
    case other => fail(s"unsupported match spec: $other")
  }

  private def boostOf(o: JValue): Double = o \ "boost" match {
    case JNothing   => 1.0
    case JDouble(d) => d
    case JInt(n)    => n.toDouble
    case other      => fail(s"unsupported boost: $other")
  }

  /** Per-field BM25 score table derived from the source frame — tf
    * restricted to the clause terms via the broadcast-cut explode, doc
    * lengths the norm sidecar (the batch bm25 operator's own first
    * move; the arithmetic is the shared engine,
    * [[TextOps.bm25ScoreTable]]).
    */
  private def fieldScoreTable(env: Env, src: DataFrame, field: String,
      terms: Seq[String]): DataFrame = {
    val id = env.mapping.idColumn
    val c = fieldCol(env, field)
    val tf = src
      .select(col(id).as("doc_id"), explode(split(c, " ")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val lens = src.select(col(id).as("doc_id"), size(split(c, " ")).as("dl"))
    TextOps.bm25ScoreTable(tf, lens)
  }

  private def scoreMatch(env: Env, src: DataFrame, field: String,
      text: String, andOp: Boolean, boost: Double): DataFrame = {
    val terms = text.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "empty match query")
    val table = fieldScoreTable(env, src, field, terms)
    val gated =
      if (andOp) table.where(col("n_matched") === terms.size) else table
    gated.select(col("doc_id"),
      (col("score").cast("double") * lit(boost)).as("s"))
  }

  /** Scored `term`: ES scores a term query through the very same BM25
    * machinery (tf of the exact term on the keyword field) — here the
    * single-token match over the shared engine, with the fixture value
    * translation applied.
    */
  private def scoreTerm(env: Env, src: DataFrame, t: JValue): DataFrame =
    t match {
      case JObject(List(JField(field, v))) =>
        val (value, boost) = v match {
          case JString(s) => (s, 1.0)
          case o: JObject =>
            val s = o \ "value" match {
              case JString(x) => x
              case x => fail(s"scored term $field needs a string value: $x")
            }
            (s, boostOf(o))
          case other => fail(s"unsupported term: $other")
        }
        val translated = env.mapping.termValues.get(field)
          .flatMap(_.get(value)).getOrElse(value)
        fieldScoreTable(env, src, field, Seq(translated))
          .select(col("doc_id"),
            (col("score").cast("double") * lit(boost)).as("s"))
      case other => fail(s"unsupported term: $other")
    }

  private def scoreConstantScore(env: Env, src: DataFrame,
      cs: JValue): DataFrame = {
    val c = compileClause(env, src, cs \ "filter")
    require(c.lookups.isEmpty,
      "terms lookup inside scored constant_score is unsupported")
    src.where(c.pred).select(col(env.mapping.idColumn).as("doc_id"),
      lit(boostOf(cs) * GridUnit).as("s"))
  }

  /** Full-outer merge of clause score frames with the dis_max
    * combination `s = max + tieBreaker·(sum − max)` — tie_breaker 0.0
    * is the pure dis_max, 1.0 the most_fields sum. Per-row double
    * arithmetic in fixed clause order over the grid longs: both
    * engines reproduce it bit-for-bit, and no float ever accumulates
    * across rows.
    */
  private def combineMax(frames: Seq[DataFrame], tieBreaker: Double): DataFrame = {
    require(frames.nonEmpty, "dis_max needs at least one query")
    val renamed = frames.zipWithIndex.map { case (f, i) =>
      f.select(col("doc_id"), col("s").as(s"__s$i")) }
    val joined = renamed.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val sCols = frames.indices.map(i => coalesce(col(s"__s$i"), lit(0.0d)))
    val mx = if (sCols.size == 1) sCols.head else greatest(sCols: _*)
    val sm = sCols.reduce(_ + _)
    joined.select(col("doc_id"),
      (mx + lit(tieBreaker) * (sm - mx)).as("s"))
  }

  private def scoreDisMax(env: Env, src: DataFrame, d: JValue): DataFrame = {
    val qs = d \ "queries" match {
      case JArray(cs) if cs.nonEmpty => cs
      case other => fail(s"dis_max needs queries: $other")
    }
    val tb = d \ "tie_breaker" match {
      case JNothing   => 0.0
      case JDouble(x) => x
      case JInt(n)    => n.toDouble
      case other      => fail(s"unsupported tie_breaker: $other")
    }
    combineMax(qs.map(scoreClause(env, src, _)), tb)
  }

  /** `multi_match`: per-field `match` clauses (the `^boost` field
    * syntax honored) combined by type — `best_fields` is dis_max with
    * the body's tie_breaker (ES's documented equivalence),
    * `most_fields` their sum (tie_breaker 1.0 in the same formula, so
    * one arithmetic serves both).
    */
  private def scoreMultiMatch(env: Env, src: DataFrame, m: JValue): DataFrame = {
    val o = m match {
      case o: JObject => o
      case other      => fail(s"unsupported multi_match: $other")
    }
    val text = o \ "query" match {
      case JString(s) => s
      case x          => fail(s"multi_match needs query: $x")
    }
    val fields = o \ "fields" match {
      case JArray(fs) if fs.nonEmpty => fs.map {
        case JString(f) => f
        case x          => fail(s"bad multi_match field: $x")
      }
      case other => fail(s"multi_match needs fields: $other")
    }
    val andOp = (o \ "operator") == JString("and")
    val perField = fields.map { f =>
      val (name, boost) = f.split('^') match {
        case Array(n)    => (n, 1.0)
        case Array(n, b) => (n, b.toDouble)
        case _           => fail(s"bad multi_match field: $f")
      }
      scoreMatch(env, src, name, text, andOp, boost)
    }
    o \ "type" match {
      case JNothing | JString("best_fields") =>
        val tb = o \ "tie_breaker" match {
          case JNothing   => 0.0
          case JDouble(x) => x
          case JInt(n)    => n.toDouble
          case other      => fail(s"unsupported tie_breaker: $other")
        }
        combineMax(perField, tb)
      case JString("most_fields") => combineMax(perField, 1.0)
      case other => fail(s"unsupported multi_match type: $other")
    }
  }

  /** Scored `bool`: must clauses AND-combine (inner join) and their
    * scores sum; should clauses sum over the docs they match, gated by
    * `minimum_should_match` (defaulting to 1 when the bool has no
    * must/filter — ES's documented default, 0 otherwise: with msm 0 a
    * doc matching only the filter IS a hit, score 0); filter and
    * must_not gate the matching set without contributing score
    * (must_not with ES's null-safe negation). Pure-filter clauses
    * under `must` score a constant 1.0 each in query context (ES's
    * filter-vs-must scoring split). Additions run per-row in clause
    * order.
    */
  private def scoreBool(env: Env, src: DataFrame, b: JValue): DataFrame = {
    def clausesOf(name: String): Seq[JValue] = b \ name match {
      case JNothing   => Nil
      case JArray(cs) => cs
      case single     => Seq(single)
    }
    val id = env.mapping.idColumn
    val musts = clausesOf("must")
    val (scoringMusts, predMusts) = musts.partition(isScoring)
    val filters = clausesOf("filter")
    val nots = clausesOf("must_not")
    val shoulds = clausesOf("should")
    require(shoulds.forall(isScoring),
      "should clauses in query context must be scorable (wrap filters in constant_score)")
    val msm: Int = msmOf(b \ "minimum_should_match",
      if (musts.isEmpty && filters.isEmpty && shoulds.nonEmpty) 1 else 0)
    // ES scores a filter-shaped clause under `must` as a constant 1.0
    // per matching clause in query context (unlike `filter`, which
    // gates without scoring) — each becomes a constant-score frame
    // that both gates (inner must-join below) and contributes 1.0
    val predMustFrames = predMusts.map { pc =>
      val c = compileClause(env, src, pc)
      require(c.lookups.isEmpty, "terms lookup in a scored bool is unsupported")
      src.where(coalesce(c.pred, lit(false)))
        .select(col(id).as("doc_id"), lit(1.0d).as("s"))
    }
    val mustFrames = scoringMusts.map(scoreClause(env, src, _)) ++ predMustFrames
    val shouldFrames = shoulds.map(scoreClause(env, src, _))
    require(mustFrames.nonEmpty || shouldFrames.nonEmpty,
      "scored bool needs at least one scoring clause")
    val base: Option[DataFrame] = mustFrames match {
      case Nil      => None
      case f :: Nil => Some(f)
      case fs =>
        val renamed = fs.zipWithIndex.map { case (f, i) =>
          f.select(col("doc_id"), col("s").as(s"__m$i")) }
        val joined = renamed.reduce((a, b) => a.join(b, Seq("doc_id")))
        Some(joined.select(col("doc_id"),
          fs.indices.map(i => col(s"__m$i")).reduce(_ + _).as("s")))
    }
    val combined: DataFrame = (base, shouldFrames) match {
      case (Some(mf), Nil) => mf
      case (Some(mf), sfs) =>
        val joined = sfs.zipWithIndex.foldLeft(mf) { case (acc, (f, i)) =>
          acc.join(f.select(col("doc_id"), col("s").as(s"__h$i")),
            Seq("doc_id"), "left") }
        val matchedCnt = sfs.indices
          .map(i => when(col(s"__h$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
        val total = sfs.indices.map(i => coalesce(col(s"__h$i"), lit(0.0d)))
          .foldLeft(col("s"))(_ + _)
        val gated = if (msm > 0) joined.where(matchedCnt >= msm) else joined
        gated.select(col("doc_id"), total.as("s"))
      case (None, sfs) =>
        val renamed = sfs.zipWithIndex.map { case (f, i) =>
          f.select(col("doc_id"), col("s").as(s"__h$i")) }
        val joined = renamed.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
        val matchedCnt = sfs.indices
          .map(i => when(col(s"__h$i").isNotNull, 1).otherwise(0)).reduce(_ + _)
        val total = sfs.indices.map(i => coalesce(col(s"__h$i"), lit(0.0d)))
          .reduce(_ + _)
        joined.where(matchedCnt >= math.max(msm, 1))
          .select(col("doc_id"), total.as("s"))
    }
    if (filters.isEmpty && nots.isEmpty) combined
    else {
      val preds = filters.map(compileClause(env, src, _))
      val notPreds = nots.map(compileClause(env, src, _))
      require((preds ++ notPreds).forall(_.lookups.isEmpty),
        "terms lookup in a scored bool is unsupported")
      val gate = preds.map(_.pred).foldLeft(lit(true))(_ && _) &&
        notPreds.map(c => !coalesce(c.pred, lit(false)))
          .foldLeft(lit(true))(_ && _)
      val filterSet = src.where(gate).select(col(id).as("doc_id"))
      if (mustFrames.isEmpty && msm == 0)
        // ES: should with a filter context and msm 0 — the filter
        // alone defines the hit set; should clauses only ADD score, so
        // a filter-only doc is a hit with score 0 (the r13 divergence)
        filterSet.join(combined, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("s"), lit(0.0d)).as("s"))
      else combined.join(filterSet, Seq("doc_id"), "left_semi")
    }
  }

  /** Metric agg types the `aggs` compiler lowers (everything else at
    * a level is a bucket agg). `stats`, `percentiles`, and
    * `percentile_ranks` are multi-valued — they flatten to prefixed
    * columns (`{name}_count`…, `{name}_p50`, `{name}_pr_300`), the
    * relational form of ES's nested response objects.
    */
  private val MetricTypes =
    Set("sum", "avg", "min", "max", "value_count", "cardinality",
      "stats", "percentiles", "percentile_ranks")

  /** ES `aggs` tree → ONE grouped plan: each nesting level contributes
    * a bucket key (ES's nested buckets ARE a multi-column groupBy),
    * leaf metrics become aggregate expressions, and `terms` size cuts
    * apply per level as dense-rank windows over the (bucket-count-
    * sized) grouped frame — outermost first, partitioned by the outer
    * keys, ordered by (level doc_count DESC, key ASC), ES's default
    * ordering with the deterministic tiebreak. Metric determinism
    * follows the library's money rule: double sums/avgs quantize to
    * DECIMAL(18,2) (order-free) with one IEEE division at the edge;
    * `cardinality` is served EXACT (countDistinct — the q21 stance:
    * the engine can afford exactness where ES ships a sketch).
    *
    * Supported: `terms` (field, size — default 10), `date_histogram`
    * (calendar_interval day), `histogram` (numeric interval), `range`
    * (from/to array, ES key format), one bucket agg per level,
    * metrics at the leaf. Shape at scale: one partial-aggregated
    * shuffle on the composite bucket key; the cut windows run on the
    * grouped (response-sized) frame.
    */
  private def runAggs(env: Env, src: DataFrame, df: DataFrame,
      aggs: JValue): DataFrame = {
    // `filters` agg: OVERLAPPING named buckets (one doc can land in
    // several), so it cannot be a groupBy key — it compiles to the
    // conditional-aggregate + stack device (Relational.evtFiltersAgg's
    // proven shape: ONE scan, one 1-row aggregate, rows unstacked from
    // it). Top-level only, leaf metrics beneath.
    aggs match {
      case JObject(List((name, spec: JObject))) if (spec \ "filters") != JNothing =>
        return runFiltersAgg(env, df, name, spec)
      // `significant_terms`: foreground (the query context) vs
      // background (the whole index) doc frequencies, JLH-scored
      case JObject(List((name, spec: JObject)))
          if (spec \ "significant_terms") != JNothing =>
        return runSigTerms(env, src, df, name, spec \ "significant_terms")
      case _ => ()
    }
    final case class Level(outName: String, key: Column, size: Option[Int])

    def numOf(v: JValue, what: String): Double = v match {
      case JInt(n)    => n.toDouble
      case JDouble(d) => d
      case other      => fail(s"$what needs a number: $other")
    }
    def fieldOf(spec: JValue, tpe: String): String = spec \ "field" match {
      case JString(f) => f
      case other      => fail(s"$tpe needs a field: $other")
    }

    def bucketLevel(name: String, tpe: String, spec: JValue): Level = tpe match {
      case "terms" =>
        val size = spec \ "size" match {
          case JInt(n)  => n.toInt
          case JNothing => 10 // ES default
          case other    => fail(s"unsupported terms size: $other")
        }
        // `missing`: docs lacking the field land in a named bucket
        // instead of dropping out (ES's missing parameter)
        val key = spec \ "missing" match {
          case JNothing   => fieldCol(env, fieldOf(spec, "terms"))
          case JString(m) => coalesce(fieldCol(env, fieldOf(spec, "terms")), lit(m))
          case other      => fail(s"unsupported terms missing: $other")
        }
        Level(name, key, Some(size))
      case "date_histogram" =>
        spec \ "calendar_interval" match {
          case JString("day") => ()
          case other => fail(s"unsupported calendar_interval: $other")
        }
        Level(name, to_date(fieldCol(env, fieldOf(spec, "date_histogram"))), None)
      case "histogram" =>
        val interval = numOf(spec \ "interval", "histogram interval")
        val c = fieldCol(env, fieldOf(spec, "histogram"))
        Level(name, floor(c / lit(interval)) * lit(interval), None)
      case "range" =>
        val c = fieldCol(env, fieldOf(spec, "range"))
        val ranges = spec \ "ranges" match {
          case JArray(rs) => rs.map { r =>
            (r \ "from" match { case JNothing => None; case v => Some(numOf(v, "from")) },
              r \ "to" match { case JNothing => None; case v => Some(numOf(v, "to")) })
          }
          case other => fail(s"range agg needs ranges: $other")
        }
        // ES bucket keys: "from-to" with '*' for open ends; membership
        // is [from, to) — first matching range wins, ES's own order
        val key = ranges.foldLeft(when(lit(false), lit(""))) {
          case (acc, (fo, to)) =>
            val cond = (fo.map(c >= _).getOrElse(lit(true))) &&
              (to.map(c < _).getOrElse(lit(true)))
            val k = s"${fo.map(_.toString).getOrElse("*")}-${to.map(_.toString).getOrElse("*")}"
            acc.when(cond, lit(k))
        }
        Level(name, key, None)
      // Kibana-map bucket sources: the cell id expression comes from
      // the SAME generators the geo operators use (GeoOps.geohashSql's
      // integer bit interleave; geotileXSql/geotileYSql's integer
      // scale-divide + driver-computed mercator cutoffs), so the DSL
      // lowering and the operator form share one arithmetic by
      // construction. The size cut rides the generic Level machinery
      // (count DESC, cell ASC — the grid operators' pinned order).
      case "geotile_grid" | "geohash_grid" =>
        val field = fieldOf(spec, tpe)
        val (latC, lonC) = env.mapping.geoFields.getOrElse(field,
          fail(s"unmapped geo field '$field'"))
        // the generators emit arithmetic over the canonical stored
        // integer pair; an exotic mapping must fail, not mis-grid
        if (latC != "lat_micro" || lonC != "lon_micro")
          fail(s"grid aggs need (lat_micro, lon_micro) storage, got ($latC, $lonC)")
        val size = spec \ "size" match {
          case JInt(n)  => n.toInt
          case JNothing => 10000 // ES default for both grid aggs
          case other    => fail(s"unsupported $tpe size: $other")
        }
        val precision = spec \ "precision" match {
          case JInt(n)  => n.toInt
          case JNothing => if (tpe == "geohash_grid") 5 else 7 // ES defaults
          case other    => fail(s"unsupported $tpe precision: $other")
        }
        val key =
          if (tpe == "geohash_grid") expr(GeoOps.geohashSql(precision))
          else concat(lit(s"$precision/"),
            expr(s"CAST(${GeoOps.geotileXSql(precision)} AS BIGINT)").cast("string"),
            lit("/"),
            expr(s"CAST(${GeoOps.geotileYSql(precision)} AS BIGINT)").cast("string"))
        Level(name, key, Some(size))
      case other => fail(s"unsupported bucket agg: $other")
    }

    def metricCols(name: String, tpe: String, spec: JValue): Seq[Column] = {
      val c = fieldCol(env, fieldOf(spec, tpe))
      val fname = colName(env, fieldOf(spec, tpe))
      val isDouble = df.schema.find(_.name == fname)
        .map(_.dataType == org.apache.spark.sql.types.DoubleType).getOrElse(false)
      def dsum: Column =
        if (isDouble) sum(c.cast("decimal(18,2)")).cast("double") else sum(c)
      def davg: Column =
        if (isDouble)
          sum(c.cast("decimal(18,2)")).cast("double") / count(c).cast("double")
        else sum(c).cast("double") / count(c).cast("double")
      def pctName(v: Double): String =
        (if (v == v.floor) v.toLong.toString else v.toString).replace('.', '_')
      def numsOf(key: String): Seq[Double] = spec \ key match {
        case JArray(vs) => vs.map {
          case JInt(n)    => n.toDouble
          case JDouble(d) => d
          case other      => fail(s"$tpe $key needs numbers: $other")
        }
        case other => fail(s"$tpe needs $key: $other")
      }
      tpe match {
        case "sum"         => Seq(dsum.as(name))
        case "avg"         => Seq(davg.as(name))
        case "min"         => Seq(min(c).as(name))
        case "max"         => Seq(max(c).as(name))
        case "value_count" => Seq(count(c).as(name))
        case "cardinality" => Seq(countDistinct(c).as(name))
        // ES stats object, flattened: count/min/max/sum/avg
        case "stats" => Seq(
          count(c).as(s"${name}_count"),
          min(c).as(s"${name}_min"),
          max(c).as(s"${name}_max"),
          dsum.as(s"${name}_sum"),
          davg.as(s"${name}_avg"))
        // exact interpolated percentiles (the q32 device: hash-exact
        // for whole-valued fields and binary-fraction percents)
        case "percentiles" => numsOf("percents").map { p =>
          expr(s"percentile($fname, ${p / 100.0d})").as(s"${name}_p${pctName(p)}")
        }
        // inverse percentiles: fraction of valued docs at or under
        // each threshold — exact integer counts, one IEEE division
        // (the q51 device), ×100 to ES's percentage response scale
        case "percentile_ranks" => numsOf("values").map { v =>
          (sum(when(c <= v, 1L).otherwise(0L)).cast("double") /
            count(c).cast("double") * lit(100.0d))
            .as(s"${name}_pr_${pctName(v)}")
        }
      }
    }

    // `top_hits` leaf: per-bucket top-N ROWS (not aggregates) — the
    // window top-N whose partial WindowGroupLimit Catalyst places
    // before the exchange (the top_hits operator's pinned shape).
    // Bucket size cuts do not apply on this path (the response keeps
    // every bucket, each with its own hits).
    def findTopHits(node: JValue, acc: List[Level]): Option[(List[Level], JValue)] =
      node match {
        case JObject(List((name, spec: JObject))) =>
          val tpe = spec.obj.collectFirst { case (k, _) if k != "aggs" => k }
            .getOrElse(fail(s"agg '$name' has no type"))
          if (tpe == "top_hits") Some((acc, spec \ "top_hits"))
          else if (!MetricTypes(tpe)) spec \ "aggs" match {
            case JNothing => None
            case sub => findTopHits(sub, acc :+ bucketLevel(name, tpe, spec \ tpe))
          } else None
        case _ => None
      }
    // `composite` agg: ALL buckets in key order, paged by `after` —
    // ES's export workhorse. Lowers to one multi-key partial-agg
    // shuffle + the strictly-after keyset predicate (q53's device) +
    // a key-ordered TakeOrderedAndProject. Each page is one bounded
    // read; the full drain is the union of pages ≡ the unlimited
    // grouped frame.
    aggs match {
      case JObject(List((_, spec: JObject))) if (spec \ "composite") != JNothing =>
        val comp = spec \ "composite"
        val size = comp \ "size" match {
          case JInt(n)  => n.toInt
          case JNothing => 10 // ES default
          case other    => fail(s"unsupported composite size: $other")
        }
        val sources: Seq[Level] = comp \ "sources" match {
          case JArray(ss) => ss.map {
            case JObject(List((srcName, JObject(List((tpe, sspec)))))) =>
              bucketLevel(srcName, tpe, sspec)
            case other => fail(s"unsupported composite source: $other")
          }
          case other => fail(s"composite needs sources: $other")
        }
        val metrics = spec \ "aggs" match {
          case JNothing => Nil
          case JObject(entries) => entries.flatMap {
            case (n, m: JObject) =>
              val tpe = m.obj.collectFirst { case (k, _) if k != "aggs" => k }
                .getOrElse(fail(s"metric '$n' has no type"))
              require(MetricTypes(tpe), s"composite only nests metrics, got '$tpe'")
              metricCols(n, tpe, m \ tpe)
            case (n, other) => fail(s"unsupported metric '$n': $other")
          }
          case other => fail(s"unsupported aggs under composite: $other")
        }
        val keyed = sources.foldLeft(df)((d, l) => d.withColumn(l.outName, l.key))
        val aggExprs = count(lit(1)).as("doc_count") +: metrics
        var grouped = keyed
          .groupBy(sources.map(l => col(l.outName)): _*)
          .agg(aggExprs.head, aggExprs.tail: _*)
        comp \ "after" match {
          case JNothing => ()
          case JObject(afterEntries) =>
            val afterMap = afterEntries.toMap
            val keyedVals = sources.map { l =>
              val v = afterMap.getOrElse(l.outName,
                fail(s"composite after misses key '${l.outName}'"))
              val c = col(l.outName)
              val value: Column = v match {
                case JString(s) => grouped.schema.find(_.name == l.outName)
                  .map(f => lit(s).cast(f.dataType)).getOrElse(lit(s))
                case JInt(n)    => lit(n.toLong)
                case JDouble(d) => lit(d)
                case other      => fail(s"unsupported after value: $other")
              }
              (c, value)
            }
            // lexicographic strictly-after in key order (all ASC)
            val pred = keyedVals.indices.map { i =>
              val eqPrefix = keyedVals.take(i).map { case (c, v) => c === v }
                .foldLeft(lit(true))(_ && _)
              val (c, v) = keyedVals(i)
              eqPrefix && (c > v)
            }.reduce(_ || _)
            grouped = grouped.where(pred)
          case other => fail(s"unsupported composite after: $other")
        }
        return grouped
          .orderBy(sources.map(l => col(l.outName).asc): _*)
          .limit(size)
      case _ => ()
    }
    findTopHits(aggs, Nil) match {
      case Some((levels, spec)) =>
        require(levels.nonEmpty,
          "top_hits needs a bucket agg above it (a global top is sort+size)")
        val sortSpec = parseSort(env, spec \ "sort")
        val size = spec \ "size" match {
          case JInt(n)  => n.toInt
          case JNothing => 3 // ES default
          case other    => fail(s"unsupported top_hits size: $other")
        }
        val requested: Seq[String] = spec \ "fields" match {
          case JNothing   => Nil
          case JArray(fs) => fs.map {
            case JString(f) => f
            case other      => fail(s"unsupported top_hits field: $other")
          }
          case other => fail(s"unsupported top_hits fields: $other")
        }
        val keyed0 = levels.foldLeft(df)((d, l) => d.withColumn(l.outName, l.key))
        // enclosing bucket-agg size cuts apply on this path too (ES
        // keeps only the top-`size` buckets by doc count, key-asc
        // tiebroken — previously every bucket was kept, silently
        // diverging when buckets exceeded the size)
        val keyed = levels.zipWithIndex.foldLeft(keyed0) {
          case (d, (l, i)) => l.size match {
            case Some(sz) =>
              // surviving buckets via a partial-agg count + a window
              // over the BUCKET-COUNT-sized frame, semi-joined back as
              // a broadcast — never a corpus-wide unpartitioned window
              val keyNames = (levels.take(i) :+ l).map(_.outName)
              val counts = d.groupBy(keyNames.map(col): _*)
                .agg(count(lit(1)).as("__bc"))
              val wRank = Window
                .partitionBy(levels.take(i).map(x => col(x.outName)): _*)
                .orderBy(col("__bc").desc, col(l.outName).asc)
              val keep = counts.withColumn("__bk", dense_rank().over(wRank))
                .where(col("__bk") <= sz)
                .select(keyNames.map(col): _*)
              d.join(broadcast(keep), keyNames, "left_semi")
            case None => d
          }
        }
        val w = Window.partitionBy(levels.map(l => col(l.outName)): _*)
          .orderBy(orderCols(env, sortSpec): _*)
        val hits = keyed
          .withColumn("hit_rank", row_number().over(w).cast("long"))
          .where(col("hit_rank") <= size)
        val fieldCols = requested
          .flatMap(f => env.mapping.fields.get(f).filter(keyed.columns.contains))
        return hits.select((levels.map(l => col(l.outName)) ++
          Seq(col("hit_rank"), col(env.mapping.idColumn)) ++
          fieldCols.map(col)): _*)
      case None => ()
    }

    def walk(node: JValue, acc: List[Level]): (List[Level], Seq[Column]) =
      node match {
        case JObject(entries) =>
          val typed = entries.map {
            case (name, spec: JObject) =>
              val tpe = spec.obj.collectFirst { case (k, _) if k != "aggs" => k }
                .getOrElse(fail(s"agg '$name' has no type"))
              (name, tpe, spec \ tpe, spec \ "aggs")
            case (name, other) => fail(s"unsupported agg '$name': $other")
          }
          val (buckets, metrics) = typed.partition(t => !MetricTypes(t._2))
          require(buckets.size <= 1, "at most one bucket agg per level")
          buckets.headOption match {
            case Some((name, tpe, spec, sub)) =>
              require(metrics.isEmpty,
                "metrics beside a bucket at the same level are unsupported")
              val lvl = acc :+ bucketLevel(name, tpe, spec)
              sub match {
                case JNothing => (lvl, Nil)
                case s        => walk(s, lvl)
              }
            case None =>
              (acc, metrics.flatMap { case (n, t, s, sub) =>
                require(sub == JNothing, s"metric '$n' cannot nest aggs")
                metricCols(n, t, s)
              })
          }
        case other => fail(s"unsupported aggs node: $other")
      }

    val (levels, metrics) = walk(aggs, Nil)
    val aggExprs = count(lit(1)).as("doc_count") +: metrics
    val grouped =
      if (levels.isEmpty) df.agg(aggExprs.head, aggExprs.tail: _*)
      else levels.foldLeft(df)((d, l) => d.withColumn(l.outName, l.key))
        .groupBy(levels.map(l => col(l.outName)): _*)
        .agg(aggExprs.head, aggExprs.tail: _*)
    levels.zipWithIndex.foldLeft(grouped) {
      case (d, (l, i)) => l.size match {
        case Some(sz) =>
          val outer = levels.take(i).map(x => col(x.outName))
          val wSum = Window.partitionBy((outer :+ col(l.outName)): _*)
          val wRank = Window.partitionBy(outer: _*)
            .orderBy(col("__lc").desc, col(l.outName).asc)
          d.withColumn("__lc", sum(col("doc_count")).over(wSum))
            .withColumn("__rk", dense_rank().over(wRank))
            .where(col("__rk") <= sz)
            .drop("__lc", "__rk")
        case None => d
      }
    }
  }

  /** The `filters` aggregation: per named filter, doc_count + the leaf
    * metrics, computed as conditional aggregates in ONE pass and
    * unstacked to one row per filter (buckets may overlap — a doc
    * matching two filters counts in both, ES semantics). Sums coalesce
    * to typed zeros for empty buckets (ES's sum=0); min/max/avg stay
    * null (ES omits them).
    */
  private def runFiltersAgg(env: Env, df: DataFrame, name: String,
      spec: JValue): DataFrame = {
    val filterDefs: Seq[(String, Column)] = spec \ "filters" \ "filters" match {
      case JObject(entries) => entries.map { case (n, clause) =>
        val c = compileClause(env, df, clause)
        require(c.lookups.isEmpty, "terms lookup inside a filters agg is unsupported")
        n -> coalesce(c.pred, lit(false))
      }
      case other => fail(s"filters agg needs named filters: $other")
    }
    val metricDefs: Seq[(String, String, JValue)] = spec \ "aggs" match {
      case JNothing => Nil
      case JObject(entries) => entries.map {
        case (n, m: JObject) =>
          val tpe = m.obj.collectFirst { case (k, _) if k != "aggs" => k }
            .getOrElse(fail(s"metric '$n' has no type"))
          require(MetricTypes(tpe), s"filters agg only nests metrics, got '$tpe'")
          (n, tpe, m \ tpe)
        case (n, other) => fail(s"unsupported metric '$n': $other")
      }
      case other => fail(s"unsupported aggs under filters: $other")
    }
    def conditional(pred: Column, tpe: String, spec: JValue): Column = {
      val c = fieldCol(env, fieldOfSpec(spec, tpe))
      val fname = colName(env, fieldOfSpec(spec, tpe))
      val isDouble = df.schema.find(_.name == fname)
        .map(_.dataType == org.apache.spark.sql.types.DoubleType).getOrElse(false)
      val gated = when(pred, c)
      tpe match {
        case "sum" =>
          if (isDouble) coalesce(sum(gated.cast("decimal(18,2)")).cast("double"), lit(0.0d))
          else coalesce(sum(gated), lit(0L))
        case "avg" =>
          if (isDouble) sum(gated.cast("decimal(18,2)")).cast("double") /
            count(gated).cast("double")
          else sum(gated).cast("double") / count(gated).cast("double")
        case "min" => min(gated)
        case "max" => max(gated)
        case "value_count" => count(gated)
        case "cardinality" => countDistinct(gated)
      }
    }
    val aggExprs = filterDefs.zipWithIndex.flatMap { case ((_, pred), i) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"__c$i") +:
        metricDefs.zipWithIndex.map { case ((_, tpe, mspec), j) =>
          conditional(pred, tpe, mspec).as(s"__m${i}_$j")
        }
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = filterDefs.zipWithIndex.map { case ((fname, _), i) =>
      (Seq(s"'$fname'", s"__c$i") ++
        metricDefs.indices.map(j => s"__m${i}_$j")).mkString(", ")
    }.mkString(",\n  ")
    val outCols = (Seq(name, "doc_count") ++ metricDefs.map(_._1)).mkString(", ")
    one.select(expr(
      s"stack(${filterDefs.size},\n  $rows) AS ($outCols)"))
  }

  private def fieldOfSpec(spec: JValue, tpe: String): String =
    spec \ "field" match {
      case JString(f) => f
      case other      => fail(s"$tpe needs a field: $other")
    }

  /** ES `significant_terms` over a keyword field: per term, the
    * foreground doc count (the query context) against the background
    * (the index), scored with ES's JLH heuristic
    * `(fg% − bg%) · (fg% / bg%)` — per-row IEEE arithmetic over exact
    * integer counts — and only positively-correlated terms emitted
    * (fg% > bg%, ES's own gate). Shape: two key-partial-aggregated
    * scans (foreground and background), two broadcast one-row totals,
    * a response-sized TakeOrdered. The per-source sweep twin is
    * [[TextOps.sigTermsFrom]]; this is the query-anchored ES request
    * form.
    */
  private def runSigTerms(env: Env, src: DataFrame, fgDf: DataFrame,
      name: String, spec: JValue): DataFrame = {
    val key = fieldCol(env, fieldOfSpec(spec, "significant_terms"))
    val kname = colName(env, fieldOfSpec(spec, "significant_terms"))
    val size = spec \ "size" match {
      case JInt(n)  => n.toInt
      case JNothing => 10
      case other    => fail(s"unsupported significant_terms size: $other")
    }
    val fg = fgDf.groupBy(key.as(kname)).agg(count(lit(1)).as("doc_count"))
    val bg = src.groupBy(key.as(kname)).agg(count(lit(1)).as("bg_count"))
    val fgTotal = fgDf.agg(count(lit(1)).as("fg_total"))
    val bgTotal = src.agg(count(lit(1)).as("bg_total"))
    fg.join(bg, Seq(kname))
      .crossJoin(broadcast(fgTotal))
      .crossJoin(broadcast(bgTotal))
      .withColumn("fg_pct",
        col("doc_count").cast("double") / col("fg_total").cast("double"))
      .withColumn("bg_pct",
        col("bg_count").cast("double") / col("bg_total").cast("double"))
      .where(col("fg_pct") > col("bg_pct"))
      .withColumn("score",
        (col("fg_pct") - col("bg_pct")) * (col("fg_pct") / col("bg_pct")))
      .orderBy(col("score").desc, col(kname).asc)
      .limit(size)
      .select(col(kname).as(name), col("doc_count"), col("bg_count"),
        col("score"))
  }

  /** Top-level `knn` clause: exact cosine top-k with the optional
    * `filter` participating in the search (ES filtered-kNN semantics —
    * the predicate gates candidates BEFORE scoring, it never post-trims
    * the top-k; see [[VectorOps.knnFiltered]]'s rationale). The score
    * fold is [[VectorOps.dot]] — the sequential in-order form both
    * engines reproduce bit-exactly.
    */
  private def runKnn(env: Env, src: DataFrame, knn: JValue): DataFrame = {
    val field = knn \ "field" match {
      case JString(f) => env.mapping.fields.getOrElse(f, fail(s"unmapped knn field $f"))
      case other => fail(s"knn needs a field: $other")
    }
    val qv = knn \ "query_vector" match {
      case JArray(vs) => vs.map {
        case JDouble(d) => d
        case JInt(i)    => i.toDouble
        case other      => fail(s"non-numeric query_vector entry: $other")
      }
      case other => fail(s"knn needs query_vector: $other")
    }
    val k = knn \ "k" match {
      case JInt(n) => n.toInt
      case other   => fail(s"knn needs integer k: $other")
    }
    val filtered = knn \ "filter" match {
      case JNothing => src
      case f        => applyQuery(env, src, f)
    }
    // literal array SQL: exact binary fractions round-trip the text
    // form identically on both engines (the oracle mirrors this text)
    val qvSql = qv.map(d => s"CAST($d AS DOUBLE)").mkString("array(", ", ", ")")
    val id = env.mapping.idColumn
    def score(df: DataFrame): DataFrame = df
      .select(col(id),
        (expr(VectorOps.dot(field, qvSql)) /
          (sqrt(expr(VectorOps.dot(field, field))) *
            sqrt(expr(VectorOps.dot(qvSql, qvSql))))).as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
    knn \ "num_candidates" match {
      case JNothing => score(filtered)
      case JInt(nc) =>
        score(knnCandidates(env, filtered, qvSql, nc.toInt, id))
      case other => fail(s"unsupported num_candidates: $other")
    }
  }

  /** Approximate-kNN candidate generation — ES's `num_candidates`
    * semantics on the env's IVF index: walk the centroid cells in
    * query-similarity order, keep cells until the RUNNING candidate
    * total reaches `num_candidates` (the similarity-ordered cell walk
    * [[VectorOps.knnLabelPartitioned]] proved out), and restrict the
    * source to the surviving inverted lists. Exact cosine then
    * re-ranks ONLY the ≈num_candidates survivors — never a corpus-wide
    * dot product (plan-asserted in PlanAuditSpec): at 100× scale the
    * exact form is a full corpus scan per request, this form scans
    * N·probedCells/nlist. Every frame below the assignments join is
    * nlist-bounded; the assignments join keys on the list label
    * (bucket equi-join, the house ANN shape).
    */
  private def knnCandidates(env: Env, src: DataFrame, qvSql: String,
      numCandidates: Int, id: String): DataFrame = {
    val ann = env.ann.getOrElse(fail(
      "num_candidates needs an ANN index on the env (approximate knn)"))
    val sizes = ann.assignments
      .groupBy(col("assigned_label")).agg(count(lit(1)).as("cnt"))
    val qsims = ann.centroids.select(
      col("c_label").as("assigned_label"),
      (expr(VectorOps.dot("centroid", qvSql)) /
        (sqrt(col("cnrm")) * sqrt(expr(VectorOps.dot(qvSql, qvSql)))))
        .as("csim"))
    // nlist-bounded walk: the single-partition window sees ≤nlist rows
    val walk = qsims.join(sizes, Seq("assigned_label"))
      .withColumn("cum", sum(col("cnt")).over(Window
        .orderBy(col("csim").desc, col("assigned_label").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum") - col("cnt") < numCandidates)
      .select(col("assigned_label"))
    val cands = ann.assignments.join(broadcast(walk), Seq("assigned_label"))
      .select(col("vec_id").as(id))
    src.join(broadcast(cands), Seq(id))
  }

  /** Hybrid retrieval (`knn` + `query` + `rank: {rrf: ...}}` — the
    * modern ES hybrid-search request): the kNN side is the exact
    * cosine top-k ([[runKnn]], its optional `filter` honored), the
    * lexical side the general clause scorer's top
    * `rank_window_size`, and the fusion is reciprocal-rank on the
    * 2^40 integer grid (`grid div (rank_constant + rank)` — exact
    * integer arithmetic, [[graft.operators.Retrieval.hybridRrf]]'s
    * proven device; ES's 1/(k+r) floats fuse identically up to the
    * shared flooring). Both sides are TakeOrdered cuts; every window
    * runs on ≤ rank_window_size rows.
    */
  private def runHybrid(env: Env, src: DataFrame, body: JValue,
      knn: JValue, query: JValue): DataFrame = {
    val id = env.mapping.idColumn
    val rrf = body \ "rank" \ "rrf"
    val size = body \ "size" match {
      case JInt(n)  => n.toInt
      case JNothing => 10
      case other    => fail(s"unsupported size: $other")
    }
    val window = rrf \ "rank_window_size" match {
      case JInt(n)  => n.toInt
      case JNothing => size
      case other    => fail(s"unsupported rank_window_size: $other")
    }
    val rc = rrf \ "rank_constant" match {
      case JInt(n)  => n.toLong
      case JNothing => 60L
      case other    => fail(s"unsupported rank_constant: $other")
    }
    val grid = 1099511627776L // 2^40
    val vecRanked = runKnn(env, src, knn)
      .withColumn("vec_rank", row_number()
        .over(Window.orderBy(col("score").desc, col(id).asc)).cast("long"))
      .where(col("vec_rank") <= window)
      .select(col(id), col("vec_rank"))
    val lexRanked = scoreClause(env, src, query)
      .orderBy(col("s").desc, col("doc_id").asc).limit(window)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("s").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id").as(id), col("lex_rank"))
    val fused = lexRanked.join(vecRanked, Seq(id), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr(s"$grid div ($rc + lex_rank)"), lit(0L)) +
          coalesce(expr(s"$grid div ($rc + vec_rank)"), lit(0L)))
    fused
      .orderBy(col("rrf_score").desc, col(id).asc).limit(size)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("rrf_score").desc, col(id).asc)).cast("long"))
      .join(project(env, src, body \ "fields"), Seq(id))
  }

  /** ES term suggester in the `suggest` envelope ("did you mean"): for
    * each whitespace token of the request text, the top vocabulary
    * terms within the deletion-1 edit neighborhood, ranked by
    * (distance ASC, corpus frequency DESC, term ASC). The candidate
    * generator is the shared SymSpell blocking seam
    * ([[TextOps.suggestCandsFrom]] — vocab·(L+1) index rows and a key
    * equi-join, never a query×vocab cross product), fed the vocabulary
    * derived from the env frame's field (one explode → term-keyed
    * partial count, occurrences ≡ the stored index's Σtf).
    */
  private def runTermSuggest(env: Env, src: DataFrame, spec: JValue): DataFrame = {
    val text = spec \ "text" match {
      case JString(s) => s
      case other      => fail(s"suggest needs text: $other")
    }
    val field = spec \ "term" \ "field" match {
      case JString(f) => f
      case other      => fail(s"term suggester needs a field: $other")
    }
    val size = spec \ "term" \ "size" match {
      case JInt(n)  => n.toInt
      case JNothing => 5 // ES default
      case other    => fail(s"unsupported suggester size: $other")
    }
    val inputs = text.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct
    require(inputs.nonEmpty, "empty suggest text")
    val vocabFreq = src
      .select(explode(split(fieldCol(env, field), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("input_term"))
      .orderBy(col("dist").asc, col("freq").desc, col("term").asc)
    TextOps.suggestCandsFrom(vocabFreq, inputs)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= size)
      .select(col("input_term"), col("rank"), col("term").as("suggestion"),
        col("dist"), col("freq"))
  }

  /** ES phrase suggester in the `suggest` envelope (whole-phrase "did
    * you mean"): two-slot texts only — per slot the deletion-1
    * candidate set ([[TextOps.suggestCandsFrom]], the term suggester's
    * generator fed the SAME field-derived vocabulary), slot candidates
    * crossed within the phrase and rescored by the field's corpus
    * bigram language model ([[TextOps.suggestPhraseFrom]] — the batch
    * operator's exact scorer, so the compiled request and
    * `txt_suggest_phrase` agree row for row on shared inputs).
    * Longer texts fail fast (the honest-scope discipline: a silent
    * first-two-slots cut would diverge from ES).
    */
  private def runPhraseSuggest(env: Env, src: DataFrame, spec: JValue): DataFrame = {
    val text = spec \ "text" match {
      case JString(s) => s
      case other      => fail(s"suggest needs text: $other")
    }
    val field = spec \ "phrase" \ "field" match {
      case JString(f) => f
      case other      => fail(s"phrase suggester needs a field: $other")
    }
    val size = spec \ "phrase" \ "size" match {
      case JInt(n)  => n.toInt
      case JNothing => 5 // ES default
      case other    => fail(s"unsupported suggester size: $other")
    }
    val slots = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (slots.length != 2)
      fail(s"phrase suggester supports two-slot texts, got ${slots.length}")
    val vocabFreq = src
      .select(explode(split(fieldCol(env, field), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    val cands = TextOps.suggestCandsFrom(vocabFreq, slots.distinct)
    val words = src.select(split(fieldCol(env, field), " ").as("words"))
    TextOps.suggestPhraseFrom(cands, words,
      Seq((0L, slots.head, slots(1))), size)
      .select(col("rank"), col("suggestion_a"), col("suggestion_b"),
        col("bg_count"), col("dist_sum"))
  }

  /** ES completion suggester in the `suggest` envelope
    * (search-as-you-type): the field-derived vocabulary's top
    * frequency-ranked extensions of the request `prefix`, via the
    * capped prefix-key blocking ([[TextOps.suggestCompletionFrom]] —
    * the batch operator's generator, identical ranking).
    */
  private def runCompletionSuggest(env: Env, src: DataFrame,
      spec: JValue): DataFrame = {
    val prefix = spec \ "prefix" match {
      case JString(s) if s.trim.nonEmpty => s.trim
      case other => fail(s"completion suggester needs a prefix: $other")
    }
    val field = spec \ "completion" \ "field" match {
      case JString(f) => f
      case other      => fail(s"completion suggester needs a field: $other")
    }
    val size = spec \ "completion" \ "size" match {
      case JInt(n)  => n.toInt
      case JNothing => 5 // ES default
      case other    => fail(s"unsupported suggester size: $other")
    }
    val vocabFreq = src
      .select(explode(split(fieldCol(env, field), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
    TextOps.suggestCompletionFrom(vocabFreq, Seq(prefix), size)
  }

  private def resolveIndex(env: Env, idx: JValue): DataFrame = {
    val patterns = idx match {
      case JString(p)  => Seq(p)
      case JArray(ps)  => ps.map { case JString(p) => p; case o => fail(s"bad index entry $o") }
      case JNothing    => fail("request body needs an index")
      case other       => fail(s"unsupported index: $other")
    }
    patterns.map(p => env.indices.getOrElse(p, fail(
      s"unknown index pattern '$p'; valid: ${env.indices.keys.toSeq.sorted.mkString(", ")}")))
      .reduce(_.unionByName(_))
  }

  // ---------------------------------------------------------------------
  // Query context
  // ---------------------------------------------------------------------

  /** Data-dependent `terms` (the lookup form): a broadcast semi-join
    * (anti under `must_not`) — never a driver-side value list.
    */
  private final case class Lookup(column: String, values: DataFrame, anti: Boolean)

  private final case class Compiled(pred: Column, lookups: Seq[Lookup])

  private def applyQuery(env: Env, df: DataFrame, q: JValue): DataFrame = {
    val c = compileClause(env, df, q)
    val filtered = df.where(c.pred)
    c.lookups.foldLeft(filtered) { (d, l) =>
      d.join(broadcast(l.values.toDF(l.column).distinct()), Seq(l.column),
        if (l.anti) "left_anti" else "left_semi")
    }
  }

  private def compileClause(env: Env, df: DataFrame, clause: JValue): Compiled =
    clause match {
      case JObject(List(JField("bool", b)))  => compileBool(env, df, b)
      case JObject(List(JField("match_all", _))) => Compiled(lit(true), Nil)
      case JObject(List(JField("term", t)))  => Compiled(compileTerm(env, t), Nil)
      case JObject(List(JField("terms", t))) => compileTerms(env, t)
      case JObject(List(JField("range", r))) => Compiled(compileRange(env, df, r), Nil)
      case JObject(List(JField("exists", e))) => Compiled(compileExists(env, df, e), Nil)
      case JObject(List(JField("match", m))) => Compiled(compileMatch(env, m), Nil)
      case JObject(List(JField("match_phrase", m))) =>
        Compiled(compileMatchPhrase(env, m), Nil)
      case JObject(List(JField("match_bool_prefix", m))) =>
        Compiled(compileMatchBoolPrefix(env, m), Nil)
      case JObject(List(JField("prefix", p)))   => Compiled(compilePrefix(env, p), Nil)
      case JObject(List(JField("ids", i)))      => Compiled(compileIds(env, i), Nil)
      case JObject(List(JField("wildcard", w))) => Compiled(compileWildcard(env, w), Nil)
      case JObject(List(JField("fuzzy", f)))    => Compiled(compileFuzzy(env, f), Nil)
      case JObject(List(JField("geo_bounding_box", g))) =>
        Compiled(compileGeoBox(env, g), Nil)
      case JObject(List(JField("geo_distance", g))) =>
        Compiled(compileGeoDistance(env, g), Nil)
      // constant_score only changes scoring, which the filter context
      // discards — compile the wrapped filter directly
      case JObject(List(JField("constant_score", cs))) =>
        compileClause(env, df, cs \ "filter")
      case other => fail(s"unsupported query clause: ${JsonMethods.compact(JsonMethods.render(other))}")
    }

  /** `prefix`: keyword starts-with. */
  private def compilePrefix(env: Env, p: JValue): Column = p match {
    case JObject(List(JField(field, v))) =>
      val value = v match {
        case JString(s) => s
        case o: JObject => o \ "value" match {
          case JString(s) => s
          case x          => fail(s"prefix $field needs value: $x")
        }
        case other => fail(s"unsupported prefix: $other")
      }
      fieldCol(env, field).startsWith(value)
    case other => fail(s"unsupported prefix: $other")
  }

  /** `wildcard` in FILTER context: the ES pattern (`*` any run, `?`
    * one char) as a LIKE predicate on the keyword column, SQL
    * metacharacters escaped. This is the filter-context semantics; the
    * index-SERVING form (prefix-index resolution, both anchors) is
    * [[graft.operators.TextOps.wildcardSearch]].
    */
  private def compileWildcard(env: Env, w: JValue): Column = w match {
    case JObject(List(JField(field, v))) =>
      val pattern = v match {
        case JString(s) => s
        case o: JObject =>
          (o \ "value", o \ "wildcard") match {
            case (JString(s), _) => s
            case (_, JString(s)) => s
            case _ => fail(s"wildcard $field needs value")
          }
        case other => fail(s"unsupported wildcard: $other")
      }
      val like = pattern
        .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        .replace('*', '%').replace('?', '_')
      fieldCol(env, field).like(like)
    case other => fail(s"unsupported wildcard: $other")
  }

  /** `fuzzy` in FILTER context: Levenshtein gate at the requested
    * fuzziness (AUTO = ES's length ladder). The index-serving form
    * (deletion-1-blocked expansion) is
    * [[graft.operators.TextOps.fuzzyQuery]].
    */
  private def compileFuzzy(env: Env, f: JValue): Column = f match {
    case JObject(List(JField(field, v))) =>
      val (value, fuzziness) = v match {
        case JString(s) => (s, "AUTO")
        case o: JObject =>
          val s = o \ "value" match {
            case JString(x) => x
            case x          => fail(s"fuzzy $field needs value: $x")
          }
          val fz = o \ "fuzziness" match {
            case JNothing   => "AUTO"
            case JString(x) => x
            case JInt(n)    => n.toString
            case x          => fail(s"unsupported fuzziness: $x")
          }
          (s, fz)
        case other => fail(s"unsupported fuzzy: $other")
      }
      val maxEdits = fuzziness match {
        case "AUTO" =>
          if (value.length < 3) 0 else if (value.length <= 5) 1 else 2
        case n => n.toInt
      }
      levenshtein(fieldCol(env, field), lit(value)) <= maxEdits
    case other => fail(s"unsupported fuzzy: $other")
  }

  private def geoCols(env: Env, field: String): (Column, Column) =
    env.mapping.geoFields.get(field) match {
      case Some((latC, lonC)) => (col(latC), col(lonC))
      case None => fail(s"unmapped geo field '$field'")
    }

  private def geoNum(v: JValue, what: String): Double = v match {
    case JInt(n)    => n.toDouble
    case JDouble(d) => d
    case other      => fail(s"$what needs a number: $other")
  }

  /** Degrees → the stored integer microdegrees, converted driver-side
    * (exact literals enter the plan; GeoOps's lat+90/lon+180 offsets).
    */
  private def latMicro(v: JValue, what: String): Long =
    Math.round((geoNum(v, what) + 90.0) * 1000000.0)
  private def lonMicro(v: JValue, what: String): Long =
    Math.round((geoNum(v, what) + 180.0) * 1000000.0)

  /** `geo_bounding_box`: four integer compares on the microdegree
    * columns, edges inclusive — the indexed-integer membership a real
    * deployment evaluates (GeoOps.geoBbox's shape).
    */
  private def compileGeoBox(env: Env, g: JValue): Column = g match {
    case JObject(List(JField(field, spec))) =>
      val (latC, lonC) = geoCols(env, field)
      val top = latMicro(spec \ "top_left" \ "lat", "top_left.lat")
      val left = lonMicro(spec \ "top_left" \ "lon", "top_left.lon")
      val bottom = latMicro(spec \ "bottom_right" \ "lat", "bottom_right.lat")
      val right = lonMicro(spec \ "bottom_right" \ "lon", "bottom_right.lon")
      latC >= bottom && latC <= top && lonC >= left && lonC <= right
    case other => fail(s"unsupported geo_bounding_box: $other")
  }

  /** `geo_distance`: flat-space squared-Euclid in microdegrees — the
    * geoRings convention (the synthetic coordinates carry no real
    * curvature to honor, and haversine's transcendentals are exactly
    * what cross-engine bit-exactness cannot use). Distance is given in
    * micro units: a number, or a string with the `micro` suffix.
    * Exact 64-bit arithmetic: the worst-case squared diff (360·10^6)²
    * ≈ 1.3·10^17 sits well under 2^63.
    */
  private def compileGeoDistance(env: Env, g: JValue): Column = g match {
    case JObject(entries) =>
      val m = entries.toMap
      val dist: Long = m.getOrElse("distance", fail("geo_distance needs distance")) match {
        case JInt(n) => n.toLong
        case JString(s) if s.endsWith("micro") =>
          s.stripSuffix("micro").trim.toLong
        case other => fail(s"unsupported geo_distance distance: $other")
      }
      entries.filterNot(_._1 == "distance") match {
        case List((field, center)) =>
          val (latC, lonC) = geoCols(env, field)
          val cy = latMicro(center \ "lat", "geo_distance lat")
          val cx = lonMicro(center \ "lon", "geo_distance lon")
          val dx = lonC - lit(cx)
          val dy = latC - lit(cy)
          (dx * dx + dy * dy) < lit(dist * dist)
        case _ => fail("geo_distance needs exactly one geo field")
      }
    case other => fail(s"unsupported geo_distance: $other")
  }

  /** `ids`: hits by document id (the `_id` analog column). */
  private def compileIds(env: Env, i: JValue): Column = i \ "values" match {
    case JArray(vs) =>
      col(env.mapping.idColumn).isin(vs.map {
        case JInt(n)    => n.toLong
        case JString(s) => s
        case other      => fail(s"unsupported id value: $other")
      }: _*)
    case other => fail(s"ids needs values: $other")
  }

  /** `bool` semantics in filter context (the reference uses no scoring
    * anywhere — every query is `_source:false` + `fields`):
    * `filter`≡`must` (AND), `must_not` is the NULL-SAFE negation (a row
    * whose field is absent MATCHES `must_not term` — ES negates the
    * positive match, so SQL three-valued NOT needs the coalesce),
    * `should` participates only when `minimum_should_match` is set or
    * the bool has no must/filter (ES's documented default of 1 in that
    * case).
    */
  private def compileBool(env: Env, df: DataFrame, b: JValue): Compiled = {
    def clausesOf(name: String): Seq[JValue] = b \ name match {
      case JNothing   => Nil
      case JArray(cs) => cs
      case single     => Seq(single)
    }
    val musts = (clausesOf("filter") ++ clausesOf("must"))
      .map(compileClause(env, df, _))
    val nots = clausesOf("must_not").map(compileClause(env, df, _))
    val shoulds = clausesOf("should").map(compileClause(env, df, _))
    require(shoulds.forall(_.lookups.isEmpty),
      "terms lookup under should is unsupported (no relational form of optional semi-join)")
    val msm: Int = msmOf(b \ "minimum_should_match",
      if (musts.isEmpty && shoulds.nonEmpty) 1 else 0)
    val mustPred = musts.map(_.pred).foldLeft(lit(true))(_ && _)
    val notPred = nots.map(c => !coalesce(c.pred, lit(false)))
      .foldLeft(lit(true))(_ && _)
    val shouldPred =
      if (shoulds.isEmpty || msm <= 0) lit(true)
      else if (msm == 1) shoulds.map(c => coalesce(c.pred, lit(false))).reduce(_ || _)
      else shoulds.map(c => when(coalesce(c.pred, lit(false)), 1).otherwise(0))
        .reduce(_ + _) >= msm
    val notLookups = nots.flatMap(_.lookups).map(_.copy(anti = true))
    Compiled(mustPred && notPred && shouldPred,
      musts.flatMap(_.lookups) ++ notLookups)
  }

  /** `term`: exact value equality, with the per-field fixture value
    * translation applied (Mapping.termValues).
    */
  private def compileTerm(env: Env, t: JValue): Column = t match {
    case JObject(List(JField(field, v))) =>
      val value = v match {
        case JObject(fs) => fs.toMap.getOrElse("value", fail(s"term $field needs value"))
        case simple      => simple
      }
      fieldCol(env, field) === termLit(env, field, value)
    case other => fail(s"unsupported term: $other")
  }

  private def compileTerms(env: Env, t: JValue): Compiled = t match {
    case JObject(List(JField(field, JArray(vs)))) =>
      Compiled(fieldCol(env, field).isin(vs.map(termLitValue(env, field, _)): _*), Nil)
    case JObject(List(JField(field, spec: JObject))) =>
      // terms LOOKUP: { index, path } — the data-dependent form
      val idx = spec \ "index" match {
        case JString(i) => i
        case o          => fail(s"terms lookup needs index: $o")
      }
      val path = spec \ "path" match {
        case JString(p) => p
        case o          => fail(s"terms lookup needs path: $o")
      }
      val frame = env.lookups.getOrElse(idx, fail(
        s"unknown lookup index '$idx'; valid: ${env.lookups.keys.toSeq.sorted.mkString(", ")}"))
      val pathCol = env.mapping.fields.getOrElse(path, path)
      Compiled(lit(true),
        Seq(Lookup(colName(env, field), frame.select(col(pathCol)), anti = false)))
    case other => fail(s"unsupported terms: $other")
  }

  /** `range`: timestamp fields resolve ES date math against the pinned
    * `now` with the SAME driver-side day arithmetic as
    * [[Tables.trailingWithBound]], and a `gte`/`gt` lower bound is
    * restated on the raw scan twin for row-group pruning. Non-ts
    * fields compare numerically.
    */
  private def compileRange(env: Env, df: DataFrame, r: JValue): Column = r match {
    case JObject(List(JField(field, JObject(bounds)))) =>
      val c = fieldCol(env, field)
      val isTs = env.mapping.tsFields.contains(field)
      if (isTs && env.now == null) return lit(false) // empty source: no `now`, no rows
      bounds.map {
        case (op, v) =>
          val resolved: (Column, Option[java.time.Instant]) =
            if (isTs) {
              val t = resolveDateMath(env, v)
              (lit(t), Some(t.toInstant))
            } else (rangeLit(v), None)
          val (value, instant) = resolved
          val cmp = op match {
            case "gte" => c >= value
            case "gt"  => c > value
            case "lte" => c <= value
            case "lt"  => c < value
            case other => fail(s"unsupported range op $other")
          }
          // lower bounds prune at the parquet scan via the raw twin;
          // upper bounds stay derived-only (no twin exists — a pruning
          // hint, never the filter of record, so correctness holds)
          if (isTs && (op == "gte" || op == "gt"))
            cmp && Tables.rawTsAtLeast(df, instant.get)
          else cmp
      }.reduce(_ && _)
    case other => fail(s"unsupported range: $other")
  }

  /** `exists`: field has a value — for array-typed columns ES indexes
    * no value for an empty array, so exists ≡ non-null AND non-empty.
    */
  private def compileExists(env: Env, df: DataFrame, e: JValue): Column = {
    val field = e \ "field" match {
      case JString(f) => f
      case other      => fail(s"exists needs a field: $other")
    }
    val name = colName(env, field)
    val c = col(name)
    df.schema.find(_.name == name).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.ArrayType(_, _)) =>
        c.isNotNull && size(c) > 0
      case _ => c.isNotNull
    }
  }

  /** `match` in filter context: whitespace-analyzed query, OR over
    * per-token membership in the field's token set (`operator: and`
    * requires all). Matches the library's whitespace tokenization
    * ([[graft.operators.TextOps]]'s `words` convention).
    */
  private def compileMatch(env: Env, m: JValue): Column = m match {
    case JObject(List(JField(field, spec))) =>
      val (queryText, andOp) = spec match {
        case JString(q)  => (q, false)
        case o: JObject  =>
          val q = o \ "query" match {
            case JString(s) => s
            case x          => fail(s"match needs query: $x")
          }
          val op = o \ "operator" match {
            case JString("and") => true
            case _              => false
          }
          (q, op)
        case other => fail(s"unsupported match spec: $other")
      }
      val c = fieldCol(env, field)
      val toks = queryText.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      require(toks.nonEmpty, "empty match query")
      val per = toks.map(t => array_contains(split(c, " "), t))
      if (andOp) per.reduce(_ && _) else per.reduce(_ || _)
    case other => fail(s"unsupported match: $other")
  }

  /** `match_phrase`: token adjacency — the padded-text containment form
    * (` t1 t2 ` inside ` text `), exact for whitespace tokenization.
    */
  private def compileMatchPhrase(env: Env, m: JValue): Column = m match {
    case JObject(List(JField(field, spec))) =>
      val queryText = spec match {
        case JString(q) => q
        case o: JObject => o \ "query" match {
          case JString(s) => s
          case x          => fail(s"match_phrase needs query: $x")
        }
        case other => fail(s"unsupported match_phrase spec: $other")
      }
      val c = fieldCol(env, field)
      val needle = " " + queryText.trim.split("\\s+").mkString(" ") + " "
      instr(concat(lit(" "), c, lit(" ")), needle) > 0
    case other => fail(s"unsupported match_phrase: $other")
  }

  /** `match_bool_prefix`: every token a term match, the LAST a prefix
    * over the field's tokens (search-as-you-type's bool member).
    */
  private def compileMatchBoolPrefix(env: Env, m: JValue): Column = m match {
    case JObject(List(JField(field, spec))) =>
      val queryText = spec match {
        case JString(q) => q
        case o: JObject => o \ "query" match {
          case JString(s) => s
          case x          => fail(s"match_bool_prefix needs query: $x")
        }
        case other => fail(s"unsupported match_bool_prefix spec: $other")
      }
      val c = fieldCol(env, field)
      val toks = queryText.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      require(toks.nonEmpty, "empty match_bool_prefix query")
      val full = toks.init.map(t => array_contains(split(c, " "), t))
      val last = exists(split(c, " "), w => w.startsWith(toks.last))
      (full :+ last).reduce(_ && _)
    case other => fail(s"unsupported match_bool_prefix: $other")
  }

  // ---------------------------------------------------------------------
  // Sort / paging / collapse / projection
  // ---------------------------------------------------------------------

  private final case class SortKey(column: String, asc: Boolean)

  private def parseSort(env: Env, s: JValue): Seq[SortKey] = {
    def one(f: String, dir: JValue): SortKey = dir match {
      case JString("asc")  => SortKey(colName(env, f), asc = true)
      case JString("desc") => SortKey(colName(env, f), asc = false)
      case o: JObject => o \ "order" match {
        case JString("asc")  => SortKey(colName(env, f), asc = true)
        case JString("desc") => SortKey(colName(env, f), asc = false)
        case other           => fail(s"unsupported sort order: $other")
      }
      case other => fail(s"unsupported sort dir: $other")
    }
    s match {
      case JNothing => Nil
      case JArray(entries) => entries.map {
        case JObject(List(JField(f, dir))) => one(f, dir)
        case JString(f)                    => SortKey(colName(env, f), asc = true)
        case other                         => fail(s"unsupported sort entry: $other")
      }
      case JObject(List(JField(f, dir))) => Seq(one(f, dir))
      case other => fail(s"unsupported sort: $other")
    }
  }

  /** Total order for size cuts: the body's sort keys plus the id
    * tiebreaker ES lacks (SURVEY.md §7.4 risk 2) — same direction as
    * the last sort key, matching
    * [[graft.operators.Assets.collapseLatest]]'s (ts desc, id desc).
    */
  private def orderCols(env: Env, sortSpec: Seq[SortKey]): Seq[Column] = {
    val id = env.mapping.idColumn
    val tieAsc = sortSpec.lastOption.forall(_.asc)
    sortSpec.map(k => if (k.asc) col(k.column).asc else col(k.column).desc) :+
      (if (tieAsc) col(id).asc else col(id).desc)
  }

  /** `search_after`: strictly-after keyset predicate over the sort
    * tuple — q53_keyset_page's device, directions per key.
    */
  private def keysetAfter(env: Env, df: DataFrame, sortSpec: Seq[SortKey],
      values: List[JValue]): Column = {
    require(sortSpec.nonEmpty && sortSpec.size == values.size,
      s"search_after needs one value per sort key (${sortSpec.size} keys, ${values.size} values)")
    val keyed = sortSpec.zip(values).map { case (k, v) =>
      val c = col(k.column)
      val dtype = df.schema.find(_.name == k.column).map(_.dataType)
      val value: Column = (v, dtype) match {
        case (JInt(n), Some(org.apache.spark.sql.types.TimestampType)) =>
          // ES sort values for date fields are epoch millis
          expr(s"timestamp_millis(${n}L)")
        case (JInt(n), _)    => lit(n.toLong)
        case (JDouble(d), _) => lit(d)
        case (JString(s), Some(t)) => lit(s).cast(t)
        case (JString(s), None)    => lit(s)
        case (other, _) => fail(s"unsupported search_after value: $other")
      }
      (c, value, k.asc)
    }
    // lexicographic strictly-after: OR over prefixes
    keyed.indices.map { i =>
      val equalPrefix = keyed.take(i).map { case (c, v, _) => c === v }
        .foldLeft(lit(true))(_ && _)
      val (c, v, asc) = keyed(i)
      equalPrefix && (if (asc) c > v else c < v)
    }.reduce(_ || _)
  }

  /** `collapse`: top-1 per key under the body's sort + id tiebreaker —
    * the window form whose partial WindowGroupLimit keeps the shuffle
    * ~1 row per key (Assets.collapseLatest's measured rationale).
    */
  private def collapseTop1(env: Env, df: DataFrame, field: String,
      sortSpec: Seq[SortKey]): DataFrame = {
    val w = Window.partitionBy(col(colName(env, field)))
      .orderBy(orderCols(env, sortSpec): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** `collapse` with `inner_hits`: ES keeps the top-1 per group as the
    * hit AND returns the group's top-`size` rows alongside it. The
    * relational form is the per-group window top-N with the rank kept
    * as `hit_rank` (1 = the collapsed hit itself) — the q75_top_hits
    * device, whose partial WindowGroupLimit Catalyst places BEFORE the
    * exchange (plan-asserted), so the shuffle carries ≤size rows per
    * group, not the group. The inner sort defaults to the request sort
    * (ES's default) and may override via `inner_hits.sort`.
    */
  private def collapseInner(env: Env, df: DataFrame, field: String,
      sortSpec: Seq[SortKey], ih: JValue): DataFrame = {
    val size = ih \ "size" match {
      case JInt(n)  => n.toInt
      case JNothing => 3 // ES default
      case other    => fail(s"unsupported inner_hits size: $other")
    }
    val innerSort = ih \ "sort" match {
      case JNothing => sortSpec
      case s        => parseSort(env, s)
    }
    val w = Window.partitionBy(col(colName(env, field)))
      .orderBy(orderCols(env, innerSort): _*)
    df.withColumn("hit_rank", row_number().over(w).cast("long"))
      .where(col("hit_rank") <= size)
  }

  /** `fields` projection: the id column (ES returns `_id` on every
    * hit) plus each requested field in body order; wildcard patterns
    * expand through the family map in schema order; unmapped or absent
    * fields project to nothing (ES returns no entry for them).
    */
  private def project(env: Env, df: DataFrame, fieldsJ: JValue,
      extra: Seq[String] = Nil): DataFrame = {
    val requested: Seq[String] = fieldsJ match {
      case JNothing   => Nil
      case JArray(fs) => fs.map {
        case JString(f)                         => f
        case JObject(List(JField("field", JString(f)))) => f
        case other => fail(s"unsupported fields entry: $other")
      }
      case other => fail(s"unsupported fields: $other")
    }
    val cols = requested.flatMap { f =>
      if (f.endsWith("*"))
        env.mapping.families.get(f).toSeq
          .flatMap(pfx => df.columns.filter(_.startsWith(pfx)))
      else env.mapping.fields.get(f).filter(df.columns.contains)
    }
    val all = ((env.mapping.idColumn +: extra) ++ cols).distinct
    df.select(all.map(col): _*)
  }

  // ---------------------------------------------------------------------
  // Leaf helpers
  // ---------------------------------------------------------------------

  private def colName(env: Env, field: String): String =
    env.mapping.fields.getOrElse(field, fail(s"unmapped field '$field'"))

  private def fieldCol(env: Env, field: String): Column = col(colName(env, field))

  private def termLitValue(env: Env, field: String, v: JValue): Any = v match {
    case JString(s) =>
      env.mapping.termValues.get(field).flatMap(_.get(s)).getOrElse(s)
    case JInt(n)    => n.toLong
    case JDouble(d) => d
    case JBool(b)   => b
    case other      => fail(s"unsupported term value: $other")
  }

  private def termLit(env: Env, field: String, v: JValue): Column =
    lit(termLitValue(env, field, v))

  private def rangeLit(v: JValue): Column = v match {
    case JInt(n)    => lit(n.toLong)
    case JDouble(d) => lit(d)
    case JString(s) => lit(s)
    case other      => fail(s"unsupported range value: $other")
  }

  private val DateMathRe = """now(?:([+-])(\d+)([smhdw]))?""".r

  /** ES date math against the pinned `now` — driver-side Duration
    * arithmetic, identical to [[Tables.trailingWithBound]]'s day path
    * so compiled windows are bit-equal to the hand-written pipelines'.
    */
  private def resolveDateMath(env: Env, v: JValue): java.sql.Timestamp = {
    val raw = v match {
      case JString(s) => s
      case other      => fail(s"unsupported date-math value: $other")
    }
    val s = env.mapping.dateMath.getOrElse(raw, raw)
    s match {
      case DateMathRe(null, null, null) => env.now
      case DateMathRe(sign, n, unit) =>
        val d = unit match {
          case "s" => java.time.Duration.ofSeconds(n.toLong)
          case "m" => java.time.Duration.ofMinutes(n.toLong)
          case "h" => java.time.Duration.ofHours(n.toLong)
          case "d" => java.time.Duration.ofDays(n.toLong)
          case "w" => java.time.Duration.ofDays(7L * n.toLong)
        }
        val i = env.now.toInstant
        java.sql.Timestamp.from(if (sign == "-") i.minus(d) else i.plus(d))
      case iso =>
        // plain timestamp literal
        java.sql.Timestamp.valueOf(iso.replace('T', ' ').stripSuffix("Z"))
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"QueryDsl: $msg")
}
