package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.pipeline.Curation

/** Round-17 pack, session-2 second batch — the release-gate LIFECYCLE
  * after the ship: q459 propagates a takedown queue through the
  * derived training artifacts (dup-family representatives, packed
  * sequences), q460 prices a benchmark refresh (which already-released
  * docs the NEW eval slice contaminates, and which released docs must
  * be pulled because they just became holdout).
  *
  * Both are the operations a 100 TB corpus owner runs between releases:
  * not "rebuild the corpus" but "what is the minimal rewrite set" —
  * id-grain manifests, broadcast-sized reference sets, one corpus scan.
  * They complete the governance family beside q340 (relational erasure
  * census), q220 (event-store erasure), and the q456 release gate.
  */
object Pipeline98 {

  /** q459 fixture: base docs plus two exact re-publications (+30M/+60M)
    * of every 7th doc — multi-member digest families whose REP (the
    * min-id member, the only copy that shipped) may or may not be in
    * the takedown queue. Content-derived, so both engines synthesize
    * the identical corpus, and replica offsets (r·1e8) never collide
    * with the +r·3e7 copy ids. */
  private[queries] def takedownCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    base.union(base.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), lit(2))).as("r"))
      .select((col("doc_id") + col("r") * 30000000L).as("doc_id"),
        lit("republish").as("source"), col("text")))
  }

  val entries: Seq[QEntry] = Seq(

    // Takedown propagation: the queue has two content-derived arms —
    // individual docs (id-draw % 23 = 11: a DMCA notice names one URL)
    // and whole digest families (text-draw % 31 = 4: the CONTENT is the
    // problem, so every mirror goes, however it arrived). The manifest
    // answers "what do we actually rewrite": a removed doc that never
    // shipped (it was collapsed as a dup under min-id-keep) costs
    // nothing ('removed_unshipped'); a removed REP re-elects the next
    // smallest survivor ('re_elected', the family's shipped copy is
    // replaced) or kills the family outright ('family_removed'); and
    // every 256-token pack bin holding a removed rep is flagged
    // 'rebuild' (bin-local repair — repacking the whole source would
    // shift every later bin, the policy the scaladoc trade documents).
    // Scale shape: one digest group-by, one keyed join back, one
    // source-partitioned packing window over REPS only — id-grain
    // output, nothing corpus-sized on the driver.
    QEntry("q459_takedown_propagation",
      (s, d) => {
        val draw = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
          16, 10).cast("long")
        val famDraw = conv(substring(md5(col("text")), 3, 4), 16, 10)
          .cast("long")
        val t = takedownCorpus(s, d)
          .select(col("doc_id"), col("source"),
            (draw % 23 === 11 || famDraw % 31 === 4).as("td"),
            md5(col("text")).as("k"),
            size(split(lower(col("text")), "\\s+")).cast("long")
              .as("n_tok"))
          .persist(StorageLevel.MEMORY_AND_DISK) // family agg + join back
        val fam = t.groupBy(col("k")).agg(
          min(col("doc_id")).as("old_rep"),
          count(lit(1)).as("n_members"),
          sum(when(col("td"), 1L).otherwise(0L)).as("n_removed"),
          min(when(!col("td"), col("doc_id"))).as("new_rep"))
        val docs = t.join(fam.select(col("k"), col("old_rep")), "k")
        val drows = docs.filter(col("td"))
          .select(lit("doc").as("kind"),
            col("doc_id").cast("string").as("artifact_id"),
            when(col("doc_id") === col("old_rep"), "removed_shipped")
              .otherwise("removed_unshipped").as("action"),
            lit(null).cast("long").as("new_rep"),
            lit(1L).as("n_affected"))
        val frows = fam
          .filter(col("n_removed") > 0 &&
            (col("new_rep").isNull || col("new_rep") =!= col("old_rep")))
          .select(lit("family").as("kind"),
            col("old_rep").cast("string").as("artifact_id"),
            when(col("new_rep").isNull, "family_removed")
              .otherwise("re_elected").as("action"),
            col("new_rep"),
            when(col("new_rep").isNull, col("n_members"))
              .otherwise(col("n_members") - col("n_removed"))
              .cast("long").as("n_affected"))
        val reps = docs.filter(col("doc_id") === col("old_rep"))
          .select(col("doc_id"), col("source"), col("n_tok"), col("td"))
        val prows = Curation
          .packSequences(reps, "doc_id", "source", "n_tok", 256)
          .groupBy(col("source"), col("bin_id"))
          .agg(sum(when(col("td"), 1L).otherwise(0L)).as("nr"))
          .filter(col("nr") > 0)
          .select(lit("pack").as("kind"),
            concat(col("source"), lit("#"),
              col("bin_id").cast("string")).as("artifact_id"),
            lit("rebuild").as("action"),
            lit(null).cast("long").as("new_rep"),
            col("nr").cast("long").as("n_affected"))
        drows.union(frows).union(prows)
          .orderBy(col("kind"), col("artifact_id"))
      },
      Some("""WITH corpus AS (
                SELECT doc_id, source, text FROM documents
                UNION ALL
                SELECT doc_id + r * 30000000, 'republish', text
                FROM documents, (SELECT unnest(generate_series(1, 2)) AS r) r
                WHERE doc_id % 7 = 0),
              t AS (
                SELECT doc_id, source, md5(text) AS k,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT % 23 = 11 OR
                  ('0x' || substr(md5(text), 3, 4))::BIGINT % 31 = 4 AS td,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS n_tok
                FROM corpus),
              fam AS (
                SELECT k, min(doc_id) AS old_rep, count(*) AS n_members,
                  sum(CASE WHEN td THEN 1 ELSE 0 END) AS n_removed,
                  min(CASE WHEN NOT td THEN doc_id END) AS new_rep
                FROM t GROUP BY k),
              docs AS (
                SELECT t.doc_id, t.source, t.td, t.n_tok, f.old_rep
                FROM t JOIN fam f USING (k)),
              drows AS (
                SELECT 'doc' AS kind, CAST(doc_id AS VARCHAR) AS artifact_id,
                  CASE WHEN doc_id = old_rep THEN 'removed_shipped'
                    ELSE 'removed_unshipped' END AS action,
                  CAST(NULL AS BIGINT) AS new_rep,
                  CAST(1 AS BIGINT) AS n_affected
                FROM docs WHERE td),
              frows AS (
                SELECT 'family', CAST(old_rep AS VARCHAR),
                  CASE WHEN new_rep IS NULL THEN 'family_removed'
                    ELSE 're_elected' END,
                  new_rep,
                  CAST(CASE WHEN new_rep IS NULL THEN n_members
                    ELSE n_members - n_removed END AS BIGINT)
                FROM fam
                WHERE n_removed > 0
                  AND (new_rep IS NULL OR new_rep != old_rep)),
              reps AS (
                SELECT doc_id, source, n_tok, td FROM docs
                WHERE doc_id = old_rep),
              packs AS (
                SELECT source, td,
                  CAST(floor((cum_tok - n_tok) / 256.0) AS BIGINT) AS bin_id
                FROM (SELECT doc_id, source, n_tok, td,
                    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS cum_tok
                  FROM reps)),
              prows AS (
                SELECT 'pack', source || '#' || CAST(bin_id AS VARCHAR),
                  'rebuild', CAST(NULL AS BIGINT),
                  CAST(sum(CASE WHEN td THEN 1 ELSE 0 END) AS BIGINT)
                FROM packs GROUP BY source, bin_id
                HAVING sum(CASE WHEN td THEN 1 ELSE 0 END) > 0)
              SELECT kind, artifact_id, action, new_rep, n_affected
              FROM (SELECT * FROM drows UNION ALL SELECT * FROM frows
                    UNION ALL SELECT * FROM prows)
              ORDER BY kind, artifact_id""")),

    // Eval-refresh delta: a new benchmark slice (id % 43 = 5) joins the
    // holdout. Pricing the refresh WITHOUT re-running the gate: (a)
    // released docs that are themselves in the new slice get pulled
    // ('now_holdout' — an id-grain filter); (b) the NEW gram set (6-gram
    // types of the refreshed eval MINUS the old eval's — computed on two
    // fixed-size eval frames, broadcast) convicts released docs that
    // were clean under the old set ('newly_contaminated', with the
    // distinct new-gram hit count). The planted crawl mirrors of
    // new-slice docs (+60M, 'mirror post' prefix) were invisible to the
    // old decontamination by construction and MUST be convicted now.
    // Scale shape: the corpus is scanned for grams against broadcast
    // reference sets only; the eval-side work (gram diff) is
    // eval-sized, not corpus-sized — a benchmark refresh on 100 TB
    // costs one scan, not a gate re-run.
    QEntry("q460_eval_refresh_delta",
      (s, d) => {
        val isEval0 = col("doc_id") % 41 === 3 && col("doc_id") < 10000000L
        val isNew = col("doc_id") % 43 === 5 &&
          !(col("doc_id") % 41 === 3) && col("doc_id") < 10000000L
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val corpus = base.union(base.filter(isNew)
            .select((col("doc_id") + 60000000L).as("doc_id"),
              lit("crawl_mirror").as("source"),
              concat(lit("mirror post "), col("text")).as("text")))
          .persist(StorageLevel.MEMORY_AND_DISK) // eval grams + scan
        def grams(df: DataFrame): DataFrame = df.select(col("doc_id"),
            explode(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 6, distinct = true))
              .as("g"))
          .select(col("doc_id"), md5(col("g")).as("gh"))
        val ev0g = grams(corpus.filter(isEval0)).select(col("gh")).distinct()
        // grams(eval0 ∪ new) \ ev0g ≡ grams(new) \ ev0g — the old
        // slice's grams are all in ev0g, so only the new slice is read
        val newg = grams(corpus.filter(isNew)).select(col("gh")).distinct()
          .join(ev0g, Seq("gh"), "left_anti")
        // the original release: non-holdout docs clean under the OLD set
        val cand = corpus.filter(!isEval0)
        val contam0 = grams(cand).join(broadcast(ev0g), Seq("gh"),
          "left_semi").select(col("doc_id")).distinct()
        val released = cand.join(contam0, Seq("doc_id"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK) // pull filter + gram scan
        val pulls = released.filter(isNew)
          .select(col("doc_id"), col("source"),
            lit("now_holdout").as("action"), lit(0L).as("n_new_hits"))
        val hits = grams(released.filter(!isNew))
          .join(broadcast(newg), Seq("gh"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("gh")).as("n_new_hits"))
        val convicted = released.filter(!isNew)
          .select(col("doc_id"), col("source"))
          .join(hits, "doc_id")
          .select(col("doc_id"), col("source"),
            lit("newly_contaminated").as("action"), col("n_new_hits"))
        pulls.union(convicted).orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text FROM documents),
              corpus AS (
                SELECT * FROM base
                UNION ALL
                SELECT doc_id + 60000000, 'crawl_mirror',
                  'mirror post ' || text
                FROM base
                WHERE doc_id % 43 = 5 AND NOT doc_id % 41 = 3
                  AND doc_id < 10000000),
              g AS (
                SELECT doc_id, unnest(list_transform(
                  range(1, len(toks) - 4),
                  i -> md5(array_to_string(toks[i:i+5], ' ')))) AS gh
                FROM (SELECT doc_id,
                    string_split_regex(lower(text), '\s+') AS toks
                  FROM corpus)),
              ev0 AS (
                SELECT doc_id FROM corpus
                WHERE doc_id % 41 = 3 AND doc_id < 10000000),
              nw AS (
                SELECT doc_id FROM corpus
                WHERE doc_id % 43 = 5 AND NOT doc_id % 41 = 3
                  AND doc_id < 10000000),
              ev0g AS (
                SELECT DISTINCT gh FROM g JOIN ev0 USING (doc_id)),
              newg AS (
                SELECT DISTINCT gh FROM g JOIN nw USING (doc_id)
                EXCEPT SELECT gh FROM ev0g),
              contam0 AS (
                SELECT DISTINCT g.doc_id FROM g
                JOIN ev0g USING (gh)
                WHERE g.doc_id NOT IN (SELECT doc_id FROM ev0)),
              rel AS (
                SELECT doc_id, source FROM corpus
                WHERE doc_id NOT IN (SELECT doc_id FROM ev0)
                  AND doc_id NOT IN (SELECT doc_id FROM contam0)),
              pulls AS (
                SELECT doc_id, source, 'now_holdout' AS action,
                  CAST(0 AS BIGINT) AS n_new_hits
                FROM rel WHERE doc_id IN (SELECT doc_id FROM nw)),
              hits AS (
                SELECT g.doc_id, CAST(count(DISTINCT g.gh) AS BIGINT)
                    AS n_new_hits
                FROM g JOIN newg USING (gh)
                WHERE g.doc_id IN (SELECT doc_id FROM rel)
                  AND g.doc_id NOT IN (SELECT doc_id FROM nw)
                GROUP BY g.doc_id),
              convicted AS (
                SELECT r.doc_id, r.source,
                  'newly_contaminated' AS action, h.n_new_hits
                FROM rel r JOIN hits h USING (doc_id))
              SELECT * FROM (SELECT * FROM pulls
                UNION ALL SELECT * FROM convicted)
              ORDER BY doc_id"""))
  )
}
