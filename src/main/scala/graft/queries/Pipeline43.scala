package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, seventh batch: label hygiene and corpus accounting —
  * conflicting labels inside exact-duplicate groups (q309), tokenizer
  * fertility by source×language (q310), and the component-size
  * distribution of the link graph (q311).
  */
object Pipeline43 {

  def entries: Seq[QEntry] = Seq(

    // Label-conflict audit: collapse byte-identical quantized vectors
    // (the q288/q159 md5 discipline) and flag groups whose members
    // DISAGREE on the label — the label-noise screen run before any
    // training job (identical inputs with different targets are either
    // annotation errors or leakage). Outputs one row per conflicted
    // group: size, distinct labels, majority share in ppm (min-label
    // tie-break). Digest-only shuffle; the label census joins on the
    // group dimension.
    QEntry("q309_label_conflict_audit",
      (s, d) => {
        // the fixture has no natural conflicts — plant them (q275
        // precedent): every 50th vector returns under a shifted id
        // with a DIFFERENT label, exactly what a double-annotation
        // pass or a leaked eval row looks like
        val base = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            col("label").cast("long").as("label"))
        val planted = base.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            col("embedding"), (col("label") + 1L).as("label"))
        val keyed = base.union(planted)
          .select(col("vec_id"), col("label"),
            md5(concat_ws(",",
              graft.expressions.functions.quantize_vec(col("embedding"),
                10000.0).cast("array<string>"))).as("k"))
          .localCheckpoint() // feeds group agg + label census
        val groups = keyed.groupBy(col("k"))
          .agg(min(col("vec_id")).as("rep_id"),
            count(lit(1)).as("n_members"),
            countDistinct(col("label")).as("n_labels"))
          .filter(col("n_labels") > 1)
        val census = keyed.groupBy(col("k"), col("label"))
          .agg(count(lit(1)).as("c"))
        val major = census.groupBy(col("k"))
          .agg(max(struct(col("c").as("c"),
            (-col("label")).as("neg_label"))).as("m"))
          .select(col("k"), col("m.c").as("major_c"),
            (-col("m.neg_label")).as("major_label"))
        groups.join(major, "k")
          .select(col("rep_id"), col("n_members"), col("n_labels"),
            col("major_label"),
            expr("major_c * 1000000 div n_members").as("majority_ppm"))
          .orderBy(col("rep_id"))
      },
      Some("""WITH corpus AS (
                SELECT vec_id, embedding, CAST(label AS BIGINT) AS label
                FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000, embedding,
                  CAST(label AS BIGINT) + 1
                FROM embeddings WHERE vec_id % 50 = 0),
              keyed AS (
                SELECT vec_id, label,
                  md5(list_aggregate(list_transform(
                    list_transform(embedding, v -> CAST(round(
                      CAST(v AS DOUBLE) * 10000.0) AS BIGINT)),
                    x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS k
                FROM corpus),
              groups AS (
                SELECT k, min(vec_id) AS rep_id, count(*) AS n_members,
                  count(DISTINCT label) AS n_labels
                FROM keyed GROUP BY k HAVING count(DISTINCT label) > 1),
              census AS (
                SELECT k, label, count(*) AS c
                FROM keyed GROUP BY 1, 2),
              major AS (
                SELECT k, c AS major_c, label AS major_label FROM (
                  SELECT k, label, c, row_number() OVER (
                    PARTITION BY k ORDER BY c DESC, label) AS rn
                  FROM census) WHERE rn = 1)
              SELECT g.rep_id, CAST(g.n_members AS BIGINT) AS n_members,
                CAST(g.n_labels AS BIGINT) AS n_labels,
                m.major_label,
                CAST(m.major_c * 1000000 // g.n_members AS BIGINT)
                  AS majority_ppm
              FROM groups g JOIN major m USING (k)
              ORDER BY g.rep_id""")),

    // Tokenizer fertility by (source, lang): characters per subword
    // token in micro units — the multilingual budget planner's number
    // (a tokenizer trained on English spends 2-4× more tokens per char
    // on underrepresented scripts; fertility drift by source flags
    // encoding problems). One scan, map-side combined onto the tiny
    // (source, lang) dimension.
    QEntry("q310_tokenizer_fertility",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"), col("lang"), col("n_chars"),
            graft.pipeline.TextAnalysis.subwordCountApprox(col("text"))
              .cast("long").as("sub"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("words"))
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"),
            sum(col("sub")).as("subwords"),
            sum(col("words")).as("words"))
          .select(col("source"), col("lang"), col("n_docs"), col("chars"),
            col("subwords"), col("words"),
            when(col("subwords") > 0,
              expr("chars * 1000000 div subwords")).otherwise(lit(0L))
              .as("chars_per_sub_micro"),
            when(col("words") > 0,
              expr("subwords * 1000000 div words")).otherwise(lit(0L))
              .as("subs_per_word_micro"))
          .orderBy(col("source"), col("lang"))
      },
      // subword replay: DuckDB RE2 has no lookbehind — q64's proven
      // closed form (1 piece per maximal alnum run + one boundary per
      // position with 4 preceding letters)
      Some("""WITH m AS (
                SELECT source, lang, n_chars,
                  CAST(coalesce(list_sum(list_transform(
                    list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), r -> length(r) > 0),
                    r -> 1 + len(list_filter(range(4, length(r)),
                      i -> regexp_matches(substr(r, CAST(i-3 AS INTEGER),
                        4), '^[a-z]{4}$'))))), 0) AS BIGINT) AS sub,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS words
                FROM documents)
              SELECT source, lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS chars,
                CAST(sum(sub) AS BIGINT) AS subwords,
                CAST(sum(words) AS BIGINT) AS words,
                CAST(CASE WHEN sum(sub) > 0
                  THEN sum(n_chars) * 1000000 // sum(sub)
                  ELSE 0 END AS BIGINT) AS chars_per_sub_micro,
                CAST(CASE WHEN sum(words) > 0
                  THEN sum(sub) * 1000000 // sum(words)
                  ELSE 0 END AS BIGINT) AS subs_per_word_micro
              FROM m GROUP BY source, lang
              ORDER BY source, lang""")),

    // Component-size distribution + giant-component share: pointer-
    // doubling components (O(log diameter) rounds) over an md5-gated
    // chain graph (edge i→i+1 survives iff the md5 residue of i is
    // nonzero mod 3 — geometric-ish run lengths, so the histogram has
    // real shape; the dense DocGraph is one giant component and tells
    // nothing). The connectivity audit behind dedup-group and
    // graph-sampling decisions. Giant share in ppm rides on each row.
    QEntry("q311_component_size_dist",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
          .localCheckpoint()
        val res = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long") % 3
        val edges = docs.select(col("doc_id").as("a_id"),
            (col("doc_id") + 1).as("b_id"), res.as("r"))
          .filter(col("r") =!= 0).drop("r")
          .join(docs.select(col("doc_id").as("b_id")), "b_id")
        val comp = graft.pipeline.Dedup.components(
          edges.select(col("a_id"), col("b_id")),
          docs.select(col("doc_id").as("id")))
        val sizes = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("sz"))
          .localCheckpoint() // component dimension
        val n = docs.count()
        val giant = sizes.agg(max(col("sz"))).head().getLong(0)
        sizes.groupBy(col("sz")).agg(count(lit(1)).as("n_components"))
          .select(col("sz"), col("n_components"),
            lit(giant * 1000000L / n).as("giant_share_ppm"))
          .orderBy(col("sz"))
      },
      Some("""WITH RECURSIVE e AS (
                SELECT a.doc_id AS src, a.doc_id + 1 AS dst
                FROM documents a JOIN documents b
                  ON b.doc_id = a.doc_id + 1
                WHERE ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR)),
                    1, 8))::BIGINT % 3 <> 0),
              edges AS (
                SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
              comp(id, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT edges.dst, comp.lbl
                FROM comp JOIN edges ON edges.src = comp.id),
              lab AS (
                SELECT id, min(lbl) AS component FROM comp GROUP BY id),
              sizes AS (
                SELECT component, count(*) AS sz FROM lab GROUP BY 1),
              nn2 AS (SELECT count(*) AS n FROM documents),
              g AS (SELECT max(sz) AS giant FROM sizes)
              SELECT CAST(sz AS BIGINT) AS sz,
                count(*) AS n_components,
                CAST((SELECT giant FROM g) * 1000000
                  // (SELECT n FROM nn2) AS BIGINT) AS giant_share_ppm
              FROM sizes GROUP BY sz ORDER BY sz"""))
  )
}
