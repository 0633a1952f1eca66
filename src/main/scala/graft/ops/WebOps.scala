package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Tables.t
import graft.sources.WarcCodec

/** Web-corpus curation: the operators that turn a crawl into training
  * text — WARC container round-trip, HTML boilerplate extraction,
  * popular-line dedup (the CCNet line-level pass), and PII redaction.
  * The inputs are synthesized deterministically from the `documents`
  * table (the same technique as m01-m05), so every stage — including the
  * real WARC/gzip codec — carries an exact DuckDB oracle.
  */
object WebOps {

  /** The page body a crawl of this corpus would have fetched. Built
    * identically in the oracle SQL, so the codec round-trip hash-checks.
    */
  def htmlFor(docId: Long, text: String): String =
    s"<html><head><title>doc $docId</title></head><body><p>$text</p></body></html>"

  /** Docs whose line-hash appears in at least this many distinct docs are
    * treated as boilerplate by w03 (CCNet drops lines above a corpus
    * popularity cutoff for the same reason).
    */
  val PopularDocThreshold = 10

  /** Registered domains the w05/p03 curation drops wholesale. */
  val DomainBlocklist = Seq("src3.com", "src7.co.uk", "src11.org")

  /** The URL-canonicalization kernel shared by w05 and the p03 web
    * pipeline: synthesize the deterministic crawl URL per document (4
    * subdomain × 3 TLD × query-param variants), parse host/path/query,
    * strip the www label and utm_* tracking params, and reduce the host
    * to its registered domain (two-level-suffix heuristic). One narrow
    * codegen pass; every output column is closed-form recomputable in
    * the oracle SQL.
    */
  def urlFrame(docs: DataFrame): DataFrame =
    docs
      .withColumn("url", expr(
        """'https://' ||
          |  (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' WHEN 2 THEN 'm.' ELSE '' END) ||
          |  source || '.' ||
          |  (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com' ELSE 'org' END) ||
          |  '/p/' || CAST(doc_id % 50 AS STRING) ||
          |  (CASE CAST(doc_id % 5 AS INT)
          |     WHEN 0 THEN '?utm_source=feed&utm_campaign=x&page=' || CAST(doc_id % 3 AS STRING)
          |     WHEN 1 THEN '?page=' || CAST(doc_id % 3 AS STRING)
          |     ELSE '' END)""".stripMargin))
      .withColumn("host", expr("regexp_extract(url, '^https?://([^/]+)', 1)"))
      .withColumn("path", expr("regexp_extract(url, '^https?://[^/]+([^?]*)', 1)"))
      .withColumn("qs", expr("regexp_extract(url, '\\\\?(.*)$', 1)"))
      .withColumn("host_nw",
        when(col("host").startsWith("www."), expr("substr(host, 5)")).otherwise(col("host")))
      .withColumn("kept_qs", expr(
        "array_join(filter(split(qs, '&'), p -> p != '' AND NOT startswith(p, 'utm_')), '&')"))
      .withColumn("canonical_url", expr(
        "host_nw || path || (CASE WHEN kept_qs = '' THEN '' ELSE '?' || kept_qs END)"))
      .withColumn("registered_domain", expr(
        """CASE WHEN host_nw LIKE '%.co.uk'
          |  THEN array_join(slice(split(host_nw, '\\.'), -3, 3), '.')
          |  ELSE array_join(slice(split(host_nw, '\\.'), -2, 2), '.') END""".stripMargin))

  private def indexOfCrlfCrlf(buf: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < buf.length) {
      if (buf(i) == '\r' && buf(i + 1) == '\n' && buf(i + 2) == '\r' && buf(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  val queries: Map[String, Tables.Q] = Map(
    // WARC container round-trip with an EXACT oracle: every document
    // becomes a real WARC/1.0 response record (HTTP block + headers),
    // even doc_ids are wrapped as independent gzip members (the .warc.gz
    // member-per-record layout), records are concatenated into segments,
    // and the segment bytes are parsed back through WarcCodec's streaming
    // member walker. Emitted fields (target URI, HTTP status, block
    // length, payload md5-prefix hash) are all closed-form recomputable
    // from `documents`, so DuckDB hash-checks an actual
    // frame→compress→parse→extract crawl pipeline.
    //
    // Scale posture: the segment key is doc_id div 256, so segment COUNT
    // grows linearly with the corpus (the unit of WARC parallelism —
    // gzip members are not block-splittable) and each task owns one
    // bounded segment. One keyed shuffle; no driver materialization.
    "w01_warc_extract" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)]
      docs
        .groupByKey { case (id, _, _) => id / 256 }
        .flatMapGroups { (_: Long, iter: Iterator[(Long, String, String)]) =>
          val seg = new ByteArrayOutputStream()
          iter.toSeq.sortBy(_._1).foreach { case (id, src, text) =>
            val body = htmlFor(id, text).getBytes(US_ASCII)
            val rec = WarcCodec.record(
              Seq(
                "WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:uuid:doc-$id>",
                "WARC-Date" -> "2026-01-01T00:00:00Z",
                "WARC-Target-URI" -> s"http://$src.example.com/doc/$id",
                "Content-Type" -> "application/http;msgtype=response"
              ),
              WarcCodec.httpResponseBlock("text/html", body)
            )
            seg.write(if (id % 2 == 0) WarcCodec.gzipMember(rec) else rec)
          }
          WarcCodec.parse(seg.toByteArray).iterator.map { r =>
            val sep = indexOfCrlfCrlf(r.block)
            require(sep >= 0, s"record ${r.targetUri}: HTTP block missing header/body separator")
            val status = new String(r.block, 0, sep, US_ASCII).split(" ")(1).toInt
            val payload = java.util.Arrays.copyOfRange(r.block, sep + 4, r.block.length)
            val docId = r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong
            (docId, r.targetUri, status, r.contentLength, payload.length.toLong,
              MultimodalOps.frameHash(payload, 0, payload.length), r.gzipped)
          }
        }
        .toDF("doc_id", "target_uri", "http_status", "content_length", "html_bytes", "payload_hash", "gzipped")
        .orderBy("doc_id")
    }),

    // HTML → training-text extraction: strip script blocks, strip tags,
    // then the line-based boilerplate filter (keep lines with ≥8 words —
    // title/nav/footer lines fall below it, body paragraphs above). The
    // page is synthesized around the doc text, so `body_recovered` is a
    // genuine end-to-end round trip. Narrow per-row map on the codegen
    // path (regexp_replace + higher-order filter) — zero shuffles, so
    // throughput is pure scan speed at any corpus size.
    "w02_html_extract" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn(
          "html",
          concat(
            lit("<html>\n<head><title>doc "), col("doc_id").cast("string"),
            lit("</title><script>var x = "), col("doc_id").cast("string"),
            lit(";</script></head>\n<body>\n<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>\n<p>"),
            col("text"),
            lit("</p>\n<footer>(c) "), col("source"), lit("</footer>\n</body>\n</html>")
          )
        )
        .withColumn("stripped",
          regexp_replace(regexp_replace(col("html"), "(?s)<script[^>]*>.*?</script>", ""), "<[^>]+>", ""))
        .withColumn("lines", expr("filter(transform(split(stripped, '\\n'), l -> trim(l)), l -> l != '')"))
        .withColumn("kept", expr("filter(lines, l -> size(split(l, '\\\\s+')) >= 8)"))
        .withColumn("extracted", expr("array_join(kept, ' ')"))
        .select(
          col("doc_id"),
          size(col("lines")).as("n_lines"),
          size(col("kept")).as("n_kept"),
          length(col("extracted")).as("extracted_len"),
          expr("CAST(conv(substr(md5(CAST(extracted AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("extracted_hash"),
          (col("extracted") === col("text")).as("body_recovered")
        )
        .orderBy("doc_id")
    }),

    // CCNet-style popular-line dedup: docs are split into lines (synthetic
    // boilerplate + content lines of 5-11 words), each line's corpus
    // popularity is counted, and lines present in ≥ PopularDocThreshold
    // distinct docs are dropped before the doc is rebuilt. Two keyed
    // shuffles ((line, doc) distinct + per-line count) and one line-keyed
    // join back — the count side is one row per distinct line, and the
    // hot boilerplate keys are exactly what AQE's skew split handles, so
    // the pass scales like any gram-frequency job.
    "w03_line_dedup" -> ((s, dir) => {
      // the documents table is a single parquet split at every test SF:
      // without the upfront repartition the whole line build runs as ONE
      // task (measured 5x the total query time at the 10x fixture)
      val lines = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("w", expr("filter(split(trim(text), '\\\\s+'), x -> x != '')"))
        .withColumn("k", (lit(5) + pmod(col("doc_id"), lit(7))).cast("int"))
        .withColumn(
          "content",
          expr(
            """CASE WHEN size(w) = 0 THEN array()
              |ELSE transform(sequence(1, (size(w) + k - 1) div k), j -> array_join(slice(w, (j - 1) * k + 1, k), ' '))
              |END""".stripMargin)
        )
        .withColumn(
          "lines",
          concat(
            array(lit("subscribe to our newsletter today"),
              concat(lit("from "), col("source"), lit(" network feed"))),
            col("content"),
            array(lit("all rights reserved by the site"))
          )
        )
        .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
        // popularity counting and the membership join key on the line's
        // md5, not the line TEXT: the distinct + agg + join shuffles move
        // 16-byte keys instead of ~60-char strings (the d34 span-key
        // rule; 128 bits keeps collisions negligible at any corpus
        // size). The text itself stays in the narrow pre-join frame for
        // the rebuild.
        .withColumn("lh", md5(col("line").cast("binary")))
      val popularity = lines
        .select("lh", "doc_id")
        .distinct()
        .groupBy("lh")
        .agg(count(lit(1)).as("n_docs"))
      lines
        .join(popularity, "lh")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("n_docs") >= PopularDocThreshold, 1L).otherwise(0L)).as("n_dropped"),
          expr(s"array_join(transform(array_sort(collect_list(CASE WHEN n_docs < $PopularDocThreshold THEN struct(pos, line) END)), x -> x.line), '\\n')")
            .as("kept")
        )
        .select(
          col("doc_id"),
          col("n_lines"),
          col("n_dropped"),
          length(col("kept")).cast("long").as("kept_chars"),
          expr("CAST(conv(substr(md5(CAST(kept AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("kept_hash")
        )
        .orderBy("doc_id")
    }),

    // PII detection + redaction: deterministic PII (emails, a phone, an
    // IPv4) is injected into each doc, then detected and redacted with
    // engine-portable regexes (character classes, bounded repeats, \b —
    // identical semantics in Java regex and RE2). Redaction order is
    // fixed (email → IP → phone) so the byte-exact redacted hash is
    // comparable. Narrow codegen map, zero shuffles.
    "w04_pii_redaction" -> ((s, dir) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      t(s, dir, "documents")
        .withColumn(
          "aug",
          concat(
            col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail"), pmod(col("doc_id"), lit(10)).cast("string"), lit(".example.com"),
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(lit(" cc admin"), col("doc_id").cast("string"), lit("@corp.example.org")))
              .otherwise(lit("")),
            lit(" or call 555-"),
            lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
            lit("-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".0."), pmod(col("doc_id"), lit(100)).cast("string")
          )
        )
        .withColumn("n_emails", regexp_count(col("aug"), lit(email)))
        .withColumn("n_phones", regexp_count(col("aug"), lit(phone)))
        .withColumn("n_ips", regexp_count(col("aug"), lit(ip)))
        .withColumn(
          "redacted",
          regexp_replace(
            regexp_replace(regexp_replace(col("aug"), email, "<EMAIL>"), ip, "<IP>"),
            phone, "<PHONE>"))
        .select(
          col("doc_id"),
          col("n_emails"),
          col("n_phones"),
          col("n_ips"),
          length(col("redacted")).as("redacted_len"),
          expr("CAST(conv(substr(md5(CAST(redacted AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("redacted_hash")
        )
        .orderBy("doc_id")
    }),

    // URL canonicalization + registered-domain curation — the crawl
    // frontier's bookkeeping pass: parse scheme/host/path/query, strip
    // the www label and utm_* tracking params (the canonical-URL dedup
    // key CC-style pipelines group fetches by), reduce each host to its
    // REGISTERED domain (last two labels, or three under two-level
    // public suffixes like co.uk — a closed-list heuristic of the
    // Public Suffix List's shape), then aggregate per domain: doc and
    // distinct-host/canonical-URL counts, tracking prevalence, and a
    // domain-blocklist keep/drop decision. URLs are synthesized
    // deterministically from `documents` (the w01/m01 technique) with
    // 4 subdomain × 3 TLD × param variants so every branch of the
    // parser is exercised; the oracle rebuilds byte-identical URLs and
    // replays the same regexes/list ops. Narrow codegen maps + one
    // 60-key map-side-combinable aggregate: no skew surface (domain
    // cardinality grows with the corpus in a real crawl; counts stay
    // partial-aggregated either way).
    "w05_domain_curation" -> ((s, dir) => {
      urlFrame(t(s, dir, "documents"))
        .groupBy("registered_domain")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"),
          countDistinct(col("canonical_url")).as("n_canonical_urls"),
          sum(when(col("qs").contains("utm_"), 1L).otherwise(0L)).as("n_tracked"))
        .withColumn("blocked", col("registered_domain").isin(DomainBlocklist: _*))
        .withColumn("kept_docs", when(col("blocked"), 0L).otherwise(col("n_docs")))
        .orderBy("registered_domain")
    }),

    // Multi-pattern literal blocklist scan — real blocklists (badword /
    // boilerplate-phrase lists) are SUBSTRING semantics, not token
    // equality (r03's rung): "rt win" below matches inside
    // "...sort window..." across a word boundary. One Aho–Corasick
    // automaton pass per document finds every pattern simultaneously —
    // O(text + matches) per doc however long the list grows, where a
    // per-pattern contains/replace loop is O(text × patterns); at
    // 100 TB the automaton (KBs even for 10k-phrase lists) broadcasts
    // with the task closure and the only shuffle is the P-key
    // map-side-combinable count agg. Patterns are required border-free
    // (no proper prefix that is also a suffix, checked loudly) so the
    // all-occurrences count the automaton produces equals the
    // non-overlapping count a replace-based SQL oracle computes —
    // that is what makes the oracle EXACT; bordered-pattern overlap
    // semantics are pinned separately in AhoCorasickSpec.
    "w06_pattern_blocklist" -> ((s, dir) => {
      import s.implicits._
      val pats = BlockPatterns
      pats.foreach(p => require(!graft.functions.AhoCorasick.hasBorder(p),
        s"pattern '$p' has a border; replace-based oracle would undercount overlaps"))
      val ac = graft.functions.AhoCorasick.build(pats)
      val hits = t(s, dir, "documents")
        .select(col("text")).as[String]
        .flatMap { text =>
          val counts = ac.countMatches(text)
          counts.iterator.zipWithIndex.collect { case (c, i) if c > 0L => (i, c) }
        }
        .toDF("pat_id", "hits")
        .groupBy("pat_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("hits")).as("n_hits"))
      val patFrame = pats.zipWithIndex.map { case (p, i) => (i, p) }.toDF("pat_id", "pattern")
      patFrame
        .join(hits, Seq("pat_id"), "left") // patterns with zero hits stay visible
        .select(
          col("pattern"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .orderBy("pattern")
    })
  )

  /** w06's literal pattern list: corpus phrases plus one cross-word
    * substring and one guaranteed miss; all border-free (enforced in
    * the query) so automaton counts == replace-based oracle counts.
    */
  private[ops] val BlockPatterns = Seq(
    "merge slow", "spark join", "window dup", "fast key",
    "vector", "customer line", "batch stream", "rt win", "zz-never-hits")

  /** All four oracles rebuild the synthesized inputs closed-form in SQL
    * (the string constructions mirror the Scala byte-for-byte) and apply
    * the same filters/regexes, so every emitted hash is exact — the m01/
    * m05 portability argument applied to the crawl pipeline.
    */
  val oracleSql: Map[String, String] = Map(
    // Replace-based occurrence counting is exact here BECAUSE the query
    // enforces border-free patterns (no self-overlap possible).
    "w06_pattern_blocklist" ->
      """WITH pats AS (SELECT * FROM (VALUES
        |  ('merge slow'), ('spark join'), ('window dup'), ('fast key'),
        |  ('vector'), ('customer line'), ('batch stream'), ('rt win'),
        |  ('zz-never-hits')) AS v(pattern)),
        |h AS (SELECT p.pattern,
        |  (strlen(d.text) - strlen(replace(d.text, p.pattern, ''))) // strlen(p.pattern) AS hits
        |  FROM pats p CROSS JOIN documents d)
        |SELECT pattern,
        |  CAST(count(*) FILTER (WHERE hits > 0) AS BIGINT) AS n_docs,
        |  CAST(coalesce(sum(hits), 0) AS BIGINT) AS n_hits
        |FROM h GROUP BY pattern ORDER BY pattern""".stripMargin,
    "w05_domain_curation" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' ||
        |  (CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.' WHEN 2 THEN 'm.' ELSE '' END) ||
        |  source || '.' ||
        |  (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'co.uk' WHEN 1 THEN 'com' ELSE 'org' END) ||
        |  '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
        |  (CASE CAST(doc_id % 5 AS INT)
        |     WHEN 0 THEN '?utm_source=feed&utm_campaign=x&page=' || CAST(doc_id % 3 AS VARCHAR)
        |     WHEN 1 THEN '?page=' || CAST(doc_id % 3 AS VARCHAR)
        |     ELSE '' END) AS url
        |  FROM documents),
        |p AS (SELECT doc_id,
        |  regexp_extract(url, '^https?://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^https?://[^/]+([^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS qs
        |  FROM u),
        |c AS (SELECT doc_id, host, path, qs,
        |  CASE WHEN starts_with(host, 'www.') THEN substr(host, 5) ELSE host END AS host_nw
        |  FROM p),
        |k AS (SELECT *, coalesce(array_to_string(list_filter(string_split(qs, '&'), x -> x <> '' AND NOT starts_with(x, 'utm_')), '&'), '') AS kept_qs FROM c),
        |canon AS (SELECT doc_id, host, qs,
        |  host_nw || path || (CASE WHEN kept_qs = '' THEN '' ELSE '?' || kept_qs END) AS canonical_url,
        |  CASE WHEN host_nw LIKE '%.co.uk'
        |    THEN array_to_string(string_split(host_nw, '.')[-3:], '.')
        |    ELSE array_to_string(string_split(host_nw, '.')[-2:], '.') END AS registered_domain
        |  FROM k),
        |agg AS (SELECT registered_domain,
        |  count(*) AS n_docs,
        |  count(DISTINCT host) AS n_hosts,
        |  count(DISTINCT canonical_url) AS n_canonical_urls,
        |  CAST(sum(CASE WHEN contains(qs, 'utm_') THEN 1 ELSE 0 END) AS BIGINT) AS n_tracked
        |  FROM canon GROUP BY 1)
        |SELECT registered_domain, n_docs, n_hosts, n_canonical_urls, n_tracked,
        |  registered_domain IN ('src3.com', 'src7.co.uk', 'src11.org') AS blocked,
        |  CASE WHEN registered_domain IN ('src3.com', 'src7.co.uk', 'src11.org') THEN 0 ELSE n_docs END AS kept_docs
        |FROM agg ORDER BY registered_domain""".stripMargin,
    "w01_warc_extract" ->
      """WITH h AS (SELECT doc_id, source,
        |  '<html><head><title>doc ' || doc_id || '</title></head><body><p>' || text || '</p></body></html>' AS html
        |  FROM documents),
        |b AS (SELECT doc_id, source, html,
        |  'HTTP/1.1 200 OK' || chr(13) || chr(10) || 'Content-Type: text/html' || chr(13) || chr(10) ||
        |  'Content-Length: ' || strlen(html) || chr(13) || chr(10) || chr(13) || chr(10) AS hh
        |  FROM h)
        |SELECT doc_id,
        |  'http://' || source || '.example.com/doc/' || doc_id AS target_uri,
        |  CAST(200 AS INT) AS http_status,
        |  CAST(strlen(hh) + strlen(html) AS BIGINT) AS content_length,
        |  CAST(strlen(html) AS BIGINT) AS html_bytes,
        |  ('0x' || substr(md5(html), 1, 15))::BIGINT AS payload_hash,
        |  doc_id % 2 = 0 AS gzipped
        |FROM b ORDER BY doc_id""".stripMargin,
    "w02_html_extract" ->
      """WITH h AS (SELECT doc_id, text,
        |  '<html>' || chr(10) || '<head><title>doc ' || doc_id || '</title><script>var x = ' || doc_id ||
        |  ';</script></head>' || chr(10) || '<body>' || chr(10) ||
        |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' || chr(10) ||
        |  '<p>' || text || '</p>' || chr(10) || '<footer>(c) ' || source || '</footer>' || chr(10) ||
        |  '</body>' || chr(10) || '</html>' AS html
        |  FROM documents),
        |s AS (SELECT doc_id, text,
        |  regexp_replace(regexp_replace(html, '<script[^>]*>.*?</script>', '', 'gs'), '<[^>]+>', '', 'g') AS st
        |  FROM h),
        |l AS (SELECT doc_id, text,
        |  list_filter(list_transform(string_split(st, chr(10)), x -> trim(x)), x -> x <> '') AS lines
        |  FROM s),
        |k AS (SELECT doc_id, text, lines,
        |  list_filter(lines, x -> len(regexp_split_to_array(x, '\s+')) >= 8) AS kept
        |  FROM l)
        |SELECT doc_id,
        |  CAST(len(lines) AS INT) AS n_lines,
        |  CAST(len(kept) AS INT) AS n_kept,
        |  CAST(strlen(array_to_string(kept, ' ')) AS INT) AS extracted_len,
        |  ('0x' || substr(md5(array_to_string(kept, ' ')), 1, 15))::BIGINT AS extracted_hash,
        |  array_to_string(kept, ' ') = text AS body_recovered
        |FROM k ORDER BY doc_id""".stripMargin,
    "w03_line_dedup" ->
      """WITH d AS (SELECT doc_id, source,
        |  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w,
        |  CAST(5 + doc_id % 7 AS INT) AS k
        |  FROM documents),
        |c AS (SELECT doc_id, source, ['subscribe to our newsletter today', 'from ' || source || ' network feed']
        |  || CASE WHEN len(w) = 0 THEN [] ELSE
        |       list_transform(generate_series(1, CAST((len(w) + k - 1) // k AS INT)),
        |                      j -> array_to_string(w[((j - 1) * k + 1):(j * k)], ' '))
        |     END
        |  || ['all rights reserved by the site'] AS lines
        |  FROM d),
        |l AS (SELECT doc_id, unnest(lines) AS line, generate_subscripts(lines, 1) AS pos FROM c),
        |p AS (SELECT line, count(DISTINCT doc_id) AS n_docs FROM l GROUP BY line),
        |j AS (SELECT l.doc_id, l.pos, l.line, p.n_docs FROM l JOIN p USING (line)),
        |r AS (SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(coalesce(sum(CASE WHEN n_docs >= 10 THEN 1 END), 0) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN n_docs < 10 THEN line END, chr(10) ORDER BY pos), '') AS kept
        |  FROM j GROUP BY doc_id)
        |SELECT doc_id, n_lines, n_dropped,
        |  CAST(strlen(kept) AS BIGINT) AS kept_chars,
        |  ('0x' || substr(md5(kept), 1, 15))::BIGINT AS kept_hash
        |FROM r ORDER BY doc_id""".stripMargin,
    "w04_pii_redaction" ->
      """WITH a AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@mail' || doc_id % 10 || '.example.com' ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END ||
        |  ' or call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |  ' from 10.' || doc_id % 256 || '.0.' || doc_id % 100 AS aug
        |  FROM documents),
        |r AS (SELECT doc_id, aug,
        |  regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS red
        |  FROM a)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(aug, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  CAST(strlen(red) AS INT) AS redacted_len,
        |  ('0x' || substr(md5(red), 1, 15))::BIGINT AS redacted_hash
        |FROM r ORDER BY doc_id""".stripMargin
  )
}
