"""Blow up the sf0.1 fixture ~FACTORx for scale benching (bench_scale.json).

Copies get genuinely different content so the blow-up changes data VOLUME
without changing data STRUCTURE (the honest way to measure scaling):

- documents: copy i > 0 deterministically shuffles each doc's word order
  (ORDER BY hash(word, position, copy)), so copies share token SETS but
  almost no 5-gram shingles -- near-dup density stays that of the
  original corpus instead of exploding quadratically with copy pairs.
- orders/lineitem: copy i offsets the order keys by i*10M, creating
  independent order "shards" over the SAME supplier/customer dims --
  join fan-outs scale linearly, as a bigger day of the same workload would.
- embeddings: copy i jitters every component multiplicatively by a
  deterministic +-2.5% (hash of id/copy/dim), so copies are genuinely
  distinct vectors that stay INSIDE their source cluster -- the label
  structure the IVF/PQ/SemDeDup index builds depend on is preserved
  while train + search volume scales by FACTOR.
- supplier: copied as-is (dimension).

A 4th arg `skew` makes the documents blow-up HOT-KEYED: every copy lands
in source 'src0' / lang 'en', so at factor 10 one source (and one lang)
holds ~90% of the corpus. This is the fixture for the per-key prefix-sum
and bounded-top-K operators (r04/r06/r07/r08, d13/d14): a window
partitioned by source/lang would serialize ~90% of the data into ONE
task here, while the two-phase/bounded-heap forms must stay ~linear.

A 4th arg `dupskew` instead makes the blow-up DEGENERATELY DUPLICATED:
every copy is prefixed with a slice of the SAME boilerplate word stream
(the corpus's first documents, concatenated), sized to ~55% of the
copy's final length. That fraction is chosen deliberately: at fraction
q between two same-length docs the true Jaccard is q/(2-q), and a
boilerplate shingle enters a doc's t=0.5 prefix only when q > 1/2 — so
q~0.55 lands in the adversarial band (1/2, 2/3) where template
shingles (df ~ 90% of the corpus at factor 10) DO flood the prefixes
of every copy, but true pair similarity (~0.38) stays below the 0.5
join threshold. A FIXED-size boilerplate would miss one side or the
other: small fractions never reach the prefix (the df-ascending order
already guards them), large fractions make the copies genuine
near-dups of each other and the TRUE output quadratic — measuring
output materialization, which no exact algorithm can avoid, instead of
candidate pruning. This is the distribution x02's mega-bucket cap and
d28/d38's prefix+positional filters exist for. Copies keep the first
45% of their own words (still per-copy shuffled), so total token
volume matches the default 10x fixture and time ratios between the
two fixtures compare like for like.

Usage: python3 scripts/make_scale.py [src=/root/testdata/sf0.1] [out=/tmp/scale10] [factor=10] [skew|dupskew]
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/scale10'
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
mode = sys.argv[4] if len(sys.argv) > 4 else ''
assert mode in ('', 'skew', 'dupskew', 'vecclust'), f"unknown mode {mode!r}"
skew = mode == 'skew'
dupskew = mode == 'dupskew'
vecclust = mode == 'vecclust'
os.makedirs(out, exist_ok=True)

con = duckdb.connect()

# The shard offset is 10M per copy: any source id at or above it would
# silently collide across shards (merging user histories / doc identities
# and corrupting the per-shard structure the comments below promise to
# preserve). Assert instead of colliding.
SHARD = 10000000
for t, cols in [('documents', ['doc_id']), ('orders', ['o_orderkey']),
                ('lineitem', ['l_orderkey']), ('embeddings', ['vec_id']),
                ('events', ['event_id', 'user_id'])]:
    for c in cols:
        mx = con.execute(f"SELECT max({c}) FROM '{src}/{t}.parquet'").fetchone()[0]
        assert mx is None or mx < SHARD, \
            f"{t}.{c} max {mx} >= shard offset {SHARD}: copies would collide"

boiler_expr = "''"
if dupskew:
    # ONE boilerplate word stream for the whole corpus (the first docs'
    # words, concatenated to a 500-word pool); each copy takes the slice
    # sized to ceil(1.25 * own_words), i.e. ~55% of its final length
    boiler = con.execute(f"""
      SELECT array_to_string(flatten(list(regexp_split_to_array(trim(text), '\\s+') ORDER BY doc_id))[1:500], ' ')
      FROM (SELECT doc_id, text FROM '{src}/documents.parquet' ORDER BY doc_id LIMIT 5)""").fetchone()[0]
    bq = boiler.replace("'", "''")
    # kept own words = ceil(0.45·len) (the FILTER below); boilerplate =
    # ceil(1.25·kept) of the shared pool, i.e. ~55% of the final copy
    kept = "count(*) FILTER (WHERE rn <= ceil(0.45 * len))"
    boiler_expr = ("array_to_string(string_split('" + bq + "', ' ')"
                   f"[1:least(500, CAST(ceil(1.25 * ({kept})) AS BIGINT))], ' ') || ' '")

con.execute(f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars FROM '{src}/documents.parquet'
  UNION ALL
  SELECT doc_id + i * 10000000 AS doc_id,
         {boiler_expr if dupskew else "''"} || string_agg(w, ' ' ORDER BY hash(concat(w, '-', rn, '-', i)), rn)
           {"FILTER (WHERE rn <= ceil(0.45 * len))" if dupskew else ""} AS text,
         {"'en' AS lang, 'src0' AS source" if skew else "any_value(lang) AS lang, any_value(source) AS source"},
         any_value(n_chars) AS n_chars
  FROM (
    SELECT doc_id, lang, source, n_chars,
           unnest(regexp_split_to_array(text, '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) AS rn,
           len(regexp_split_to_array(text, '\\s+')) AS len
    FROM '{src}/documents.parquet')
  CROSS JOIN range(1, {factor}) r(i)
  GROUP BY doc_id, i
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")

for t, key in [('orders', 'o_orderkey'), ('lineitem', 'l_orderkey')]:
    con.execute(f"""
    COPY (
      SELECT * REPLACE ({key} + i * 10000000 AS {key})
      FROM '{src}/{t}.parquet' CROSS JOIN range({factor}) r(i)
    ) TO '{out}/{t}.parquet' (FORMAT PARQUET)
    """)

# A 4th arg `vecclust` makes the embeddings blow-up NON-ISOTROPIC:
# copies collapse onto their LABEL's per-dimension centroid (+-1%
# jitter) instead of jittering around their source vector, so at
# factor 10 ~90% of the corpus mass forms tight per-label cones while
# the originals stay broad. k-means cells then split into tight
# (angular radius ~0.1 rad) and wide (~1.4 rad) — HETEROGENEOUS radii,
# the regime the radius-aware probe ranking and any cell-bound
# termination rule actually differentiate in (the isotropic default
# measures them as no-ops by construction: near-uniform radii make the
# best-possible-member bound a monotone transform of centroid cosine).
emb_copy_expr = (
    """list_transform(c.cent, (x, j) -> CAST(x * (1.0 + 0.02 *
           (((hash(concat(e.vec_id, '-', i, '-', j)) % 1000) / 1000.0) - 0.5)) AS FLOAT))"""
    if vecclust else
    """list_transform(embedding, (x, j) -> CAST(x * (1.0 + 0.05 *
           (((hash(concat(vec_id, '-', i, '-', j)) % 1000) / 1000.0) - 0.5)) AS FLOAT))""")
emb_from = (
    f"""FROM '{src}/embeddings.parquet' e
  JOIN (SELECT label, list(a ORDER BY j) AS cent
        FROM (SELECT label, j, avg(x) AS a
              FROM (SELECT label, unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS j
                    FROM '{src}/embeddings.parquet')
              GROUP BY label, j)
        GROUP BY label) c USING (label)
  CROSS JOIN range(1, {factor}) r(i)"""
    if vecclust else
    f"FROM '{src}/embeddings.parquet' CROSS JOIN range(1, {factor}) r(i)")
con.execute(f"""
COPY (
  SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet'
  UNION ALL
  SELECT {'e.' if vecclust else ''}vec_id + i * 10000000 AS vec_id,
         {emb_copy_expr} AS embedding,
         label
  {emb_from}
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")

# events: copy i offsets user_id/event_id into independent user shards over
# the SAME one-month window -- a FACTORx-busier month of the same workload.
# Per-user histories (and so cohort weeks, sessions, transition counts per
# user) are preserved exactly; only the population scales.
con.execute(f"""
COPY (
  SELECT event_id + i * 10000000 AS event_id, ts,
         user_id + i * 10000000 AS user_id, event_type, value, props
  FROM '{src}/events.parquet' CROSS JOIN range({factor}) r(i)
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")

for t in ['supplier', 'customer', 'part', 'nation', 'region']:
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

for t in ['documents', 'orders', 'lineitem', 'embeddings', 'events']:
    n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"scale fixture at {out} (factor {factor})")
