"""Parity queries for the LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal, event streaming) with DuckDB oracles.

All hashing is md5-hex based so oracles reproduce Spark results exactly;
every SQL mirror is generated from the same loops as the Spark plan where
the expression is mechanical (simhash bits, feature nibbles).
"""

from __future__ import annotations

from pyspark.sql import functions as SF

from .queries import query
from .sources import load_table

# shared SQL fragments ------------------------------------------------------

# charset trim = text.wtrim's btrim twin (the Java \s ASCII class);
# cheaper than an anchored regexp_replace on both engines
_WS_SET = "' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)"
_WTRIM = "trim({t}, " + _WS_SET + ")"
_WORDS = r"string_split_regex(trim({t}, " + _WS_SET + r"), '\s+')"
_SHINGLES3 = (
    "list_distinct(list_transform(range(1, greatest(len({w}) - 1, 1)), "
    "i -> array_to_string(list_slice({w}, i, i + 2), ' ')))"
)


def _wtrim_col(c):
    from .operators.text import wtrim

    return wtrim(c)


# Persisted-store queries (signature store, IVF index) are re-invoked
# many times per process by bench min-of-N and correctness runs: a fresh
# mkdtemp per call both leaks temp dirs without bound and rebuilds a
# store whose whole point is build-once/query-many. Cache the dir per
# (tag, sf_dir); `fresh` tells the caller to build. Cleaned at exit.
_STORE_CACHE: dict = {}


def _cached_store_dir(tag: str, sf_dir: str) -> tuple[str, bool]:
    import atexit
    import shutil
    import tempfile

    key = (tag, str(sf_dir))
    fresh = key not in _STORE_CACHE
    if fresh:
        path = tempfile.mkdtemp(prefix=f"{tag}_")
        _STORE_CACHE[key] = path
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return _STORE_CACHE[key], fresh


def _t(spark, sf_dir, name):
    return load_table(sf_dir, name, spark=spark)


# ---------------------------------------------------------------------------
# dedup: exact
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    """
    WITH dd AS (
        SELECT lang FROM documents
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    raw AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    uni AS (SELECT lang, COUNT(*) AS n_unique FROM dd GROUP BY lang)
    SELECT raw.lang, raw.n_docs, COALESCE(uni.n_unique, 0) AS n_unique
    FROM raw LEFT JOIN uni USING (lang)
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: keep min-doc_id row per distinct text (hash-groupBy)."""
    from .operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    raw = docs.groupBy("lang").agg(SF.count(SF.lit(1)).alias("n_docs"))
    uni = exact_dedup(docs).groupBy("lang").agg(SF.count(SF.lit(1)).alias("n_unique"))
    return raw.join(uni, "lang", "left").select(
        "lang", "n_docs", SF.coalesce(SF.col("n_unique"), SF.lit(0)).alias("n_unique")
    )


# ---------------------------------------------------------------------------
# dedup: MinHash + LSH banding
# ---------------------------------------------------------------------------


def _hex15_sql(expr: str) -> str:
    """First 15 md5 hex chars of ``expr`` as a BIGINT (nibble expansion —
    works in any SQL engine without a conv() builtin)."""
    terms = []
    for k in range(1, 16):
        nib = (
            f"(CASE WHEN ascii(substr(md5({expr}), {k}, 1)) <= 57 "
            f"THEN ascii(substr(md5({expr}), {k}, 1)) - 48 "
            f"ELSE ascii(substr(md5({expr}), {k}, 1)) - 87 END)"
        )
        terms.append(f"CAST({nib} AS BIGINT) * {16 ** (15 - k)}")
    return "(" + " + ".join(terms) + ")"


def _minhash_sql(i: int) -> str:
    from .operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P32

    base = f"({_hex15_sql('s')} % {MINHASH_P32})"
    mh = f"list_min(list_transform(sh, s -> ({MINHASH_A[i]} * {base} + {MINHASH_B[i]}) % {MINHASH_P32}))"
    # docs with <3 words have no shingles: hash the raw text through the
    # same universal-hash family, mirroring with_minhash's coalesce
    fb = f"({MINHASH_A[i]} * ({_hex15_sql('text')} % {MINHASH_P32}) + {MINHASH_B[i]}) % {MINHASH_P32}"
    return f"COALESCE({mh}, {fb})"


_MINHASH_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, text, {_SHINGLES3.format(w="ws")} AS sh
        FROM (SELECT doc_id, text, {_WORDS.format(t="text")} AS ws FROM documents)
    ),
    sig AS (
        SELECT doc_id, {", ".join(f"{_minhash_sql(i)} AS mh{i}" for i in range(8))}
        FROM sh
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS bucket FROM sig" for b in range(4))}
    ),
    bc AS (SELECT band, bucket, COUNT(*) AS c FROM bands GROUP BY 1, 2)
    SELECT band, COUNT(*) AS n_buckets,
           CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_candidate_docs
    FROM bc GROUP BY band
"""


@query("q_dedup_minhash_lsh", _MINHASH_ORACLE)
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(k=8, 3-gram) -> 4 LSH bands -> bucket stats: the
    shingle->minhash->band->bucket-join pipeline, all built-ins."""
    from .operators.dedup import lsh_buckets, minhash_signatures

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    # narrow kernel: the text column never enters a shuffle
    sig = minhash_signatures(docs, num_hashes=8, shingle_n=3)
    buckets = lsh_buckets(sig, num_hashes=8, bands=4)
    per_bucket = buckets.groupBy("band", "bucket").agg(SF.count(SF.lit(1)).alias("c"))
    return per_bucket.groupBy("band").agg(
        SF.count(SF.lit(1)).alias("n_buckets"),
        SF.coalesce(SF.sum(SF.when(SF.col("c") > 1, SF.col("c"))), SF.lit(0)).alias("n_candidate_docs"),
    )


_MINHASH_FOLDED_ORACLE = f"""
    WITH d AS (
        SELECT doc_id, text, {_WORDS.format(t="text")} AS ws FROM documents
    ),
    h AS (
        SELECT doc_id, text,
               CASE WHEN text IS NULL THEN 3 ELSE len(ws) END AS n,
               COALESCE(
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))),
                   chr(0) || 'nil' || chr(0) || CAST(doc_id AS VARCHAR)
               ) AS th
        FROM d
    ),
    rep AS (
        SELECT min(doc_id) AS doc_id FROM h WHERE n >= 3 GROUP BY th
        UNION ALL
        SELECT doc_id FROM h WHERE n < 3
    ),
    f AS (
        SELECT h.doc_id, lower(h.text) AS text,
               {_WORDS.format(t="lower(h.text)")} AS ws
        FROM h JOIN rep USING (doc_id)
    ),
    sh AS (SELECT doc_id, text, {_SHINGLES3.format(w="ws")} AS sh FROM f),
    sig AS (
        SELECT doc_id, {", ".join(f"{_minhash_sql(i)} AS mh{i}" for i in range(8))}
        FROM sh
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS bucket FROM sig" for b in range(4))}
    ),
    bc AS (SELECT band, bucket, COUNT(*) AS c FROM bands GROUP BY 1, 2)
    SELECT band, COUNT(*) AS n_buckets,
           CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_candidate_docs
    FROM bc GROUP BY band
"""


@query("q_dedup_minhash_folded", _MINHASH_FOLDED_ORACLE)
def q_dedup_minhash_folded(spark, sf_dir):
    """The strongest dedup defense on the GRADED path (round-11): the
    normalized exact-text census (normalize="ws_case") collapses
    whitespace- AND case-drifted replicas to min-id representatives,
    then the case-folding MinHash kernels (lowercase=True — round-11's
    census-exactness knob) band only the representatives. With folding
    shinglers the ws_case collapse is EXACT: collapsed members share
    their representative's signature bit-for-bit, so downstream
    components are identical to the uncollapsed pipeline's
    (test_scale.py::test_ws_case_census_component_equivalence...)."""
    from .operators.dedup import exact_text_census, lsh_buckets, minhash_signatures

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    rep_ids, _star = exact_text_census(docs, min_words=3, normalize="ws_case")
    rd = docs.join(rep_ids, "doc_id", "left_semi")
    sig = minhash_signatures(rd, num_hashes=8, shingle_n=3, lowercase=True)
    buckets = lsh_buckets(sig, num_hashes=8, bands=4)
    per_bucket = buckets.groupBy("band", "bucket").agg(SF.count(SF.lit(1)).alias("c"))
    return per_bucket.groupBy("band").agg(
        SF.count(SF.lit(1)).alias("n_buckets"),
        SF.coalesce(SF.sum(SF.when(SF.col("c") > 1, SF.col("c"))), SF.lit(0)).alias("n_candidate_docs"),
    )


# ---------------------------------------------------------------------------
# dedup: n-gram Jaccard pairs
# ---------------------------------------------------------------------------


@query(
    "q_dedup_ngram_jaccard",
    f"""
    WITH sh AS (
        SELECT doc_id, text, {_SHINGLES3.format(w="ws")} AS sh
        FROM (SELECT doc_id, text, {_WORDS.format(t="text")} AS ws FROM documents)
    ),
    sig AS (
        SELECT doc_id, {", ".join(f"{_minhash_sql(i)} AS mh{i}" for i in range(8))}
        FROM sh
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS bucket FROM sig" for b in range(4))}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
    FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 10
    """,
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """The full near-dup pipeline: MinHash -> LSH candidate pairs ->
    exact 3-gram Jaccard verification -> top-10. The pair join touches
    only LSH candidates, never the quadratic block — the shape that
    survives a 100x corpus."""
    from .operators.dedup import lsh_candidate_pairs_with_sets

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    # r12: narrow signature pin + candidate-only shingle sets (guide §8;
    # the r11 whole-corpus collect_set pin degraded with cores)
    withsets = lsh_candidate_pairs_with_sets(docs, num_hashes=8, bands=4, shingle_n=3)
    inter = SF.size(SF.array_intersect(SF.col("__sha__"), SF.col("__shb__")))
    union = SF.size(SF.array_union(SF.col("__sha__"), SF.col("__shb__")))
    pairs = withsets.select(
        "id_a", "id_b", SF.round(inter.cast("double") / union, 6).alias("jaccard")
    )
    return pairs.orderBy(SF.col("jaccard").desc(), SF.col("id_a"), SF.col("id_b")).limit(10)


# ---------------------------------------------------------------------------
# dedup: near-dup cluster resolution (connected components)
# ---------------------------------------------------------------------------


@query(
    "q_dedup_clusters",
    f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id, text, {_SHINGLES3.format(w="ws")} AS sh
        FROM (SELECT doc_id, text, {_WORDS.format(t="text")} AS ws FROM documents)
    ),
    sig AS (
        SELECT doc_id, {", ".join(f"{_minhash_sql(i)} AS mh{i}" for i in range(8))}
        FROM sh
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS bucket FROM sig" for b in range(4))}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    p AS (
        SELECT id_a, id_b FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.8
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
    reach(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    ),
    lbl AS (SELECT src AS v, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src)
    SELECT comp AS component, COUNT(*) AS size FROM lbl GROUP BY comp ORDER BY component
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """The END of the near-dup pipeline: MinHash -> LSH candidates ->
    exact-jaccard verify (>= 0.8) -> CONNECTED COMPONENTS (iterative
    min-label propagation, operators/dedup.neardup_components) ->
    per-cluster sizes. The oracle resolves the same clusters with a
    recursive-CTE transitive closure."""
    from .operators.dedup import (
        exact_text_census,
        lsh_candidate_pairs_with_sets,
        neardup_components,
    )

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    # exact-text census (same quadratic-pair fix as q_dedup_keep_best):
    # band/verify only one representative per distinct text; star edges
    # re-attach members with provably identical components and labels
    # (the component label is the min member id, which the star's min-id
    # representative rule preserves)
    rep_ids, star = exact_text_census(docs, min_words=3)
    rdocs = docs.join(rep_ids, "doc_id", "left_semi")
    # r12: narrow signature pin + candidate-only shingle sets (guide §8;
    # the r11 whole-corpus collect_set pin degraded with cores)
    withsets = lsh_candidate_pairs_with_sets(rdocs, num_hashes=8, bands=4, shingle_n=3)
    inter = SF.size(SF.array_intersect(SF.col("__sha__"), SF.col("__shb__")))
    union = SF.size(SF.array_union(SF.col("__shb__"), SF.col("__sha__")))
    pairs = (
        withsets.filter(inter.cast("double") / union >= 0.8)
        .select("id_a", "id_b")
        .unionByName(star)
    )
    comps = neardup_components(pairs)
    return (
        comps.groupBy("component")
        .agg(SF.count(SF.lit(1)).alias("size"))
        .orderBy("component")
    )


@query(
    "q_dedup_keep_best",
    f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id, text, {_SHINGLES3.format(w="ws")} AS sh
        FROM (SELECT doc_id, text, {_WORDS.format(t="text")} AS ws FROM documents)
    ),
    sig AS (
        SELECT doc_id, {", ".join(f"{_minhash_sql(i)} AS mh{i}" for i in range(8))}
        FROM sh
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS bucket FROM sig" for b in range(4))}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    p AS (
        SELECT id_a, id_b FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.8
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM p UNION SELECT id_b, id_a FROM p),
    reach(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
    ),
    lbl AS (SELECT src AS v, LEAST(src, MIN(dst)) AS comp FROM reach GROUP BY src),
    ranked AS (
        SELECT l.comp, d.doc_id,
               row_number() OVER (PARTITION BY l.comp
                                  ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
        FROM lbl l JOIN documents d ON d.doc_id = l.v
    ),
    dropped AS (SELECT doc_id FROM ranked WHERE rn > 1)
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    GROUP BY lang
    """,
)
def q_dedup_keep_best(spark, sf_dir):
    """Near-dup REMOVAL keeping the best representative — what a
    pipeline actually ships (q_dedup_clusters only reports cluster
    sizes): MinHash/LSH candidates -> exact-Jaccard verify (>= 0.8) ->
    connected components -> per cluster keep the LONGEST document
    (n_chars DESC, doc_id ASC tie-break — a deterministic total order)
    via one max_by(struct) aggregate -> two anti-joins
    (operators/dedup.dedup_keep_best). Survivor identity is
    value-verified (per-lang id sums) against a recursive-CTE closure
    in DuckDB."""
    from .operators.dedup import (
        dedup_keep_best,
        exact_text_census,
        lsh_candidate_pairs_with_sets,
    )

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    # collapse exact-text groups FIRST (quadratic-pair fix, round-9
    # verdict #2): banding/shingling/verify run on one representative
    # per distinct text; star edges re-attach members with provably
    # identical components (see exact_text_census docstring)
    # min_words=3 (the shingle width): duplicate sub-3-word texts have
    # EMPTY shingle sets, which the SQL banding oracle never pairs —
    # they stay uncollapsed so engine == oracle on any corpus
    rep_ids, star = exact_text_census(docs, min_words=3)
    rdocs = docs.join(rep_ids, "doc_id", "left_semi")
    # r12: narrow signature pin + candidate-only shingle sets (guide §8;
    # the r11 whole-corpus collect_set pin degraded with cores)
    withsets = lsh_candidate_pairs_with_sets(rdocs, num_hashes=8, bands=4, shingle_n=3)
    inter = SF.size(SF.array_intersect(SF.col("__sha__"), SF.col("__shb__")))
    union = SF.size(SF.array_union(SF.col("__sha__"), SF.col("__shb__")))
    pairs = (
        withsets.filter(inter.cast("double") / union >= 0.8)
        .select("id_a", "id_b")
        .unionByName(star)
    )
    kept = dedup_keep_best(docs, pairs, quality_col="n_chars")
    return kept.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_kept"),
        SF.sum("doc_id").alias("id_sum"),
    )



@query(
    "q_text_unigram_logprob",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_WORDS.format(t="text")}) AS tok FROM documents
    ),
    t2 AS (SELECT doc_id, tok FROM toks WHERE len(tok) > 0),
    vocab AS (SELECT tok, COUNT(*) AS c FROM t2 GROUP BY tok),
    tot AS (SELECT SUM(c) AS t FROM vocab),
    lp AS (SELECT tok, ln(CAST(c AS DOUBLE)) - ln(CAST(t AS DOUBLE)) AS lp FROM vocab, tot)
    SELECT doc_id, ROUND(AVG(lp), 6) AS unigram_logprob, COUNT(*) AS n_tokens
    FROM t2 JOIN lp USING (tok)
    GROUP BY doc_id
    ORDER BY unigram_logprob ASC, doc_id
    LIMIT 50
    """,
)
def q_text_unigram_logprob(spark, sf_dir):
    """Perplexity-proxy quality scoring: per-doc mean unigram log-prob
    against the corpus distribution (operators/text.unigram_logprob);
    the 50 most 'surprising' docs — the filter tail a corpus-cleaning
    pipeline would inspect or drop."""
    from .operators.text import unigram_logprob

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    scored = unigram_logprob(docs)
    return (
        scored.select(
            "doc_id", SF.round(SF.col("unigram_logprob"), 6).alias("unigram_logprob"), "n_tokens"
        )
        .orderBy(SF.col("unigram_logprob").asc(), SF.col("doc_id"))
        .limit(50)
    )


@query(
    "q_text_bigram_logprob",
    f"""
    WITH arr AS (
        SELECT doc_id, list_filter({_WORDS.format(t="text")}, x -> len(x) > 0) AS a
        FROM documents
    ),
    t AS (SELECT doc_id, unnest(a) AS tok, generate_subscripts(a, 1) AS pos FROM arr),
    pairs AS (
        SELECT doc_id, w1, tok AS w2 FROM (
            SELECT doc_id, tok, lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
            FROM t
        ) WHERE w1 IS NOT NULL
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
    ctx AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT tok) AS vs FROM t),
    lp AS (
        SELECT w1, w2,
               ln((CAST(c12 AS DOUBLE) + 0.5) / (CAST(c1 AS DOUBLE) + 0.5 * vs)) AS lp
        FROM big JOIN ctx USING (w1), v
    )
    SELECT doc_id, ROUND(AVG(lp), 6) AS bigram_logprob, COUNT(*) AS n_bigrams
    FROM pairs JOIN lp USING (w1, w2)
    GROUP BY doc_id
    ORDER BY bigram_logprob ASC, doc_id
    LIMIT 50
    """,
)
def q_text_bigram_logprob(spark, sf_dir):
    """Bigram-LM perplexity proxy with add-0.5 smoothing (operators/
    text.bigram_logprob): word ORDER now matters, so the 50 most
    surprising docs include shuffled/boilerplate text a unigram filter
    scores as normal. zip_with-over-slices bigrams — no window, no
    posexplode self-join."""
    from .operators.text import bigram_logprob

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    scored = bigram_logprob(docs)
    return (
        scored.select(
            "doc_id", SF.round(SF.col("bigram_logprob"), 6).alias("bigram_logprob"), "n_bigrams"
        )
        .orderBy(SF.col("bigram_logprob").asc(), SF.col("doc_id"))
        .limit(50)
    )


@query(
    "q_text_stratified_sample",
    """
    WITH s AS (
        SELECT lang, n_chars FROM documents
        WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
              < CASE lang WHEN 'en' THEN 2500 WHEN 'de' THEN 10000
                          WHEN 'fr' THEN 5000 WHEN 'es' THEN 7500 ELSE 1000 END
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM s GROUP BY lang
    """,
)
def q_text_stratified_sample(spark, sf_dir):
    """Domain-mix rebalancing (operators/text.stratified_sample):
    per-stratum deterministic hash rates — downsample en, keep all de,
    unlisted langs fall to the 10% default. Pure-codegen filter, zero
    shuffle before the rollup; the DuckDB oracle reproduces the exact
    row set from the shared md5-bucket rule."""
    from .operators.text import stratified_sample

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    s = stratified_sample(
        docs, "lang", {"en": 0.25, "de": 1.0, "fr": 0.5, "es": 0.75}, default_rate=0.10
    )
    return s.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_docs"),
        SF.sum("n_chars").cast("bigint").alias("chars"),
    )


@query(
    "q_mixture_sample",
    """
    WITH sz AS (
        SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n_k FROM documents GROUP BY lang
    ),
    thr AS (
        SELECT lang,
               LEAST(CAST(FLOOR(((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.3
                                            WHEN 'fr' THEN 0.2 END / 1.0)
                                 * 1000.0 / n_k) * 10000 + 0.5) AS BIGINT),
                     10000) AS t
        FROM sz WHERE lang IN ('en', 'de', 'fr')
    ),
    s AS (
        SELECT d.lang, d.doc_id, d.n_chars
        FROM documents d JOIN thr USING (lang)
        WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 10000 < thr.t
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM s GROUP BY lang
    """,
)
def q_mixture_sample(spark, sf_dir):
    """Weighted-MIXTURE sampling (operators/text.mixture_sample — the
    pretraining data-mix primitive, round-11): target composition 50%
    en / 30% de / 20% fr over ~1000 docs, rates derived from the
    measured per-lang sizes, same deterministic md5-bucket keep rule as
    hash_sample so the oracle reproduces the exact row set (thresholds
    integral half-up on both engines). Unlisted langs drop; a stratum
    too small for its target clamps to keep-all."""
    from .operators.text import mixture_sample

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    s = mixture_sample(docs, "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}, n_total=1000)
    return s.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_docs"),
        SF.sum("doc_id").cast("bigint").alias("id_sum"),
        SF.sum("n_chars").cast("bigint").alias("chars"),
    )


@query(
    "q_mixture_upsample",
    """
    WITH sz AS (
        SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n_k FROM documents GROUP BY lang
    ),
    rt AS (
        SELECT lang,
               ((CASE lang WHEN 'de' THEN 0.6 WHEN 'fr' THEN 0.4 END / 1.0)
                * 2000.0 / n_k) AS rate
        FROM sz WHERE lang IN ('de', 'fr')
    ),
    thr AS (
        SELECT lang, CAST(FLOOR(rate) AS BIGINT) AS e,
               LEAST(CAST(FLOOR((rate - FLOOR(rate)) * 10000 + 0.5) AS BIGINT),
                     10000) AS t
        FROM rt
    ),
    cp AS (
        SELECT d.lang, d.doc_id, d.n_chars,
               thr.e + (CASE WHEN CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                             % 10000 < thr.t THEN 1 ELSE 0 END) AS copies
        FROM documents d JOIN thr USING (lang)
    ),
    s AS (
        SELECT lang, doc_id, n_chars, CAST(e AS BIGINT) AS epoch
        FROM cp, UNNEST(range(copies)) AS t(e)
        WHERE copies > 0
    )
    SELECT lang, COUNT(*) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(epoch) AS BIGINT) AS epoch_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM s GROUP BY lang
    """,
)
def q_mixture_upsample(spark, sf_dir):
    """Upsampling mixture mode (round-11): small high-quality strata
    REPEAT to hit their target — floor(rate) whole epochs per row plus
    a fractional epoch drawn by the md5-bucket rule, epoch index
    emitted per copy. de/fr targeted well past their corpus sizes so
    both strata exercise multi-epoch replication; the oracle unnests
    the same copy counts."""
    from .operators.text import mixture_sample

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    s = mixture_sample(
        docs, "lang", {"de": 0.6, "fr": 0.4}, n_total=2000, upsample=True
    )
    return s.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_rows"),
        SF.countDistinct("doc_id").alias("n_docs"),
        SF.sum("epoch").cast("bigint").alias("epoch_sum"),
        SF.sum("n_chars").cast("bigint").alias("chars"),
    )


# ---------------------------------------------------------------------------
# dedup: SimHash (16-bit oracle-expressible variant)
# ---------------------------------------------------------------------------


def _simhash_bit_sql(j: int, bits: int = 16) -> str:
    char_pos = bits // 4 - j // 4
    p = 2 ** (j % 4)
    nib = f"(CASE WHEN ascii(substr(h, {char_pos}, 1)) <= 57 THEN ascii(substr(h, {char_pos}, 1)) - 48 ELSE ascii(substr(h, {char_pos}, 1)) - 87 END)"
    return f"SUM(CASE WHEN CAST(floor({nib} / {p}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS b{j}"


def _simhash_oracle_sql(bits: int) -> str:
    return f"""
    WITH w AS (
        SELECT doc_id, unnest({_WORDS.format(t="lower(text)")}) AS word FROM documents
    ),
    h AS (SELECT doc_id, md5(word) AS h FROM w),
    bits AS (
        SELECT doc_id, {", ".join(_simhash_bit_sql(j, bits) for j in range(bits))}
        FROM h GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({" + ".join(f"(CASE WHEN b{j} > 0 THEN {2**j if j < 63 else -(2**63)} ELSE 0 END)" for j in range(bits))} AS BIGINT) AS simhash
    FROM bits
"""


_SIMHASH_ORACLE = _simhash_oracle_sql(16)


@query("q_dedup_simhash", _SIMHASH_ORACLE)
def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash per document — explode + one groupBy, no UDF."""
    from .operators.dedup import simhash16

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    return simhash16(docs)


@query(
    "q_dedup_hamming",
    f"""
    WITH sig AS ({_simhash_oracle_sql(64)}),
    cnt AS (SELECT simhash, COUNT(*) AS c FROM sig GROUP BY simhash),
    cross_pairs AS (
        SELECT bit_count(xor(a.simhash, b.simhash)) AS hamming, a.c * b.c AS np
        FROM cnt a JOIN cnt b ON a.simhash < b.simhash
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ),
    allp AS (
        SELECT hamming, np FROM cross_pairs
        UNION ALL
        SELECT 0 AS hamming, c * (c - 1) / 2 AS np FROM cnt WHERE c > 1
    )
    SELECT hamming, CAST(SUM(np) AS BIGINT) AS n_pairs
    FROM allp GROUP BY hamming
    """,
)
def q_dedup_hamming(spark, sf_dir):
    """Near-dup pair census by SimHash hamming distance (<=3) over
    64-BIT signatures: docs collapse to DISTINCT signatures with
    multiplicities first (the scale move: banding cost stops growing
    with corpus size), pigeonhole-banded candidate pairs over distinct
    signatures (recall 1.0, operators/dedup.hamming_candidates — 4
    bands of 16 bits gives 65k bucket values per band, so candidate
    volume stays ~linear in distinct signatures; the old 32-bit/8-bit
    banding saturated at 256 buckets and went near-quadratic), then the
    pair count per distance from the multiplicities. The oracle
    brute-forces distinct-signature pairs — banding + verify must
    reproduce it exactly."""
    from .operators.dedup import hamming_candidates, simhash_bits

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    cnt = (
        simhash_bits(docs, bits=64)
        .groupBy("simhash")
        .agg(SF.count(SF.lit(1)).alias("c"))
        # the signature table feeds 4 branches (banding, 2 count joins,
        # same-sig term): pin it so SimHash runs once, not per branch
        .localCheckpoint(eager=False)
    )
    pairs = hamming_candidates(
        cnt.withColumn("sig_id", SF.col("simhash")),
        key_col="sig_id",
        sig_col="simhash",
        max_distance=3,
        bits=64,
    )
    cross = (
        pairs.join(SF.broadcast(cnt.select(SF.col("simhash").alias("id_a"), SF.col("c").alias("ca"))), "id_a")
        .join(SF.broadcast(cnt.select(SF.col("simhash").alias("id_b"), SF.col("c").alias("cb"))), "id_b")
        .select("hamming", (SF.col("ca") * SF.col("cb")).alias("np"))
    )
    same = cnt.filter(SF.col("c") > 1).select(
        SF.lit(0).alias("hamming"), (SF.col("c") * (SF.col("c") - 1) / 2).cast("long").alias("np")
    )
    return (
        cross.unionByName(same)
        .groupBy("hamming")
        .agg(SF.sum("np").cast("bigint").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# dedup: embedding cosine near-dup
# ---------------------------------------------------------------------------

_COS_SQL = (
    "ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)"
)


@query(
    "q_dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_SQL} AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    ORDER BY cosine DESC, id_a, id_b
    LIMIT 10
    """,
)
def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup: top cosine pairs within label blocks."""
    from .operators.similarity import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    pairs = embedding_neardup_pairs(emb, threshold=None, block_col="label")
    return pairs.orderBy(SF.col("cosine").desc(), SF.col("id_a"), SF.col("id_b")).limit(10)


# ---------------------------------------------------------------------------
# dedup: signed-random-projection LSH over embeddings (no block key)
# ---------------------------------------------------------------------------


def _rhp_oracle_sql(nbits=16, bands=4, dim=64, seed=42):
    """The DuckDB mirror of operators/similarity.embedding_lsh_pairs:
    identical plane literals, identical left-associative dot sums, so the
    candidate SET (not just rounded cosines) reproduces bit-exactly."""
    from .operators.similarity import rhp_planes

    planes = rhp_planes(nbits, dim, seed)
    r = nbits // bands

    def dot_sql(p):
        return " + ".join(f"CAST(embedding[{i + 1}] AS DOUBLE) * {p[i]!r}" for i in range(dim))

    band_exprs = []
    for b in range(bands):
        bits = " + ".join(
            f"(CASE WHEN {dot_sql(planes[b * r + j])} >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(r)
        )
        band_exprs.append(f"({bits}) AS b{b}")
    collide = " OR ".join(f"a.b{b} = b.b{b}" for b in range(bands))
    return f"""
    WITH s AS (SELECT vec_id, {", ".join(band_exprs)} FROM embeddings),
    c AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM s a JOIN s b ON a.vec_id < b.vec_id AND ({collide})
    )
    SELECT id_a, id_b, {_COS_SQL} AS cosine
    FROM c JOIN embeddings a ON a.vec_id = c.id_a JOIN embeddings b ON b.vec_id = c.id_b
    ORDER BY cosine DESC, id_a, id_b
    LIMIT 10
    """


# ---------------------------------------------------------------------------
# similarity: trained IVF with multi-probe
# ---------------------------------------------------------------------------


# Pretrained IVF centroids, checked in as constants (see ivf_constants.py):
# no import-time k-means, no absolute data-path dependence.
from .ivf_constants import IVF_CENTROIDS as _IVF_CENTROIDS


def _ivf_oracle_sql(centroids, nprobe=2, topk=5, dim=64):
    """DuckDB mirror of ivf_topk_trained with the same centroid literals:
    left-associative dot sums, first-argmax cell, (sim desc, cell asc)
    probe order — candidate sets reproduce exactly."""
    nc = len(centroids)

    def dot_sql(c, tbl="embedding"):
        return " + ".join(f"CAST({tbl}[{i + 1}] AS DOUBLE) * {c[i]!r}" for i in range(dim))

    d_exprs = ", ".join(f"({dot_sql(c)}) AS d{j}" for j, c in enumerate(centroids))
    first_argmax = "CASE " + " ".join(
        f"WHEN {' AND '.join(f'd{j} >= d{i}' for i in range(nc) if i != j)} THEN {j}"
        for j in range(nc)
    ) + " END"
    probe_structs = ", ".join(f"struct_pack(nd := -d{j}, c := {j})" for j in range(nc))
    return f"""
    WITH cd AS (SELECT vec_id, embedding, {d_exprs} FROM embeddings),
    cc AS (SELECT vec_id, embedding, {first_argmax} AS cell FROM cd),
    qp AS (
        SELECT vec_id AS query_id, embedding AS qe,
               unnest(list_transform(list_slice(list_sort([{probe_structs}]), 1, {nprobe}), s -> s.c)) AS cell
        FROM cd WHERE vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT qp.query_id, cc.vec_id AS neighbor_id,
               ROUND(list_dot_product(CAST(qe AS DOUBLE[]), CAST(cc.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(cc.embedding AS DOUBLE[]), CAST(cc.embedding AS DOUBLE[])))), 6) AS cosine
        FROM qp JOIN cc ON cc.cell = qp.cell AND cc.vec_id <> qp.query_id
    )
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) <= {topk}
    """


@query("q_ann_ivf_trained", _ivf_oracle_sql(_IVF_CENTROIDS))
def q_ann_ivf_trained(spark, sf_dir):
    """Trained-IVF ANN with multi-probe (nprobe=2 of 8 k-means cells):
    the FAISS-style recall/latency trade as a per-cell equi-join
    (operators/similarity.ivf_topk_trained + kmeans_fit)."""
    from .operators.similarity import ivf_topk_trained

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    queries = emb.filter(SF.col("vec_id") < 10)
    return ivf_topk_trained(emb, queries, k=5, centroids=_IVF_CENTROIDS, nprobe=2)


@query("q_dedup_embedding_lsh", _rhp_oracle_sql(nbits=32, bands=4))
def q_dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup with NO blocking column: random-hyperplane
    (SimHash) LSH banding -> candidate pairs -> exact-cosine top-10
    (operators/similarity.embedding_lsh_pairs; Charikar 2002 SRP).

    32-bit signatures / 4 bands (8-bit band keys, 256 bucket values per
    band): measured at sf0.1 the old 16/4 banding put 24% of ALL pairs
    into the candidate join (526k pairs from 2000 vectors — the
    dropDuplicates hash-agg alone cost 1.2 CPU-minutes); 8-bit bands cut
    candidates ~60x while the banding recall at cosine>=0.95 stays ~0.9
    — and the bucket count is what grows when the corpus does, which is
    the 100 TB lever."""
    from .operators.similarity import embedding_lsh_pairs

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    pairs = embedding_lsh_pairs(emb, nbits=32, bands=4, dim=64, seed=42)
    return pairs.orderBy(SF.col("cosine").desc(), SF.col("id_a"), SF.col("id_b")).limit(10)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@query(
    "q_ann_bruteforce_topk",
    f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS_SQL.replace("a.embedding", "q.embedding").replace("b.embedding", "c.embedding")} AS cosine
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 10
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) <= 5
    """,
)
def q_ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-5 for 10 query vectors (broadcast query side)."""
    from .operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    queries = emb.filter(SF.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5)


@query(
    "q_ann_ivf_topk",
    f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS_SQL.replace("a.embedding", "q.embedding").replace("b.embedding", "c.embedding")} AS cosine
    FROM embeddings q JOIN embeddings c
      ON c.label = q.label AND c.vec_id <> q.vec_id
    WHERE q.vec_id < 10
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) <= 5
    """,
)
def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: search only the query's coarse cell (label)."""
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    queries = emb.filter(SF.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=5, cell_col="label")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

_SW = "('the','a','an','and','or','of','to','in','is','it')"


@query(
    "q_text_stats",
    f"""
    WITH t AS (
        SELECT lang,
               CASE WHEN length(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))) = 0 THEN 0 ELSE len({_WORDS.format(t="text")}) END AS n_tokens,
               n_chars,
               CASE WHEN len({_WORDS.format(t="lower(text)")}) > 0
                    THEN CAST(len(list_filter({_WORDS.format(t="lower(text)")}, w -> w IN {_SW})) AS DOUBLE)
                         / len({_WORDS.format(t="lower(text)")})
                    ELSE 0.0 END AS sw_ratio,
               CASE WHEN len({_WORDS.format(t="text")}) > 0
                    THEN CAST(list_sum(list_transform({_WORDS.format(t="text")}, w -> length(w))) AS DOUBLE)
                         / len({_WORDS.format(t="text")})
                    ELSE 0.0 END AS mwl
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(n_tokens), 6) AS avg_tokens,
           ROUND(AVG(n_chars), 6) AS avg_chars,
           ROUND(AVG(sw_ratio), 6) AS avg_sw_ratio,
           ROUND(AVG(mwl), 6) AS avg_word_len
    FROM t GROUP BY lang
    """,
)
def q_text_stats(spark, sf_dir):
    """Token counting + quality components per lang — ZERO per-word
    rows: every per-doc metric is one codegen pass over the document
    string, so the only exchange left is the tiny per-lang aggregation.

    - token count: size(split(trimmed, \\s+)) — one split
    - summed word length: length(regexp_replace(trimmed, \\s+, '')) —
      whitespace removed, one regex pass (equals the sum over tokens)
    - stopword hits: ONE regexp_count with an alternation anchored by
      whitespace lookaround — equivalent to per-token isin(STOPWORDS)
      (the lookahead rejects partial-token matches like 'it,'), without
      exploding 90 rows per doc through a doc_id hash-aggregate (the
      previous shape: 1.17 s at sf0.1 vs 0.08 s warm for this one)

    The trimmed text materializes ONCE as a named column: btrim is
    non-cheap, so CollapseProject keeps it shared instead of re-running
    it in every fused use (Spark does no CSE across a collapsed
    projection otherwise)."""
    from .operators.text import STOPWORDS, wtrim

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    # NULL text: metrics come from '' (n_docs/avg_chars must keep the
    # doc) but n_tokens stays NULL like the oracle's len(split(NULL))
    base = docs.select(
        "lang",
        "n_chars",
        SF.col("text").isNull().alias("__isnull__"),
        wtrim(SF.coalesce(SF.col("text"), SF.lit(""))).alias("__t__"),
    )
    sw_rx = r"(?<=^|\s)(" + "|".join(STOPWORDS) + r")(?=$|\s)"
    per_doc = base.select(
        "lang",
        "n_chars",
        "__isnull__",
        SF.when(SF.length("__t__") == 0, 0)
        .otherwise(SF.size(SF.split(SF.col("__t__"), r"\s+")))
        .alias("__nw__"),
        SF.length(SF.regexp_replace(SF.col("__t__"), r"\s+", "")).alias("__wl__"),
        SF.regexp_count(SF.lower(SF.col("__t__")), SF.lit(sw_rx)).alias("__sw__"),
    )
    # oracle NULL/empty semantics: n_tokens NULL for NULL text; the
    # ratio CASEs fall to 0.0 when there are no tokens
    enriched = per_doc.select(
        "lang",
        SF.when(SF.col("__isnull__"), SF.lit(None)).otherwise(SF.col("__nw__")).alias("n_tokens"),
        "n_chars",
        SF.when(SF.col("__nw__") > 0, SF.col("__sw__").cast("double") / SF.col("__nw__"))
        .otherwise(SF.lit(0.0))
        .alias("sw_ratio"),
        SF.when(SF.col("__nw__") > 0, SF.col("__wl__").cast("double") / SF.col("__nw__"))
        .otherwise(SF.lit(0.0))
        .alias("mwl"),
    )
    return enriched.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_docs"),
        SF.round(SF.avg("n_tokens"), 6).alias("avg_tokens"),
        SF.round(SF.avg("n_chars"), 6).alias("avg_chars"),
        SF.round(SF.avg("sw_ratio"), 6).alias("avg_sw_ratio"),
        SF.round(SF.avg("mwl"), 6).alias("avg_word_len"),
    )


def _lang_score_sql(markers: list[str]) -> str:
    quoted = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(ws, w -> w IN ({quoted})))"


def _langid_oracle() -> str:
    from .operators.text import LANG_MARKERS

    scores = ", ".join(f"{_lang_score_sql(m)} AS s_{lang}" for lang, m in LANG_MARKERS.items())
    order = list(LANG_MARKERS)
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in order) + ")"
    chain = " ".join(f"WHEN s_{lang} = m THEN '{lang}'" for lang in order)
    return f"""
    WITH s AS (
        SELECT lang, {scores}
        FROM (SELECT lang, {_WORDS.format(t="lower(text)")} AS ws FROM documents)
    ),
    p AS (
        SELECT lang,
               CASE WHEN {m} = 0 THEN 'und' {chain} END AS predicted
        FROM (SELECT *, {m} AS m FROM s)
    )
    SELECT lang, predicted, COUNT(*) AS n FROM p GROUP BY lang, predicted
    """


@query("q_text_langid", _langid_oracle())
def q_text_langid(spark, sf_dir):
    """Heuristic n-gram language ID vs the labeled lang (explode +
    codegen conditional sums — the scale shape)."""
    from .operators.text import predict_lang_table

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    pred = predict_lang_table(docs, "doc_id", "text")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted")
        .agg(SF.count(SF.lit(1)).alias("n"))
    )


@query(
    "q_text_fingerprint",
    f"""
    SELECT doc_id,
           CASE WHEN len(sh) >= 1 THEN list_min(list_transform(sh, s -> md5(s)))
                ELSE md5(text) END AS fingerprint
    FROM (
        SELECT doc_id, text,
               CASE WHEN len(ws) >= 5
                    THEN list_transform(range(1, len(ws) - 3), i -> array_to_string(list_slice(ws, i, i + 4), ' '))
                    ELSE [] END AS sh
        FROM (SELECT doc_id, text, {_WORDS.format(t="text")} AS ws FROM documents)
    )
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (min md5 over 5-gram windows)."""
    from .operators.text import fingerprint_table

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    return fingerprint_table(docs, "doc_id", "text", n=5)


# ---------------------------------------------------------------------------
# multimodal plumbing (binary payloads; deterministic fake decode)
# ---------------------------------------------------------------------------


def _nib_sql(expr: str) -> str:
    return f"(CASE WHEN ascii({expr}) <= 57 THEN ascii({expr}) - 48 ELSE ascii({expr}) - 87 END)"


_FEAT_SQL = ", ".join(
    f"ROUND(({_nib_sql(f'substr(md5(text), {i * 2 + 1}, 1)')} * 16 + {_nib_sql(f'substr(md5(text), {i * 2 + 2}, 1)')}) / 255.0, 6) AS f{i}"
    for i in (0, 7)
)


@query(
    "q_multimodal_features",
    f"""
    SELECT doc_id AS media_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text) AS digest,
           {_FEAT_SQL}
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Binary-column pipeline: text bytes as fake media payloads ->
    mapInPandas feature extraction (Arrow batches)."""
    from .operators.multimodal import extract_features

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    media = docs.select(SF.col("doc_id").alias("media_id"), SF.col("text").cast("binary").alias("payload"))
    feats = extract_features(media, fake=True, dim=8)
    return feats.select(
        "media_id",
        "n_bytes",
        "digest",
        SF.round(SF.col("features")[0], 6).alias("f0"),
        SF.round(SF.col("features")[7], 6).alias("f7"),
    )


@query(
    "q_multimodal_decode",
    """
    SELECT doc_id AS media_id,
           2.0 AS w, 2.0 AS h,
           ROUND(CAST(doc_id % 256 AS DOUBLE), 6) AS mean_r,
           ROUND(CAST((doc_id * 7) % 256 AS DOUBLE), 6) AS mean_g,
           ROUND(CAST((doc_id * 13) % 256 AS DOUBLE), 6) AS mean_b,
           0.0 AS gray_std,
           ROUND((doc_id % 256 + (doc_id * 7) % 256 + (doc_id * 13) % 256) / 3.0, 6) AS gray_mx
    FROM documents WHERE doc_id < 200
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """REAL image decode through the media pipeline: a 2x2 PPM payload is
    synthesized per doc JVM-side (pixel channels are a known function of
    doc_id), mapInPandas decodes the actual bytes (operators/multimodal.
    decode_image, pure numpy) and emits pixel statistics — the oracle
    recomputes the same statistics arithmetically, so a decode bug
    (header parse, stride, channel order) breaks the match."""
    from .operators.multimodal import extract_features

    docs = _t(spark, sf_dir, "documents").lazy_sdf().filter(SF.col("doc_id") < 200)
    byte = lambda c: SF.unhex(SF.lpad(SF.hex(c.cast("int")), 2, "0"))  # noqa: E731
    a, b, c = (
        byte(SF.col("doc_id") % 256),
        byte((SF.col("doc_id") * 7) % 256),
        byte((SF.col("doc_id") * 13) % 256),
    )
    px = SF.concat(a, b, c)
    payload = SF.concat(SF.lit("P6\n2 2\n255\n").cast("binary"), px, px, px, px)
    media = docs.select(SF.col("doc_id").alias("media_id"), payload.alias("payload"))
    feats = extract_features(media, fake=False, dim=8)
    return feats.select(
        "media_id",
        SF.col("features")[0].alias("w"),
        SF.col("features")[1].alias("h"),
        SF.round(SF.col("features")[2], 6).alias("mean_r"),
        SF.round(SF.col("features")[3], 6).alias("mean_g"),
        SF.round(SF.col("features")[4], 6).alias("mean_b"),
        SF.col("features")[5].alias("gray_std"),
        SF.round(SF.col("features")[7], 6).alias("gray_mx"),
    )


@query(
    "q_multimodal_video",
    """
    SELECT doc_id AS media_id,
           CAST(FLOOR((5 + doc_id % 30 - 1) / 10) + 1 AS BIGINT) AS n_sampled,
           CAST(24 AS BIGINT) AS frame_bytes
    FROM documents WHERE doc_id < 200
    """,
)
def q_multimodal_video(spark, sf_dir):
    """REAL video decode through the media pipeline: a Y4M (YUV4MPEG2)
    payload is synthesized per doc JVM-side (4x4 C420 at 10 fps,
    5 + doc_id%30 frames of a known byte), frame_sample parses the
    actual container bytes (operators/multimodal.parse_y4m, pure
    python) and samples every 1000 ms -> every 10th frame; the oracle
    recomputes the sampled count arithmetically, so a header-parse or
    frame-stride bug breaks the match."""
    from .operators.multimodal import frame_sample

    docs = _t(spark, sf_dir, "documents").lazy_sdf().filter(SF.col("doc_id") < 200)
    payload = SF.expr(
        "CAST(concat('YUV4MPEG2 W4 H4 F10:1 C420\n', "
        "repeat(concat('FRAME\n', repeat(char(97 + CAST(doc_id % 26 AS INT)), 24)), "
        "5 + CAST(doc_id % 30 AS INT))) AS BINARY)"
    )
    media = docs.select(SF.col("doc_id").alias("media_id"), payload.alias("payload"))
    sampled = frame_sample(media, every_ms=1000)
    return sampled.groupBy("media_id").agg(
        SF.count(SF.lit(1)).alias("n_sampled"),
        SF.max(SF.length("frame_payload")).cast("long").alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# event streaming shapes (batch-equivalent, run as streaming in tests)
# ---------------------------------------------------------------------------


@query(
    "q_events_tumbling",
    """
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_events_tumbling(spark, sf_dir):
    """Tumbling event-time window aggregation (same code path serves
    readStream with a watermark)."""
    from .streaming import tumbling_counts

    ev = _t(spark, sf_dir, "events").lazy_sdf()
    return tumbling_counts(ev, "1 hour").drop("w_end")


@query(
    "q_events_late_data",
    """
    WITH h AS (SELECT date_trunc('hour', max(ts)) AS h0 FROM events)
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM events, h
    WHERE time_bucket(INTERVAL 1 HOUR, ts) >= h0 - INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def q_events_late_data(spark, sf_dir):
    """Watermark DROP/KEEP boundary, driver-graded (r7 verdict #7): a
    real multi-micro-batch stream (maxFilesPerTrigger=1, file source
    processes oldest first) where batch 1 is a single future anchor row
    that pins the watermark at H - 1h30m (H = trunc-hour of the real max
    ts; anchor = H + 4h30m, delay 6h — the :30 offset makes every
    hour-aligned window end compare UNAMBIGUOUSLY against the
    watermark), batch 2 is the whole events table arriving "late", and
    batch 3 is a far-future flush row that finalizes the surviving
    windows. Two empirics pinned by this build (and the experiment grid
    in NOTES_r10): (1) Spark keeps a late row iff its WINDOW END >
    watermark — whole windows drop atomically; (2) the watermark LAGS
    one batch: the filter for batch N uses event-time stats through
    batch N-2, so a gap batch (a second anchor-time row) sits between
    the anchor and the late shard to make the anchor's watermark
    effective before the late rows arrive. Exactly the windows starting
    >= H - 2h survive; the DuckDB oracle states that boundary
    declaratively over the batch table. State stays bounded by the
    watermark horizon; nothing in the pipeline holds stream history."""
    import datetime as _dtm
    import time as _time

    from .streaming import run_stream_once, tumbling_counts

    ev = _t(spark, sf_dir, "events").lazy_sdf().select("event_type", "ts", "value")
    h0 = ev.agg(SF.date_trunc("hour", SF.max("ts")).alias("h")).first()["h"]
    d, fresh = _cached_store_dir("late_events", sf_dir)
    if fresh:
        sch = ev.schema
        anchor = [("__anchor__", h0 + _dtm.timedelta(hours=4, minutes=30), 0.0)]
        flush = [("__flush__", h0 + _dtm.timedelta(hours=100), 0.0)]
        for i, batch in enumerate((anchor, anchor, None, flush)):
            if batch is None:
                # one file: with maxFilesPerTrigger=1 every part file is
                # its own micro-batch (fixed ~0.3-0.5 s overhead each);
                # the drop semantics only need the late rows to arrive
                # AFTER the gap batch, not split up
                ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
            else:
                spark.createDataFrame(batch, sch).coalesce(1).write.mode("overwrite").parquet(
                    f"{d}/b{i}"
                )
            _time.sleep(1.1)  # file-source ordering is by mtime
    got = run_stream_once(
        spark,
        d + "/*",
        lambda s: tumbling_counts(s, "1 hour", watermark="6 hours").drop("w_end"),
        query_name="q_late_data_sink",
        output_mode="append",
        options={"maxFilesPerTrigger": 1},
    )
    return got.filter(SF.col("w_start") <= SF.lit(h0))


@query(
    "q_events_sessionize",
    """
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM g
    ),
    per AS (SELECT user_id, session_id, COUNT(*) AS n FROM s GROUP BY 1, 2)
    SELECT user_id, COUNT(*) AS n_sessions,
           ROUND(AVG(n), 6) AS avg_events, MAX(n) AS max_events
    FROM per GROUP BY user_id
    """,
)
def q_events_sessionize(spark, sf_dir):
    """Sessionization: gap>30min starts a new session (lag + cumsum)."""
    from .streaming import sessionize_batch

    ev = _t(spark, sf_dir, "events").lazy_sdf()
    sess = sessionize_batch(ev, gap_minutes=30)
    return sess.groupBy("user_id").agg(
        SF.count(SF.lit(1)).alias("n_sessions"),
        SF.round(SF.avg("n_events"), 6).alias("avg_events"),
        SF.max("n_events").alias("max_events"),
    )


@query(
    "q_events_stream_dedup",
    """
    SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
           ROUND(SUM(value), 4) AS total
    FROM events GROUP BY event_type
    """,
)
def q_events_stream_dedup(spark, sf_dir):
    """Streaming exact dedup, batch-equivalent face (streaming_dedup:
    dropDuplicatesWithinWatermark on a stream, stateless dropDuplicates
    on a batch frame — identical results by contract). The input is
    every event delivered TWICE (at-least-once replay); a broken dedup
    doubles every count/sum and the oracle hash catches it."""
    from .streaming import streaming_dedup

    ev = _t(spark, sf_dir, "events").lazy_sdf()
    doubled = ev.unionByName(ev)
    ded = streaming_dedup(doubled, keys=("event_id",))
    return ded.groupBy("event_type").agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.countDistinct("user_id").alias("users"),
        SF.round(SF.sum("value"), 4).alias("total"),
    )


@query(
    "q_events_running_totals",
    """
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_events_running_totals(spark, sf_dir):
    """Stateful running totals (streaming/stateful.running_totals:
    applyInPandasWithState, update mode), graded through its batch twin
    running_totals_batch — the FINAL per-user state equals one hash
    aggregation; stream==batch is asserted in tests/test_scale.py."""
    from .streaming.stateful import running_totals_batch

    ev = _t(spark, sf_dir, "events").lazy_sdf()
    return running_totals_batch(ev)


@query(
    "q_events_enrich",
    """
    SELECT e.event_type, c.c_mktsegment AS segment, COUNT(*) AS n,
           ROUND(SUM(e.value), 4) AS total
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_events_enrich(spark, sf_dir):
    """Stream-static dimension enrichment (enrich_stream: stream joins a
    slowly-changing dim table re-planned per micro-batch, broadcast when
    small; identical on batch frames), then rollup by type x segment."""
    from .streaming import enrich_stream

    ev = _t(spark, sf_dir, "events").lazy_sdf()
    dim = (
        _t(spark, sf_dir, "customer")
        .lazy_sdf()
        .select(SF.col("c_custkey").alias("user_id"), SF.col("c_mktsegment").alias("segment"))
    )
    enriched = enrich_stream(ev, dim, on="user_id", how="left")
    return enriched.groupBy("event_type", "segment").agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.round(SF.sum("value"), 4).alias("total"),
    )


@query(
    "q_text_tfidf",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '\s+')) AS term
        FROM documents WHERE length(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))) > 0
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    s AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               ROUND(tf.tf * (LN((nd.n + 1) / (df.df + 1.0)) + 1), 6) AS score
        FROM tf JOIN df USING (term), nd
    )
    SELECT doc_id, term, tf, score FROM s
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 5
    """,
)
def q_text_tfidf(spark, sf_dir):
    """Top-5 TF-IDF terms per document (operators/text.tfidf_topk):
    explode -> (doc, term) tf agg -> vocabulary-bounded df agg joined
    back -> per-doc top-k window. Smoothed idf, deterministic
    tie-break; scores rounded identically on both sides."""
    from .operators.text import tfidf_topk

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    return tfidf_topk(docs, k=5)


@query(
    "q_text_chunking",
    r"""
    WITH tok AS (
        SELECT doc_id,
               CASE WHEN length(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '\s+') END AS w
        FROM documents
    ),
    c AS (
        SELECT doc_id, w,
               GREATEST(1, CAST(CEIL((len(w) - 16) / 48.0) AS BIGINT)) AS n_chunks
        FROM tok
    ),
    e AS (
        SELECT doc_id, w,
               unnest(generate_series(0, n_chunks - 1)) AS chunk_id
        FROM c
    )
    SELECT doc_id, chunk_id,
           md5(COALESCE(array_to_string(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64), ' '), '')) AS chunk_md5,
           len(list_slice(w, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS n_chunk_tokens
    FROM e
    """,
)
def q_text_chunking(spark, sf_dir):
    """Sliding-window chunking (operators/text.chunk_documents):
    64-token windows, 16-token overlap, one codegen posexplode — the
    chunk text is md5'd so the oracle hash certifies byte-exact window
    boundaries, not just counts."""
    from .operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    ch = chunk_documents(docs, chunk_tokens=64, overlap=16)
    return ch.select(
        "doc_id",
        "chunk_id",
        SF.md5(SF.col("chunk_text")).alias("chunk_md5"),
        "n_chunk_tokens",
    )


# ---------------------------------------------------------------------------
# corpus assembly: deterministic sampling + context-window packing
# ---------------------------------------------------------------------------


@query(
    "q_text_hash_sample",
    """
    WITH s AS (
        SELECT lang, n_chars FROM documents
        WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 < 1000
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM s GROUP BY lang
    """,
)
def q_text_hash_sample(spark, sf_dir):
    """Deterministic md5-bucket 10% corpus sample (operators/text.
    hash_sample): reproducible across engines/runs/partitionings, nested
    rates subset each other, and the predicate is pure codegen
    (no UDF barrier in the scan stage) — the subsetting primitive RNG sampling can't
    give a training-data pipeline."""
    from .operators.text import hash_sample

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    s = hash_sample(docs, "doc_id", 0.10)
    return s.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_docs"),
        SF.sum("n_chars").cast("bigint").alias("chars"),
    )


@query(
    "q_pack_context_windows",
    r"""
    WITH tok AS (
        SELECT doc_id,
               CASE WHEN length(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '\s+')) END AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
        FROM tok
    )
    SELECT CAST(FLOOR(excl / 4096.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM c GROUP BY bin
    """,
)
def q_pack_context_windows(spark, sf_dir):
    """Context-window sharding for training-data assembly
    (operators/text.pack_context_windows): docs in curriculum order get
    fixed 4096-token bins by exclusive prefix sum — ONE pass through the
    distributed cumulative kernel, no sequential packing loop. Projects
    narrow before ordering (the index kernel pins what it carries)."""
    from .expr import Expr, col
    from .operators.text import pack_context_windows, token_count

    docs = _t(spark, sf_dir, "documents")
    toks = docs.mutate(n_tokens=Expr("raw", token_count(SF.col("text")))).select(
        ["doc_id", "n_tokens"]
    )
    packed = pack_context_windows(toks.sort_by("doc_id"), "n_tokens", 4096)
    return packed.lazy_sdf().groupBy("bin").agg(
        SF.count(SF.lit(1)).alias("n_docs"),
        SF.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )


@query(
    "q_text_repetition",
    r"""
    WITH nz AS (
        SELECT doc_id, lang, text FROM documents WHERE length(trim(text, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13))) > 0
    ),
    w AS (
        SELECT doc_id, lang, unnest(string_split_regex(trim(lower(text), ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '\s+')) AS w
        FROM nz
    ),
    wc AS (SELECT doc_id, lang, w, COUNT(*) AS c FROM w GROUP BY doc_id, lang, w),
    ds AS (
        SELECT doc_id, lang,
               CAST(SUM(c) AS DOUBLE) AS nw,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(MAX(c) AS DOUBLE) AS mx
        FROM wc GROUP BY doc_id, lang
    ),
    ls AS (
        SELECT doc_id,
               CAST(len(string_split(text, chr(10))) AS DOUBLE) AS nl,
               CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE) AS nld
        FROM nz
    )
    SELECT ds.lang,
           ROUND(AVG((ls.nl - ls.nld) / ls.nl), 6) AS dup_line_fraction,
           ROUND(AVG((ds.nw - ds.nd) / ds.nw), 6) AS dup_word_fraction,
           ROUND(AVG(ds.mx / ds.nw), 6) AS top_word_share
    FROM ds JOIN ls ON ds.doc_id = ls.doc_id
    GROUP BY ds.lang
    """,
)
def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals per language
    (operators/text.repetition_stats documents the per-row expression
    form; this bulk path uses explode + two-level aggregation — word
    counts shuffle on (doc, word), codegen throughout, linear at any
    corpus size)."""
    from .operators.text import words

    docs = _t(spark, sf_dir, "documents").lazy_sdf().filter(SF.length(_wtrim_col(SF.col("text"))) > 0)
    w = docs.select("doc_id", "lang", SF.explode(words(SF.lower(SF.col("text")))).alias("w"))
    wc = w.groupBy("doc_id", "lang", "w").agg(SF.count(SF.lit(1)).alias("c"))
    ds = wc.groupBy("doc_id", "lang").agg(
        SF.sum("c").cast("double").alias("nw"),
        SF.count(SF.lit(1)).cast("double").alias("nd"),
        SF.max("c").cast("double").alias("mx"),
    )
    lines = SF.split(SF.col("text"), "\n")
    ls = docs.select(
        "doc_id",
        SF.size(lines).cast("double").alias("nl"),
        SF.size(SF.array_distinct(lines)).cast("double").alias("nld"),
    )
    return (
        ds.join(ls, "doc_id")
        .groupBy("lang")
        .agg(
            SF.round(SF.avg((SF.col("nl") - SF.col("nld")) / SF.col("nl")), 6).alias("dup_line_fraction"),
            SF.round(SF.avg((SF.col("nw") - SF.col("nd")) / SF.col("nw")), 6).alias("dup_word_fraction"),
            SF.round(SF.avg(SF.col("mx") / SF.col("nw")), 6).alias("top_word_share"),
        )
    )


@query(
    "q_embed_quantize_int8",
    r"""
    WITH q AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS e,
               greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-30) / 127.0 AS s
        FROM embeddings
    ),
    err AS (
        SELECT vec_id,
               list_avg(
                   list_transform(
                       list_zip(e, list_transform(e, x -> floor(x / s + 0.5))),
                       p -> pow(p[1] - p[2] * s, 2)
                   )
               ) AS mse
        FROM q
    )
    SELECT COUNT(*) AS n_vectors, ROUND(AVG(mse), 9) AS avg_mse
    FROM err
    """,
)
def q_embed_quantize_int8(spark, sf_dir):
    """Int8 embedding quantization (operators/similarity.quantize_int8):
    per-vector symmetric scale, explicit half-up rounding so the oracle
    reproduces every code; the query reports corpus-wide reconstruction
    MSE — the go/no-go metric before building a quantized ANN index."""
    from .operators.similarity import quantize_int8

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    q = quantize_int8(emb)
    pair = SF.arrays_zip(
        SF.col("embedding").cast("array<double>").alias("e"),
        SF.col("q8").cast("array<double>").alias("q"),
    )
    mse = SF.aggregate(
        pair,
        SF.lit(0.0),
        lambda acc, p: acc + SF.pow(p["e"] - p["q"] * SF.col("q_scale"), 2),
    ) / SF.size(SF.col("q8"))
    return (
        q.withColumn("__mse__", mse)
        .agg(
            SF.count(SF.lit(1)).alias("n_vectors"),
            SF.round(SF.avg("__mse__"), 9).alias("avg_mse"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing + benchmark decontamination (round 4)
# ---------------------------------------------------------------------------

# single source of truth: the operator's own patterns feed the oracle SQL
from .operators.text import PII_PATTERNS as _PII  # noqa: E402

_PII_EMAIL = _PII["email"]
_PII_PHONE = _PII["phone"]
_PII_IPV4 = _PII["ipv4"]


@query(
    "q_text_pii_scrub",
    f"""
    WITH synth AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || ' tel 555-867-5309' AS text
        FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
           len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
           len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}', '<IPV4>', 'g')) AS scrub_hash
    FROM synth
    """,
)
def q_text_pii_scrub(spark, sf_dir):
    """PII redaction (operators/text.scrub_pii): per-category regex
    counts + sequential token replacement, all JVM-side regexp_count/
    regexp_replace (RE2-compatible patterns, so DuckDB reproduces both
    the counts and the md5 of the scrubbed text). PII is synthesized
    onto each doc identically on both sides so every category actually
    fires."""
    from .operators.text import scrub_pii

    docs = _t(spark, sf_dir, "documents").lazy_sdf().filter(SF.col("doc_id") < 500)
    synth = docs.select(
        "doc_id",
        SF.concat(
            SF.col("text"),
            SF.lit(" contact user"),
            SF.col("doc_id").cast("string"),
            SF.lit("@example.com ip 10.0.0."),
            (SF.col("doc_id") % 256).cast("string"),
            SF.lit(" tel 555-867-5309"),
        ).alias("text"),
    )
    out = scrub_pii(synth, text_col="text", out_col="scrubbed")
    return out.select(
        "doc_id", "n_email", "n_phone", "n_ipv4", SF.md5(SF.col("scrubbed")).alias("scrub_hash")
    )


_DECON_N = 5
_DECON_SH = (
    f"list_distinct(list_transform(range(1, greatest(len(ws) - {_DECON_N - 2}, 1)), "
    f"i -> array_to_string(list_slice(ws, i, i + {_DECON_N - 1}), ' ')))"
)


@query(
    "q_text_decontaminate",
    f"""
    WITH ev AS (
        SELECT DISTINCT g FROM (
            SELECT unnest({_DECON_SH}) AS g
            FROM (SELECT {_WORDS.format(t="lower(text)")} AS ws FROM documents WHERE doc_id < 20)
        )
    ),
    cg AS (
        SELECT doc_id, unnest({_DECON_SH}) AS g
        FROM (SELECT doc_id, {_WORDS.format(t="lower(text)")} AS ws FROM documents WHERE doc_id >= 20)
    )
    SELECT doc_id, COUNT(DISTINCT g) AS n_contaminated_ngrams
    FROM cg JOIN ev USING (g) GROUP BY doc_id
    """,
)
def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/text.decontaminate_ngrams):
    corpus docs sharing any word 5-gram with the doc_id<20 'eval set'.
    Eval grams collapse to distinct + broadcast; the corpus side is a
    map-only explode into a broadcast hash join (corpus never shuffles
    — the 100 TB shape; cf. GPT-3 appx C n-gram overlap)."""
    from .operators.text import decontaminate_ngrams

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    ev = docs.filter(SF.col("doc_id") < 20)
    corpus = docs.filter(SF.col("doc_id") >= 20)
    return decontaminate_ngrams(corpus, ev, n=_DECON_N)


_C4_SYNTH_SQL = (
    "list_transform(range(1, CAST(ceil(len(ws)/8.0) AS INT) + 1), "
    "i -> array_to_string(list_slice(ws, (i-1)*8+1, (i-1)*8+8), ' ') "
    "|| CASE WHEN i % 2 = 0 THEN '.' ELSE '' END)"
)


@query(
    "q_text_line_clean",
    rf"""
    WITH ws_t AS (
        SELECT doc_id, {_WORDS.format(t="text")} AS ws FROM documents WHERE doc_id < 500
    ),
    synth AS (SELECT doc_id, {_C4_SYNTH_SQL} AS lines FROM ws_t),
    cleaned AS (
        SELECT doc_id,
               list_filter(lines, l -> len(string_split_regex(trim(l, ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)), '\s+')) >= 3
                                       AND regexp_matches(l, '[.!?]$')) AS keep
        FROM synth
    )
    SELECT doc_id, len(keep) AS n_lines_kept,
           md5(COALESCE(array_to_string(keep, chr(10)), '')) AS clean_hash
    FROM cleaned
    """,
)
def q_text_line_clean(spark, sf_dir):
    """C4-style boilerplate line filtering (operators/text.clean_lines;
    Raffel et al. 2020 §2.2): keep lines with >=3 words and terminal
    punctuation, rejoin in order. The synthetic corpus has no newlines,
    so line structure is synthesized identically on both sides (8-word
    lines, '.' on even lines) — the oracle then re-runs the filter with
    DuckDB list functions and compares count + md5 of the cleaned text."""
    from .operators.text import clean_lines, words

    docs = _t(spark, sf_dir, "documents").lazy_sdf().filter(SF.col("doc_id") < 500)
    ws = words(SF.col("text"))
    nlines = SF.ceil(SF.size(ws) / SF.lit(8.0)).cast("int")
    lines = SF.transform(
        SF.sequence(SF.lit(1), nlines),
        lambda i: SF.concat(
            SF.array_join(SF.slice(ws, (i - 1) * 8 + 1, 8), " "),
            SF.when(i % 2 == 0, SF.lit(".")).otherwise(SF.lit("")),
        ),
    )
    synth = docs.select("doc_id", SF.array_join(lines, "\n").alias("text"))
    out = clean_lines(synth, text_col="text", id_col="doc_id", min_words=3)
    return out.select(
        "doc_id", "n_lines_kept", SF.md5(SF.col("clean_text")).alias("clean_hash")
    )


# ---------------------------------------------------------------------------
# dedup: incremental cross-run signature store
# ---------------------------------------------------------------------------

_INCR_SIG = f"""
    WITH sh AS (
        SELECT doc_id, text, {_SHINGLES3.format(w="ws")} AS sh
        FROM (SELECT doc_id, text, {_WORDS.format(t="text")} AS ws FROM documents)
    ),
    sig AS (
        SELECT doc_id, {", ".join(f"{_minhash_sql(i)} AS mh{i}" for i in range(8))}
        FROM sh
    ),
    bands AS (
        {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || '|' || mh{2 * b + 1}) AS bucket FROM sig" for b in range(4))}
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS new_key, c.doc_id AS corpus_key
        FROM bands n JOIN bands c
          ON n.band = c.band AND n.bucket = c.bucket
        WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
    )
    SELECT new_key, corpus_key,
           ({" + ".join(f"(CASE WHEN sn.mh{i} = sc.mh{i} THEN 1 ELSE 0 END)" for i in range(8))}) / 8.0 AS est_jaccard
    FROM cand
    JOIN sig sn ON sn.doc_id = new_key
    JOIN sig sc ON sc.doc_id = corpus_key
    WHERE ({" + ".join(f"(CASE WHEN sn.mh{i} = sc.mh{i} THEN 1 ELSE 0 END)" for i in range(8))}) / 8.0 >= 0.5
"""


@query("q_dedup_incremental", _INCR_SIG)
def q_dedup_incremental(spark, sf_dir):
    """Cross-run dedup against a persisted signature store (the 100 TB
    operating mode — operators/dedup_store.py): the corpus (doc_id %%
    10 != 0) writes its MinHash signatures + LSH band buckets ONCE to
    parquet; the new shard (doc_id %% 10 == 0) then dedups against it
    by scan + (band, bucket) equi-join + estimated-Jaccard verify over
    stored signatures — corpus text is never re-read and corpus
    signatures never recompute (plan asserted in tests/test_scale.py).
    The oracle mirrors the whole pipeline in SQL, so the store
    round-trip (write -> parquet -> read -> join) is value-verified."""
    from .operators.dedup_store import dedup_against_store, write_signature_store

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    corpus = docs.filter(SF.col("doc_id") % 10 != 0)
    new_shard = docs.filter(SF.col("doc_id") % 10 == 0)
    store, fresh = _cached_store_dir("sigstore", sf_dir)
    if fresh:
        write_signature_store(corpus, store, num_hashes=8, bands=4, shingle_n=3)
    return dedup_against_store(new_shard, store, threshold=0.5)


@query("q_ann_index_persisted", _ivf_oracle_sql(_IVF_CENTROIDS))
def q_ann_index_persisted(spark, sf_dir):
    """ANN against a PERSISTED IVF index (similarity.write_ivf_index /
    ivf_query_index): the corpus partitions into centroid cells ONCE on
    disk (parquet partitioned by cell), then queries probe nprobe=2
    cells with static partition pruning — only the probed cells' files
    are scanned. Same tie rules as the in-memory ivf_topk_trained, so
    the oracle (and q_ann_ivf_trained) agree bit-for-bit; the driver
    grades the full write -> parquet -> prune -> join round-trip."""
    from .operators.similarity import ivf_query_index, write_ivf_index

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    idx, fresh = _cached_store_dir("ivfindex", sf_dir)
    if fresh:
        write_ivf_index(emb, idx, _IVF_CENTROIDS)
    queries = emb.filter(SF.col("vec_id") < 10)
    return ivf_query_index(queries, idx, k=5, nprobe=2)


@query("q_dedup_incremental_stream", _INCR_SIG)
def q_dedup_incremental_stream(spark, sf_dir):
    """STREAMING face of the signature store, driver-graded: the new
    shard arrives through a real Structured Streaming source
    (readStream over parquet) and matches the persisted corpus with
    stateless signature expressions + stream-static joins
    (operators/dedup_store.stream_dedup_against_store) — no mid-stream
    aggregation, state-free. The memory-sink result collapses
    cross-band duplicate pairs batch-side and must equal the batch
    face's answer, so it shares q_dedup_incremental's oracle SQL."""
    from .operators.dedup_store import stream_dedup_against_store, write_signature_store
    from .streaming import run_stream_once

    docs = _t(spark, sf_dir, "documents").lazy_sdf()
    corpus = docs.filter(SF.col("doc_id") % 10 != 0)
    store, fresh = _cached_store_dir("sigstore_s", sf_dir)
    if fresh:
        write_signature_store(corpus, store, num_hashes=8, bands=4, shingle_n=3)
    shard_dir, shard_fresh = _cached_store_dir("shard", sf_dir)
    if shard_fresh:
        docs.filter(SF.col("doc_id") % 10 == 0).select("doc_id", "text").write.mode(
            "overwrite"
        ).parquet(shard_dir)
    got = run_stream_once(
        spark,
        shard_dir,
        lambda s: stream_dedup_against_store(s, store, threshold=0.5),
        query_name="q_incr_stream_sink",
        output_mode="append",
    )
    return got.distinct()



@query(
    "q_text_remove_dup_substrings",
    f"""
    WITH w AS (
        SELECT doc_id, lang, {_WORDS.format(t="text")} AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               array_to_string(list_slice(ws, i, i + 4), ' ') AS gram
        FROM w, UNNEST(range(1, greatest(len(ws) - 3, 1))) AS t(i)
    ),
    hot AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    hp AS (SELECT doc_id, pos FROM g JOIN hot USING (gram)),
    brks AS (
        SELECT doc_id, pos,
               CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
                    THEN 0 ELSE 1 END AS brk
        FROM hp
    ),
    runs AS (
        SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS rid
        FROM brks
    ),
    spans AS (SELECT doc_id, rid, MIN(pos) AS s, MAX(pos) + 4 AS e
              FROM runs GROUP BY doc_id, rid),
    covered AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
                FROM spans, UNNEST(range(s, e + 1)) AS t(p)),
    wp AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos, ws[i] AS wrd
        FROM w, UNNEST(range(1, len(ws) + 1)) AS t(i)
    ),
    kept AS (
        SELECT wp.doc_id, wp.pos, wp.wrd
        FROM wp LEFT JOIN covered c ON c.doc_id = wp.doc_id AND c.pos = wp.pos
        WHERE c.pos IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, COUNT(*) AS kept,
               md5(string_agg(wrd, ' ' ORDER BY pos)) AS h
        FROM kept GROUP BY doc_id
    ),
    per_doc AS (
        SELECT w.doc_id, w.lang,
               len(w.ws) - COALESCE(r.kept, 0) AS wr,
               COALESCE(r.h, md5('')) AS h
        FROM w LEFT JOIN rebuilt r ON r.doc_id = w.doc_id
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN wr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_changed,
           CAST(SUM(wr) AS BIGINT) AS words_removed,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_clean_texts
    FROM per_doc GROUP BY lang
    """,
)
def q_text_remove_dup_substrings(spark, sf_dir):
    """The ACTIONABLE half of the repeated-substring signal: cut every
    maximal corpus-repeated substring out of each document
    (operators/text.remove_repeated_spans — Lee et al. 2022's removal
    step, span-merge level) and grade the rewritten corpus per lang:
    docs changed, words removed, distinct clean texts (md5 — the oracle
    rebuilds every document word-for-word in SQL, so the REWRITTEN TEXT
    itself is value-verified, not just counts). Plan shape: the
    detection pipeline + covered positions exploded from spans
    (bounded by total words, no range join), an anti-join on
    (doc, pos), and one per-doc ordered rebuild."""
    from .operators.text import remove_repeated_spans

    docs = (
        _t(spark, sf_dir, "documents")
        .lazy_sdf()
        .filter(SF.col("text").isNotNull())
        .select("doc_id", "lang", "text")
    )
    out = remove_repeated_spans(docs, gram_n=5, min_count=2)
    joined = out.join(docs.select("doc_id", "lang"), "doc_id")
    return joined.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_docs"),
        SF.sum((SF.col("words_removed") > 0).cast("long")).alias("docs_changed"),
        SF.sum("words_removed").alias("words_removed"),
        SF.countDistinct(SF.md5(SF.col("clean_text"))).alias("n_clean_texts"),
    )


_SW_COUNT = (
    "len(list_filter({w}, x -> lower(x) IN "
    "('the','a','an','and','or','of','to','in','is','it')))"
)


@query(
    "q_text_quality_logistic",
    f"""
    WITH feat AS (
        SELECT lang,
               CASE WHEN length({_WTRIM.format(t="text")}) = 0 THEN 0
                    ELSE len({_WORDS.format(t="text")}) END AS nw,
               CASE WHEN len({_WORDS.format(t="text")}) > 0
                    THEN CAST({_SW_COUNT.format(w=_WORDS.format(t="text"))} AS DOUBLE)
                         / len({_WORDS.format(t="text")}) ELSE 0.0 END AS swr,
               CASE WHEN len({_WORDS.format(t="text")}) > 0
                    THEN CAST(length(regexp_replace({_WTRIM.format(t="text")}, '\\s+', '', 'g')) AS DOUBLE)
                         / len({_WORDS.format(t="text")}) ELSE 0.0 END AS mwl
        FROM documents WHERE text IS NOT NULL
    ),
    scored AS (
        SELECT lang,
               1.0 / (1.0 + exp(-(-2.0 + 4.0 * swr + 0.35 * mwl + 0.18 * ln(nw + 1)))) AS score
        FROM feat
    )
    SELECT lang,
           CAST(floor(score * 5) AS INT) AS bucket,
           COUNT(*) AS n,
           ROUND(AVG(score), 6) AS avg_score
    FROM scored GROUP BY 1, 2
    """,
)
def q_text_quality_logistic(spark, sf_dir):
    """Deterministic logistic quality classifier — the fastText-style
    'keep probability' gate of a training-data pipeline, rendered as
    pure codegen: three one-pass text features (token count, stopword
    ratio via ONE lookaround regexp_count, mean word length via one
    regexp_replace — the q_text_stats kernel shapes) feed a fixed-weight
    sigmoid; documents bucket by score quintile per language. At 100 TB
    this is a single projection + one small aggregation: no shuffle
    before the per-(lang, bucket) rollup, no UDF. Weights are literals
    of the query (a trained model would broadcast its coefficient
    vector the same way)."""
    from .operators.text import STOPWORDS, wtrim

    docs = _t(spark, sf_dir, "documents").lazy_sdf().filter(SF.col("text").isNotNull())
    base = docs.select(
        "lang", wtrim(SF.col("text")).alias("__t__")
    )
    sw_rx = r"(?<=^|\s)(" + "|".join(STOPWORDS) + r")(?=$|\s)"
    feat = base.select(
        "lang",
        SF.when(SF.length("__t__") == 0, 0)
        .otherwise(SF.size(SF.split(SF.col("__t__"), r"\s+")))
        .alias("nw"),
        SF.regexp_count(SF.lower(SF.col("__t__")), SF.lit(sw_rx)).alias("__sw__"),
        SF.length(SF.regexp_replace(SF.col("__t__"), r"\s+", "")).alias("__wl__"),
    ).select(
        "lang",
        "nw",
        SF.when(SF.col("nw") > 0, SF.col("__sw__").cast("double") / SF.col("nw"))
        .otherwise(SF.lit(0.0))
        .alias("swr"),
        SF.when(SF.col("nw") > 0, SF.col("__wl__").cast("double") / SF.col("nw"))
        .otherwise(SF.lit(0.0))
        .alias("mwl"),
    )
    z = (
        SF.lit(-2.0)
        + SF.lit(4.0) * SF.col("swr")
        + SF.lit(0.35) * SF.col("mwl")
        + SF.lit(0.18) * SF.log(SF.col("nw") + SF.lit(1))
    )
    scored = feat.select("lang", (SF.lit(1.0) / (SF.lit(1.0) + SF.exp(-z))).alias("score"))
    return scored.groupBy(
        "lang", SF.floor(SF.col("score") * 5).cast("int").alias("bucket")
    ).agg(
        SF.count(SF.lit(1)).alias("n"),
        SF.round(SF.avg("score"), 6).alias("avg_score"),
    )


def _ivf_q8_oracle_sql(centroids, nprobe=2, topk=5, dim=64):
    """DuckDB mirror of the QUANTIZED persisted-index path: routing uses
    the exact vectors (same first-argmax / probe order as
    _ivf_oracle_sql), similarity uses symmetric int8 codes — integer
    dot over integer norms (the per-vector scales cancel out of cosine,
    so no dequantization appears on either engine)."""
    nc = len(centroids)

    def dot_sql(c, tbl="embedding"):
        return " + ".join(f"CAST({tbl}[{i + 1}] AS DOUBLE) * {c[i]!r}" for i in range(dim))

    d_exprs = ", ".join(f"({dot_sql(c)}) AS d{j}" for j, c in enumerate(centroids))
    first_argmax = "CASE " + " ".join(
        f"WHEN {' AND '.join(f'd{j} >= d{i}' for i in range(nc) if i != j)} THEN {j}"
        for j in range(nc)
    ) + " END"
    probe_structs = ", ".join(f"struct_pack(nd := -d{j}, c := {j})" for j in range(nc))
    q8 = (
        "list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x / ("
        "greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))), 1e-30)"
        " / 127.0) + 0.5))"
    )
    return f"""
    WITH cd AS (SELECT vec_id, embedding, {q8} AS q8, {d_exprs} FROM embeddings),
    cc AS (
        SELECT vec_id, q8, sqrt(list_dot_product(q8, q8)) AS qn, {first_argmax} AS cell
        FROM cd
    ),
    qp AS (
        SELECT vec_id AS query_id, q8 AS qq, sqrt(list_dot_product(q8, q8)) AS qqn,
               unnest(list_transform(list_slice(list_sort([{probe_structs}]), 1, {nprobe}), s -> s.c)) AS cell
        FROM cd WHERE vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine FROM (
        SELECT qp.query_id, cc.vec_id AS neighbor_id,
               ROUND(list_dot_product(qp.qq, cc.q8) / (qp.qqn * cc.qn), 6) AS cosine
        FROM qp JOIN cc ON cc.cell = qp.cell AND cc.vec_id <> qp.query_id
    )
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) <= {topk}
    """


@query("q_ann_index_quantized", _ivf_q8_oracle_sql(_IVF_CENTROIDS))
def q_ann_index_quantized(spark, sf_dir):
    """ANN against a persisted INT8-QUANTIZED IVF index
    (write_ivf_index(quantize=True) / ivf_query_index auto-detect): the
    cells table stores array<tinyint> codes + one norm instead of float
    vectors — ~4x smaller on disk, the 100 TB embedding-store lever.
    Routing stays exact (cell assignment and probe order use the full
    vectors); similarity is the integer dot over integer norms, which
    equals cosine of the dequantized vectors EXACTLY (per-vector scales
    cancel), so the whole path is deterministic and the DuckDB oracle
    reproduces every code and every tie."""
    from .operators.similarity import ivf_query_index, write_ivf_index

    emb = _t(spark, sf_dir, "embeddings").lazy_sdf()
    idx, fresh = _cached_store_dir("ivfq8", sf_dir)
    if fresh:
        write_ivf_index(emb, idx, _IVF_CENTROIDS, quantize=True)
    queries = emb.filter(SF.col("vec_id") < 10)
    return ivf_query_index(queries, idx, k=5, nprobe=2)


_GRAMS5 = (
    # range is END-EXCLUSIVE: a doc with L words has L-4 five-grams, so
    # the bound is L-3 (the 3-gram macro above uses L-1 the same way)
    "list_transform(range(1, greatest(len({w}) - 3, 1)), "
    "i -> array_to_string(list_slice({w}, i, i + 4), ' '))"
)


@query(
    "q_text_dup_spans",
    f"""
    WITH w AS (
        SELECT doc_id, lang, {_WORDS.format(t="text")} AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (
        SELECT doc_id, lang, greatest(len(ws) - 4, 0) AS total_spans,
               unnest({_GRAMS5.format(w="ws")}) AS gram
        FROM w
    ),
    hot AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    per_doc AS (
        SELECT doc_id, lang, total_spans, COUNT(*) AS hits
        FROM g JOIN hot USING (gram)
        GROUP BY doc_id, lang, total_spans
    )
    SELECT lang,
           COUNT(*) AS n_dup_docs,
           CAST(SUM(hits) AS BIGINT) AS hot_hits,
           ROUND(AVG(CAST(hits AS DOUBLE) / total_spans), 6) AS avg_dup_frac
    FROM per_doc GROUP BY lang
    """,
)
def q_text_dup_spans(spark, sf_dir):
    """Repeated-SPAN detection — the exact-substring duplication signal
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"), rendered span-level instead of suffix-array-level:
    every 5-word span of every doc (map-only gram kernel,
    shingle_rows_arrow — grams feed a JOIN, so no window shuffle), a
    corpus-wide span count keeps spans seen >= 2 times ("hot"), and each
    doc reports how much of it is made of hot spans. Plan shape at
    100 TB: one map-side-combined groupBy over the gram stream + one
    gram-keyed equi-join — the same mechanics as the decontamination
    pipeline; no driver state, no quadratic stage."""
    from .operators.text import maybe_pin_gram_stream, shingle_rows_arrow, words

    docs = (
        _t(spark, sf_dir, "documents")
        .lazy_sdf()
        .filter(SF.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            SF.greatest(SF.size(words(SF.col("text"))) - SF.lit(4), SF.lit(0)).alias(
                "total_spans"
            ),
            "text",
        )
    )
    grams = shingle_rows_arrow(docs, "doc_id", "text", 5)
    # r12: size-gated pin — the stream is consumed by the hot count AND
    # the join; small inputs pin (one tokenization), big ones stay
    # map-only (see maybe_pin_gram_stream)
    grams, _ = maybe_pin_gram_stream(grams, docs, "text")
    hot = grams.groupBy("shingle").count().filter(SF.col("count") >= 2).select("shingle")
    per_doc = (
        grams.join(hot, "shingle")
        .groupBy("doc_id")
        .agg(SF.count(SF.lit(1)).alias("hits"))
        .join(docs.select("doc_id", "lang", "total_spans"), "doc_id")
    )
    return per_doc.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_dup_docs"),
        SF.sum("hits").alias("hot_hits"),
        SF.round(SF.avg(SF.col("hits").cast("double") / SF.col("total_spans")), 6).alias(
            "avg_dup_frac"
        ),
    )


@query(
    "q_text_dup_substrings",
    f"""
    WITH w AS (
        SELECT doc_id, lang, {_WORDS.format(t="text")} AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    g AS (
        SELECT doc_id, lang, len(ws) AS nw, CAST(i AS BIGINT) AS pos,
               array_to_string(list_slice(ws, i, i + 4), ' ') AS gram
        FROM w, UNNEST(range(1, greatest(len(ws) - 3, 1))) AS t(i)
    ),
    hot AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    hp AS (SELECT doc_id, lang, nw, pos FROM g JOIN hot USING (gram)),
    brks AS (
        SELECT doc_id, lang, nw, pos,
               CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
                    THEN 0 ELSE 1 END AS brk
        FROM hp
    ),
    runs AS (
        SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS rid
        FROM brks
    ),
    spans AS (
        SELECT doc_id, lang, nw, rid, MIN(pos) AS s, MAX(pos) + 4 AS e
        FROM runs GROUP BY doc_id, lang, nw, rid
    ),
    per_doc AS (
        SELECT doc_id, lang, nw,
               COUNT(*) AS n_sub,
               SUM(e - s + 1) AS covered,
               MAX(e - s + 1) AS longest
        FROM spans GROUP BY doc_id, lang, nw
    )
    SELECT lang,
           COUNT(*) AS n_dup_docs,
           CAST(SUM(n_sub) AS BIGINT) AS n_substrings,
           CAST(MAX(longest) AS BIGINT) AS max_sub_words,
           ROUND(AVG(CAST(covered AS DOUBLE) / nw), 6) AS avg_cover_frac
    FROM per_doc GROUP BY lang
    """,
)
def q_text_dup_substrings(spark, sf_dir):
    """VARIABLE-LENGTH repeated substrings (r7 verdict #6) — the real
    Lee et al. 2022 signal: q_text_dup_spans counts fixed 5-word hot
    spans; here ADJACENT/OVERLAPPING hot spans coalesce into MAXIMAL
    repeated substrings via gaps-and-islands over gram start positions
    (two hot spans chain iff the next start is <= prev + 5, i.e. their
    word coverage is contiguous). Per doc: number of merged substrings,
    words covered, longest substring; rolled up by lang. Plan shape at
    100 TB: the same map-only gram kernel (now emitting positions) +
    map-side-combined hot count + gram-keyed equi-join as dup_spans,
    plus ONE per-doc window (lag/cumsum — bounded by doc length, never
    a global partition) and two hash aggs. No driver state."""
    from .operators.text import maybe_pin_gram_stream, shingle_rows_arrow, words
    from pyspark.sql import Window as W

    docs = (
        _t(spark, sf_dir, "documents")
        .lazy_sdf()
        .filter(SF.col("text").isNotNull())
        .select(
            "doc_id",
            "lang",
            SF.size(words(SF.col("text"))).alias("nw"),
            "text",
        )
    )
    grams = shingle_rows_arrow(docs, "doc_id", "text", 5, pos_col="pos")
    # r12: size-gated pin (see q_text_dup_spans)
    grams, _ = maybe_pin_gram_stream(grams, docs, "text")
    hot = grams.groupBy("shingle").count().filter(SF.col("count") >= 2).select("shingle")
    hp = grams.join(hot, "shingle").select("doc_id", "pos")
    wd = W.partitionBy("doc_id").orderBy("pos")
    brks = hp.withColumn(
        "brk",
        SF.when(SF.col("pos") - SF.lag("pos").over(wd) <= 5, SF.lit(0)).otherwise(SF.lit(1)),
    )
    runs = brks.withColumn(
        "rid", SF.sum("brk").over(wd.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = runs.groupBy("doc_id", "rid").agg(
        SF.min("pos").alias("s"), (SF.max("pos") + SF.lit(4)).alias("e")
    )
    per_doc = (
        spans.groupBy("doc_id")
        .agg(
            SF.count(SF.lit(1)).alias("n_sub"),
            SF.sum(SF.col("e") - SF.col("s") + 1).alias("covered"),
            SF.max(SF.col("e") - SF.col("s") + 1).alias("longest"),
        )
        .join(docs.select("doc_id", "lang", "nw"), "doc_id")
    )
    return per_doc.groupBy("lang").agg(
        SF.count(SF.lit(1)).alias("n_dup_docs"),
        SF.sum("n_sub").alias("n_substrings"),
        SF.max("longest").alias("max_sub_words"),
        SF.round(SF.avg(SF.col("covered").cast("double") / SF.col("nw")), 6).alias(
            "avg_cover_frac"
        ),
    )
