"""KG-construction composite operators (SURVEY.md §2.9, §2.12) plus the
large-scale training-data ops (dedup families, ANN similarity) — each with
a DuckDB twin where SQL-expressible, rows-only otherwise.

MinHash/LSH use md5 as the hash family (stable across engines; min taken
lexicographically over hex digests — SURVEY.md §2.12) so the oracle can
compute bit-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from glre_spark.operators import fan_out, fround, load, op

# ---------------------------------------------------------------------------
# Entity linking: broadcast alias-dictionary join (link_alias_broadcast)
# ---------------------------------------------------------------------------


def _alias_values_sql() -> str:
    from glre_spark.datagen import alias_rows

    rows = ",\n    ".join(
        "('{}', '{}', '{}', '{}')".format(
            r["alias_norm"].replace("'", "''"),
            r["entity_key"],
            r["canonical_name"].replace("'", "''"),
            r["type"],
        )
        for r in alias_rows()
    )
    return f"alias_dict(alias_norm, entity_key, canonical_name, typ) AS (VALUES\n    {rows})"


_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)


def _norm_col(c):
    x = F.lower(c)
    x = F.regexp_replace(x, "[^a-z0-9]+", " ")
    return F.trim(F.regexp_replace(x, " +", " "))


@op(
    "link_alias_broadcast",
    f"""WITH {_alias_values_sql()},
       m AS (SELECT n_nationkey, {_NORM_SQL.format(c='n_name')} AS alias_norm FROM nation)
       SELECT m.n_nationkey, m.alias_norm, a.entity_key, a.canonical_name
       FROM m LEFT JOIN alias_dict a USING (alias_norm)""",
)
def link_alias_broadcast(spark, sf_dir):
    """Mention names (TPC-H nation names double as LOC mentions) broadcast-
    joined onto the alias dictionary."""
    from glre_spark.datagen import alias_rows

    alias_df = spark.createDataFrame(
        alias_rows(),
        "alias_norm string, entity_key string, canonical_name string, typ string",
    ).drop("typ")
    m = load(spark, sf_dir, "nation").select(
        "n_nationkey", _norm_col(F.col("n_name")).alias("alias_norm")
    )
    return m.join(F.broadcast(alias_df), "alias_norm", "left").select(
        "n_nationkey", "alias_norm", "entity_key", "canonical_name"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH over documents (minhash_sig / lsh_band / lsh_candidates)
# ---------------------------------------------------------------------------

_K = 8      # signature length
_BANDS = 2  # bands of r=4: high-precision blocking — r=2 floods the
            # candidate set on vocabulary-sharing corpora (measured 18.8 s
            # of self-join at 500 docs; quadratic at web scale)
_R = _K // _BANDS

# MinHash family: ONE md5 per shingle (28-bit base hash from the first 7
# hex chars) + K integer permutations h_i = (A_i·h + B_i) mod P. 8× fewer
# md5 calls than hashing per-seed (the signature stage is md5-bound), and
# every step is exact int64 arithmetic both engines agree on (A·h + B <
# 2^59, no overflow under ANSI mode). P = 2^31-1 (Mersenne prime).
_P = 2147483647
_A = [1103515245, 1225577, 747796405, 2027382, 1664525, 22695477, 65793, 100005713]
_B = [12345, 987654321, 69069, 8121, 1013904223, 1, 377003613, 55555]

_SHINGLE_CTE = """sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT) AS h
  FROM (SELECT doc_id, substr(text, CAST(i AS INTEGER), 3) AS s
        FROM (SELECT doc_id, text,
                     UNNEST(range(1, greatest(length(text) - 1, 2))) AS i
              FROM documents))
)"""

_SIG_CTE = (
    _SHINGLE_CTE
    + """,
sig AS MATERIALIZED (
  SELECT doc_id, """
    + ", ".join(f"min(({_A[i]} * h + {_B[i]}) % {_P}) AS mh{i}" for i in range(_K))
    + """
  FROM sh GROUP BY doc_id
)"""
)


def _shingle_col(c, k: int = 3):
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(k)),
        )
    )


def _shingle_hash_col(c, k: int = 3):
    """Distinct k-shingles → 28-bit base hashes (one md5 per shingle)."""
    return F.transform(
        _shingle_col(c, k),
        lambda x: F.conv(F.md5(x).substr(1, 7), 16, 10).cast("bigint"),
    )


def _perm_hash(i: int):
    # NB: must return a ONE-arg lambda — F.transform interprets a two-arg
    # lambda as (element, index), which would silently shadow the seed.
    a, b = F.lit(_A[i]).cast("bigint"), F.lit(_B[i]).cast("bigint")
    return lambda h: F.pmod(a * h + b, F.lit(_P).cast("bigint"))


def _sig_of(docs):
    """MinHash signature of an arbitrary (doc_id, text) DataFrame."""
    hs = docs.select("doc_id", _shingle_hash_col(F.col("text")).alias("hs"))
    return hs.select(
        "doc_id",
        *[
            F.array_min(F.transform(F.col("hs"), _perm_hash(i))).alias(f"mh{i}")
            for i in range(_K)
        ],
    )


def _sig_df(spark, sf_dir):
    # fan_out: the signature expression is the family's CPU wall; a
    # single-row-group scan would otherwise run it on 1-2 tasks
    return _sig_of(fan_out(load(spark, sf_dir, "documents").select("doc_id", "text")))


@op("minhash_sig", "WITH " + _SIG_CTE + " SELECT * FROM sig")
def minhash_sig(spark, sf_dir):
    return _sig_df(spark, sf_dir)


_BAND_SELECTS = " UNION ALL ".join(
    "SELECT doc_id, CAST({b} AS BIGINT) AS band_id, md5({parts}) AS band_hash FROM sig".format(
        b=b,
        parts=" || '|' || ".join(
            f"CAST(mh{b * _R + j} AS VARCHAR)" for j in range(_R)
        ),
    )
    for b in range(_BANDS)
)


def _bands_of_sig(sig):
    """Signature → one (doc_id, band_id, band_hash) row per LSH band."""
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * _R + j}") for j in range(_R)]))
            for b in range(_BANDS)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(bands).alias("band_id", "band_hash")
    ).select("doc_id", F.col("band_id").cast("bigint"), "band_hash")


@op("lsh_band", "WITH " + _SIG_CTE + " " + _BAND_SELECTS)
def lsh_band(spark, sf_dir):
    return _bands_of_sig(_sig_df(spark, sf_dir))


MAX_LSH_BLOCK = 64  # block-size cap: one hot band bucket would otherwise go
                    # quadratic in the self-join (cartesian bomb at web
                    # scale); oversized blocks are dropped, as in
                    # linking.cluster_names

_CAND_CTES = (
    _SIG_CTE
    + """,
bands AS MATERIALIZED ("""
    + _BAND_SELECTS
    + f"""),
sized AS MATERIALIZED (
  SELECT band_id, band_hash FROM bands
  GROUP BY band_id, band_hash HAVING COUNT(*) <= {MAX_LSH_BLOCK}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN sized s ON a.band_id = s.band_id AND a.band_hash = s.band_hash
  JOIN bands b ON a.band_hash = b.band_hash AND a.band_id = b.band_id
  WHERE a.doc_id < b.doc_id
)"""
)


# One-entry memo shared by the dedup family (lsh_candidates,
# dedup_ngram_jaccard, udf_grouped_map all start from the same capped band
# table): keyed on (application, sf_dir, input fingerprint, cap) so a new
# session, a different input dir, OR an overwritten documents.parquet under
# the same path recomputes (the fingerprint folds the parquet file names,
# sizes and mtimes). The evicted epoch's checkpoint blocks are released by
# the ContextCleaner once the old DataFrame is unreferenced (localCheckpoint
# RDDs are not in the SQL cache manager, so there is no explicit
# DataFrame-level unpersist for them).
_BANDS_CACHE: dict[tuple, object] = {}


_FINGERPRINT_EPOCH = 0  # bumped per call for non-local paths → cache miss


def _input_fingerprint(sf_dir: str, table: str = "documents") -> tuple:
    """Cheap content fingerprint of a parquet table: (name, size, mtime_ns)
    of every data file. Catches same-path overwrites within one Spark app
    without reading any data. LOCAL filesystem only: for a URI-scheme path
    (hdfs://, s3a://, …) os.stat can't see the files, every file would
    fingerprint as (-1, -1) and a same-path overwrite would silently hit
    the stale cache — so such paths get a never-matching epoch token
    (cache effectively disabled; a cluster deployment would fold in a
    Hadoop FileSystem listing instead)."""
    import os
    import re

    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", sf_dir):
        global _FINGERPRINT_EPOCH
        _FINGERPRINT_EPOCH += 1
        return ("__non_local_path__", _FINGERPRINT_EPOCH)

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if not f.startswith(".")
        )
    else:
        files = [path]
    out = []
    for f in files:
        try:
            st = os.stat(f)
            out.append((os.path.basename(f), st.st_size, st.st_mtime_ns))
        except OSError:
            out.append((os.path.basename(f), -1, -1))
    return tuple(out)


def capped_bands(spark, sf_dir, max_block: int = MAX_LSH_BLOCK):
    """Size-capped LSH band table (doc_id, band_id, band_hash), materialized
    ONCE per (session, input): the minhash signature expression
    (all-shingles × 8 permutations) dominates, and every downstream
    consumer (self-join, pairwise verify, grouped-map) would otherwise
    recompute it. On a cluster this is "write the signature table, then
    join" — localCheckpoint is the local analog."""
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        _input_fingerprint(sf_dir),
        max_block,
    )
    hit = _BANDS_CACHE.get(key)
    if hit is not None:
        return hit
    bands = lsh_band(spark, sf_dir).localCheckpoint(eager=True)
    sizes = bands.groupBy("band_id", "band_hash").agg(F.count("*").alias("bn"))
    capped = bands.join(
        F.broadcast(
            sizes.filter(F.col("bn") <= max_block).select("band_id", "band_hash")
        ),
        ["band_id", "band_hash"],
    )
    _BANDS_CACHE.clear()
    _BANDS_CACHE[key] = capped
    return capped


def _capped_candidates(spark, sf_dir, max_block: int = MAX_LSH_BLOCK):
    bands = capped_bands(spark, sf_dir, max_block)
    a = bands.select(F.col("doc_id").alias("id_a"), "band_id", "band_hash")
    b = bands.select(F.col("doc_id").alias("id_b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


@op("lsh_candidates", "WITH " + _CAND_CTES + " SELECT id_a, id_b FROM cand")
def lsh_candidates(spark, sf_dir):
    """Candidate near-dup pairs = documents sharing an LSH band bucket,
    bucket size capped at MAX_LSH_BLOCK (skew guard)."""
    return _capped_candidates(spark, sf_dir)


# ---------------------------------------------------------------------------
# Connected components + canonical naming
# ---------------------------------------------------------------------------


@op(
    "cc_label_prop",
    """WITH RECURSIVE edges AS (
         SELECT CAST(n_nationkey AS BIGINT) AS src, CAST(100 + n_regionkey AS BIGINT) AS dst
         FROM nation
         UNION ALL
         SELECT CAST(100 + n_regionkey AS BIGINT), CAST(n_nationkey AS BIGINT) FROM nation
       ),
       reach(id, lbl) AS (
         SELECT src, src FROM edges
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       )
       SELECT id, MIN(lbl) AS component FROM reach GROUP BY id""",
)
def cc_label_prop(spark, sf_dir):
    """Connected components by iterative min-label propagation
    (glre_spark.linking.connected_components); oracle = recursive CTE.
    Graph: bipartite nation↔region (components = the 5 region clusters)."""
    from glre_spark.linking import connected_components

    nation = load(spark, sf_dir, "nation")
    edges = nation.select(
        F.col("n_nationkey").cast("bigint").alias("id_a"),
        (F.lit(100) + F.col("n_regionkey")).cast("bigint").alias("id_b"),
    )
    return connected_components(edges).select("id", "component")


@op(
    "canonicalize",
    """SELECT c_nationkey, c_mktsegment AS canonical FROM (
         SELECT c_nationkey, c_mktsegment,
                row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY COUNT(*) DESC, c_mktsegment) AS rk
         FROM customer GROUP BY c_nationkey, c_mktsegment) WHERE rk = 1""",
)
def canonicalize(spark, sf_dir):
    """Canonical pick per cluster: most frequent value, tie → lexicographic."""
    counts = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("cnt"), F.asc("c_mktsegment"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("c_nationkey", F.col("c_mktsegment").alias("canonical"))
    )


@op(
    "dedup_triples",
    """SELECT l_partkey AS subj, l_returnflag AS pred, l_suppkey AS obj,
              ROUND(MAX(l_extendedprice), 2) AS score, CAST(COUNT(*) AS BIGINT) AS n_sources
       FROM lineitem GROUP BY 1, 2, 3""",
)
def dedup_triples_op(spark, sf_dir):
    """Exact (subj, pred, obj) dedup keeping max score — the triple-sink
    pre-pass shape (pipeline.dedup_triples) over relational stand-ins."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("subj"),
            F.col("l_returnflag").alias("pred"),
            F.col("l_suppkey").alias("obj"),
        )
        .agg(
            F.round(F.max("l_extendedprice"), 2).alias("score"),
            F.count("*").cast("bigint").alias("n_sources"),
        )
    )


# ---------------------------------------------------------------------------
# Resume / lineage relational logic (§2.9)
# ---------------------------------------------------------------------------


@op(
    "resume_filter",
    """WITH buckets AS (SELECT DISTINCT doc_id % 64 AS bucket FROM documents),
       done AS (SELECT bucket FROM buckets WHERE bucket % 3 = 0)
       SELECT CAST(b.bucket AS BIGINT) AS bucket FROM buckets b
       WHERE NOT EXISTS (SELECT 1 FROM done d WHERE d.bucket = b.bucket)""",
)
def resume_filter(spark, sf_dir):
    """On restart: process only buckets absent from the done-manifest
    (left-anti join) — the exact-resume core (SURVEY.md §2.9)."""
    buckets = (
        load(spark, sf_dir, "documents")
        .select((F.col("doc_id") % 64).alias("bucket"))
        .distinct()
    )
    done = buckets.filter(F.col("bucket") % 3 == 0)
    return buckets.join(done, "bucket", "left_anti").select(
        F.col("bucket").cast("bigint")
    )


@op("repartition_urlhash", None)  # physical layout op → rows-only check
def repartition_urlhash(spark, sf_dir):
    """Explicit url-hash bucketing before inference; verified by bucket
    histogram (layout itself isn't SQL-observable)."""
    from glre_spark.operators.scans import pages_view
    from glre_spark.pipeline import URL_BUCKETS, url_bucket

    pages = pages_view(spark, sf_dir)
    return (
        pages.repartition(32, url_bucket(F.col("url")))
        .withColumn("bucket", url_bucket(F.col("url")))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Training-data dedup + ANN ops (documents / embeddings)
# ---------------------------------------------------------------------------


@op(
    "dedup_exact",
    """SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keeper,
              CAST(COUNT(*) AS BIGINT) AS n_copies
       FROM documents GROUP BY md5(text)""",
)
def dedup_exact(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
    )


@op(
    "dedup_ngram_jaccard",
    "WITH "
    + _CAND_CTES
    + """,
d AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - 1, 2)),
           i -> substr(text, CAST(i AS INTEGER), 3))) AS sh
  FROM documents
)
SELECT c.id_a, c.id_b,
       ROUND(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(da.sh, db.sh))) + 1e-9, 4) + 0 AS jaccard
FROM cand c
JOIN d da ON da.doc_id = c.id_a
JOIN d db ON db.doc_id = c.id_b""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard verify over the (capped) LSH candidate pairs —
    the verify step is bounded by candidate count, never by block size.
    (An earlier version blocked on exact n_chars equality: real near-dups
    rarely share exact length while boilerplate corpora flood the block.)

    Spark side intersects xxhash64-hashed shingles (8-byte longs) instead
    of 3-char strings: ~2.5× less shuffle through the pair join, identical
    set sizes (64-bit hash is injective on a trigram vocabulary whp); the
    oracle intersects the string sets directly."""
    d = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id",
        F.transform(_shingle_col(F.col("text")), lambda x: F.xxhash64(x)).alias("sh"),
    )
    cand = _capped_candidates(spark, sf_dir)
    da = d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    db = d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            fround(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
    )


_KEEPER_TAU = 0.8  # classic near-dup Jaccard threshold


@op(
    "dedup_keeper_table",
    "WITH RECURSIVE "
    + _CAND_CTES
    + f""",
d AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - 1, 2)),
           i -> substr(text, CAST(i AS INTEGER), 3))) AS sh
  FROM documents
),
ver AS MATERIALIZED (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN d da ON da.doc_id = c.id_a
  JOIN d db ON db.doc_id = c.id_b
  WHERE CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(da.sh, db.sh))) >= {_KEEPER_TAU}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM ver
  UNION ALL
  SELECT id_b, id_a FROM ver
),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(lbl) AS keeper FROM reach GROUP BY id)
SELECT doc_id,
       COALESCE(c.keeper, doc_id) AS keeper,
       COALESCE(c.keeper, doc_id) <> doc_id AS is_dup
FROM documents LEFT JOIN comp c ON c.id = doc_id""",
)
def dedup_keeper_table(spark, sf_dir):
    """The end-to-end dedup DECISION: LSH candidates → exact 3-gram
    Jaccard ≥ τ verified pairs → connected components → one keeper (min
    doc_id) per near-dup cluster; every document gets (keeper, is_dup).
    This is the table a training-data pipeline actually joins against to
    drop duplicates — pair detection (lsh_candidates /
    dedup_ngram_jaccard) composed with clustering (cc_label_prop
    machinery) into the final verdict. Oracle = the same pipeline as one
    SQL statement with a recursive CTE for the components.

    Threshold comparison uses the RAW ratio on both engines (identical
    int/int divisions — hashed-shingle set sizes equal string-shingle set
    sizes whp), so no rounding convention is needed."""
    from glre_spark.linking import connected_components

    d = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id",
        F.transform(_shingle_col(F.col("text")), lambda x: F.xxhash64(x)).alias("sh"),
    )
    cand = _capped_candidates(spark, sf_dir)
    da = d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    db = d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    ver = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .filter(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b"))
            >= _KEEPER_TAU
        )
        .select("id_a", "id_b")
    )
    comps = connected_components(ver)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return docs.join(comps, docs.doc_id == comps.id, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("keeper"),
        (F.coalesce(F.col("component"), F.col("doc_id")) != F.col("doc_id")).alias(
            "is_dup"
        ),
    )


def near_dup_keepers(
    docs, tau: float = _KEEPER_TAU, max_block: int = MAX_LSH_BLOCK,
    sketch_k: int | None = None, check_ids: bool = True,
):
    """dedup_keeper_table's decision generalized to an ARBITRARY
    (doc_id bigint, text string) DataFrame — no sf_dir, no cache — so the
    flagship pipeline can compose it below its inference stage
    (pipeline.build_triples(drop_near_dups=True)). Same machinery end to
    end: MinHash → capped LSH blocks → Jaccard ≥ τ verify → connected
    components → (doc_id, keeper, is_dup), min-id keeper. Zero Python
    stages; every join is bounded by the block cap, never all-pairs.

    ``sketch_k`` trades exact verify for scale: with it set, BOTH the
    signatures and the verify run off ONE materialized distinct-shingle-
    hash pass, and the verify joins a bottom-k sketch (the k smallest
    hashes — a KMV/bottom-k sketch) instead of the full shingle set.
    Jaccard is estimated with the standard KMV estimator
    |bottom_k(A∪B) ∩ A ∩ B| / min(k, |A∪B|), which degenerates to EXACT
    Jaccard whenever a doc's distinct-shingle count ≤ k. The full-set
    verify shuffles every candidate pair's complete shingle arrays —
    ~8 bytes × shingles/doc × 2 per pair, the measured bomb on long web
    pages (r5 dup-bench: 4 KB html docs → ~70 s keeper pass at 25 k
    docs); the sketch caps that at 8·k bytes/side and is the variant a
    100 TB pass would run.

    PRECONDITION: ``doc_id`` must be unique — a duplicate fans out the
    verify join and collapses the per-row keep/drop decision across the
    duplicate's rows (ADVICE r5). ``check_ids=True`` (default) enforces
    it with one groupBy on the fixed-width id (map-side combine; the
    cheapest possible whole-input probe). It is an extra eager action:
    callers whose input DAG is expensive should localCheckpoint first
    (pipeline.build_triples does) or, at true web scale where the input
    is a materialized table with a key guarantee, pass False."""
    from glre_spark.linking import connected_components

    docs = fan_out(docs.select("doc_id", "text"))
    if check_ids:
        dup = (
            docs.groupBy("doc_id").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1).limit(3).collect()
        )
        if dup:
            ids = [r["doc_id"] for r in dup]
            raise ValueError(
                f"near_dup_keepers: doc_id not unique (e.g. {ids}); the "
                "keeper decision is per-document — dedup or re-key the "
                "input first"
            )
    hs = docs.select(
        "doc_id",
        F.array_distinct(_shingle_hash_col(F.col("text"))).alias("hs"),
    )
    if sketch_k:
        # one shingle-hash pass feeds both signatures and sketches (the
        # local analog of "write the signature table once, then join")
        hs = hs.localCheckpoint(eager=True)
    sig = hs.select(
        "doc_id",
        *[
            F.array_min(F.transform(F.col("hs"), _perm_hash(i))).alias(f"mh{i}")
            for i in range(_K)
        ],
    )
    bands = _bands_of_sig(sig)
    sized = bands.groupBy("band_id", "band_hash").agg(F.count("*").alias("bn"))
    capped = bands.join(
        F.broadcast(
            sized.filter(F.col("bn") <= max_block).select("band_id", "band_hash")
        ),
        ["band_id", "band_hash"],
    )
    a = capped.select(F.col("doc_id").alias("id_a"), "band_id", "band_hash")
    b = capped.select(F.col("doc_id").alias("id_b"), "band_id", "band_hash")
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact-content star candidates: byte-identical docs (the web's
    # dominant duplication mode — mirrors) grouped by md5(text) and paired
    # to the group's min doc_id. An exact-dup group is an equivalence
    # class, so the star edges suffice for CC, and the construction is
    # LINEAR in group size — no cap needed. This matters because the
    # banded path alone can lose mirrors: on a template-heavy corpus the
    # hot band buckets the skew cap drops contain exactly those pairs
    # (measured r5: bands found 15% of planted byte-identical mirrors on
    # a 25k-doc template corpus; bands + exact star find all of them).
    # NOT keyed on the minhash signature: equal signatures do NOT imply
    # near-duplicate on shingle-skewed corpora (measured: 24k template
    # docs collapsed into 1.8k full-signature buckets at J far below τ),
    # and star-to-min inside a mixed bucket would pair mirrors with a
    # non-duplicate min and lose them at verify.
    ex = docs.select("doc_id", F.md5("text").alias("cx"))
    exmin = (
        ex.groupBy("cx")
        .agg(F.min("doc_id").alias("id_a"), F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    star = (
        ex.join(exmin, "cx")
        .filter(F.col("doc_id") != F.col("id_a"))
        .select("id_a", F.col("doc_id").alias("id_b"))
    )
    cand = cand.unionByName(star).distinct()
    if sketch_k:
        sh = hs.select(
            "doc_id", F.slice(F.array_sort("hs"), 1, sketch_k).alias("sh")
        )
    else:
        sh = hs.select("doc_id", F.col("hs").alias("sh"))
    paired = cand.join(
        sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(
        sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"
    )
    if sketch_k:
        both = F.array_intersect("sh_a", "sh_b")
        union_k = F.slice(
            F.array_sort(F.array_union("sh_a", "sh_b")), 1, sketch_k
        )
        denom = F.least(F.lit(sketch_k), F.size(F.array_union("sh_a", "sh_b")))
        jac = F.size(F.array_intersect(both, union_k)).cast("double") / denom
    else:
        jac = (
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b"))
        )
    ver = paired.filter(jac >= tau).select("id_a", "id_b")
    comps = connected_components(ver)
    ids = docs.select("doc_id")
    return ids.join(comps, ids.doc_id == comps.id, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("keeper"),
        (F.coalesce(F.col("component"), F.col("doc_id")) != F.col("doc_id")).alias(
            "is_dup"
        ),
    )


_SKETCH_K = 256  # bottom-k (KMV) sketch size for the scale-shaped verify


@op(
    "dedup_keeper_sketch",
    "WITH RECURSIVE "
    + _CAND_CTES
    + f""",
ex AS (SELECT doc_id, md5(text) AS cx FROM documents),
exmin AS (
  SELECT cx, MIN(doc_id) AS id_a
  FROM ex GROUP BY cx HAVING COUNT(*) > 1
),
star AS (
  SELECT x.id_a, e.doc_id AS id_b
  FROM ex e JOIN exmin x USING (cx)
  WHERE e.doc_id <> x.id_a
),
allc AS (
  SELECT id_a, id_b FROM cand
  UNION
  SELECT id_a, id_b FROM star
),
sk AS MATERIALIZED (
  SELECT doc_id, list_slice(list_sort(list(h)), 1, {_SKETCH_K}) AS sh
  FROM sh GROUP BY doc_id
),
ver AS MATERIALIZED (
  SELECT c.id_a, c.id_b
  FROM allc c
  JOIN sk a ON a.doc_id = c.id_a
  JOIN sk b ON b.doc_id = c.id_b
  WHERE CAST(len(list_intersect(
               list_intersect(a.sh, b.sh),
               list_slice(list_sort(list_distinct(list_concat(a.sh, b.sh))),
                          1, {_SKETCH_K}))) AS DOUBLE)
        / least({_SKETCH_K}, len(list_distinct(list_concat(a.sh, b.sh))))
        >= {_KEEPER_TAU}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM ver
  UNION ALL
  SELECT id_b, id_a FROM ver
),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(lbl) AS keeper FROM reach GROUP BY id)
SELECT doc_id,
       COALESCE(c.keeper, doc_id) AS keeper,
       COALESCE(c.keeper, doc_id) <> doc_id AS is_dup
FROM documents LEFT JOIN comp c ON c.id = doc_id""",
)
def dedup_keeper_sketch(spark, sf_dir):
    """The 100-TB-shaped keeper decision (near_dup_keepers with
    ``sketch_k``) on the driver surface: ONE materialized shingle-hash
    pass feeds both the MinHash signatures and a bottom-256 KMV sketch;
    verify estimates Jaccard from the sketches (|bottom_k(A∪B) ∩ A ∩ B| /
    min(k, |A∪B|)) so no full shingle array ever shuffles through the
    pair join; byte-identical mirrors get linear md5(text) star edges.

    Full DuckDB twin: the base shingle hash is the engine-stable
    md5-prefix recipe, so the oracle reproduces the EXACT bottom-k sets
    (list_sort + list_slice) and hence the identical estimate and keeper
    table — the KMV estimator itself is cross-checked, not just row
    counts (VERDICT r5 next-round #4)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return near_dup_keepers(docs, sketch_k=_SKETCH_K)


_ANN_CTES = """q AS (
  SELECT UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings WHERE vec_id = 0
),
d AS (
  SELECT vec_id, UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings
),
pr AS (
  SELECT d.vec_id, SUM(d.v * q.v) AS dot,
         sqrt(SUM(d.v * d.v)) AS nd, sqrt(SUM(q.v * q.v)) AS nq
  FROM d JOIN q USING (idx) GROUP BY d.vec_id
)"""


@op(
    "ann_cosine_topk",
    "WITH "
    + _ANN_CTES
    + """
SELECT vec_id, ROUND(dot / (nd * nq) + 1e-9, 4) + 0 AS cos_sim
FROM pr WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10""",
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs vec 0 — the ANN baseline. Dot/norms via
    zip_with + aggregate (JVM-side higher-order fns, no UDF)."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id = 0").select(F.col("embedding").alias("qe"))
    joined = fan_out(emb.filter("vec_id <> 0")).crossJoin(F.broadcast(q))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cos = fround(
        dot(F.col("embedding"), F.col("qe"))
        / (F.sqrt(dot(F.col("embedding"), F.col("embedding"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))),
        4,
    )
    return (
        joined.select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# --- random-hyperplane LSH for ANN ------------------------------------------
# Seeded Rademacher (±1) hyperplanes: a valid sign-random-projection family
# (Charikar SimHash), exactly computable in BOTH engines — the ±1 dot
# product is an add/subtract chain written in the identical term order, so
# Spark and DuckDB produce bit-identical doubles and identical sign bits.
_EMB_DIM = 64
_LSH_L = 8      # hash tables (union of candidates over tables)
_LSH_BITS = 3   # sign bits per table: few bits + several tables because the
                # corpus is near-orthogonal (top-10 cosine ≈ 0.3 → per-bit
                # agreement ≈ 0.6; 3 bits × 8 tables → measured recall ≥ 0.8)


def _lsh_planes(n_planes: int, seed: int) -> list[list[int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.choice([-1, 1], size=(n_planes, _EMB_DIM)).tolist()


_TOPK_PLANES = _lsh_planes(_LSH_L * _LSH_BITS, seed=20240816)
_BUCKET_PLANES = _lsh_planes(8, seed=20240817)


def _plane_sql(coefs: list[int]) -> str:
    terms = [
        ("+" if c > 0 else "-") + f" CAST(embedding[{i + 1}] AS DOUBLE) "
        for i, c in enumerate(coefs)
    ]
    return "(0.0 " + "".join(terms) + ")"


def _plane_col(coefs: list[int]):
    # zip_with + aggregate instead of a 64-term inline chain: the inline
    # form made whole-stage codegen compile a megamethod (measured 19 s of
    # pure compile at 500 rows). Fold order is left-to-right in both forms
    # and x*(-1.0)+acc ≡ acc-x exactly in IEEE, so the doubles (and sign
    # bits) stay bit-identical to the SQL twin's add/subtract chain.
    arr = F.array(*[F.lit(float(c)) for c in coefs])
    return F.aggregate(
        F.zip_with(F.col("embedding"), arr, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _bucket_sql(planes: list[list[int]]) -> str:
    return "concat(" + ", ".join(
        f"CASE WHEN {_plane_sql(p)} > 0 THEN '1' ELSE '0' END" for p in planes
    ) + ")"


def _bucket_col(planes: list[list[int]]):
    return F.concat(
        *[F.when(_plane_col(p) > 0, "1").otherwise("0") for p in planes]
    )


@op(
    "ann_lsh_bucketed",
    f"""SELECT {_bucket_sql(_BUCKET_PLANES)} AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n_vectors
       FROM embeddings GROUP BY 1""",
)
def ann_lsh_bucketed(spark, sf_dir):
    """Sign-random-projection bucketing of embeddings (seeded hyperplanes)
    — the scale path: ANN candidates only within a bucket."""
    return (
        fan_out(load(spark, sf_dir, "embeddings"))
        .groupBy(_bucket_col(_BUCKET_PLANES).alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("n_vectors"))
    )


def _topk_table_planes(tbl: int) -> list[list[int]]:
    return _TOPK_PLANES[tbl * _LSH_BITS : (tbl + 1) * _LSH_BITS]


@op(
    "ann_lsh_topk",
    "WITH b AS (SELECT vec_id, "
    + ", ".join(
        f"{_bucket_sql(_topk_table_planes(t))} AS b{t}" for t in range(_LSH_L)
    )
    + """ FROM embeddings),
qb AS (SELECT * FROM b WHERE vec_id = 0),
cand AS (
  SELECT DISTINCT b.vec_id FROM b, qb
  WHERE b.vec_id <> 0 AND ("""
    + " OR ".join(f"b.b{t} = qb.b{t}" for t in range(_LSH_L))
    + """)
),
q AS (
  SELECT UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings WHERE vec_id = 0
),
d AS (
  SELECT vec_id, UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)
),
pr AS (
  SELECT d.vec_id, SUM(d.v * q.v) AS dot,
         sqrt(SUM(d.v * d.v)) AS nd, sqrt(SUM(q.v * q.v)) AS nq
  FROM d JOIN q USING (idx) GROUP BY d.vec_id
)
SELECT vec_id, ROUND(dot / (nd * nq) + 1e-9, 4) + 0 AS cos_sim
FROM pr ORDER BY cos_sim DESC, vec_id LIMIT 10""",
)
def ann_lsh_topk(spark, sf_dir):
    """End-to-end scalable ANN query: candidates = vectors sharing ANY of
    the query's L table buckets (bucket join — never all-pairs), exact
    cosine re-rank of the candidate set only, deterministic top-10.
    Recall vs the ann_cosine_topk brute force is asserted ≥ 0.8 in
    tests/test_ann.py."""
    emb = load(spark, sf_dir, "embeddings")
    buckets = fan_out(emb).select(
        "vec_id",
        F.posexplode(
            F.array(*[_bucket_col(_topk_table_planes(t)) for t in range(_LSH_L)])
        ).alias("tbl", "bkt"),
    )
    qb = buckets.filter(F.col("vec_id") == 0).select(
        F.col("tbl").alias("qtbl"), F.col("bkt").alias("qbkt")
    )
    cand = (
        buckets.filter(F.col("vec_id") != 0)
        .join(
            F.broadcast(qb),
            (F.col("tbl") == F.col("qtbl")) & (F.col("bkt") == F.col("qbkt")),
        )
        .select("vec_id")
        .distinct()
    )
    q = emb.filter("vec_id = 0").select(F.col("embedding").alias("qe"))
    joined = emb.join(cand, "vec_id").crossJoin(F.broadcast(q))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cos = fround(
        dot(F.col("embedding"), F.col("qe"))
        / (
            F.sqrt(dot(F.col("embedding"), F.col("embedding")))
            * F.sqrt(dot(F.col("qe"), F.col("qe")))
        ),
        4,
    )
    return (
        joined.select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


# --- embedding-cosine near-dup (the 5th dedup family of the brief) ----------
_EDUP_THRESH = 0.4   # this synthetic corpus is near-orthogonal (max pairwise
                     # cos 0.51); 59 true pairs ≥ 0.4 corpus-wide at sf0.01
_EDUP_CAP = 128      # per-(table, bucket) size cap — same cartesian-bomb
                     # guard as MAX_LSH_BLOCK; at web scale you also raise
                     # _LSH_BITS so expected bucket size stays constant


def _edup_bucket_selects() -> str:
    return " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_bucket_sql(_topk_table_planes(t))} AS bkt "
        "FROM embeddings"
        for t in range(_LSH_L)
    )


def _edup_sql() -> str:
    return f"""WITH b AS ({_edup_bucket_selects()}),
sized AS (
  SELECT tbl, bkt FROM b GROUP BY tbl, bkt HAVING COUNT(*) <= {_EDUP_CAP}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
  FROM b a
  JOIN sized s ON a.tbl = s.tbl AND a.bkt = s.bkt
  JOIN b c ON a.tbl = c.tbl AND a.bkt = c.bkt
  WHERE a.vec_id < c.vec_id
),
da AS (
  SELECT vec_id, UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings
),
pr AS (
  SELECT c.id_a, c.id_b, SUM(x.v * y.v) AS dot,
         sqrt(SUM(x.v * x.v)) AS na, sqrt(SUM(y.v * y.v)) AS nb
  FROM cand c
  JOIN da x ON x.vec_id = c.id_a
  JOIN da y ON y.vec_id = c.id_b AND y.idx = x.idx
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b, ROUND(dot / (na * nb) + 1e-9, 4) + 0 AS cos_sim
FROM pr WHERE ROUND(dot / (na * nb) + 1e-9, 4) + 0 >= {_EDUP_THRESH}"""


@op("dedup_embedding_cosine", _edup_sql())
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (brief's 5th dedup family
    beside exact / MinHash-LSH / SimHash / n-gram-Jaccard): candidates =
    vectors sharing ANY of the L sign-LSH table buckets (never all-pairs;
    per-bucket size capped), then exact cosine on candidates only,
    keeping pairs ≥ _EDUP_THRESH (0.4). The threshold test runs on the
    ROUNDED value in both engines so the keep/drop decision is
    bit-identical. Per-table match probability at cos 0.4 is
    (1 − θ/π)³ ≈ 0.25 → ≈0.9 recall over the 8 tables (same plane family
    as ann_lsh_topk)."""
    emb = load(spark, sf_dir, "embeddings")
    buckets = fan_out(emb).select(
        "vec_id",
        F.posexplode(
            F.array(*[_bucket_col(_topk_table_planes(t)) for t in range(_LSH_L)])
        ).alias("tbl", "bkt"),
    )
    sized = (
        buckets.groupBy("tbl", "bkt")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") <= _EDUP_CAP)
        .select("tbl", "bkt")
    )
    capped = buckets.join(F.broadcast(sized), ["tbl", "bkt"])
    a = capped.select(F.col("vec_id").alias("id_a"), "tbl", "bkt")
    c = capped.select(F.col("vec_id").alias("id_b"), "tbl", "bkt")
    cand = (
        a.join(c, ["tbl", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = fround(
        dot(F.col("va"), F.col("vb"))
        / (F.sqrt(dot(F.col("va"), F.col("va"))) * F.sqrt(dot(F.col("vb"), F.col("vb")))),
        4,
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= _EDUP_THRESH)
    )


# --- IVF ANN (inverted-file partitioning) -----------------------------------
_IVF_K = 8      # seed centroids = the embeddings of vec_ids 1..K (a real
                # deployment would k-means them; the partition/probe/re-rank
                # mechanics — the scale path — are identical)
_IVF_PROBE = 4  # clusters probed per query (measured recall 0.8 vs brute
                # force at sf0.001 AND sf0.01 while scanning ~half the rows;
                # this corpus is only weakly clustered, cos(top10) ≈ 0.3)

_IVF_SQL = f"""WITH cents AS (
  SELECT vec_id AS cid, UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000) AS BIGINT) AS c
  FROM embeddings WHERE vec_id BETWEEN 1 AND {_IVF_K}
),
vq AS (
  SELECT vec_id, UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
  FROM embeddings
),
dots AS (
  SELECT vq.vec_id, cents.cid, SUM(vq.x * cents.c) AS dot
  FROM vq JOIN cents USING (idx) GROUP BY vq.vec_id, cents.cid
),
asg AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS rn
    FROM dots) WHERE rn = 1
),
probe AS (
  SELECT cid AS cluster FROM (
    SELECT cid, row_number() OVER (ORDER BY dot DESC, cid) AS rn
    FROM dots WHERE vec_id = 0) WHERE rn <= {_IVF_PROBE}
),
q AS (
  SELECT UNNEST(range(1, len(embedding) + 1)) AS idx,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings WHERE vec_id = 0
),
d AS (
  SELECT e.vec_id, UNNEST(range(1, len(e.embedding) + 1)) AS idx,
         CAST(UNNEST(e.embedding) AS DOUBLE) AS v
  FROM embeddings e
  JOIN asg ON asg.vec_id = e.vec_id
  JOIN probe ON asg.cluster = probe.cluster
  WHERE e.vec_id <> 0
),
pr AS (
  SELECT d.vec_id, SUM(d.v * q.v) AS dot,
         sqrt(SUM(d.v * d.v)) AS nd, sqrt(SUM(q.v * q.v)) AS nq
  FROM d JOIN q USING (idx) GROUP BY d.vec_id
)
SELECT vec_id, ROUND(dot / (nd * nq) + 1e-9, 4) + 0 AS cos_sim
FROM pr ORDER BY cos_sim DESC, vec_id LIMIT {{limit}}""".format(limit=10)


@op("ann_ivf_topk", _IVF_SQL)
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN (the other scale path beside LSH): assign every vector to
    its nearest of K seed centroids, probe only the query's top-P
    partitions, exact cosine re-rank of that subset. At scale the
    assignment is one narrow scan + per-row argmax against a broadcast
    centroid table (here: K×64 int literals — centroids ARE cluster
    metadata, driver-sized by construction), and the probed partitions
    would be partition-pruned reads of an `ivf_cluster`-partitioned table.

    Centroid assignment runs on FLOOR(x*1000) integer quantization: the
    int dot products are exact in both engines regardless of summation
    order, so the Spark and DuckDB cluster assignments are identical (a
    float argmax could flip near ties — same trick as the ±1 LSH planes
    above). The final cosine uses the full-precision floats."""
    emb = load(spark, sf_dir, "embeddings")
    qcol = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000).cast("bigint"),
    )
    # ONE driver job lifts the K centroid vectors AND the query vector
    # (vec_ids 0..K — all driver-sized cluster metadata); the previous
    # second .collect() for the query paid a full extra scan job
    seeds = {
        int(r.vec_id): [int(v) for v in r.qv]
        for r in emb.filter(F.col("vec_id").between(0, _IVF_K))
        .select("vec_id", qcol.alias("qv"))
        .collect()
    }
    cmap = {cid: seeds[cid] for cid in sorted(seeds) if cid >= 1}

    def int_dot(cvals):
        arr = F.array(*[F.lit(v) for v in cvals])
        return F.aggregate(
            F.zip_with(qcol, arr, lambda x, c: x * c),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    # argmax centroid, ties → smallest cid (struct max: dot, then -cid)
    best = F.array_max(
        F.array(
            *[
                F.struct(int_dot(cmap[cid]).alias("d"), F.lit(-cid).alias("nc"))
                for cid in sorted(cmap)
            ]
        )
    )
    assigned = fan_out(emb).withColumn("cluster", -best["nc"])

    # the query's probe set, same exact integer rule, computed once
    qv = seeds[0]
    qdots = sorted(
        ((sum(a * b for a, b in zip(qv, cmap[cid])), -cid) for cid in cmap),
        reverse=True,
    )
    probe = [-nc for _, nc in qdots[:_IVF_PROBE]]

    cand = assigned.filter(F.col("cluster").isin(probe) & (F.col("vec_id") != 0))
    q = emb.filter("vec_id = 0").select(F.col("embedding").alias("qe"))
    joined = cand.crossJoin(F.broadcast(q))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cos = fround(
        dot(F.col("embedding"), F.col("qe"))
        / (
            F.sqrt(dot(F.col("embedding"), F.col("embedding")))
            * F.sqrt(dot(F.col("qe"), F.col("qe")))
        ),
        4,
    )
    return (
        joined.select("vec_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


def _simhash_sql() -> str:
    """Full DuckDB twin of the 63-bit SimHash: distinct whitespace tokens →
    md5 first 8 bytes big-endian (('0x' || hex-prefix)::UBIGINT matches
    Python's int.from_bytes(digest[:8], 'big') exactly) → per-bit ±1 column
    sums → majority sign bits. 63 generated CASE columns — verbose but
    pure SQL, so the driver value-hashes the whole collision table."""
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(63)
    )
    recompose = " + ".join(
        f"CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END"
        for b in range(63)
    )
    return f"""WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), ' ')) AS tok
    FROM documents
  )
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM toks
),
bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM h GROUP BY doc_id
),
sim AS (
  SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash FROM bits
)
SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS keeper
FROM sim GROUP BY simhash"""


@op("simhash_dedup", _simhash_sql())
def simhash_dedup(spark, sf_dir):
    """64-bit SimHash per document via an Arrow-batched pandas UDF
    (vectorized bit counting in numpy), grouped to find colliding docs.
    Value-checked against a full DuckDB twin (_simhash_sql) since r4; the
    python-oracle pytest in tests/test_clustering.py remains as the
    Hamming-distance property check."""
    import numpy as np
    import pandas as pd

    def sim_batch(batches):
        import hashlib as hl

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = set((text or "").split(" "))
                if toks:
                    hs = np.array(
                        [
                            int.from_bytes(hl.md5(t.encode()).digest()[:8], "big")
                            for t in toks
                        ],
                        dtype=np.uint64,
                    )
                    # (n_tok, 64) bit matrix → column sums → sign bits
                    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    acc = np.where(bits == 1, 1, -1).sum(axis=0)
                else:
                    acc = np.full(64, -1)
                sh = 0
                for b in range(63):  # keep 63 bits: stay in signed int64
                    if acc[b] > 0:
                        sh |= 1 << b
                out.append((int(doc_id), sh))
            yield pd.DataFrame(out, columns=["doc_id", "simhash"])

    # factor=1: per-doc CPU here is light (~70 us), so Python-task
    # dispatch dominates and 1x cluster width beats 2x (measured sf1.0:
    # 0.84 s at 32 tasks vs 1.23 s at 64 on local[32])
    docs = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text"), factor=1)
    sims = docs.mapInPandas(sim_batch, "doc_id long, simhash long")
    return (
        sims.groupBy("simhash")
        .agg(F.count("*").cast("bigint").alias("n"), F.min("doc_id").alias("keeper"))
    )


# ---------------------------------------------------------------------------
# GLRE pipeline ops (rows-only: non-SQL-expressible inference)
# ---------------------------------------------------------------------------


@op(
    "glre_extract_text",
    # Not tautological: if extraction diverges on ANY page, the Spark side
    # returns a second (byte_identical=false) group — row-count and hash
    # both break against this single-group oracle.
    """SELECT CAST(1 AS BOOLEAN) AS byte_identical,
              CAST(COUNT(*) AS BIGINT) AS n_pages
       FROM documents""",
)
def glre_extract_text(spark, sf_dir):
    """Byte-identical extraction invariant, distributed: synthesize pages
    (html + golden text) from the documents doc_ids, extract, compare.
    The DuckDB twin pins the invariant's only legal outcome — exactly one
    group, byte_identical=true, count = all pages."""
    from glre_spark.datagen import pages_from_docs
    from glre_spark.extract import extract_text_udf

    pages = pages_from_docs(load(spark, sf_dir, "documents"))
    return pages.select(
        "url",
        (extract_text_udf(F.col("html")) == F.col("text")).alias("byte_identical"),
    ).groupBy("byte_identical").agg(F.count("*").cast("bigint").alias("n_pages"))


@op("glre_infer_triples", None)
def glre_infer_triples(spark, sf_dir):
    """The flagship KG pipeline end-to-end at sf_dir scale (rows-only)."""
    from glre_spark.datagen import pages_from_docs
    from glre_spark.pipeline import build_triples

    pages = pages_from_docs(load(spark, sf_dir, "documents"))
    return build_triples(spark, pages)


@op("glre_cluster_entities", None)
def glre_cluster_entities(spark, sf_dir):
    """The full north-star path INCLUDING the cross-document entity-cluster
    merge (MinHash-LSH blocking + connected components over near-duplicate
    names, linking.cluster_names) — build_triples(cluster_entities=True).
    Rows-only: the iterative CC fixpoint is not one SQL statement."""
    from glre_spark.datagen import pages_from_docs
    from glre_spark.pipeline import build_triples

    pages = pages_from_docs(load(spark, sf_dir, "documents"))
    return build_triples(spark, pages, cluster_entities=True)


@op("glre_entity_table", None)
def glre_entity_table(spark, sf_dir):
    """The entity dimension materialized from the GLRE triple stream
    (io.entity_table — north_star's 'entity table as partitioned output')."""
    from glre_spark.datagen import pages_from_docs
    from glre_spark.io import entity_table
    from glre_spark.pipeline import build_triples

    pages = pages_from_docs(load(spark, sf_dir, "documents"))
    return entity_table(build_triples(spark, pages))
