"""Entity linking & canonicalization (SURVEY.md §2.12).

Relational stages downstream of inference: name normalization, (salted)
broadcast alias-dictionary join, MinHash signatures + LSH banding in pure
SQL functions, candidate-pair self-join, connected components, canonical
naming, triple dedup. All built-in DataFrame ops — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Normalization (str_normalize §2.8)
# ---------------------------------------------------------------------------


def norm_name(col):
    """lower → strip punctuation to spaces → collapse whitespace → trim.
    Frozen alias-normalization contract shared with datagen.alias_rows."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def alias_dict_df(spark) -> DataFrame:
    from glre_spark.datagen import alias_rows

    return spark.createDataFrame(
        alias_rows(),
        "alias_norm string, entity_key string, canonical_name string, type string",
    )


# ---------------------------------------------------------------------------
# Alias joins (link_alias_broadcast / join_salted_skew)
# ---------------------------------------------------------------------------


def link_aliases(mentions: DataFrame, alias_df: DataFrame, name_col: str = "name") -> DataFrame:
    """Broadcast hash join mention names onto the alias dictionary.
    Unlinked names fall back to a deterministic surrogate key so every
    mention stays in the graph."""
    m = mentions.withColumn("alias_norm", norm_name(F.col(name_col)))
    joined = m.join(F.broadcast(alias_df), "alias_norm", "left")
    return joined.withColumn(
        "entity_key",
        F.coalesce(F.col("entity_key"), F.concat(F.lit("S"), F.md5("alias_norm"))),
    ).withColumn("canonical_name", F.coalesce(F.col("canonical_name"), F.col(name_col)))


def link_aliases_salted(
    mentions: DataFrame, alias_df: DataFrame, name_col: str = "name", salt_buckets: int = 16
) -> DataFrame:
    """Salted variant for hot keys (head entities, BASELINE.json north_star):
    fact side gets a url-hash salt; the dictionary is replicated ×N via
    explode(sequence(...)). Result ≡ the plain join (property-tested)."""
    m = mentions.withColumn("alias_norm", norm_name(F.col(name_col))).withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("url"), F.col(name_col)), F.lit(salt_buckets)).cast("int"),
    )
    dict_rep = alias_df.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = m.join(F.broadcast(dict_rep), ["alias_norm", "_salt"], "left").drop("_salt")
    return joined.withColumn(
        "entity_key",
        F.coalesce(F.col("entity_key"), F.concat(F.lit("S"), F.md5("alias_norm"))),
    ).withColumn("canonical_name", F.coalesce(F.col("canonical_name"), F.col(name_col)))


# ---------------------------------------------------------------------------
# MinHash + LSH blocking (minhash_sig / lsh_band / join_self_block)
# Pure SQL expressions — md5 is the hash family (stable across engines; the
# DuckDB oracle computes the identical signatures, SURVEY.md §2.12).
# ---------------------------------------------------------------------------

MINHASH_K = 8          # signature length
LSH_BANDS = 4          # bands of r = K/BANDS rows
SHINGLE_K = 3


def shingles(col, k: int = SHINGLE_K):
    """Character k-shingles via a higher-order function (str_shingle §2.8)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (k - 1), F.lit(1))),
            lambda i: col.substr(i, F.lit(k)),
        )
    )


def _seed_hash(i: int):
    # One-arg lambda required: F.transform treats (x, i) as (element, index).
    return lambda x: F.md5(F.concat(x, F.lit(f":{i}")))


def minhash_signature(shingle_col, k: int = MINHASH_K):
    """array of k min-hashes; hash_i(x) = md5(x || ':' || i), min taken
    lexicographically over hex strings — a valid deterministic hash family."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, _seed_hash(i))).alias(f"mh{i}")
            for i in range(k)
        ]
    )


def lsh_bands(sig_col, bands: int = LSH_BANDS, k: int = MINHASH_K):
    """signature → array of band hashes (md5 of the concatenated rows)."""
    r = k // bands
    return F.array(
        *[
            F.md5(F.concat_ws("|", *[sig_col.getItem(b * r + j) for j in range(r)]))
            for b in range(bands)
        ]
    )


def candidate_pairs(keys: DataFrame, id_col: str, band_col: str = "band") -> DataFrame:
    """Self-join within LSH buckets, a.id < b.id (join_self_block §2.3)."""
    a = keys.select(F.col(id_col).alias("id_a"), F.col(band_col).alias("b"))
    b = keys.select(F.col(id_col).alias("id_b"), F.col(band_col).alias("b"))
    return (
        a.join(b, "b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Connected components (cc_label_prop §2.12) — alternating min-label
# propagation with lineage truncation each iteration.
# ---------------------------------------------------------------------------


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """edges(id_a, id_b) → (id, component) with component = min id reachable.

    Min-label propagation PLUS a pointer-jumping step per round (component
    ← label(component)), so convergence is O(log diameter) — chains across
    overlapping LSH blocks converge in a handful of rounds even when far
    longer than max_iter. Driver-side fixpoint loop; localCheckpoint
    truncates lineage per iteration (SURVEY.md §4.3).

    Convergence probe: min-propagation is monotone per node, so a
    fixpoint exists; we stop when the label assignment stops changing,
    detected as an unchanged sum of xxhash64(id, component) — works for
    ANY id type (the keeper path uses raw url strings as ids since r6;
    the old sum-of-labels probe cast components to decimal and threw
    under ANSI on strings). A pre-fixpoint false stop needs the
    per-round hash sums to collide — 2^-64-ish per round, negligible.
    Summed as decimal(38,0): a bigint sum of 64-bit hashes could
    overflow under ANSI; decimal38 cannot at any realistic node count."""
    import warnings

    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.localCheckpoint(eager=True)  # compute candidate edges once
    nodes = sym.select(F.col("src").alias("id")).distinct()
    labels = nodes.withColumn("component", F.col("id")).localCheckpoint(eager=True)
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # candidate label for dst = min over neighbors' labels (+ own)
        prop = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: component ← label(component). label(x) ≤ x always,
        # and every component value is itself a node id, so the lookup hits.
        lut = prop.select(
            F.col("id").alias("_cid"), F.col("component").alias("_cnew")
        )
        labels = (
            prop.join(lut, prop.component == lut._cid)
            .select("id", F.col("_cnew").alias("component"))
            .localCheckpoint(eager=True)  # truncate lineage, one execution
        )
        s = labels.agg(
            F.sum(F.xxhash64("id", "component").cast("decimal(38,0)"))
        ).collect()[0][0]
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        warnings.warn(
            f"connected_components: no fixpoint after max_iter={max_iter}; "
            "components may be split — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


# ---------------------------------------------------------------------------
# Cross-document entity clustering (north_star: "MinHash-LSH blocking …
# merge cross-document entity clusters"): near-duplicate surface names →
# LSH candidate pairs → Jaccard verify → connected components → one
# canonical name per cluster.
# ---------------------------------------------------------------------------

MAX_LSH_BLOCK = 64  # cap candidate-block size; oversized blocks are logged
                    # and dropped (quadratic pair blowup guard, SURVEY M4)


def cluster_names(
    names: DataFrame,
    name_col: str = "name",
    weight_col: str | None = None,
    jaccard_threshold: float = 0.85,
    max_block: int = MAX_LSH_BLOCK,
) -> DataFrame:
    """(name [, weight]) → (name, cluster_name) mapping for near-duplicate
    names. Pure DataFrame ops: shingle → MinHash → LSH bands → capped
    block self-join → Jaccard verify → connected components (by hashed
    name id) → canonical pick (max weight, tie → lexicographic).

    Node ids are xxhash64(name): fully parallel (a dense_rank over a
    global no-partition window would funnel every distinct name through
    one task) and collision-safe at 64 bits for name-clustering scale."""
    w = (
        names.groupBy(name_col).agg(F.sum(weight_col).alias("_w"))
        if weight_col
        else names.select(name_col).distinct().withColumn("_w", F.lit(1))
    )
    ided = w.withColumn(
        "_id", F.xxhash64(F.col(name_col))
    ).withColumn("_sh", shingles(norm_name(F.col(name_col))))
    sig = ided.withColumn("_sig", minhash_signature(F.col("_sh")))
    bands = sig.select(
        "_id", "_sh", F.explode(lsh_bands(F.col("_sig"))).alias("band")
    )
    # block-size cap
    sizes = bands.groupBy("band").agg(F.count("*").alias("bn"))
    bands = bands.join(
        F.broadcast(sizes.filter(F.col("bn") <= max_block).select("band")), "band"
    )
    a = bands.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "band")
    b = bands.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "band")
    pairs = (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "_j",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("_j") >= jaccard_threshold)
        .select("id_a", "id_b")
        .distinct()
    )
    comps = connected_components(pairs)  # only ids that appear in edges
    labeled = ided.join(comps, ided._id == comps.id, "left").select(
        F.col(name_col),
        F.col("_w"),
        F.coalesce(F.col("component"), F.col("_id")).alias("_comp"),
    )
    wrep = Window.partitionBy("_comp").orderBy(F.desc("_w"), F.asc(name_col))
    reps = (
        labeled.withColumn("_rk", F.row_number().over(wrep))
        .filter("_rk = 1")
        .select("_comp", F.col(name_col).alias("cluster_name"))
    )
    return labeled.join(reps, "_comp").select(
        F.col(name_col).alias("name"), F.col("cluster_name")
    )


def apply_name_clusters(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the (name → cluster_name) mapping (broadcast)
    and re-dedup."""
    m_subj = mapping.select(
        F.col("name").alias("subj"), F.col("cluster_name").alias("_subj_c")
    )
    m_obj = mapping.select(
        F.col("name").alias("obj"), F.col("cluster_name").alias("_obj_c")
    )
    out = (
        triples.join(F.broadcast(m_subj), "subj", "left")
        .join(F.broadcast(m_obj), "obj", "left")
        .select(
            F.coalesce("_subj_c", "subj").alias("subj"),
            F.col("pred"),
            F.coalesce("_obj_c", "obj").alias("obj"),
            F.col("score"),
            F.col("url"),
            F.col("n_sources").alias("n_pred_rows"),
        )
    )
    return dedup_triples(out)


# ---------------------------------------------------------------------------
# Canonical naming + triple dedup (§2.12)
# ---------------------------------------------------------------------------


def canonicalize(named: DataFrame, cluster_col: str = "component", name_col: str = "canonical_name") -> DataFrame:
    """Pick the canonical name per cluster: most frequent, tie → lexicographic
    smallest (max_by over (count, reversed-name ordering) via window)."""
    counts = named.groupBy(cluster_col, name_col).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(cluster_col).orderBy(F.desc("cnt"), F.asc(name_col))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col(cluster_col), F.col(name_col).alias("cluster_name"))
    )


def dedup_triples(triples: DataFrame, extra_keys: list[str] | None = None) -> DataFrame:
    """Exact (subj, pred, obj) dedup keeping max score + a witness url.
    n_sources = number of contributing prediction rows (pre-aggregated
    upstream counts — n_pred_rows or already-deduped n_sources — are
    summed when present, so re-deduping a partially-deduped table is
    exact). ``extra_keys`` scopes the dedup (e.g. lineage bucket_group)."""
    if "n_pred_rows" in triples.columns:
        n_sources = F.sum("n_pred_rows")
    elif "n_sources" in triples.columns:
        n_sources = F.sum("n_sources")
    else:
        n_sources = F.count("*")
    return triples.groupBy("subj", "pred", "obj", *(extra_keys or [])).agg(
        F.max("score").alias("score"),
        F.min("url").alias("url"),
        n_sources.cast("bigint").alias("n_sources"),
    )
