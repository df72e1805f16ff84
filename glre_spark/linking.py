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
    Driver-side fixpoint loop; localCheckpoint truncates lineage per
    iteration (SURVEY.md §4.3). Assumes pre-blocked edges (block size is
    capped upstream), so iterations are few."""
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    nodes = sym.select(F.col("src").alias("id")).distinct()
    labels = nodes.withColumn("component", F.col("id"))
    for _ in range(max_iter):
        # candidate label for dst = min over neighbors' labels (+ own)
        prop = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), F.col("component"))
            .unionByName(labels)
            .groupBy("id")
            .agg(F.min("component").alias("new_component"))
        )
        joined = labels.join(prop, "id")
        changed = joined.filter(F.col("new_component") < F.col("component")).limit(1)
        labels = joined.select(
            "id", F.least("component", "new_component").alias("component")
        ).localCheckpoint(eager=True)
        if changed.isEmpty():
            break
    return labels


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


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Exact (subj, pred, obj) dedup keeping max score + a witness url.
    n_sources = number of contributing prediction rows (pre-aggregated
    upstream counts are summed when present)."""
    n_sources = (
        F.sum("n_pred_rows") if "n_pred_rows" in triples.columns else F.count("*")
    )
    return triples.groupBy("subj", "pred", "obj").agg(
        F.max("score").alias("score"),
        F.min("url").alias("url"),
        n_sources.cast("bigint").alias("n_sources"),
    )
