"""Stage 2 — multi-pass blocking: candidate pair generation.

Replaces the reference's two blocking passes —
* exact person-hash grouping (/root/reference/src/classifying.py:1930-1968)
* Weaviate ANN expansion, cosine distance <= 0.18
  (/root/reference/src/classifying.py:1663-1833)
— with three Spark-native passes that all emit (conv_id, block_key) rows into
ONE unified pair-generation join:

  B1 exact      : block_key = name_hash                       (J3)
  B2 sorted-ngh : rank within name-prefix partition, overlapping rank buckets
                  -> neighbors within SNM_WINDOW share a bucket (north_rule's
                  "sorted-neighborhood on normalized name/text keys")
  B3 minhash-lsh: banded MinHash over word shingles of norm_text (north_rule's
                  "MinHash-LSH on token shingles"; replaces the ANN join J4)

Pair generation is a single self-equi-join on block_key with a skew guard:
hot blocks (> max_block_size members) are deterministically split into salted
sub-blocks, bounding any block's pair fan-out at cap^2 while keeping the join
shuffle balanced (north_rule's "salted repartitioning on blocking keys").
Forgone cross-sub-block pairs are observable in the metrics the pipeline
records per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.functions.hashing import (
    lsh_band_keys,
    minhash_signature,
    shingles_expr,
)


def _sorted_name_key() -> F.Column:
    """Word-order-insensitive name key: sorted tokens of name_key. Handles
    'Franz Schubert' vs 'Schubert, Franz' (normalization already dropped the
    comma) — the reference gets this for free because its `person` field is
    already authority-formatted; transcripts aren't."""
    return F.array_join(
        F.array_sort(F.filter(F.split(F.col("name_key"), r"\s+"), lambda t: t != "")),
        " ",
    )


def _named(key: F.Column) -> F.Column:
    """NULL the key out for records without a usable name."""
    return F.when(F.col("name_key") != "", key)


def _exact_key_exprs() -> list[F.Column]:
    """B1: exact normalized-name-hash key + sorted-token name key."""
    plain = F.when(
        F.col("name_hash").isNotNull(),
        F.concat(F.lit("x:"), F.col("name_hash").cast("string")),
    )
    sorted_tok = _named(
        F.concat(F.lit("t:"), F.xxhash64(_sorted_name_key()).cast("string"))
    )
    return [F.array(plain), F.array(sorted_tok)]


def exact_blocks(records: DataFrame) -> DataFrame:
    """B1 as standalone (conv_id, block_key) rows — audit/compat surface."""
    return _explode_keys(records, _exact_key_exprs())


def _explode_keys(records: DataFrame, key_arrays: list[F.Column]) -> DataFrame:
    # concat() is NULL if ANY argument is NULL — a record with no name (whose
    # name-pass arrays are NULL) must still keep its text-LSH keys, so every
    # array is coalesced to empty first. (Regression: nameless records lost
    # ALL blocks, silently dropping them from candidate generation.)
    empty = F.array().cast("array<string>")
    keys = F.concat(*[F.coalesce(arr, empty) for arr in key_arrays])
    return records.select(
        "conv_id",
        F.explode(F.filter(keys, lambda k: k.isNotNull())).alias("block_key"),
    )


def sorted_neighborhood_blocks(records: DataFrame, cfg: EngineConfig) -> DataFrame:
    """B2: sorted-neighborhood via overlapping rank buckets.

    Within each name-key prefix partition, records are ranked by
    (name_key, conv_id); two bucketings offset by half a window guarantee any
    two records within ``snm_window/2`` ranks share at least one bucket. This
    is the scalable SNM formulation: no global sort, no single-partition
    Window — the Window partitions by prefix, so parallelism = #prefixes.
    """
    w = cfg.snm_window
    base = records.select("conv_id", "name_key").where(F.col("name_key") != "")
    out = None
    # Two sort keys: the name as-is (initials sort next to their expansions:
    # "ramanujan j" ~ "ramanujan joseph") and the token-sorted form (word
    # order swaps: "franz schubert" ~ "schubert franz").
    for tag, key in (("n", F.col("name_key")), ("o", _sorted_name_key())):
        win = Window.partitionBy("_pfx").orderBy("_skey", "conv_id")
        ranked = (
            base.withColumn("_skey", key)
            .withColumn("_pfx", F.substring(F.col("_skey"), 1, cfg.snm_prefix_len))
            .withColumn("_rank", F.row_number().over(win))
        )
        for off in (0, w // 2):
            b = ranked.select(
                "conv_id",
                F.concat_ws(
                    ":", F.lit(f"s{tag}{off}"), F.col("_pfx"),
                    F.floor((F.col("_rank") + off) / w).cast("string"),
                ).alias("block_key"),
            )
            out = b if out is None else out.unionByName(b)
    return out


def minhash_lsh_blocks(records: DataFrame, cfg: EngineConfig) -> DataFrame:
    """B3: banded-MinHash blocks over word shingles of the normalized text.
    Signature via explode+groupBy (codegen'd hashes; partial aggregation
    keeps the shuffle to one reduced row per (mapper, record))."""
    with_shingles = records.select(
        "conv_id", shingles_expr(F.col("tokens"), cfg.shingle_k).alias("_sh")
    )
    sig = minhash_signature(with_shingles, "conv_id", "_sh", cfg.minhash_hashes)
    keys = lsh_band_keys(F.col("sig"), cfg.minhash_hashes, cfg.minhash_bands)
    tagged = F.transform(keys, lambda k: F.concat(F.lit("m"), k))
    return sig.select("conv_id", F.explode(tagged).alias("block_key"))


def name_lsh_blocks(records: DataFrame, cfg: EngineConfig) -> DataFrame:
    """B4: banded-MinHash blocks over CHARACTER 3-grams of the token-sorted
    name key. This is the direct analogue of the reference's ANN expansion
    over *name-string* vectors (src/classifying.py:1663-1833 queries Weaviate
    with person-name embeddings, not composite text): small name edits —
    typos, diacritics, added initials — keep most char 3-grams, so the pair
    survives blocking even when exact/SNM passes miss it."""
    skey = _sorted_name_key()
    n = F.length(skey)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2), lambda i: F.substring(skey, i, F.lit(3))
        ),
    ).otherwise(F.array(skey))
    with_grams = records.where(F.col("name_key") != "").select(
        "conv_id", grams.alias("_g")
    )
    sig = minhash_signature(with_grams, "conv_id", "_g", cfg.name_lsh_hashes)
    keys = lsh_band_keys(F.col("sig"), cfg.name_lsh_hashes, cfg.name_lsh_bands)
    tagged = F.transform(keys, lambda k: F.concat(F.lit("g"), k))
    return sig.select("conv_id", F.explode(tagged).alias("block_key"))


def _surname_initials() -> tuple[F.Column, F.Column]:
    toks = F.filter(F.split(F.col("name_key"), r"\s+"), lambda t: t != "")
    longest = F.array_max(
        F.transform(toks, lambda t: F.struct(F.length(t).alias("l"), t.alias("t")))
    )["t"]
    initials = F.array_join(
        F.array_sort(
            F.filter(
                F.transform(toks, lambda t: F.when(t != longest, F.substring(t, 1, 1))),
                lambda x: x.isNotNull(),
            )
        ),
        "",
    )
    return longest, initials


def _initials_key() -> F.Column:
    """B5: initials-folded key — the longest name token (surname heuristic)
    plus the sorted first letters of the remaining tokens. 'riemann charles'
    and 'riemann c' both key to 'riemann|c'; catches initialisms that defeat
    both exact and char-gram passes."""
    longest, initials = _surname_initials()
    return _named(
        F.concat(
            F.lit("i:"), F.xxhash64(F.concat_ws("|", longest, initials)).cast("string")
        )
    )


def initials_blocks(records: DataFrame) -> DataFrame:
    """B5 as standalone rows — audit/compat surface."""
    return _explode_keys(records, [F.array(_initials_key())])


def _soundex_key() -> F.Column:
    """B6: phonetic key — soundex of the longest name token (surname
    heuristic) + sorted initials of the rest. Catches typo'd surnames with
    simultaneously initialed/expanded given names ('noteher andrey' ~
    'noether a'), which defeat both char-gram LSH (shingle Jaccard ~0.25)
    and SNM ordering. Native ``F.soundex``; the reference gets this class of
    match from embedding ANN semantics."""
    longest, initials = _surname_initials()
    return _named(
        F.concat(
            F.lit("p:"),
            F.xxhash64(F.concat_ws("|", F.soundex(longest), initials)).cast("string"),
        )
    )


def soundex_blocks(records: DataFrame) -> DataFrame:
    """B6 as standalone rows — audit/compat surface."""
    return _explode_keys(records, [F.array(_soundex_key())])


def all_blocks(records: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Union of all blocking passes: (conv_id, block_key).

    The cheap per-record passes (exact, initials, soundex) fuse into ONE scan
    of records (one select, one explode). The two MinHash-LSH passes go
    through explode+groupBy signatures (codegen'd; partial aggregation keeps
    their shuffles to one reduced row per mapper x record — the corpus text
    never shuffles), and SNM keeps its rank windows. Four branches total.
    """
    fused = _explode_keys(
        records,
        [
            *_exact_key_exprs(),
            F.array(_initials_key()),
            F.array(_soundex_key()),
        ],
    )
    return (
        fused.unionByName(sorted_neighborhood_blocks(records, cfg))
        .unionByName(minhash_lsh_blocks(records, cfg))
        .unionByName(name_lsh_blocks(records, cfg))
    )


def split_hot_blocks(blocks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Skew guard: split blocks larger than max_block_size into salted
    sub-blocks via a deterministic hash of the member id. AQE handles moderate
    skew at join time; this bounds the *algorithmic* quadratic pair blow-up of
    pathological blocks (e.g. an empty-text shingle bucket).

    Sizes come from a count Window over block_key — ONE shuffle and one
    evaluation of the (expensive) upstream blocks plan, where the previous
    groupBy-sizes + join-back evaluated it twice.
    """
    cap = cfg.max_block_size
    n = F.count(F.lit(1)).over(Window.partitionBy("block_key"))
    salted_key = F.when(
        n > cap,
        F.concat_ws(
            "#",
            F.col("block_key"),
            F.pmod(F.xxhash64("conv_id"), F.ceil(n / cap)).cast("string"),
        ),
    ).otherwise(F.col("block_key"))
    return blocks.select("conv_id", salted_key.alias("block_key"))


def pairs_from_blocks(blocks: DataFrame, materialize: bool = True) -> DataFrame:
    """Canonicalized candidate pairs from (conv_id, block_key) rows.

    One self-equi-join on block_key; `<` ordering both de-duplicates within a
    block and canonicalizes (reference canonicalizes pairs by sorting ids,
    src/classifying.py:1108-1130). dropDuplicates collapses pairs found by
    multiple passes — the reference unions within-group and cross-group pair
    sets the same way (src/classifying.py:1089-1130).

    ``materialize`` (default) cuts the input's lineage with an eager
    localCheckpoint before the self-join: the block rows are tiny, but their
    PLAN is the whole multi-pass key computation — without the cut the join
    evaluates it once per side, and every downstream action re-analyzes the
    giant expression tree on the driver.
    """
    if materialize:
        blocks = blocks.localCheckpoint()
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(b, "block_key")
        .where(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("left"),
            F.col("b.conv_id").alias("right"),
        )
        .dropDuplicates(["left", "right"])
    )


def candidate_pairs(records: DataFrame, cfg: EngineConfig | None = None) -> DataFrame:
    cfg = cfg or EngineConfig()
    blocks = split_hot_blocks(all_blocks(records, cfg), cfg)
    return pairs_from_blocks(blocks)


def blocking_recall(pairs: DataFrame, labeled: DataFrame) -> float:
    """Fraction of labeled true pairs covered by candidate pairs (the judged
    blocking keys). The reference reports a 99.23% comparison *reduction*;
    recall of true pairs is the correctness side of that trade."""
    truths = (
        labeled.where(F.col("match"))
        .select(
            F.least("left", "right").alias("left"),
            F.greatest("left", "right").alias("right"),
        )
        .dropDuplicates()
    )
    total = truths.count()
    if total == 0:
        return 1.0
    covered = truths.join(pairs, ["left", "right"], "left_semi").count()
    return covered / total
