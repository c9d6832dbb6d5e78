"""144k-corpus A/B for the r6 key-subsumption change: raw pair rows into
the dedup exchange and the pairjoin+dedup wall, with and without the _st
stamp, plus distinct-count equality. Evidence in OPTIMIZATION_r06.md."""
import sys, time; sys.path.insert(0, ".")
from pyspark.sql import functions as F
from entity_resolver_spark import datagen
from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.operators import blocking as B
from entity_resolver_spark.operators.transcripts import build_entity_records
from entity_resolver_spark.session import get_spark

spark = get_spark("ab144", master="local[16]", shuffle_partitions=16)
cfg = EngineConfig()
t0=time.monotonic()
data = datagen.generate(n_entities=144000, convs_per_entity=(2,5), turns_per_conv=(3,12))
print("datagen", round(time.monotonic()-t0,1), flush=True)
tr = datagen.to_spark(spark, data["transcripts"]).repartition(16).localCheckpoint()
records = build_entity_records(tr).drop("full_text","norm_text","first_turn","name_raw").localCheckpoint()
print("records", records.count(), flush=True)
t0=time.monotonic()
blocks = B.all_blocks(records, cfg).localCheckpoint()
print("blocks ckpt", round(time.monotonic()-t0,1), flush=True)
t0=time.monotonic()
split = B.split_hot_blocks(blocks, cfg, materialized=True).localCheckpoint()
print("split ckpt", round(time.monotonic()-t0,1), flush=True)
split_nost = split.drop("_st").localCheckpoint()
a = split.alias("a"); b = split.alias("b")
raw = a.join(b, "block_key").where(F.col("a.conv_id") < F.col("b.conv_id"))
n_raw = raw.count()
kept = raw.where(F.col("block_key").startswith("t:") | F.col("a._st").isNull() | F.col("b._st").isNull() | (F.col("a._st") != F.col("b._st"))).count()
print(f"raw pair rows: {n_raw} -> kept {kept} ({100*(1-kept/n_raw):.1f}% cut)", flush=True)
for rep in range(2):
    t0=time.monotonic(); B.pairs_from_blocks(split_nost, materialize=False).write.format("noop").mode("overwrite").save(); t_old=time.monotonic()-t0
    t0=time.monotonic(); B.pairs_from_blocks(split, materialize=False).write.format("noop").mode("overwrite").save(); t_new=time.monotonic()-t0
    print(f"rep{rep}: pairjoin+dedup old {t_old:.1f}s new {t_new:.1f}s", flush=True)
# distinct counts must match
n_new = B.pairs_from_blocks(split, materialize=False).count()
n_old = B.pairs_from_blocks(split_nost, materialize=False).count()
print("distinct pairs old", n_old, "new", n_new, flush=True)
