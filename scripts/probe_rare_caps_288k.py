"""288k-entity blocking-recall probes for the rare-shingle caps (r6,
VERDICT item 3): k=5/df6 vs k=4/df12 vs default — recall and volume.
Results in docs/DEPLOY_100TB.md section 4b."""
import sys, time; sys.path.insert(0, ".")
from dataclasses import replace
from pyspark.sql import functions as F
from entity_resolver_spark import datagen
from entity_resolver_spark.config import EngineConfig
from entity_resolver_spark.operators.blocking import candidate_pairs
from entity_resolver_spark.operators.transcripts import build_entity_records
from entity_resolver_spark.session import get_spark

spark = get_spark("probe288", master="local[16]", shuffle_partitions=16)
data = datagen.generate(n_entities=288000, convs_per_entity=(2,5), turns_per_conv=(3,12))
tr = datagen.to_spark(spark, data["transcripts"]).repartition(16)
labeled = spark.createDataFrame(data["labeled_pairs"])
truths = labeled.where(F.col("match")).select(
    F.least("left","right").alias("left"), F.greatest("left","right").alias("right")
).dropDuplicates().localCheckpoint()
n_true = truths.count()
records = build_entity_records(tr).drop("full_text","norm_text","first_turn","name_raw").localCheckpoint()
print("records", records.count(), "true pairs", n_true, flush=True)
for tag, kw in [("k5_df6", dict(rare_shingle_k=5)), ("k4_df12", dict(rare_shingle_max_df=12))]:
    cfg = replace(EngineConfig(), **kw)
    t0=time.monotonic()
    pairs = candidate_pairs(records, cfg).localCheckpoint()
    n_pairs = pairs.count()
    wall = time.monotonic()-t0
    cov = truths.join(pairs, ["left","right"], "left_semi").count()
    print(f"{tag}: pairs={n_pairs} wall={wall:.0f}s recall={cov/n_true:.5f} missed={n_true-cov}", flush=True)
