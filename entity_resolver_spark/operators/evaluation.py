"""Evaluation operators: confusion matrix, PR metrics, threshold curves.

Reference parity: ``EntityClassifier.evaluate`` + PR/ROC curve generation
(/root/reference/src/training.py:498-625,926-1100) and the pipeline summary
report (src/reporting.py). All as DataFrame aggregations — the confusion
matrix is one groupBy, the threshold curve is one explode + groupBy (no
per-threshold rescans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(scored: DataFrame, truths: DataFrame) -> DataFrame:
    """scored(left, right, is_match) x truths(left, right, match) ->
    one row (tp, fp, fn, tn, precision, recall, f1). Unscored labeled pairs
    count as negative predictions."""
    t = truths.select(
        F.least("left", "right").alias("left"),
        F.greatest("left", "right").alias("right"),
        F.col("match").cast("boolean").alias("label"),
    ).dropDuplicates(["left", "right"])
    joined = t.join(
        scored.select("left", "right", "is_match"), ["left", "right"], "left"
    ).select("label", F.coalesce("is_match", F.lit(False)).alias("pred"))
    agg = joined.agg(
        F.sum((F.col("label") & F.col("pred")).cast("long")).alias("tp"),
        F.sum((~F.col("label") & F.col("pred")).cast("long")).alias("fp"),
        F.sum((F.col("label") & ~F.col("pred")).cast("long")).alias("fn"),
        F.sum((~F.col("label") & ~F.col("pred")).cast("long")).alias("tn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return agg.select(
        "tp", "fp", "fn", "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    )


def threshold_curve(
    scored: DataFrame, truths: DataFrame, step: float = 0.05
) -> DataFrame:
    """Precision/recall/F1 at each threshold in (0, 1): explode a threshold
    grid against each scored labeled pair, one groupBy — the whole curve in
    one shuffle instead of the reference's per-threshold rescan loop
    (src/training.py:699-744)."""
    t = truths.select(
        F.least("left", "right").alias("left"),
        F.greatest("left", "right").alias("right"),
        F.col("match").cast("boolean").alias("label"),
    ).dropDuplicates(["left", "right"])
    joined = t.join(scored.select("left", "right", "proba"), ["left", "right"])
    n_steps = int(round(1.0 / step)) - 1
    grid = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_steps)),
            lambda i: F.round(i * step, 6),
        )
    ).alias("threshold")
    per_t = joined.select("label", "proba", grid)
    agg = per_t.groupBy("threshold").agg(
        F.sum((F.col("label") & (F.col("proba") >= F.col("threshold"))).cast("long")).alias("tp"),
        F.sum((~F.col("label") & (F.col("proba") >= F.col("threshold"))).cast("long")).alias("fp"),
        F.sum((F.col("label") & (F.col("proba") < F.col("threshold"))).cast("long")).alias("fn"),
        F.sum((~F.col("label") & (F.col("proba") < F.col("threshold"))).cast("long")).alias("tn"),
    )
    prec = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return agg.select(
        "threshold", "tp", "fp", "fn", "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    ).orderBy("threshold")


def cluster_report(clusters: DataFrame, expected: DataFrame | None = None) -> DataFrame:
    """Cluster summary stats (reference report, src/classifying.py:2424-2662);
    with ground truth: pairwise homogeneity/completeness via pair counts."""
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("size"))
    base = sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("size").alias("n_records"),
        F.max("size").alias("max_size"),
        F.round(F.avg("size"), 4).alias("avg_size"),
        F.sum((F.col("size") == 1).cast("long")).alias("n_singletons"),
    )
    if expected is None:
        return base
    joined = clusters.join(expected.withColumnRenamed("cluster_id", "true_id"), "conv_id")
    pair = lambda c: (c * (c - 1) / 2).cast("double")  # noqa: E731
    got_pairs = (
        joined.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(pair(F.col("n"))), F.lit(0.0)).alias("v"))
    )
    true_pairs = (
        joined.groupBy("true_id").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(pair(F.col("n"))), F.lit(0.0)).alias("v"))
    )
    both_pairs = (
        joined.groupBy("cluster_id", "true_id").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(pair(F.col("n"))), F.lit(0.0)).alias("v"))
    )
    g = got_pairs.collect()[0]["v"]
    t = true_pairs.collect()[0]["v"]
    b = both_pairs.collect()[0]["v"]
    prec = b / g if g else 1.0
    rec = b / t if t else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return base.withColumns(
        {
            "pair_precision": F.lit(prec),
            "pair_recall": F.lit(rec),
            "pair_f1": F.lit(f1),
        }
    )


def render_curve_plots(curve_rows: list, out_dir: str) -> list[str]:
    """Render the reference's PR / ROC / F1-vs-threshold plots
    (/root/reference/src/training.py:926-1100 renders them with matplotlib)
    from an already-collected threshold_curve table (<= 1/step rows — driver
    side by construction, no Spark work here).

    matplotlib is an OPTIONAL dependency: absent (as in this container), the
    function returns [] and writes nothing — the curve TABLES persisted by
    write_report carry the same information. Returns the written paths.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return []

    import os

    rows = sorted(
        (r.asDict() if hasattr(r, "asDict") else dict(r) for r in curve_rows),
        key=lambda r: r["threshold"],
    )
    if not rows:
        return []
    os.makedirs(out_dir, exist_ok=True)
    prec = [r["precision"] for r in rows]
    rec = [r["recall"] for r in rows]
    thr = [r["threshold"] for r in rows]
    f1 = [r["f1"] for r in rows]
    written = []

    fig, ax = plt.subplots(figsize=(6, 5))
    ax.plot(rec, prec, marker="o")
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_title("precision-recall curve")
    ax.set_xlim(0, 1.02)
    ax.set_ylim(0, 1.02)
    path = os.path.join(out_dir, "pr_curve.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    written.append(path)

    # ROC needs tn (curve tables written before r4 lack it — skip then)
    if all("tn" in r and r["tn"] is not None for r in rows):
        tpr = [r["tp"] / max(r["tp"] + r["fn"], 1) for r in rows]
        fpr = [r["fp"] / max(r["fp"] + r["tn"], 1) for r in rows]
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.plot(fpr, tpr, marker="o")
        ax.plot([0, 1], [0, 1], linestyle="--", linewidth=0.8)
        ax.set_xlabel("false positive rate")
        ax.set_ylabel("true positive rate")
        ax.set_title("ROC curve")
        path = os.path.join(out_dir, "roc_curve.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(path)

    fig, ax = plt.subplots(figsize=(6, 5))
    ax.plot(thr, prec, label="precision")
    ax.plot(thr, rec, label="recall")
    ax.plot(thr, f1, label="f1")
    ax.set_xlabel("decision threshold")
    ax.set_ylabel("metric")
    ax.set_title("metrics vs threshold")
    ax.legend()
    path = os.path.join(out_dir, "threshold_metrics.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    written.append(path)
    return written
