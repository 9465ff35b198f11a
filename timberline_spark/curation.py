"""Corpus curation runner: the document operators composed into one job.

The training-data extras (`extras/textfns.py`, `extras/dedup.py`) exist as
independently oracled queries; this module chains them the way a pretraining
data pipeline actually runs them — one pass per stage, every stage a
building block that is already driver-oracle-checked on its own:

    documents
      -> quality/lang/repetition signals        (scan-only projections)
      -> curation gate                          (filter)
      -> exact-dedup keepers                    (one hash-agg on norm text)
      -> stratified quota sample                (hash filter, shuffle-free)
      -> greedy sequence packing                (one shuffle by shard)
      -> curated_docs parquet + metrics JSON

Scale shape: two wide shuffles total (dedup keeper groupBy, packing
repartition+window); everything else rides the scan. Per-stage row counts
are collected from ONE count aggregate over a frame that tags each
document with how far it survived — no per-stage count jobs (each would
re-run the chain; the reference's per-stage Prometheus counters,
log-ingestor/internal/handlers/stream.go:108-158, are the model).

Run: ``python -m timberline_spark.curation --sf-dir ... --out ... --run-id r1``
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extras.textfns import (
    CURATE_MAX_PUNCT_RATIO,
    CURATE_MAX_TOKENS,
    CURATE_MIN_TOKENS,
    LANG_STOPWORD_MIN_RATIO,
    PACK_SHARDS,
    PACK_TOKEN_BUDGET,
    PUNCT_RE,
    QUOTA_DEFAULT_PCT,
    QUOTA_OVERRIDES,
    STOPWORD_RE,
    _tokens,
)

# repetition gates (Gopher-style; loose defaults that only drop degenerate
# boilerplate, not ordinary prose)
CURATE_MAX_DUP_TOKEN_FRAC = 0.95
CURATE_MAX_TOP_BIGRAM_FRAC = 0.90


def curate_docs(
    spark: SparkSession,
    sf_dir: str,
    default_pct: int = QUOTA_DEFAULT_PCT,
    overrides: dict[str, int] | None = None,
    budget: int = PACK_TOKEN_BUDGET,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """One frame per input document, tagged with its curation fate.

    Columns: doc_id, source, n_tokens, plus the booleans pass_quality,
    is_keeper, pass_quota — a doc survives when all three hold. Survivors
    additionally carry shard/pack_id/offset_in_pack (null otherwise).
    The single tagged frame is what lets the runner report per-stage
    counts from one aggregate instead of one job per stage.
    """
    from pyspark.sql import Window

    from .extras import xhash as xh

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = df.select("doc_id", "source", "text", _tokens(F.col("text")).alias("toks"))
    n_tok = F.size("toks").cast("long")
    n_stop = (
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(STOPWORD_RE), 0))
        .cast("long")
    )
    n_punct = (
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(PUNCT_RE), 0))
        .cast("long")
    )
    dup_frac = F.when(
        n_tok > 0,
        (n_tok - F.size(F.array_distinct("toks")).cast("long")) / n_tok,
    )
    scored = s1.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        F.regexp_replace(F.trim(F.lower(F.col("text"))), "[ ]+", " ").alias(
            "norm_text"
        ),
        (
            (n_tok > 0)
            & (n_stop.cast("double") / n_tok.cast("double") >= LANG_STOPWORD_MIN_RATIO)
            & (n_tok >= CURATE_MIN_TOKENS)
            & (n_tok <= CURATE_MAX_TOKENS)
            & (
                n_punct / F.nullif(F.length("text").cast("double"), F.lit(0.0))
                <= CURATE_MAX_PUNCT_RATIO
            )
            & (F.coalesce(dup_frac <= CURATE_MAX_DUP_TOKEN_FRAC, F.lit(False)))
        ).alias("pass_quality"),
    )
    keepers = scored.groupBy("norm_text").agg(F.min("doc_id").alias("keeper_id"))
    tagged = (
        scored.join(keepers, "norm_text")
        .withColumn("is_keeper", F.col("doc_id") == F.col("keeper_id"))
        .drop("norm_text", "keeper_id")
    )
    ov = QUOTA_OVERRIDES if overrides is None else overrides
    rate = F.lit(int(default_pct))
    for src, pct in sorted(ov.items()):
        rate = F.when(F.col("source") == src, F.lit(int(pct))).otherwise(rate)
    bucket = xh.mix32(xh.char_hash(F.col("doc_id").cast("string"))) % 100
    tagged = tagged.withColumn("pass_quota", bucket < rate)
    survives = F.col("pass_quality") & F.col("is_keeper") & F.col("pass_quota")
    tagged = tagged.withColumn("survives", survives)

    # pack only the survivors; join the assignment back onto the tagged
    # frame so non-survivors keep null pack columns
    surv = tagged.filter("survives").select("doc_id", "n_tokens")
    shard = (xh.mix32(xh.char_hash(F.col("doc_id").cast("string"))) % shards).cast(
        "long"
    )
    base = surv.select("doc_id", shard.alias("shard"), "n_tokens")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    packed = base.select(
        "doc_id",
        "shard",
        cum.alias("cum_before"),
    ).select(
        "doc_id",
        "shard",
        (F.col("shard") * 1_000_000 + F.floor(F.col("cum_before") / budget)).alias(
            "pack_id"
        ),
        (F.col("cum_before") % budget).alias("offset_in_pack"),
    )
    return tagged.join(packed, "doc_id", "left")


def run_curation(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    run_id: str,
    **kwargs,
) -> dict:
    t0 = time.time()
    tagged = curate_docs(spark, sf_dir, **kwargs)
    (
        tagged.filter("survives")
        .select(
            "doc_id", "source", "n_tokens", "shard", "pack_id", "offset_in_pack"
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/curated_docs")
    )
    # one aggregate over the tagged frame = every stage count
    m = tagged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("pass_quality"), 1).otherwise(0)).alias("n_quality"),
        F.sum(
            F.when(F.col("pass_quality") & F.col("is_keeper"), 1).otherwise(0)
        ).alias("n_deduped"),
        F.sum(F.when(F.col("survives"), 1).otherwise(0)).alias("n_curated"),
        F.sum(F.when(F.col("survives"), F.col("n_tokens")).otherwise(0)).alias(
            "n_tokens_curated"
        ),
        F.count_distinct(F.when(F.col("survives"), F.col("pack_id"))).alias(
            "n_packs"
        ),
    ).collect()[0]
    metrics = {
        "run_id": run_id,
        "n_input": int(m.n_input),
        "n_pass_quality": int(m.n_quality),
        "n_after_dedup": int(m.n_deduped),
        "n_curated": int(m.n_curated),
        "n_tokens_curated": int(m.n_tokens_curated),
        "n_packs": int(m.n_packs),
        "elapsed_sec": round(time.time() - t0, 3),
    }
    with open(f"{out_dir}/curation_{run_id}.json", "w") as f:
        json.dump(metrics, f)
    return metrics


def main(argv=None):
    from .session import get_spark

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--quota-default-pct", type=int, default=QUOTA_DEFAULT_PCT)
    ap.add_argument("--pack-budget", type=int, default=PACK_TOKEN_BUDGET)
    ap.add_argument("--pack-shards", type=int, default=PACK_SHARDS)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)
    spark = get_spark("timberline_curation", cores=args.cores)
    metrics = run_curation(
        spark,
        args.sf_dir,
        args.out,
        args.run_id,
        default_pct=args.quota_default_pct,
        budget=args.pack_budget,
        shards=args.pack_shards,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
