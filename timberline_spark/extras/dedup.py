"""Deduplication families over the ``documents`` table.

Spark-first implementations of the near-dup toolbox a training-data pipeline
needs (the reference's online cosine-0.95 dedup —
``/root/reference/log-ingestor/internal/storage/milvus.go:354-409`` — is the
streaming ancestor of these batch operators):

- exact dedup: normalized-text hash groupBy (J2 batch semantics)
- n-gram Jaccard: token-shingle inverted index -> candidate pairs -> exact
  Jaccard (SQL-expressible; oracle-checked)
- MinHash + LSH: shingle -> K minhashes (crc32-based, JVM-side) -> B bands ->
  bucket join -> candidate pairs -> exact-Jaccard verify
- SimHash: 64-bit sign-aggregated token hashes, hamming-distance buckets
- embedding-cosine near-dup: see extras.similarity

All hashing is crc32/arithmetic (deterministic, reproducible in plain
Python for the pytest oracle; no rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textfns import TOKEN_RE

SHINGLE_K = 3
MINHASH_PERMS = 16
LSH_BANDS = 4  # 4 bands x 4 rows
MINHASH_P = 4_294_967_311  # prime > 2^32
COEFF_MOD = 1_073_741_789  # prime < 2^30: crc32 (< 2^32) * a stays below 2^63
JACCARD_THRESHOLD = 0.8

# deterministic per-permutation coefficients (Knuth-style multiplicative
# sequences — public-domain arithmetic, reproducible in the pytest oracle)
def _perm_coeffs(j: int) -> tuple[int, int]:
    a = (2_654_435_761 * (j + 1) + 104_729) % COEFF_MOD
    b = (40_503 * (j + 1) + 7_919) % COEFF_MOD
    return (a | 1), b  # odd a


def _norm_text(col):
    return F.regexp_replace(F.trim(F.lower(col)), "[ ]+", " ")


def _shingles(col):
    """Distinct K-token shingles of the normalized text."""
    toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)
    n = F.size(toks)
    # guard: sequence(1, 0) would generate a DESCENDING range in Spark
    sh = F.when(n >= SHINGLE_K, F.transform(
        F.sequence(F.lit(1), n - (SHINGLE_K - 1)),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh)


def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: groups + keeper + duplicate_count."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        df.withColumn("norm_text", _norm_text(F.col("text")))
        .groupBy("norm_text")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("duplicate_count"),
        )
        .select("keeper_doc_id", "duplicate_count")
    )


def doc_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Near-dup pairs by exact token-shingle Jaccard.

    Scale path: the candidate generation is an inverted-index self-join on
    shingle (shuffle on shingle key, combinable counts) — never an all-pairs
    cross join. Pairs sharing no shingle are never materialized.
    """
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .filter(F.col("n_sh") > 0)
    )
    exploded = docs.select("doc_id", "n_sh", F.explode("sh").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.round(
        F.col("n_inter")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        4,
    )
    return inter.select(
        "doc_a", "doc_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def _hash_lambda(a: int, b: int):
    # factory keeps the HOF lambda single-arg (pyspark inspects arity)
    return lambda x: (F.crc32(x) * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def _minhash_col(sh_col):
    """Array of MINHASH_PERMS min-hashes over the shingle set (crc32-based)."""
    mh = []
    for j in range(MINHASH_PERMS):
        a, b = _perm_coeffs(j)
        mh.append(F.array_min(F.transform(sh_col, _hash_lambda(a, b))))
    return F.array(*mh)


def doc_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    return docs.select("doc_id", _minhash_col(F.col("sh")).alias("minhash"))


def doc_minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band-bucket join then exact-Jaccard verify.

    Candidates come from B band buckets (rows/band = K/B); each band join is
    an equi-join on the concatenated band hash — the classic LSH recipe, all
    JVM-side. Verified pairs carry the exact shingle Jaccard.
    """
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", _shingles(F.col("text")).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .filter(F.col("n_sh") > 0)
        .withColumn("minhash", _minhash_col(F.col("sh")))
    )
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    bands = docs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at("minhash", band * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for band in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact-Jaccard verify on the candidates only
    sh = docs.select("doc_id", "sh", "n_sh")
    verified = (
        cand.join(sh.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a", "n_sh": "n_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b", "n_sh": "n_b"}), "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def doc_simhash(spark: SparkSession, sf_dir: str, bits: int = 32) -> DataFrame:
    """SimHash: per-token crc32, sign-aggregated per bit — pure JVM-side.

    For each bit position, sum (+1 / -1) over token hashes; the sign forms
    the fingerprint bit. Implemented with higher-order functions (no UDF).
    """
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(TOKEN_RE), 0)
    hashes = F.transform(toks, lambda t: F.crc32(t))
    def _vote_lambda(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), _vote_lambda(i))
        for i in range(bits)
    ]
    simhash = None
    for i, v in enumerate(bit_votes):
        term = F.when(v > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    return df.select("doc_id", simhash.alias("simhash"))


# ---- DuckDB oracles ---------------------------------------------------------


def oracle_exact_dedup() -> str:
    return """
SELECT MIN(doc_id) AS keeper_doc_id, COUNT(*) AS duplicate_count
FROM (SELECT doc_id, regexp_replace(trim(lower(text)), '[ ]+', ' ', 'g') AS norm_text
      FROM documents) t
GROUP BY norm_text"""


def oracle_jaccard_pairs(threshold: float = JACCARD_THRESHOLD) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
      range(1, greatest(len(toks) - {SHINGLE_K - 2}, 1)),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks
        FROM documents)
), e AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
  FROM sh WHERE len(shingles) > 0
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
         COUNT(*) AS n_inter
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1,2,3,4
)
SELECT doc_a, doc_b,
       ROUND(n_inter / CAST(n_a + n_b - n_inter AS DOUBLE), 4) AS jaccard
FROM inter
WHERE ROUND(n_inter / CAST(n_a + n_b - n_inter AS DOUBLE), 4) >= {threshold}"""
