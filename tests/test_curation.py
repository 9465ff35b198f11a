"""Corpus curation runner: stage composition, invariants, determinism."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from timberline_spark.curation import curate_docs, run_curation

from .conftest import SF_TINY


def test_curation_runner_end_to_end(spark):
    out = tempfile.mkdtemp(prefix="tl_cur_")
    try:
        m = run_curation(spark, SF_TINY, out, run_id="t1")
        # funnel is monotone
        assert (
            m["n_input"]
            >= m["n_pass_quality"]
            >= m["n_after_dedup"]
            >= m["n_curated"]
            > 0
        )
        df = spark.read.parquet(f"{out}/curated_docs")
        assert df.count() == m["n_curated"]
        rows = df.collect()
        # every survivor is packed, offsets within budget
        assert all(r.pack_id is not None for r in rows)
        assert all(0 <= r.offset_in_pack < 256 for r in rows)
        assert len({r.pack_id for r in rows}) == m["n_packs"]
        assert sum(r.n_tokens for r in rows) == m["n_tokens_curated"]
        # metrics JSON written
        import json

        with open(f"{out}/curation_t1.json") as f:
            assert json.load(f)["n_curated"] == m["n_curated"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_curation_tags_agree_with_standalone_operators(spark):
    """The runner's per-doc tags must match the independently oracled
    standalone operators it composes."""
    from timberline_spark.extras import textfns as tf

    tagged = curate_docs(spark, SF_TINY)
    quota_ids = {r.doc_id for r in tf.doc_quota_sample(spark, SF_TINY).collect()}
    got_quota = {r.doc_id for r in tagged.filter("pass_quota").collect()}
    assert got_quota == quota_ids
    # curated operator = quality AND keeper (no quota/repetition gate);
    # the runner's quality gate adds the repetition screen, so its
    # quality+keeper set is a subset of doc_curated's
    curated_ids = {r.doc_id for r in tf.doc_curated(spark, SF_TINY).collect()}
    got_qk = {
        r.doc_id for r in tagged.filter("pass_quality AND is_keeper").collect()
    }
    assert got_qk <= curated_ids


def test_curation_deterministic(spark):
    a = sorted(
        map(tuple, curate_docs(spark, SF_TINY).filter("survives").collect())
    )
    b = sorted(
        map(tuple, curate_docs(spark, SF_TINY).filter("survives").collect())
    )
    assert a == b
