"""Unit tests for stats / text / dedup / ann operators (small local data;
the DuckDB oracle gate in tools/check_correctness.py covers cross-engine
parity — these cover semantics and edge cases)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.ann import cosine_topk
from geomesa_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    with_minhash,
    with_simhash,
)
from geomesa_spark.operators.stats import run_stats_dsl
from geomesa_spark.operators.text import with_fingerprint, with_token_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d0", "the quick brown fox", "s0"),
        ("d1", "the quick brown fox", "s0"),        # exact dup of d0
        ("d2", "the quick brown fox jumps", "s0"),  # near dup
        ("d3", "completely different text here now", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string, source string")


class TestDedup:
    def test_exact_dedup_groups(self, docs):
        out = {r.text_hash: r for r in exact_dedup(docs).collect()}
        by_dups = sorted(r.n_dups for r in out.values())
        assert by_dups == [1, 1, 2]
        dup = [r for r in out.values() if r.n_dups == 2][0]
        assert dup.keep_key == "d0"

    def test_minhash_identical_docs_equal_sigs(self, docs):
        sigs = {r.doc_id: list(r.minhash) for r in with_minhash(docs).collect()}
        assert sigs["d0"] == sigs["d1"]
        assert sigs["d0"] != sigs["d3"]

    def test_lsh_finds_exact_dup_pair(self, docs):
        pairs = lsh_candidate_pairs(with_minhash(docs, shingle_k=1)).collect()
        got = {(r.key_a, r.key_b) for r in pairs}
        assert ("d0", "d1") in got
        assert ("d0", "d3") not in got

    def test_simhash_similar_docs_close(self, docs):
        s = {r.doc_id: r.simhash for r in with_simhash(docs).collect()}
        assert s["d0"] == s["d1"]
        ham = bin(s["d0"] ^ s["d2"]).count("1")
        ham_far = bin(s["d0"] ^ s["d3"]).count("1")
        assert ham < ham_far

    def test_jaccard_pairs_threshold(self, docs):
        pairs = ngram_jaccard_pairs(docs, block_col="source", threshold=0.5).collect()
        got = {(r.key_a, r.key_b): r.jaccard for r in pairs}
        assert got[("d0", "d1")] == 1.0
        assert got[("d0", "d2")] == pytest.approx(0.8)
        assert ("d0", "d3") not in got  # different block

    def test_jaccard_requires_block(self, docs):
        with pytest.raises(ValueError, match="block_col"):
            ngram_jaccard_pairs(docs)
        # the escape hatch still works for small ad-hoc sets
        n = ngram_jaccard_pairs(docs, allow_full_cartesian=True, threshold=0.99).count()
        assert n >= 1

    def test_lsh_hot_bucket_cap(self, spark):
        """A flood of near-identical docs must not go quadratic: over
        the cap, the hot bucket is dropped (and logged), in bounded
        time; disjoint cold docs are unaffected."""
        from pyspark.sql import functions as SF

        flood = spark.range(0, 5000).select(
            SF.format_string("hot-%05d", SF.col("id")).alias("doc_id"),
            SF.lit("same same same same").alias("text"),
        )
        cold = spark.createDataFrame(
            [("cold-a", "alpha beta gamma delta"), ("cold-b", "alpha beta gamma delta")],
            "doc_id string, text string",
        )
        sigs = with_minhash(flood.unionByName(cold), shingle_k=1)
        pairs = lsh_candidate_pairs(sigs, max_bucket=100).collect()
        got = {(r.key_a, r.key_b) for r in pairs}
        assert got == {("cold-a", "cold-b")}  # flood bucket dropped whole
        # uncapped on a small subset still pairs the flood docs
        small = with_minhash(flood.limit(10).unionByName(cold), shingle_k=1)
        n_uncapped = lsh_candidate_pairs(small, max_bucket=None).count()
        assert n_uncapped == 45 + 1


class TestText:
    def test_token_stats(self, docs):
        r = {x.doc_id: x for x in with_token_stats(docs).collect()}
        assert r["d0"].n_tokens == 4
        assert r["d0"].n_distinct_tokens == 4
        assert r["d0"].n_chars_calc == len("the quick brown fox")

    def test_fingerprint_matches_python(self, docs):
        r = {x.doc_id: x.fp for x in with_fingerprint(docs).collect()}
        expect = 0
        for ch in "the quick brown fox":
            expect = (expect * 31 + ord(ch)) % 1_000_000_007
        assert r["d0"] == expect


class TestStatsDsl:
    def test_dsl_components(self, spark):
        df = spark.createDataFrame(
            [(i, float(i % 10), f"k{i % 3}") for i in range(100)],
            "id long, v double, k string",
        )
        out = run_stats_dsl(df, "Count();MinMax(v);TopK(k,2);Histogram(v,5,0,10);GroupBy(k,Count())")
        assert out["Count()"].collect()[0]["count"] == 100
        mm = out["MinMax(v)"].collect()[0]
        assert (mm["min_v"], mm["max_v"]) == (0.0, 9.0)
        top = out["TopK(k,2)"].collect()
        assert len(top) == 2 and top[0]["k"] == "k0"
        hist = {r.bin: r.cnt for r in out["Histogram(v,5,0,10)"].collect()}
        assert sum(hist.values()) == 100
        gb = {r.k: r["count"] for r in out["GroupBy(k,Count())"].collect()}
        assert gb == {"k0": 34, "k1": 33, "k2": 33}

    def test_dsl_rejects_unknown(self, spark):
        df = spark.range(1)
        with pytest.raises(ValueError):
            run_stats_dsl(df, "Bogus(x)")


class TestAnn:
    def test_cosine_topk_matches_numpy(self, spark):
        rng = np.random.RandomState(7)
        vecs = rng.randn(30, 8).astype("float32")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(30)],
            "vec_id long, embedding array<float>",
        )
        got = cosine_topk(df, df.where(F.col("vec_id") == 0), k=3).collect()
        v = vecs.astype("float64")
        sims = v @ v[0] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
        order = [i for i in np.argsort(-np.round(sims, 6), kind="stable") if i != 0][:3]
        assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == order
