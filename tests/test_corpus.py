"""Corpus-construction operator tests (operators/corpus.py):
stratified sampling, shard assignment, contamination, chunk dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "en", "a", "the cat sat on the mat and then the cat sat again"),
        (1, "en", "a", "a completely different sentence with no repeats at all"),
        (2, "en", "b", "short text"),
        (3, "de", "a", "der hund lief durch den park und der hund bellte laut"),
        (4, "de", "b", "x"),
        (5, "en", "a", "the cat sat on the mat and then the cat sat again"),
        (6, "en", "a", "more english words that fill one more stratum slot"),
        (7, "en", "a", "yet another english document in the same stratum"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )


class TestStratifiedSample:
    def test_quota_respected(self, docs):
        from geomesa_spark.operators.corpus import stratified_sample

        out = stratified_sample(docs, ["lang", "source"], quota=2)
        counts = out.groupBy("lang", "source").count().collect()
        assert all(r["count"] <= 2 for r in counts)
        # small strata survive whole
        assert out.where((F.col("lang") == "de") & (F.col("source") == "b")).count() == 1

    def test_stable_under_repartition(self, docs):
        from geomesa_spark.operators.corpus import stratified_sample

        a = {r.doc_id for r in stratified_sample(docs, ["lang"], 3).collect()}
        b = {
            r.doc_id
            for r in stratified_sample(docs.repartition(7), ["lang"], 3).collect()
        }
        assert a == b


class TestShardAssign:
    def test_deterministic_and_dense(self, docs):
        from geomesa_spark.operators.corpus import shard_assign

        a = sorted(
            (r.doc_id, r.shard, r.shard_pos) for r in shard_assign(docs, 4).collect()
        )
        b = sorted(
            (r.doc_id, r.shard, r.shard_pos)
            for r in shard_assign(docs.repartition(5), 4).collect()
        )
        assert a == b
        out = shard_assign(docs, 4)
        assert out.where((F.col("shard") < 0) | (F.col("shard") >= 4)).count() == 0
        # positions are 1..count within each shard
        agg = out.groupBy("shard").agg(
            F.count("*").alias("n"), F.max("shard_pos").alias("mx"), F.min("shard_pos").alias("mn")
        )
        assert all(r.mx == r.n and r.mn == 1 for r in agg.collect())


class TestContamination:
    def test_identical_doc_fully_contaminated(self, spark, docs):
        from geomesa_spark.operators.corpus import contamination

        bench = docs.where(F.col("doc_id") == 0)
        train = docs.where(F.col("doc_id").isin([5, 1]))
        got = {r.doc_id: r for r in contamination(train, bench, n=3).collect()}
        assert got[5].contamination == 1.0  # doc 5 == doc 0 verbatim
        assert got[1].contamination == 0.0  # disjoint vocabulary

    def test_short_docs_drop_out(self, spark, docs):
        from geomesa_spark.operators.corpus import contamination

        bench = docs.where(F.col("doc_id") == 0)
        out = contamination(docs.where(F.col("doc_id") == 4), bench, n=3)
        assert out.count() == 0  # one token → no 3-grams → no row

    def test_ngram_guard(self, spark):
        from geomesa_spark.operators.corpus import ngrams

        df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
        got = df.select(ngrams(F.col("text"), 3).alias("g")).collect()
        assert got[0].g == []
        assert got[1].g == ["a b c", "b c d"]


class TestVocabStats:
    def test_counts_and_doc_freq(self, spark):
        from geomesa_spark.operators.corpus import vocab_stats

        df = spark.createDataFrame(
            [(1, "a b a"), (2, "a c")], "doc_id long, text string"
        )
        got = {r.token: (r.n_occurrences, r.n_docs) for r in vocab_stats(df).collect()}
        assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}

    def test_topk_deterministic_ties(self, spark):
        from geomesa_spark.operators.corpus import vocab_stats

        df = spark.createDataFrame([(1, "b a c")], "doc_id long, text string")
        rows = vocab_stats(df, top_k=2).collect()
        # ties on count break by token ascending; rank is dense 1..k
        assert [(r.token, r.rank) for r in rows] == [("a", 1), ("b", 2)]


class TestChunkDedup:
    def test_repeated_chunk_removed(self, spark):
        from geomesa_spark.operators.corpus import chunk_dedup

        # two identical 4-token chunks then a distinct one
        text = "w x y z w x y z p q r s"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = chunk_dedup(df, chunk_tokens=4).collect()[0]
        assert r.dedup_text == "w x y z p q r s"
        assert r.n_kept_chunks == 2 and r.n_dropped_chunks == 1

    def test_no_repeats_identity(self, spark):
        from geomesa_spark.operators.corpus import chunk_dedup

        text = "a b c d e f g h i"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = chunk_dedup(df, chunk_tokens=4).collect()[0]
        assert r.dedup_text == text
        assert r.n_dropped_chunks == 0

    def test_order_preserved(self, spark):
        from geomesa_spark.operators.corpus import chunk_dedup

        # duplicate of chunk0 appears at positions 0, 2; chunk at 1 stays between
        text = "a a b b a a c c"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = chunk_dedup(df, chunk_tokens=2).collect()[0]
        assert r.dedup_text == "a a b b c c"

    def test_trailing_duplicate_counted(self, spark):
        from geomesa_spark.operators.corpus import chunk_dedup

        # chunks are [A, A]: the dropped TRAILING duplicate must count
        # (the old max(first_pos)+1 formula reported 0 dropped here)
        text = "w x y z w x y z"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = chunk_dedup(df, chunk_tokens=4).collect()[0]
        assert r.dedup_text == "w x y z"
        assert r.n_kept_chunks == 1 and r.n_dropped_chunks == 1


class TestPiiScrub:
    def test_all_kinds_scrubbed_and_counted(self, spark):
        from geomesa_spark.operators.text import scrub_pii

        df = spark.createDataFrame(
            [(1, "mail a.b@x.io or +1 555 123 4567 ip 10.0.0.1 card 4111111111111111"),
             (2, "clean text with number 42 and version 1.2")],
            "id int, text string",
        )
        rows = {r.id: r for r in scrub_pii(df).collect()}
        assert rows[1].scrubbed == "mail <EMAIL> or <PHONE> ip <IP> card <CARD>"
        assert (rows[1].n_email, rows[1].n_card, rows[1].n_phone, rows[1].n_ipv4) == (1, 1, 1, 1)
        # short digit runs and dotted versions survive
        assert rows[2].scrubbed == rows[2].text
        assert rows[2].n_email == rows[2].n_card == rows[2].n_phone == rows[2].n_ipv4 == 0

    def test_email_digits_not_half_eaten_as_phone(self, spark):
        from geomesa_spark.operators.text import scrub_pii

        df = spark.createDataFrame(
            [(1, "write 123 456 7890abc@mail.co please")], "id int, text string"
        )
        r = scrub_pii(df).collect()[0]
        # the address (which contains a phone-shaped prefix) scrubs as ONE email
        assert "<EMAIL>" in r.scrubbed and "@" not in r.scrubbed

    def test_kind_subset_and_validation(self, spark):
        import pytest as _pytest

        from geomesa_spark.operators.text import scrub_pii

        df = spark.createDataFrame([(1, "a@b.co ip 10.0.0.1")], "id int, text string")
        r = scrub_pii(df, kinds=("email",)).collect()[0]
        assert r.scrubbed == "<EMAIL> ip 10.0.0.1"
        assert not hasattr(r, "n_ipv4")
        with _pytest.raises(ValueError, match="unknown PII kinds"):
            scrub_pii(df, kinds=("ssn",))


class TestPackSequences:
    def test_contiguous_fill(self, spark):
        from geomesa_spark.operators.corpus import pack_sequences

        # token counts 4, 3, 2, 5 against budget 6:
        # cum_before 0,4,7,9 -> packs 0,0,1,1; offsets 0,4,1,3
        rows = [(i, "en", " ".join(["w"] * n)) for i, n in enumerate([4, 3, 2, 5])]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {
            r.doc_id: (r.n_tokens, r.pack_id, r.pack_offset)
            for r in pack_sequences(df, seq_tokens=6, by=["lang"]).collect()
        }
        assert got == {0: (4, 0, 0), 1: (3, 0, 4), 2: (2, 1, 1), 3: (5, 1, 3)}

    def test_groups_pack_independently(self, spark):
        from geomesa_spark.operators.corpus import pack_sequences

        rows = [(0, "en", "a b c"), (1, "de", "x y"), (2, "en", "d e"), (3, "de", "z")]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        got = {r.doc_id: (r.pack_id, r.pack_offset)
               for r in pack_sequences(df, seq_tokens=4, by=["lang"]).collect()}
        # en: cum 0,3 -> packs 0,0 offsets 0,3 ; de: cum 0,2 -> packs 0,0
        assert got == {0: (0, 0), 2: (0, 3), 1: (0, 0), 3: (0, 2)}

    def test_by_mandatory_and_stable(self, spark):
        import pytest as _pytest

        from geomesa_spark.operators.corpus import pack_sequences

        df = spark.createDataFrame([(1, "en", "a")], "doc_id long, lang string, text string")
        with _pytest.raises(ValueError, match="'by' is required"):
            pack_sequences(df, 8, by=[])
        big = spark.createDataFrame(
            [(i, "en", " ".join(["w"] * (i % 7 + 1))) for i in range(100)],
            "doc_id long, lang string, text string",
        )
        a = sorted(map(tuple, pack_sequences(big, 16, by=["lang"]).collect()))
        b = sorted(map(tuple, pack_sequences(big.repartition(9), 16, by=["lang"]).collect()))
        assert a == b


class TestPackSequencesProperty:
    def test_prefix_sum_invariants_random_docs(self, spark):
        """For ANY token-count sequence: pack_id == tokens_before //
        budget and pack_offset == tokens_before % budget, with
        tokens_before the running sum in doc order within the group."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from geomesa_spark.operators.corpus import pack_sequences

        @given(
            st.lists(st.integers(1, 40), min_size=1, max_size=30),
            st.integers(4, 64),
        )
        @settings(max_examples=10, deadline=None,
                  suppress_health_check=[HealthCheck.function_scoped_fixture])
        def check(counts, budget):
            rows = [(i, "g", " ".join(["w"] * n)) for i, n in enumerate(counts)]
            df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
            got = {
                r.doc_id: (r.n_tokens, r.pack_id, r.pack_offset)
                for r in pack_sequences(df, seq_tokens=budget, by=["lang"]).collect()
            }
            cum = 0
            for i, n in enumerate(counts):
                assert got[i] == (n, cum // budget, cum % budget), (i, counts, budget)
                cum += n

        check()
