"""Corpus-quality operators: decontamination, repetition profiling,
PII scrubbing (operators/quality.py)."""

import pytest

from mentor_rdf_parsers_spark.operators.quality import (
    decontaminate_ngram,
    drop_contaminated,
    repetition_profile,
    scrub_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestDecontaminate:
    def test_flags_docs_sharing_ngram(self, spark):
        bench = _docs(spark, [("e1", "the quick brown fox jumps over the lazy dog")])
        docs = _docs(spark, [
            # contains the benchmark 3-gram "quick brown fox"
            ("d1", "i saw a quick brown fox today in the park"),
            ("d2", "completely unrelated text about spark pipelines"),
        ])
        hits = {r["id"]: r["n_hits"] for r in
                decontaminate_ngram(docs, bench, n=3).collect()}
        assert "d1" in hits and hits["d1"] >= 1
        assert "d2" not in hits

    def test_ngram_must_be_full_length(self, spark):
        bench = _docs(spark, [("e1", "alpha beta gamma delta")])
        # shares only a 2-gram, not a 4-gram
        docs = _docs(spark, [("d1", "alpha beta something else entirely here")])
        assert decontaminate_ngram(docs, bench, n=4).count() == 0

    def test_hit_count_is_distinct_ngrams(self, spark):
        bench = _docs(spark, [("e1", "a b c d e")])
        # contains benchmark 3-grams "a b c", "b c d", "c d e"
        docs = _docs(spark, [("d1", "x a b c d e y")])
        [row] = decontaminate_ngram(docs, bench, n=3).collect()
        assert row["n_hits"] == 3

    def test_drop_contaminated_filters(self, spark):
        bench = _docs(spark, [("e1", "one two three four")])
        docs = _docs(spark, [
            ("d1", "zzz one two three qqq"),
            ("d2", "nothing in common at all"),
        ])
        kept = [r["doc_id"] for r in
                drop_contaminated(docs, bench, n=3).collect()]
        assert kept == ["d2"]

    def test_normalization_shared_with_dedup(self, spark):
        # case/whitespace-insensitive, like every other shingle join
        bench = _docs(spark, [("e1", "Foo   BAR baz")])
        docs = _docs(spark, [("d1", "prefix foo bar BAZ suffix")])
        assert decontaminate_ngram(docs, bench, n=3).count() == 1


class TestRepetitionProfile:
    def test_all_unique_lines(self, spark):
        docs = _docs(spark, [("d1", "line one\nline two\nline three")])
        [r] = repetition_profile(docs).collect()
        assert r["n_lines"] == 3
        assert r["uniq_line_ratio"] == 1.0
        assert r["dup_line_char_ratio"] == 0.0
        assert r["max_line_repeat"] == 1

    def test_duplicate_lines_counted(self, spark):
        # "spam" ×3 (4 chars each), "ham" ×1 → dup chars = 2*4 of 3*4+3
        docs = _docs(spark, [("d1", "spam\nspam\nham\nspam")])
        [r] = repetition_profile(docs).collect()
        assert r["n_lines"] == 4
        assert r["max_line_repeat"] == 3
        assert r["uniq_line_ratio"] == pytest.approx(0.5)
        assert r["dup_line_char_ratio"] == pytest.approx(8 / 15, abs=1e-6)

    def test_empty_and_blank_docs_get_sentinels(self, spark):
        docs = _docs(spark, [("d1", ""), ("d2", "\n\n")])
        rows = {r["id"]: r for r in repetition_profile(docs).collect()}
        for d in ("d1", "d2"):
            assert rows[d]["n_lines"] == 0
            assert rows[d]["uniq_line_ratio"] == 1.0
            assert rows[d]["dup_line_char_ratio"] == 0.0

    def test_null_text_gets_sentinel(self, spark):
        # null text == zero-line doc: sentinel row, not silently dropped
        docs = _docs(spark, [("d1", None), ("d2", "a")])
        rows = {r["id"]: r for r in repetition_profile(docs).collect()}
        assert rows["d1"]["n_lines"] == 0
        assert rows["d1"]["uniq_line_ratio"] == 1.0
        assert rows["d1"]["dup_line_char_ratio"] == 0.0
        assert rows["d2"]["n_lines"] == 1

    def test_blank_lines_ignored(self, spark):
        docs = _docs(spark, [("d1", "a\n\n\na")])
        [r] = repetition_profile(docs).collect()
        assert r["n_lines"] == 2
        assert r["max_line_repeat"] == 2


class TestScrubPii:
    def test_email_redacted_and_counted(self, spark):
        docs = _docs(spark, [("d1", "mail me at alice.smith+x@corp.example.org now")])
        [r] = scrub_pii(docs).collect()
        assert r["clean_text"] == "mail me at <EMAIL> now"
        assert r["n_emails"] == 1 and r["n_ips"] == 0 and r["n_phones"] == 0

    def test_ip_and_phone(self, spark):
        docs = _docs(spark, [("d1", "srv 192.168.0.1 call 555-867-5309 end")])
        [r] = scrub_pii(docs).collect()
        assert r["clean_text"] == "srv <IP> call <PHONE> end"
        assert r["n_ips"] == 1 and r["n_phones"] == 1

    def test_email_wins_over_inner_patterns(self, spark):
        # digits inside an address are consumed by the email pass first
        docs = _docs(spark, [("d1", "contact 555-123-4567@example.com ok")])
        [r] = scrub_pii(docs).collect()
        assert r["n_emails"] == 1
        assert r["n_phones"] == 0
        assert "<EMAIL>" in r["clean_text"]

    def test_multiple_hits_counted(self, spark):
        docs = _docs(spark, [("d1", "a@b.co c@d.io 1.2.3.4 5.6.7.8")])
        [r] = scrub_pii(docs).collect()
        assert r["n_emails"] == 2 and r["n_ips"] == 2
        assert r["clean_text"] == "<EMAIL> <EMAIL> <IP> <IP>"

    def test_clean_doc_untouched(self, spark):
        docs = _docs(spark, [("d1", "nothing sensitive here")])
        [r] = scrub_pii(docs).collect()
        assert r["clean_text"] == "nothing sensitive here"
        assert r["n_emails"] == r["n_ips"] == r["n_phones"] == 0


class TestQualityGate:
    def test_gates_apply(self, spark):
        from mentor_rdf_parsers_spark.operators.quality import quality_gate

        docs = _docs(spark, [
            ("short", "a b"),                                # under min_tokens
            ("ok", "the cat sat on the mat and it is that"), # passes
            ("junk", "!!! ### $$$ %%% ^^^ &&& *** ((( )))"), # low quality
        ])
        rows = {r["id"]: r for r in
                quality_gate(docs, min_tokens=3, max_tokens=100,
                             min_quality=0.3).collect()}
        assert rows["short"]["keep"] is False
        assert rows["ok"]["keep"] is True
        assert rows["junk"]["keep"] is False
