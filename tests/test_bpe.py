"""BPE subword training/application (operators/bpe.py) pinned against a
pure-Python reference implementation of the classic algorithm (Sennrich et
al., arXiv:1508.07909) under the same deterministic tie-break."""

import pytest

SF = "/root/testdata/sf0.001"


def _py_char_syms(w):
    syms = list(w)
    syms[-1] += "▁"
    return syms


def _py_merge(syms, a, b):
    out, skip = [], False
    for i, s in enumerate(syms):
        if skip:
            skip = False
            continue
        if i < len(syms) - 1 and s == a and syms[i + 1] == b:
            out.append(a + b)
            skip = True
        else:
            out.append(s)
    return out


def _py_train(freqs, n_merges, min_freq):
    vocab = {w: _py_char_syms(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        cnt = {}
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + f
        if not cnt:
            break
        maxc = max(cnt.values())
        if maxc < min_freq:
            break
        best = min(k for k, v in cnt.items() if v == maxc)
        merges.append(best)
        vocab = {w: _py_merge(s, *best) for w, s in vocab.items()}
    return merges, vocab


class TestBpeTraining:
    def test_matches_python_reference_on_real_text(self, spark):
        """The distributed trainer must learn the IDENTICAL merge sequence
        and final segmentation as the sequential reference on sf0.001
        documents (deterministic tie-break: freq desc, pair asc)."""
        from polars_view_spark.catalog import load_tables
        from polars_view_spark.operators.bpe import train_bpe_merges, word_freq_table

        d = load_tables(spark, SF, "documents")["documents"]
        freqs = {
            r["word"]: r["freq"] for r in word_freq_table(d).collect()
        }
        want_merges, want_vocab = _py_train(freqs, n_merges=8, min_freq=2)
        got_merges, got_vocab_df = train_bpe_merges(d, n_merges=8, min_freq=2)
        assert got_merges == want_merges
        got_vocab = {r["word"]: list(r["syms"]) for r in got_vocab_df.collect()}
        assert got_vocab == {w: s for w, s in want_vocab.items()}

    def test_quote_and_backslash_symbols_merge(self, spark):
        """Words containing SQL-literal metacharacters must survive the
        merge-expression escaping."""
        from polars_view_spark.operators.bpe import train_bpe_merges

        corpus = spark.createDataFrame(
            [(1, "it's it's it's don't don't"), (2, r"a\b a\b a\b")],
            "doc_id long, text string",
        )
        merges, vocab = train_bpe_merges(corpus, n_merges=6, min_freq=2)
        segs = {r["word"]: list(r["syms"]) for r in vocab.collect()}
        # full collapse: every repeated word ends as one learned token
        assert segs["it's"] == ["it's▁"]
        assert segs[r"a\b"] == ["a\\b▁"]

    def test_min_freq_stops_early(self, spark):
        from polars_view_spark.operators.bpe import train_bpe_merges

        # disjoint character sets -> every adjacent pair occurs exactly once
        corpus = spark.createDataFrame(
            [(1, "abc def ghi")], "doc_id long, text string"
        )
        merges, _ = train_bpe_merges(corpus, n_merges=10, min_freq=2)
        assert merges == []


class TestBpeApply:
    def test_apply_and_count(self, spark):
        """Known words segment via the trained table; OOV words fall back
        to characters; empty docs count zero."""
        from polars_view_spark.operators.bpe import (
            apply_bpe,
            bpe_token_count,
            train_bpe_merges,
        )

        train = spark.createDataFrame(
            [(1, "low low low low low lower lower")], "doc_id long, text string"
        )
        merges, vocab = train_bpe_merges(train, n_merges=5, min_freq=2)
        test = spark.createDataFrame(
            [(10, "low lower"), (11, "zap"), (12, "   ")], "doc_id long, text string"
        )
        toks = {r["doc_id"]: list(r["bpe_tokens"]) for r in apply_bpe(test, vocab).collect()}
        assert toks[10][0] == "low▁"  # in-vocab word uses learned segmentation
        assert toks[11] == ["z", "a", "p▁"]  # OOV -> char fallback
        cnts = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(test, vocab).collect()}
        assert cnts[12] == 0 and cnts[11] == 3
        assert len(cnts) == 3

    def test_order_preserved_across_shuffle(self, spark):
        """bpe_tokens must be in original word order even though the
        groupBy shuffles rows (pos-sorted reassembly)."""
        from polars_view_spark.operators.bpe import apply_bpe, train_bpe_merges

        train = spark.createDataFrame(
            [(1, "aa bb aa bb aa bb")], "doc_id long, text string"
        )
        _, vocab = train_bpe_merges(train, n_merges=4, min_freq=2)
        test = spark.createDataFrame(
            [(1, " ".join(["aa", "bb"] * 50))], "doc_id long, text string"
        ).repartition(8)
        toks = apply_bpe(test, vocab).collect()[0]["bpe_tokens"]
        assert toks == ["aa▁", "bb▁"] * 50
