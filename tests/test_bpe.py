"""BPE merge discovery (stages/bpe.py): hand-computed merge sequences
pinning the left-to-right application rule, tie-breaks, early stop and
the vocabulary guard."""

import pyarrow as pa
import pytest
import ray.data as rd

from ocracle_ray.stages import bpe


def _ds(texts):
    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))


def test_merge_word_left_to_right():
    assert bpe._merge_word(("a", "a", "a"), "a", "a") == ("aa", "a")
    assert bpe._merge_word(("a", "b", "a", "b"), "a", "b") == ("ab", "ab")
    assert bpe._merge_word(("a", "a", "a", "a"), "a", "a") == ("aa", "aa")
    assert bpe._merge_word(("x",), "a", "b") == ("x",)


def test_merges_hand_computed(ray_session):
    # corpus: 'abab' x3, 'aab' x2 -> pairs: (a,b)=3*2+2=8, (b,a)=3,
    # (a,a)=2 -> merge 1 = (a,b) support 8
    counts = bpe.word_counts(_ds(["abab abab abab aab aab"]))
    assert counts == {"abab": 3, "aab": 2}
    df = bpe.bpe_merges(counts, 3)
    assert list(df["merged"]) == ["ab", "abab", "aab"]
    assert list(df["support"]) == [8, 3, 2]
    # round 2 state: abab -> (ab, ab) x3, aab -> (a, ab) x2
    # pairs: (ab,ab)=3, (a,ab)=2 -> merge 2 = abab; then (a,ab)=2


def test_tie_break_lexicographic(ray_session):
    # 'ba' x2 and 'cd' x2: pairs (b,a)=2, (c,d)=2 -> smallest pair wins
    df = bpe.bpe_merges({"ba": 2, "cd": 2}, 1)
    assert list(df["merged"]) == ["ba"]


def test_early_stop_when_no_pairs(ray_session):
    df = bpe.bpe_merges({"a": 5, "b": 3}, 10)
    assert len(df) == 0
    df2 = bpe.bpe_merges({"ab": 1}, 10)
    assert list(df2["merged"]) == ["ab"]  # one merge then no pairs


def test_vocab_guard_is_loud(ray_session, monkeypatch):
    monkeypatch.setattr(bpe, "MAX_BPE_VOCAB", 2)
    with pytest.raises(ValueError, match="MAX_BPE_VOCAB"):
        bpe.word_counts(_ds(["one two three four"]))


def test_oracle_replace_rule_matches_engine_on_overlaps(ray_session):
    """The double-space replace trick must merge back-to-back pairs
    exactly like the engine — DuckDB executes the generated SQL over a
    crafted corpus of the two hazard words."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "('abab abab aaaa'), ('aaaa aa')) t(text)"
    )
    sql = bpe.bpe_oracle_sql(4)
    got = con.sql(sql).df()
    counts = bpe.word_counts(_ds(["abab abab aaaa", "aaaa aa"]))
    want = bpe.bpe_merges(counts, 4)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


def test_bpe_apply_matches_training_final_state():
    """Applying the ranked merge table to the vocabulary reproduces the
    training loop's final word states (encode ≡ replay of training)."""
    from ocracle_ray.stages.bpe import _merge_word, bpe_apply, bpe_merges

    counts = {"aaaa": 3, "abab": 2, "banana": 5, "bandana": 1, "a": 4}
    merges = bpe_merges(counts, 6)
    got = bpe_apply(counts.keys(), merges)
    # replay: run the training transformation directly
    words = {tuple(w): n for w, n in counts.items()}
    for _, m in merges.iterrows():
        words = {_merge_word(s, m["lft"], m["rgt"]): n
                 for s, n in words.items()}
    want = {"".join(s): len(s) for s in words}
    assert got == want
    # the aaaa hazard: left-to-right non-overlap ('aa','aa' -> 2 tokens
    # after the first merge, never 3 overlapping pairs)
    aa_rank = merges[(merges["lft"] == "a") & (merges["rgt"] == "a")]
    if len(aa_rank):
        assert got["aaaa"] in (1, 2)


def test_bpe_encode_stats_unknown_token_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ocracle_ray.stages.bpe import bpe_encode_stats

    ds = rd.from_arrow(pa.table({
        "lang": pa.array(["en"], pa.string()),
        "text": pa.array(["hello world"], pa.string()),
    }))
    with pytest.raises(Exception, match="UNK rule"):
        bpe_encode_stats(ds, {"hello": 2})


def test_bpe_encode_stats_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocracle_ray.stages.bpe import bpe_encode_stats

    ds = rd.from_arrow(pa.table({
        "lang": pa.array(["en", "en", "de"], pa.string()),
        "text": pa.array(["ab ab cd", "ab", "cd cd"], pa.string()),
    })).repartition(2)
    out = bpe_encode_stats(ds, {"ab": 1, "cd": 2})
    out = out.set_index("lang")
    assert int(out.loc["en", "n_bpe_tokens"]) == 1 + 1 + 2 + 1
    assert int(out.loc["en", "n_word_chars"]) == 2 * 3 + 2
    assert int(out.loc["de", "n_bpe_tokens"]) == 4
    assert int(out.loc["de", "n_docs"]) == 1
