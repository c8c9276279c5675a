"""BPE tokenizer ground truth: hand-computed merges, the rank-greedy /
sweep-in-rank-order equivalence the DuckDB oracle relies on, and
determinism of the trainer's tie-breaks."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fortissimo_spark.bpe import (  # noqa: E402
    encode_word, train_merges_from_counts,
)


def naive_encode(word, merges):
    """Independent reference implementation with DIFFERENT control flow:
    apply each merge once, in training order, as a single left-to-right
    sweep — the exact semantics the oracle's replace() chain implements.
    encode_word (rank-greedy, GPT-2 style) must agree on every input."""
    syms = list(word)
    for x, y in merges:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == x and syms[i + 1] == y:
                out.append(x + y)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_trainer_hand_computed():
    # counts: ab x2, abc x1 -> pairs (a,b):3 (b,c):1 -> merge (a,b);
    # then the only pair is (ab,c):1 -> merge (ab,c)
    merges = train_merges_from_counts([("ab", 2), ("abc", 1)], 5)
    assert merges == [("a", "b"), ("ab", "c")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("abcab", ranks) == ["abc", "ab"]
    assert encode_word("ab", ranks) == ["ab"]
    assert encode_word("ba", ranks) == ["b", "a"]
    assert encode_word("", ranks) == []
    assert encode_word("x", ranks) == ["x"]


def test_trainer_tie_breaks_deterministic():
    # (a,a) and (b,b) both count 2 -> lexicographically smaller pair wins
    merges = train_merges_from_counts([("aaa", 1), ("bbb", 1)], 1)
    assert merges == [("a", "a")]
    # identical-count words: pair counting is order-independent (dict sum)
    m1 = train_merges_from_counts([("cat", 3), ("car", 3)], 4)
    m2 = train_merges_from_counts([("car", 3), ("cat", 3)], 4)
    assert m1 == m2 and m1[0] == ("c", "a")


def test_overlapping_pair_single_sweep():
    # merge (a,a) on 'aaaa' -> leftmost-first non-overlapping: aa|aa;
    # on 'aaa' -> aa|a (the merged symbol never re-forms its own pair)
    merges = train_merges_from_counts([("aaaa", 10)], 1)
    assert merges == [("a", "a")]
    ranks = {("a", "a"): 0}
    assert encode_word("aaaa", ranks) == ["aa", "aa"]
    assert encode_word("aaa", ranks) == ["aa", "a"]
    assert encode_word("aaaaa", ranks) == ["aa", "aa", "a"]


def test_rank_greedy_equals_sweep_in_rank_order():
    """The equivalence the oracle depends on, fuzzed over adversarial
    alphabets (repeats, shared prefixes/suffixes, unicode)."""
    seed = [("streaming", 12), ("stream", 35), ("streams", 4),
            ("aaa", 9), ("aaaa", 7), ("banana", 11), ("bandana", 3),
            ("日本語deparser", 2), ("cafécafé", 5)]
    merges = train_merges_from_counts(seed, 60)
    ranks = {m: i for i, m in enumerate(merges)}
    words = [w for w, _ in seed] + [
        "streamingstream", "aaaaaaaaa", "bananabandana", "ssttrreeaamm",
        "xyz", "", "a", "日本café", "anana", "stream日本aaa"]
    for w in words:
        assert encode_word(w, ranks) == naive_encode(w, merges), w


def test_entry_seed_tokenizer_pinned():
    """The oracle-query tokenizer (seed-trained, data-independent) is
    stable: re-training yields identical merges, and seed words with
    enough mass collapse to single tokens while unseen words fall back."""
    import __spark_entry__ as entry
    again = train_merges_from_counts(entry._BPE_SEED_COUNTS, 40)
    assert again == entry._BPE_MERGES
    ranks = {m: i for i, m in enumerate(entry._BPE_MERGES)}
    assert encode_word("the", ranks) == ["the"]
    assert encode_word("join", ranks) == ["join"]
    # unseen word: falls back to chars/partial merges, never errors
    toks = encode_word("zzqq", ranks)
    assert "".join(toks) == "zzqq" and len(toks) >= 2
    # every encode round-trips its surface form
    for w in ("streaming", "windows", "batching", "тест", "café"):
        assert "".join(encode_word(w, ranks)) == w


# --- byte-level GPT-2-style tokenizer ------------------------------------

def test_gpt2_pretokenize_hand_fixture():
    """The pre-tokenizer against a hand-derived GPT-2-regex walkthrough:
    contractions split mid-word, a single literal space attaches to the
    following letter/number/punct run, multi-space runs keep their last
    space for the next token (the \\s+(?!\\S) branch), non-space
    whitespace never attaches, and ''.join always round-trips."""
    from fortissimo_spark.bpe import gpt2_pretokenize
    cases = [
        ("Hello world's test  123 café!!",
         ["Hello", " world", "'s", " test", " ", " 123", " café", "!!"]),
        ("", []),
        # only a LITERAL space attaches: \n stays its own token
        ("a\n\nb", ["a", "\n", "\n", "b"]),
        ("a\tb", ["a", "\t", "b"]),
        ("  lead", [" ", " lead"]),
        ("trail  ", ["trail", "  "]),
        ("x'll y't", ["x", "'ll", " y", "'t"]),
        ("don't", ["don", "'t"]),
        ("can't'", ["can", "'t", "'"]),
        ("'", ["'"]),
        ("日本語 text", ["日本語", " text"]),
        ("3.14", ["3", ".", "14"]),
        ("a   b", ["a", "  ", " b"]),
        ("price: $5", ["price", ":", " $", "5"]),
        # U+00A0 is not RE2 \s -> it lands in the punct-run class
        ("A B", ["A", " ", "B"]),
        ("it's isn't they're we've I'm you'll he'd",
         ["it", "'s", " isn", "'t", " they", "'re", " we", "'ve",
          " I", "'m", " you", "'ll", " he", "'d"]),
    ]
    for text, want in cases:
        got = gpt2_pretokenize(text)
        assert got == want, (text, got)
        assert "".join(got) == text


def test_byte_merges_hand_computed():
    """Byte-level training on a 2-word table, every round checked by
    hand: pair counts, the lexicographic tie-break, and rank-greedy
    apply over hex-pair symbols."""
    from fortissimo_spark.bpe import (
        byte_symbols, encode_symbols, train_merges_from_counts,
    )
    # " the"x5 = [20 74 68 65], "the"x3 = [74 68 65]
    # round 1: (74,68)=8 (68,65)=8 tie -> ("68","65") wins lexicographically
    # round 2: (74,6865)=8 beats (20,74)=5; round 3: (20,746865)=5
    merges = train_merges_from_counts([(" the", 5), ("the", 3)], 3,
                                      symbolize=byte_symbols)
    assert merges == [("68", "65"), ("74", "6865"), ("20", "746865")]
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_symbols(byte_symbols(" the"), ranks) == ["20746865"]
    assert encode_symbols(byte_symbols("the"), ranks) == ["746865"]
    assert encode_symbols(byte_symbols("thx"), ranks) == ["74", "68", "78"]
    # multi-byte utf-8 falls back to per-byte symbols cleanly
    assert encode_symbols(byte_symbols("é"), ranks) == ["C3", "A9"]


def test_entry_bytes_seed_tokenizer_pinned():
    """The byte-level oracle tokenizer is stable and its merges behave:
    high-mass seed pre-tokens collapse to one token, unseen bytes fall
    back, contractions are single tokens."""
    import __spark_entry__ as entry
    from fortissimo_spark.bpe import (
        byte_symbols, encode_symbols, train_merges_from_counts,
    )
    again = train_merges_from_counts(entry._BPE_BYTES_SEED_COUNTS, 160,
                                     symbolize=byte_symbols)
    assert again == entry._BPE_BYTES_MERGES
    ranks = {m: i for i, m in enumerate(entry._BPE_BYTES_MERGES)}

    def n_toks(t):
        return len(encode_symbols(byte_symbols(t), ranks))

    assert n_toks(" the") == 1
    assert n_toks("'s") == 1
    assert n_toks(" café") == 1  # seed word: fully merged
    assert n_toks("zzqq") >= 2   # unseen: byte fallback, never errors
