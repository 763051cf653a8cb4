"""BPE tokenizer tests: python semantics, native == python, merge derivation."""

import numpy as np
import pytest

from mila_tpu.data.bpe import BPETokenizer, derive_merges


def make_toy():
    """256 bytes + merges building ' the' the BPE way."""
    extra = [b"th", b"he", b"the", b" the", b"ab", b"abab"]
    return BPETokenizer.byte_fallback(extra)


class TestPythonBPE:
    def test_roundtrip_ascii(self):
        tok = make_toy()
        for s in ["the theatre', she said", "a b  c\n\ttabs", "1234 5,6!", ""]:
            ids = tok.encode(s, use_native=False)
            assert tok.decode(ids) == s

    def test_merges_applied_in_rank_order(self):
        tok = make_toy()
        ids = tok.encode("the", use_native=False)
        # th+e? merges: th(rank0), he(1), the(2 from th+e)... derive_merges
        # builds (t,h)->th, (h,e)->he, (th,e)->the, (space,the)->' the'
        assert tok.decode(ids) == "the"
        assert len(ids) == 1 and tok.vocab[int(ids[0])] == b"the"

    def test_leading_space_attaches(self):
        tok = make_toy()
        ids = tok.encode("of the", use_native=False)
        toks = [tok.vocab[int(i)] for i in ids]
        assert b" the" in toks

    def test_pretoken_boundaries_stop_merges(self):
        tok = make_toy()
        # "ab ab": space splits pre-tokens; 'abab' merge cannot cross.
        ids = tok.encode("abab", use_native=False)
        assert [tok.vocab[int(i)] for i in ids] == [b"abab"]
        ids2 = tok.encode("ab ab", use_native=False)
        assert b"abab" not in [tok.vocab[int(i)] for i in ids2]

    def test_contractions(self):
        tok = BPETokenizer.byte_fallback()
        ids = tok.encode("it's", use_native=False)
        assert tok.decode(ids) == "it's"

    def test_utf8_roundtrip(self):
        tok = BPETokenizer.byte_fallback()
        s = "héllo wörld — ελληνικά 日本語"
        assert tok.decode(tok.encode(s, use_native=False)) == s

    def test_unknown_byte_raises(self):
        vocab = [bytes([b]) for b in range(255)]  # byte 255 missing
        tok = BPETokenizer(vocab)
        with pytest.raises(ValueError, match="not in vocab"):
            tok._encode_py(bytes([255]))


class TestDeriveMerges:
    def test_derives_creation_order(self):
        vocab = [bytes([b]) for b in range(256)] + [b"ab", b"cd", b"abcd"]
        triples = derive_merges(vocab)
        assert (ord("a"), ord("b"), 256) in triples
        assert (ord("c"), ord("d"), 257) in triples
        assert (256, 257, 258) in triples
        # ranks follow vocab id order
        ids = [m for _, _, m in triples]
        assert ids == sorted(ids)

    def test_explicit_pairs_resolve_merged_id(self):
        vocab = [bytes([b]) for b in range(256)] + [b"ab"]
        tok = BPETokenizer(vocab, merges=[(ord("a"), ord("b"))])
        assert tok.merges == [(ord("a"), ord("b"), 256)]


class TestNativeBPE:
    @pytest.fixture(scope="class")
    def tok(self):
        t = make_toy()
        if t._native_handle is None:
            pytest.skip("native BPE unavailable")
        return t

    def test_native_matches_python(self, tok):
        rng = np.random.default_rng(0)
        samples = [
            "the theatre of the absurd, she'll say: 'we've 123 items!'",
            "  leading and trailing  ",
            "abab ab the\nthe",
            "".join(chr(rng.integers(32, 127)) for _ in range(500)),
            "mixed üñíçödé and ascii 42",
        ]
        for s in samples:
            nat = tok.encode(s, use_native=True)
            py = tok.encode(s, use_native=False)
            np.testing.assert_array_equal(nat, py)

    def test_native_roundtrip(self, tok):
        s = "the quick brown fox's 99 bottles"
        assert tok.decode(tok.encode(s, use_native=True)) == s
