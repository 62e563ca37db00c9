"""Tokenizer algorithm tests with a synthetic merge table (the real
bpe_simple_vocab_16e6.txt.gz is release data, fetched by download_weights;
golden-vector parity against clip.tokenize is exercised when it is present)."""

import os

import numpy as np
import pytest

from feed_forward_vqgan_clip_tpu.tokenizer.bpe import (
    CONTEXT_LENGTH,
    ClipTokenizer,
    bytes_to_unicode,
)

# A tiny merge table: enough structure to exercise merge ranking, end-of-word
# markers and multi-round merging.
MERGES = [
    "h e",
    "l l",
    "he ll",
    "o</w> !</w>",  # never applicable (different words) — rank noise
    "hell o</w>",
    "w o",
    "r l",
    "wo rl",
    "worl d</w>",
]


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer(merges=MERGES)


class TestBytesToUnicode:
    def test_bijective_over_all_bytes(self):
        m = bytes_to_unicode()
        assert len(m) == 256
        assert len(set(m.values())) == 256


class TestBPE:
    def test_merges_apply_in_rank_order(self, tok):
        # 'hello' -> h e l l o</w> -> he ll o</w> -> hell o</w> -> hello</w>
        assert tok.bpe("hello") == "hello</w>"
        assert tok.bpe("world") == "world</w>"

    def test_unknown_word_splits_to_chars(self, tok):
        assert tok.bpe("xyz") == "x y z</w>"

    def test_encode_decode_roundtrip(self, tok):
        for text in ("hello world", "abc xyz"):
            ids = tok.encode(text)
            assert tok.decode(ids) == text.lower()

    def test_decode_spaces_punctuation_like_clip(self, tok):
        # CLIP's SimpleTokenizer.decode is lossy: every word-piece's </w> becomes a
        # space, so punctuation is space-separated on the way back.
        ids = tok.encode("hello, world!")
        assert tok.decode(ids) == "hello , world !"

    def test_cleaning_lowercases_and_collapses_whitespace(self, tok):
        assert tok.encode("Hello   WORLD") == tok.encode("hello world")


class TestTokenize:
    def test_framing_and_padding(self, tok):
        arr = tok.tokenize(["hello"])
        assert arr.shape == (1, CONTEXT_LENGTH)
        assert arr[0, 0] == tok.sot
        body = tok.encode("hello")
        assert list(arr[0, 1 : 1 + len(body)]) == body
        assert arr[0, 1 + len(body)] == tok.eot
        assert (arr[0, 2 + len(body) :] == 0).all()

    def test_truncation_forces_eot(self, tok):
        long = " ".join(["hello"] * 200)
        arr = tok.tokenize([long], truncate=True)
        assert arr.shape == (1, CONTEXT_LENGTH)
        assert arr[0, -1] == tok.eot
        with pytest.raises(RuntimeError):
            tok.tokenize([long], truncate=False)

    def test_batch(self, tok):
        arr = tok.tokenize(["hello", "world", "hello world"])
        assert arr.shape == (3, CONTEXT_LENGTH)
        assert (arr[:, 0] == tok.sot).all()

    def test_string_input(self, tok):
        assert tok.tokenize("hello").shape == (1, CONTEXT_LENGTH)

    def test_eot_has_max_token_id(self, tok):
        # CLIP's text pooling relies on argmax(tokens) == eot position
        arr = tok.tokenize(["hello world"])
        assert int(np.argmax(arr[0])) == int(np.where(arr[0] == tok.eot)[0][0])


@pytest.mark.skipif(
    not (os.environ.get("FFVC_BPE_PATH") or os.path.exists("bpe_simple_vocab_16e6.txt.gz")),
    reason="real CLIP merge table not available (zero-egress environment)",
)
class TestRealVocab:
    def test_vocab_size(self):
        t = ClipTokenizer()
        assert t.vocab_size == 49408
        assert t.sot == 49406 and t.eot == 49407

    def test_known_encoding(self):
        # golden vector: clip.tokenize("a photo of a cat") body
        t = ClipTokenizer()
        assert t.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]


class TestTextFix:
    """Mini-ftfy (tokenizer/text_fix.py): the fix_text subset CLIP's
    basic_clean applies before BPE."""

    def test_classic_single_mojibake(self):
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        assert fix_text("cafÃ©") == "café"
        assert fix_text("SÃ£o Paulo") == "São Paulo"

    def test_double_mojibake_unwinds(self):
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        s = "café"
        once = s.encode("utf-8").decode("latin-1")
        twice = once.encode("utf-8").decode("latin-1")
        assert fix_text(twice) == s

    def test_curly_quotes_and_c1(self):
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        assert fix_text("doesn’t") == "doesn't"
        # raw C1 0x92 is windows-1252 right-single-quote, then uncurled
        assert fix_text("doesn\x92t") == "doesn't"
        # the cp1252-mojibake form of the curly apostrophe
        assert fix_text("doesnâ€™t") == "doesn't"

    def test_width_fold_nfc_and_controls(self):
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        assert fix_text("ＡＢＣ") == "ABC"
        assert fix_text("é") == "é"  # NFC composes
        assert fix_text("a\x00b\x1b[31mc") == "abc"
        assert fix_text("a\r\nb\rc") == "a\nb\nc"

    def test_clean_text_untouched(self):
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        for s in ("a photo of a dog", "château én forêt", "русский текст", "日本語"):
            assert fix_text(s) == s

    def test_tokenizer_clean_applies_fix(self):
        from feed_forward_vqgan_clip_tpu.tokenizer.bpe import _clean

        assert _clean("DoesnÃ¢â‚¬â„¢t  Matter") == "doesn't matter"

    def test_byte_a0_restoration(self):
        # cp1252 decodes a 0xA0 continuation byte as NBSP, which web pipelines
        # flatten to a plain space; the repair puts 0xA0 back before decoding
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        assert fix_text("voilÃ !") == "voilà!"  # à = C3 A0
        # mid-string: "déjà vu" mangles to "dÃ©jÃ\xa0 vu"; NBSP flattened to a
        # space leaves "dÃ©jÃ  vu" — only the continuation-position space is
        # restored, the real word gap survives
        s = "déjà vu".encode("utf-8").decode("cp1252").replace("\xa0", " ")
        assert s == "dÃ©jÃ  vu"
        assert fix_text(s) == "déjà vu"

    def test_lossy_sequence_replacement(self):
        # a lossy charset decode that SUB'd (0x1A) one continuation byte:
        # the whole broken sequence becomes U+FFFD instead of killing the fix
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        # "don’t": ’ = E2 80 99; mis-decoded with the 99 byte lost to SUB
        assert fix_text("donâ€\x1at") == "don�t"
        # the surrounding (intact) mojibake still repairs in the same pass
        assert fix_text("cafÃ© donâ€\x1at") == "café don�t"

    def test_surrogate_repair(self):
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        # leaked UTF-16 pair recombines into the astral char (😀 = U+1F600)
        assert fix_text("nice \ud83d\ude00!") == "nice 😀!"
        # lone surrogate becomes U+FFFD
        assert fix_text("bad\ud800x") == "bad�x"
        # astral chars bound the repairable spans — mojibake next to an emoji
        # still repairs (segmented, ftfy-style) instead of aborting
        assert fix_text("cafÃ© 😀") == "café 😀"
        assert fix_text("cafÃ© 😀 donâ€™t") == "café 😀 don't"

    def test_multi_pass_repair_with_over_ff_intermediates(self):
        # Regression (round-5 advisor): a first repair pass can introduce
        # chars >0xFF (U+FFFD from lossy replacement, a decoded astral char)
        # while residual double-mojibake keeps the loop alive; pass 2 used to
        # raise an uncaught UnicodeEncodeError because spans were segmented
        # only once. Spans are now re-segmented every pass.
        from feed_forward_vqgan_clip_tpu.tokenizer.text_fix import fix_text

        # double-mojibake é next to a SUB-lossy sequence: pass 1 yields
        # "Ã© don�t" (U+FFFD is unencodable) and pass 2 must still unwind Ã©
        assert fix_text("Ã\x83Â© donâ€\x1at") == "é don�t"
        # mojibake'd emoji (decodes to astral on pass 1) + double-mojibake é
        assert fix_text("ð\x9f\x98\x80 Ã\x83Â©") == "😀 é"
