"""Native C++ BPE kernel: exact equivalence with the python merge loop, and the
fallback path."""

import os
import random
import string

import pytest

from feed_forward_vqgan_clip_tpu.native import get_lib
from feed_forward_vqgan_clip_tpu.tokenizer.bpe import ClipTokenizer

MERGES = [
    "h e", "l l", "he ll", "hell o</w>", "w o", "r l", "wo rl", "worl d</w>",
    "a b", "ab c", "abc d", "c d</w>", "e f</w>", "ab e",
]


@pytest.fixture(scope="module")
def tokenizers():
    native = ClipTokenizer(merges=MERGES)
    if native._native is None:
        pytest.skip("native BPE unavailable (no g++)")
    os.environ["FFVC_DISABLE_NATIVE"] = "1"
    try:
        pure = ClipTokenizer(merges=MERGES)
        assert pure._native is None or True  # env var only affects fresh builds
        pure._native = None  # force python path
    finally:
        os.environ.pop("FFVC_DISABLE_NATIVE", None)
    return native, pure


class TestNativeBPE:
    def test_library_builds(self):
        assert get_lib() is not None

    def test_equivalence_on_known_words(self, tokenizers):
        native, pure = tokenizers
        for w in ("hello", "world", "abcd", "abe", "xyz", "a", "abcabc"):
            assert native.encode(w) == pure.encode(w), w

    def test_equivalence_fuzz(self, tokenizers):
        native, pure = tokenizers
        rng = random.Random(0)
        alphabet = "abcdefhlorw "
        for _ in range(300):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
            assert native.encode(s) == pure.encode(s), repr(s)

    def test_equivalence_unicode(self, tokenizers):
        native, pure = tokenizers
        for s in ("héllo wörld", "🐈 abc", "ab cd", string.punctuation):
            assert native.encode(s) == pure.encode(s), repr(s)

    def test_tokenize_same_output(self, tokenizers):
        native, pure = tokenizers
        import numpy as np

        a = native.tokenize(["hello world", "abcd ef"])
        b = pure.tokenize(["hello world", "abcd ef"])
        np.testing.assert_array_equal(a, b)

    def test_native_is_faster_on_cold_cache(self, tokenizers):
        import time

        native, pure = tokenizers
        rng = random.Random(1)
        words = ["".join(rng.choice("abcdefhlorw") for _ in range(12)) for _ in range(3000)]
        text = " ".join(words)

        native._id_cache.clear()
        t0 = time.perf_counter()
        native.encode(text)
        t_native = time.perf_counter() - t0

        pure._id_cache.clear()
        pure.cache = {k: v for k, v in list(pure.cache.items())[:2]}
        t0 = time.perf_counter()
        pure.encode(text)
        t_pure = time.perf_counter() - t0
        # informational bound: native must not be slower; typically it is much faster
        assert t_native <= t_pure * 1.2, (t_native, t_pure)
