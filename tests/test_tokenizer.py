"""CLIP BPE tokenizer: algorithm behavior with a tiny synthetic merge table."""

import gzip

import numpy as np
import pytest

from moca_tpu.models.tokenizer import (
    HashTokenizer, SimpleTokenizer, bytes_to_unicode, load_tokenizer,
)


@pytest.fixture(scope="module")
def tiny_bpe(tmp_path_factory):
    """Minimal merge table: enough merges to exercise the BPE loop."""
    path = tmp_path_factory.mktemp("bpe") / "vocab.txt.gz"
    merges = [
        "version header line",
        "c a",
        "t</w> x",  # unused
        "ca t</w>",
        "d o",
        "do g</w>",
    ]
    # pad to the expected merge count window (reader slices 1:49152-258+1)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges) + "\n")
    return str(path)


def test_bytes_to_unicode_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_simple_tokenizer_merges(tiny_bpe):
    tok = SimpleTokenizer(tiny_bpe)
    # "cat" merges c+a → ca, ca+t</w> → cat</w> (one token)
    ids = tok.encode("cat")
    assert len(ids) == 1
    assert tok.decoder[ids[0]] == "cat</w>"
    # "dog" → d+o → do, do+g</w> → dog</w>
    ids = tok.encode("dog")
    assert len(ids) == 1
    # unknown word falls back to char-level pieces
    ids = tok.encode("zz")
    assert len(ids) >= 1


def test_simple_tokenizer_framing(tiny_bpe):
    tok = SimpleTokenizer(tiny_bpe)
    out = tok(["cat dog", ""])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.sot
    assert tok.eot in out[0]
    # empty prompt = [SOT, EOT]
    assert out[1, 0] == tok.sot and out[1, 1] == tok.eot and out[1, 2] == 0


def test_simple_tokenizer_truncation(tiny_bpe):
    tok = SimpleTokenizer(tiny_bpe)
    out = tok("cat " * 200)
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eot  # truncated sequences keep the EOT


def test_missing_vocab_raises_and_fallback():
    with pytest.raises(FileNotFoundError):
        SimpleTokenizer("/nonexistent/vocab.gz")
    tok = load_tokenizer("/nonexistent/vocab.gz", allow_fallback=True)
    assert isinstance(tok, HashTokenizer)
    out = tok(["hello world"])
    assert out.shape == (1, 77) and out[0, 0] == tok.sot


def test_hash_tokenizer_deterministic():
    a = HashTokenizer()(["a cat"])
    b = HashTokenizer()(["a cat"])
    np.testing.assert_array_equal(a, b)


def test_known_clip_token_ids():
    """Published CLIP BPE tokenizations (openai/CLIP SimpleTokenizer with
    the real bpe_simple_vocab_16e6.txt.gz — widely reproduced ids for the
    README zero-shot prompts). The vocab file isn't in this image, so this
    runs only where MOCA_TPU_BPE_PATH points at the real table; it exists
    so the independent BPE implementation is pinned to ground truth the
    moment real weights/vocab land."""
    import os

    path = os.environ.get("MOCA_TPU_BPE_PATH")
    if not path or not os.path.exists(path):
        pytest.skip("real CLIP BPE vocab not on disk (MOCA_TPU_BPE_PATH)")
    tok = SimpleTokenizer(path)
    assert (tok.sot, tok.eot) == (49406, 49407)
    assert tok.encode("a diagram") == [320, 22697]
    assert tok.encode("a dog") == [320, 1929]
    assert tok.encode("a cat") == [320, 2368]
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    framed = tok(["a diagram"])
    assert framed[0, :4].tolist() == [49406, 320, 22697, 49407]
