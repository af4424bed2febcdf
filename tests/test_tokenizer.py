"""Token-exact parity of the JAX tokenizer vs the reference CLIP tokenizer.

The reference implementation (open_clip tokenizer) is loaded from
/root/reference at test time purely as an oracle; ftfy is stubbed out (identity)
since the corpus here is clean ASCII where ftfy is a no-op.
"""

import sys
import types

import numpy as np
import pytest

from clip_embeds_tpu.text.tokenizer import BPETokenizer, get_tokenizer

CORPUS = [
    "a photo of a cat",
    "A photo of a dog on the left of a table.",
    "an armchair to the right of a mug",
    "The quick brown fox jumps over 12 lazy dogs!!!",
    "it's a photo; isn't it?",
    "a photo of " + "very " * 100 + "long caption",
    "hello   world\twith\nweird   whitespace",
    "Ünïcodé çhāracters résumé naïve",
    "数字 and 中文 mixed with english",
    "emoji 🙂 test 🚀🚀",
    "",
    "punctuation-only !!! ??? ...",
    "a photo of a person under the bed",
    "An apple behind the laptop",
]


@pytest.fixture(scope="module")
def reference_tokenizer():
    import importlib.util

    if "ftfy" not in sys.modules:
        import importlib.machinery
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda t: t
        stub.__spec__ = importlib.machinery.ModuleSpec("ftfy", None)
        sys.modules["ftfy"] = stub
    path = "/root/reference/open_clip/src/open_clip/tokenizer.py"
    spec = importlib.util.spec_from_file_location("_ref_tokenizer", path)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference tokenizer unavailable: {exc}")
    return mod.SimpleTokenizer()


def test_vocab_layout():
    tok = get_tokenizer()
    assert tok.vocab_size == 49408
    assert tok.sot_token_id == 49406
    assert tok.eot_token_id == 49407


def test_encode_decode_roundtrip():
    tok = get_tokenizer()
    ids = tok.encode("a photo of a cat")
    assert tok.decode(ids).strip() == "a photo of a cat"


def test_parity_ids(reference_tokenizer):
    tok = get_tokenizer()
    for text in CORPUS:
        ours = tok.encode(text)
        theirs = reference_tokenizer.encode(text)
        assert ours == theirs, f"mismatch for {text!r}: {ours} vs {theirs}"


def test_parity_batched(reference_tokenizer):
    tok = get_tokenizer()
    ours = tok(CORPUS)
    theirs = reference_tokenizer(CORPUS).numpy().astype(np.int32)
    assert ours.shape == (len(CORPUS), 77)
    np.testing.assert_array_equal(ours, theirs)


def test_truncation_preserves_eot():
    tok = get_tokenizer()
    out = tok(["word " * 500])
    assert out.shape == (1, 77)
    assert out[0, -1] == tok.eot_token_id
    assert out[0, 0] == tok.sot_token_id


def test_custom_context_length():
    tok = BPETokenizer(context_length=32)
    out = tok(["a photo of a cat"])
    assert out.shape == (1, 32)
