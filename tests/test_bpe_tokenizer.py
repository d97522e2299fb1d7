"""CLIP BPE tokenizer algorithm test with a synthetic merge table."""
import gzip

import numpy as np

from dynamicrafter_tpu.utils.tokenizer import CLIPTokenizer


def _write_vocab(path, merges):
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: synthetic\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
        # pad so the slice [1 : 49152-256-2+1] is harmless
        for _ in range(10):
            f.write("\n")


def test_bpe_merges_apply_in_rank_order(tmp_path):
    vocab = tmp_path / "vocab.txt.gz"
    merges = [("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o</w>")]
    _write_vocab(vocab, merges)
    tok = CLIPTokenizer(str(vocab))

    # full merge chain: hello -> one token
    ids = tok.encode("hello")
    hello_id = tok.encoder["hello</w>"]
    assert ids == [hello_id]

    # partial merges: "hell" -> "hell" exists? no "hell</w>" merge, so it
    # ends as [hel, l</w>]
    ids2 = tok.encode("hell")
    assert ids2 == [tok.encoder["hel"], tok.encoder["l</w>"]]

    # unknown word falls back to byte/char tokens
    ids3 = tok.encode("xy")
    assert ids3 == [tok.encoder["x"], tok.encoder["y</w>"]]


def test_call_shape_and_special_tokens(tmp_path):
    vocab = tmp_path / "vocab.txt.gz"
    _write_vocab(vocab, [("h", "e")])
    tok = CLIPTokenizer(str(vocab))
    out = tok(["hello world", ""])
    assert out.shape == (2, 77)
    assert out[0, 0] == tok.sot
    assert tok.eot in out[0]
    assert out[1, 0] == tok.sot and out[1, 1] == tok.eot
    # truncation: long text still ends with eot at position 76
    long = tok([" ".join(["word"] * 200)])
    assert long[0, -1] == tok.eot


def test_text_cleaning(tmp_path):
    vocab = tmp_path / "vocab.txt.gz"
    _write_vocab(vocab, [])
    tok = CLIPTokenizer(str(vocab))
    a = tok(["  Hello   WORLD "])
    b = tok(["hello world"])
    np.testing.assert_array_equal(a, b)
