"""Tests for the first-party SentencePiece unigram reader (utils/spm.py) and the T5
tokenizer fallback path (VERDICT.md missing #6: the image lacks sentencepiece)."""

import numpy as np
import pytest

from micro_diffusion_tpu.utils.spm import (
    TYPE_CONTROL,
    TYPE_NORMAL,
    TYPE_UNKNOWN,
    SentencePieceUnigram,
    T5SpmTokenizer,
    build_model_proto,
    read_model_proto,
)

# T5-style vocab: <pad>=0, </s>=1, <unk>=2, then pieces
PIECES = [
    ("<pad>", 0.0, TYPE_CONTROL),
    ("</s>", 0.0, TYPE_CONTROL),
    ("<unk>", 0.0, TYPE_UNKNOWN),
    ("▁", -4.0, TYPE_NORMAL),
    ("▁the", -1.0, TYPE_NORMAL),
    ("▁cat", -1.5, TYPE_NORMAL),
    ("▁ca", -3.0, TYPE_NORMAL),
    ("t", -2.0, TYPE_NORMAL),
    ("c", -3.5, TYPE_NORMAL),
    ("a", -3.5, TYPE_NORMAL),
    ("▁sat", -1.7, TYPE_NORMAL),
    ("s", -3.0, TYPE_NORMAL),
]


def test_proto_roundtrip():
    data = build_model_proto(PIECES)
    pieces = read_model_proto(data)
    assert pieces == [(p, pytest.approx(s), t) for p, s, t in PIECES]


def test_viterbi_picks_max_score_segmentation():
    sp = SentencePieceUnigram(list(PIECES))
    # '▁cat' (-1.5) beats '▁ca'+'t' (-5.0) and '▁'+'c'+'a'+'t' (-13)
    assert sp.encode("cat") == [sp.piece_to_id["▁cat"]]
    ids = sp.encode("the cat sat")
    assert ids == [sp.piece_to_id["▁the"], sp.piece_to_id["▁cat"],
                   sp.piece_to_id["▁sat"]]


def test_unknown_character_fallback():
    sp = SentencePieceUnigram(list(PIECES))
    ids = sp.encode("cat!")
    assert ids == [sp.piece_to_id["▁cat"], sp.unk_id]


def test_normalization_collapses_whitespace():
    sp = SentencePieceUnigram(list(PIECES))
    assert sp.normalize("the   cat") == "▁the▁cat"
    assert sp.encode("  the \t cat ") == sp.encode("the cat")


def test_t5_tokenizer_surface(tmp_path):
    path = tmp_path / "spiece.model"
    path.write_bytes(build_model_proto(PIECES))
    tok = T5SpmTokenizer(str(path))
    out = tok(["the cat", "cat"], max_length=6)
    ids = out["input_ids"]
    mask = out["attention_mask"]
    assert ids.shape == (2, 6) and mask.shape == (2, 6)
    assert ids[0].tolist()[:3] == [4, 5, 1]  # ▁the ▁cat </s>
    assert ids[0].tolist()[3:] == [0, 0, 0]  # <pad>
    assert mask[0].tolist() == [1, 1, 1, 0, 0, 0]
    assert ids[1].tolist()[:2] == [5, 1]


def test_t5_truncation_keeps_eos(tmp_path):
    path = tmp_path / "spiece.model"
    path.write_bytes(build_model_proto(PIECES))
    tok = T5SpmTokenizer(str(path))
    out = tok(["the cat sat the cat sat"], max_length=4)
    ids = out["input_ids"][0].tolist()
    assert len(ids) == 4
    assert ids[-1] == 1  # EOS survives truncation
    assert out["attention_mask"][0].tolist() == [1, 1, 1, 1]


def test_universal_tokenizer_t5_fallback(tmp_path):
    """UniversalTokenizer routes to the first-party reader when the snapshot has
    only spiece.model."""
    from micro_diffusion_tpu.models.text_encoders import UniversalTokenizer

    (tmp_path / "spiece.model").write_bytes(build_model_proto(PIECES))
    tok = UniversalTokenizer("DeepFloyd/t5-v1_1-xxl", tokenizer_dir=str(tmp_path))
    out = tok.tokenize(["the cat"])
    assert out["input_ids"].shape == (1, 120)
    assert out["attention_mask"][0].sum() == 3  # ▁the ▁cat </s>
    assert out["input_ids"][0, :3].tolist() == [4, 5, 1]
