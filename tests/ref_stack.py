"""Shared helpers for tests that import the LIVE reference PyTorch stack
from /root/reference (train-parity and held-out-WER-parity harnesses)."""

import sys
import types

REF = "/root/reference"


def stub_jiwer():
    """The reference's utils.metrics imports jiwer (absent here); provide
    a functional stand-in so the module imports. WER in the parity tests
    is computed by our own metrics on both sides anyway."""
    if "jiwer" in sys.modules:
        return
    mod = types.ModuleType("jiwer")

    def _dist(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (x != y)))
            prev = cur
        return prev[-1]

    mod.wer = lambda ref, hyp: _dist(ref.split(), hyp.split()) / max(
        len(ref.split()), 1)
    mod.cer = lambda ref, hyp: _dist(list(ref), list(hyp)) / max(len(ref), 1)
    sys.modules["jiwer"] = mod


def import_reference():
    """(RefTrainer, TurkishASRModel) from the live reference tree."""
    stub_jiwer()
    sys.path.insert(0, REF)
    try:
        from trainer.trainer import Trainer as RefTrainer
        from model.conformer import TurkishASRModel
    finally:
        sys.path.remove(REF)
    return RefTrainer, TurkishASRModel


def import_reference_beam():
    """(CTCBeamDecoder, KenLMModel) from the live reference decoding
    module (utils/decoding.py)."""
    stub_jiwer()
    sys.path.insert(0, REF)
    try:
        from utils.decoding import CTCBeamDecoder, KenLMModel
    finally:
        sys.path.remove(REF)
    return CTCBeamDecoder, KenLMModel


def duck_kenlm(RefKenLMModel, arpa_path):
    """A REAL instance of the reference KenLMModel class whose backend is
    our self-contained ArpaLanguageModel (the kenlm C++ package is not in
    the image). isinstance checks inside the reference's _get_lm_score
    dispatch (utils/decoding.py:298-307) pass, and its score/score_word
    methods run the reference's own code over an ARPA scorer whose
    score(text, bos, eos) API matches kenlm's (decode/lm.py)."""
    from turkish_asr_tpu.decode.lm import ArpaLanguageModel
    lm = RefKenLMModel.__new__(RefKenLMModel)
    lm.model = ArpaLanguageModel(arpa_path)
    lm.order = lm.model.order
    return lm
