from turkish_asr_tpu.decode.greedy import GreedyDecoder, greedy_collapse_batch
from turkish_asr_tpu.decode.beam import CTCBeamDecoder, beam_search_batch
from turkish_asr_tpu.decode.lm import KenLMModel, NGramLanguageModel, ArpaLanguageModel
from turkish_asr_tpu.decode.factory import create_decoder, FlashlightDecoder

# Legacy aliases matching the reference export surface
# (/root/reference/utils/decoding.py:447-449).
CTCDecoder = CTCBeamDecoder

__all__ = [
    "GreedyDecoder",
    "greedy_collapse_batch",
    "CTCBeamDecoder",
    "beam_search_batch",
    "KenLMModel",
    "NGramLanguageModel",
    "ArpaLanguageModel",
    "create_decoder",
    "FlashlightDecoder",
    "CTCDecoder",
]
