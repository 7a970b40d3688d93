"""Decoder factory — parity with create_decoder
(/root/reference/utils/decoding.py:409-444).

Methods: "greedy" | "beam" | "flashlight". The reference's "flashlight"
slot (its native high-performance decoder) maps to our on-device vectorized
beam search — see FlashlightDecoder's docstring for the rationale.
"""

import os

from turkish_asr_tpu.decode.greedy import GreedyDecoder
from turkish_asr_tpu.decode.beam import CTCBeamDecoder
from turkish_asr_tpu.decode.lm import KenLMModel


class DeviceBeamDecoder:
    """Batched on-device beam search wrapped in the decoder API.

    Optional on-device LM shallow fusion, two flavors:
    - ``lm_bias``: a (V+1, V) token-bigram log-prob matrix
      (decode/lm.token_bigram_matrix).
    - ``lm_tables``: (score, next_state, start_state) compiled from an
      ARPA file (decode/lm.build_arpa_fusion_tables) — exact any-order
      backoff fusion, the batched-throughput equivalent of the host
      KenLM-fused beam.
    """

    def __init__(self, tokenizer, beam_width=16, blank_id=0,
                 lm_bias=None, lm_weight=0.3, lm_tables=None,
                 lm_trie=None, lm_hash=None, word_bonus=0.5):
        import jax.numpy as jnp
        self.tokenizer = tokenizer
        self.beam_width = beam_width
        self.blank_id = blank_id
        # Device-resident once: re-uploading (S, V) tables per decode call
        # would re-transfer tens of MB for every batch.
        self.lm_bias = None if lm_bias is None else jnp.asarray(lm_bias)
        self.lm_weight = lm_weight
        if lm_tables is not None:
            self.lm_tables = (jnp.asarray(lm_tables[0]),
                              jnp.asarray(lm_tables[1]), int(lm_tables[2]))
        else:
            self.lm_tables = None
        # Trie-augmented fusion (char/subword tokenizers) — see
        # decode/lm.build_trie_fusion_tables.
        if lm_trie is not None:
            if "pnext" not in lm_trie:  # dicts built before round 4
                from turkish_asr_tpu.decode.lm import \
                    derive_fused_trie_advance
                pnext, wq = derive_fused_trie_advance(
                    lm_trie["ptrans"], lm_trie["wid"], lm_trie["tok_kind"])
                lm_trie = dict(lm_trie, pnext=pnext, wq=wq)
            self.lm_trie = {k: jnp.asarray(lm_trie[k]) for k in
                            ("score_w", "next_w", "pnext", "wq",
                             "tok_kind", "qwid")}
            self.lm_trie_start = int(lm_trie["start_h"])
        else:
            self.lm_trie = None
        # Production-scale hash fusion (100k+-word ARPAs) — see
        # decode/lm.build_hash_fusion_tables. The table size is the keys
        # array's static shape — no separate meta ints to mis-pair.
        if lm_hash is not None:
            self.lm_hash = {k: jnp.asarray(lm_hash[k]) for k in
                            ("keys", "vals", "pnext", "wq", "tok_kind",
                             "qwid", "start_ctx", "uniq_q", "qcol")
                            if k in lm_hash}
            self.lm_hash["unk_prob"] = jnp.asarray(
                lm_hash["unk_prob"], jnp.float32)
        else:
            self.lm_hash = None
        # Reference CTCBeamDecoder applies a final per-word insertion
        # bonus (beta, decoding.py:282-287); the device search returns all
        # W beams and the bonus reranks them host-side.
        self.word_bonus = word_bonus

    def decode(self, logits, length=None):
        import numpy as np
        texts = self.decode_batch(np.asarray(logits)[None], None if length is None else [length])
        return texts[0]

    def decode_batch(self, logits, lengths=None):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from turkish_asr_tpu.ops.beam_search import ctc_beam_search
        # log_softmax is idempotent, so raw logits and pre-normalized
        # log-probs are both accepted.
        x = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32), axis=-1)
        lens = None if lengths is None else jnp.asarray(lengths)
        kwargs = {}
        if self.lm_tables is not None:
            score_t, next_t, start = self.lm_tables
            kwargs = {"lm_tables": (score_t, next_t),
                      "lm_start_state": start,
                      "lm_weight": self.lm_weight}
        elif self.lm_trie is not None:
            kwargs = {"lm_trie": self.lm_trie,
                      "lm_start_state": self.lm_trie_start,
                      "lm_weight": self.lm_weight}
        elif self.lm_hash is not None:
            kwargs = {"lm_hash": self.lm_hash,
                      "lm_weight": self.lm_weight}
        elif self.lm_bias is not None:
            kwargs = {"lm_bias": self.lm_bias,
                      "lm_weight": self.lm_weight}
        # Cap the reconstructed-prefix buffer: no token buffer rides the
        # beam scan anymore (traceback links), so this only bounds the
        # backtrace output shape; realistic transcripts are far shorter
        # than T and overflow tokens are dropped (documented truncation).
        T = x.shape[1]
        kwargs["max_prefix_len"] = min(T, 512)
        if self.word_bonus != 0:
            ids, counts, scores = ctc_beam_search(
                x, lens, beam_width=self.beam_width,
                blank_id=self.blank_id, return_all_beams=True, **kwargs)
            ids = np.asarray(ids)
            counts = np.asarray(counts)
            scores = np.asarray(scores)
            out = []
            for i in range(ids.shape[0]):
                best_text, best_score = "", -np.inf
                for w in range(ids.shape[1]):
                    if scores[i, w] <= -1e29:
                        continue  # dead beam
                    text = self.tokenizer.decode(
                        ids[i, w, :counts[i, w]].tolist())
                    s = scores[i, w] + self.word_bonus * len(text.split())
                    if s > best_score:
                        best_score, best_text = s, text
                out.append(best_text)
            return out
        ids, counts = ctc_beam_search(x, lens, beam_width=self.beam_width,
                                      blank_id=self.blank_id, **kwargs)
        ids, counts = np.asarray(ids), np.asarray(counts)
        return [self.tokenizer.decode(ids[i, :counts[i]].tolist())
                for i in range(ids.shape[0])]


class FlashlightDecoder:
    """Name-parity class for the reference's FlashlightDecoder slot
    (/root/reference/utils/decoding.py:314-393).

    The reference's "flashlight" method is its *native high-performance
    decoder* (C++ LexiconFreeDecoder). In this framework the native
    high-performance decoder IS the on-device vectorized prefix beam
    search (ops/beam_search.py) — we never call flashlight-text, and we
    don't import-probe for it to pretend otherwise. With an LM the request
    routes through the LM-fused beam decoder, matching the reference's
    KenLM-fused flashlight configuration in capability."""

    def __init__(self, tokenizer, lexicon_path=None, lm_path=None,
                 beam_size=100, lm_weight=2.0, word_score=-1.0,
                 sil_score=0.0, beam_threshold=25.0):
        self.tokenizer = tokenizer
        lm = None
        if lm_path and os.path.exists(lm_path):
            try:
                lm = KenLMModel(lm_path)
            except Exception as e:  # noqa: BLE001 — e.g. binary .klm
                # without the kenlm package; degrade like create_decoder
                print(f"Warning: Could not load LM: {e}")
        if lm is not None:
            tables = None
            trie = None
            lm_ht = None
            vocab = getattr(tokenizer, "vocab_size", None)
            if vocab:
                from turkish_asr_tpu.decode.lm import (
                    build_arpa_fusion_tables, build_hash_fusion_tables,
                    build_trie_fusion_tables, tokenizer_is_word_granular)
                if tokenizer_is_word_granular(tokenizer, vocab):
                    tables = build_arpa_fusion_tables(lm, tokenizer, vocab)
                if tables is None:
                    trie = build_trie_fusion_tables(lm, tokenizer, vocab)
                if tables is None and trie is None:
                    # Dense tables over budget (production-scale ARPA):
                    # hash fusion, linear memory in the LM.
                    lm_ht = build_hash_fusion_tables(lm, tokenizer, vocab)
            if trie is not None:
                self._impl = DeviceBeamDecoder(tokenizer,
                                               beam_width=min(beam_size, 32),
                                               lm_trie=trie,
                                               lm_weight=lm_weight,
                                               word_bonus=word_score)
            elif lm_ht is not None:
                self._impl = DeviceBeamDecoder(tokenizer,
                                               beam_width=min(beam_size, 32),
                                               lm_hash=lm_ht,
                                               lm_weight=lm_weight,
                                               word_bonus=word_score)
            elif tables is not None:
                # Batched on-device beam with exact ARPA fusion — the
                # native high-performance LM-fused configuration.
                # word_score (reference default -1.0, an insertion
                # *penalty*) maps onto the device beam's per-word rerank
                # term so callers tuning it keep the same-sign length bias.
                self._impl = DeviceBeamDecoder(tokenizer,
                                               beam_width=min(beam_size, 32),
                                               lm_tables=tables,
                                               lm_weight=lm_weight,
                                               word_bonus=word_score)
            else:
                self._impl = CTCBeamDecoder(tokenizer, beam_width=beam_size,
                                            lm=lm, lm_weight=lm_weight)
        else:
            self._impl = DeviceBeamDecoder(tokenizer,
                                           beam_width=min(beam_size, 32),
                                           word_bonus=word_score)

    def decode(self, logits, length=None):
        return self._impl.decode(logits, length)

    def decode_batch(self, logits, lengths=None):
        return self._impl.decode_batch(logits, lengths)


def create_decoder(tokenizer, method="greedy", lm_path=None, beam_width=10,
                   lm_weight=0.3):
    """Factory: "greedy", "beam" (host prefix beam w/ optional LM fusion),
    or "flashlight" (the native-decoder slot -> on-device beam search)."""
    lm = None
    if lm_path and os.path.exists(lm_path):
        try:
            lm = KenLMModel(lm_path)
        except Exception as e:  # noqa: BLE001 — parity with reference
            print(f"Warning: Could not load LM: {e}")

    if method == "greedy":
        return GreedyDecoder(tokenizer)
    if method == "beam":
        return CTCBeamDecoder(tokenizer, beam_width=beam_width, lm=lm,
                              lm_weight=lm_weight)
    if method == "flashlight":
        return FlashlightDecoder(tokenizer, lm_path=lm_path,
                                 beam_size=beam_width, lm_weight=lm_weight)
    raise ValueError(f"Unknown decoder method: {method}")
