"""Turkish ASR inference CLI (TPU-native).

Flag/behavior parity with /root/reference/inference.py:151-189 (--audio,
--model, --beam_search, --beam_width, --n_mel_channels, --d_model,
--n_heads, --n_blocks; file-or-directory input), plus an additive ``--lm``
flag wiring KenLM/ARPA shallow fusion into beam search (the reference's
create_decoder supports an LM but its CLI never exposes it — SURVEY.md §2).

Pipeline: wav decode (host) -> jitted log-mel front-end -> jitted Conformer
forward at static bucketed lengths -> greedy collapse on device (or prefix
beam search). CPU-runnable: JAX falls back to the CPU backend when no TPU
is present.
"""

import argparse
import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from turkish_asr_tpu.audio.features import log_mel_spectrogram
from turkish_asr_tpu.audio.wavio import load_audio
from turkish_asr_tpu.data.dataset import bucket_table, DEFAULT_WAVEFORM_BUCKETS
from turkish_asr_tpu.models.conformer import ModelConfig, init_model, apply_model
from turkish_asr_tpu.decode.greedy import GreedyDecoder
from turkish_asr_tpu.decode.beam import CTCBeamDecoder
from turkish_asr_tpu.decode.lm import KenLMModel, NGramLanguageModel
from turkish_asr_tpu.train.checkpoint import load_checkpoint_file
# Re-export: the canonical definition lives in the package so server code
# never has to import from this top-level script (utils/errors.py).
from turkish_asr_tpu.utils.errors import TimestampsUnsupportedError  # noqa: F401


def _check_vocab_match(n_classes, tokenizer, model_path):
    """Fail loudly when the checkpoint's output vocabulary disagrees with
    the tokenizer: a checkpoint trained with the HF vocab decoded through
    the offline char fallback (or vice versa) silently produces garbage —
    the ids argmax/beam emit index a different symbol table. The reference
    never hits this because it always re-downloads the same hub tokenizer
    (/root/reference/data/tokenizer.py:10-11); our hermetic fallback makes
    the mismatch reachable, so it must be an error, not noise."""
    vs = getattr(tokenizer, "vocab_size", None)
    if vs is not None and int(vs) != int(n_classes):
        raise ValueError(
            f"Checkpoint/tokenizer vocabulary mismatch: {model_path} was "
            f"trained with n_classes={int(n_classes)} but the loaded "
            f"tokenizer ({getattr(tokenizer, 'backend', '?')}) has "
            f"vocab_size={int(vs)}. Decoding would emit garbage. Pass the "
            f"tokenizer the model was trained with via --tokenizer_path / "
            f"ASR_TOKENIZER_PATH.")


class ASRInference:
    """ASR inference pipeline.

    Usage:
        asr = ASRInference("model.ckpt")
        text = asr.transcribe("audio.wav")
    """

    def __init__(
        self,
        model_path,
        n_mel_channels=80,
        d_model=256,
        n_heads=4,
        n_blocks=8,
        use_beam_search=False,
        beam_width=10,
        lm_path=None,
        lm_fusion="auto",
        lm_weight=0.3,
        word_bonus=0.5,
        compute_dtype=jnp.bfloat16,
        use_pallas=True,
        tokenizer_path=None,
        trust_checkpoint=False,
        data_parallel=True,
    ):
        from turkish_asr_tpu.utils.runtime import enable_compilation_cache
        from turkish_asr_tpu.data.tokenizer import load_tokenizer
        enable_compilation_cache()
        self.tokenizer = load_tokenizer(tokenizer_path)

        if model_path.endswith(".pt") or model_path.endswith(".pth"):
            # Reference PyTorch checkpoint: weight-level import
            # (utils/torch_import.py) — reference-trained models run as-is.
            from turkish_asr_tpu.utils.torch_import import load_torch_checkpoint
            self.cfg, self.params, self.model_state = load_torch_checkpoint(
                model_path, n_heads=n_heads, allow_pickle=trust_checkpoint)
            _check_vocab_match(self.cfg.n_classes, self.tokenizer, model_path)
        else:
            ckpt = load_checkpoint_file(model_path)
            meta = ckpt.get("meta", {}) or {}
            mc = meta.get("model_config", {}) or {}
            self.cfg = ModelConfig(
                n_mels=int(mc.get("n_mels", n_mel_channels)),
                d_model=int(mc.get("d_model", d_model)),
                n_heads=int(mc.get("n_heads", n_heads)),
                n_blocks=int(mc.get("n_blocks", n_blocks)),
                n_classes=int(mc.get("n_classes", self.tokenizer.vocab_size)),
                dropout=0.0,
                masked_norm=bool(mc.get("masked_norm", False)),
            )
            if "n_classes" in mc:
                _check_vocab_match(int(mc["n_classes"]), self.tokenizer,
                                   model_path)
            params = ckpt.get("params") or {}
            if not params:
                raise ValueError(f"No params found in checkpoint: {model_path}")
            self.params = jax.tree.map(jnp.asarray, params)
            model_state = ckpt.get("model_state") or {}
            if model_state:
                self.model_state = jax.tree.map(jnp.asarray, model_state)
            else:
                _, self.model_state = init_model(jax.random.PRNGKey(0), self.cfg)
        self.compute_dtype = compute_dtype

        # Batched transcription shards the batch axis over all visible
        # chips (the BASELINE v5e-8 workload is data-parallel batched
        # greedy): params replicate on the mesh, XLA compiles the forward
        # SPMD, and per-chip throughput multiplies by the chip count.
        self._mesh = None
        if data_parallel and len(jax.devices()) > 1:
            from turkish_asr_tpu.parallel.mesh import (
                make_mesh, replicated_sharding)
            self._mesh = make_mesh(f"data={len(jax.devices())}")
            rep = replicated_sharding(self._mesh)
            self.params = jax.device_put(self.params, rep)
            self.model_state = jax.device_put(self.model_state, rep)

        cfg = self.cfg
        attn_kernel = None
        if use_pallas:
            from turkish_asr_tpu.ops.flash_attention import make_flash_attention
            # mesh-aware: on a multi-chip mesh the kernel routes through
            # shard_map over the data axis (a plain pallas_call under pjit
            # would make XLA gather its operands — see make_flash_attention).
            attn_kernel = make_flash_attention(mesh=self._mesh)

        @jax.jit
        def forward(params, model_state, waveform, length):
            feats, frame_lengths = log_mel_spectrogram(
                waveform[None, :], length[None], n_mels=cfg.n_mels)
            logits, _ = apply_model(params, model_state, feats, frame_lengths,
                                    cfg=cfg, train=False,
                                    compute_dtype=compute_dtype,
                                    attn_kernel=attn_kernel)
            return logits[0], frame_lengths[0] // 4

        self._forward = forward

        @jax.jit
        def forward_batch(params, model_state, waveforms, lengths):
            feats, frame_lengths = log_mel_spectrogram(
                waveforms, lengths, n_mels=cfg.n_mels)
            logits, _ = apply_model(params, model_state, feats, frame_lengths,
                                    cfg=cfg, train=False,
                                    compute_dtype=compute_dtype,
                                    attn_kernel=attn_kernel)
            return logits, frame_lengths // 4

        self._forward_batch = forward_batch

        self.use_beam_search = use_beam_search
        if use_beam_search:
            tables = None
            trie = None
            lm_ht = None
            lm = None
            if lm_path and not os.path.exists(lm_path):
                # Loud, not silent: a typo'd --lm / ASR_LM_PATH would
                # otherwise serve an unfused (and much slower host) beam
                # discoverable only by noticing WER/latency.
                raise FileNotFoundError(
                    f"LM file not found: {lm_path} (from --lm / "
                    f"ASR_LM_PATH) — beam search would silently run "
                    f"without LM fusion")
            if lm_path:
                lm = KenLMModel(lm_path)
                from turkish_asr_tpu.decode.lm import (
                    build_arpa_fusion_tables, build_hash_fusion_tables,
                    build_trie_fusion_tables, tokenizer_is_word_granular)
                # "auto": word-granular tokenizers take the word-state
                # tables; char/subword tokenizers take the trie-augmented
                # tables (build_trie_fusion_tables — host-beam parity with
                # partial-word tracking); LMs whose dense tables exceed the
                # entry budget (~3k+ words) take hash fusion
                # (build_hash_fusion_tables — linear memory in the ARPA);
                # only tokenizers none of the builders can model fall back
                # to the host beam.
                if lm_fusion in ("device", "auto"):
                    if tokenizer_is_word_granular(self.tokenizer,
                                                  cfg.n_classes):
                        tables = build_arpa_fusion_tables(
                            lm, self.tokenizer, cfg.n_classes)
                    if tables is None:
                        trie = build_trie_fusion_tables(
                            lm, self.tokenizer, cfg.n_classes)
                if lm_fusion == "hash" or (tables is None and trie is None
                                           and lm_fusion in ("device",
                                                             "auto")):
                    lm_ht = build_hash_fusion_tables(
                        lm, self.tokenizer, cfg.n_classes)
            if tables is not None or trie is not None or lm_ht is not None:
                # Exact ARPA backoff fusion inside the on-device beam scan
                # — the batched replacement for the reference's
                # per-extension host KenLM round trips
                # (/root/reference/utils/decoding.py:261-263).
                from turkish_asr_tpu.decode.factory import DeviceBeamDecoder
                self.decoder = DeviceBeamDecoder(self.tokenizer,
                                                 beam_width=beam_width,
                                                 lm_tables=tables,
                                                 lm_trie=trie,
                                                 lm_hash=lm_ht,
                                                 lm_weight=lm_weight,
                                                 word_bonus=word_bonus)
                if tables is not None:
                    print(f"Beam decoder: on-device ARPA fusion "
                          f"({tables[0].shape[0]} LM states)")
                elif trie is not None:
                    print(f"Beam decoder: on-device ARPA trie fusion "
                          f"({trie['score_w'].shape[0]} word states, "
                          f"{trie['trie_nodes']} trie nodes)")
                else:
                    print(f"Beam decoder: on-device ARPA hash fusion "
                          f"({lm_ht['n_words']} words, "
                          f"{lm_ht['table_size']} hash slots, "
                          f"{lm_ht['trie_nodes']} trie nodes)")
            else:
                if word_bonus < 0:
                    print("WARNING: the host beam preserves the reference "
                          "CTCBeamDecoder contract of applying word_bonus "
                          "only when > 0 — a negative insertion penalty is "
                          "IGNORED here (use --lm_fusion device/hash for "
                          "flashlight-style negative word scores).")
                self.decoder = CTCBeamDecoder(
                    self.tokenizer, beam_width=beam_width,
                    lm=lm if lm is not None else NGramLanguageModel(),
                    lm_weight=lm_weight, word_bonus=word_bonus)
        else:
            if lm_path:
                # Mirror the server's startup warning: an LM without beam
                # search is silently inert, which reads as "fusion active"
                # to the operator.
                print("WARNING: --lm/ASR_LM_PATH is set but beam search is "
                      "off — the LM is IGNORED on the greedy path (pass "
                      "--beam_search / USE_BEAM_SEARCH=true).")
            self.decoder = None
        self.greedy = GreedyDecoder(self.tokenizer)
        print(f"ASR ready on {jax.devices()[0].platform}")

    def _forward_padded(self, waveform):
        n = waveform.shape[0]
        S = bucket_table(n, DEFAULT_WAVEFORM_BUCKETS)
        padded = np.zeros((S,), dtype=np.float32)
        padded[: min(n, S)] = waveform[:S]
        logits, out_len = self._forward(
            self.params, self.model_state, jnp.asarray(padded),
            jnp.asarray(min(n, S), dtype=jnp.int32))
        return np.asarray(logits), int(out_len)

    def _logits(self, audio_path, chunk_seconds=28.0, overlap_seconds=2.0):
        """Model logits for a file; audio longer than the largest bucket is
        transcribed in overlapping chunks whose trimmed logits are
        concatenated (additive capability — the reference truncates nothing
        but also has no long-form story; SURVEY.md §5)."""
        waveform, sr = load_audio(audio_path)
        n = waveform.shape[0]
        max_bucket = DEFAULT_WAVEFORM_BUCKETS[-1]
        if n <= max_bucket:
            logits, out_len = self._forward_padded(waveform)
            return logits[:out_len], out_len

        chunk = int(chunk_seconds * sr)
        overlap = int(overlap_seconds * sr)
        step = chunk - overlap
        # post-subsample frame rate: hop 160 then //4 -> 640 samples/frame
        margin_frames = overlap // (160 * 4) // 2
        pieces = []
        start = 0
        while start < n:
            seg = waveform[start:start + chunk]
            is_last = start + chunk >= n
            logits, out_len = self._forward_padded(seg)
            logits = logits[:out_len]
            lo = margin_frames if start > 0 else 0
            hi = out_len if is_last else out_len - margin_frames
            pieces.append(logits[lo:hi])
            if is_last:
                break  # a chunk ending exactly at n must not respawn a tail
            start += step
        merged = np.concatenate(pieces, axis=0)
        return merged, merged.shape[0]

    def transcribe(self, audio_path, timestamps=False):
        """Transcribe a single audio file -> text.

        With ``timestamps=True`` (greedy path) returns
        ``{"text": str, "segments": [{"word", "start", "end"}]}`` —
        word-level timings from the CTC emission frames (one
        post-subsample frame = 4 x hop 160 = 40 ms at 16 kHz). The
        reference has no timestamp story; the beam path decodes text only.
        """
        if timestamps and self.use_beam_search:
            # refuse BEFORE the forward/beam run — the check must not
            # cost a full transcription
            raise TimestampsUnsupportedError(
                "timestamps are available on the greedy path only "
                "(run without --beam_search)")
        logits, out_len = self._logits(audio_path)
        if self.use_beam_search and self.decoder:
            return self.decoder.decode(logits)
        pred_ids = np.argmax(logits, axis=-1)
        if not timestamps:
            return self.tokenizer.ctc_decode(pred_ids.tolist())
        return self._with_segments(pred_ids)

    def _with_segments(self, pred_ids, frame_sec=0.04):
        """CTC collapse keeping each kept token's emission frame, then
        group tokens into words at the tokens' own space boundaries (the
        same per-token text the trie LM fusion scores)."""
        # Exactly the blank ctc_decode uses (tokenizer.pad_token_id, no
        # falsy-coercion) so the timestamp text can never diverge from the
        # plain greedy transcription of the same audio.
        blank = self.tokenizer.pad_token_id
        prev = -1
        kept, frames = [], []
        for t, tid in enumerate(pred_ids.tolist()):
            if tid != prev and tid != blank:
                kept.append(tid)
                frames.append(t)
            prev = tid
        # `kept` IS the CTC collapse, so decode it directly — re-running
        # ctc_decode on the frame sequence would be a second O(T) pass
        # that must stay in sync with the loop above.
        text = self.tokenizer.decode(kept)
        segments = []
        word, start, last = "", None, None
        for tid, fr in zip(kept, frames):
            piece = self.tokenizer.decode([tid])
            for ch_i, part in enumerate(piece.split(" ")):
                if ch_i > 0 and word:  # space inside the piece ends a word
                    segments.append({"word": word,
                                     "start": round(start * frame_sec, 3),
                                     "end": round((last + 1) * frame_sec, 3)})
                    word, start = "", None
                if part:
                    if start is None:
                        start = fr
                    word += part
                    last = fr
        if word:
            segments.append({"word": word,
                             "start": round(start * frame_sec, 3),
                             "end": round((last + 1) * frame_sec, 3)})
        return {"text": text, "segments": segments}

    def transcribe_batch(self, audio_paths):
        """Transcribe multiple files; errors yield "" (reference contract,
        sequential like inference.py:130-148)."""
        results = []
        for path in audio_paths:
            try:
                results.append(self.transcribe(path))
            except Exception as e:  # noqa: BLE001
                print(f"Error processing {path}: {e}")
                results.append("")
        return results

    def transcribe_files(self, audio_paths, batch_size=16,
                         return_errors=False):
        """True batched transcription: files are length-sorted, collated
        into padded bucket batches, and decoded with ONE forward + one
        on-device decode per batch (the reference loops files one-by-one).
        The decode step follows the configured decoder: greedy collapse by
        default, batched beam search (on-device, LM-fused when an ARPA
        table compiled) under ``--beam_search``. Errors yield "" per file;
        with ``return_errors=True`` returns (texts, error strings or None).
        """
        greedy = self.greedy
        if self._mesh is not None:
            # Pad the collated batch to a multiple of the data-parallel
            # size so every chip gets equal rows (dummy rows are masked).
            n_dev = self._mesh.shape["data"]
            batch_size = -(-batch_size // n_dev) * n_dev
        # Keyed by input position, not path: duplicate paths in the input
        # list must each produce their own result slot.
        waveforms = []
        errors = [None] * len(audio_paths)
        for i, p in enumerate(audio_paths):
            try:
                w, _ = load_audio(p)
                if w.shape[0] > DEFAULT_WAVEFORM_BUCKETS[-1]:
                    waveforms.append(None)  # long-form: fall back per-file
                else:
                    waveforms.append(w)
            except Exception as e:  # noqa: BLE001
                print(f"Error processing {p}: {e}")
                errors[i] = str(e)
                waveforms.append(False)  # decode error

        # Group by bucket so each file sees the same padded length as the
        # per-file path would give it: GroupNorm statistics span padded
        # frames (preserved reference quirk 3, SURVEY.md §2), so the padded
        # length is part of the numerics — bucket grouping keeps batched
        # output identical to sequential output.
        results = {}
        by_bucket = {}
        for idx, w in enumerate(waveforms):
            if w is None or w is False:
                continue
            S = bucket_table(w.shape[0], DEFAULT_WAVEFORM_BUCKETS)
            by_bucket.setdefault(S, []).append(idx)
        for S, group_idx in sorted(by_bucket.items()):
            for i in range(0, len(group_idx), batch_size):
                group = group_idx[i:i + batch_size]
                B = batch_size
                wav = np.zeros((B, S), dtype=np.float32)
                lens = np.full((B,), 1, dtype=np.int32)
                for j, idx in enumerate(group):
                    w = waveforms[idx]
                    wav[j, :w.shape[0]] = w
                    lens[j] = w.shape[0]
                if self._mesh is not None:
                    from turkish_asr_tpu.parallel.mesh import shard_batch
                    sharded = shard_batch(self._mesh,
                                          {"w": wav, "l": lens})
                    wav_dev, lens_dev = sharded["w"], sharded["l"]
                else:
                    wav_dev, lens_dev = jnp.asarray(wav), jnp.asarray(lens)
                logits, out_lens = self._forward_batch(
                    self.params, self.model_state, wav_dev, lens_dev)
                if self.use_beam_search and self.decoder is not None:
                    texts = self.decoder.decode_batch(logits, out_lens)
                else:
                    texts = greedy.decode_batch(logits, out_lens)
                for j, idx in enumerate(group):
                    results[idx] = texts[j]

        out = []
        for idx, p in enumerate(audio_paths):
            if waveforms[idx] is False:
                out.append("")
            elif waveforms[idx] is None:
                try:
                    out.append(self.transcribe(p))
                except Exception as e:  # noqa: BLE001
                    errors[idx] = str(e)
                    out.append("")
            else:
                out.append(results[idx])
        if return_errors:
            return out, errors
        return out


def main():
    parser = argparse.ArgumentParser(description="Turkish ASR Inference (TPU)")
    parser.add_argument("--audio", type=str, required=True, help="Audio file or directory")
    parser.add_argument("--model", type=str, required=True, help="Model checkpoint path")
    parser.add_argument("--beam_search", action="store_true", help="Use beam search decoding")
    parser.add_argument("--beam_width", type=int, default=10, help="Beam width")
    parser.add_argument("--n_mel_channels", type=int, default=80, help="Mel channels")
    parser.add_argument("--d_model", type=int, default=256, help="Model dimension")
    parser.add_argument("--n_heads", type=int, default=4, help="Attention heads")
    parser.add_argument("--n_blocks", type=int, default=8, help="Conformer blocks")
    parser.add_argument("--lm", type=str, default=None,
                        help="KenLM/ARPA language model for beam-search fusion")
    parser.add_argument("--lm_fusion", type=str, default="auto",
                        choices=["auto", "device", "hash", "host"],
                        help="LM fusion path: on-device ARPA state tables "
                             "(batched throughput) vs host beam (bit parity "
                             "for char/BPE tokenizers); auto picks device "
                             "only when each token decodes to its own word; "
                             "'hash' forces the production-scale hash-table "
                             "fusion (linear memory — what auto engages for "
                             "100k+-word ARPAs whose dense tables exceed "
                             "the entry budget)")
    parser.add_argument("--lm_weight", type=float, default=0.3,
                        help="LM fusion weight (the reference decoder's "
                             "alpha; applied on word-scoring extensions)")
    parser.add_argument("--word_bonus", type=float, default=0.5,
                        help="Per-word insertion bonus (the reference "
                             "decoder's beta; reranks final beams). "
                             "Negative values (insertion penalty, "
                             "flashlight word_score style) apply on the "
                             "device fusion paths; the host beam keeps "
                             "the reference contract of ignoring "
                             "word_bonus <= 0")
    parser.add_argument("--tokenizer_path", type=str, default=None,
                        help="Tokenizer: .json BPE vocab or HF model name")
    parser.add_argument("--trust_checkpoint", action="store_true",
                        help="Allow full unpickling of .pt checkpoints "
                             "(only for trusted files)")
    parser.add_argument("--evaluate", action="store_true",
                        help="Score transcripts against sibling .txt "
                             "references (the dataset discovery rule) and "
                             "report corpus WER/CER — the trainer's "
                             "validation metrics as a standalone CLI")
    parser.add_argument("--timestamps", action="store_true",
                        help="Emit word-level timestamps from the CTC "
                             "emission frames (greedy decode only)")
    args = parser.parse_args()

    asr = ASRInference(
        model_path=args.model,
        n_mel_channels=args.n_mel_channels,
        d_model=args.d_model,
        n_heads=args.n_heads,
        n_blocks=args.n_blocks,
        use_beam_search=args.beam_search,
        beam_width=args.beam_width,
        lm_path=args.lm,
        lm_fusion=args.lm_fusion,
        lm_weight=args.lm_weight,
        word_bonus=args.word_bonus,
        tokenizer_path=args.tokenizer_path,
        trust_checkpoint=args.trust_checkpoint,
    )

    audio_path = Path(args.audio)
    if audio_path.is_dir():
        audio_files = sorted(audio_path.glob("*.wav"))
        print(f"Found {len(audio_files)} audio files")
        if args.timestamps:
            texts = []
            for f in audio_files:
                # per-file error capture, like transcribe_files' "" rows
                # (reference contract) — one corrupt wav must not abort
                # the corpus run or its --evaluate metrics
                try:
                    out = asr.transcribe(str(f), timestamps=True)
                except TimestampsUnsupportedError:
                    raise
                except Exception as e:  # noqa: BLE001
                    print(f"Error processing {f}: {e}")
                    out = {"text": "", "segments": []}
                texts.append(out["text"])
                print(f"{f.name}: {out['text']}")
                for seg in out["segments"]:
                    print(f"  [{seg['start']:7.2f} - {seg['end']:7.2f}] "
                          f"{seg['word']}")
        else:
            # One batched bucket-collated forward + on-device decode per
            # batch for BOTH greedy and beam (transcribe_files routes beam
            # through decode_batch), with per-file error capture — a
            # corrupt wav yields a "" row instead of aborting the corpus
            # run and its --evaluate metrics.
            texts = asr.transcribe_files([str(f) for f in audio_files])
        if not args.timestamps:
            for f, text in zip(audio_files, texts):
                print(f"{f.name}: {text}")
        if args.evaluate:
            _report_metrics(audio_files, texts, asr.tokenizer)
    elif args.timestamps:
        out = asr.transcribe(str(audio_path), timestamps=True)
        print(f"\nTranscription:\n{out['text']}\n")
        for seg in out["segments"]:
            print(f"  [{seg['start']:7.2f} - {seg['end']:7.2f}] {seg['word']}")
        if args.evaluate:
            _report_metrics([audio_path], [out["text"]], asr.tokenizer)
    elif args.evaluate:
        text = asr.transcribe(str(audio_path))
        print(f"\nTranscription:\n{text}\n")
        _report_metrics([audio_path], [text], asr.tokenizer)
    else:
        print(f"\nTranscription:\n{asr.transcribe(str(audio_path))}\n")


def _report_metrics(audio_files, hypotheses, tokenizer=None):
    """Corpus WER/CER against sibling .txt references (same pairing rule
    as data/dataset.find_files; same corpus-level metrics as the
    trainer's validation — utils/metrics.wer/cer).

    References are normalized through the tokenizer round trip
    (decode(encode(text))) exactly like the trainer's validation targets:
    hypotheses come out of ctc_decode already lowercased/charset-filtered,
    so scoring against raw reference text would count case/punctuation as
    errors the training metrics never see."""
    from turkish_asr_tpu.utils.metrics import wer, cer

    refs, hyps, skipped = [], [], 0
    for f, hyp in zip(audio_files, hypotheses):
        ref_path = Path(f).with_suffix(".txt")
        if not ref_path.exists():
            skipped += 1
            continue
        text = ref_path.read_text(encoding="utf-8").strip()
        if tokenizer is not None:
            text = tokenizer.decode(tokenizer.encode(text)).strip()
        refs.append(text)
        hyps.append(hyp)
    if skipped:
        print(f"(skipped {skipped} files without .txt references)")
    n_empty = sum(1 for r in refs if not r)
    if n_empty:
        pairs = [(r, h) for r, h in zip(refs, hyps) if r]
        print(f"(skipped {n_empty} empty references)")
        refs, hyps = [p[0] for p in pairs], [p[1] for p in pairs]
    if not refs:
        print("No non-empty references found — nothing to score")
        return
    print(f"Scored {len(refs)} files | "
          f"WER: {wer(refs, hyps) * 100:.2f}% | "
          f"CER: {cer(refs, hyps) * 100:.2f}%")


if __name__ == "__main__":
    main()
