"""HTTP serving for the Turkish ASR model.

API parity with the reference FastAPI app (/root/reference/serve/api.py):
- env-var config: ASR_MODEL_PATH, N_MEL_CHANNELS, D_MODEL, N_HEADS,
  N_BLOCKS, USE_BEAM_SEARCH, BEAM_WIDTH (:25-33)
- GET  /health            -> {status, model_loaded, device}
- POST /transcribe        -> {text, duration_ms}; 400 on bad extension,
  503 when model missing, 500 on transcription error (:106-152)
- POST /transcribe/batch  -> {results: [{filename, text, error}]} (:155-186)

Transport: FastAPI+uvicorn when installed; otherwise a dependency-free
stdlib ThreadingHTTPServer speaking the same routes/payloads (this image
has neither fastapi nor uvicorn). The model is warmed at startup with one
dummy transcription so the first request doesn't pay XLA compile time.

Additive: ASR_BATCH_WINDOW_MS > 0 enables cross-request micro-batching
(MicroBatcher) — concurrent /transcribe requests share bucket-collated
batched forwards; ASR_MAX_BATCH caps the batch. ASR_LM_PATH points the
served beam at an ARPA LM (ASR_LM_FUSION = auto/device/hash/host, the
CLI's --lm_fusion surface) — on-device fusion makes LM-fused serving
practical (thousands of times real time even with 100k-word LMs).
"""

import io
import json
import os
import re
import tempfile
import threading
import time

ALLOWED_EXTENSIONS = {".wav", ".mp3", ".flac", ".ogg", ".m4a"}


class MicroBatcher:
    """Cross-request dynamic batching for POST /transcribe.

    Concurrent single-file requests are collected for up to ``window_ms``
    (or until ``max_batch`` accumulate) and run through ONE bucket-collated
    batched forward (inference.transcribe_files) — per-request device work
    collapses into shared batches under load, the way the batched
    BASELINE workloads run. Each request thread blocks until its slot is
    filled, so request/response semantics are unchanged.

    Additive capability (the reference serves strictly one forward per
    request); disabled by default — enable with ASR_BATCH_WINDOW_MS > 0.
    """

    def __init__(self, asr, window_ms, max_batch=16):
        self.asr = asr
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self._cond = threading.Condition()
        self._pending = []
        self._runner = threading.Thread(target=self._loop, daemon=True)
        self._runner.start()

    def submit(self, path, timeout=300.0):
        """Blocks until the batch containing this request completes.
        Returns (text, error-or-None)."""
        slot = {"path": path, "event": threading.Event(),
                "text": "", "error": None}
        with self._cond:
            self._pending.append(slot)
            self._cond.notify()
        if not slot["event"].wait(timeout):
            return "", "transcription timed out"
        return slot["text"], slot["error"]

    def _loop(self):
        while True:
            with self._cond:
                while not self._pending:
                    self._cond.wait()
                # batching window: let concurrent requests pile up. Loop on
                # a deadline — each submit() notify wakes the wait, so a
                # single wait(window) would drain after the FIRST arrival
                # and a steady trickle would yield ~2-request batches.
                if self.window > 0:
                    deadline = time.monotonic() + self.window
                    while len(self._pending) < self.max_batch:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cond.wait(timeout=remaining)
                batch = self._pending[:self.max_batch]
                del self._pending[:len(batch)]
            try:
                texts, errors = self.asr.transcribe_files(
                    [s["path"] for s in batch], return_errors=True)
                for s, t, e in zip(batch, texts, errors):
                    s["text"], s["error"] = t, e
            except Exception as e:  # noqa: BLE001 — fail the whole batch
                for s in batch:
                    s["error"] = str(e)
            for s in batch:
                s["event"].set()


class ServerConfig:
    """Env-var server configuration (reference names/defaults)."""

    def __init__(self):
        self.MODEL_PATH = os.environ.get("ASR_MODEL_PATH", "./runs/best_model.ckpt")
        self.N_MEL_CHANNELS = int(os.environ.get("N_MEL_CHANNELS", "80"))
        self.D_MODEL = int(os.environ.get("D_MODEL", "256"))
        self.N_HEADS = int(os.environ.get("N_HEADS", "4"))
        self.N_BLOCKS = int(os.environ.get("N_BLOCKS", "8"))
        self.USE_BEAM_SEARCH = os.environ.get("USE_BEAM_SEARCH", "false").lower() == "true"
        self.BEAM_WIDTH = int(os.environ.get("BEAM_WIDTH", "10"))
        # Additive: ARPA LM shallow fusion in the served beam (same
        # lm_path/lm_fusion surface as the inference CLI's --lm /
        # --lm_fusion; on-device fusion keeps batched beam decoding
        # thousands of times real time, so LM-fused serving is practical).
        self.LM_PATH = os.environ.get("ASR_LM_PATH") or None
        # Normalize + validate like the CLI's choices=[...]: a typo here
        # would otherwise miss every `lm_fusion in (...)` check in
        # ASRInference and silently serve the sequential host beam.
        self.LM_FUSION = os.environ.get("ASR_LM_FUSION", "auto").strip().lower()
        if self.LM_FUSION not in ("auto", "device", "hash", "host"):
            raise ValueError(
                f"ASR_LM_FUSION={self.LM_FUSION!r} — must be one of "
                "auto/device/hash/host (the CLI's --lm_fusion choices)")
        self.LM_WEIGHT = float(os.environ.get("ASR_LM_WEIGHT", "0.3"))
        self.WORD_BONUS = float(os.environ.get("ASR_WORD_BONUS", "0.5"))
        if self.LM_PATH and not self.USE_BEAM_SEARCH:
            print("WARNING: ASR_LM_PATH is set but USE_BEAM_SEARCH is not "
                  "'true' — the LM is IGNORED on the greedy path. Set "
                  "USE_BEAM_SEARCH=true to serve LM-fused beam decoding.")
        self.TOKENIZER_PATH = os.environ.get("ASR_TOKENIZER_PATH") or None
        # Additive: shard batched requests over all visible chips (the
        # ASRInference default). "false" pins the service to one device —
        # also what the virtual-mesh serving parity test uses as its
        # single-device control.
        self.DATA_PARALLEL = os.environ.get(
            "ASR_DATA_PARALLEL", "true").strip().lower() == "true"
        self.HOST = os.environ.get("ASR_HOST", "0.0.0.0")
        self.PORT = int(os.environ.get("ASR_PORT", "8000"))
        # Cross-request micro-batching (additive; 0 = off, reference-like
        # one-forward-per-request behavior).
        self.BATCH_WINDOW_MS = float(os.environ.get("ASR_BATCH_WINDOW_MS", "0"))
        self.MAX_BATCH = int(os.environ.get("ASR_MAX_BATCH", "16"))


class ASRService:
    """Transport-independent service core shared by both servers."""

    def __init__(self, config=None, warmup=True):
        self.config = config or ServerConfig()
        self.asr = None
        self.batcher = None
        if os.path.exists(self.config.MODEL_PATH):
            try:
                from inference import ASRInference
                self.asr = ASRInference(
                    model_path=self.config.MODEL_PATH,
                    n_mel_channels=self.config.N_MEL_CHANNELS,
                    d_model=self.config.D_MODEL,
                    n_heads=self.config.N_HEADS,
                    n_blocks=self.config.N_BLOCKS,
                    use_beam_search=self.config.USE_BEAM_SEARCH,
                    beam_width=self.config.BEAM_WIDTH,
                    lm_path=self.config.LM_PATH,
                    lm_fusion=self.config.LM_FUSION,
                    lm_weight=self.config.LM_WEIGHT,
                    word_bonus=self.config.WORD_BONUS,
                    tokenizer_path=self.config.TOKENIZER_PATH,
                    data_parallel=self.config.DATA_PARALLEL,
                )
                print("Model loaded successfully!")
                self.batcher = None
                if self.config.BATCH_WINDOW_MS > 0 and hasattr(
                        self.asr, "transcribe_files"):
                    self.batcher = MicroBatcher(
                        self.asr, self.config.BATCH_WINDOW_MS,
                        self.config.MAX_BATCH)
                    print(f"Micro-batching: window "
                          f"{self.config.BATCH_WINDOW_MS} ms, max batch "
                          f"{self.config.MAX_BATCH}")
                if warmup:
                    self._warmup()
            except Exception as e:  # noqa: BLE001 — serve anyway (reference)
                print(f"Failed to load model: {e}")
        else:
            print(f"Warning: Model not found at {self.config.MODEL_PATH}")

    def _warmup(self):
        """One dummy transcription so request #1 skips XLA compilation."""
        import numpy as np
        from turkish_asr_tpu.audio.wavio import write_wav
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tmp:
            write_wav(tmp.name, np.zeros(16000, dtype=np.float32), 16000)
            path = tmp.name
        try:
            self.asr.transcribe(path)
            print("Warmup complete.")
        finally:
            os.unlink(path)

    # -- handlers returning (status_code, payload dict) --------------------
    def health(self):
        device = "N/A"
        if self.asr is not None:
            import jax
            device = jax.devices()[0].platform
        return 200, {"status": "healthy",
                     "model_loaded": self.asr is not None,
                     "device": device}

    def transcribe_upload(self, filename, content, timestamps=False):
        if self.asr is None:
            return 503, {"detail": "Model not loaded"}
        ext = os.path.splitext(filename or "")[1].lower()
        if ext not in ALLOWED_EXTENSIONS:
            return 400, {"detail": f"Unsupported file type. Allowed: {ALLOWED_EXTENSIONS}"}
        # Advertised formats the runtime can't decode (mp3/ogg/m4a without
        # ffmpeg) return a clean 400, not a 500 from deep in the decoder.
        from turkish_asr_tpu.audio.wavio import supported_formats
        if ext not in supported_formats():
            return 400, {"detail":
                         f"{ext} decode unavailable in this deployment "
                         f"(install ffmpeg; wav/flac are built in)"}
        try:
            with tempfile.NamedTemporaryFile(suffix=ext, delete=False) as tmp:
                tmp.write(content)
                tmp_path = tmp.name
        except Exception as e:  # noqa: BLE001
            return 500, {"detail": f"Failed to save file: {e}"}
        try:
            start = time.time()
            segments = None
            if timestamps:
                # word timings need the per-request greedy path (the
                # cross-request batcher decodes text only)
                out = self.asr.transcribe(tmp_path, timestamps=True)
                text, segments = out["text"], out["segments"]
            elif self.batcher is not None:
                text, err = self.batcher.submit(tmp_path)
                if err is not None:
                    return 500, {"detail": f"Transcription failed: {err}"}
            else:
                text = self.asr.transcribe(tmp_path)
            duration_ms = (time.time() - start) * 1000
            body = {"text": text, "duration_ms": duration_ms}
            if segments is not None:
                body["segments"] = segments
            return 200, body
        except Exception as e:  # noqa: BLE001
            # Only two CLIENT errors exist on this path; everything else
            # (decode failures, model bugs) stays a 500 without leaking
            # internal messages/temp paths as "your fault" responses.
            from turkish_asr_tpu.audio.wavio import UnsupportedFormatError
            from turkish_asr_tpu.utils.errors import TimestampsUnsupportedError
            if isinstance(e, (UnsupportedFormatError,
                              TimestampsUnsupportedError)):
                return 400, {"detail": str(e)}
            return 500, {"detail": f"Transcription failed: {e}"}
        finally:
            if os.path.exists(tmp_path):
                os.unlink(tmp_path)

    def transcribe_batch(self, uploads):
        """Batch endpoint. The reference loops files sequentially
        (serve/api.py:155-186); here all uploads go through ONE batched
        bucket-collated forward (inference.transcribe_files) — per-file
        error capture is preserved via its return_errors channel."""
        if self.asr is None:
            return 503, {"detail": "Model not loaded"}
        results = [None] * len(uploads)
        paths, slots = [], []
        try:
            for i, (filename, content) in enumerate(uploads):
                try:
                    ext = os.path.splitext(filename or "")[1].lower() or ".wav"
                    with tempfile.NamedTemporaryFile(suffix=ext,
                                                     delete=False) as tmp:
                        tmp.write(content)
                    paths.append(tmp.name)
                    slots.append(i)
                except Exception as e:  # noqa: BLE001
                    results[i] = {"filename": filename, "text": "",
                                  "error": str(e)}
            if paths:
                texts = errors = None
                if hasattr(self.asr, "transcribe_files"):
                    try:
                        texts, errors = self.asr.transcribe_files(
                            paths, return_errors=True)
                    except Exception as e:  # noqa: BLE001
                        # A failure in the batched forward must not take
                        # down the whole request — fall back to the
                        # per-file path, which isolates errors per upload.
                        print(f"Batched transcription failed ({e}); "
                              "falling back to per-file")
                if texts is None:  # minimal ASR objects / batched failure
                    texts, errors = [], []
                    for p in paths:
                        try:
                            texts.append(self.asr.transcribe(p))
                            errors.append(None)
                        except Exception as e:  # noqa: BLE001
                            texts.append("")
                            errors.append(str(e))
                for slot, text, err in zip(slots, texts, errors):
                    results[slot] = {"filename": uploads[slot][0],
                                     "text": text, "error": err}
        finally:
            for p in paths:
                if os.path.exists(p):
                    os.unlink(p)
        return 200, {"results": results}


# ---------------------------------------------------------------------------
# Multipart parsing (stdlib-only)
# ---------------------------------------------------------------------------

def parse_multipart(body, content_type):
    """Minimal multipart/form-data parser -> [(filename, bytes), ...]."""
    m = re.search(r'boundary="?([^";]+)"?', content_type or "")
    if not m:
        return []
    boundary = m.group(1).encode()
    parts = body.split(b"--" + boundary)
    uploads = []
    for part in parts:
        # Trim exactly one protocol CRLF each side — stripping ALL trailing
        # \r\n bytes would corrupt binary uploads ending in 0x0D/0x0A.
        if part.startswith(b"\r\n"):
            part = part[2:]
        if part.endswith(b"\r\n"):
            part = part[:-2]
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header_blob, content = part.split(b"\r\n\r\n", 1)
        headers = header_blob.decode("utf-8", errors="replace")
        fm = re.search(r'filename="([^"]*)"', headers)
        if fm is None:
            continue
        uploads.append((fm.group(1), content))
    return uploads


# ---------------------------------------------------------------------------
# Transports
# ---------------------------------------------------------------------------

def build_fastapi_app(service):
    """FastAPI app with the reference's exact endpoint surface."""
    from typing import List

    from fastapi import FastAPI, File, UploadFile, HTTPException
    from fastapi.concurrency import run_in_threadpool

    app = FastAPI(title="Turkish ASR API",
                  description="Automatic Speech Recognition API for Turkish language (TPU)",
                  version="1.0.0")

    @app.get("/health")
    async def health_check():
        _, payload = service.health()
        return payload

    # Blocking service calls run in the threadpool: awaiting them inline
    # would block the event loop, serializing concurrent requests (and
    # starving the MicroBatcher of anything to batch).

    @app.post("/transcribe")
    async def transcribe_audio(file: UploadFile = File(...),
                               timestamps: bool = False):
        content = await file.read()
        status, payload = await run_in_threadpool(
            service.transcribe_upload, file.filename, content, timestamps)
        if status != 200:
            raise HTTPException(status_code=status, detail=payload["detail"])
        return payload

    @app.post("/transcribe/batch")
    async def transcribe_batch(files: List[UploadFile] = File(...)):
        uploads = [(f.filename, await f.read()) for f in files]
        status, payload = await run_in_threadpool(
            service.transcribe_batch, uploads)
        if status != 200:
            raise HTTPException(status_code=status, detail=payload["detail"])
        return payload

    return app


def run_stdlib_server(service, host, port):
    """Dependency-free HTTP server speaking the same routes."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, status, payload):
            blob = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/health":
                self._send(*service.health())
            else:
                self._send(404, {"detail": "Not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            uploads = parse_multipart(body, self.headers.get("Content-Type"))
            path, _, query = self.path.partition("?")
            if path == "/transcribe":
                if not uploads:
                    self._send(400, {"detail": "No file uploaded"})
                    return
                # FastAPI-consistent bool coercion of the query param
                from urllib.parse import parse_qs
                raw = parse_qs(query).get("timestamps", ["false"])[-1]
                ts = raw.lower() in ("1", "true", "yes", "on")
                self._send(*service.transcribe_upload(*uploads[0],
                                                      timestamps=ts))
            elif path == "/transcribe/batch":
                self._send(*service.transcribe_batch(uploads))
            else:
                self._send(404, {"detail": "Not found"})

        def log_message(self, fmt, *args):  # quiet
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    print(f"Serving (stdlib HTTP) on {host}:{port}")
    server.serve_forever()


def run_server(config=None):
    config = config or ServerConfig()
    service = ASRService(config)
    try:
        import uvicorn
        app = build_fastapi_app(service)
        uvicorn.run(app, host=config.HOST, port=config.PORT)
    except ImportError:
        run_stdlib_server(service, config.HOST, config.PORT)
