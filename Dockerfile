# Serving image for turkish_asr_tpu (CPU serving; for TPU runtimes use a
# TPU-enabled base image and `pip install jax[tpu]`).
#
# Reference counterpart: /root/reference/Dockerfile (python-slim + ffmpeg +
# libsndfile + FastAPI). This framework decodes WAV and FLAC natively (no
# libsndfile needed); ffmpeg covers the remaining advertised upload formats
# (mp3/ogg/m4a) — without it those return 400, not 500. Serves over the
# stdlib HTTP transport unless fastapi+uvicorn are installed.

FROM python:3.12-slim

WORKDIR /app

# g++ for the native host ops (wav/flac decode, resample, WER);
# ffmpeg for mp3/ogg/m4a uploads (reference Dockerfile:6-9 parity)
RUN apt-get update && apt-get install -y --no-install-recommends g++ ffmpeg \
    && rm -rf /var/lib/apt/lists/*

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY . .

ENV ASR_MODEL_PATH=/app/runs/best_model.ckpt \
    N_MEL_CHANNELS=80 \
    D_MODEL=256 \
    N_HEADS=4 \
    N_BLOCKS=8 \
    USE_BEAM_SEARCH=false \
    BEAM_WIDTH=10 \
    ASR_PORT=8000

EXPOSE 8000

CMD ["python", "serve/api.py"]
