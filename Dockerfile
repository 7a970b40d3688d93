# Serving image for turkish_asr_tpu (CPU serving; for TPU runtimes use a
# TPU-enabled base image and `pip install jax[tpu]`).
#
# Reference counterpart: /root/reference/Dockerfile (python-slim + ffmpeg +
# libsndfile + FastAPI). This framework decodes WAV natively (no ffmpeg /
# libsndfile needed) and serves over the stdlib HTTP transport unless
# fastapi+uvicorn are installed.

FROM python:3.12-slim

WORKDIR /app

# g++ for the optional native host ops (wav decode / resample / WER)
RUN apt-get update && apt-get install -y --no-install-recommends g++ \
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
