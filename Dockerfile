# Serving image for a TPU VM (the reference ships a python:3.10-slim uvicorn
# image, Dockerfile:1-10; this one targets a Cloud TPU host where the libtpu
# runtime is provided by the VM and the serve front is the stdlib HTTP
# server — no uvicorn dependency).
FROM python:3.12-slim

WORKDIR /app
COPY hhrs_tpu/ hhrs_tpu/
COPY requirements.txt .

# On a TPU VM install jax[tpu]; the plain CPU wheel is the fallback so the
# image also runs (slowly) anywhere for smoke testing.
ARG JAX_EXTRA=tpu
RUN pip install --no-cache-dir -r requirements.txt \
    && (pip install --no-cache-dir "jax[${JAX_EXTRA}]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        || pip install --no-cache-dir jax)

EXPOSE 8000
CMD ["python", "-m", "hhrs_tpu.serve.cli", "--artifacts", "artifacts", "--data", "data", "--port", "8000"]
