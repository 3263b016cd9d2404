# avd_tpu serving image.
#
# Role parity with the reference container (/root/reference/Dockerfile):
# media tools + healthcheck + process-manager entrypoint — but built for a
# TPU host: the base image is expected to provide jax[tpu] (e.g. a
# Cloud-TPU VM base); everything else is stdlib + the wheels below.

FROM python:3.12-slim

ENV PYTHONDONTWRITEBYTECODE=1 \
    PYTHONUNBUFFERED=1 \
    AVD_XLA_CACHE_DIR=/var/cache/avd_tpu_xla

# Media tooling: ffmpeg/ffprobe enable the reference's exact audio path and
# probing; exiftool enables the reference forensic backend.  The framework
# degrades gracefully without them (cv2 decode, native BMFF forensics).
RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg exiftool curl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /srv/app
COPY avd_tpu ./avd_tpu
COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt \
    && mkdir -p "$AVD_XLA_CACHE_DIR"

EXPOSE 8000

HEALTHCHECK --interval=30s --timeout=5s --start-period=40s --retries=3 \
    CMD curl -fsS http://127.0.0.1:8000/healthz || exit 1

# pre-fork master (gunicorn-equivalent; all GUNICORN_*/WEB_CONCURRENCY
# env knobs honored — see avd_tpu/config.py)
CMD ["python", "-m", "avd_tpu.serve.master"]
