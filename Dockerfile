# ics_tpu application image. For TPU serving, base on a TPU-VM image with
# jax[tpu] preinstalled; this Dockerfile covers the host-only (CPU) path.
FROM python:3.12-slim

WORKDIR /app

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg-dev libpng-dev curl \
    && rm -rf /var/lib/apt/lists/*

COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY ics_tpu ./ics_tpu
COPY bench.py __graft_entry__.py ./

# build the native decode shim at image build time
RUN make -C ics_tpu/native libimgcodec.so || true

EXPOSE 8000
CMD ["python", "-m", "ics_tpu.main"]
