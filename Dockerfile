# yolosomi_tpu runtime image (counterpart of the reference Dockerfile).
# Base: a JAX TPU image with the pinned scientific stack; the framework
# itself is pure Python + one optional g++-built host library.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

# TPU wheels: install the jax version matching your libtpu deployment
RUN pip install --no-cache-dir \
    "jax[tpu]" flax optax chex einops numpy opencv-python-headless \
    pyyaml pandas matplotlib scipy scikit-learn pytest \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

# prebuild the native host pipeline
RUN python -c "from yolosomi_tpu import native; assert native.native_available()"

ENTRYPOINT ["python"]
CMD ["detect.py", "--help"]
